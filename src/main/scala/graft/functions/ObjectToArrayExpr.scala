package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Mongo's `$objectToArray`: a document becomes `[{k, v}, …]` in field
  * order. The input's Spark type decides the value type — something no
  * plain Column expression can do before analysis, hence
  * RuntimeReplaceable (the replacement is built lazily from the RESOLVED
  * child type):
  *
  *   - MapType: exact — `map_entries` renamed to (k, v);
  *   - StructType: one array entry per field; values are cast to the
  *     narrowest common type (same type → itself, all numeric → double,
  *     else string), the fixed-schema analog of BSON's heterogeneous
  *     values.
  *
  * Round-trips with `$arrayToObject` (which produces a MapType).
  */
case class ObjectToArrayExpr(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case _: MapType => mapCase
    case st: StructType =>
      val valueType = widen(st.fields.map(_.dataType).toSeq)
      val entries = st.fields.zipWithIndex.map { case (f, i) =>
        CreateNamedStruct(Seq(
          Literal("k"), Literal(f.name),
          Literal("v"), castTo(GetStructField(child, i, Some(f.name)), valueType)))
      }
      val arr = CreateArray(entries.toIndexedSeq)
      // a NULL document is NULL, not a list of null-valued entries —
      // matching Mongo and the map branch (MapEntries propagates null)
      If(IsNull(child), Literal.create(null, arr.dataType), arr)
    case other => throw new IllegalArgumentException(
      s"$$objectToArray needs a document (struct or map), got ${other.catalogString}")
  }

  private def mapCase: Expression = {
    val mt = child.dataType.asInstanceOf[MapType]
    val entryType = StructType(Seq(
      StructField("key", mt.keyType, nullable = false),
      StructField("value", mt.valueType, nullable = mt.valueContainsNull)))
    val x = NamedLambdaVariable("x", entryType, nullable = false)
    val body = CreateNamedStruct(Seq(
      Literal("k"), GetStructField(x, 0, Some("key")),
      Literal("v"), GetStructField(x, 1, Some("value"))))
    ArrayTransform(MapEntries(child), LambdaFunction(body, Seq(x)))
  }

  private def widen(ts: Seq[DataType]): DataType =
    if (ts.distinct.size == 1) ts.head
    else if (ts.forall(_.isInstanceOf[NumericType])) DoubleType
    else StringType

  private def castTo(e: Expression, t: DataType): Expression =
    if (e.dataType == t) e
    else Cast(e, t, Some(SQLConf.get.sessionLocalTimeZone))

  override protected def withNewChildInternal(c: Expression): ObjectToArrayExpr =
    copy(child = c)
  override def prettyName: String = "object_to_array"
}

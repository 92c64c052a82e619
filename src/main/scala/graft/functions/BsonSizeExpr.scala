package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Mongo's `$bsonSize`: the exact number of bytes the value would occupy
  * when encoded as a BSON document (bsonspec.org), computed from the
  * RESOLVED Spark type — no BSON library needed, the encoding size is
  * fully determined by the schema plus per-row string/array lengths.
  * Reference analog: the extension gets this for free from libbson
  * (reference src/mongo_scan.cpp:1); here it is a static expression tree
  * Catalyst folds into the scan.
  *
  * Encoding sizes (BSON spec):
  *   document   4 (int32 total) + elements + 1 (0x00 terminator)
  *   element    1 (type tag) + name bytes + 1 (cstring NUL) + value
  *   string     4 + utf8 bytes + 1        double/int64/date  8
  *   int32      4                          bool               1
  *   null       0                          binary             4 + 1 (subtype) + bytes
  *   decimal128 16
  *   array      encoded as a document whose names are "0", "1", …
  *
  * Spark → BSON type mapping follows the docstore writer: Byte/Short/Int
  * → int32, Long → int64, Float/Double → double, Decimal → decimal128,
  * Date/Timestamp → UTC datetime (8). A NULL value encodes as BSON null
  * (type tag still written, value 0 bytes). Top-level null → null, like
  * Mongo; a non-document input is an analysis error.
  */
case class BsonSizeExpr(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  import BsonSizeExpr._

  override lazy val replacement: Expression = child.dataType match {
    case _: StructType | _: MapType =>
      If(IsNull(child), Literal.create(null, IntegerType), docSize(child))
    case other => throw new IllegalArgumentException(
      s"$$bsonSize needs a document (struct or map), got ${other.catalogString}")
  }

  override protected def withNewChildInternal(c: Expression): BsonSizeExpr =
    copy(child = c)
  override def prettyName: String = "bson_size"
}

object BsonSizeExpr {
  private val i = Literal(_: Int)

  /** Size of `e` encoded as a whole BSON document (struct/map/array). */
  private def docSize(e: Expression): Expression = e.dataType match {
    case st: StructType =>
      // 4-byte length + per-field (tag + name + NUL + value) + terminator
      val fields = st.fields.zipWithIndex.map { case (f, idx) =>
        val nameBytes = f.name.getBytes("UTF-8").length
        Add(i(2 + nameBytes), valueSize(GetStructField(e, idx, Some(f.name))))
      }
      fields.foldLeft[Expression](i(5))(Add(_, _))
    case mt: MapType =>
      // element names are the map keys rendered as strings
      val entryType = StructType(Seq(
        StructField("key", mt.keyType, nullable = false),
        StructField("value", mt.valueType, nullable = mt.valueContainsNull)))
      val x = NamedLambdaVariable("x", entryType, nullable = false)
      val nameBytes = OctetLength(toUtf8(GetStructField(x, 0, Some("key"))))
      val per = Add(Add(i(2), nameBytes), valueSize(GetStructField(x, 1, Some("value"))))
      sumOver(ArrayTransform(MapEntries(e), LambdaFunction(per, Seq(x))))
    case at: ArrayType =>
      // names are "0", "1", …: length of the decimal rendering of the index
      val x = NamedLambdaVariable("x", at.elementType, nullable = true)
      val idx = NamedLambdaVariable("i", IntegerType, nullable = false)
      val nameBytes = OctetLength(Cast(idx, StringType))
      val per = Add(Add(i(2), nameBytes), valueSize(x))
      sumOver(ArrayTransform(e, LambdaFunction(per, Seq(x, idx))))
    case other => throw new IllegalArgumentException(
      s"$$bsonSize: cannot encode ${other.catalogString} as a document")
  }

  /** Encoded size of one element VALUE (excluding tag/name overhead);
    * a NULL value is BSON null = 0 bytes, so every branch null-guards. */
  private def valueSize(e: Expression): Expression = {
    val sized: Expression = e.dataType match {
      case ByteType | ShortType | IntegerType   => i(4)
      case LongType | DoubleType | FloatType    => i(8)
      case DateType | TimestampType             => i(8)
      case _: DecimalType                       => i(16)
      case BooleanType                          => i(1)
      case NullType                             => i(0)
      case StringType => Add(i(5), OctetLength(e))
      case BinaryType => Add(i(5), OctetLength(e))
      case _: StructType | _: MapType | _: ArrayType => docSize(e)
      case other => throw new IllegalArgumentException(
        s"$$bsonSize: unsupported value type ${other.catalogString}")
    }
    If(IsNull(e), i(0), sized)
  }

  private def toUtf8(e: Expression): Expression =
    if (e.dataType == StringType) e else Cast(e, StringType)

  private def sumOver(sizes: Expression): Expression =
    Add(i(5), ArrayAggregate(sizes,
      i(0),
      { val acc = NamedLambdaVariable("acc", IntegerType, nullable = false)
        val v = NamedLambdaVariable("v", IntegerType, nullable = false)
        LambdaFunction(Add(acc, v), Seq(acc, v)) },
      { val acc = NamedLambdaVariable("acc2", IntegerType, nullable = false)
        LambdaFunction(acc, Seq(acc)) }))
}

package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Evaluates pushed `sources.Filter`s against converted rows inside the
  * docstore reader — the analog of the reference applying its generated
  * `$match` stage server-side (reference: src/mongo_filter_pushdown.cpp:1).
  * Supports the same predicate grammar the reference pushes: comparisons,
  * IS [NOT] NULL, IN, AND/OR/NOT, and string-prefix (`LIKE 'x%'` /
  * substr — reference: src/mongo_expr_pushdown.cpp:1) plus contains/
  * endswith.
  */
object FilterEval {
  def supports(f: Filter): Boolean = f match {
    case _: EqualTo | _: EqualNullSafe | _: GreaterThan | _: GreaterThanOrEqual |
        _: LessThan | _: LessThanOrEqual | _: In | _: IsNull | _: IsNotNull |
        _: StringStartsWith | _: StringEndsWith | _: StringContains => true
    case And(l, r) => supports(l) && supports(r)
    case Or(l, r)  => supports(l) && supports(r)
    case Not(c)    => supports(c)
    case _         => false
  }

  def references(f: Filter): Seq[String] = f.references.toSeq
}

class FilterEval(schema: StructType, filters: Array[Filter]) {
  private val ordinal: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  def matches(row: InternalRow): Boolean = {
    var i = 0
    while (i < filters.length) {
      // SQL semantics: a row passes only when the predicate is TRUE —
      // UNKNOWN (null involved) excludes the row, exactly like Spark
      if (!eval(filters(i), row).contains(true)) return false
      i += 1
    }
    true
  }

  private def get(row: InternalRow, attr: String): Any = {
    val i = ordinal.getOrElse(attr,
      throw new IllegalStateException(s"filter references unknown column $attr"))
    if (row.isNullAt(i)) null else row.get(i, schema(i).dataType)
  }

  /** External literal (as Spark hands it to pushFilters) → internal form. */
  private def norm(v: Any): Any = v match {
    case s: String               => UTF8String.fromString(s)
    case t: java.sql.Timestamp   => t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    case i: java.time.Instant    => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case d: java.sql.Date        => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate  => d.toEpochDay.toInt
    case other                   => other
  }

  /** Three-valued comparison; None = null involved or incomparable. */
  private def cmp(a: Any, b0: Any): Option[Int] = {
    val b = norm(b0)
    (a, b) match {
      case (null, _) | (_, null)        => None
      case (x: Long, y: Long)           => Some(java.lang.Long.compare(x, y))
      case (x: Long, y: Int)            => Some(java.lang.Long.compare(x, y.toLong))
      case (x: Int, y: Int)             => Some(Integer.compare(x, y))
      case (x: Int, y: Long)            => Some(java.lang.Long.compare(x.toLong, y))
      case (x: Long, y: Double)         => Some(java.lang.Double.compare(x.toDouble, y))
      case (x: Double, y: Long)         => Some(java.lang.Double.compare(x, y.toDouble))
      case (x: Double, y: Int)          => Some(java.lang.Double.compare(x, y.toDouble))
      case (x: Double, y: Double)       => Some(java.lang.Double.compare(x, y))
      case (x: UTF8String, y: UTF8String) => Some(x.compareTo(y))
      case (x: Boolean, y: Boolean)     => Some(java.lang.Boolean.compare(x, y))
      case (x: Array[Byte], y: Array[Byte]) =>
        // unsigned lexicographic, matching Spark's BinaryType ordering
        var i = 0
        val n = math.min(x.length, y.length)
        var r = 0
        while (r == 0 && i < n) {
          r = Integer.compare(x(i) & 0xff, y(i) & 0xff)
          i += 1
        }
        Some(if (r != 0) r else Integer.compare(x.length, y.length))
      case _ => None
    }
  }

  /** Kleene three-valued evaluation: None = UNKNOWN (a null was
    * involved). Spark never re-checks filters a source accepted, so this
    * must reproduce SQL null semantics EXACTLY — a two-valued evaluator
    * turns `NOT (s LIKE 'q%')` over a null `s` into TRUE (leaking rows
    * Spark would drop), a bug the FilterParitySpec property test caught.
    */
  private def eval(f: Filter, row: InternalRow): Option[Boolean] = f match {
    case EqualTo(a, v)            => cmp(get(row, a), v).map(_ == 0)
    case EqualNullSafe(a, v) =>
      val x = get(row, a); val y = norm(v)
      if (x == null || y == null) Some(x == null && y == null)
      else cmp(x, v).map(_ == 0)
    case GreaterThan(a, v)        => cmp(get(row, a), v).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(row, a), v).map(_ >= 0)
    case LessThan(a, v)           => cmp(get(row, a), v).map(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(get(row, a), v).map(_ <= 0)
    case In(a, vs) =>
      val x = get(row, a)
      if (x == null) None
      else {
        val cs = vs.map(v => cmp(x, v))
        if (cs.exists(_.contains(0))) Some(true)
        // a null/incomparable element makes a non-match UNKNOWN, not false
        else if (cs.exists(_.isEmpty)) None
        else Some(false)
      }
    case IsNull(a)                => Some(get(row, a) == null)
    case IsNotNull(a)             => Some(get(row, a) != null)
    case StringStartsWith(a, p) => get(row, a) match {
      case s: UTF8String => Some(s.toString.startsWith(p)); case _ => None }
    case StringEndsWith(a, p) => get(row, a) match {
      case s: UTF8String => Some(s.toString.endsWith(p)); case _ => None }
    case StringContains(a, p) => get(row, a) match {
      case s: UTF8String => Some(s.toString.contains(p)); case _ => None }
    case And(l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case Or(l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case Not(c)    => eval(c, row).map(!_)
    case other => throw new IllegalStateException(s"unsupported pushed filter $other")
  }
}

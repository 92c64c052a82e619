package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MongoDB filter-document → Catalyst `Column` compiler.
  *
  * The reference accepts a Mongo filter JSON as the `filter` argument of
  * `mongo_scan` and also *generates* such documents from SQL predicates
  * for `$match` pushdown (reference: src/mongo_filter_pushdown.cpp:1,
  * src/mongo_expr_pushdown.cpp:1). Spark-first, the direction flips:
  * Catalyst already pushes SQL predicates into scans, so the useful
  * surface is letting users apply a *Mongo-syntax* filter to any
  * DataFrame — this compiler turns the filter doc into a `Column`
  * expression that Catalyst then optimizes/pushes like any other
  * predicate (so a mongo filter on a parquet scan still lands in
  * `PushedFilters` — free pushdown, no bespoke translator).
  *
  * Supported (the reference's pushdown grammar, README "Filter
  * Pushdown"): implicit equality, `$eq $ne $gt $gte $lt $lte $in $nin
  * $exists $regex $not $and $or $nor`, dotted paths (`a.b` → nested
  * field / flattened `a_b` column — whichever exists is resolved by
  * Catalyst at analysis).
  *
  * Scale: output is a pure Catalyst boolean expression — codegen'd,
  * pushdown-eligible, no UDFs.
  */
object MongoFilter {
  import DocValue._

  /** Compile a Mongo filter JSON string against columns resolved by name. */
  def compile(filterJson: String): Column = compileDoc(ExtJson.parse(filterJson))

  def compileDoc(doc: DDoc): Column =
    doc.fields.map { case (k, v) => compileField(k, v) }
      .reduceOption(_ && _).getOrElse(lit(true))

  private def compileField(key: String, v: DocValue): Column = key match {
    case "$and" => subDocs(key, v).map(compileDoc).reduce(_ && _)
    case "$or"  => subDocs(key, v).map(compileDoc).reduce(_ || _)
    case "$nor" => !subDocs(key, v).map(compileDoc).reduce(_ || _)
    case "$not" => v match {
      case d: DDoc => !compileDoc(d)
      case other   => throw bad(s"$$not needs a document, got $other")
    }
    case field => v match {
      case ops: DDoc if ops.fields.nonEmpty && ops.fields.forall(_._1.startsWith("$")) =>
        ops.fields.map { case (op, operand) => compileOp(field, op, operand) }
          .reduce(_ && _)
      case literalValue => fieldCol(field) === toLit(literalValue) // implicit $eq
    }
  }

  private def compileOp(field: String, op: String, operand: DocValue): Column = {
    val c = fieldCol(field)
    op match {
      case "$eq"  => c === toLit(operand)
      case "$ne"  => !(c <=> toLit(operand)) // Mongo $ne also matches missing
      case "$gt"  => c > toLit(operand)
      case "$gte" => c >= toLit(operand)
      case "$lt"  => c < toLit(operand)
      case "$lte" => c <= toLit(operand)
      case "$in" => operand match {
        case DArray(items) => c.isInCollection(items.map(litValue))
        case other         => throw bad(s"$$in needs an array, got $other")
      }
      case "$nin" => operand match {
        case DArray(items) => !c.isInCollection(items.map(litValue)) || c.isNull
        case other         => throw bad(s"$$nin needs an array, got $other")
      }
      case "$exists" => operand match {
        case DBool(true)  => c.isNotNull
        case DBool(false) => c.isNull
        case other        => throw bad(s"$$exists needs a boolean, got $other")
      }
      case "$regex" => operand match {
        case DString(re) => c.rlike(re)
        case other       => throw bad(s"$$regex needs a string, got $other")
      }
      case "$not" => operand match {
        case ops: DDoc =>
          !ops.fields.map { case (o, od) => compileOp(field, o, od) }.reduce(_ && _)
        case other => throw bad(s"$$not needs a document, got $other")
      }
      case other => throw bad(s"unsupported operator $other")
    }
  }

  /** Dotted Mongo path → nested-field access; falls back naturally when
    * the column itself contains dots is not supported (use flattened
    * names then). */
  private def fieldCol(field: String): Column =
    field.split('.').map(p => s"`$p`").mkString(".") match { case p => expr(p) }

  private def toLit(v: DocValue): Column = lit(litValue(v))

  private def litValue(v: DocValue): Any = v match {
    case DNull          => null
    case DBool(b)       => b
    case DLong(l)       => l
    case DDouble(d)     => d
    case DString(s)     => s
    case DObjectId(hex) => hex // ObjectId equality compares the 24-hex form
    case DTimestamp(us) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L,
        (us % 1000000L) * 1000L))
    case DBinary(b) => b
    case other      => throw bad(s"unsupported literal $other")
  }

  private def subDocs(op: String, v: DocValue): Seq[DDoc] = v match {
    case DArray(items) if items.nonEmpty && items.forall(_.isInstanceOf[DDoc]) =>
      items.map(_.asInstanceOf[DDoc])
    case other => throw bad(s"$op needs a non-empty array of documents, got $other")
  }

  private def bad(msg: String) = new IllegalArgumentException(s"mongo filter: $msg")
}

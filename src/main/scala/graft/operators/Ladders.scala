package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Two-level "ladder" forms of per-stratum rank and running sum — the
  * scale-safe replacement for `Window.partitionBy(stratum)` when a stratum
  * can be data-sized (a corpus "source" at 100 TB is tens of TB: a window
  * partitioned by it lands the whole stratum on ONE task).
  *
  * Shape (same technique as the t07/t12 per-term ladders, SURVEY §4):
  *   1. bucket each stratum by a MONOTONE coarsening of the order key
  *      (hash prefix when the order starts with a hash; value range when
  *      it is a natural key), so every (bucket, stratum) cell is bounded
  *      by corpus_size / n_buckets;
  *   2. rank / running-sum locally inside the bounded cell;
  *   3. prefix-sum the per-cell counts/totals on a TINY frame
  *      (strata × buckets rows) — window-free, via a self-join — and
  *      broadcast it back to offset local values into exact global ones.
  *
  * Output values are bit-identical to the single-window form; no partition
  * anywhere in the plan exceeds cell size or the tiny offsets frame.
  */
object Ladders {

  /** Exact global `row_number` within each `part` stratum under the total
    * order `(bucket, order…)`. REQUIRES `bucket` to be a monotone
    * coarsening of `order` (e.g. a prefix of the leading hash column, or a
    * range-bucket of the leading numeric key), so that sorting by
    * `(bucket, order…)` equals sorting by `order…` alone.
    *
    * Adds `out` (global 1-based rank, Long) and, when `totalOut` is set,
    * the stratum's total row count.
    */
  def globalRank(df: DataFrame, part: Seq[String], bucket: String,
      order: Seq[Column], out: String,
      totalOut: Option[String] = None): DataFrame = {
    require(part.nonEmpty, "globalRank needs at least one stratum column")
    val wLocal = Window.partitionBy((col(bucket) +: part.map(col)): _*)
      .orderBy(order: _*)
    val local = df.withColumn(out, row_number().over(wLocal).cast(LongType))
    // per-cell counts aggregate the RANKED frame, not the input: the
    // window's (bucket, part) exchange already satisfies the grouping
    // distribution, so this is one scan and one exchange total
    val cells = local.groupBy((col(bucket) +: part.map(col)): _*)
      .agg(count(lit(1)).as("__v"))
    val offs = offsets(cells, part, bucket, totalOut)
    joinBack(local, offs, part, bucket)
      .withColumn(out, col(out) + col("__off"))
      .drop("__off")
  }

  /** Exact global inclusive running sum of `value` within each `part`
    * stratum, ordered by `(bucket, order…)`. Same monotone-bucket
    * requirement as [[globalRank]]. Adds `out` (Long). */
  def globalCumsum(df: DataFrame, part: Seq[String], bucket: String,
      order: Seq[Column], value: Column, out: String): DataFrame = {
    require(part.nonEmpty, "globalCumsum needs at least one stratum column")
    val wLocal = Window.partitionBy((col(bucket) +: part.map(col)): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn(out, sum(value).over(wLocal))
    // same single-scan trick as globalRank: aggregate the windowed frame
    val cells = local.groupBy((col(bucket) +: part.map(col)): _*)
      .agg(sum(value).as("__v"))
    val offs = offsets(cells, part, bucket, None)
    joinBack(local, offs, part, bucket)
      .withColumn(out, col(out) + col("__off"))
      .drop("__off")
  }

  /** Broadcast the tiny offsets frame back onto the ranked rows.
    * NULL-SAFE keys: a NULL stratum (or NULL order key → NULL bucket) is
    * its own group under Window.partitionBy, so the ladder must join it
    * back too — a plain equi-join would silently drop those rows and
    * break the bit-identical-to-the-window-form guarantee. */
  private def joinBack(local: DataFrame, offs: DataFrame,
      part: Seq[String], bucket: String): DataFrame = {
    val keys = bucket +: part
    val r = offs.select(offs.columns.map(c =>
      col(c).as(if (keys.contains(c)) "__r_" + c else c)): _*)
    val cond = keys.map(k => col(k) <=> col("__r_" + k)).reduce(_ && _)
    local.join(broadcast(r), cond)
      .drop(keys.map("__r_" + _): _*)
  }

  /** Window-free exclusive prefix sum over the tiny per-cell frame:
    * `__off(part, b) = Σ __v over buckets < b in the same stratum`, plus
    * the stratum total when requested. A self-join, not a window, so plan
    * audits can assert the stratum key never appears as a window
    * partition at all. The frame is strata × buckets rows — broadcast
    * material by construction. */
  private def offsets(cells: DataFrame, part: Seq[String], bucket: String,
      totalOut: Option[String]): DataFrame = {
    val rhs = cells.select(
      (part :+ bucket :+ "__v").map(c => col(c).as("__r_" + c)): _*)
    // null-safe stratum equality, and "earlier bucket" under Spark's
    // NULLS FIRST sort order (a NULL bucket ranks before every non-null
    // one, and contributes to their offsets)
    val cond = part.map(c => col(c) <=> col("__r_" + c)).reduce(_ && _) &&
      (col("__r_" + bucket) < col(bucket) ||
        (col("__r_" + bucket).isNull && col(bucket).isNotNull))
    val off = cells.join(rhs, cond, "left")
      .groupBy((col(bucket) +: part.map(col)): _*)
      .agg(coalesce(sum(col("__r_" + "__v")), lit(0L)).as("__off"))
    totalOut.fold(off) { name =>
      val tot = cells.groupBy(part.map(col): _*).agg(sum(col("__v")).as(name))
      val r = tot.select(tot.columns.map(c =>
        col(c).as(if (part.contains(c)) "__t_" + c else c)): _*)
      off.join(r, part.map(k => col(k) <=> col("__t_" + k)).reduce(_ && _))
        .drop(part.map("__t_" + _): _*)
    }
  }
}

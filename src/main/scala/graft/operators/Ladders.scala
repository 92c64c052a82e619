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
    // Per-cell count = max(row_number) OVER THE WINDOW OUTPUT — not
    // count(1) over the input. Referencing the window column is what
    // makes this one scan: an aggregate that doesn't consume `out` lets
    // Catalyst prune the Window away and re-derive the cell counts from
    // a SECOND scan of the (possibly 100 TB) input, duplicating the
    // scan, the map-side compute, and the exchange (observed in the
    // pre-fix p04/p05 plans). The agg groups on the window's own
    // partition keys, so it rides the window's exchange — no new one.
    val cells = local.groupBy((col(bucket) +: part.map(col)): _*)
      .agg(max(col(out)).as("__v"))
    val offs = offsets(cells, part, bucket, totalOut)
    joinBack(local, offs, part, bucket)
      .withColumn(out, col(out) + col("__off"))
      .drop("__off")
  }

  /** Exact global inclusive running sum of `value` within each `part`
    * stratum, ordered by `(bucket, order…)`. Same monotone-bucket
    * requirement as [[globalRank]], plus: `order` must be plain ASCENDING
    * columns forming a TOTAL order within each stratum. This is a hard
    * correctness requirement, not just determinism hygiene: the per-cell
    * totals below are extracted with max_by(runningSum, order), and with
    * duplicate order keys inside a cell the picked "last" row is
    * arbitrary — its running sum can EXCLUDE tied rows' values, which
    * corrupts the offset of every later bucket in the stratum (silently
    * wrong totals, where a window under ties would only reorder). Pass a
    * unique tiebreak column (both in-repo callers order by doc_id).
    * Adds `out` (Long). */
  def globalCumsum(df: DataFrame, part: Seq[String], bucket: String,
      order: Seq[Column], value: Column, out: String): DataFrame = {
    require(part.nonEmpty, "globalCumsum needs at least one stratum column")
    require(!order.exists(c =>
        org.apache.spark.sql.graftshim.toExpression(c).isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.SortOrder]),
      "globalCumsum: order columns must be plain ascending columns " +
        "(the cell-total extraction below picks the max-order row)")
    val wLocal = Window.partitionBy((col(bucket) +: part.map(col)): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn(out, sum(value).over(wLocal))
    // Per-cell total = the running sum AT THE LAST ROW of the cell,
    // extracted from the window output with max_by — not sum(value) over
    // the input. Same single-scan reasoning as globalRank: consuming the
    // window column pins the Window (and the one exchange + one scan
    // beneath it) into this branch; sum(value) would let Catalyst prune
    // the window and rebuild the totals from a second full scan.
    val cells = local.groupBy((col(bucket) +: part.map(col)): _*)
      .agg(max_by(col(out), struct(order: _*)).as("__v"))
    val offs = offsets(cells, part, bucket, None)
    joinBack(local, offs, part, bucket)
      .withColumn(out, col(out) + col("__off"))
      .drop("__off")
  }

  /** Exponential moving average — Mongo's `$expMovingAvg` recurrence
    * (reference window surface; MongoDB docs: ema_0 = x_0,
    * ema_i = alpha·x_i + (1−alpha)·ema_{i−1}; null/non-numeric inputs are
    * ignored and carry the previous value forward) — WITHOUT a sequential
    * scan operator, which Spark lacks. The recurrence is linear, so it
    * unrolls to a geometric-decay kernel the same two-level way the rank
    * /cumsum ladders unroll a plain sum:
    *
    *   1. index valid rows 1..n per stratum (`rnn`, one window over the
    *      user's partition key — the operator's own semantics);
    *   2. block rows into cells of B valid rows; inside a cell the
    *      kernel renormalizes to bounded exponents (r^{−o}, o < B) and a
    *      running sum gives the block-local EMA term exactly;
    *   3. per-block tails form a tiny frame (n/B rows); the cross-block
    *      recurrence E_k = A_k + r^{len_k}·E_{k−1} unrolls to a BANDED
    *      sum Σ A_j·r^{p_k−p_j} — beyond the band the kernel has decayed
    *      below double precision — computed by a bounded explode-join,
    *      then joined back on (stratum, block).
    *
    * B adapts to the decay rate so r^{−B} ≤ 1e15 (no catastrophic
    * magnitude spread), and the band covers every term until r^Δ
    * underflows. For alpha < ~1.7e-4 the kernel is truncated at
    * B·4096 ≈ 4M valid rows per stratum (documented; Mongo's N-form
    * alpha = 2/(N+1) reaches that only past N ≈ 12000). Values agree
    * with the sequential recurrence to double rounding (order of
    * summation differs), not bit-for-bit.
    *
    * Leading rows before the first valid value yield null, like Mongo.
    */
  def expMovingAvg(df: DataFrame, part: Seq[Column], order: Seq[Column],
      input: Column, alpha: Double, out: String): DataFrame = {
    require(alpha > 0 && alpha < 1, s"expMovingAvg: alpha in (0,1), got $alpha")
    val r = 1.0 - alpha
    val lnInv = -math.log(r)
    val B = math.max(1L, math.min(1024L, (34.5 / lnInv).toLong))
    val hb = math.min(4096L, (709.0 / (B * lnInv)).toLong + 1L)

    val x = input.cast("double")
    val pcols = part.zipWithIndex.map { case (c, i) => c.as(s"__ema_p$i") }
    val pnames = part.indices.map(i => s"__ema_p$i")
    val keyed = df.select((col("*") +: pcols) :+ x.as("__ema_x"): _*)

    val wPart = Window.partitionBy(pnames.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // index among VALID rows; an invalid row shares its predecessor's
    // index — and therefore, below, its block, offset, and final value
    // (exactly Mongo's carry-forward)
    val rnn = sum(when(col("__ema_x").isNotNull, 1L).otherwise(0L)).over(wPart)
    val staged = keyed.withColumn("__ema_rnn", rnn)
      .withColumn("__ema_b", floor((col("__ema_rnn") - 1) / lit(B.toDouble)))
      .withColumn("__ema_o", col("__ema_rnn") - 1 - col("__ema_b") * B)
    // renormalized kernel weight: the global first valid row enters with
    // weight 1 (ema_0 = x_0), later valid rows with alpha; invalid → 0
    val w = when(col("__ema_x").isNull, lit(0.0))
      .when(col("__ema_rnn") === 1, lit(1.0)).otherwise(lit(alpha))
    val y = w * coalesce(col("__ema_x"), lit(0.0)) *
      pow(lit(r), -col("__ema_o").cast("double"))
    val wCell = Window
      .partitionBy((pnames :+ "__ema_b").map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = staged.withColumn("__ema_L",
      pow(lit(r), col("__ema_o").cast("double")) * sum(y).over(wCell))

    // per-block tails: the block's final local term and final valid index
    // (aggregating the windowed frame reuses its (stratum, block)
    // distribution — one scan, no extra exchange)
    val tails = local.where(col("__ema_rnn") > 0)
      .groupBy((pnames :+ "__ema_b").map(col): _*)
      .agg(max_by(col("__ema_L"), col("__ema_rnn")).as("__ema_A"),
        max(col("__ema_rnn")).as("__ema_p"))
    // banded unroll: block j contributes A_j·r^{p_k−p_j} to E_k for
    // k ∈ [j, j+hb]; farther blocks are past the kernel's double horizon
    val contrib = tails.select(
      (pnames.map(col) :+
        explode(sequence(col("__ema_b"), col("__ema_b") + hb)).as("__ema_k") :+
        col("__ema_A") :+ col("__ema_p").as("__ema_pj")): _*)
    val ends = tails.select(
      (pnames.map(c => col(c).as("__r_" + c)) :+
        col("__ema_b").as("__r_k") :+ col("__ema_p").as("__ema_pk")): _*)
    def pcond(pre: String): Column =
      pnames.map(c => col(c) <=> col(pre + c))
        .foldLeft(lit(true))(_ && _) // no partitionBy → one global stratum
    val e = contrib.join(ends,
        pcond("__r_") && col("__ema_k") === col("__r_k"))
      .groupBy((pnames :+ "__ema_k").map(col): _*)
      .agg(sum(col("__ema_A") *
        pow(lit(r), col("__ema_pk") - col("__ema_pj"))).as("__ema_E"))
    // rows in block b need the PREVIOUS block's tail EMA
    val prev = e.select(
      (pnames.map(c => col(c).as("__e_" + c)) :+
        (col("__ema_k") + 1).as("__e_b") :+ col("__ema_E")): _*)

    local.join(prev,
        pcond("__e_") && col("__ema_b") === col("__e_b"), "left")
      .withColumn(out,
        when(col("__ema_rnn") === 0, lit(null).cast("double"))
          .otherwise(col("__ema_L") +
            pow(lit(r), col("__ema_o").cast("double") + 1) *
              coalesce(col("__ema_E"), lit(0.0))))
      .drop((pnames ++ Seq("__ema_x", "__ema_rnn", "__ema_b", "__ema_o",
        "__ema_L", "__ema_E") ++ pnames.map("__e_" + _) :+ "__e_b"): _*)
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
    // explicit broadcast: this self-join usually executes INSIDE the
    // joinBack broadcast stage, where AQE does not re-plan — without
    // the hint, a cells frame whose upstream defeats size estimation
    // (e.g. s12's cross-joined scores) sort-merges the prefix-sum join
    // (observed). The frame is strata × buckets rows by construction —
    // broadcast material regardless of corpus size.
    val off = cells.join(broadcast(rhs), cond, "left")
      .groupBy((col(bucket) +: part.map(col)): _*)
      .agg(coalesce(sum(col("__r_" + "__v")), lit(0L)).as("__off"))
    totalOut.fold(off) { name =>
      val tot = cells.groupBy(part.map(col): _*).agg(sum(col("__v")).as(name))
      val r = tot.select(tot.columns.map(c =>
        col(c).as(if (part.contains(c)) "__t_" + c else c)): _*)
      off.join(broadcast(r),
          part.map(k => col(k) <=> col("__t_" + k)).reduce(_ && _))
        .drop(part.map("__t_" + _): _*)
    }
  }
}

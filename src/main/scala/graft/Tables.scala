package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver testdata layout (`<sfDir>/<name>.parquet`).
  *
  * Mirrors the reference's collection→table mapping
  * (reference: src/mongo_catalog.cpp:1 — MongoDB collection → table) but
  * over parquet; the docstore DSv2 source in `graft.sources` covers the
  * document-shaped path.
  *
  * Scale note: plain `spark.read.parquet` keeps Catalyst free to push
  * filters/projections into the scan and to split files by
  * `spark.sql.files.maxPartitionBytes` — correct at 100 TB as long as the
  * query declares its filters/columns (never `.cache()` a full fact table
  * here).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanos type
      // (the reference's BSON Date rule maps to micros-backed TIMESTAMP
      // too). Read the raw int64 and integer-divide to micros: a double
      // division here would silently lose precision (2024 epoch-nanos
      // exceed 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register all tables as temp views so `spark.sql` queries work too. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))

  /** Rebalance a DataFrame that is about to feed a CPU-heavy map-side
    * kernel (minhash/simhash/shingling), but ONLY when the upstream scan
    * has fewer partitions than the cluster has slots. On a 1000-executor
    * cluster the input is already thousands of splits and this is the
    * identity — no gratuitous full-row shuffle; on a skewed or
    * single-chunk input (small collection dumps, local row-group-bound
    * parquet) it spreads the kernel across every core for the price of
    * shuffling the raw rows once.
    */
  def spread(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles walks the analyzed plan only — cheap; df.rdd would
    // compile the whole physical plan just to read a partition count
    val files = try df.inputFiles.length catch { case _: Throwable => slots }
    if (files > 0 && files < slots) df.repartition(slots) else df
  }
}

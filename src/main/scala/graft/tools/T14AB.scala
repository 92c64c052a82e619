package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** t14 A/B (VERDICT r13 #2): the shipped TIERED head/tail weight join
  * vs the retired r12 ALL-BROADCAST form, same session, warm min-of-3
  * each, noop-write execution — the clean-load cost-neutrality check
  * the round-13 claims lacked. The r12 form is reconstructed here
  * verbatim-in-shape (broadcast the FULL weight frame onto the
  * occurrence stream); it is scale-UNSAFE by construction (Heaps' law
  * breaks the "vocab²-bounded" premise at 100 TB) and exists only as
  * the measurement baseline. `runMain graft.tools.T14AB <sfDir>`
  */
object T14AB {
  private def r12Form(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val toksDf = Tables.spread(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[ \\t\\n\\r]+"),
          x => x =!= "").as("ts"))
      .localCheckpoint()
    val vocab = toksDf.select(explode(col("ts")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val occ = toksDf.filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(ts) - 2),
          |  i -> struct(ts[i] AS w1, ts[i + 1] AS w2))""".stripMargin))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = occ.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cl = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cl"))
    val weights = cb.join(cl, Seq("w1")).crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        (round(log((col("cl") + col("v")).cast(DoubleType)), 6)
            .cast("decimal(18,6)") -
          round(log((col("cb") + 1).cast(DoubleType)), 6)
            .cast("decimal(18,6)")).as("w"))
    val scored = occ.join(broadcast(weights), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("w")).cast("decimal(28,6)").as("s"))
    toksDf.select(col("doc_id"), size(col("ts")).cast(LongType)
        .as("n_tokens"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("s"), lit(0).cast("decimal(18,6)"))
          .cast(DoubleType).as("sum_neglogp"))
      .orderBy(col("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def loadavg() =
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(1).mkString
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time3(f: () => DataFrame): Double = {
      noop(f()) // warm
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f())
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val la0 = loadavg()
    val variants = Seq(
      "t14_tiered" ->
        (() => graft.operators.TextAnalysis.t14BigramScore(spark, dir)),
      "t14_r12_broadcast" -> (() => r12Form(spark, dir)),
      "p21_tiered" ->
        (() => graft.operators.Pipeline.queries("p21_doremi_mix")
          .apply(spark, dir)))
    val times = variants.map { case (n, f) => n -> time3(f) }
    println(times.map { case (n, t) =>
      s""""$n":${math.round(t * 1000) / 1000.0}""" }
      .mkString("{", ",", s""","loadavg_before":"$la0","loadavg_after":"${loadavg()}","sf":"$dir"}"""))
    spark.stop()
  }
}

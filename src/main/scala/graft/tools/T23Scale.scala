package graft.tools

import org.apache.spark.sql.SparkSession

/** t23 scaling-law probe (VERDICT r13 #4): train an M-merge vocabulary
  * and print the driver-round count against the documented envelope
  * (rounds ≈ 10 + (M−10)/16 when batches stay non-interacting; budget
  * doubles that for skip-acceptance rejects). Rows-only — the unrolled
  * oracle stays at the registry's 100 merges.
  * `runMain graft.tools.T23Scale <sfDir> <nMerges>`
  */
object T23Scale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (df, rounds) =
      graft.operators.TextAnalysis.t23BpeTrainRounds(spark, dir, n)
    val learned = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val budget = graft.operators.TextAnalysis.t23RoundBudget(n)
    println(s"""{"n_merges":$n,"learned":$learned,"rounds":$rounds,""" +
      s""""budget":$budget,"sec":${math.round(sec * 100) / 100.0},""" +
      s""""sf":"$dir"}""")
    spark.stop()
  }
}

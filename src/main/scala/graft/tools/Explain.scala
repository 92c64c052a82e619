package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe: runMain graft.tools.Explain <sfDir> <key>... */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.DocstoreOps.ensureEventDocs(spark, sfDir)
    for (k <- keys) {
      val df = graft.SparkEntry.queries(k)(spark, sfDir)
      df.count() // warm
      // time construction + execution, like Bench does: queries with
      // eager prefixes (d13's BFS loop, d15's write) spend their cost at
      // construction, not in the final count
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(k)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"===== $k%s  $dt%.3f s =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 per-key A/B harness: min/median wall over N interleaved
  * rounds of the official noop-sink execution for a key subset, same
  * session shape as Bench (local[32], shuffle.partitions=32, warmed).
  * `runMain graft.tools.MiniBench15 <sfDir> <key1,...> [rounds]`.
  * Failed rounds are reported and contribute no sample (the Bench
  * rule) — this is a probe, not the official artifact. */
object MiniBench15 {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      println("usage: MiniBench15 <sfDir> <key1,...> [rounds]")
      sys.exit(2)
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args(1).split(",").toSeq
    val rounds = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    LogFilters.installAccumulatorFilter()
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.all.foreach(n => graft.Tables(spark, sfDir, n).count())
    graft.operators.DocstoreOps.ensureEventDocs(spark, sfDir)
    def run(k: String): Unit =
      graft.SparkEntry.queries(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    keys.foreach { k =>
      try run(k)
      catch { case e: Throwable => println(s"WARM FAIL $k: $e") }
    }
    val samples = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    for (_ <- 1 to rounds; k <- keys) {
      val t0 = System.nanoTime()
      try {
        run(k)
        samples(k) = (System.nanoTime() - t0) / 1e9 ::
          samples.getOrElse(k, Nil)
      } catch { case e: Throwable => println(s"FAIL $k: $e") }
    }
    keys.foreach { k =>
      val ss = samples.getOrElse(k, Nil).sorted
      if (ss.nonEmpty)
        println(f"$k%-28s min ${ss.head}%6.3f  p50 ${ss(ss.size / 2)}%6.3f  n=${ss.size}")
    }
    // BENCH_FULL-shaped json (queries = per-key min) so
    // tools/decade_bands.py can consume probe runs directly
    sys.env.get("MINIBENCH_JSON").foreach { out =>
      val qj = keys.flatMap(k => samples.getOrElse(k, Nil).sorted.headOption
          .map(m => "\"" + k + "\":" + m))
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        s"""{"metric":"total","queries":$qj,"rounds":$rounds,"sf":"$sfDir"}""")
      println(s"WROTE $out")
    }
    spark.stop()
  }
}

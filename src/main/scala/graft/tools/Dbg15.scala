package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 optimization probe: for each key, split Bench's
  * construction+execution timing into its two halves (eager work at
  * DataFrame-construction time vs the final noop write) and count the
  * Spark jobs each half submits — the serial-eager-action inventory
  * that decides whether a slow key is plan-bound, job-count-bound, or
  * data-bound. `runMain graft.tools.Dbg15 <sfDir> <key1,key2,...>`. */
object Dbg15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args(1).split(",").toSeq
      else Seq("s18_graph_ann", "s19_graph_insert", "s20_rank_metrics")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.all.foreach(n => graft.Tables(spark, sfDir, n).count())
    graft.operators.DocstoreOps.ensureEventDocs(spark, sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    // per-stage CPU/wall attribution: name (callsite) -> (cpuNs, n)
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = s.stageInfo
          val cpu = info.taskMetrics.executorCpuTime
          val run = info.taskMetrics.executorRunTime
          val key = info.name.split("\n")(0).take(110)
          stageCpu.compute(key, (_, v) => {
            val a = if (v == null) Array(0L, 0L, 0L) else v
            a(0) += cpu; a(1) += run; a(2) += 1; a
          })
        }
      })
    def one(k: String): Unit = {
      // warm
      try graft.SparkEntry.queries(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"WARM FAIL $k: $e") }
      stageCpu.clear()
      val (j0, s0) = (jobs.get(), stages.get())
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(k)(spark, sfDir)
      val t1 = System.nanoTime()
      val (j1, s1) = (jobs.get(), stages.get())
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val (j2, s2) = (jobs.get(), stages.get())
      println(f"$k%-24s construct ${(t1 - t0) / 1e9}%6.2fs " +
        f"(jobs ${j1 - j0}%3d stages ${s1 - s0}%4d)  " +
        f"exec ${(t2 - t1) / 1e9}%6.2fs (jobs ${j2 - j1}%3d stages ${s2 - s1}%4d)")
      import scala.jdk.CollectionConverters._
      val top = stageCpu.asScala.toSeq
        .sortBy { case (_, a) => -a(0) }.take(8)
      top.foreach { case (n, a) =>
        println(f"    cpu ${a(0) / 1e9}%7.2fs run ${a(1) / 1e3}%8.0fms x${a(2)}%-3d $n") }
    }
    keys.foreach(one)
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: `EXPLAIN_KEY=<key> runMain graft.tools.ExplainKey`
  * executes one SparkEntry query at sf0.01 and writes its post-AQE
  * physical plan to /tmp/plan_<key>.txt — the loop used to audit scan
  * counts, exchange reuse, and codegen spans per operator. */
object ExplainKey {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val key = sys.env.getOrElse("EXPLAIN_KEY",
      args.headOption.getOrElse("p05_token_shards"))
    val df = graft.SparkEntry.queries(key)(spark, "/root/testdata/sf0.01")
    df.collect()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/plan_$key.txt"),
      df.queryExecution.executedPlan.toString)
    println(s"WROTE /tmp/plan_$key.txt")
    spark.stop()
  }
}

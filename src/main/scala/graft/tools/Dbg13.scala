package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off round-13 debug main: st13's per-session fold at a given SF,
  * stage-3 sessions printed for oracle diffing. */
object Dbg13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    val flagged = ev.withColumn("new_session",
      when(col("sec") - lag(col("sec"), 1).over(byUser) > 1800L,
        1L).otherwise(lit(0L)))
      .withColumn("session_seq", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val folded = flagged.groupBy(col("user_id"), col("session_seq"))
      .agg(aggregate(
        transform(array_sort(collect_list(
          struct(col("sec"), col("event_id"), col("event_type")))),
          e => e.getField("event_type")),
        lit(0L),
        (st, t) => when(st === 0L && t === "click", 1L)
          .when(st === 1L && t === "view", 2L)
          .when(st === 2L && t === "purchase", 3L)
          .otherwise(st)).as("stage"))
    folded.filter(col("stage") === 3L)
      .orderBy(col("user_id"), col("session_seq"))
      .collect().foreach(r => println(s"S3 ${r.getLong(0)} ${r.getLong(1)}"))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 debug: h01 sum_charge exact-decimal lanes at sf1. */
object Dbg13b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/sf1")
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    val li = graft.Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-08-06").cast(TimestampType))
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "O")
    val cur = li.agg(sum(
      (dec(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
        .cast(DecimalType(18, 4)) *
      (lit(1).cast(DecimalType(3, 2)) +
        col("l_tax").cast(DecimalType(3, 2)))).as("s"))
    cur.collect().foreach(r => println("CUR " + r.get(0)))
    // ground truth: integer micro-charges
    val exact = li.agg(sum(
      round(col("l_extendedprice") * 100).cast(DecimalType(38, 0)) *
      (lit(100L) - round(col("l_discount") * 100).cast("long")) *
      (lit(100L) + round(col("l_tax") * 100).cast("long"))).as("mc"))
    exact.collect().foreach(r => println("EXACT " + r.get(0)))
    // per-row compare: find rows where the decimal-lane charge differs
    // from the integer micro-charge
    val rows = li.select(
      col("l_orderkey"), col("l_linenumber"),
      ((dec(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
        .cast(DecimalType(18, 4)) *
      (lit(1).cast(DecimalType(3, 2)) +
        col("l_tax").cast(DecimalType(3, 2)))).cast(DecimalType(38, 6))
        .as("lane"),
      (round(col("l_extendedprice") * 100).cast(DecimalType(38, 0)) *
        (lit(100L) - round(col("l_discount") * 100).cast("long")) *
        (lit(100L) + round(col("l_tax") * 100).cast("long"))).as("mc"))
      .filter(col("lane") * 1000000 =!= col("mc"))
      .limit(5)
    rows.collect().foreach(r => println("DIFF " + r.mkString(" | ")))
    li.select(col("l_orderkey"), col("l_linenumber"),
      ((dec(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
        .cast(DecimalType(18, 4)) *
      (lit(1).cast(DecimalType(3, 2)) +
        col("l_tax").cast(DecimalType(3, 2)))).cast(DecimalType(38, 6))
        .as("lane"))
      .write.mode("overwrite").parquet("/tmp/h01_lane")
    spark.stop()
  }
}

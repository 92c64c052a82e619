package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Composed end-to-end shapes: the individual operators of §2.2/§2.3
  * chained the way a production corpus pipeline would use them.
  */
object Pipeline {

  // ---------------------------------------------------------------- p01
  /** Corpus-cleaning pipeline: language filter → length/quality gates →
    * exact dedup (keep lowest id per text hash) → per-doc token stats.
    * One pass + one window shuffle on the text hash; at 100 TB every
    * stage before the window is map-side (filters push to the scan).
    */
  def p01CleanPipeline(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    Tables(spark, dir, "documents")
      .filter(col("lang") === "en" && col("n_chars") >= 100)
      .withColumn("tokens", size(split(col("text"), " ")).cast(LongType))
      .filter(col("tokens") >= 30)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1) // exact dedup, keep-min
      .select(col("doc_id"), col("source"), col("tokens"))
      .orderBy(col("doc_id"))
  }

  val p01Sql: String =
    """SELECT doc_id, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |FROM documents
      |WHERE lang = 'en' AND n_chars >= 100
      |  AND len(string_split(text, ' ')) >= 30
      |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d11
  /** Document access through Spark 4's native VARIANT type: parse the
    * JSON sub-document once into a binary variant, extract typed fields
    * with `variant_get` — the engine-native successor to the reference's
    * Document→JSON-VARCHAR + json_extract path (README "BSON Type
    * Mapping"). Variant keeps extraction codegen'd and avoids re-parsing
    * the JSON per field at 100 TB.
    */
  def d11Variant(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        col("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("event_type"))

  val d11Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  ROUND(SUM(value), 4) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_clean_pipeline" -> (p01CleanPipeline _),
    "d11_variant" -> (d11Variant _))

  val oracle: Map[String, String] = Map(
    "p01_clean_pipeline" -> p01Sql,
    "d11_variant" -> d11Sql)
}

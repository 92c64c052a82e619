package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.{vectors => V}

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2.3).
  *
  * Scale design: the query set is small and broadcast; the corpus streams
  * once. Brute force is the exactness baseline (O(N·Q) codegen'd cosine,
  * zero shuffle until the per-query top-k); IVF is the scale path — the
  * corpus is bucketed by coarse centroid once (write-time partitioning in
  * a real deployment) and each query probes only `nprobe` cells, cutting
  * the scan by cells/nprobe.
  */
object Similarity {

  private val K = 10

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  // ---------------------------------------------------------------- s01
  /** Exact cosine top-k per query: broadcast queries × corpus, codegen'd
    * cosine kernel, rank window partitioned by query.
    */
  def s01BruteForce(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables(spark, dir, "embeddings")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queriesDf(spark, dir)))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("label"),
        V.cosine_sim(col("q_vec"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= K)
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- s02
  /** IVF-style ANN: coarse quantizer = 8 seeded centroids (deterministic
    * corpus picks), corpus assigned to nearest cell, queries probe the 2
    * nearest cells and brute-force only those.
    */
  def s02Ivf(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables(spark, dir, "embeddings")
    // seeded coarse quantizer: 8 fixed corpus vectors as centroids
    val centroids = corpus.filter(col("vec_id") % 61 === 3)
      .limit(8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))

    // build: assign each corpus vector to its nearest centroid (cell)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val assigned = corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("label"), col("embedding"), col("c_id"),
        V.cosine_sim(col("embedding"), col("c_vec")).as("c_cos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("embedding"),
        col("c_id").as("cell"))

    // probe: each query picks its 2 nearest cells
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("q_cos").desc, col("c_id"))
    val probes = queriesDf(spark, dir).crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_vec"), col("c_id"),
        V.cosine_sim(col("q_vec"), col("c_vec")).as("q_cos"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("q_id"), col("q_vec"), col("c_id").as("cell"))

    // search only the probed cells
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("label"), col("cell"),
        V.cosine_sim(col("q_vec"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(wRank).cast(LongType))
      .filter(col("rank") <= K)
      .orderBy(col("q_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_ann_bruteforce" -> (s01BruteForce _),
    "s02_ann_ivf" -> (s02Ivf _))

  /** Custom cosine kernel has no DuckDB-identical float semantics →
    * rows-only checks.
    */
  val oracle: Map[String, String] = Map.empty
}

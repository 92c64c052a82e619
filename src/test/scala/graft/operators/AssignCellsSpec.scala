package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Degenerate-embedding behavior of the shared IVF cell-assignment fold
  * (s02/dd09/s07). A zero-norm vector makes every cosine NaN; a null
  * vector makes every cosine NULL. Both engines' window pick — row_number
  * over (cos DESC, c_id ASC) — still assigns such rows a cell (NaN ranks
  * first, NULL last, ties break to the lowest c_id), so the fold must
  * keep them too, deterministically, instead of silently dropping them. */
class AssignCellsSpec extends SparkSpec {

  private val vecT = ArrayType(FloatType)
  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)

  test("zero-norm and null embeddings keep a deterministic lowest-c_id cell") {
    val cents = df(
      Seq(Row(2L, Seq(0f, 1f)), Row(0L, Seq(1f, 0f)), Row(1L, Seq(1f, 1f))),
      StructType(Seq(StructField("c_id", LongType),
        StructField("c_vec", vecT))))
    val corpus = df(
      Seq(
        Row(10L, Seq(1f, 0.1f)), // regular: nearest c_id 0
        Row(11L, Seq(0f, 0f)),   // zero norm: all cosines NaN
        Row(12L, null)),         // null vector: all cosines NULL
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", vecT))))
    val out = Similarity.assignCells(corpus, cents, col("embedding"))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no row vanished
    assert(out.keySet == Set(10L, 11L, 12L))
    assert(out(10L) == 0L)
    // NaN-cosine row: both engines' NaN-first window pick with the c_id
    // tie-break lands on the lowest c_id
    assert(out(11L) == 0L)
    // NULL-cosine row: NULLS LAST, but the window still emits — lowest c_id
    assert(out(12L) == 0L)
  }

  test("empty centroid set still yields no rows (the only drop case)") {
    val cents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("c_id", LongType),
        StructField("c_vec", vecT))))
    val corpus = df(Seq(Row(10L, Seq(1f, 0.1f))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", vecT))))
    assert(Similarity.assignCells(corpus, cents, col("embedding")).count() == 0L)
  }
}

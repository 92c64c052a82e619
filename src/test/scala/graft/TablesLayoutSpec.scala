package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.normalizeEventTs must adapt to whatever physical layout the
  * driver writes events.parquet in — the round-6 testdata regeneration
  * (TIMESTAMP(NANOS) → timestamp[us] NTZ) took down every events key
  * because the old code pinned one layout. These fixtures cover all
  * three resolved shapes so the next regeneration is a green diff, not
  * an outage. (Spark cannot author a TIMESTAMP(NANOS) annotation, but
  * under `legacy.parquet.nanosAsLong` that layout resolves LongType —
  * identical to a plain int64 fixture, which is what we write.)
  */
class TablesLayoutSpec extends SparkSpec {
  import spark.implicits._

  // One wall-clock instant, expressed per-layout. Session zone is UTC.
  private val wallClock = "2024-03-15 07:30:45.123456"
  private val micros: Long = {
    val ldt = LocalDateTime.parse(wallClock.replace(' ', 'T'))
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      ldt.getNano / 1000L
  }

  private def fixtureDir(): String =
    Files.createTempDirectory("graft_tables_layout").toString

  private def assertNormalized(path: String): Unit = {
    val df = Tables.normalizeEventTs(spark, path)
    val tsField = df.schema.find(_.name == "ts").get
    assert(tsField.dataType == TimestampType,
      s"resolved ${tsField.dataType} for $path")
    val got = df.select(date_format(col("ts"),
      "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].head()
    assert(got == wallClock, s"wall-clock drifted: $got for $path")
  }

  test("int64-nanos layout (legacy testdata) normalizes to TIMESTAMP") {
    val dir = s"${fixtureDir()}/events.parquet"
    Seq((1L, micros * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(dir)
    assertNormalized(dir)
  }

  test("timestamp[us] NTZ layout (current testdata) normalizes to TIMESTAMP") {
    val dir = s"${fixtureDir()}/events.parquet"
    Seq((1L, LocalDateTime.parse(wallClock.replace(' ', 'T'))))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(dir)
    // sanity: the fixture really is NTZ on disk
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType == TimestampNTZType)
    assertNormalized(dir)
  }

  test("UTC-adjusted timestamp layout passes through unchanged") {
    val dir = s"${fixtureDir()}/events.parquet"
    Seq((1L, Timestamp.valueOf(wallClock))).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(dir)
    assertNormalized(dir)
  }

  test("an unrecognized ts type fails with a named, actionable error") {
    val dir = s"${fixtureDir()}/events.parquet"
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(spark, dir)
    }
    assert(e.getMessage.contains("Tables.normalizeEventTs"))
    assert(e.getMessage.contains("ts type"))
  }

  test("live testdata resolves through whatever layout it currently has") {
    val df = Tables(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("embeddings normalize to array<float> from either float width") {
    // float layout (current testdata): pass-through
    val live = Tables(spark, sfDir, "embeddings")
    assert(live.schema("embedding").dataType == ArrayType(FloatType))
    // double layout (a plausible regeneration): map-side downcast, so
    // the getFloat-based kernels never read garbage
    val dir = s"${fixtureDir()}/embeddings.parquet"
    Seq((1L, Seq(0.25, -1.5, 3.0))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    val down = Tables.normalizeEmbedding(spark.read.parquet(dir))
    assert(down.schema("embedding").dataType == ArrayType(FloatType))
    assert(down.select(col("embedding")).head.getSeq[Float](0)
      == Seq(0.25f, -1.5f, 3.0f))
    // anything else fails with the culprit named
    val bad = s"${fixtureDir()}/embeddings.parquet"
    Seq((1L, "oops")).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalStateException] {
      Tables.normalizeEmbedding(spark.read.parquet(bad))
    }
    assert(e.getMessage.contains("normalizeEmbedding"))
  }

  test("corpus contract: document text stays in printable ASCII + " +
      "{tab, newline, CR} — the premise the tokenizer/length debt " +
      "rests on") {
    // SURVEY §5 (round 10c): the t-family's `\s+`-both-sides oracle
    // pairs and any byte-vs-character length pairing are latent ONLY
    // while no document contains \f, \x0B, or a multibyte codepoint.
    // This pins the premise: if the testdata generator ever emits such
    // a character, the round fails HERE with the contract named,
    // instead of as an unexplained oracle hash mismatch on a dozen
    // text keys. (Spark regex: printable ASCII \x20-\x7E plus the
    // three blessed whitespace chars; rlike is codepoint-based.)
    // NULL text first, explicitly: rlike(NULL) is NULL and would slip
    // the filter silently, while Spark size(split(NULL)) = -1 poisons
    // every count where DuckDB's SUM skips the NULL — a one-row NULL
    // would surface as unexplained hash mismatches across the whole
    // t-family (review r11)
    assert(Tables(spark, sfDir, "documents")
      .filter(col("text").isNull).count() == 0,
      "documents.text contains NULLs — every text-key count diverges " +
        "cross-engine (Spark size()=-1 vs DuckDB SUM-skips-NULL)")
    val offenders = Tables(spark, sfDir, "documents")
      .filter(!col("text").rlike("\\A[\\x20-\\x7E\\t\\n\\r]*\\z"))
    assert(offenders.count() == 0,
      "document text violates the ASCII+{\\t,\\n,\\r} corpus contract " +
        "that SURVEY §5's tokenizer/length debt rests on — fix the " +
        "affected oracles (kernel-exact charset + character length) " +
        "before trusting text-key parity")
  }

  // Every testdata SF the verify gate or the specs scan. The driver
  // regenerates all of them with one generator, so a contract that
  // holds at both ends pins the generator's output envelope.
  private val contractDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(d).isDirectory)

  test("corpus contract: base doc_ids stay below the smallest plant " +
      "offset (999999, m05's) — the premise every fixed-offset plant " +
      "and id-threshold oracle split rests on") {
    // ADVICE r10 + review r11: dd16/st15 oracles split one signature
    // chain at doc_id < 5000000, t17 at < 7000000, dd18 at < 4000000,
    // p16/t10's eval predicate at < 1000000, the dedup family plants
    // at +1000000 (Dedup.PlantOffset) and m05/m07 at +999999 — the
    // SMALLEST offset in the repo, so THAT is the binding premise: a
    // base id at or above it collides with a plant id (two docs merge
    // in every groupBy) or misclassifies an id-threshold split,
    // deterministically in BOTH engines, so verify stays green while
    // the keys silently corrupt. ScaleUp-synthesized dirs hold it too
    // since round 14 (documents replicate at a COMPACT max(doc_id)+1
    // stride with a fail-loud require, so plant-offset keys are IN the
    // synthesized-SF parity gate); the driver's real testdata must hold
    // it as well. Fail HERE with the premise named instead.
    contractDirs.foreach { dir =>
      val maxId = Tables(spark, dir, "documents")
        .agg(max(col("doc_id"))).head.getLong(0)
      assert(maxId < 999999L,
        s"$dir: max(doc_id)=$maxId breaches the 999999 plant-offset " +
          "premise (m05's, the repo's smallest) — planted corpora now " +
          "collide ids and id-threshold oracle splits misclassify, " +
          "identically in both engines; re-derive every plant offset " +
          "from max(doc_id)+1 (st16's pattern) before trusting any " +
          "plant-bearing key")
    }
  }

  test("corpus contract: no embedding cosine lands within 1e-9 of a " +
      "raw-double keep threshold (m10 τ=0.1, s12 τ=0.2)") {
    // ADVICE r10: m10's keep and s12's ball membership compare a RAW
    // double cosine — computed independently by the graft kernel and
    // DuckDB list_cosine_similarity — against a threshold. The two
    // implementations agree to a few ulps (~1e-16 relative), so parity
    // is safe iff no corpus value sits inside that band around τ. This
    // pins that premise with a 1e-9 margin (seven orders of magnitude
    // of slack): a regenerated corpus that lands a row near a
    // threshold fails HERE with the culprit named, not as a one-row
    // verify hash flake.
    import graft.functions.{vectors => V}
    contractDirs.foreach { dir =>
      val emb = Tables(spark, dir, "embeddings")
      // m10: cosine of the row's own halves vs τ=0.1
      val m10Gap = emb.select(
          abs(V.cosine_sim(slice(col("embedding"), 1, 32),
            slice(col("embedding"), 33, 32)) - lit(0.1d)).as("gap"))
        .agg(min(col("gap"))).head.getDouble(0)
      assert(m10Gap > 1e-9,
        s"$dir: an embedding's half-vs-half cosine sits $m10Gap from " +
          "m10's τ=0.1 — cross-engine ulp drift can flip its keep bit")
      // s12: query (vec_id<5) × corpus cosines vs τ=0.2
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val s12Gap = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(abs(V.cosine_sim(col("q_vec"), col("embedding"))
          - lit(0.2d)).as("gap"))
        .agg(min(col("gap"))).head.getDouble(0)
      assert(s12Gap > 1e-9,
        s"$dir: a query-corpus cosine sits $s12Gap from s12's τ=0.2 — " +
          "cross-engine ulp drift can flip its ball membership")
    }
  }
}

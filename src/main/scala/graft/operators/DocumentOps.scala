package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Document-model operators (SURVEY.md §2.2) that run on the driver
  * tables: nested-JSON field extraction (the reference maps BSON
  * sub-documents to JSON VARCHAR — README "BSON Type Mapping") and
  * array-of-struct handling (the reference's Array Handling: LIST(STRUCT)
  * columns + `list_extract` + UNNEST — README "Querying MongoDB").
  *
  * The docstore DSv2 source (graft.sources) covers inference/pushdown on
  * document files; these two prove the query-side document semantics with
  * a DuckDB oracle.
  */
object DocumentOps {

  // ---------------------------------------------------------------- d01
  /** Nested-document field access: events.props is a JSON sub-document
    * stored as a string (exactly the reference's Document→VARCHAR rule);
    * extract a typed field and aggregate on it. Scale: extraction is
    * map-side, pushdown-friendly (only `props`, `event_type` read).
    */
  def d01JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val d01Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- d05
  /** Array-of-struct round trip: build LIST(STRUCT) per order (sorted for
    * determinism), then `list_extract`-style element access AND UNNEST
    * back to rows — the reference's two array access patterns in one
    * query shape.
    */
  def d05UnnestArray(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(col("l_orderkey") <= 200)
    val orders = li
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(col("l_linenumber").as("ln"),
        col("l_quantity").as("qty")))).as("items"))
    orders
      .select(col("l_orderkey"),
        size(col("items")).cast(LongType).as("n_items"),
        element_at(col("items"), 1).getField("ln").as("first_ln"),
        element_at(col("items"), 1).getField("qty").as("first_qty"),
        posexplode(col("items")).as(Seq("pos", "item")))
      .select(col("l_orderkey"), col("n_items"), col("first_ln"),
        col("first_qty"), col("pos").cast(LongType).as("pos"),
        col("item.ln").as("ln"), col("item.qty").as("qty"))
      .orderBy(col("l_orderkey"), col("pos"))
  }

  val d05Sql: String =
    """WITH ord AS (
      |  SELECT l_orderkey,
      |    list_sort(list(struct_pack(ln := l_linenumber, qty := l_quantity))) AS items
      |  FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(len(items) AS BIGINT) AS n_items,
      |  items[1].ln AS first_ln,
      |  items[1].qty AS first_qty,
      |  CAST(UNNEST(range(len(items))) AS BIGINT) AS pos,
      |  UNNEST(items).ln AS ln,
      |  UNNEST(items).qty AS qty
      |FROM ord ORDER BY l_orderkey, pos""".stripMargin

  // ---------------------------------------------------------------- d12
  /** MongoDB aggregation pipeline run UNCHANGED against a Spark table:
    * $match → pushed filter, $group → partial agg, $project expression
    * language, $sort — a mongosh user's pipeline is the query (see
    * [[graft.sources.MongoPipeline]]). Oracle: the same pipeline
    * hand-written as SQL — two independently derived plans must agree.
    */
  def d12AggPipeline(spark: SparkSession, dir: String): DataFrame =
    graft.Graft.aggregate(Tables(spark, dir, "events"), """[
      {"$match": {"value": {"$gte": 10},
                  "event_type": {"$in": ["click", "view", "purchase"]}}},
      {"$group": {"_id": "$event_type",
                  "total": {"$sum": "$value"},
                  "n": {"$sum": 1},
                  "avg_v": {"$avg": "$value"},
                  "users": {"$addToSet": "$user_id"}}},
      {"$project": {"_id": 1, "n": 1,
                    "total": {"$round": ["$total", 4]},
                    "avg_v": {"$round": ["$avg_v", 4]},
                    "n_users": {"$size": "$users"}}},
      {"$sort": {"_id": 1}}
    ]""")

  val d12Sql: String =
    """SELECT event_type AS _id, COUNT(*) AS n,
      |  ROUND(SUM(value), 4) AS total, ROUND(AVG(value), 4) AS avg_v,
      |  CAST(COUNT(DISTINCT user_id) AS INTEGER) AS n_users
      |FROM events
      |WHERE value >= 10 AND event_type IN ('click','view','purchase')
      |GROUP BY event_type ORDER BY _id""".stripMargin

  // ---------------------------------------------------------------- d13
  /** `$graphLookup` recursive traversal compiled to iterative BFS join
    * hops (MongoDB's graph stage; no Spark built-in). The collection is a
    * parent TREE derived from nation (parent = floor(key/2)) — multi-depth
    * chains plus a self-loop at the root prove cycle-safe visited dedup
    * and min-depth semantics. Oracle: DuckDB recursive CTE closure with
    * min(depth) per reached node.
    *
    * Scale: each BFS hop is one equi-join shuffle of the frontier against
    * the collection; visited dedup bounds total work by the reachable
    * edge set, and hops ≤ maxDepth (or graph diameter).
    */
  def d13GraphLookup(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val tree = graft.Graft.aggregate(nation, """[
      {"$set": {"parent": {"$floor": {"$divide": ["$n_nationkey", 2]}}}},
      {"$project": {"n_nationkey": 1, "n_name": 1, "parent": 1}}
    ]""")
    graft.Graft.aggregate(tree, """[
      {"$graphLookup": {"from": "tree", "startWith": "$parent",
        "connectFromField": "parent", "connectToField": "n_nationkey",
        "as": "ancestors", "maxDepth": 3, "depthField": "depth"}},
      {"$unwind": "$ancestors"},
      {"$project": {"nk": "$n_nationkey", "anc": "$ancestors.n_nationkey",
                    "anc_name": "$ancestors.n_name", "depth": "$ancestors.depth"}},
      {"$sort": {"nk": 1, "depth": 1}}
    ]""", resolver = Map("tree" -> tree))
  }

  val d13Sql: String =
    """WITH RECURSIVE tree AS (
      |  SELECT n_nationkey, n_name,
      |    CAST(FLOOR(n_nationkey / 2.0) AS BIGINT) AS parent FROM nation),
      |walk(src, node, depth) AS (
      |  SELECT s.n_nationkey, t.n_nationkey, 0
      |  FROM tree s JOIN tree t ON t.n_nationkey = s.parent
      |  UNION
      |  SELECT w.src, t.n_nationkey, w.depth + 1
      |  FROM walk w
      |  JOIN tree cur ON cur.n_nationkey = w.node
      |  JOIN tree t ON t.n_nationkey = cur.parent
      |  WHERE w.depth < 3),
      |dedup AS (SELECT src, node, MIN(depth) AS depth FROM walk GROUP BY 1, 2)
      |SELECT d.src AS nk, d.node AS anc, t.n_name AS anc_name,
      |  CAST(d.depth AS BIGINT) AS depth
      |FROM dedup d JOIN tree t ON t.n_nationkey = d.node
      |ORDER BY nk, depth""".stripMargin

  // ---------------------------------------------------------------- d14
  /** `$densify` + `$fill`: per-user daily activity grid (gap days
    * generated at step 1 day within each user's [min, max]) with
    * last-observation-carried-forward on the value and a constant fill on
    * the observed flag — MongoDB's time-series gap-filling stages as one
    * sequence-explode + anti-join + window pass. Oracle: DuckDB
    * generate_series grid + IGNORE NULLS window.
    *
    * Scale: grid generation is one groupBy(min,max) + explode (rows ∝
    * output), the anti-join shuffles only grid points, and locf is a
    * single window pass per partition — no driver loops anywhere.
    */
  def d14DensifyFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .filter(col("user_id") <= 5)
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(round(sum(col("value")), 4).as("day_value"))
      .withColumn("observed", lit(1L))
    graft.Graft.aggregate(daily, """[
      {"$densify": {"field": "day", "partitionByFields": ["user_id"],
                    "range": {"step": 1, "unit": "day", "bounds": "partition"}}},
      {"$fill": {"partitionBy": {"u": "$user_id"}, "sortBy": {"day": 1},
                 "output": {"day_value": {"method": "locf"},
                            "observed": {"value": 0}}}},
      {"$sort": {"user_id": 1, "day": 1}}
    ]""")
  }

  val d14Sql: String =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day,
      |    ROUND(SUM(value), 4) AS day_value, CAST(1 AS BIGINT) AS observed
      |  FROM events WHERE user_id <= 5 GROUP BY 1, 2),
      |bounds AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
      |           FROM daily GROUP BY 1),
      |grid AS (SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |         FROM bounds)
      |SELECT g.user_id, g.day,
      |  last_value(d.day_value IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.day
      |    ROWS UNBOUNDED PRECEDING) AS day_value,
      |  COALESCE(d.observed, 0) AS observed
      |FROM grid g LEFT JOIN daily d
      |  ON d.user_id = g.user_id AND d.day = g.day
      |ORDER BY g.user_id, g.day""".stripMargin

  // ---------------------------------------------------------------- d16
  /** `$setWindowFields` oracle-gated: per-user daily series with
    * document number, `$shift` (lag with default), a running `$sum`, and
    * a bounded 3-row moving `$avg` — every form of the stage's frame
    * semantics (sequence window, running frame, sliding frame) against
    * DuckDB's window functions computing the identical frames.
    *
    * Scale: ONE window shuffle on (user) serves all four outputs —
    * Spark plans the four window expressions over the same
    * partitioning/order as a single Window node.
    */
  def d16WindowStage(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .filter(col("user_id") <= 3)
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(round(sum(col("value")), 4).as("day_value"))
    graft.Graft.aggregate(daily, """[
      {"$setWindowFields": {"partitionBy": "$user_id", "sortBy": {"day": 1},
        "output": {
          "rn": {"$documentNumber": {}},
          "prev": {"$shift": {"output": "$day_value", "by": -1, "default": 0}},
          "run_total": {"$sum": "$day_value",
                        "window": {"documents": ["unbounded", "current"]}},
          "avg3": {"$avg": "$day_value",
                   "window": {"documents": [-2, "current"]}}
        }}},
      {"$project": {"user_id": 1, "day": 1, "day_value": 1, "rn": 1,
                    "prev": {"$round": ["$prev", 4]},
                    "run_total": {"$round": ["$run_total", 4]},
                    "avg3": {"$round": ["$avg3", 4]}}},
      {"$sort": {"user_id": 1, "day": 1}}
    ]""")
  }

  val d16Sql: String =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day,
      |    ROUND(SUM(value), 4) AS day_value
      |  FROM events WHERE user_id <= 3 GROUP BY 1, 2)
      |SELECT user_id, day, day_value,
      |  CAST(row_number() OVER w AS INTEGER) AS rn,
      |  ROUND(COALESCE(lag(day_value, 1) OVER w, 0), 4) AS prev,
      |  ROUND(SUM(day_value) OVER (w ROWS UNBOUNDED PRECEDING), 4) AS run_total,
      |  ROUND(AVG(day_value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
      |    AS avg3
      |FROM daily
      |WINDOW w AS (PARTITION BY user_id ORDER BY day)
      |ORDER BY user_id, day""".stripMargin

  // ---------------------------------------------------------------- d17
  /** `$lookup` pipeline/`let` (correlated subquery) + `$unionWith` — the
    * two Mongo pipeline features a SQL-porting user hits next (the
    * reference gets both for free from DuckDB SQL: subqueries and UNION,
    * reference test/sql/query/basic.test). Per nation, the top-2
    * suppliers by account balance via a correlated sub-pipeline (var-free
    * `$match` prefix pushes into the scan; the `$expr` equality becomes a
    * hash-join key; `$sort`+`$limit` compiles to a per-row top-k window),
    * unioned with high-balance customers shaped by a `$unionWith`
    * sub-pipeline. Oracle: the same query as a DuckDB window-rank CTE +
    * UNION ALL.
    *
    * Scale: one hash join (nation keys vs supplier) + one rank window
    * partitioned by the join id; no whole-document shuffles — `let`
    * values travel as compact key columns.
    */
  def d17LookupUnion(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val supplier = Tables(spark, dir, "supplier")
    val customer = Tables(spark, dir, "customer")
    graft.Graft.aggregate(nation, """[
      {"$lookup": {
        "from": "supplier",
        "let": {"nk": "$n_nationkey"},
        "pipeline": [
          {"$match": {"s_acctbal": {"$gt": 0}}},
          {"$match": {"$expr": {"$eq": ["$s_nationkey", "$$nk"]}}},
          {"$project": {"s_suppkey": 1, "s_name": 1, "s_acctbal": 1}},
          {"$sort": {"s_acctbal": -1, "s_suppkey": 1}},
          {"$limit": 2}
        ],
        "as": "top"}},
      {"$unwind": "$top"},
      {"$project": {"nk": "$n_nationkey", "name": "$top.s_name",
                    "bal": "$top.s_acctbal", "kind": "supplier"}},
      {"$unionWith": {"coll": "customer", "pipeline": [
        {"$match": {"c_acctbal": {"$gte": 9900}}},
        {"$project": {"nk": "$c_nationkey", "name": "$c_name",
                      "bal": "$c_acctbal", "kind": "cust"}}
      ]}},
      {"$sort": {"kind": 1, "nk": 1, "bal": -1, "name": 1}}
    ]""", resolver = Map("supplier" -> supplier, "customer" -> customer))
  }

  val d17Sql: String =
    """WITH top_supp AS (
      |  SELECT nk, name, bal, kind FROM (
      |    SELECT n.n_nationkey AS nk, s.s_name AS name, s.s_acctbal AS bal,
      |      'supplier' AS kind,
      |      row_number() OVER (PARTITION BY n.n_nationkey
      |        ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
      |    FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
      |    WHERE s.s_acctbal > 0)
      |  WHERE rn <= 2),
      |hi_cust AS (
      |  SELECT c_nationkey AS nk, c_name AS name, c_acctbal AS bal,
      |    'cust' AS kind
      |  FROM customer WHERE c_acctbal >= 9900)
      |SELECT * FROM (SELECT * FROM top_supp UNION ALL SELECT * FROM hi_cust)
      |ORDER BY kind, nk, bal DESC, name""".stripMargin

  // ---------------------------------------------------------------- d18
  /** `$objectToArray` / `$unwind` / compound-`_id` `$group`: pivot a
    * document's fields into (k, v) entries and count value frequencies
    * per attribute — the attribute-profiling pass every schema-drift
    * monitor runs over a document collection. Values widen to string
    * (the fixed-schema analog of BSON heterogeneity), matching DuckDB's
    * VARCHAR casts in the oracle.
    *
    * Scale: map-only until the (k, v) count agg — one shuffle of partial
    * counts over the attribute/value keyspace, orders of magnitude
    * smaller than the input.
    */
  def d18ObjectEntries(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), struct(col("lang"), col("source"),
        col("n_chars")).as("attrs"))
    graft.Graft.aggregate(docs, """[
      {"$project": {"doc_id": 1, "kv": {"$objectToArray": "$attrs"}}},
      {"$unwind": "$kv"},
      {"$group": {"_id": {"k": "$kv.k", "v": "$kv.v"}, "n": {"$sum": 1}}},
      {"$project": {"_id": 0, "k": "$_id.k", "v": "$_id.v", "n": 1}},
      {"$sort": {"k": 1, "v": 1}}
    ]""")
  }

  val d18Sql: String =
    """WITH kv AS (
      |  SELECT 'lang' AS k, lang AS v FROM documents
      |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
      |  UNION ALL SELECT 'source', source FROM documents)
      |SELECT k, v, COUNT(*) AS n FROM kv GROUP BY k, v
      |ORDER BY k, v""".stripMargin

  // ---------------------------------------------------------------- d19
  /** `$regexFindAll` over the corpus: every `ta…` word of each document
    * with its match list — the extraction shape of PII scans and
    * span-annotation passes. idx values are covered by unit specs (the
    * oracle compares match lists and counts; DuckDB has no per-match
    * position function).
    *
    * Scale: map-only regex work per row (codegen'd array ops), shuffle
    * is only the presentation sort.
    */
  def d19RegexFindAll(spark: SparkSession, dir: String): DataFrame =
    graft.Graft.aggregate(Tables(spark, dir, "documents"), """[
      {"$project": {"doc_id": 1,
        "ms": {"$regexFindAll": {"input": "$text", "regex": "ta\\w+"}}}},
      {"$project": {"doc_id": 1,
        "n": {"$toLong": {"$size": "$ms"}},
        "words": {"$reduce": {"input": "$ms.match", "initialValue": "",
          "in": {"$concat": ["$$value", {"$cond": [
            {"$eq": ["$$value", ""]}, "", ","]}, "$$this"]}}}}},
      {"$match": {"n": {"$gt": 0}}},
      {"$sort": {"doc_id": 1}}
    ]""")

  val d19Sql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, 'ta\w+')) AS BIGINT) AS n,
      |  array_to_string(regexp_extract_all(text, 'ta\w+'), ',') AS words
      |FROM documents
      |WHERE len(regexp_extract_all(text, 'ta\w+')) > 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d20
  /** `$geoNear` proximity search oracle-gated end-to-end: deterministic
    * WGS-ish coordinates derived from supplier keys (same integer
    * arithmetic both engines), haversine meters from the origin,
    * maxDistance pre-filter, nearest-first. The oracle replicates the
    * exact formula (same operand order, IUGG radius) in DuckDB SQL;
    * ROUND(d, 0) absorbs any last-ulp divergence.
    *
    * Scale: map-only codegen'd trigonometry + one presentation sort.
    */
  def d20GeoNear(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables(spark, dir, "supplier")
      .withColumn("loc", array(
        (col("s_suppkey") * 37 % 360 - 180 + 0.5).cast("double"),
        (col("s_suppkey") * 53 % 180 - 90 + 0.5).cast("double")))
    graft.Graft.aggregate(sup, """[
      {"$geoNear": {"near": [0, 0], "key": "loc", "distanceField": "d",
                    "maxDistance": 5000000}},
      {"$project": {"s_suppkey": 1, "d": {"$round": ["$d", 0]}}},
      {"$sort": {"d": 1, "s_suppkey": 1}}
    ]""")
  }

  val d20Sql: String =
    """WITH pts AS (
      |  SELECT s_suppkey,
      |    CAST(s_suppkey * 37 % 360 - 180 + 0.5 AS DOUBLE) AS lng,
      |    CAST(s_suppkey * 53 % 180 - 90 + 0.5 AS DOUBLE) AS lat
      |  FROM supplier),
      |dists AS (
      |  SELECT s_suppkey,
      |    2 * 6371008.8 * asin(sqrt(
      |      pow(sin(radians(lat - 0) / 2), 2) +
      |      cos(radians(0)) * cos(radians(lat)) *
      |        pow(sin(radians(lng - 0) / 2), 2))) AS dist
      |  FROM pts)
      |SELECT s_suppkey, ROUND(dist, 0) AS d FROM dists
      |WHERE dist <= 5000000 ORDER BY d, s_suppkey""".stripMargin

  // ---------------------------------------------------------------- d21
  /** `$redact` field-level access control: every (sub)document carries a
    * security `level` (derived deterministically from event keys); the
    * decision expression re-evaluates at EVERY level, so a level-3
    * sub-document is pruned out of a level-1 row, a level-3 array entry
    * drops out of its array, and a level-3 row disappears entirely —
    * Mongo's canonical clearance-filter example, compiled at plan time
    * over the frame's struct schema.
    *
    * Scale: pure map-side column algebra (no UDFs, no shuffle besides the
    * presentation sort) — the per-level decisions are CaseWhen trees over
    * the same row.
    */
  def d21Redact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "events")
      .filter(col("event_id") <= 3000)
      .select(col("event_id"),
        pmod(col("user_id"), lit(5)).as("level"),
        struct(pmod(col("user_id") + 1, lit(5)).as("level"),
          col("event_type").as("note")).as("audit"),
        array(
          struct(pmod(col("event_id"), lit(5)).as("level"),
            lit("e0").as("tag")),
          struct(pmod(col("event_id") + 3, lit(5)).as("level"),
            lit("e1").as("tag"))).as("entries"))
    graft.Graft.aggregate(docs, """[
      {"$redact": {"$cond": [{"$lte": [{"$ifNull": ["$level", 0]}, 2]},
                             "$$DESCEND", "$$PRUNE"]}},
      {"$project": {"event_id": 1, "level": 1,
        "audit_note": {"$ifNull": ["$audit.note", "[redacted]"]},
        "n_entries": {"$toLong": {"$size": "$entries"}}}},
      {"$sort": {"event_id": 1}}
    ]""")
  }

  val d21Sql: String =
    """WITH d AS (
      |  SELECT event_id,
      |    user_id % 5 AS level,
      |    (user_id + 1) % 5 AS audit_level,
      |    event_type AS note,
      |    event_id % 5 AS e0,
      |    (event_id + 3) % 5 AS e1
      |  FROM events WHERE event_id <= 3000)
      |SELECT event_id, level,
      |  CASE WHEN audit_level <= 2 THEN note ELSE '[redacted]' END AS audit_note,
      |  CAST((CASE WHEN e0 <= 2 THEN 1 ELSE 0 END) +
      |       (CASE WHEN e1 <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_entries
      |FROM d WHERE level <= 2 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- d22
  /** find()-API geo query grammar oracle-gated end-to-end: the same
    * deterministic supplier coordinates as d20, filtered by a flat
    * `$geoWithin.$box` OR'd with a GeoJSON `$nearSphere` distance bound
    * (haversine meters, IUGG sphere — d20's kernel as a PREDICATE) OR'd
    * with a LITERAL flat `$geoWithin.$polygon` (ray-cast parity). The
    * oracle replicates all three branches in DuckDB SQL with the same
    * operand order — the ray-cast per-edge straddle-and-left-of-
    * intersection tests become an odd-crossing-count (XOR of booleans =
    * parity of their sum), each edge's slope written as the identical
    * IEEE double division, so the oracle and the compiled Column agree
    * bit-for-bit (the KernelOracleSql transcription pattern).
    *
    * Scale: pure map-side codegen'd boolean — pushdown-eligible like any
    * other predicate; zero shuffles before the presentation sort.
    */
  def d22GeoWithin(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables(spark, dir, "supplier")
      .withColumn("loc", array(
        (col("s_suppkey") * 37 % 360 - 180 + 0.5).cast("double"),
        (col("s_suppkey") * 53 % 180 - 90 + 0.5).cast("double")))
    sup.filter(graft.Graft.mongoFilter("""{"$or": [
        {"loc": {"$geoWithin": {"$box": [[-60, -30], [60, 30]]}}},
        {"loc": {"$nearSphere": {"$geometry": {"type": "Point",
          "coordinates": [90, 45]}, "$maxDistance": 3000000}}},
        {"loc": {"$geoWithin": {"$polygon":
          [[-150, -70], [-40, 60], [80, 75], [150, -60]]}}}]}"""))
      .select(col("s_suppkey"))
      .orderBy(col("s_suppkey"))
  }

  /** SQL twin of MongoFilter.pointInRing for the d22 literal quad: one
    * crossing term per non-horizontal edge, inside ⇔ odd crossings. */
  private def rayCastSql(ring: Seq[(Double, Double)]): String = {
    val edges = ring.zip(ring.tail :+ ring.head)
      .filter { case ((_, y1), (_, y2)) => y1 != y2 }
    val terms = edges.map { case ((x1, y1), (x2, y2)) =>
      s"""(CASE WHEN (($y1 > lat) <> ($y2 > lat))
         |  AND lng < (($x2 - $x1) / ($y2 - $y1)) * (lat - $y1) + $x1
         |  THEN 1 ELSE 0 END)""".stripMargin.replace("\n", " ")
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  val d22Sql: String =
    s"""WITH pts AS (
      |  SELECT s_suppkey,
      |    CAST(s_suppkey * 37 % 360 - 180 + 0.5 AS DOUBLE) AS lng,
      |    CAST(s_suppkey * 53 % 180 - 90 + 0.5 AS DOUBLE) AS lat
      |  FROM supplier)
      |SELECT s_suppkey FROM pts
      |WHERE (lng >= -60 AND lng <= 60 AND lat >= -30 AND lat <= 30)
      |   OR (6371008.8 * 2 * asin(sqrt(
      |        pow(sin(radians(lat - 45) / 2), 2) +
      |        cos(radians(45)) * cos(radians(lat)) *
      |          pow(sin(radians(lng - 90) / 2), 2))) <= 3000000)
      |   OR ${rayCastSql(Seq((-150.0, -70.0), (-40.0, 60.0),
             (80.0, 75.0), (150.0, -60.0)))}
      |ORDER BY s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d22_geo_within" -> (d22GeoWithin _),
    "d21_redact" -> (d21Redact _),
    "d18_object_entries" -> (d18ObjectEntries _),
    "d19_regex_findall" -> (d19RegexFindAll _),
    "d20_geo_near" -> (d20GeoNear _),
    "d17_lookup_union" -> (d17LookupUnion _),
    "d01_json_extract" -> (d01JsonExtract _),
    "d16_window_stage" -> (d16WindowStage _),
    "d05_unnest_array" -> (d05UnnestArray _),
    "d12_agg_pipeline" -> (d12AggPipeline _),
    "d13_graph_lookup" -> (d13GraphLookup _),
    "d14_densify_fill" -> (d14DensifyFill _))

  val oracle: Map[String, String] = Map(
    "d22_geo_within" -> d22Sql,
    "d21_redact" -> d21Sql,
    "d18_object_entries" -> d18Sql,
    "d19_regex_findall" -> d19Sql,
    "d20_geo_near" -> d20Sql,
    "d17_lookup_union" -> d17Sql,
    "d01_json_extract" -> d01Sql,
    "d16_window_stage" -> d16Sql,
    "d05_unnest_array" -> d05Sql,
    "d12_agg_pipeline" -> d12Sql,
    "d13_graph_lookup" -> d13Sql,
    "d14_densify_fill" -> d14Sql)
}

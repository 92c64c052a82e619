package graft

import org.apache.spark.sql.functions._

import graft.operators.DocstoreOps

/** The substring→prefix rewrite (graft.plans.SargableSubstring): parity
  * with the reference's substr pushdown (substr_filter_pushdown.test) —
  * the predicate must REACH the scan, and the rewrite must be exact on
  * the boundary cases its docstring enumerates. */
class SargableSubstringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val names =
    Seq("Alice", "Al", "A", "", "Bob", "alice", "Ann").toDF("name")

  test("substring(s,1,n) = lit rewrites exactly on every length case") {
    // len(lit) == n → StartsWith (plan shape asserted on the parquet /
    // docstore tests below — a LocalRelation constant-folds the filter
    // away entirely, which is itself evidence the rewrite is exact)
    val a = names.filter(expr("substring(name, 1, 1) = 'A'"))
    assert(a.as[String].collect().toSet == Set("Alice", "Al", "A", "Ann"))
    // len(lit) < n → plain equality (window past end returns whole string)
    val b = names.filter(expr("substring(name, 1, 3) = 'Al'"))
    assert(b.as[String].collect().toSeq == Seq("Al"))
    // len(lit) > n → can never match; NOT rewritten, still correct
    val c = names.filter(expr("substring(name, 1, 1) = 'Al'"))
    assert(c.count() == 0)
    // start != 1 → not sargable, untouched
    val d = names.filter(expr("substring(name, 2, 1) = 'l'"))
    assert(d.as[String].collect().toSet == Set("Alice", "Al", "alice"))
  }

  test("the rewritten prefix reaches the parquet scan as a pushed filter") {
    val df = Tables(spark, sfDir, "part")
      .filter(expr("substring(p_name, 1, 2) = 'bl'"))
      .select(col("p_partkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith"), plan)
    assert(plan.contains("PushedFilters: [") && plan.contains("p_name"), plan)
  }

  test("the rewritten prefix reaches the docstore scan as a pushed filter") {
    val docs = DocstoreOps.ensureEventDocs(spark, sfDir)
    val df = spark.read.format("docstore").option("path", docs).load()
      .filter(expr("substring(event_type, 1, 1) = 'c'"))
      .select(col("event_id"))
    val rows = df.count()
    assert(rows > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith"), plan)
  }

  test("the MQL $expr/$substrCP form is pushed too (null-safe $eq path)") {
    // the reference compiles {"$expr": {"$eq": [{"$substrCP": ...}, lit]}}
    // server-side (mongo_expr_pushdown.cpp); here the pipeline compiler
    // renders $eq as null-safe equality, and the rule's EqualNullSafe arm
    // turns it into IsNotNull AND prefix — both pushable
    val docs = DocstoreOps.ensureEventDocs(spark, sfDir)
    val raw = spark.read.format("docstore").option("path", docs).load()
    val mql = raw.filter(Graft.mongoFilter(
      """{"$expr": {"$eq": [{"$substrCP": ["$event_type", 0, 1]}, "c"]}}"""))
      .select(col("event_id"))
    val rows = mql.count()
    assert(rows > 0)
    // same rows as the plain prefix predicate
    assert(rows == raw.filter(expr("event_type LIKE 'c%'")).count())
    val plan = mql.queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith"), plan)
    // and through a full pipeline $match stage as well
    val piped = Graft.aggregate(raw,
      """[{"$match": {"$expr": {"$eq": [{"$substrCP": ["$event_type", 0, 1]}, "c"]}}},
         |{"$project": {"event_id": 1}}]""".stripMargin)
    assert(piped.count() == rows)
    val pplan = piped.queryExecution.executedPlan.toString
    assert(pplan.contains("StartsWith"), pplan)
  }

  test("null-safe rewrite semantics: null input is FALSE, not null") {
    val withNull = Seq(Some("Alice"), Some("Bob"), None).toDF("name")
    // SELECT-level evaluation exposes the three-valued difference a WHERE
    // clause would mask: <=> must stay false on null input after rewrite
    val out = withNull
      .select(expr("substring(name, 1, 1) <=> 'A'").as("m"))
      .as[Boolean].collect().toSeq
    assert(out.sorted == Seq(false, false, true))
  }
}

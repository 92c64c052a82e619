package graft

/** PlanSweep's recursion guard (VERDICT r10 #8): UnionLoopExec is a
  * LEAF physical node whose anchor/recursion logical plans never print
  * in plan text — the guard must descend into them explicitly, or a
  * corpus-anchored recursive CTE ships invisibly. */
class RecursionGuardSpec extends SparkSpec {
  import graft.tools.PlanSweep

  private def loopAnchors(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.queryExecution.toRdd.count()
    PlanSweep.recursionFactAnchors(
      PlanSweep.allNodes(df.queryExecution.executedPlan))
  }

  test("q35's dimension-graph recursion carries NO fact-table anchor") {
    val anchors = loopAnchors(
      SparkEntry.queries("q35_recursive_cte")(spark, sfDir))
    assert(anchors.isEmpty, s"q35 anchors a fact table: $anchors")
  }

  test("a fact-table-anchored recursive CTE IS flagged — the class the " +
      "guard exists for") {
    Tables(spark, sfDir, "documents").createOrReplaceTempView("rg_docs")
    val df = spark.sql(
      """WITH RECURSIVE r(n) AS (
        |  SELECT doc_id FROM rg_docs WHERE doc_id < 3
        |  UNION ALL
        |  SELECT n + 1 FROM r WHERE n < 5)
        |SELECT * FROM r""".stripMargin)
    val anchors = loopAnchors(df)
    assert(anchors == Seq("documents"),
      s"guard missed the documents-anchored loop: $anchors")
  }
}

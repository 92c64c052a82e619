package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property-based parity for the aggregation-pipeline compiler: random
  * `$match` filters and random `$group` accumulator sets, built ONCE as
  * pipeline JSON and ONCE as native DataFrame algebra, must agree row
  * for row. Each operator has a value-pinned example spec; this catches
  * the composition bugs (operator interplay, null propagation through
  * stages, type coercion in accumulators) no example test enumerates.
  */
class PipelineParitySpec extends SparkSpec {
  import spark.implicits._

  // events slice with nulls planted in both the filter and agg columns
  private lazy val ev: DataFrame = Tables(spark, sfDir, "events")
    .select(col("event_id"), col("user_id"), col("event_type"),
      when(col("event_id") % 13 === 0, lit(null)).otherwise(col("value"))
        .as("value"))
    .localCheckpoint()

  private val rnd = new scala.util.Random(20260812L)

  private def hashOf(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).sorted.toSeq

  private def samePlanOutput(name: String, piped: DataFrame, native: DataFrame): Unit =
    assert(hashOf(piped) == hashOf(native), s"parity broke for $name")

  test("random $match filters match native Column predicates (40 cases)") {
    for (i <- 1 to 40) {
      val (json, native): (String, Column) = rnd.nextInt(7) match {
        case 0 =>
          val t = rnd.nextInt(200)
          (s"""{"value": {"$$gt": $t}}""", col("value") > t)
        case 1 =>
          val t = rnd.nextInt(200)
          (s"""{"value": {"$$lte": $t}}""", col("value") <= t)
        case 2 =>
          val u = rnd.nextInt(150)
          (s"""{"user_id": $u}""", col("user_id") === u)
        case 3 =>
          val ts = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(150))
          (s"""{"user_id": {"$$in": [${ts.mkString(",")}]}}""",
            col("user_id").isin(ts: _*))
        case 4 =>
          val (a, b) = (rnd.nextInt(100), 100 + rnd.nextInt(100))
          (s"""{"value": {"$$gte": $a, "$$lt": $b}}""",
            col("value") >= a && col("value") < b)
        case 5 =>
          (s"""{"value": null}""", col("value").isNull)
        case _ =>
          val t = rnd.nextInt(200)
          // $ne matches nulls (Mongo tri-state rule) — the composition
          // most likely to regress
          (s"""{"value": {"$$ne": $t.0}}""",
            !(col("value") <=> lit(t.toDouble)))
      }
      samePlanOutput(s"case $i: $json",
        Graft.aggregate(ev, s"""[{"$$match": $json}]"""),
        ev.filter(native))
    }
  }

  test("random $group accumulator sets match native groupBy (25 cases)") {
    val accPool: Seq[(String, String => Column)] = Seq(
      ("""{"$sum": "$value"}""", a => sum(col("value")).as(a)),
      ("""{"$avg": "$value"}""", a => avg(col("value")).as(a)),
      ("""{"$min": "$value"}""", a => min(col("value")).as(a)),
      ("""{"$max": "$value"}""", a => max(col("value")).as(a)),
      ("""{"$sum": 1}""", a => sum(lit(1L)).as(a)),
      ("""{"$count": {}}""", a => count(lit(1)).as(a)),
      ("""{"$stdDevPop": "$value"}""", a => stddev_pop(col("value")).as(a)),
      ("""{"$addToSet": "$event_type"}""",
        a => array_sort(collect_set(col("event_type"))).as(a)))
    for (i <- 1 to 25) {
      val picks = rnd.shuffle(accPool.toList).take(1 + rnd.nextInt(4))
      val aliases = picks.zipWithIndex.map { case (_, j) => s"a$j" }
      val json = picks.zip(aliases)
        .map { case ((j, _), a) => s""""$a": $j""" }.mkString(", ")
      val byUser = rnd.nextBoolean()
      val (idJson, idNative) =
        if (byUser) ("\"$user_id\"", col("user_id")) else ("\"$event_type\"", col("event_type"))
      val piped = Graft.aggregate(ev,
        s"""[{"$$group": {"_id": $idJson, $json}}]""")
      val native = ev.groupBy(idNative.as("_id"))
        .agg(picks.head._2(aliases.head),
          picks.tail.zip(aliases.tail).map { case ((_, f), a) => f(a) }: _*)
      // doubles: round both sides so summation order can't flake the hash
      def rounded(df: DataFrame): DataFrame =
        df.select(df.columns.map { c =>
          if (df.schema(c).dataType == org.apache.spark.sql.types.DoubleType)
            round(col(c), 6).as(c)
          else col(c)
        }: _*)
      samePlanOutput(s"case $i: group by $idJson of $json",
        rounded(piped), rounded(native))
    }
  }

  test("round-6 scalar operators match native functions (30 cases)") {
    // bitwise / byte-string / inverse-hyperbolic / set-equality — randoms
    // run through the same null-planted frame, so null propagation is
    // covered on every path
    for (i <- 1 to 30) {
      val (json, native): (String, Column) = rnd.nextInt(11) match {
        case 0 =>
          val m = rnd.nextInt(1 << 16)
          (s"""{"$$bitAnd": ["$$event_id", $m]}""",
            col("event_id").bitwiseAND(lit(m.toLong)))
        case 1 =>
          val m = rnd.nextInt(1 << 16)
          (s"""{"$$bitOr": ["$$event_id", $m]}""",
            col("event_id").bitwiseOR(lit(m.toLong)))
        case 2 =>
          val m = rnd.nextInt(1 << 16)
          (s"""{"$$bitXor": ["$$user_id", $m]}""",
            col("user_id").bitwiseXOR(lit(m.toLong)))
        case 3 =>
          ("""{"$bitNot": "$event_id"}""", bitwise_not(col("event_id")))
        case 4 =>
          ("""{"$strLenBytes": "$event_type"}""", octet_length(col("event_type")))
        case 5 =>
          val (s0, l0) = (rnd.nextInt(3), 1 + rnd.nextInt(4))
          (s"""{"$$substrBytes": ["$$event_type", $s0, $l0]}""",
            substring(col("event_type").cast("binary"), s0 + 1, l0)
              .cast("string"))
        case 6 =>
          ("""{"$asinh": {"$divide": [{"$ifNull": ["$value", 0]}, 100]}}""",
            asinh(coalesce(col("value"), lit(0L)).cast("double") / 100))
        case 7 =>
          // sets equal iff the (distinct, sorted) views agree — argument
          // order and duplicates must not matter
          (s"""{"$$setEquals": [["$$event_type", "x", "x"],
                                ["x", "$$event_type", "$$event_type"]]}""",
            array_sort(array_distinct(array(col("event_type"), lit("x"), lit("x")))) ===
              array_sort(array_distinct(array(lit("x"), col("event_type"), col("event_type")))))
        case 8 => // deprecated $substr = byte-addressed $substrBytes
          val (s0, l0) = (rnd.nextInt(3), 1 + rnd.nextInt(4))
          (s"""{"$$substr": ["$$event_type", $s0, $l0]}""",
            substring(col("event_type").cast("binary"), s0 + 1, l0)
              .cast("string"))
        case 9 => // ranged code-point index (index in the ORIGINAL string)
          val (s0, e0) = (rnd.nextInt(3), 2 + rnd.nextInt(6))
          val win = substring(col("event_type"), s0 + 1, e0 - s0)
          (s"""{"$$indexOfCP": ["$$event_type", "e", $s0, $e0]}""",
            when(lit(s0) > length(col("event_type")), -1)
              .otherwise(when(instr(win, "e") === 0, -1)
                .otherwise(instr(win, "e") - 1 + s0)).cast("int"))
        case _ => // byte index = octet length of the code-point prefix
          (s"""{"$$indexOfBytes": ["$$event_type", "i"]}""",
            when(instr(col("event_type"), "i") === 0, -1)
              .otherwise(octet_length(substring(col("event_type"), lit(1),
                instr(col("event_type"), "i") - 1))).cast("int"))
      }
      samePlanOutput(s"case $i: $json",
        Graft.aggregate(ev, s"""[{"$$project": {"event_id": 1, "out": $json}}]"""),
        ev.select(col("event_id"), native.as("out")))
    }
  }

  test("composed $match → $group → $sort pipelines match native chains (15 cases)") {
    for (i <- 1 to 15) {
      val t = rnd.nextInt(150)
      val piped = Graft.aggregate(ev, s"""[
        {"$$match": {"value": {"$$gte": $t}}},
        {"$$group": {"_id": "$$event_type", "n": {"$$sum": 1},
                     "total": {"$$sum": "$$value"}}},
        {"$$addFields": {"total": {"$$round": ["$$total", 4]}}},
        {"$$sort": {"_id": 1}}
      ]""")
      val native = ev.filter(col("value") >= t)
        .groupBy(col("event_type").as("_id"))
        .agg(sum(lit(1L)).as("n"), sum(col("value")).as("total"))
        .withColumn("total", round(col("total"), 4))
        .orderBy(col("_id"))
      samePlanOutput(s"case $i: threshold $t", piped, native)
    }
  }

  test("expression chains ($addFields $map/$range → $unwind → $project → $match) match native (20 cases)") {
    // the higher-order-function + explode + computed-projection
    // composition path, with nulls flowing through the lambda
    for (i <- 1 to 20) {
      val k = 1 + rnd.nextInt(4)
      val t = rnd.nextInt(300)
      val opIdx = rnd.nextInt(3)
      val (jsonOp, nativeOp): (String, (Column, Column) => Column) = opIdx match {
        case 0 => ("$add", _ + _)
        case 1 => ("$subtract", _ - _)
        case _ => ("$multiply", _ * _)
      }
      val piped = Graft.aggregate(ev, s"""[
        {"$$addFields": {"arr": {"$$map": {
          "input": {"$$range": [0, $k]}, "as": "j",
          "in": {"$jsonOp": ["$$$$j", {"$$ifNull": ["$$value", 0]}]}}}}},
        {"$$unwind": "$$arr"},
        {"$$project": {"event_id": 1, "user_id": 1,
                       "v2": {"$$multiply": ["$$arr", 2]}}},
        {"$$match": {"v2": {"$$gte": $t}}}
      ]""")
      val native = ev
        .withColumn("arr", transform(
          sequence(lit(0L), lit((k - 1).toLong), lit(1L)),
          j => nativeOp(j, coalesce(col("value"), lit(0L)))))
        .withColumn("arr", explode(col("arr")))
        .select(col("event_id"), col("user_id"), (col("arr") * 2).as("v2"))
        .filter(col("v2") >= t)
      samePlanOutput(s"case $i: k=$k op=$jsonOp t=$t", piped, native)
    }
  }
}

package graft

import java.nio.file.{Files, Paths}

/** Fuzz the document layer end to end: random extended-JSON collections
  * with deliberately conflicting field types, nesting, arrays, ObjectIds
  * and dates must always infer a schema, scan fully under permissive
  * mode, and produce a STABLE schema (re-inference agrees with itself).
  * This is the surface the reference hardens case by case (the
  * test/sql/schema suite); the fuzz covers the combinations those
  * examples miss.
  */
class InferenceFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)
  private val names = Seq("a", "b", "c", "d", "e", "nest", "tag")

  private def hex24(): String =
    (0 until 24).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString

  private def value(depth: Int): String = rnd.nextInt(if (depth > 0) 9 else 7) match {
    case 0 => rnd.nextLong().toString
    case 1 => (rnd.nextDouble() * 1000 - 500).toString
    case 2 => "\"s" + rnd.nextInt(100) + "\""
    case 3 => rnd.nextBoolean().toString
    case 4 => "null"
    case 5 => s"""{"$$oid":"${hex24()}"}"""
    case 6 =>
      val d = java.time.Instant.ofEpochMilli(rnd.between(0L, 1900000000000L))
      s"""{"$$date":"$d"}"""
    case 7 => // array of same-depth values (possibly empty / mixed)
      (0 until rnd.nextInt(4)).map(_ => value(depth - 1))
        .mkString("[", ",", "]")
    case 8 => doc(depth - 1) // nested document
  }

  private def doc(depth: Int): String = {
    val n = rnd.nextInt(names.size)
    rnd.shuffle(names).take(n)
      .map(k => s""""$k":${value(depth)}""").mkString("{", ",", "}")
  }

  test("120 random conflicting docs: inference succeeds, permissive scan" +
      " reads every doc, schema is stable across re-inference") {
    val dir = "/tmp/graft_docstore_spec/fuzz"
    Files.createDirectories(Paths.get(dir))
    val docs = (0 until 120).map(_ => doc(2))
    Files.write(Paths.get(s"$dir/docs.jsonl"),
      docs.mkString("", "\n", "\n").getBytes("UTF-8"))

    val df = spark.read.format("docstore").option("path", dir).load()
    assert(df.count() == 120)
    df.collect() // every value must convert (permissive: mismatch → null)
    val again = spark.read.format("docstore").option("path", dir).load()
    assert(again.schema == df.schema, "re-inference disagreed with itself")

    // dropmalformed never yields MORE rows than permissive, failfast
    // either reads all 120 or raises the documented error class
    val dropped = spark.read.format("docstore").option("path", dir)
      .option("schemamode", "dropmalformed").load().count()
    assert(dropped <= 120)
    try {
      spark.read.format("docstore").option("path", dir)
        .option("schemamode", "failfast").load().count()
    } catch {
      case e: Throwable =>
        def chain(t: Throwable): Seq[String] =
          if (t == null) Nil else t.toString +: chain(t.getCause)
        assert(chain(e).exists(_.contains("failfast")),
          s"unexpected failfast error: $e")
    }
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.DocstoreOps

class DocstoreSpec extends SparkSpec {

  private def writeDocs(name: String, lines: Seq[String]): String = {
    val dir = s"/tmp/graft_docstore_spec/$name"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/docs.jsonl"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    dir
  }

  lazy val smallDir: String = writeDocs("small", (0 until 50).map(i =>
    s"""{"id":$i,"name":"row$i","grp":"g${i % 3}","score":${i * 1.5}}"""))

  test("gzip collections: inference + parity + whole-file partitions") {
    val dir = "/tmp/graft_docstore_spec/gz"
    Files.createDirectories(Paths.get(dir))
    def gzWrite(f: String, lines: Seq[String]): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$dir/$f"))
      out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      out.close()
    }
    val a = (0 until 40).map(i => s"""{"id":$i,"grp":"g${i % 3}"}""")
    val b = (40 until 60).map(i => s"""{"id":$i,"grp":"g${i % 3}"}""")
    gzWrite("a.jsonl.gz", a)
    gzWrite("b.jsonl.gz", b)
    // a tiny splitsize must NOT split compressed files: one partition per
    // .gz, decompressed transparently (schema inference reads them too)
    val df = spark.read.format("docstore").option("path", dir)
      .option("splitsize", "64").load()
    assert(df.columns.toSet == Set("id", "grp"))
    assert(df.count() == 60)
    assert(df.rdd.getNumPartitions == 2, df.rdd.getNumPartitions)
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0 until 60).sum.toLong)
    // pushdown still applies inside the decompressed stream
    assert(df.filter(col("grp") === "g1").count() == 20)
    // a plain file at the same splitsize DOES split (the contract differs)
    val plainDir = writeDocs("gz_plain", a ++ b)
    val plain = spark.read.format("docstore").option("path", plainDir)
      .option("splitsize", "64").load()
    assert(plain.count() == 60)
    assert(plain.rdd.getNumPartitions > 2)
  }

  test("batch scans pin their file snapshot for the query's lifetime") {
    import graft.sources.{DocstoreOptions, DocstoreScanBuilder, DocstoreTable}
    // the analog of the reference's per-query transaction snapshot
    // (reference src/mongo_transaction.cpp:1): once a batch Scan exists,
    // a concurrent append or $merge commit must NOT change its input set
    // — AQE re-planning and task retries re-list through the pinned
    // snapshot (file names AND byte lengths)
    val dir = s"/tmp/graft_docstore_spec/snapshot_${System.nanoTime()}"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/a.jsonl"),
      (0 until 5).map(i => s"""{"id":$i}""").mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    val opts = DocstoreOptions(Map("path" -> dir))
    val schema = DocstoreTable.inferSchema(opts)
    val batch = new DocstoreScanBuilder(schema, opts).build().toBatch
    val p1 = batch.planInputPartitions().toSeq
    // concurrent commits mid-query: a new collection file appears AND the
    // existing file grows in place
    Files.write(Paths.get(s"$dir/b.jsonl"),
      """{"id":100}""".concat("\n").getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/a.jsonl"),
      """{"id":101}""".concat("\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val p2 = batch.planInputPartitions().toSeq
    assert(p2 == p1, "a running query's input set changed under it")
    // a NEW query (new Scan) sees the committed state
    val fresh = new DocstoreScanBuilder(schema, opts).build().toBatch
      .planInputPartitions().toSeq
    assert(fresh != p1 && fresh.size >= p1.size)
  }

  test("unsupported patterns fall back to Spark above the scan (ref pushdown_negative.test)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.format("docstore").option("path", smallDir).load()
    // COUNT(DISTINCT col): distinct aggregation is never pushed — Spark
    // aggregates above the scan, result stays exact
    val cd = df.select(countDistinct(col("grp")))
    assert(!explainText(cd).contains("PushedAggregates"), explainText(cd))
    assert(cd.head.getLong(0) == 3)
    // TopN on a computed sort key: no NamedReference → no TopN push;
    // Spark's TakeOrderedAndProject handles it above a full scan
    val topn = df.orderBy(length(col("name")), col("id")).limit(3)
    assert(!explainText(topn).contains("PushedTopN"), explainText(topn))
    assert(topn.collect().map(_.getAs[Long]("id")).toSeq == Seq(0L, 1L, 2L))
    // arithmetic predicate: not translatable to a source Filter — only
    // the inferred IsNotNull pushes; Spark evaluates the equality above
    // the scan and rows stay exact
    val f = df.filter(col("id") * 2 === 10)
    val fp = explainText(f)
    assert(!fp.contains("EqualTo"), fp) // the arithmetic never reaches the scan
    assert(fp.contains("Filter"), fp)   // Spark-side filter handles it
    assert(f.head.getAs[Long]("id") == 5L)
  }

  test("SQL DDL surface: CREATE TEMPORARY VIEW ... USING docstore") {
    // the reference's users live in SQL — the source must mount without
    // any Scala-side reader calls
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW ddl_docs
      USING docstore OPTIONS (path '$smallDir', samplesize '50')""")
    assert(spark.sql("SELECT COUNT(*) FROM ddl_docs").head.getLong(0) == 50)
    val plan = explainText(
      spark.sql("SELECT id, name FROM ddl_docs WHERE grp = 'g1' AND id > 10"))
    assert(plan.contains("docstore") && plan.contains("grp"), plan)
    assert(spark.sql(
      "SELECT COUNT(*) FROM ddl_docs WHERE grp = 'g1' AND id > 10")
      .head.getLong(0) == 13)
  }

  test("reads jsonl docs with inferred schema") {
    val df = spark.read.format("docstore").option("path", smallDir).load()
    assert(df.count() == 50)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("score").dataType == DoubleType)
  }

  test("byte-range splits cover every line exactly once") {
    // tiny splits force many partitions with straddling lines
    val df = spark.read.format("docstore").option("path", smallDir)
      .option("splitsize", "64").load()
    assert(df.rdd.getNumPartitions > 5)
    assert(df.count() == 50)
    assert(df.agg(sum("id")).head.getLong(0) == (0 until 50).sum)
  }

  test("filter, projection, and limit push into the docstore scan") {
    val df = spark.read.format("docstore").option("path", smallDir).load()
      .filter(col("grp") === "g1" && col("id") > 10)
      .select("id", "name")
    val plan = explainText(df)
    assert(plan.contains("docstore"), plan)
    assert(plan.contains("grp"), plan)          // pushed filter visible
    assert(!plan.toLowerCase.contains("score")) // pruned column gone
    assert(df.count() == 13)

    val limited = spark.read.format("docstore").option("path", smallDir).load().limit(3)
    assert(limited.collect().length == 3)
  }

  test("unsupported patterns stay residual and still compute correctly " +
      "(ref pushdown_negative.test)") {
    // mirrors test/sql/query/pushdown_negative.test: what the source
    // can't evaluate must run ABOVE the scan, never silently push
    val df = spark.read.format("docstore").option("path", smallDir).load()
    // expression filter (length(name) > 4) — not a DSv2 source filter at
    // all; Spark keeps a Filter node and results are exact
    val exprFilter = df.filter(length(col("name")) > 4)
    assert(explainText(exprFilter).contains("Filter"),
      explainText(exprFilter))
    assert(exprFilter.count() == 40) // row10..row49
    // COUNT(DISTINCT col) — distinct aggregation is never pushed; a
    // HashAggregate must sit above the scan and the value is exact
    val cd = df.agg(countDistinct(col("grp")))
    assert(explainText(cd).contains("HashAggregate"), explainText(cd))
    assert(cd.head.getLong(0) == 3)
    // GROUP BY on an expression (id % 10) — grouped agg pushdown only
    // accepts plain columns; the grouped HashAggregate stays in Spark
    val ge = df.groupBy((col("id") % 10).as("dec")).count()
    assert(explainText(ge).contains("HashAggregate"), explainText(ge))
    assert(ge.count() == 10)
    // ORDER BY + LIMIT on a non-pushable sort stays a Spark TopN
    val tn = df.orderBy(col("score").desc).limit(2)
    assert(explainText(tn).contains("TakeOrderedAndProject"), explainText(tn))
    assert(tn.select("id").collect().map(_.getLong(0)).toSeq == Seq(49L, 48L))
  }

  test("ObjectId _id filters: equality, IN, range push down (ref objectid_filter.test)") {
    // reference: test/sql/query/objectid_filter.test — ObjectId equality,
    // IN lists, and range comparisons on _id (mapped to 24-hex VARCHAR),
    // plus plain-string _id collections treated identically
    val dir = writeDocs("oid_filter", Seq(
      """{"_id":{"$oid":"507f1f77bcf86cd799439011"},"name":"Alice","email":"alice@example.com"}""",
      """{"_id":{"$oid":"507f1f77bcf86cd799439012"},"name":"Bob","email":"bob@example.com"}""",
      """{"_id":{"$oid":"507f1f77bcf86cd799439013"},"name":"Charlie","email":"charlie@example.com"}"""))
    val df = spark.read.format("docstore").option("path", dir).load()
    val eq = df.filter(col("_id") === "507f1f77bcf86cd799439011")
    assert(explainText(eq).contains("_id"), "equality on _id not pushed")
    assert(eq.select("name").collect().map(_.getString(0)).toSeq == Seq("Alice"))
    assert(df.filter(col("_id").isin(
        "507f1f77bcf86cd799439011", "507f1f77bcf86cd799439013"))
      .orderBy("name").select("name").collect().map(_.getString(0)).toSeq
      == Seq("Alice", "Charlie"))
    assert(df.filter(col("_id") > "507f1f77bcf86cd799439011" &&
        col("_id") <= "507f1f77bcf86cd799439013")
      .orderBy("_id").select("name").collect().map(_.getString(0)).toSeq
      == Seq("Bob", "Charlie"))
    // plain-string _id (NOT ObjectId) — same behavior, no special-casing
    val sdir = writeDocs("string_id", Seq(
      """{"_id":"aaaaaaaaaaaaaaaaaaaaaaaa","name":"Doc1","value":100}""",
      """{"_id":"bbbbbbbbbbbbbbbbbbbbbbbb","name":"Doc2","value":200}"""))
    val sdf = spark.read.format("docstore").option("path", sdir).load()
    assert(sdf.filter(col("_id") === "aaaaaaaaaaaaaaaaaaaaaaaa")
      .select("value").head.getLong(0) == 100L)
  }

  test("array-of-struct items: element access, missing fields, empty arrays (ref array_items.test)") {
    // reference: test/sql/schema/array_items.test — LIST(STRUCT) mapping,
    // 1-based element access, missing struct fields → NULL, empty arrays
    // stay [] (not NULL), UNNEST expands rows
    val dir = writeDocs("array_items", Seq(
      """{"order_id":"ORD-001","items":[{"product":"Laptop","quantity":1,"price":999.99},{"product":"Mouse","quantity":2,"price":29.99}]}""",
      """{"order_id":"ORD-003","items":[]}""",
      """{"order_id":"ORD-004","items":[{"product":"Keyboard","quantity":1}],"notes":["urgent","gift"]}"""))
    val df = spark.read.format("docstore").option("path", dir).load()
    // element_at is Spark's 1-based list_extract analog
    val first = df.filter(col("order_id") === "ORD-001")
      .select(element_at(col("items"), 1).getField("product"),
        element_at(col("items"), 2).getField("quantity")).head
    assert(first.getString(0) == "Laptop" && first.getLong(1) == 2L)
    // missing struct field inside an array element → NULL, row survives
    val ord4 = df.filter(col("order_id") === "ORD-004")
      .select(element_at(col("items"), 1).getField("price")).head
    assert(ord4.isNullAt(0))
    // empty array is [], not NULL
    assert(df.filter(col("order_id") === "ORD-003" && size(col("items")) === 0)
      .count() == 1)
    // UNNEST (explode) expands array elements into rows
    val exploded = df.filter(col("order_id") === "ORD-001")
      .select(explode(col("items")).as("it"))
      .select(col("it.product")).orderBy("product")
      .collect().map(_.getString(0)).toSeq
    assert(exploded == Seq("Laptop", "Mouse"))
  }

  test("filter on non-projected column still works") {
    val df = spark.read.format("docstore").option("path", smallDir).load()
      .filter(col("id") === 7).select("name")
    assert(df.as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq == Seq("row7"))
  }

  test("schema modes: permissive nulls, dropmalformed drops, failfast throws") {
    val res = DocstoreOps.d07SchemaModes(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(res("permissive_rows") == "4")     // unparseable line dropped
    assert(res("permissive_null_a") == "1")   // mismatch → null
    assert(res("dropmalformed_rows") == "3")  // mismatch row dropped too
    assert(res("failfast") == "failfast-error")
  }

  test("type zoo maps every BSON type per the reference table") {
    DocstoreOps.typeZooDocs()
    val df = spark.read.format("docstore")
      .option("path", "/tmp/graft_docstore/type_zoo").load()
    val t = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(t("_id") == StringType)
    assert(t("i32") == LongType && t("i64") == LongType)
    assert(t("dbl") == DoubleType && t("dec") == DoubleType)
    assert(t("b") == BooleanType)
    assert(t("ts") == TimestampType)
    assert(t("day") == DateType) // midnight-UTC rule
    assert(t("bin") == BinaryType)
    assert(t("arr") == ArrayType(LongType, containsNull = true))
    assert(t("arrdoc").isInstanceOf[ArrayType])
    assert(t("re") == StringType && t("nul") == StringType)
    // Int64 beyond double precision survives exactly
    assert(df.filter(col("s") === "alpha").select("i64").head.getLong(0)
      == 9007199254740993L)
  }

  test("catalog lists namespaces and tables, scans collections") {
    val root = DocstoreOps.catalogRoot()
    spark.conf.set("spark.sql.catalog.graftmongo", "graft.sources.DocstoreCatalog")
    spark.conf.set("spark.sql.catalog.graftmongo.root", root)
    val ns = spark.sql("SHOW NAMESPACES IN graftmongo")
      .collect().map(_.getString(0)).toSet
    assert(ns == Set("salesdb", "webdb"))
    val tables = spark.sql("SHOW TABLES IN graftmongo.salesdb")
      .collect().map(_.getString(1)).toSet
    assert(tables == Set("orders_east", "orders_west"))
    val row = spark.sql("SELECT coll, n FROM graftmongo.webdb.clicks").head
    assert(row.getString(0) == "clicks" && row.getLong(1) == 1L)
  }

  test("doc scan matches source parquet row-for-row (round trip)") {
    val docs = DocstoreOps.ensureEventDocs(spark, sfDir)
    val viaDocs = spark.read.format("docstore").option("path", docs).load()
      .select("event_id", "user_id", "event_type", "value")
    val viaParquet = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    assert(viaDocs.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(viaDocs).isEmpty)
  }

  test("aggregate pushdown: COUNT/SUM/MIN/MAX with GROUP BY reach the reader") {
    import org.apache.spark.sql.functions._
    val docs = DocstoreOps.ensureEventDocs(spark, sfDir)
    val agg = spark.read.format("docstore").option("path", docs).load()
      .filter(col("value") > 10.0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"),
        min(col("value")).as("mn"), max(col("user_id")).as("mx"))
    val plan = explainText(agg)
    assert(plan.contains("PushedAggregates"), plan)
    assert(plan.contains("PushedGroupBy: [event_type]"), plan)
    // ROUND on the double sums: the chunked doc layout accumulates partial
    // sums in a different order than the parquet scan — low-bit ulps are
    // expected, equality is on the rounded value (same rule as the oracle)
    val viaParquet = Tables(spark, sfDir, "events")
      .filter(col("value") > 10.0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"),
        min(col("value")).as("mn"), max(col("user_id")).as("mx"))
    val a = agg.orderBy("event_type").collect().map(_.toSeq).toSeq
    val b = viaParquet.orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("aggregate pushdown: global aggregate counts zero on empty match") {
    import org.apache.spark.sql.functions._
    val docs = DocstoreOps.ensureEventDocs(spark, sfDir)
    val df = spark.read.format("docstore").option("path", docs).load()
      .filter(col("value") > 1e18) // matches nothing
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    val r = df.head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
    val all = spark.read.format("docstore").option("path", docs).load()
      .agg(count(lit(1)).as("n")).head.getLong(0)
    assert(all == Tables(spark, sfDir, "events").count())
  }

  test("aggregate pushdown declines unsupported shapes (avg, distinct)") {
    import org.apache.spark.sql.functions._
    val docs = DocstoreOps.ensureEventDocs(spark, sfDir)
    val df = spark.read.format("docstore").option("path", docs).load()
      .groupBy(col("event_type"))
      .agg(round(avg(col("value")), 4).as("a"),
        countDistinct(col("user_id")).as("d"))
    assert(!explainText(df).contains("PushedAggregates"))
    // still correct through the ordinary scan (rounded: summation order
    // differs between the chunked doc layout and the parquet scan)
    val viaParquet = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(round(avg(col("value")), 4).as("a"),
        countDistinct(col("user_id")).as("d"))
    assert(df.orderBy("event_type").collect().map(_.toSeq).toSeq
      == viaParquet.orderBy("event_type").collect().map(_.toSeq).toSeq)
  }

  test("TopN pushdown: ORDER BY ... LIMIT runs as bounded heap per split") {
    val df = spark.read.format("docstore").option("path", smallDir)
      .option("splitsize", "256").load()
      .orderBy(col("score").desc, col("id"))
      .limit(4)
    val plan = explainText(df)
    assert(plan.contains("PushedTopN"), plan)
    assert(df.select("id").collect().map(_.getLong(0)).toSeq
      == Seq(49L, 48L, 47L, 46L))
    // ascending + tie-break & nulls: name asc then id
    val asc = spark.read.format("docstore").option("path", smallDir).load()
      .orderBy(col("grp").asc, col("id").desc).limit(3)
    assert(asc.select("id").collect().map(_.getLong(0)).toSeq
      == Seq(48L, 45L, 42L)) // g0 ids descending
  }

  test("__schema document overrides inference with types and path mapping") {
    val dir = writeDocs("schema_doc", Seq(
      """{"__schema":{"id":"BIGINT","label":{"path":"meta.name","type":"VARCHAR"},"score":{"path":"metrics.s","type":"DOUBLE"},"tags":"VARCHAR[]"}}""",
      """{"id":1,"meta":{"name":"a"},"metrics":{"s":1.5},"tags":["x"]}""",
      """{"id":2,"meta":{"name":"b"},"metrics":{"s":2.5},"tags":["y","z"]}"""))
    val df = spark.read.format("docstore").option("path", dir).load()
    assert(df.schema.fieldNames.toSeq == Seq("id", "label", "score", "tags"))
    assert(df.schema("label").dataType == StringType)
    assert(df.schema("tags").dataType == ArrayType(StringType, containsNull = true))
    // the __schema row is metadata, not data
    assert(df.count() == 2)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == "a" && rows(0).getDouble(2) == 1.5)
    assert(rows(1).getString(1) == "b" && rows(1).getSeq[String](3) == Seq("y", "z"))
  }

  test("multi-byte UTF-8 lines survive byte-range splitting exactly") {
    // 3-byte CJK chars + emoji straddle the 64-byte split boundaries
    val lines = (0 until 40).map(i =>
      s"""{"id":$i,"s":"\u6587\u6863\u5904\u7406 \ud83d\ude00 line$i \u00e9\u00fc"}""")
    val dir = writeDocs("unicode", lines)
    val df = spark.read.format("docstore").option("path", dir)
      .option("splitsize", "64").load()
    assert(df.count() == 40)
    val s7 = df.where(col("id") === 7).select("s").head.getString(0)
    assert(s7 == "\u6587\u6863\u5904\u7406 \ud83d\ude00 line7 \u00e9\u00fc")
  }

  test("empty files and CRLF line endings are handled") {
    val dir = s"/tmp/graft_docstore_spec/mixed"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/empty.jsonl"),
      Array.empty[Byte])
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/crlf.jsonl"),
      "{\"a\":1}\r\n{\"a\":2}\r\n".getBytes("UTF-8"))
    val df = spark.read.format("docstore").option("path", dir).load()
    assert(df.count() == 2)
    assert(df.agg(sum("a")).head.getLong(0) == 3L)
  }

  test("docstore write: collections round-trip through the sink") {
    val outDir = "/tmp/graft_docstore_spec/write_out"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    val src = spark.read.format("docstore").option("path", smallDir).load()
      .filter(col("id") < 20)
    src.write.format("docstore").option("path", outDir).mode("append").save()
    val back = spark.read.format("docstore").option("path", outDir).load()
    assert(back.count() == 20)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // overwrite truncates previous content
    src.filter(col("id") < 5).write.format("docstore")
      .option("path", outDir).mode("overwrite").save()
    assert(spark.read.format("docstore").option("path", outDir).load().count() == 5)
  }

  test("docstore write: in-progress temp files are invisible to readers") {
    val outDir = "/tmp/graft_docstore_spec/atomic_out"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    spark.read.format("docstore").option("path", smallDir).load()
      .filter(col("id") < 10)
      .write.format("docstore").option("path", outDir).mode("append").save()
    // a crashed task's orphan temp file must never surface as rows
    Files.write(Paths.get(s"$outDir/.part-99999-0.jsonl.inprogress"),
      """{"id":999,"name":"ghost","grp":"gx","score":0.0}""".getBytes("UTF-8"))
    val back = spark.read.format("docstore").option("path", outDir).load()
    assert(back.count() == 10)
    assert(back.filter(col("name") === "ghost").count() == 0)
    // all committed files carry final (non-dot) names
    val names = new java.io.File(outDir).listFiles.map(_.getName)
    assert(names.count(_.startsWith("part-")) > 0)
    // no committed task may leave its temp behind (local-FS .crc
    // checksum sidecars are dot-prefixed and reader-invisible — fine)
    assert(!names.exists(n => n.endsWith(".inprogress") &&
      n != ".part-99999-0.jsonl.inprogress"))
  }

  test("binary order comparisons use unsigned lexicographic bytes") {
    // 0x80 > 0x7f unsigned, though negative as signed byte; a prefix
    // compares less than its extension
    val dir = writeDocs("binorder", Seq(
      """{"id":1,"bin":{"$binary":{"base64":"fw==","subType":"00"}}}""", // [0x7f]
      """{"id":2,"bin":{"$binary":{"base64":"gA==","subType":"00"}}}""", // [0x80]
      """{"id":3,"bin":{"$binary":{"base64":"gAE=","subType":"00"}}}""")) // [0x80,0x01]
    val df = spark.read.format("docstore").option("path", dir).load()
    val gt = df.filter(col("bin") > lit(Array[Byte](0x7f.toByte)))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(gt.toSeq == Seq(2L, 3L))
    val lt = df.filter(col("bin") < lit(Array[Byte](0x80.toByte, 0x01)))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(lt.toSeq == Seq(1L, 2L))
  }

  test("case-variant fields scan without ambiguity (reference issue #35)") {
    // mirrors test/sql/schema/case_variant_fields.test: two docs whose
    // nested field differs only by case — one column, one non-NULL row
    val dir = writeDocs("case_variant",
      Seq("""{"id":1,"case_data":{"clientFullname":"Alice"}}""",
          """{"id":2,"case_data":{"ClientFullname":"Bob"}}"""))
    val df = spark.read.format("docstore").option("path", dir).load()
    assert(df.count() == 2)
    assert(df.columns.count(_.equalsIgnoreCase("case_data_clientfullname")) == 1)
    assert(df.filter(col("case_data_clientFullname").isNotNull).count() == 1)
  }

  test("empty collection scans as zero rows (edge_cases analog)") {
    // mirrors test/sql/edge_cases/empty_collections.test
    val dir = writeDocs("empty_coll", Seq.empty)
    val df = spark.read.format("docstore").option("path", dir).load()
    assert(df.count() == 0)
    assert(df.schema.isEmpty)
  }

  test("AVG pre-pushes as sum+count (the reference's group-avg analog)") {
    // Spark rewrites AVG to SUM/COUNT for partial DSv2 aggregate pushdown
    // (reference pushes avg directly: src/mongo_optimizer.cpp $group)
    val df = spark.read.format("docstore").option("path", smallDir).load()
      .groupBy(col("grp")).agg(avg(col("score")).as("avg_score"))
    val plan = explainText(df)
    assert(plan.contains("PushedAggregates") &&
      plan.toLowerCase.contains("sum(score)") &&
      plan.toLowerCase.contains("count(score)"), plan)
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = (0 until 50).groupBy(i => s"g${i % 3}")
      .map { case (g, is) => g -> is.map(_ * 1.5).sum / is.size }
    assert(got == exp)
  }

  test("reported statistics let Catalyst auto-broadcast a small collection") {
    // without SupportsReportStatistics a DSv2 source sizes as "unknown =
    // huge" and this join sort-merges; with it, the ~2 KB collection
    // broadcasts with no explicit hint
    val docs = spark.read.format("docstore").option("path", smallDir).load()
    val big = spark.range(200000).withColumnRenamed("id", "rid")
    val joined = big.join(docs, col("rid") === col("id"))
    val plan = explainText(joined)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(joined.count() == 50)
  }

  test("runtime filters (DPP hook) reach the readers and drop rows at scan") {
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.sources.In
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.sources._
    val opts = DocstoreOptions(Map("path" -> smallDir))
    val schema = DocstoreTable.inferSchema(opts)
    val scan = new DocstoreScanBuilder(schema, opts).build()
    val rf = scan.asInstanceOf[SupportsRuntimeFiltering]
    assert(rf.filterAttributes().map(_.describe()).toSet.contains("id"))
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      In("id", Array(3L, 7L, 11L))))
    assert(scan.description().contains("RuntimeFilters"), scan.description())
    val factory = scan.toBatch.createReaderFactory()
    val rows = scan.toBatch.planInputPartitions().flatMap { p =>
      val r = factory.createReader(p)
      val buf = Seq.newBuilder[Long]
      while (r.next()) buf += r.get().getLong(schema.fieldIndex("id"))
      r.close()
      buf.result()
    }
    assert(rows.sorted.toSeq == Seq(3L, 7L, 11L))
  }

  test("docstore write: extended-JSON types round-trip (ts, date, binary, struct)") {
    import spark.implicits._
    val outDir = "/tmp/graft_docstore_spec/write_types"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 12:30:00"),
        java.sql.Date.valueOf("2024-03-05"), Array[Byte](1, 2, 3), Seq(1L, 2L)),
      (2L, java.sql.Timestamp.valueOf("2024-03-02 01:02:03"),
        java.sql.Date.valueOf("2024-05-01"), Array[Byte](4, 5), Seq(3L))
    ).toDF("id", "ts", "day", "bin", "arr")
    df.write.format("docstore").option("path", outDir).mode("append").save()
    val back = spark.read.format("docstore").option("path", outDir).load()
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("day").dataType == DateType)
    assert(back.schema("bin").dataType == BinaryType)
    val r = back.orderBy("id").collect()
    assert(r(0).getTimestamp(1) == java.sql.Timestamp.valueOf("2024-03-01 12:30:00"))
    assert(r(0).getDate(2) == java.sql.Date.valueOf("2024-03-05"))
    assert(r(0).getAs[Array[Byte]](3).toSeq == Seq[Byte](1, 2, 3))
    assert(r(1).getSeq[Long](4) == Seq(3L))
  }

  test("ensureEventDocs invalidates its cache when the source parquet changes") {
    import spark.implicits._
    val sf = Files.createTempDirectory("graft_evdocs_fp").toString
    def writeEvents(n: Int): Unit =
      Tables(spark, sfDir, "events").limit(n)
        .coalesce(1).write.mode("overwrite").parquet(s"$sf/events.parquet")

    writeEvents(10)
    val dir1 = DocstoreOps.ensureEventDocs(spark, sf)
    assert(Files.exists(Paths.get(s"$dir1/_SUCCESS")))
    val count1 = spark.read.text(dir1).count()
    assert(count1 == 10)
    // same source → same dir, no regeneration (marker short-circuit)
    assert(DocstoreOps.ensureEventDocs(spark, sf) == dir1)

    // regenerated source (different size) → new fingerprint, fresh docs
    writeEvents(25)
    val dir2 = DocstoreOps.ensureEventDocs(spark, sf)
    assert(dir2 != dir1,
      "regenerated events.parquet must produce a new docs dir")
    assert(spark.read.text(dir2).count() == 25)
  }
}

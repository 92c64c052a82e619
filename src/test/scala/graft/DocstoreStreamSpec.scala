package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Streaming reads over a docstore collection dir: files arriving after
  * the query starts become new micro-batches (the change-stream analog). */
class DocstoreStreamSpec extends SparkSpec {

  private val dir = "/tmp/graft_docstore_spec/stream"

  private def writeFile(name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    // write-then-rename so the listing never sees a partial file
    val tmp = Paths.get(s"$dir/.tmp_$name")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(s"$dir/$name"))
  }

  test("new collection files become micro-batches; pushdown applies") {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    writeFile("part-00000.jsonl", (0 until 10).map(i =>
      s"""{"id":$i,"kind":"k${i % 2}","v":${i * 1.0}}"""))

    val stream = spark.readStream.format("docstore")
      .option("path", dir).load()
      .filter(col("kind") === "k0") // pushed into the streaming scan
      .select(col("id"), col("v"))
    val q = stream.writeStream.format("memory")
      .queryName("doc_stream_sink").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("doc_stream_sink").count() == 5) // ids 0,2,4,6,8

      writeFile("part-00001.jsonl", (10 until 20).map(i =>
        s"""{"id":$i,"kind":"k${i % 2}","v":${i * 1.0}}"""))
      q.processAllAvailable()
      val ids = spark.table("doc_stream_sink").select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (0 until 20).filter(_ % 2 == 0).map(_.toLong))
    } finally q.stop()
  }

  test("windowed aggregation over a document stream") {
    val aggDir = s"${dir}_agg"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(aggDir))
    Files.createDirectories(Paths.get(aggDir))
    def doc(id: Int, hour: Int, v: Double) =
      s"""{"id":$id,"ts":{"$$date":"2024-01-01T0$hour:15:00.000Z"},"v":$v}"""
    val tmp = Paths.get(s"$aggDir/.tmp0")
    Files.write(tmp, (Seq(doc(1, 0, 1.0), doc(2, 0, 2.0), doc(3, 1, 5.0))
      .mkString("", "\n", "\n")).getBytes("UTF-8"))
    Files.move(tmp, Paths.get(s"$aggDir/batch-0.jsonl"))

    val stream = spark.readStream.format("docstore").option("path", aggDir).load()
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour")).agg(sum("v").as("sv"))
      .select(col("window.start").as("ws"), col("sv"))
    val q = stream.writeStream.format("memory")
      .queryName("doc_stream_agg").outputMode("append").start()
    try {
      q.processAllAvailable()
      // push watermark past hour 0 and 1
      val tmp2 = Paths.get(s"$aggDir/.tmp1")
      Files.write(tmp2, doc(4, 9, 0.5).getBytes("UTF-8"))
      Files.move(tmp2, Paths.get(s"$aggDir/batch-1.jsonl"))
      q.processAllAvailable()
      val rows = spark.table("doc_stream_agg")
        .collect().map(r => r.getTimestamp(0).toString -> r.getDouble(1)).toMap
      assert(rows("2024-01-01 00:00:00.0") == 3.0)
      assert(rows("2024-01-01 01:00:00.0") == 5.0)
    } finally q.stop()
  }

  test("docstore streaming SINK: epochs commit atomically, round-trip, " +
      "and keep the tail-only-growth contract") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val outDir = s"${dir}_sink"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    val ckpt = s"${dir}_sink_ckpt"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "name")
      .writeStream.format("docstore")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      val files1 = new java.io.File(outDir).listFiles()
        .filter(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
        .map(_.getName).sorted
      assert(files1.nonEmpty && files1.forall(_.startsWith("part-s")), files1.toSeq)
      // no in-progress temp left behind after commit
      assert(!new java.io.File(outDir).listFiles()
        .exists(_.getName.endsWith(".inprogress")))
      in.addData((3L, "c"))
      q.processAllAvailable()
      val files2 = new java.io.File(outDir).listFiles()
        .filter(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
        .map(_.getName).sorted
      // tail-only growth: every new epoch file sorts after every old one
      assert(files2.size > files1.size)
      assert(files2.takeRight(files2.size - files1.size).forall(n =>
        files1.isEmpty || n > files1.last), files2.toSeq)
      // round-trip: the stream-written collection reads back exactly
      val back = spark.read.format("docstore").option("path", outDir).load()
      assert(back.count() == 3)
      assert(back.orderBy("id").select("name").collect()
        .map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("a shifted file listing fails fast instead of mis-slicing") {
    import graft.sources.{DocstoreMicroBatchStream, DocstoreOptions, DocstoreTable, FileCountOffset}
    val vDir = s"${dir}_validate"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(vDir))
    Files.createDirectories(Paths.get(vDir))
    def put(name: String, n: Int): Unit =
      Files.write(Paths.get(s"$vDir/$name"),
        (0 until n).map(i => s"""{"id":$i}""").mkString("", "\n", "\n")
          .getBytes("UTF-8"))
    put("b.jsonl", 3)
    val opts = DocstoreOptions(Map("path" -> vDir))
    val schema = DocstoreTable.inferSchema(opts)
    val stream = new DocstoreMicroBatchStream(schema, schema, Array.empty, opts)
    val off1 = stream.latestOffset().asInstanceOf[FileCountOffset]
    assert(off1.n == 1 && off1.last.endsWith("b.jsonl"))
    // offsets survive a JSON round trip (incl. the legacy bare-int form)
    assert(FileCountOffset.parse(off1.json()) == off1)
    assert(FileCountOffset.parse("2") == FileCountOffset(2))
    // tail growth is fine: a new file sorting AFTER the boundary
    put("c.jsonl", 2)
    val off2 = stream.latestOffset().asInstanceOf[FileCountOffset]
    assert(stream.planInputPartitions(off1, off2).nonEmpty)
    // but a file sorting BEFORE the checkpointed boundary shifts every
    // index — planning must throw, not silently re-slice
    put("a.jsonl", 2)
    val off3 = stream.latestOffset().asInstanceOf[FileCountOffset]
    intercept[IllegalStateException] {
      stream.planInputPartitions(off2, off3)
    }
    // deleting the boundary file is detected the same way
    Files.delete(Paths.get(s"$vDir/a.jsonl"))
    Files.delete(Paths.get(s"$vDir/b.jsonl"))
    intercept[IllegalStateException] {
      stream.planInputPartitions(off1, stream.latestOffset())
    }
  }
}

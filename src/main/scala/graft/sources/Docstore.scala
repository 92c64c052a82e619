package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.{BufferedInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.{Set => JSet}
import scala.jdk.CollectionConverters._

/** "docstore" DataSource V2 — the Spark-first re-expression of the
  * reference's collection scan (reference: src/mongo_table_function.cpp:1
  * `mongo_scan`). Collections are extended-JSON JSONL files (no Mongo
  * server in this environment); everything above the byte-reader — schema
  * inference, type mapping, flattening, schema modes, filter/projection/
  * limit pushdown — mirrors the reference's semantics.
  *
  * Options:
  *   path        file or directory of *.jsonl
  *   samplesize  schema-inference sample (default 100, like the reference)
  *   schemamode  permissive | dropmalformed | failfast
  *   flatten     true (default): nested docs → parent_child columns
  *   splitsize   target split bytes (default 128 MiB)
  *
  * Scale design: files are split into newline-aligned byte ranges (the
  * standard Hadoop text-input contract), so one 1 TB collection file
  * becomes ~8000 parallel partitions instead of one task; filters are
  * evaluated during the scan *before* row materialization downstream,
  * projection prunes unread doc paths, and LIMIT caps each reader. All
  * three pushdowns are visible in `explain()` like the reference's
  * `$match`/projection/`$limit` pipeline stages.
  */
class DocstoreSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "docstore"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocstoreTable.inferSchema(DocstoreOptions(options.asScala.toMap))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DocstoreTable(schema, DocstoreOptions(properties.asScala.toMap))
}

final case class DocstoreOptions(raw: Map[String, String]) {
  private val m = raw.map { case (k, v) => k.toLowerCase -> v }
  def path: String = m.getOrElse("path", throw new IllegalArgumentException(
    "docstore: 'path' option required"))
  def sampleSize: Int = m.getOrElse("samplesize", "100").toInt
  def schemaMode: String = m.getOrElse("schemamode", "permissive").toLowerCase
  def flatten: Boolean = m.getOrElse("flatten", "true").toBoolean
  def splitSize: Long = m.getOrElse("splitsize", (128L * 1024 * 1024).toString).toLong
  require(Seq("permissive", "dropmalformed", "failfast").contains(schemaMode),
    s"docstore: bad schemamode '$schemaMode'")
}

object DocstoreTable {
  /** List data files for a path (file or directory of .jsonl). */
  def listFiles(opts: DocstoreOptions): Seq[(String, Long)] = {
    val conf = new Configuration()
    val p = new HPath(opts.path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory) fs.listStatus(p).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .sortBy(_.getPath.getName)
      else Seq(st)
    files.map(s => (s.getPath.toString, s.getLen))
  }

  def inferSchema(opts: DocstoreOptions): StructType = {
    val sample = sampleDocs(opts)
    SchemaInference.infer(sample, opts.flatten)._1
  }

  def sampleDocs(opts: DocstoreOptions): Seq[DocValue.DDoc] = {
    val conf = new Configuration()
    val docs = Seq.newBuilder[DocValue.DDoc]
    var remaining = opts.sampleSize
    val it = listFiles(opts).iterator
    while (remaining > 0 && it.hasNext) {
      val (file, len) = it.next()
      val reader = new LineRangeReader(file, 0, len, conf)
      try {
        var line = reader.next()
        while (remaining > 0 && line != null) {
          if (line.nonEmpty) {
            try { docs += ExtJson.parse(line); remaining -= 1 }
            catch { case _: Exception => () } // malformed line: skip in sampling
          }
          line = if (remaining > 0) reader.next() else null
        }
      } finally reader.close()
    }
    docs.result()
  }
}

class DocstoreTable(schema0: StructType, opts: DocstoreOptions)
    extends Table with SupportsRead {
  override def name(): String = s"docstore(${opts.path})"
  override def schema(): StructType = schema0
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocstoreScanBuilder(schema0, opts)
}

/** Pushdown surface — the reference's three pipeline stages:
  * filters → `$match` (reference: src/mongo_filter_pushdown.cpp:1),
  * required columns → projection doc, limit → `$limit`
  * (reference: src/mongo_optimizer.cpp:1 LIMIT pushdown). */
class DocstoreScanBuilder(fullSchema: StructType, opts: DocstoreOptions)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Int = -1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition(FilterEval.supports)
    pushed = supported
    residual // Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep full-schema field order for deterministic output
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => keep.contains(f.name)))
  }

  override def pushLimit(l: Int): Boolean = { limit = l; true /* partial: per-partition */ }
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan =
    new DocstoreScan(fullSchema, required, pushed, limit, opts)
}

class DocstoreScan(fullSchema: StructType, required: StructType,
    filters: Array[Filter], limit: Int, opts: DocstoreOptions)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"docstore ${opts.path} PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}" +
      (if (limit >= 0) s", PushedLimit: $limit" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val split = opts.splitSize
    DocstoreTable.listFiles(opts).flatMap { case (file, len) =>
      if (len == 0) Seq.empty
      else (0L until len by split).map { start =>
        DocstorePartition(file, start, math.min(split, len - start))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocstoreReaderFactory(fullSchema, required, filters, limit,
      opts.schemaMode, opts.flatten)
}

final case class DocstorePartition(file: String, start: Long, length: Long)
  extends InputPartition

class DocstoreReaderFactory(fullSchema: StructType, required: StructType,
    filters: Array[Filter], limit: Int, schemaMode: String, flatten: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dp = p.asInstanceOf[DocstorePartition]
    new DocstoreReader(dp, fullSchema, required, filters, limit, schemaMode, flatten)
  }
}

class DocstoreReader(p: DocstorePartition, fullSchema: StructType,
    required: StructType, filters: Array[Filter], limit: Int,
    schemaMode: String, flatten: Boolean)
    extends PartitionReader[InternalRow] {

  // Filters may reference columns outside the projection (SELECT a WHERE
  // b>0): evaluate on an eval-schema = required ∪ filter columns, then
  // project down to `required` ordinals. dropmalformed/failfast must
  // validate EVERY column regardless of pruning — row-level semantics
  // (a pruned-away mismatch still poisons the row, like the reference's
  // schema_mode) — so they convert the full schema.
  private val filterCols = filters.flatMap(FilterEval.references).distinct
  private val evalSchema =
    if (schemaMode == "permissive")
      StructType(fullSchema.fields.filter(f =>
        required.fieldNames.contains(f.name) || filterCols.contains(f.name)))
    else fullSchema
  private val outOrdinals = required.fieldNames.map(evalSchema.fieldIndex)
  private val conv = new DocRowConverter(evalSchema, schemaMode, flatten)
  private val eval = new FilterEval(evalSchema, filters)

  private val lines = new LineRangeReader(p.file, p.start, p.length, new Configuration())
  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    var line = lines.next()
    while (line != null) {
      if (line.nonEmpty) {
        conv.convert(line) match {
          case Some(row) if eval.matches(row) =>
            current =
              if (outOrdinals.length == evalSchema.length &&
                outOrdinals.zipWithIndex.forall(t => t._1 == t._2)) row
              else {
                val out = new GenericInternalRow(outOrdinals.length)
                var i = 0
                while (i < outOrdinals.length) {
                  out.update(i, row.get(outOrdinals(i), evalSchema(outOrdinals(i)).dataType))
                  i += 1
                }
                out
              }
            emitted += 1
            return true
          case _ => () // filtered out, or dropped malformed
        }
      }
      line = lines.next()
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

/** Extended-JSON line → InternalRow under a flat schema, honoring the
  * reference's schema modes (reference: src/mongo_schema_inference.cpp
  * schema_mode): permissive → mismatched value becomes NULL;
  * dropmalformed → row skipped; failfast → throw. */
class DocRowConverter(schema: StructType, schemaMode: String, flatten: Boolean) {
  import DocValue._

  private val paths: Array[Seq[String]] =
    schema.fieldNames.map(n => if (flatten) splitPath(n) else Seq(n))

  // Flattened column names rejoin on '_': resolve 'a_b_c' against the doc
  // greedily at lookup time (walk: try longest field name first).
  private def splitPath(n: String): Seq[String] = Seq(n)

  private def lookup(doc: DDoc, name: String): DocValue = {
    doc.map.get(name) match {
      case Some(v) => v
      case None if flatten =>
        // 'parent_child' column: find a prefix that is a sub-document
        var idx = name.indexOf('_')
        while (idx > 0) {
          doc.map.get(name.substring(0, idx)) match {
            case Some(sub: DDoc) =>
              val rest = lookup(sub, name.substring(idx + 1))
              if (rest != DNull) return rest
            case _ => ()
          }
          idx = name.indexOf('_', idx + 1)
        }
        DNull
      case None => DNull
    }
  }

  def convert(line: String): Option[InternalRow] = {
    val doc =
      try ExtJson.parse(line)
      catch {
        case e: Exception => return malformed(s"unparseable document: ${e.getMessage}")
      }
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val v = lookup(doc, f.name)
      toInternal(v, f.dataType) match {
        case Right(x) => row.update(i, x)
        case Left(msg) =>
          schemaMode match {
            case "permissive"   => row.update(i, null)
            case "dropmalformed" => return None
            case "failfast" =>
              throw new IllegalStateException(
                s"docstore failfast: column '${f.name}': $msg in: $line")
          }
      }
      i += 1
    }
    Some(row)
  }

  private def malformed(msg: String): Option[InternalRow] = schemaMode match {
    case "failfast" => throw new IllegalStateException(s"docstore failfast: $msg")
    case _          => None // permissive + dropmalformed both drop unparseable lines
  }

  /** DocValue → Catalyst internal value for the target type; Left = type
    * mismatch. Numeric widening Long→Double allowed (Int32/Int64/Double
    * unify in the reference's lattice); StringType accepts anything via
    * the JSON-text VARCHAR fallback. */
  def toInternal(v: DocValue, dt: DataType): Either[String, Any] = (v, dt) match {
    case (DNull, _) => Right(null)
    case (DBool(b), BooleanType) => Right(b)
    case (DLong(l), LongType) => Right(l)
    case (DLong(l), DoubleType) => Right(l.toDouble)
    case (DDouble(d), DoubleType) => Right(d)
    case (DString(s), StringType) => Right(UTF8String.fromString(s))
    case (DObjectId(h), StringType) => Right(UTF8String.fromString(h))
    case (other, StringType) => // Document/array/etc → JSON VARCHAR fallback
      Right(UTF8String.fromString(ExtJson.render(other)))
    case (DTimestamp(us), TimestampType) => Right(us)
    case (DTimestamp(us), DateType) if ExtJson.isMidnightUtc(us) =>
      Right(ExtJson.epochDay(us))
    case (DBinary(b), BinaryType) => Right(b)
    case (DArray(items), ArrayType(et, _)) =>
      val out = new Array[Any](items.length)
      var i = 0
      while (i < items.length) {
        toInternal(items(i), et) match {
          case Right(x) => out(i) = x
          case left     => return left
        }
        i += 1
      }
      Right(new GenericArrayData(out))
    case (DDoc(fields), st: StructType) =>
      val out = new GenericInternalRow(st.length)
      val m = fields.toMap
      var i = 0
      while (i < st.length) {
        toInternal(m.getOrElse(st(i).name, DNull), st(i).dataType) match {
          case Right(x) => out.update(i, x)
          case left     => return left
        }
        i += 1
      }
      Right(out)
    case (other, t) => Left(s"cannot convert $other to ${t.simpleString}")
  }
}

/** Byte-range JSONL reader with the standard Hadoop text-split contract:
  * a split starting mid-file skips to the first full line; the line that
  * straddles the split end belongs to the split it started in. Byte-level
  * (UTF-8 decoded per line), so multi-byte chars never break offsets. */
class LineRangeReader(file: String, start: Long, length: Long, conf: Configuration) {
  private val fs: FileSystem = new HPath(file).getFileSystem(conf)
  private val in: InputStream = {
    val s = fs.open(new HPath(file))
    if (start > 0) s.seek(start)
    new BufferedInputStream(s, 1 << 16)
  }
  private var pos: Long = start
  private val end: Long = start + length
  private var eof = false
  private val buf = new java.io.ByteArrayOutputStream(1 << 10)

  if (start > 0) skipPartialLine() // first (partial) line belongs to prev split

  private def skipPartialLine(): Unit = {
    var b = in.read()
    while (b != -1 && b != '\n') { pos += 1; b = in.read() }
    if (b == -1) eof = true else pos += 1
  }

  /** Next full line (without newline), or null when the range is done. */
  def next(): String = {
    if (eof || pos > end) return null // a line may START at most at `end`
    buf.reset()
    var b = in.read()
    if (b == -1) { eof = true; return null }
    while (b != -1 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
    if (b == -1) eof = true else pos += 1
    val bytes = buf.toByteArray
    // strip trailing \r for CRLF files
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }

  def close(): Unit = in.close()
}

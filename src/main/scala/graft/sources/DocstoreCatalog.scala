package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Spark `TableCatalog` over a docstore root directory — the Spark-first
  * re-expression of the reference's storage extension
  * (reference: src/mongo_storage_extension.cpp:1, src/mongo_catalog.cpp:1):
  * ATTACH instance→catalog, database→schema/namespace,
  * collection→table. Here: root dir → catalog, subdirectory → namespace,
  * `<name>.jsonl` → table.
  *
  * Register:
  *   spark.sql.catalog.mongo      = graft.sources.DocstoreCatalog
  *   spark.sql.catalog.mongo.root = /path/to/root
  * then `SELECT * FROM mongo.mydb.mycoll`, `SHOW NAMESPACES IN mongo`,
  * `SHOW TABLES IN mongo.mydb` — the SHOW DATABASES / information_schema
  * integration of the reference.
  *
  * Schema caching: table schemas are inferred once per catalog instance
  * and cached (the reference caches collection schemas;
  * `invalidateTable` = its `mongo_clear_cache()`).
  */
class DocstoreCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _
  private var options: Map[String, String] = Map.empty
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  override def initialize(name: String, opts: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    options = opts.asScala.toMap
    root = options.getOrElse("root",
      throw new IllegalArgumentException(s"catalog $name: 'root' option required"))
  }
  override def name(): String = catalogName

  private def fs: FileSystem = new HPath(root).getFileSystem(new Configuration())

  private def collPath(ident: Identifier): String = {
    require(ident.namespace().length == 1,
      s"docstore catalog expects <db>.<collection>, got $ident")
    s"$root/${ident.namespace()(0)}/${ident.name()}.jsonl"
  }

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(new HPath(root)).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else Array.empty // single-level: databases have no sub-schemas

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && fs.exists(new HPath(s"$root/${namespace(0)}"))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    Map("location" -> s"$root/${namespace(0)}").asJava
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    fs.listStatus(new HPath(s"$root/${namespace(0)}"))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".jsonl"))
      .map(s => Identifier.of(namespace, s.getPath.getName.stripSuffix(".jsonl")))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(new HPath(collPath(ident)))

  override def loadTable(ident: Identifier): Table = {
    val path = collPath(ident)
    if (!fs.exists(new HPath(path)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val opts = DocstoreOptions(options - "root" + ("path" -> path))
    val schema = schemaCache.computeIfAbsent(path, _ => DocstoreTable.inferSchema(opts))
    new DocstoreTable(schema, opts)
  }

  /** `mongo_clear_cache()` analog. */
  override def invalidateTable(ident: Identifier): Unit =
    schemaCache.remove(collPath(ident))

  /** Drop every cached collection schema (`mongo_clear_cache()`). */
  def clearCache(): Unit = schemaCache.clear()

  // Read-only catalog: writes map to "not supported" like the reference's
  // scan-only extension.
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException("docstore catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("docstore catalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("docstore catalog is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("docstore catalog is read-only")
  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    throw new UnsupportedOperationException("docstore catalog is read-only")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("docstore catalog is read-only")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("docstore catalog is read-only")
}

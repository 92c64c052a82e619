package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.sources.MongoFilter

/** User-facing API — the Spark-native equivalent of the reference's
  * entry points, so a user of `duckdb-mongo` can switch surface-for-
  * surface:
  *
  *   `mongo_scan(conn, db, collection, filter, sample_size, columns,
  *   schema_mode)` (reference: src/mongo_table_function.cpp:1)
  *     → [[Graft.mongoScan]]
  *   `ATTACH '<conn>' AS m (TYPE mongo)` + db.collection tables
  *   (reference: src/mongo_storage_extension.cpp:1)
  *     → [[Graft.attach]] then `spark.sql("SELECT … FROM <name>.db.coll")`
  *   `mongo_clear_cache()` (reference: src/mongo_catalog.cpp:1)
  *     → [[Graft.clearCache]]
  *
  * Connection-string/TLS/secret options have no analog here (no server;
  * collections are extended-JSON files) — they would map to Hadoop FS /
  * catalog configuration in a deployment (SURVEY.md §6).
  */
object Graft {

  /** Scan a document collection as a DataFrame.
    *
    * @param path       collection file or directory of JSONL files
    * @param filter     optional Mongo filter document (JSON) — compiled to
    *                   a Catalyst predicate, so it participates in
    *                   pushdown like any SQL WHERE clause
    * @param sampleSize schema-inference sample size (reference default 100)
    * @param columns    optional user-provided schema (the reference's
    *                   `columns` / `__schema` override — skips inference)
    * @param schemaMode permissive | dropmalformed | failfast
    * @param flatten    nested documents → `parent_child` columns
    */
  def mongoScan(spark: SparkSession, path: String, filter: String = null,
      sampleSize: Int = 100, columns: StructType = null,
      schemaMode: String = "permissive", flatten: Boolean = true): DataFrame = {
    var r = spark.read.format("docstore")
      .option("path", path)
      .option("samplesize", sampleSize.toString)
      .option("schemamode", schemaMode)
      .option("flatten", flatten.toString)
    if (columns != null) r = r.schema(columns)
    val df = r.load()
    if (filter != null) df.filter(MongoFilter.compile(filter)) else df
  }

  /** Compile a Mongo filter document to a Catalyst predicate usable on
    * ANY DataFrame (`df.filter(Graft.mongoFilter(json))`). */
  def mongoFilter(filterJson: String): Column = MongoFilter.compile(filterJson)

  /** Run a MongoDB aggregation pipeline (extended-JSON array of stages)
    * against any DataFrame: `$match`/`$project`/`$group`/`$sort`/
    * `$limit`/`$skip`/`$unwind`/`$count`/`$sortByCount`/`$lookup` plus
    * the aggregation expression language — each stage compiles to
    * declarative DataFrame algebra, so Catalyst plans it like native
    * Spark code. `resolver` supplies `$lookup` collections by name. */
  def aggregate(df: DataFrame, pipelineJson: String,
      resolver: String => DataFrame = null): DataFrame =
    sources.MongoPipeline.aggregate(df, pipelineJson, resolver)

  /** Mount a docstore root as a Spark catalog: subdirectories become
    * namespaces (databases), `*.jsonl` files become tables (collections).
    * After `attach(spark, "m", root)`:
    * `SHOW NAMESPACES IN m`, `SELECT * FROM m.db.coll`. */
  def attach(spark: SparkSession, name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[sources.DocstoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
  }

  /** Drop cached collection schemas for an attached catalog — the
    * `mongo_clear_cache()` analog (next access re-infers). */
  def clearCache(spark: SparkSession, name: String): Unit =
    spark.sessionState.catalogManager.catalog(name) match {
      case c: sources.DocstoreCatalog => c.clearCache()
      case other => throw new IllegalArgumentException(
        s"$name is not a docstore catalog: ${other.getClass.getName}")
    }
}

package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.TableSpec

/** Document-source seam (SURVEY.md §2 S1): how raw collection documents
  * reach a pipeline. Deployment picks an implementation by CONFIG, not by
  * code edits — the transform layer downstream is identical for all of
  * them (`spec.transform` consumes the same explicit nested schema).
  *
  *  - [[ExtendedJsonSource]] — hermetic files of Mongo extended JSON
  *    (fixtures, tests, offline collection drops);
  *  - [[MongoSource]] — the live MongoDB Spark connector
  *    (`spark.read.format("mongodb")`), which pushes the spec's projection
  *    and filter server-side as `$project`/`$match` — the reference's
  *    `collection.aggregate([{$project: …}])` stage
  *    (`/root/reference/dags/includes/user_table.py:25-53`) becomes
  *    connector pushdown.
  */
trait DocSource extends Serializable {
  def read(spark: SparkSession, spec: TableSpec): DataFrame
}

/** Extended-JSON lines at a fixed path (one file/dir per collection). */
final case class ExtendedJsonSource(path: String) extends DocSource {
  def read(spark: SparkSession, spec: TableSpec): DataFrame =
    ExtendedJson.read(spark, spec.source, path)
}

/** Extended-JSON lines laid out as `<rootDir>/<collection>.jsonl` — the
  * whole-corpus form of [[ExtendedJsonSource]] for multi-table drivers.
  */
final case class ExtendedJsonDirSource(rootDir: String) extends DocSource {
  def read(spark: SparkSession, spec: TableSpec): DataFrame =
    ExtendedJson.read(spark, spec.source, s"$rootDir/${spec.collection}.jsonl")
}

/** Live MongoDB connector source. Requires the `mongo-spark-connector`
  * package on the cluster classpath (not shipped in this repo — the
  * connector is resolved by name at `load()` time, so this class compiles
  * and ships without it; constructing one where the connector is absent
  * fails at read time with the standard DataSource lookup error).
  *
  * The spec's explicit source schema is pinned on the reader, so the
  * connector never samples/infers; Catalyst column pruning and pushed
  * filters translate to server-side `$project`/`$match`.
  */
final case class MongoSource(
    connectionUri: String,
    database: String,
    options: Map[String, String] = Map.empty) extends DocSource {
  def read(spark: SparkSession, spec: TableSpec): DataFrame =
    spark.read.format("mongodb")
      .option("connection.uri", connectionUri)
      .option("database", database)
      .option("collection", spec.collection)
      .options(options)
      .schema(spec.source)
      .load()
}

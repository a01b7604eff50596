package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV staging plane (SURVEY.md §2 S2/S3) + filesystem ops (S6–S8).
  *
  * The reference stages every table through pandas CSV with INFERRED dtypes
  * (`user_table.py:90,97`) — the fidelity risk SURVEY §7.4.1 calls out
  * (booleans→"True" strings, NaN widening). Here both directions use the
  * spec's EXPLICIT flat schema, so the round trip is type-stable; dates land
  * ISO-formatted, nulls stay nulls.
  *
  * All paths go through the Hadoop FileSystem API, so the same code serves
  * `file://` in tests and `s3a://`/`hdfs://` in deployment (S7 — the
  * reference's download+move step — disappears: Spark reads object stores
  * in place).
  */
object Staging {

  /** One reader-option set for EVERY consumer of the staging CSV dialect —
    * batch ([[read]]) and streaming
    * ([[graft.pipelines.StreamingUpdatePipeline]]) alike. `multiLine` so
    * quoted embedded newlines survive the round trip (the writer quotes
    * them; without this flag the reader splits records at every raw newline
    * and corrupts the row). Trade-off: multiLine parses whole files, so
    * read parallelism is per part-file, not per split — staging writes one
    * part per upstream partition, which keeps the read as parallel as the
    * write that produced it.
    */
  val readOptions: Map[String, String] = Map(
    "header" -> "true",
    "escape" -> "\"",
    "multiLine" -> "true")

  /** S2 — write a staged table (header + explicit schema contract).
    * RFC-4180 quoting (`""` escapes a quote, not backslash) — the dialect
    * pandas reads and writes, so engine staging interoperates with the
    * reference's delta drops.
    */
  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(dir)

  /** S3 — read a staged table with the explicit schema (never infer),
    * under [[readOptions]].
    */
  def read(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.read.schema(schema)
      .options(readOptions)
      .csv(dir)

  /** Columnar staging variant (engine extension beyond the reference's
    * pandas-CSV contract; same explicit-schema discipline): ORC by
    * default, parquet accepted. Columnar staging is what the CSV plane
    * can't be at scale — type-exact without a dialect (no quoting /
    * multiLine hazards, embedded newlines are just bytes), splittable
    * (CSV multiLine reads whole files; ORC stripes parallelize within a
    * part-file), and scan-prunable (a downstream reader of 2 of 40
    * staged columns reads 2 column streams, with predicates pushed to
    * stripe statistics).
    */
  def writeColumnar(df: DataFrame, dir: String, format: String = "orc"): Unit = {
    require(format == "orc" || format == "parquet", s"unsupported: $format")
    df.write.mode("overwrite").format(format).save(dir)
  }

  /** Columnar twin of [[read]]: explicit schema, never inferred — a
    * missing column fails the read instead of silently widening types.
    */
  def readColumnar(spark: SparkSession, schema: StructType, dir: String,
      format: String = "orc"): DataFrame = {
    require(format == "orc" || format == "parquet", s"unsupported: $format")
    spark.read.schema(schema).format(format).load(dir)
  }

  /** JSON-lines ingest with a quarantine lane (engine extension — the
    * robustness mode a web-scale crawl feed needs): PERMISSIVE parse with
    * the explicit schema, malformed lines captured whole in
    * `_corrupt_record` instead of killing the job (one bad line in a
    * billion otherwise fails the daily load) or being silently DROPPED
    * (mode=DROPMALFORMED loses data with no audit trail). Returns
    * (good, quarantined): good rows carry the schema columns; quarantined
    * rows carry the raw offending line for replay after the producer is
    * fixed — the file twin of the upsert sink's Permissive row-replay
    * (SURVEY §2.4).
    *
    * Spark only populates `_corrupt_record` when it is IN the read schema;
    * callers pass the clean business schema and this method wires the
    * quarantine column. The parsed frame is persist()ed before the split:
    * Spark DISALLOWS queries referencing only the corrupt column on the
    * raw parse (the quarantine lane would throw), and caching is the
    * documented escape hatch. Lifetime: the blocks are reclaimed by the
    * ContextCleaner once both returned frames become unreachable (the
    * GlobalIndex.persistSorted pattern) — callers holding a long-lived
    * reference to corpus-sized loads should write the lanes out and drop
    * the frames rather than keep them across further loads.
    */
  def readJsonl(spark: SparkSession, schema: StructType, dir: String)
      : (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not already contain $corrupt")
    val withQuarantine = schema.add(corrupt, "string")
    val raw = spark.read.schema(withQuarantine)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(dir)
      .persist() // split from ONE materialization (see scaladoc)
    val good = raw.filter(raw(corrupt).isNull)
      .select(schema.fieldNames.map(raw(_)): _*)
    val bad = raw.filter(raw(corrupt).isNotNull)
      .select(raw(corrupt).as("raw_line"))
    (good, bad)
  }

  /** S6 — existence probe (ref: `check_file_exists`, `utils.py:42-47`);
    * guards the daily pipeline's no-op path (Q9).
    */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** S8 — archive a staged file/dir under a date-stamped name and remove
    * the original (ref: `erase_copy_daily_tables.py:7-30`: copy to
    * `daily_archieve/<table>_dd_MM_yyyy`, push to S3, delete source —
    * here a single FileSystem rename, atomic on HDFS/posix).
    *
    * `secondaryDir` reproduces the reference's DUAL destination: it keeps a
    * local date-stamped copy AND uploads to S3 before deleting the original
    * (`erase_copy_daily_tables.py:14-27` — `shutil.copy` then
    * `load_file`). When set, the stamped archive is copied there too (any
    * Hadoop-visible URI — `s3a://…` in deployment) before the rename.
    */
  def archive(spark: SparkSession, src: String, archiveDir: String,
      stamp: String, secondaryDir: Option[String] = None): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(conf)
    if (fs.exists(srcPath)) {
      val dir = new Path(archiveDir)
      if (!fs.exists(dir)) fs.mkdirs(dir)
      val stamped = s"${srcPath.getName}_$stamp"
      secondaryDir.foreach { sec =>
        val secDir = new Path(sec)
        val secFs = secDir.getFileSystem(conf)
        if (!secFs.exists(secDir)) secFs.mkdirs(secDir)
        val secDest = new Path(secDir, stamped)
        if (secFs.exists(secDest)) secFs.delete(secDest, true)
        org.apache.hadoop.fs.FileUtil.copy(fs, srcPath, secFs, secDest,
          /* deleteSource = */ false, /* overwrite = */ true, conf)
      }
      val dest = new Path(dir, stamped)
      if (fs.exists(dest)) fs.delete(dest, true)
      fs.rename(srcPath, dest)
    }
  }
}

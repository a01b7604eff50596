package graft.ingest.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader

import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 Mongo-extended-JSON document source (SURVEY.md §2 S1) —
  * the engine-shaped half of the reference's MongoDB read: server-side
  * `$project` (`user_table.py:26-53`) and `$match`
  * (`loanapplication_table.py:27-31`) become REAL scan-level column
  * pruning ([[SupportsPushDownRequiredColumns]]) and filter pushdown
  * ([[SupportsPushDownFilters]]) on the document files themselves, not
  * just on downstream parquet.
  *
  *  - `spark.read.format("graft-extjson").schema(s).load(path)` — the
  *    schema is EXPLICIT, always (the repo invariant: absent fields are
  *    typed nulls, never inference; [[ExtJsonParser]] decodes `$oid` /
  *    `$date` wrappers schema-driven).
  *  - Pruned columns are never materialized: the parser `skipChildren()`s
  *    document fields outside the required schema (including nested
  *    pruning — the required schema arrives already nested-pruned).
  *  - Accepted filters are evaluated per row AT THE SCAN on the parse
  *    schema (required ∪ filter-referenced fields), so rejected documents
  *    never leave the reader; unsupported predicates stay Spark-side
  *    residuals. Correctness does not depend on the split: pushdown only
  *    REMOVES rows a residual `FilterExec` would remove anyway.
  *
  * Scale shape: files are listed once at planning and split into byte
  * ranges of `spark.sql.files.maxPartitionBytes` (JSONL is newline-
  * splittable; the standard half-open contract — a reader owns lines
  * STARTING in `[start, start+length)`, reads one line past its end, and
  * every non-initial split discards its first partial line). A 100 TB
  * document drop therefore parallelizes across executors exactly like the
  * builtin file sources, with no driver-side row movement.
  */
final class ExtJsonDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-extjson"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-extjson requires an explicit schema (.schema(...)): document " +
        "sources never infer (SURVEY §1.4) — absent fields must become " +
        "typed nulls for the default chain")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-extjson needs a path: .load(<file|dir|glob>)")
    new ExtJsonTable(path, schema)
  }
}

final class ExtJsonTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"extjson:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ExtJsonScanBuilder(path, tableSchema, options)
}

final class ExtJsonScanBuilder(path: String, fullSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var countOnly: Boolean = false

  /** Only the global `COUNT(*)` pushes (PARTIAL: each split returns one
    * count row, Spark's final aggregation sums them). With no pushed
    * filter the reader never even parses — a count over a 100 TB
    * document drop is a newline skim; with filters it parses and counts
    * kept rows, still shipping one row per split instead of millions.
    * Refused when a limit is pushed (mixing the two has no sane partial
    * semantics) — Spark then falls back to the ordinary scan + agg.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = limit < 0 &&
      aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().length == 1 &&
      aggregation.aggregateExpressions()(0).isInstanceOf[CountStar]
    if (ok) countOnly = true
    ok
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) =
      filters.partition(FilterEval.supported(_, fullSchema))
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** `LIMIT n` reaches the reader as a PARTIAL limit (each split stops
    * parsing after its first `n` kept rows — [[isPartiallyPushed]] stays
    * true, so Spark's own global Limit still runs on top): a
    * `.limit(100)` probe over a 100 TB document drop parses ~100 lines
    * per split instead of every line, the `$limit`-stage analogue of the
    * reference's aggregate pipeline.
    */
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  override def build(): Scan =
    new ExtJsonScan(path, fullSchema, required, pushed,
      Option(options.get("maxSplitBytes")).map(_.toLong), limit, countOnly)
}

final class ExtJsonScan(path: String, fullSchema: StructType,
    required: StructType, val pushed: Array[Filter],
    maxSplitOverride: Option[Long], val pushedLimit: Int = -1,
    val countOnly: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType =
    if (countOnly)
      StructType(Seq(org.apache.spark.sql.types.StructField(
        "count(*)", org.apache.spark.sql.types.LongType, nullable = false)))
    else required

  override def description(): String =
    s"ExtJson $path, ReadSchema: ${readSchema().catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      (if (pushedLimit >= 0) s", PushedLimit: $pushedLimit" else "") +
      (if (countOnly) ", PushedAggregation: [COUNT(*)]" else "")

  /** Planner statistics from the file listing ([[SupportsReportStatistics]]):
    * total byte size, honestly unknown row count. Gives the optimizer a
    * real size for broadcast decisions instead of the
    * default-to-spark.sql.defaultSizeInBytes guess a statless V2 relation
    * gets.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = listing.map(_.getLen).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def toBatch: Batch = this

  /** Filter-referenced top-level fields the pruned schema dropped (Spark
    * prunes a column out of the required schema precisely when only fully
    * pushed filters touch it) — the reader parses required ++ extras and
    * emits the required prefix.
    */
  private def parseSchema: StructType = {
    // count pushdown: Spark builds the scan BEFORE its prune step runs,
    // so `required` still carries the full schema — but a count only
    // needs the filter-referenced fields parsed (none at all for the
    // unfiltered skim)
    val base = if (countOnly) Array.empty[StructField] else required.fields
    val baseNames = base.map(_.name).toSet
    val needed = pushed.flatMap(_.references).toSet -- baseNames
    StructType(base ++ fullSchema.fields.filter(f => needed(f.name)))
  }

  /** One filesystem listing per Scan, shared by partition planning and
    * [[estimateStatistics]] — stats are re-read per planning round (and
    * per AQE re-optimization), and a fresh glob + listStatus each time
    * is remote-RPC latency paid for nothing.
    */
  private lazy val listing: Seq[FileStatus] =
    listFiles(new Path(path),
      SparkSession.active.sparkContext.hadoopConfiguration)

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val maxSplit = maxSplitOverride.getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")))
      .max(1L)
    listing.flatMap { f =>
      (0L until f.getLen by maxSplit).map { off =>
        ExtJsonInputPartition(f.getPath.toString, off,
          math.min(maxSplit, f.getLen - off))
      }
    }.toArray
  }

  private def listFiles(p: Path, conf: Configuration): Seq[FileStatus] = {
    val fs = p.getFileSystem(conf)
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    require(matches.nonEmpty, s"extjson path matches no files: $path")
    matches.flatMap {
      case d if d.isDirectory => fs.listStatus(d.getPath).toSeq
      case f => Seq(f)
    }.filter { f =>
      val n = f.getPath.getName
      f.isFile && f.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableWritable(
      SparkSession.active.sparkContext.hadoopConfiguration)
    ExtJsonReaderFactory(conf, parseSchema.json, required.length, pushed,
      pushedLimit, countOnly)
  }
}

final case class ExtJsonInputPartition(file: String, start: Long, length: Long)
    extends InputPartition

/** Ships to executors: Hadoop conf via the public [[SerializableWritable]],
  * the parse schema as its JSON form (self-contained, version-stable).
  */
final case class ExtJsonReaderFactory(conf: SerializableWritable[Configuration],
    parseSchemaJson: String, requiredLen: Int, pushed: Array[Filter],
    limit: Int = -1, countOnly: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ExtJsonInputPartition]
    if (countOnly)
      new ExtJsonCountReader(p, conf.value,
        DataTypeJson.structFromJson(parseSchemaJson), pushed)
    else new ExtJsonPartitionReader(p, conf.value,
      DataTypeJson.structFromJson(parseSchemaJson), requiredLen, pushed, limit)
  }
}

/** Reads the lines of one byte-range split, parses, filters, projects.
  * Split contract mirrors Hadoop's `LineRecordReader`: seek to `start`;
  * a non-initial split discards its first (possibly partial) line; then
  * lines are consumed while they START at a position `<= end`, so the
  * line straddling `end` is read in full here and skipped by the next
  * split's discard.
  */
final class ExtJsonPartitionReader(split: ExtJsonInputPartition,
    conf: Configuration, parseSchema: StructType, requiredLen: Int,
    pushed: Array[Filter], limit: Int = -1)
    extends PartitionReader[InternalRow] {

  // pushed PARTIAL limit: this split stops parsing after its first
  // `limit` kept rows (Spark's global Limit still runs above)
  private var emitted = 0L

  private val parser = new ExtJsonParser(parseSchema)
  private val fullWidth = parseSchema.length
  // compiled ONCE per reader: field indices, literal conversions, and
  // pattern objects all hoisted out of the per-line loop
  private val keepRow: InternalRow => Boolean =
    if (pushed.isEmpty) _ => true else FilterEval.compile(pushed, parseSchema)
  private val end = split.start + split.length
  private val text = new Text()
  private var pos = split.start
  private var current: InternalRow = _

  private val stream = {
    val p = new Path(split.file)
    val in = p.getFileSystem(conf).open(p)
    in.seek(split.start)
    in
  }
  private val lines = new LineReader(stream)
  if (split.start != 0) pos += lines.readLine(text)

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (pos <= end) {
      val n = lines.readLine(text)
      if (n == 0) return false
      pos += n
      if (text.getLength > 0) {
        val row = parser.parse(text.getBytes, 0, text.getLength)
        if (keepRow(row)) {
          current = project(row)
          emitted += 1
          return true
        }
      }
    }
    false
  }

  /** Drop the filter-only suffix fields the pruned output doesn't carry. */
  private def project(row: InternalRow): InternalRow =
    if (requiredLen == fullWidth) row
    else {
      val out = new Array[Any](requiredLen)
      var i = 0
      while (i < requiredLen) {
        out(i) =
          if (row.isNullAt(i)) null
          else row.get(i, parseSchema.fields(i).dataType)
        i += 1
      }
      new GenericInternalRow(out)
    }

  override def get(): InternalRow = current

  override def close(): Unit = {
    lines.close()
  }
}

/** `StructType.fromJson` shim kept in one place. */
private[v2] object DataTypeJson {
  def structFromJson(json: String): StructType =
    org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]
}

/** The COUNT(*)-pushdown reader: emits exactly ONE row — the number of
  * this split's rows passing the pushed filters. With no filters the
  * lines are never parsed (a newline skim over the byte range, the fast
  * path a global count deserves); with filters each line parses against
  * the filter schema and kept rows count. Same split line-ownership
  * contract as [[ExtJsonPartitionReader]], and blank lines are SKIPPED
  * exactly as the row reader skips them, so the count matches the
  * unpushed plan bit-for-bit.
  */
final class ExtJsonCountReader(split: ExtJsonInputPartition,
    conf: Configuration, parseSchema: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val keepRow: InternalRow => Boolean =
    if (pushed.isEmpty) null else FilterEval.compile(pushed, parseSchema)
  private val parser =
    if (pushed.isEmpty) null else new ExtJsonParser(parseSchema)
  private val end = split.start + split.length
  private val text = new Text()
  private var pos = split.start
  private var done = false
  private var count = 0L

  private val stream = {
    val p = new Path(split.file)
    val in = p.getFileSystem(conf).open(p)
    in.seek(split.start)
    in
  }
  private val lines = new LineReader(stream)
  if (split.start != 0) pos += lines.readLine(text)

  override def next(): Boolean = {
    if (done) return false
    while (pos <= end) {
      val n = lines.readLine(text)
      if (n == 0) { done = true; return true }
      pos += n
      if (text.getLength > 0) {
        if (keepRow == null) count += 1
        else if (keepRow(parser.parse(text.getBytes, 0, text.getLength)))
          count += 1
      }
    }
    done = true
    true
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](count))
  override def close(): Unit = { lines.close(); stream.close() }
}

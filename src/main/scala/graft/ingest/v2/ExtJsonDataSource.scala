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
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
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
    with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) =
      filters.partition(FilterEval.supported(_, fullSchema))
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new ExtJsonScan(path, fullSchema, required, pushed,
      Option(options.get("maxSplitBytes")).map(_.toLong))
}

final class ExtJsonScan(path: String, fullSchema: StructType,
    required: StructType, val pushed: Array[Filter],
    maxSplitOverride: Option[Long]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"ExtJson $path, ReadSchema: ${required.catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  /** Filter-referenced top-level fields the pruned schema dropped (Spark
    * prunes a column out of the required schema precisely when only fully
    * pushed filters touch it) — the reader parses required ++ extras and
    * emits the required prefix.
    */
  private def parseSchema: StructType = {
    val needed = pushed.flatMap(_.references).toSet -- required.fieldNames
    StructType(required.fields ++ fullSchema.fields.filter(f => needed(f.name)))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val maxSplit = maxSplitOverride.getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")))
      .max(1L)
    listFiles(new Path(path), conf).flatMap { f =>
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
    ExtJsonReaderFactory(conf, parseSchema.json, required.length, pushed)
  }
}

final case class ExtJsonInputPartition(file: String, start: Long, length: Long)
    extends InputPartition

/** Ships to executors: Hadoop conf via the public [[SerializableWritable]],
  * the parse schema as its JSON form (self-contained, version-stable).
  */
final case class ExtJsonReaderFactory(conf: SerializableWritable[Configuration],
    parseSchemaJson: String, requiredLen: Int, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ExtJsonInputPartition]
    new ExtJsonPartitionReader(p, conf.value,
      DataTypeJson.structFromJson(parseSchemaJson), requiredLen, pushed)
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
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {

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
    while (pos <= end) {
      val n = lines.readLine(text)
      if (n == 0) return false
      pos += n
      if (text.getLength > 0) {
        val row = parser.parse(text.getBytes, 0, text.getLength)
        if (keepRow(row)) {
          current = project(row)
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

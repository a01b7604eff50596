package graft.ingest.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader

import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level ZONE MAPS for the document source — min/max/null statistics
  * per (file, column) in a `_graft_zonemaps` parquet sidecar, the data
  * skipping layer parquet gets from row-group footers and table formats
  * (Iceberg/Delta manifests, Trino zone maps — all public designs) keep
  * per data file. JSONL has no footer to mine, so the stats are built by
  * ONE distributed pass ([[ZoneMaps.build]]) and consulted at PLANNING
  * time: a pushed predicate that is provably false for every row of a
  * file (`o_totalprice > 400000` against a file whose max is 180000)
  * drops the FILE before it is ever split, read, or parsed.
  *
  * This is the data-column complement of the `partitionColumns`
  * directory pruning: partition pruning needs the layout to encode the
  * key; zone maps exploit natural CLUSTERING of any indexed column (a
  * date-appended drop is clustered on time; a range-written drop on its
  * sort key). RUNTIME filters prune too — a selective dimension join's
  * observed keys can skip whole fact files mid-execution.
  *
  * Correctness posture — pruning may only REMOVE files whose every row a
  * residual filter would drop anyway:
  *  - the evaluation is conservative three-valued ([[ZoneMaps.maybeTrue]]):
  *    a file survives unless a pushed conjunct is definitely-not-true for
  *    all rows; unknown columns, unsupported shapes, and `Not`/string
  *    matches all answer "maybe";
  *  - stats rows carry the file's byte LENGTH and MODIFICATION TIME; a
  *    file whose current (length, mtime) differs (rewritten since
  *    indexing) is treated as stats-less and kept — stale stats can cost
  *    speed, never rows (the sidecar lives OUTSIDE the files it
  *    describes, unlike a parquet footer, so drift is detected, not
  *    assumed away);
  *  - files with no stats row (landed after the build) are kept;
  *  - ordering uses the SAME comparator as the readers
  *    ([[FilterEval.compareInternal]] — binary UTF8String order for
  *    strings), and min/max round-trip through their internal canonical
  *    renderings, so "provably false" here means provably false under
  *    exactly the reader's comparison semantics.
  */
object ZoneMaps {

  /** Sidecar directory name under the drop root (underscore-prefixed:
    * invisible to the scan's own listings, like `_compacted`).
    */
  val SidecarDir = "_graft_zonemaps"

  /** Types a zone map can index: comparable atomics whose internal form
    * has a canonical string rendering.
    */
  def indexable(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | FloatType | DoubleType |
        DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Internal value → canonical sidecar string (per leaf type). */
  private[v2] def render(v: Any, dt: DataType): String = dt match {
    case StringType => v.asInstanceOf[UTF8String].toString
    case IntegerType | DateType => v.asInstanceOf[Int].toString
    case LongType | TimestampType => v.asInstanceOf[Long].toString
    case FloatType => v.asInstanceOf[Float].toString
    case DoubleType => v.asInstanceOf[Double].toString
    case _: DecimalType =>
      v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString
    case other => throw new IllegalStateException(s"unindexable $other")
  }

  /** Canonical sidecar string → internal value. */
  private[v2] def decode(s: String, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(s)
    case IntegerType | DateType => s.toInt
    case LongType | TimestampType => s.toLong
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case d: DecimalType =>
      Decimal(new java.math.BigDecimal(s), d.precision, d.scale)
    case other => throw new IllegalStateException(s"unindexable $other")
  }

  /** Bloom insert/probe key: the canonical rendering with signed float
    * zeros NORMALIZED — the comparator treats -0.0 and 0.0 as EQUAL
    * (Spark semantics), so the membership filter must too, or a file of
    * -0.0s would be wrongly pruned for a pushed `col = 0.0` (renderings
    * "-0.0" vs "0.0" differ). `x + 0.0` maps -0.0 to 0.0, NaN-safe.
    */
  private[v2] def bloomKey(v: Any, dt: DataType): String = dt match {
    case FloatType => render(v.asInstanceOf[Float] + 0.0f, dt)
    case DoubleType => render(v.asInstanceOf[Double] + 0.0d, dt)
    case _ => render(v, dt)
  }

  /** One file's stats for one column (values decoded to internal form).
    * `min`/`max` are None when the column had no non-null values;
    * `bloom` carries the file's membership filter when the column was
    * bloom-indexed (no false negatives, so "definitely absent" may
    * prune; fpp only costs skipped skips).
    */
  final case class ColStats(min: Option[Any], max: Option[Any],
      nulls: Long, rows: Long,
      bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None)

  /** Build (or rebuild) the sidecar for every visible file under
    * `dropDir`: one distributed pass, one task per file, each computing
    * min/max/nullCount for the requested (possibly dotted/nested)
    * columns over the minimal parse schema. Returns the number of files
    * indexed. Compressed files decode through the codec; malformed lines
    * count as all-null rows — exactly the reader's permissive semantics,
    * so the stats describe what the scan would actually see.
    */
  def build(spark: SparkSession, dropDir: String, schema: StructType,
      cols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomFpp: Double = 0.01): Long = {
    require(cols.nonEmpty, "zone maps need at least one column")
    require(bloomCols.forall(cols.contains),
      s"bloomCols ${bloomCols.filterNot(cols.contains).mkString(", ")} " +
        "must also be min/max-indexed (list them in cols)")
    cols.foreach { c =>
      val p = FilterEval.resolve(c, schema).getOrElse(throw
        new IllegalArgumentException(
          s"zone-map column '$c' does not resolve in ${schema.catalogString}"))
      require(indexable(p.leaf.dataType),
        s"zone-map column '$c' has unindexable type ${p.leaf.dataType.simpleString}")
    }
    val conf = new SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dropDir)
    val fs = root.getFileSystem(conf.value)
    require(fs.getFileStatus(root).isDirectory,
      s"zone maps index a document DIRECTORY, got $dropDir")
    def visible(st: FileStatus): Boolean = {
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    def walk(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(visible).flatMap(walk)
      else if (st.isFile && st.getLen > 0) Seq(st)
      else Seq.empty
    val rootUri = fs.makeQualified(root).toUri
    val files = fs.listStatus(root).toSeq.filter(visible).flatMap(walk)
      .map { st =>
        val rel = rootUri.relativize(
          fs.makeQualified(st.getPath).toUri).getPath
        (st.getPath.toString, rel, st.getLen, st.getModificationTime)
      }
    val schemaJson = SchemaMerge.merge(Array.empty,
      cols.map(_.split("\\.", -1).toSeq), schema).json
    val colsB = cols.toArray
    val bloomB = cols.map(bloomCols.contains).toArray
    val statRows = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { case (abs, rel, len, mtime) =>
        val parseSchema = DataTypeJson.structFromJson(schemaJson)
        val parser = new ExtJsonParser(parseSchema)
        val getters = colsB.map(FilterEval.compiledGetter(_, parseSchema))
        val types = colsB.map(
          FilterEval.resolve(_, parseSchema).get.leaf.dataType)
        val mins = new Array[Any](colsB.length)
        val maxs = new Array[Any](colsB.length)
        val nulls = new Array[Long](colsB.length)
        // expected-items heuristic from the byte size (>= ~64 B/doc):
        // undersizing only raises the false-positive rate — bloom
        // correctness (no false negatives) never depends on the estimate
        val blooms: Array[org.apache.spark.util.sketch.BloomFilter] =
          colsB.indices.map(i =>
            if (bloomB(i)) org.apache.spark.util.sketch.BloomFilter
              .create(math.max(1024L, len / 64L), bloomFpp)
            else null).toArray
        var rows = 0L
        val codec = new org.apache.hadoop.io.compress
          .CompressionCodecFactory(conf.value).getCodec(new Path(abs))
        val split = ExtJsonInputPartition(abs, 0L, len,
          wholeFile = codec != null)
        val stream = SplitIO.open(split, conf.value)
        val lines = new LineReader(stream)
        val text = new Text()
        try {
          while (lines.readLine(text) > 0) {
            if (text.getLength > 0) {
              rows += 1
              val row = parser.parse(text.getBytes, 0, text.getLength)
              var i = 0
              while (i < getters.length) {
                val v = getters(i)(row)
                if (v == null) nulls(i) += 1
                else {
                  if (mins(i) == null ||
                    FilterEval.compareInternal(types(i), v, mins(i)) < 0)
                    mins(i) = v
                  if (maxs(i) == null ||
                    FilterEval.compareInternal(types(i), v, maxs(i)) > 0)
                    maxs(i) = v
                  if (blooms(i) != null)
                    blooms(i).putString(bloomKey(v, types(i)))
                }
                i += 1
              }
            }
          }
        } finally { lines.close(); stream.close() }
        colsB.indices.map { i =>
          val bloomBytes =
            if (blooms(i) == null) null
            else {
              val bos = new java.io.ByteArrayOutputStream()
              blooms(i).writeTo(bos)
              bos.toByteArray
            }
          Row(rel, len, mtime, rows, colsB(i), types(i).json,
            if (mins(i) == null) null else render(mins(i), types(i)),
            if (maxs(i) == null) null else render(maxs(i), types(i)),
            nulls(i), bloomBytes)
        }
      }
    val statSchema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("len", LongType, nullable = false),
      StructField("mtime", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("col", StringType, nullable = false),
      StructField("typ", StringType, nullable = false),
      StructField("min", StringType),
      StructField("max", StringType),
      StructField("nulls", LongType, nullable = false),
      StructField("bloom", BinaryType)))
    spark.createDataFrame(statRows, statSchema)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dropDir/$SidecarDir")
    files.size.toLong
  }

  /** Load the sidecar as (relativePath, len, mtime) → per-column stats,
    * decoded against the DECLARED schema. Empty when absent. The
    * three-part key is the staleness gate: a file rewritten since
    * indexing changes its length or modification time and falls back to
    * scanning (the sidecar lives OUTSIDE the files it describes, unlike
    * a parquet footer, so drift must be detected, not assumed away).
    */
  def load(spark: SparkSession, dropDir: String,
      schema: StructType): Map[(String, Long, Long), Map[String, ColStats]] = {
    val p = new Path(s"$dropDir/$SidecarDir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    spark.read.parquet(p.toString).collect().toSeq
      .flatMap { r =>
        val col = r.getString(4)
        // TYPE drift gate: stats rendered under a different declared
        // type must not prune (a bloom over "123" would false-negative
        // a probe rendered "123.0" — a wrong prune, the one forbidden
        // outcome)
        FilterEval.resolve(col, schema)
          .filter(_.leaf.dataType.json == r.getString(5)).map { fp =>
            val dt = fp.leaf.dataType
            ((r.getString(0), r.getLong(1), r.getLong(2)), col, ColStats(
              Option(r.getString(6)).map(decode(_, dt)),
              Option(r.getString(7)).map(decode(_, dt)),
              r.getLong(8), r.getLong(3),
              Option(r.get(9)).map(b =>
                org.apache.spark.util.sketch.BloomFilter.readFrom(
                  new java.io.ByteArrayInputStream(
                    b.asInstanceOf[Array[Byte]])))))
          }
      }
      .groupBy(_._1)
      .map { case (k, rows) =>
        k -> rows.map { case (_, c, s) => c -> s }.toMap
      }
  }

  /** Conservative three-valued zone test: could `f` be TRUE for at least
    * one row of a file with these stats? `false` ⇒ the file is provably
    * all-drop under this conjunct and may be skipped. Anything the zone
    * algebra can't bound answers `true` (keep).
    */
  def maybeTrue(f: Filter, stats: Map[String, ColStats],
      schema: StructType): Boolean = {
    def dtOf(a: String): Option[DataType] =
      FilterEval.resolve(a, schema).map(_.leaf.dataType)
    def cmp(a: String, v: Any)(test: (ColStats, Any, DataType) => Boolean): Boolean =
      (stats.get(a), dtOf(a)) match {
        case (Some(s), Some(dt)) =>
          if (s.min.isEmpty || s.max.isEmpty) false // no non-null values
          else FilterEval.toInternal(v, dt) match {
            case Some(iv) => test(s, iv, dt)
            case None => true
          }
        case _ => true
      }
    def eqMaybe(a: String, v: Any): Boolean =
      cmp(a, v)((s, iv, dt) =>
        FilterEval.compareInternal(dt, s.min.get, iv) <= 0 &&
          FilterEval.compareInternal(dt, s.max.get, iv) >= 0 &&
          s.bloom.forall(_.mightContainString(bloomKey(iv, dt))))
    f match {
      case And(l, r) =>
        maybeTrue(l, stats, schema) && maybeTrue(r, stats, schema)
      case Or(l, r) =>
        maybeTrue(l, stats, schema) || maybeTrue(r, stats, schema)
      // ONE shared probe for both equality forms: `=` and a non-null `<=>`
      // have identical zone semantics, and a separate code path is how the
      // <=> branch once probed the un-normalized rendering and wrongly
      // pruned a file of +0.0s for a pushed `col <=> -0.0`
      case EqualTo(a, v) => eqMaybe(a, v)
      case EqualNullSafe(a, v) =>
        if (v == null) stats.get(a).forall(_.nulls > 0)
        else eqMaybe(a, v)
      case GreaterThan(a, v) => cmp(a, v)((s, iv, dt) =>
        FilterEval.compareInternal(dt, s.max.get, iv) > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v)((s, iv, dt) =>
        FilterEval.compareInternal(dt, s.max.get, iv) >= 0)
      case LessThan(a, v) => cmp(a, v)((s, iv, dt) =>
        FilterEval.compareInternal(dt, s.min.get, iv) < 0)
      case LessThanOrEqual(a, v) => cmp(a, v)((s, iv, dt) =>
        FilterEval.compareInternal(dt, s.min.get, iv) <= 0)
      case In(a, vs) =>
        vs.isEmpty || vs.exists(v =>
          maybeTrue(EqualTo(a, v), stats, schema))
      case IsNull(a) => stats.get(a).forall(_.nulls > 0)
      case IsNotNull(a) => stats.get(a).forall(s => s.nulls < s.rows)
      // Not / string matches / anything else: the zone algebra answers
      // "maybe" rather than risk a wrong prune
      case _ => true
    }
  }
}

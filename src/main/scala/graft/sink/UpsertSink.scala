package graft.sink

import java.sql.{Connection, DriverManager, PreparedStatement}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

import graft.ops.Dedup

/** Per-table upsert conflict policy — the §2.4 policy matrix of SURVEY.md.
  * Ref: `INSERT … ON CONFLICT` forms in the reference's 26 write loops
  * (`/root/reference/dags/includes/user_table.py:105-121` update-set form,
  * `loanoffers_table.py:69-70` DO NOTHING form, `loandeals_table.py:68-69`
  * bare form, non-`_id` key at
  * `loan_applications_to_postgres_migration.py:52`).
  */
sealed trait ConflictPolicy extends Serializable {
  /** The unique business key the conflict is detected on, if declared. */
  def keyOption: Option[String]
}

object ConflictPolicy {

  /** `ON CONFLICT (key) DO UPDATE SET <updateCols>` — refresh mutable
    * attributes of known rows.
    */
  final case class UpdateOnConflict(key: String, updateCols: Seq[String])
      extends ConflictPolicy {
    require(updateCols.nonEmpty, "update set must be non-empty")
    def keyOption: Option[String] = Some(key)
  }

  /** `ON CONFLICT (key) DO NOTHING` — keep-first / idempotent insert. */
  final case class IgnoreOnConflict(key: String) extends ConflictPolicy {
    def keyOption: Option[String] = Some(key)
  }

  /** Bare `ON CONFLICT DO NOTHING` — swallow any constraint conflict
    * (the reference's loandeals form). Postgres-only; dialects without the
    * bare form must be given a key.
    */
  case object IgnoreAny extends ConflictPolicy {
    def keyOption: Option[String] = None
  }
}

/** Vendor SQL for a single-row parameterized upsert statement.
  *
  * `sql` returns the statement; `paramCols` the column order of its `?`
  * placeholders (a column may appear more than once — e.g. Derby MERGE binds
  * the key and then the full column list again).
  */
trait UpsertDialect extends Serializable {
  def sql(table: String, cols: Seq[String], policy: ConflictPolicy): String
  def paramCols(cols: Seq[String], policy: ConflictPolicy): Seq[String]
  /** Quote an identifier (all generated SQL quotes everything — the
    * reference's `_id` column is not a legal bare identifier everywhere).
    */
  protected def q(ident: String): String = "\"" + ident + "\""
}

/** PostgreSQL `INSERT … ON CONFLICT` — the reference's native form. */
object PostgresUpsertDialect extends UpsertDialect {
  import ConflictPolicy._

  def sql(table: String, cols: Seq[String], policy: ConflictPolicy): String = {
    val base = s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    policy match {
      case UpdateOnConflict(key, upd) =>
        base + s" ON CONFLICT (${q(key)}) DO UPDATE SET " +
          upd.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
      case IgnoreOnConflict(key) => base + s" ON CONFLICT (${q(key)}) DO NOTHING"
      case IgnoreAny             => base + " ON CONFLICT DO NOTHING"
    }
  }

  def paramCols(cols: Seq[String], policy: ConflictPolicy): Seq[String] = cols
}

/** Apache Derby `MERGE INTO … USING SYSIBM.SYSDUMMY1` — the embedded
  * database the test suite runs against (ships with Spark). Semantically
  * equivalent to the Postgres forms for keyed policies; Derby has no bare
  * `ON CONFLICT`, so [[ConflictPolicy.IgnoreAny]] is rejected.
  */
object DerbyUpsertDialect extends UpsertDialect {
  import ConflictPolicy._

  def sql(table: String, cols: Seq[String], policy: ConflictPolicy): String = {
    def merge(key: String, matched: Option[Seq[String]]): String = {
      val insert = s"WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
      val update = matched.fold("") { upd =>
        s"WHEN MATCHED THEN UPDATE SET ${upd.map(c => s"${q(c)} = ?").mkString(", ")} "
      }
      s"MERGE INTO ${q(table)} USING SYSIBM.SYSDUMMY1 " +
        s"ON ${q(table)}.${q(key)} = ? $update$insert"
    }
    policy match {
      case UpdateOnConflict(key, upd) => merge(key, Some(upd))
      case IgnoreOnConflict(key)      => merge(key, None)
      case IgnoreAny =>
        throw new IllegalArgumentException("Derby dialect requires a conflict key")
    }
  }

  def paramCols(cols: Seq[String], policy: ConflictPolicy): Seq[String] =
    policy match {
      case UpdateOnConflict(key, upd) => (key +: upd) ++ cols
      case IgnoreOnConflict(key)      => key +: cols
      case IgnoreAny =>
        throw new IllegalArgumentException("Derby dialect requires a conflict key")
    }
}

/** Batched JDBC upsert sink (SURVEY.md §2 S4) — the one genuinely custom
  * physical component of the engine (stock `df.write.jdbc` has no upsert
  * mode).
  *
  * Replaces the reference's one-INSERT-one-COMMIT-per-row loop
  * (`user_table.py:117-118`) with `foreachPartition` →
  * `PreparedStatement.addBatch` → one commit per `batchSize` rows: the
  * write path is distributed across executors, each holding ONE connection,
  * and `maxConnections` caps the fan-in the target database sees (a 1000
  * -executor cluster must not open 1000×32 connections).
  *
  * Within-batch key dedup (keep-first in key order) runs before the write:
  * a multi-row statement batch that hits the same key twice is rejected by
  * Postgres (`ON CONFLICT DO UPDATE command cannot affect row a second
  * time`) — the reference only survives this via its row-wise
  * `try/except` (SURVEY §7.4.6).
  *
  * Rerun-idempotency comes from the conflict policy itself (same contract
  * as the reference): re-upserting the same batch is a no-op diff.
  */
object UpsertSink {

  def upsert(df: DataFrame, url: String, table: String, policy: ConflictPolicy,
      dialect: UpsertDialect = PostgresUpsertDialect,
      batchSize: Int = 1000, maxConnections: Int = 8,
      connectionProps: Properties = new Properties): Unit = {
    val cols = df.schema.fieldNames.toSeq
    policy match {
      case ConflictPolicy.UpdateOnConflict(key, upd) =>
        val missing = (upd :+ key).filterNot(cols.contains)
        require(missing.isEmpty, s"policy references absent columns: $missing")
      case _ => ()
    }
    val deduped = policy.keyOption match {
      case Some(key) => Dedup.keepFirst(df, Seq(key), cols.map(c => col(c).asc))
      case None      => df
    }
    val sqlText = dialect.sql(table, cols, policy)
    val paramIdx = dialect.paramCols(cols, policy).map(cols.indexOf)
    val writers = math.max(1, math.min(maxConnections, deduped.rdd.getNumPartitions))
    deduped.coalesce(writers).foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url, connectionProps)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sqlText)
          var pending = 0
          rows.foreach { row =>
            bind(ps, row, paramIdx)
            ps.addBatch()
            pending += 1
            if (pending >= batchSize) {
              ps.executeBatch(); conn.commit(); pending = 0
            }
          }
          if (pending > 0) { ps.executeBatch(); conn.commit() }
          ps.close()
        } finally conn.close()
      }
    }
  }

  private def bind(ps: PreparedStatement, row: Row, paramIdx: Seq[Int]): Unit = {
    var i = 0
    while (i < paramIdx.length) {
      val v = row.get(paramIdx(i))
      if (v == null) ps.setObject(i + 1, null) else ps.setObject(i + 1, v)
      i += 1
    }
  }
}

/** DDL executor (SURVEY.md §2 S9): plain driver-side JDBC, Spark not
  * involved — mirrors the reference's `PostgresOperator` create-table stage
  * (`mongo_to_postgres_migration.py:38-106`) and schema reset
  * (`erase_schema.py:24-30`).
  */
object Ddl {

  def execute(url: String, statements: Seq[String],
      props: Properties = new Properties): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      statements.foreach(st.execute)
      st.close()
    } finally conn.close()
  }

  /** `CREATE TABLE IF NOT EXISTS` portability shim: Derby lacks IF NOT
    * EXISTS, so existence errors on the bare CREATE are swallowed.
    */
  def ensureTable(url: String, createSql: String,
      props: Properties = new Properties): Unit =
    try execute(url, Seq(createSql), props)
    catch {
      case e: java.sql.SQLException
          if e.getSQLState == "X0Y32" /* Derby: object already exists */ => ()
    }
}

package graft.sink

import java.sql.{Connection, PreparedStatement}

/**
 * X1 — transactional micro-batch executor (reference
 * `support/BatchExecutor.java:21-105`): one JDBC connection per Spark
 * partition, `autoCommit=false` (`:37`), statements accumulated with
 * `addBatch` and flushed every `commitBatch` rows (ETL cadence,
 * `PhoenixEtlService.java:456-459`), `commit`/`rollback` per
 * partition-batch (`:77-91`). Mirrors Spark's own `JdbcUtils.savePartition`
 * idiom; lives inside `foreachPartition`, below Catalyst.
 */
final class BatchExecutor(conn: Connection, commitBatch: Int = 5000) extends AutoCloseable {
  conn.setAutoCommit(false)

  private var pending = 0      // statements in the open JDBC batch
  private var sinceCommit = 0  // statements since last commit (cadence counter)
  private val stmts = scala.collection.mutable.Map[String, PreparedStatement]()
  private var currentSql: String = null // whose JDBC batch is open

  private def stmt(sql: String): PreparedStatement =
    stmts.getOrElseUpdate(sql, conn.prepareStatement(sql))

  /**
   * Queue one parameterized statement; auto-commits every `commitBatch`.
   *
   * ORDERING INVARIANT: statements must take effect in call order — a CDC
   * partition interleaves DELETE/INSERT for the same keys, and reordering
   * them corrupts final state. JDBC batching is therefore *run-length* only:
   * consecutive calls with the same SQL share a batch; switching statement
   * text flushes the open batch first. (The reference executes every
   * statement immediately — `BatchExecutor.java:60-75` — batching only the
   * commit; run-length batching keeps that ordering while recovering the
   * executeBatch round-trip win for homogeneous stretches, which is what
   * ETL/bulk loads are.)
   */
  def execute(sql: String, params: Seq[Any]): Unit = {
    if (currentSql != null && currentSql != sql) flush()
    currentSql = sql
    val ps = stmt(sql)
    params.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
    ps.addBatch()
    pending += 1
    sinceCommit += 1
    if (sinceCommit >= commitBatch) commit()
  }

  /** Execute an unparameterized DDL/utility statement immediately (in order). */
  def executeDirect(sql: String): Unit = {
    flush()
    val s = conn.createStatement()
    try s.execute(sql) finally s.close()
  }

  private def flush(): Unit = {
    if (currentSql != null) stmts(currentSql).executeBatch()
    currentSql = null
    pending = 0
  }

  def commit(): Unit = { flush(); sinceCommit = 0; conn.commit() }

  def rollback(): Unit = {
    stmts.values.foreach(_.clearBatch())
    currentSql = null; pending = 0; sinceCommit = 0
    conn.rollback()
  }

  override def close(): Unit = {
    try commit() finally {
      stmts.values.foreach(_.close()); conn.close()
    }
  }
}

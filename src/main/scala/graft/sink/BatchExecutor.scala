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

  private var pending = 0
  private val stmts = scala.collection.mutable.Map[String, PreparedStatement]()

  private def stmt(sql: String): PreparedStatement =
    stmts.getOrElseUpdate(sql, conn.prepareStatement(sql))

  /** Queue one parameterized statement; auto-commits every `commitBatch`. */
  def execute(sql: String, params: Seq[Any]): Unit = {
    val ps = stmt(sql)
    params.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
    ps.addBatch()
    pending += 1
    if (pending >= commitBatch) commit()
  }

  /** Execute an unparameterized DDL/utility statement immediately. */
  def executeDirect(sql: String): Unit = {
    flush()
    val s = conn.createStatement()
    try s.execute(sql) finally s.close()
  }

  private def flush(): Unit = {
    stmts.values.foreach(_.executeBatch())
    pending = 0
  }

  def commit(): Unit = { flush(); conn.commit() }

  def rollback(): Unit = {
    stmts.values.foreach(_.clearBatch()); pending = 0; conn.rollback()
  }

  override def close(): Unit = {
    try commit() finally {
      stmts.values.foreach(_.close()); conn.close()
    }
  }
}

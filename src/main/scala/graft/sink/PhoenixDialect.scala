package graft.sink

import graft.model.DbMapping

/**
 * E2 + SQL-text generation — the Phoenix-flavored JDBC dialect: identifier
 * escaping/case folding (reference `SyncUtil.java:258-273` `escape`,
 * `MappingConfig.java:119-125` `escapeUpper` default true) and the
 * UPSERT/DELETE/TRUNCATE statement shapes the sink emits
 * (`PhoenixSyncService.java:379-423,473-498,505-513`).
 *
 * Kept as pure string functions so statement text is golden-testable without
 * a live Phoenix (SURVEY §7.4 risk 6).
 */
object PhoenixDialect {

  /** Upper-case + double-quote an identifier (skip if already quoted). */
  def escape(id: String, escapeUpper: Boolean = true): String = {
    if (id.startsWith("\"") && id.endsWith("\"")) id
    else if (escapeUpper) "\"" + id.toUpperCase + "\""
    else "\"" + id + "\""
  }

  /** `targetDb.targetTable` with each part escaped
    * (`SyncUtil.getDbTableName`). */
  def tableName(mapping: DbMapping): String =
    mapping.targetDb match {
      case Some(db) => s"${escape(db, mapping.escapeUpper)}.${escape(mapping.targetTableName, mapping.escapeUpper)}"
      case None => escape(mapping.targetTableName, mapping.escapeUpper)
    }

  /** `UPSERT INTO t ("A","B") VALUES (?,?)` (`PhoenixSyncService.java:379-423`). */
  def upsertSql(mapping: DbMapping, targetCols: Seq[String]): String = {
    val cols = targetCols.map(escape(_, mapping.escapeUpper)).mkString(", ")
    val qs = targetCols.map(_ => "?").mkString(", ")
    s"UPSERT INTO ${tableName(mapping)} ($cols) VALUES ($qs)"
  }

  /** `DELETE FROM t WHERE "PK1"=? AND "PK2"=?` (`:575-593` WHERE-builder). */
  def deleteSql(mapping: DbMapping): String = {
    val where = mapping.targetPk.keys.toSeq.sorted
      .map(pk => s"${escape(pk, mapping.escapeUpper)} = ?").mkString(" AND ")
    s"DELETE FROM ${tableName(mapping)} WHERE $where"
  }

  /** `TRUNCATE TABLE t` (`:505-513`). */
  def truncateSql(mapping: DbMapping): String =
    s"TRUNCATE TABLE ${tableName(mapping)}"

  /** `SELECT COUNT(1) AS cnt FROM t` (A1, `PhoenixAdapter.java:227`). */
  def countSql(mapping: DbMapping): String =
    s"SELECT COUNT(1) AS cnt FROM ${tableName(mapping)}"
}

package graft.sink

import graft.model.DbMapping

/**
 * Sink dialect: how one logical row-op (K1–K4) becomes parameterized JDBC
 * statements for a given target. Phoenix gets the reference's single
 * `UPSERT` (`PhoenixSyncService.java:379-423`); targets without a native
 * upsert (Derby in tests, vanilla RDBMS) get the reference's *ETL* shape —
 * DELETE-by-PK then INSERT (`PhoenixEtlService.java:409-451`), which has
 * identical last-write-wins semantics.
 */
trait SqlDialect extends Serializable {
  /** Statements for an INSERT/UPDATE (upsert) of a full post-image. */
  def upsert(mapping: DbMapping, cols: Seq[String], values: Seq[Any],
             pkValues: Seq[Any]): Seq[(String, Seq[Any])]
  def delete(mapping: DbMapping, pkValues: Seq[Any]): Seq[(String, Seq[Any])]
  def truncate(mapping: DbMapping): String
  def quote(id: String, escapeUpper: Boolean): String
  def tableName(mapping: DbMapping): String
}

/** Phoenix-style: native UPSERT, double-quoted upper-cased identifiers. */
object PhoenixSqlDialect extends SqlDialect {
  def upsert(m: DbMapping, cols: Seq[String], values: Seq[Any],
             pkValues: Seq[Any]): Seq[(String, Seq[Any])] =
    Seq(PhoenixDialect.upsertSql(m, cols) -> values)
  def delete(m: DbMapping, pkValues: Seq[Any]): Seq[(String, Seq[Any])] =
    Seq(PhoenixDialect.deleteSql(m) -> pkValues)
  def truncate(m: DbMapping): String = PhoenixDialect.truncateSql(m)
  def quote(id: String, escapeUpper: Boolean): String = PhoenixDialect.escape(id, escapeUpper)
  def tableName(m: DbMapping): String = PhoenixDialect.tableName(m)
}

/** Generic JDBC (no native upsert): DELETE-by-PK + INSERT, idempotent. */
object DeleteInsertDialect extends SqlDialect {
  def quote(id: String, escapeUpper: Boolean): String =
    PhoenixDialect.escape(id, escapeUpper)
  def tableName(m: DbMapping): String = PhoenixDialect.tableName(m)
  def upsert(m: DbMapping, cols: Seq[String], values: Seq[Any],
             pkValues: Seq[Any]): Seq[(String, Seq[Any])] = {
    val colList = cols.map(quote(_, m.escapeUpper)).mkString(", ")
    val qs = cols.map(_ => "?").mkString(", ")
    delete(m, pkValues) :+
      (s"INSERT INTO ${tableName(m)} ($colList) VALUES ($qs)" -> values)
  }
  def delete(m: DbMapping, pkValues: Seq[Any]): Seq[(String, Seq[Any])] =
    Seq(PhoenixDialect.deleteSql(m) -> pkValues)
  def truncate(m: DbMapping): String =
    s"DELETE FROM ${tableName(m)}" // Derby lacks TRUNCATE in older modes; DELETE-all is equivalent here
}

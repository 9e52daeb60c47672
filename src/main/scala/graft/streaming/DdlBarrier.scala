package graft.streaming

import graft.ddl.DdlParser
import graft.model.MappingConfig
import graft.sink.{SchemaProbe, SqlDialect, PhoenixSqlDialect}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.sql.Connection

/**
 * DDL barrier semantics for the sync stream (SURVEY §7.4 risk 4): the
 * reference applies DDL inline, *before* queueing further DML
 * (`PhoenixSyncService.java:180-198`), so DDL acts as an ordering barrier on
 * its table. In a micro-batch engine the equivalent is: split each
 * micro-batch at DDL positions and apply the segments sequentially —
 * `[DML ≤ seq₁) ; DDL₁ ; [DML < seq₂) ; DDL₂ ; …`.
 *
 * DDL application itself is driver-side (tiny): parse with [[DdlParser]]
 * (D1/D2), translate ADD/DROP to target DDL (`PhoenixSyncService.java:280-327`),
 * run over JDBC, invalidate the schema cache (S4 coherence), and run the D3
 * default backfill.
 */
object DdlBarrier {

  final case class DdlEvent(seq: Long, sql: String)

  /** Collect the batch's DDL events for a config's table, in order.
    * (DDL is rare and tiny — collecting to the driver is the right plan.) */
  def ddlEvents(batch: DataFrame, config: MappingConfig): Seq[DdlEvent] =
    batch.where(col("isDdl") && col("database") === config.dbMapping.database &&
        col("table") === config.dbMapping.table)
      .select(col("seq"), col("sql"))
      .collect().toSeq
      .map(r => DdlEvent(r.getLong(0), r.getString(1)))
      .sortBy(_.seq)

  /** Split the routed DML rows into segments between DDL barriers; returns
    * (upperBoundExclusive → segment) in apply order plus the DDL to run
    * before each subsequent segment. */
  def segments(routed: DataFrame, ddl: Seq[DdlEvent]): Seq[(Option[DdlEvent], DataFrame)] = {
    if (ddl.isEmpty) Seq((None, routed))
    else {
      val bounds = ddl.map(_.seq)
      val first = (Option.empty[DdlEvent], routed.where(col("seq") < bounds.head))
      val rest = ddl.zipWithIndex.map { case (d, i) =>
        val lower = d.seq
        val upper = bounds.lift(i + 1)
        val seg = upper match {
          case Some(u) => routed.where(col("seq") > lower && col("seq") < u)
          case None => routed.where(col("seq") > lower)
        }
        (Some(d), seg)
      }
      first +: rest
    }
  }

  /**
   * Apply one DDL event to the target (D1/D2/D3) and invalidate the schema
   * cache. Mirrors the reference's mapping: ADD → `ALTER TABLE … ADD IF NOT
   * EXISTS` (+ default backfill), DROP → `ALTER TABLE … DROP COLUMN IF
   * EXISTS` (only when `drop: true`), with `mapAll`/exclusion honored
   * (`PhoenixSyncService.java:280-327`).
   */
  def applyDdl(config: MappingConfig, event: DdlEvent, conn: () => Connection,
               dialect: SqlDialect = PhoenixSqlDialect,
               notify: Option[MappingConfig => Unit] = None): Seq[String] = {
    val stmts = ddlStatements(config, event, dialect)
    if (stmts.nonEmpty) {
      val c = conn()
      try {
        val st = c.createStatement()
        try stmts.foreach(st.execute) finally st.close()
      } finally c.close()
      SchemaProbe.invalidate(config.destination, config.dbMapping) // S4 cache coherence
      notify.foreach(_(config)) // X4 change-notification
    }
    stmts
  }

  /** Pure statement generation for one DDL event (golden-testable). */
  def ddlStatements(config: MappingConfig, event: DdlEvent,
                    dialect: SqlDialect = PhoenixSqlDialect): Seq[String] = {
    val m = config.dbMapping
    val (_, ops) = DdlParser.parse(event.sql)
    val esc = (s: String) => dialect.quote(s, m.escapeUpper)
    ops.flatMap {
      case DdlParser.AddColumn(c, typ, _, default) if m.mapAll && !m.isExcluded(c) =>
        val t = graft.model.TypeMapping.map(typ, m.limit).targetDdl
        val add = s"ALTER TABLE ${dialect.tableName(m)} ADD IF NOT EXISTS ${esc(c)} $t"
        val backfill = default.map(d =>
          graft.ddl.SchemaEvolution.backfillSql(m, c, d))
        add +: backfill.toSeq
      case DdlParser.DropColumn(c) if m.drop =>
        Seq(s"ALTER TABLE ${dialect.tableName(m)} DROP COLUMN IF EXISTS ${esc(c)}")
      case DdlParser.TruncateTable(_) =>
        Seq(dialect.truncate(m))
      case _ => Seq.empty
    }
  }
}

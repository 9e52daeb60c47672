package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * F1/F2 — ETL scan conditions (reference `PhoenixEtlService.java:310-342`,
 * `appendCondition`). Both become Catalyst filters, so predicate pushdown to
 * the source (parquet row-group stats / JDBC WHERE) is automatic — the
 * reference achieves the same by string-appending to its scan SQL.
 */
object Conditions {

  /**
   * F1 — incremental "watermark" filter: with exactly one ETL param and no
   * explicit condition, if the source has a `SYS_TIME` column, scan only
   * `SYS_TIME >= param` (`PhoenixEtlService.java:313-333`).
   */
  def incremental(df: DataFrame, params: Seq[String],
                  sysTimeCol: String = "SYS_TIME"): DataFrame =
    params match {
      case Seq(p) if df.columns.exists(_.equalsIgnoreCase(sysTimeCol)) =>
        val actual = df.columns.find(_.equalsIgnoreCase(sysTimeCol)).get
        df.filter(col(actual) >= lit(p))
      case _ => df
    }

  /**
   * F2 — templated predicate: config-supplied SQL fragment with `{0},{1},…`
   * placeholders substituted by ETL params (`PhoenixEtlService.java:334-342`),
   * evaluated through the Spark SQL parser (`expr`) so any boolean
   * expression works and pushes down.
   */
  def templated(df: DataFrame, etlCondition: String, params: Seq[String]): DataFrame = {
    if (etlCondition == null || etlCondition.trim.isEmpty) df
    else df.where(expr(substitute(etlCondition, params)))
  }

  /** `{i}` placeholder substitution (exposed for tests / SQL-text parity). */
  def substitute(template: String, params: Seq[String]): String =
    params.zipWithIndex.foldLeft(template) { case (t, (p, i)) =>
      t.replace(s"{$i}", p)
    }.replaceAll("(?i)^\\s*where\\s+", "")
}

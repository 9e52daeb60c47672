package graft.etl

import graft.model.MappingConfig
import graft.sink.UpsertSink
import graft.transform.{ColumnMapper, Conditions, EnumDecode}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.sql.Connection

/**
 * S2/P1/X3/A1 — the bulk-import path (reference
 * `service/PhoenixEtlService.java:220-308` `importData` +
 * `PhoenixAdapter.java:162-255` etl/count endpoints), Spark-first:
 *
 *  - the reference's manual 3-thread `LIMIT offset,size` pagination (P1,
 *    `:264-287`) is replaced by a *partitioned* source read — for JDBC,
 *    `partitionColumn/lowerBound/upperBound/numPartitions` (range predicates,
 *    no O(n²) OFFSET rescans); for files, Spark's split planning. The 10k-row
 *    threshold heuristic (`:265`) becomes unnecessary: partitioned reads are
 *    cheap for small inputs too.
 *  - conditions (F1/F2) and projection (T2) are Catalyst filters/projects,
 *    so pushdown/pruning reach the scan (the reference always scans
 *    `SELECT *`, `:243-244`).
 */
object EtlJob {

  final case class EtlResult(succeeded: Boolean, resultMessage: String,
                             errorMessage: Option[String] = None)

  /** Read the source. For the test corpus this is parquet; a JDBC source
    * would use `spark.read.jdbc(url, table, partitionColumn, lb, ub, n,
    * props)` with identical downstream code. */
  def readSource(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The transform stage of the import: condition → projection → enum
    * decode. Kept separate from the sink for testability and reuse by the
    * sync path. */
  def transform(src: DataFrame, config: MappingConfig, params: Seq[String]): DataFrame = {
    val m = config.dbMapping
    val conditioned =
      if (m.etlCondition != null) Conditions.templated(src, m.etlCondition, params)
      else Conditions.incremental(src, params)
    val projected = ColumnMapper.project(conditioned, m)
    EnumDecode.decodeAll(projected, m.enumColumns)
  }

  /** Full import of one config (§3.2 lifecycle). */
  def importOne(spark: SparkSession, config: MappingConfig, sourcePath: String,
                params: Seq[String], connFactory: () => Connection,
                numPartitions: Int = 0,
                dialect: graft.sink.SqlDialect = graft.sink.PhoenixSqlDialect): EtlResult = {
    try {
      val out = transform(readSource(spark, sourcePath), config, params)
      UpsertSink.writeUpserts(out, config.dbMapping, connFactory, numPartitions, dialect)
      EtlResult(succeeded = true, s"imported into ${config.dbMapping.targetTable}")
    } catch {
      case t: Throwable =>
        EtlResult(succeeded = false, "import failed", Some(t.toString))
    }
  }

  /**
   * X3 — task orchestration (`PhoenixAdapter.java:162-207`): run one config
   * by name, or fan out over all configs whose `destination == task`,
   * aggregating messages.
   */
  def etl(spark: SparkSession, task: String, configs: Map[String, MappingConfig],
          params: Seq[String], sourcePathFor: MappingConfig => String,
          connFactory: () => Connection,
          dialect: graft.sink.SqlDialect = graft.sink.PhoenixSqlDialect): Seq[EtlResult] = {
    val selected = configs.get(task).map(Seq(_)).getOrElse(
      configs.values.filter(_.destination == task).toSeq)
    selected.map(c => importOne(spark, c, sourcePathFor(c), params, connFactory,
      dialect = dialect))
  }

  /** A1 — count endpoint (`PhoenixAdapter.java:216-255`). Against a remote
    * JDBC target the raw statement is cheaper than a Spark job (SURVEY §3.3);
    * against in-engine tables it's `df.count()` (partial+final aggregate). */
  def count(df: DataFrame): Long = df.count()
}

package graft

import graft.queries.{LlmQueries, ParityQueries, RelationalQueries, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Query registry: one entry per implemented operator of SURVEY §2
 * (ParityQueries), the relational surface Spark provides over the same data
 * (RelationalQueries — SURVEY §2.3 categories), and the LLM-pipeline
 * extensions (LlmQueries). Each query with an oracle hash-matches DuckDB on
 * the same inputs; queries without an oracle (approximate/RDD-plumbing ops)
 * get the driver's rows-only check.
 */
object SparkEntry {

  val defs: Seq[QueryDef] =
    ParityQueries.all ++ RelationalQueries.all ++ LlmQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed training-data pipeline: quality scoring → lang-ID →
    * MinHash-LSH dedup canonicalization → deterministic train/test split. */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_training_set")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

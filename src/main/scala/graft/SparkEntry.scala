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

  /** Declared registry size — the ONE count the coverage board and
    * ContractSpec quote. It lives beside the registry it describes and is
    * enforced by the `require` below at object init, so adding a query
    * without bumping it fails every entrypoint (Verify, Bench, any spec)
    * immediately — a drift can no longer ship three commits before a test
    * notices (the round-9 146-vs-148 failure mode). */
  val DeclaredCoverage: Int = 227

  val defs: Seq[QueryDef] = {
    val all = ParityQueries.all ++ RelationalQueries.all ++ LlmQueries.all
    require(all.size == DeclaredCoverage,
      s"registry drift: ${all.size} queries defined but DeclaredCoverage " +
        s"= $DeclaredCoverage — bump the constant beside this registry")
    require(all.map(_.name).distinct.size == all.size,
      "duplicate query names in the registry")
    all
  }

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

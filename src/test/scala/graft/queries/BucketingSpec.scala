package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * The co-located-join scale technique: two tables bucketed (and sorted)
 * on the join key join with ZERO exchange — at 100 TB this is the
 * difference between a free merge and re-shuffling both sides. Bucketing
 * metadata lives in the catalog, so the proof goes through `saveAsTable`
 * external tables.
 */
class BucketingSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  test("tables bucketed on the join key sort-merge join with zero exchange") {
    val root = Files.createTempDirectory("graft-bucketing")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the non-broadcast path: the claim under test is shuffle
    // *avoidance* for same-bucketing sort-merge, not broadcastability
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, TestSpark.sf)
      spark.sql("DROP TABLE IF EXISTS b_docs_meta")
      spark.sql("DROP TABLE IF EXISTS b_docs_text")
      docs.select(col("doc_id"), col("lang"), col("source"))
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", root.resolve("meta").toString).saveAsTable("b_docs_meta")
      docs.select(col("doc_id"), col("n_chars"))
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", root.resolve("text").toString).saveAsTable("b_docs_text")

      val joined = spark.table("b_docs_meta")
        .join(spark.table("b_docs_text"), "doc_id")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"),
        "bucketed-on-join-key tables must join without any shuffle\n" + p)
      // and the result is actually correct, not just well-planned
      assert(joined.count() == docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_docs_meta")
      spark.sql("DROP TABLE IF EXISTS b_docs_text")
    }
  }
}

package graft

import graft.llm.{Dedup, Similarity}
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage cost of the banded embedding dedup at sf0.1. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $a"); a
    }
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d)
    // signature computation alone
    val e = emb.select(col("vec_id").cast("long").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))
    timed("signatures(3x64)") {
      e.select(col("id"), Similarity.lshBandBuckets(col("v"), 64, 3, 64).as("s"))
        .select(sum(size(col("s")))).head().getLong(0)
    }
    val cand = timed("candidates(3x64) count") {
      Dedup.embeddingLshCandidates(emb, "vec_id", "embedding", 64, 3, 64).count()
    }
    timed("full t=0.3 pairs") {
      Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 64, 0.3, 3, 64).count()
    }
    val full = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 64, 0.3, 3, 64)
    println(full.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort "))
      .mkString("\n"))
    println(s"candidates=$cand")
    spark.stop()
  }
}

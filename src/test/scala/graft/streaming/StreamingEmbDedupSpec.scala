package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StreamingEmbDedupSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  private val v1 = Array.tabulate(64)(i => math.sin(i + 1.0))
  private val v1near = { val c = v1.clone(); c(0) += 0.5; c } // cosine ≈ 0.996
  private val v2 = Array.tabulate(64)(i => math.cos(3.0 * i + 2.0))
  private val v3 = Array.tabulate(64)(i => math.sin(2.0 * i + 0.7))

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map(p => p._1 * p._2).sum
    dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
  }

  private def harness() = {
    val dir = Files.createTempDirectory("sembdedup").toFile
    val ckpt = Files.createTempDirectory("sembdedup-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Boolean)]()
    def writeBatch(name: String, rows: Seq[(Long, Array[Double])]): Unit = {
      import spark.implicits._
      rows.toDF("vecId", "vec").coalesce(1).write.mode("append")
        .parquet(dir.getAbsolutePath)
    }
    def startQuery() = {
      import spark.implicits._
      val op = StreamingEmbDedup()
      op.judged(
          spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
            .parquet(dir.getAbsolutePath).as[StreamingEmbDedup.VecDoc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingEmbDedup.EmbBandVerdict], _: Long) =>
          StreamingNearDedup.verdicts(df.toDF()).collect().foreach { r =>
            sunk.add((r.getLong(0),
              if (r.isNullAt(1)) None else Some(r.getLong(1)),
              r.getBoolean(3)))
          }
        }
        .start()
    }
    (writeBatch _, startQuery _, sunk)
  }

  test("sign-LSH state survives checkpoint restart: a later near-copy loses to the pre-restart keeper") {
    assert(cosine(v1, v1near) >= 0.9, "test precondition: near-copy above threshold")
    assert(cosine(v1, v2) < 0.9 && cosine(v1, v3) < 0.9,
      "test precondition: novel vectors below threshold")
    val (writeBatch, startQuery, sunk) = harness()
    writeBatch("b1", Seq((1L, v1), (3L, v2)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // kill — the banded vector index lives only in checkpointed state

    writeBatch("b2", Seq((9L, v1near), (1L, v1), (5L, v3)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSeq
    assert(out.contains((9L, Some(1L), false)),
      s"near-copy must lose to the recovered pre-restart keeper: $out")
    assert(out.count(_ == ((1L, None, true))) == 2,
      s"keeper replay must stay keep=true in both batches: $out")
    assert(out.contains((3L, None, true)) && out.contains((5L, None, true)), out.toString)
  }

  test("in-batch near-dup resolves to the smaller id; degenerate vectors are kept") {
    val (writeBatch, startQuery, sunk) = harness()
    // doc 2 is a near-copy of doc 1 in the SAME micro-batch; doc 7 is a
    // zero vector (cosine undefined — kept, registers nothing)
    writeBatch("b1", Seq((2L, v1near), (1L, v1), (7L, Array.fill(64)(0.0))))
    val q = startQuery()
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSet
    assert(out.contains((2L, Some(1L), false)),
      s"in-batch near-dup must lose to the smaller id: $out")
    assert(out.contains((1L, None, true)), out.toString)
    assert(out.contains((7L, None, true)), "degenerate vector must be kept: " + out)
  }

  test("streaming keepers absorb into the batch embedding-signature store; batch jobs then judge against them") {
    import spark.implicits._
    val corpusDir = Files.createTempDirectory("sed-absorb-corpus")
    Seq((1L, v2.map(_.toFloat).toSeq), (2L, v3.map(_.toFloat).toSeq))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite")
      .parquet(corpusDir.resolve("embeddings.parquet").toString)
    val store = Files.createTempDirectory("sed-absorb-store")
    val prev = spark.conf.getOption("spark.graft.materialized.dir")
    spark.conf.set("spark.graft.materialized.dir", store.toString)
    graft.queries.Materialized.clearSessionCache()
    try {
      val dir = Files.createTempDirectory("sed-absorb-src").toFile
      val ckpt = Files.createTempDirectory("sed-absorb-ckpt").toFile
      Seq((100L, v1)).toDF("vecId", "vec").coalesce(1).write.mode("append")
        .parquet(dir.getAbsolutePath)
      val op = StreamingEmbDedup()
      val q1 = op.judged(
          spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
            .parquet(dir.getAbsolutePath).as[StreamingEmbDedup.VecDoc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingEmbDedup.EmbBandVerdict], id: Long) =>
          StreamingEmbDedup.absorbKeepers(spark, corpusDir.toString, df.toDF(),
            "ingest-e", id)
          ()
        }
        .start()
      q1.processAllAvailable()
      q1.stop()

      // the streamed keeper's deep-banding signatures are now in the shared
      // store: a BATCH incremental embedding near-dup judges a copy of it
      // as a dup of the STREAMED keeper
      val sigs = graft.queries.Materialized.embeddingSignatures(spark, corpusDir.toString)
      assert(sigs.count() == 3, s"corpus 2 + 1 streamed keeper, got ${sigs.count()}")
      val day2 = graft.queries.Tables.embeddings(spark, corpusDir.toString)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .unionByName(Seq((100L, v1.toSeq)).toDF("vec_id", "embedding"))
      val out = graft.llm.Dedup.dedupIncrementalEmbedding(
          Seq((500L, v1near.toSeq)).toDF("vec_id", "embedding"), sigs, day2,
          "vec_id", "embedding", dims = 64, threshold = 0.9)
        .collect()
      assert(out.length == 1 && out(0).getLong(1) == 100L && !out(0).getBoolean(3),
        s"batch near-copy must lose to the STREAMED keeper via the store: ${out.toSeq}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.materialized.dir", v)
        case None => spark.conf.unset("spark.graft.materialized.dir")
      }
      graft.queries.Materialized.clearSessionCache()
    }
  }

  test("streaming keepers append to the stored IVF index; probed searches then retrieve them") {
    import spark.implicits._
    val corpusDir = Files.createTempDirectory("sed-ivf-corpus")
    Seq((1L, v2.map(_.toFloat).toSeq), (2L, v3.map(_.toFloat).toSeq))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite")
      .parquet(corpusDir.resolve("embeddings.parquet").toString)
    val store = Files.createTempDirectory("sed-ivf-store")
    val prev = spark.conf.getOption("spark.graft.materialized.dir")
    spark.conf.set("spark.graft.materialized.dir", store.toString)
    graft.queries.Materialized.clearSessionCache()
    try {
      val dir = Files.createTempDirectory("sed-ivf-src").toFile
      val ckpt = Files.createTempDirectory("sed-ivf-ckpt").toFile
      Seq((100L, v1)).toDF("vecId", "vec").coalesce(1).write.mode("append")
        .parquet(dir.getAbsolutePath)
      val op = StreamingEmbDedup()
      val q1 = op.judged(
          spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
            .parquet(dir.getAbsolutePath).as[StreamingEmbDedup.VecDoc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingEmbDedup.EmbBandVerdict], id: Long) =>
          StreamingEmbDedup.absorbKeepersIvf(spark, corpusDir.toString, df.toDF(),
            "ingest-i", id)
          ()
        }
        .start()
      q1.processAllAvailable()
      q1.stop()

      // the streamed keeper now lives in an appended index generation: the
      // head view has corpus + keeper, and a probed search for the keeper's
      // own vector retrieves it at cosine 1 — a result only the appended
      // generation can produce
      val idx = graft.queries.Materialized.ivfIndexCurrent(spark, corpusDir.toString)
      assert(idx.assignment.count() == 3,
        s"corpus 2 + 1 streamed keeper, got ${idx.assignment.count()}")
      val hit = graft.llm.Similarity.ivfSearch(idx.assignment, idx.centroids,
          v1.toSeq, k = 1, nprobe = 8)
        .collect()
      assert(hit.length == 1 && hit(0).getLong(0) == 100L &&
        hit(0).getDouble(2) == 1.0,
        s"probed search must retrieve the streamed keeper exactly: ${hit.toSeq}")
      // exactly-once: replaying the micro-batch id is a no-op
      graft.queries.Materialized.appendIvfIndex(spark, corpusDir.toString,
        Seq((100L, v1.toSeq)).toDF("vecId", "vec"), "vecId", "vec",
        "ivf-ingest-i-0")
      assert(graft.queries.Materialized
        .ivfIndexCurrent(spark, corpusDir.toString).assignment.count() == 3,
        "micro-batch replay must not duplicate index rows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.materialized.dir", v)
        case None => spark.conf.unset("spark.graft.materialized.dir")
      }
      graft.queries.Materialized.clearSessionCache()
    }
  }
}

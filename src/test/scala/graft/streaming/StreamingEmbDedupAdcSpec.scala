package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Duration

class StreamingEmbDedupAdcSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  private val v1 = Array.tabulate(64)(i => math.sin(i + 1.0))
  private val v1near = { val c = v1.clone(); c(0) += 0.5; c } // cosine ≈ 0.996
  private val v2 = Array.tabulate(64)(i => math.cos(3.0 * i + 2.0))
  private val v3 = Array.tabulate(64)(i => math.sin(2.0 * i + 0.7))

  private def harness() = {
    val dir = Files.createTempDirectory("sadc").toFile
    val ckpt = Files.createTempDirectory("sadc-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Option[Double], Boolean)]()
    def writeBatch(rows: Seq[(Long, Array[Double])]): Unit = {
      import spark.implicits._
      rows.toDF("vecId", "vec").coalesce(1).write.mode("append")
        .parquet(dir.getAbsolutePath)
    }
    def startQuery() = {
      import spark.implicits._
      val op = StreamingEmbDedupAdc()
      op.judged(
          spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
            .parquet(dir.getAbsolutePath).as[StreamingEmbDedup.VecDoc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingEmbDedupAdc.AdcBandVerdict], _: Long) =>
          StreamingNearDedup.verdicts(df.toDF()).collect().foreach { r =>
            sunk.add((r.getLong(0),
              if (r.isNullAt(1)) None else Some(r.getLong(1)),
              if (r.isNullAt(2)) None else Some(r.getDouble(2)),
              r.getBoolean(3)))
          }
        }
        .start()
    }
    (writeBatch _, startQuery _, sunk)
  }

  test("ADC state survives checkpoint restart; exact copy estimates cosine 1 exactly; keeper replay stays keep") {
    val (writeBatch, startQuery, sunk) = harness()
    writeBatch(Seq((1L, v1), (3L, v2)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // kill — the 16-byte sketch index lives only in checkpointed state

    // 9L is an EXACT copy of keeper 1: every decided plane agrees, so the
    // ADC estimate is exactly 1.0 — the structural dup-detection contract
    writeBatch(Seq((9L, v1.clone()), (1L, v1), (5L, v3)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSeq
    assert(out.contains((9L, Some(1L), Some(1.0), false)),
      s"exact copy must lose to the recovered keeper at est exactly 1: $out")
    assert(out.count(_ == ((1L, None, None, true))) == 2,
      s"keeper replay must stay keep=true in both batches: $out")
    assert(out.exists(r => r._1 == 3L && r._4) && out.exists(r => r._1 == 5L && r._4), out.toString)
  }

  test("near-copy verifies through the estimator; novel vectors and degenerate vectors keep; in-batch dup resolves to the smaller id") {
    val (writeBatch, startQuery, sunk) = harness()
    // 2L near-copies 1L in the same micro-batch; 7L is a zero vector
    writeBatch(Seq((2L, v1near), (1L, v1), (7L, Array.fill(64)(0.0))))
    val q = startQuery()
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSeq
    val dup = out.find(_._1 == 2L).get
    assert(dup._2.contains(1L) && !dup._4,
      s"in-batch near-dup must lose to the smaller id: $out")
    // the estimate approximates the true cosine (≈0.996); 128 planes put
    // ~8σ between it and the 0.9 threshold, and the deterministic planes
    // make this a fixed number, not a flaky one
    assert(dup._3.get >= 0.9 && dup._3.get <= 1.0, s"estimated cosine off: $dup")
    assert(out.exists(r => r._1 == 1L && r._4), out.toString)
    assert(out.exists(r => r._1 == 7L && r._4),
      "degenerate vector must be kept: " + out)
  }

  test("streaming ADC keepers absorb into the hamming signature store; stored-path searches then retrieve them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpusDir = Files.createTempDirectory("sadc-absorb-corpus")
    Seq((1L, v2.map(_.toFloat).toSeq), (2L, v3.map(_.toFloat).toSeq))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite")
      .parquet(corpusDir.resolve("embeddings.parquet").toString)
    val store = Files.createTempDirectory("sadc-absorb-store")
    val prev = spark.conf.getOption("spark.graft.materialized.dir")
    spark.conf.set("spark.graft.materialized.dir", store.toString)
    graft.queries.Materialized.clearSessionCache()
    try {
      val dir = Files.createTempDirectory("sadc-absorb-src").toFile
      val ckpt = Files.createTempDirectory("sadc-absorb-ckpt").toFile
      Seq((100L, v1)).toDF("vecId", "vec").coalesce(1).write.mode("append")
        .parquet(dir.getAbsolutePath)
      val op = StreamingEmbDedupAdc()
      val q1 = op.judged(
          spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
            .parquet(dir.getAbsolutePath).as[StreamingEmbDedup.VecDoc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingEmbDedupAdc.AdcBandVerdict], id: Long) =>
          StreamingEmbDedupAdc.absorbKeepers(spark, corpusDir.toString,
            df.toDF(), "ingest-adc", id)
          ()
        }
        .start()
      q1.processAllAvailable()
      q1.stop()

      // the streamed keeper's signature row is now in the shared store: a
      // stored-path ADC search for its own vector retrieves it at cosine 1
      val sigs = graft.queries.Materialized.hammingSigs(spark, corpusDir.toString)
      assert(sigs.count() == 3, s"corpus 2 + 1 streamed keeper, got ${sigs.count()}")
      val corpus = graft.queries.Tables.embeddings(spark, corpusDir.toString)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .unionByName(Seq((100L, v1.toSeq)).toDF("vec_id", "embedding"))
      val hit = graft.llm.Similarity.knnJoinHammingAdcFromSigs(corpus, sigs,
          Seq((500L, v1.toSeq)).toDF("vec_id", "embedding"), "vec_id",
          "embedding", "vec_id", k = 1, dims = 64, oversample = 4)
        .collect()
      assert(hit.length == 1 && hit(0).getLong(1) == 100L &&
        hit(0).getDouble(4) == 1.0,
        s"stored-path search must retrieve the STREAMED keeper at cosine 1: ${hit.toSeq}")

      // the CELL-PARTITIONED twin absorbed the same keeper: the hybrid
      // search sees it too — flat and hybrid stored paths agree on corpus
      // membership after the micro-batch. nprobe=1 makes this strict: the
      // query (= the keeper's own vector) probes exactly one cell, and the
      // absorb-time assignment must have put the keeper in that cell (same
      // (dist, cid) argmin rule on an identical vector).
      val isigs = graft.queries.Materialized.hammingSigsIvf(spark, corpusDir.toString)
      assert(isigs.count() == 3,
        s"cell store must hold corpus 2 + 1 streamed keeper, got ${isigs.count()}")
      val idx = graft.queries.Materialized.ivfIndex(spark, corpusDir.toString)
      val hybHit = graft.llm.Similarity.knnJoinHammingIvf(isigs, corpus,
          idx.centroids, Seq((500L, v1.toSeq)).toDF("vec_id", "embedding"),
          "vec_id", "embedding", "vec_id", k = 1, dims = 64, nprobe = 1,
          oversample = 4)
        .collect()
      assert(hybHit.length == 1 && hybHit(0).getLong(1) == 100L &&
        hybHit(0).getDouble(4) == 1.0,
        s"hybrid search must retrieve the STREAMED keeper at cosine 1: ${hybHit.toSeq}")

      // ... and the RESIDUAL-sketch twin: all three stored search paths
      // agree on membership after the micro-batch
      val rsigs = graft.queries.Materialized.hammingSigsIvfRes(spark, corpusDir.toString)
      assert(rsigs.count() == 3,
        s"residual cell store must hold corpus 2 + 1 streamed keeper, got ${rsigs.count()}")
      val resHit = graft.llm.Similarity.knnJoinHammingIvfRes(rsigs, corpus,
          idx.centroids, Seq((500L, v1.toSeq)).toDF("vec_id", "embedding"),
          "vec_id", "embedding", "vec_id", k = 1, dims = 64, nprobe = 1,
          oversample = 4)
        .collect()
      assert(resHit.length == 1 && resHit(0).getLong(1) == 100L &&
        resHit(0).getDouble(4) == 1.0,
        s"residual hybrid must retrieve the STREAMED keeper at cosine 1: ${resHit.toSeq}")

      // ... and the INT8 code store: the all-stored SQ search (sketch
      // stage 1 + int8 rerank, no raw vector anywhere) sees the streamed
      // keeper too — all four stored search paths agree on membership
      val codes = graft.queries.Materialized.q8Codes(spark, corpusDir.toString)
      assert(codes.count() == 3,
        s"code store must hold corpus 2 + 1 streamed keeper, got ${codes.count()}")
      val sqHit = graft.llm.Similarity.knnJoinHammingSqFromSigs(codes, sigs,
          Seq((500L, v1.toSeq)).toDF("vec_id", "embedding"), "embedding",
          "vec_id", k = 1, dims = 64, oversample = 4)
        .collect()
      assert(sqHit.length == 1 && sqHit(0).getLong(1) == 100L,
        s"SQ search must retrieve the STREAMED keeper: ${sqHit.toSeq}")

      // ... and the CELL-PARTITIONED code store: the fully-composed
      // search (probed-cell pruning on BOTH scans, int8 rerank, no raw
      // vector anywhere) sees the streamed keeper too — all five stored
      // search paths agree on membership. nprobe=1 again makes the
      // absorb-time cell assignment strict on both stores at once.
      val icodes = graft.queries.Materialized.q8CodesIvf(spark, corpusDir.toString)
      assert(icodes.count() == 3,
        s"cell code store must hold corpus 2 + 1 streamed keeper, got ${icodes.count()}")
      val composedHit = graft.llm.Similarity.knnJoinHammingIvfResSq(icodes,
          rsigs, idx.centroids,
          Seq((500L, v1.toSeq)).toDF("vec_id", "embedding"), "embedding",
          "vec_id", k = 1, dims = 64, nprobe = 1, oversample = 4)
        .collect()
      assert(composedHit.length == 1 && composedHit(0).getLong(1) == 100L,
        s"composed search must retrieve the STREAMED keeper: ${composedHit.toSeq}")

      // exactly-once: replaying the micro-batch's absorb (the crashed-
      // writer recovery path) publishes no new delta in either store
      val before = graft.queries.Materialized.absorbsPublished.get()
      StreamingEmbDedupAdc.absorbKeepers(spark, corpusDir.toString,
        Seq(StreamingEmbDedupAdc.AdcBandVerdict(100L, None, None,
          carry = true, Some(v1))).toDF(),
        "ingest-adc", 0L)
      assert(graft.queries.Materialized.absorbsPublished.get() == before,
        "re-absorbing an absorbed micro-batch must publish nothing")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.materialized.dir", v)
        case None => spark.conf.unset("spark.graft.materialized.dir")
      }
      graft.queries.Materialized.clearSessionCache()
    }
  }

  test("ADC TTL: dup within horizon matches, idle bucket evicts, fresh keeper re-elected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sadc-ttl").toFile
    val ckpt = Files.createTempDirectory("sadc-ttl-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Boolean)]()
    def at(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    def writeBatch(rows: Seq[(Long, Array[Double], Timestamp)]): Unit =
      rows.toDF("vecId", "vec", "ts").coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)

    val v = Array.tabulate(16)(i => math.sin(i + 1.0))
    val w = Array.tabulate(16)(i => math.cos(3.0 * i + 2.0))

    val op = StreamingEmbDedupAdc(bands = 4, planesPerBand = 8, dims = 16)
    val q = op.judgedTtl(
        spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>, ts TIMESTAMP")
          .parquet(dir.getAbsolutePath).as[StreamingEmbDedup.TimedVecDoc],
        horizon = Duration.ofSeconds(60), watermarkDelay = "10 seconds")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingEmbDedupAdc.AdcBandVerdict], _: Long) =>
        StreamingNearDedup.verdicts(df.toDF()).collect().foreach { r =>
          sunk.add((r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getBoolean(3)))
        }
      }
      .start()

    writeBatch(Seq((1L, v, at(0))))
    q.processAllAvailable()
    writeBatch(Seq((2L, v, at(30)))) // exact copy within horizon → dup of 1
    q.processAllAvailable()
    writeBatch(Seq((50L, w, at(600)))) // watermark advancer, novel vector
    q.processAllAvailable()
    writeBatch(Seq((3L, v, at(610)))) // past horizon → entry evicted → keep
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSet
    assert(out.contains((2L, Some(1L), false)), s"within-horizon dup must match: $out")
    assert(out.contains((3L, None, true)), s"post-horizon arrival must re-register: $out")
    assert(out.contains((50L, None, true)), s"novel vector keeps: $out")
  }
}

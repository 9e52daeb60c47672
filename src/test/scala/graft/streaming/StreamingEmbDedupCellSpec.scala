package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Duration

/**
 * Family-contract suite for the IVF cell-partitioned streaming dedup.
 * Geometry (numerically pre-verified): centroids cA = 0.25·v1 (cid 0),
 * cB = 0.25·v2 (cid 1) give homes v1→A (18.2 vs 34.6), v2→B, v3→A
 * (33.7 vs 34.4, a NOVEL vector — its residual cosine vs both keepers'
 * residuals is ≈ −0.22/−0.26, far below threshold); the near-copy's
 * residual cosine vs the keeper's in cell A is 0.9936.
 */
class StreamingEmbDedupCellSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  private val v1 = Array.tabulate(64)(i => math.sin(i + 1.0))
  private val v1near = { val c = v1.clone(); c(0) += 0.5; c } // cosine ≈ 0.996
  private val v2 = Array.tabulate(64)(i => math.cos(3.0 * i + 2.0))
  private val v3 = Array.tabulate(64)(i => math.sin(2.0 * i + 0.7))
  private val cA = v1.map(_ * 0.25)
  private val cB = v2.map(_ * 0.25)
  private val cents = Array((0L, cA), (1L, cB))

  private def harness(op: StreamingEmbDedupCell) = {
    val dir = Files.createTempDirectory("scell").toFile
    val ckpt = Files.createTempDirectory("scell-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Option[Double], Boolean)]()
    def writeBatch(rows: Seq[(Long, Array[Double])]): Unit = {
      import spark.implicits._
      rows.toDF("vecId", "vec").coalesce(1).write.mode("append")
        .parquet(dir.getAbsolutePath)
    }
    def startQuery() = {
      import spark.implicits._
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

  test("cell state survives checkpoint restart; exact copy assigns to the keeper's cell and estimates cosine 1 exactly; keeper replay stays keep") {
    val (writeBatch, startQuery, sunk) = harness(StreamingEmbDedupCell(cents))
    writeBatch(Seq((1L, v1), (3L, v2)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // kill — one 16-byte residual sketch per keeper, checkpointed

    // 9L is an EXACT copy of keeper 1: identical vector → identical argmin
    // cell → identical residual → every decided plane agrees → est = 1.0
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
    // v3's home is cell A (33.7 vs 34.4) where keeper 1 lives, but its
    // RESIDUAL angle vs the keeper's residual is ≈ −0.22 — kept
    assert(out.exists(r => r._1 == 3L && r._4) && out.exists(r => r._1 == 5L && r._4), out.toString)
  }

  test("in-batch near-dup resolves to the smaller id through the residual estimator; zero vector and centroid-exact vector are degenerate keeps") {
    val (writeBatch, startQuery, sunk) = harness(StreamingEmbDedupCell(cents))
    // 2L near-copies 1L in the same micro-batch (residual cosine 0.9936);
    // 7L is a zero vector; 8L sits EXACTLY on centroid A — zero residual,
    // no angle to sketch: the documented degenerate edge, kept
    writeBatch(Seq((2L, v1near), (1L, v1), (7L, Array.fill(64)(0.0)),
      (8L, cA.clone())))
    val q = startQuery()
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSeq
    val dup = out.find(_._1 == 2L).get
    assert(dup._2.contains(1L) && !dup._4,
      s"in-batch near-dup must lose to the smaller id: $out")
    assert(dup._3.get >= 0.9 && dup._3.get <= 1.0, s"estimated cosine off: $dup")
    assert(out.exists(r => r._1 == 1L && r._4), out.toString)
    assert(out.exists(r => r._1 == 7L && r._4),
      "zero vector must be kept: " + out)
    assert(out.exists(r => r._1 == 8L && r._4),
      "centroid-exact vector (zero residual) must be kept: " + out)
  }

  test("nprobe is the recall dial: a near-dup whose home is another cell misses at nprobe=1 and matches at nprobe=2") {
    // cB' placed 4.2 along the perturbation beyond the arrival: the
    // ARRIVAL's home is B' (17.64 vs 19.05) while the KEEPER's stays A
    // (18.17 vs 22.09); the match can only happen on the arrival's
    // SECOND probe, in cell A, where the residual cosine is 0.9936
    val cBp = { val c = v1near.clone(); c(0) += 4.2; c }
    val splitCents = Array((0L, cA), (1L, cBp))

    val (writeBatch1, startQuery1, sunk1) =
      harness(StreamingEmbDedupCell(splitCents, nprobe = 1))
    writeBatch1(Seq((1L, v1)))
    val q1 = startQuery1()
    q1.processAllAvailable()
    writeBatch1(Seq((2L, v1near)))
    q1.processAllAvailable()
    q1.stop()

    val (writeBatch2, startQuery2, sunk2) =
      harness(StreamingEmbDedupCell(splitCents, nprobe = 2))
    writeBatch2(Seq((1L, v1)))
    val q2 = startQuery2()
    q2.processAllAvailable()
    writeBatch2(Seq((2L, v1near)))
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val out1 = sunk1.iterator().asScala.toSeq
    val out2 = sunk2.iterator().asScala.toSeq
    assert(out1.contains((2L, None, None, true)),
      s"at nprobe=1 the arrival probes only its own cell and must keep: $out1")
    val hit = out2.find(_._1 == 2L).get
    assert(hit._2.contains(1L) && !hit._4,
      s"at nprobe=2 the second probe reaches the keeper's cell: $out2")
    assert(hit._3.get >= 0.9, s"cross-cell residual estimate off: $hit")
  }

  test("cell TTL: dup within horizon matches, idle cell evicts, fresh keeper re-elected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("scell-ttl").toFile
    val ckpt = Files.createTempDirectory("scell-ttl-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Boolean)]()
    def at(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    def writeBatch(rows: Seq[(Long, Array[Double], Timestamp)]): Unit =
      rows.toDF("vecId", "vec", "ts").coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)

    val v = Array.tabulate(16)(i => math.sin(i + 1.0))
    val w = Array.tabulate(16)(i => math.cos(3.0 * i + 2.0))
    val tCents = Array((0L, v.map(_ * 0.25)), (1L, w.map(_ * 0.25)))

    val op = StreamingEmbDedupCell(tCents, nprobe = 2, dims = 16)
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

  test("cell-stream keepers flow through the shared absorb bridge; the stream's registration cell agrees with the absorb-time assignment") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpusDir = Files.createTempDirectory("scell-absorb-corpus")
    Seq((1L, v2.map(_.toFloat).toSeq), (2L, v3.map(_.toFloat).toSeq))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite")
      .parquet(corpusDir.resolve("embeddings.parquet").toString)
    val store = Files.createTempDirectory("scell-absorb-store")
    val prev = spark.conf.getOption("spark.graft.materialized.dir")
    spark.conf.set("spark.graft.materialized.dir", store.toString)
    graft.queries.Materialized.clearSessionCache()
    try {
      val dir = Files.createTempDirectory("scell-absorb-src").toFile
      val ckpt = Files.createTempDirectory("scell-absorb-ckpt").toFile
      Seq((100L, v1)).toDF("vecId", "vec").coalesce(1).write.mode("append")
        .parquet(dir.getAbsolutePath)
      // partition the STREAM by the batch index's own cells — the
      // deployment shape fromCentroids exists for
      val idx = graft.queries.Materialized.ivfIndex(spark, corpusDir.toString)
      val op = StreamingEmbDedupCell.fromCentroids(idx.centroids)
      val q1 = op.judged(
          spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
            .parquet(dir.getAbsolutePath).as[StreamingEmbDedup.VecDoc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingEmbDedupAdc.AdcBandVerdict], id: Long) =>
          StreamingEmbDedupAdc.absorbKeepers(spark, corpusDir.toString,
            df.toDF(), "ingest-cell", id)
          ()
        }
        .start()
      q1.processAllAvailable()
      q1.stop()

      // the keeper registered in its argmin cell in STREAM state; absorb
      // re-assigns by the same rule, so an nprobe=1 hybrid search for the
      // keeper's own vector must probe exactly that cell and retrieve it
      val corpus = graft.queries.Tables.embeddings(spark, corpusDir.toString)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .unionByName(Seq((100L, v1.toSeq)).toDF("vec_id", "embedding"))
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
        s"hybrid search must retrieve the cell-stream keeper at cosine 1: ${resHit.toSeq}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.materialized.dir", v)
        case None => spark.conf.unset("spark.graft.materialized.dir")
      }
      graft.queries.Materialized.clearSessionCache()
    }
  }
}

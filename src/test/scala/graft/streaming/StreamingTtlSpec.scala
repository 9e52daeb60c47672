package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Duration, Instant}

/**
 * TTL horizon for the three streaming dedup ops: verdicts inside the
 * horizon are unchanged vs the NoTimeout variants, entries idle past the
 * horizon are evicted (so the stream re-elects a keeper — the batch
 * stores catch the re-seen dup via the absorb bridges), state size
 * plateaus instead of growing with the life of the stream, and the TTL
 * state (entries + timeout timestamps) survives a checkpoint restart.
 *
 * Event time is fully synthetic (one parquet write = one micro-batch, a
 * `ts` column drives the watermark), so eviction points are
 * deterministic: an entry last seen at `t` is retained until the
 * watermark (max event time − delay) passes `t + horizon`, and a key
 * receiving data in the same batch its timeout would fire is expired on
 * the data path (Spark never flags `hasTimedOut` for a key with data).
 */
class StreamingTtlSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  private val t0 = Instant.parse("2026-01-01T00:00:00Z")
  private def at(secs: Long): Timestamp = Timestamp.from(t0.plusSeconds(secs))

  test("exact dedup TTL: dup within horizon matches, idle marker evicts, fresh keeper re-elected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sttl-exact").toFile
    val ckpt = Files.createTempDirectory("sttl-exact-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Boolean)]()

    def writeBatch(rows: Seq[(Long, String, Timestamp)]): Unit =
      rows.toDF("docId", "contentHash", "ts").coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)

    val q = StreamingDedup.judgedTtl(
        spark.readStream.schema("docId LONG, contentHash STRING, ts TIMESTAMP")
          .parquet(dir.getAbsolutePath).as[StreamingDedup.TimedDoc],
        horizon = Duration.ofSeconds(60), watermarkDelay = "10 seconds")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingDedup.Judged], _: Long) =>
        df.collect().foreach(j => sunk.add((j.docId, j.keeperId, j.keep)))
      }
      .start()

    writeBatch(Seq((1L, "hA", at(0))))
    q.processAllAvailable()
    // within the 60 s horizon of hA's last sighting: stored keeper wins
    writeBatch(Seq((2L, "hA", at(30))))
    q.processAllAvailable()
    // watermark advancer: unrelated key pushes the watermark to 590 s,
    // far past hA's 30 + 60 s horizon
    writeBatch(Seq((50L, "hZ", at(600))))
    q.processAllAvailable()
    // hA re-arrives AFTER the horizon — the marker must be gone even
    // though this key has data in the batch (data-path expiry, not
    // hasTimedOut); doc 3 is a fresh keeper, and a same-batch dup loses
    // to it; hZ is still within ITS horizon and keeps its keeper
    writeBatch(Seq((3L, "hA", at(610)), (4L, "hA", at(611)),
      (51L, "hZ", at(612))))
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSet
    assert(out.contains((2L, 1L, false)), s"within-horizon dup must match: $out")
    assert(out.contains((3L, 3L, true)), s"post-horizon arrival must re-elect: $out")
    assert(out.contains((4L, 3L, false)), s"same-batch dup loses to fresh keeper: $out")
    assert(out.contains((51L, 50L, false)), s"hot key keeps its keeper: $out")
  }

  test("near-dup TTL: verdicts stable within horizon across restart, state plateaus, idle buckets evict") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sttl-near").toFile
    val ckpt = Files.createTempDirectory("sttl-near-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Boolean)]()
    val stateRows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    def writeBatch(rows: Seq[(Long, String, Timestamp)]): Unit =
      rows.toDF("docId", "text", "ts").coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)

    val op = StreamingNearDedup(bands = 8, rowsPerBand = 4)
    def startQuery() = op.judgedTtl(
        spark.readStream.schema("docId LONG, text STRING, ts TIMESTAMP")
          .parquet(dir.getAbsolutePath).as[StreamingNearDedup.TimedTextDoc],
        horizon = Duration.ofSeconds(180), watermarkDelay = "30 seconds")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingNearDedup.BandVerdict], _: Long) =>
        StreamingNearDedup.verdicts(df.toDF()).collect().foreach { r =>
          sunk.add((r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getBoolean(3)))
        }
      }
      .start()

    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    def filler(i: Int) =
      s"filler document number $i with its own unmistakable content token f$i end marker m$i"

    writeBatch(Seq((1L, base, at(0))) ++ (1 to 5).map(i => (100L + i, filler(i), at(1))))
    val q1 = startQuery()
    q1.processAllAvailable()
    // dup within horizon (entry last seen 0 s, horizon 180 s)
    writeBatch(Seq((2L, base, at(60))) ++ (6 to 10).map(i => (100L + i, filler(i), at(61))))
    q1.processAllAvailable()
    q1.stop() // kill — TTL entries and timeout timestamps live in the checkpoint

    val q2 = startQuery()
    // watermark advancer: wm → 270 s; base's entry (re-warmed to 60 s by
    // doc 2's match) expires at 60 + 180 = 240 < 270
    writeBatch((11 to 15).map(i => (100L + i, filler(i), at(300))))
    q2.processAllAvailable()
    // post-horizon re-arrival: bucket must be expired on the data path;
    // doc 3 re-registers, doc 4 (same batch, larger id) loses to it
    writeBatch(Seq((3L, base, at(330)), (4L, base, at(331))))
    q2.processAllAvailable()
    var removed = 0L
    for (p <- q2.recentProgress; s <- p.stateOperators) {
      stateRows.add(s.numRowsTotal); removed += s.numRowsRemoved
    }
    q2.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSet
    assert(out.contains((2L, Some(1L), false)),
      s"within-horizon near-dup must match across restart: $out")
    assert(out.contains((3L, None, true)),
      s"post-horizon arrival must re-register: $out")
    assert(out.contains((4L, Some(3L), false)),
      s"same-batch near-dup loses to the fresh registrant: $out")
    // plateau: ~125 distinct buckets registered over the feed, but after
    // the horizon passes only the last-two-batches' entries (~48 keys)
    // survive. The store reports a fixed number of rows per key (2 in the
    // event-time-timeout format: value + timeout index), so assert the
    // SHAPE — evictions fired and the final size fell to at most half the
    // peak — rather than an absolute row-per-key count.
    val sizes = stateRows.iterator().asScala.toSeq
    val (peak, finalRows) = (sizes.max, sizes.lastOption.getOrElse(-1L))
    assert(removed > 0, "timeout path must evict idle buckets")
    assert(finalRows > 0 && finalRows <= peak / 2,
      s"state must plateau near one horizon of entries, got $sizes (removed=$removed)")
  }

  test("TTL composes with the store bridge: an evicted keeper still wins the next BATCH judgment") {
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val t1drop = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpusDir = Files.createTempDirectory("sttl-bridge-corpus")
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta corpus doc"),
        (2L, "completely different corpus content with other words here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpusDir.resolve("documents.parquet").toString)
    val store = Files.createTempDirectory("sttl-bridge-store")
    val prev = spark.conf.getOption("spark.graft.materialized.dir")
    spark.conf.set("spark.graft.materialized.dir", store.toString)
    graft.queries.Materialized.clearSessionCache()
    try {
      val dir = Files.createTempDirectory("sttl-bridge-src").toFile
      val ckpt = Files.createTempDirectory("sttl-bridge-ckpt").toFile
      val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]()
      def writeBatch(rows: Seq[(Long, String, Timestamp)]): Unit =
        rows.toDF("docId", "text", "ts").coalesce(1)
          .write.mode("append").parquet(dir.getAbsolutePath)
      val op = StreamingNearDedup(bands = 8, rowsPerBand = 4)
      val q = op.judgedTtl(
          spark.readStream.schema("docId LONG, text STRING, ts TIMESTAMP")
            .parquet(dir.getAbsolutePath).as[StreamingNearDedup.TimedTextDoc],
          horizon = Duration.ofSeconds(120), watermarkDelay = "10 seconds")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingNearDedup.BandVerdict], id: Long) =>
          StreamingNearDedup.absorbKeepers(spark, corpusDir.toString, df.toDF(),
            "ttl-bridge", id).collect()
            .foreach(r => sunk.add((r.getLong(0), r.getBoolean(3))))
        }
        .start()

      writeBatch(Seq((100L, t1, at(0))))
      q.processAllAvailable()
      // watermark far past 0 + 120 s: doc 100's buckets become evictable
      writeBatch(Seq((300L, "unrelated watermark advancer text with plenty of words", at(600))))
      q.processAllAvailable()
      // the dup re-arrives AFTER the horizon: the STREAM re-registers it
      // (state was evicted) — this is the designed trade
      writeBatch(Seq((200L, t1, at(610))))
      q.processAllAvailable()
      q.stop()
      import scala.jdk.CollectionConverters._
      val out = sunk.iterator().asScala.toSet
      assert(out.contains((100L, true)) && out.contains((200L, true)),
        s"post-horizon re-arrival must re-register on the stream: $out")

      // ...but the keeper was absorbed into the BATCH store before
      // eviction, so the next batch judgment still catches near-copies:
      // memory horizon bounds the STATE, not the corpus
      val sigs = graft.queries.Materialized.minhashSignatures(spark, corpusDir.toString)
      val day2Docs = graft.queries.Tables.documents(spark, corpusDir.toString)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq((100L, t1), (200L, t1)).toDF("doc_id", "text"))
      val judged = graft.llm.Dedup.dedupIncrementalNear(
          Seq((500L, t1drop)).toDF("doc_id", "text"), sigs, day2Docs,
          "doc_id", "text")
        .collect()
      assert(judged.length == 1 && judged(0).getLong(1) == 100L &&
        !judged(0).getBoolean(3),
        s"batch judgment must catch the evicted-then-reseen family via the store: ${judged.toSeq}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.materialized.dir", v)
        case None => spark.conf.unset("spark.graft.materialized.dir")
      }
      graft.queries.Materialized.clearSessionCache()
    }
  }

  test("embedding TTL: cosine dup within horizon matches, idle bucket evicts, fresh keeper re-elected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sttl-emb").toFile
    val ckpt = Files.createTempDirectory("sttl-emb-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Boolean)]()

    def writeBatch(rows: Seq[(Long, Array[Double], Timestamp)]): Unit =
      rows.toDF("vecId", "vec", "ts").coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)

    val v = Array.tabulate(16)(i => math.sin(i + 1.0))
    val w = Array.tabulate(16)(i => math.cos(3.0 * i + 2.0)) // cos(v,w) ≪ 0.9

    val op = StreamingEmbDedup(bands = 4, planesPerBand = 8, dims = 16)
    val q = op.judgedTtl(
        spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>, ts TIMESTAMP")
          .parquet(dir.getAbsolutePath).as[StreamingEmbDedup.TimedVecDoc],
        horizon = Duration.ofSeconds(60), watermarkDelay = "10 seconds")
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

  test("media TTL: perceptual dup within horizon matches, idle bucket evicts, fresh keeper re-elected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sttl-media").toFile
    val ckpt = Files.createTempDirectory("sttl-media-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Boolean)]()

    def writeBatch(rows: Seq[(Long, Array[Byte], Timestamp)]): Unit =
      rows.toDF("mediaId", "payload", "ts").coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)

    val base = ("the quick brown fox jumps over the lazy dog near the wide " +
      "slow river bend where herons stand watching for silver fish")
      .getBytes("UTF-8")
    val alien = ("completely different media content with its own spectral " +
      "profile and nothing shared with the fox document at all!!")
      .getBytes("UTF-8")

    val op = StreamingMediaDedup()
    val q = op.judgedTtl(
        spark.readStream.schema("mediaId LONG, payload BINARY, ts TIMESTAMP")
          .parquet(dir.getAbsolutePath).as[StreamingMediaDedup.TimedMediaDoc],
        horizon = Duration.ofSeconds(60), watermarkDelay = "10 seconds")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingMediaDedup.MediaBandVerdict], _: Long) =>
        StreamingNearDedup.verdicts(df.toDF()).collect().foreach { r =>
          sunk.add((r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getBoolean(3)))
        }
      }
      .start()

    writeBatch(Seq((1L, base, at(0))))
    q.processAllAvailable()
    writeBatch(Seq((2L, base, at(30)))) // exact copy within horizon → dup of 1
    q.processAllAvailable()
    writeBatch(Seq((50L, alien, at(600)))) // watermark advancer, novel media
    q.processAllAvailable()
    writeBatch(Seq((3L, base, at(610)))) // past horizon → entry evicted → keep
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSet
    assert(out.contains((2L, Some(1L), false)), s"within-horizon dup must match: $out")
    assert(out.contains((3L, None, true)), s"post-horizon arrival must re-register: $out")
    assert(out.contains((50L, None, true)), s"novel media keeps: $out")
  }
}

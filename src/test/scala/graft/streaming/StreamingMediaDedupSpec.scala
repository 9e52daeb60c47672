package graft.streaming

import graft.TestSpark
import graft.llm.Multimodal
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StreamingMediaDedupSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  // base long enough for the mod-64 spectral-class swap (a perceptual
  // no-op: the sketch is EXACTLY preserved while the bytes differ)
  private val base = "the quick brown fox jumps over the lazy dog near the " +
    "wide slow river bend where herons stand watching for silver fish"
  private val swapped =
    base(64) + base.substring(1, 64) + base(0) + base.substring(65)
  private val other = "completely different media content with its own " +
    "spectral profile and nothing shared with the fox document at all"
  private val third = "yet another clip whose payload bytes produce an " +
    "entirely distinct sixty bit perceptual signature from the others!"

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def harness() = {
    val dir = Files.createTempDirectory("smediadedup").toFile
    val ckpt = Files.createTempDirectory("smediadedup-ckpt").toFile
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Boolean)]()
    def writeBatch(rows: Seq[(Long, Array[Byte])]): Unit = {
      import spark.implicits._
      rows.toDF("mediaId", "payload").coalesce(1).write.mode("append")
        .parquet(dir.getAbsolutePath)
    }
    def startQuery() = {
      import spark.implicits._
      val op = StreamingMediaDedup()
      op.judged(
          spark.readStream.schema("mediaId LONG, payload BINARY")
            .parquet(dir.getAbsolutePath).as[StreamingMediaDedup.MediaDoc])
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
    }
    (writeBatch _, startQuery _, sunk)
  }

  test("perceptual state survives checkpoint restart: a later spectral-class swap loses to the pre-restart keeper") {
    // precondition: the swap is sketch-exact, the others are far
    val s0 = Multimodal.phashKernel(Multimodal.DecodeStub.decodeSpectral(bytes(base))).get
    assert(s0 == Multimodal.phashKernel(
      Multimodal.DecodeStub.decodeSpectral(bytes(swapped))).get)
    val sOther = Multimodal.phashKernel(
      Multimodal.DecodeStub.decodeSpectral(bytes(other))).get
    assert(java.lang.Long.bitCount(s0 ^ sOther) > 3,
      "test precondition: novel media beyond the radius")
    val (writeBatch, startQuery, sunk) = harness()
    writeBatch(Seq((1L, bytes(base)), (3L, bytes(other))))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // kill — the sketch index lives only in checkpointed state

    writeBatch(Seq((9L, bytes(swapped)), (1L, bytes(base)), (5L, bytes(third))))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSeq
    assert(out.contains((9L, Some(1L), false)),
      s"perceptual dup must lose to the recovered pre-restart keeper: $out")
    assert(out.count(_ == ((1L, None, true))) == 2,
      s"keeper replay must stay keep=true in both batches: $out")
    assert(out.contains((3L, None, true)) && out.contains((5L, None, true)),
      out.toString)
  }

  test("in-batch perceptual dup resolves to the smaller id; unsketchable media are kept") {
    val (writeBatch, startQuery, sunk) = harness()
    // 2 is a sketch-exact swap of 1 in the SAME micro-batch; 7 has an
    // empty payload (no perceptual identity — kept, registers nothing)
    writeBatch(Seq((1L, bytes(base)), (2L, bytes(swapped)),
      (7L, Array.emptyByteArray), (8L, null)))
    val q = startQuery()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSeq
    assert(out.contains((1L, None, true)), out.toString)
    assert(out.contains((2L, Some(1L), false)),
      s"same-batch dup must resolve to the smaller id: $out")
    assert(out.contains((7L, None, true)) && out.contains((8L, None, true)),
      out.toString)
  }
}

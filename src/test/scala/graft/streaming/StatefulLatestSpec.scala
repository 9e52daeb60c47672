package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.nio.file.Files

class StatefulLatestSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  test("state persists across micro-batches; stale replays are ignored") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stateful").toFile
    val ckpt = Files.createTempDirectory("ckpt").toFile

    def writeBatch(name: String, rows: Seq[StatefulLatest.KeyedOp]): Unit =
      Files.write(new File(dir, name).toPath,
        rows.map(r => s"${r.key},${r.orderKey},${r.op},${r.payload}")
          .mkString("\n").getBytes("UTF-8"))

    writeBatch("b1.csv", Seq(
      StatefulLatest.KeyedOp("k1", 1, "UPSERT", "v1"),
      StatefulLatest.KeyedOp("k2", 2, "UPSERT", "w1")))

    val raw = spark.readStream
      .schema("key STRING, orderKey LONG, op STRING, payload STRING")
      .csv(dir.getAbsolutePath)
      .as[StatefulLatest.KeyedOp]

    val q = StatefulLatest.changes(raw).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("changes")
      .start()
    q.processAllAvailable()

    // batch 2: update k1 (newer), delete k2, stale replay of k1 (older — ignored)
    writeBatch("b2.csv", Seq(
      StatefulLatest.KeyedOp("k1", 5, "UPSERT", "v2"),
      StatefulLatest.KeyedOp("k1", 0, "UPSERT", "stale"),
      StatefulLatest.KeyedOp("k2", 6, "DELETE", "x")))
    q.processAllAvailable()

    // batch 3: only a stale op — no change emitted
    writeBatch("b3.csv", Seq(StatefulLatest.KeyedOp("k1", 3, "UPSERT", "older")))
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT key, op, payload FROM changes ORDER BY key, op")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // batch1: k1 upsert v1, k2 upsert w1; batch2: k1 upsert v2 (max of 5,0), k2 delete
    assert(out.toSet == Set(
      ("k1", "UPSERT", "v1"), ("k2", "UPSERT", "w1"),
      ("k1", "UPSERT", "v2"), ("k2", "DELETE", null)))
  }
}

package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.nio.file.Files

class StreamingDedupSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  test("keeper state survives a query restart from the checkpoint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sdedup-restart").toFile
    val ckpt = Files.createTempDirectory("sdedup-restart-ckpt").toFile

    def writeBatch(name: String, rows: Seq[StreamingDedup.Doc]): Unit =
      Files.write(new File(dir, name).toPath,
        rows.map(r => s"${r.docId},${r.contentHash}")
          .mkString("\n").getBytes("UTF-8"))

    // the memory sink cannot recover from a checkpoint; foreachBatch can
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Boolean)]()
    def startQuery() = StreamingDedup.judged(
        spark.readStream
          .schema("docId LONG, contentHash STRING")
          .csv(dir.getAbsolutePath)
          .as[StreamingDedup.Doc])
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingDedup.Judged], _: Long) =>
        df.collect().foreach(j => sunk.add((j.docId, j.keeperId, j.keep)))
      }
      .start()

    writeBatch("b1.csv", Seq(StreamingDedup.Doc(1, "hA")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // kill the query — state lives only in the checkpointed store

    writeBatch("b2.csv", Seq(StreamingDedup.Doc(9, "hA")))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val out = sunk.iterator().asScala.toSet
    // doc 9 must lose to the PRE-RESTART keeper: the hash→keeper marker was
    // recovered from the state store, not re-elected
    assert(out.contains((9L, 1L, false)),
      s"keeper state was not recovered across restart: $out")
  }

  test("streaming keeps absorb into the content-hash store; batch Bloom judgment sees them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpusDir = Files.createTempDirectory("sdedup-absorb-corpus")
    Seq((1L, "alpha corpus doc one"), (2L, "beta corpus doc two"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpusDir.resolve("documents.parquet").toString)
    val store = Files.createTempDirectory("sdedup-absorb-store")
    val prev = spark.conf.getOption("spark.graft.materialized.dir")
    spark.conf.set("spark.graft.materialized.dir", store.toString)
    graft.queries.Materialized.clearSessionCache()
    try {
      val novelText = "the streaming novel document gamma"
      // the stream carries the BATCH family's content hash (md5 of text),
      // so the absorbed entry is directly judgeable by the batch side
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(novelText.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val dir = Files.createTempDirectory("sdedup-absorb-src").toFile
      val ckpt = Files.createTempDirectory("sdedup-absorb-ckpt").toFile
      Files.write(new File(dir, "b1.csv").toPath, s"100,$h".getBytes("UTF-8"))
      val q = StreamingDedup.judgedHash(
          spark.readStream.schema("docId LONG, contentHash STRING")
            .csv(dir.getAbsolutePath).as[StreamingDedup.Doc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingDedup.JudgedHash], id: Long) =>
          StreamingDedup.absorbKeepers(spark, corpusDir.toString, df.toDF(),
            "ingest-x", id)
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
      val hashes = graft.queries.Materialized.contentHashes(spark, corpusDir.toString)
      assert(hashes.count() == 3, s"corpus 2 + 1 streamed keep, got ${hashes.count()}")
      // a batch copy of the STREAMED keep is already ingested via the store
      val out = graft.llm.Dedup.dedupIncrementalBloomFromHashes(
          Seq((500L, novelText)).toDF("doc_id", "text"), hashes,
          "doc_id", "text", expectedCorpusItems = 1000L)
        .collect()
      assert(out.length == 1 && out(0).getString(1) == "dup_of_corpus",
        s"batch copy must lose to the streamed keep via the store: ${out.toSeq}")
      // the corpus doc is still judged through the same view
      val out2 = graft.llm.Dedup.dedupIncrementalBloomFromHashes(
          Seq((501L, "alpha corpus doc one"), (502L, "wholly new content")).toDF("doc_id", "text"),
          hashes, "doc_id", "text", expectedCorpusItems = 1000L)
        .orderBy(col("doc_id")).collect()
      assert(out2(0).getString(1) == "dup_of_corpus" && out2(1).getString(1) == "kept")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.materialized.dir", v)
        case None => spark.conf.unset("spark.graft.materialized.dir")
      }
      graft.queries.Materialized.clearSessionCache()
    }
  }

  test("first-seen keeper persists across micro-batches; keeper replay stays keep=true") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sdedup").toFile
    val ckpt = Files.createTempDirectory("sdedup-ckpt").toFile

    def writeBatch(name: String, rows: Seq[StreamingDedup.Doc]): Unit =
      Files.write(new File(dir, name).toPath,
        rows.map(r => s"${r.docId},${r.contentHash}")
          .mkString("\n").getBytes("UTF-8"))

    writeBatch("b1.csv", Seq(
      StreamingDedup.Doc(2, "hA"), // min-id election: 1 beats 2 within the batch
      StreamingDedup.Doc(1, "hA"),
      StreamingDedup.Doc(3, "hB")))

    val raw = spark.readStream
      .schema("docId LONG, contentHash STRING")
      .csv(dir.getAbsolutePath)
      .as[StreamingDedup.Doc]

    val q = StreamingDedup.judged(raw).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("sdedup")
      .start()
    q.processAllAvailable()

    // batch 2: hA dup from a later batch; hC brand new; keeper replay of doc 1
    writeBatch("b2.csv", Seq(
      StreamingDedup.Doc(4, "hA"),
      StreamingDedup.Doc(5, "hC"),
      StreamingDedup.Doc(1, "hA")))
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT docId, keeperId, keep FROM sdedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byDoc = out.groupBy(_._1)
    // batch 1: doc 1 keeps hA, doc 2 loses to it, doc 3 keeps hB
    assert(byDoc(2L).toSet == Set((2L, 1L, false)))
    assert(byDoc(3L).toSet == Set((3L, 3L, true)))
    // batch 2: doc 4 loses to the stored keeper; doc 5 keeps hC
    assert(byDoc(4L).toSet == Set((4L, 1L, false)))
    assert(byDoc(5L).toSet == Set((5L, 5L, true)))
    // doc 1 judged keep=true in BOTH batches (idempotent under replay)
    assert(byDoc(1L).toSeq.sorted == Seq((1L, 1L, true), (1L, 1L, true)))
  }
}

package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the round-8 dedup/mix additions: the Bloom-gated
 * incremental dedup must equal the join-based judgment for ARBITRARY
 * corpora/batches (nulls, in-batch dups, saturated sketches included);
 * the within-cell semantic election must equal a sequential reference
 * fold; the budget mixer must equal a per-source prefix fold and be
 * monotone in the budget. (Plain ScalaCheck generators driven by fixed
 * seeds — deterministic runs.)
 */
class DedupPropertySpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 12)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // small word pool → frequent text collisions across corpus and batch
  private val textGen: Gen[String] = Gen.frequency(
    9 -> Gen.listOfN(3, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")),
    1 -> Gen.const(null: String))
  private val corpusBatchGen: Gen[(List[(Long, String)], List[(Long, String)], Double)] =
    for {
      nc <- Gen.choose(0, 12)
      nb <- Gen.choose(1, 10)
      corpus <- Gen.listOfN(nc, textGen)
      batch <- Gen.listOfN(nb, textGen)
      fpp <- Gen.oneOf(0.01, 0.5) // honest and deliberately-saturated sketches
    } yield (corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      batch.zipWithIndex.map { case (t, i) => (100L + i, t) }, fpp)

  test("dedupIncrementalBloom equals dedupIncremental on arbitrary corpora (nulls, dups, saturation)") {
    forAll(corpusBatchGen) { case (corpus, batch, fpp) =>
      val c = corpus.toDF("doc_id", "text")
      val b = batch.toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
      val base = rows(Dedup.dedupIncremental(b, c, "doc_id", "text"))
      val bloomed = rows(Dedup.dedupIncrementalBloom(b, c, "doc_id", "text",
        expectedCorpusItems = math.max(1L, corpus.size.toLong), fpp = fpp))
      assert(bloomed == base, s"corpus=$corpus batch=$batch fpp=$fpp")
    }
  }

  private val membersGen: Gen[List[(Long, Long, List[Double])]] = for {
    n <- Gen.choose(2, 16)
    rows <- Gen.listOfN(n, for {
      cell <- Gen.choose(0L, 2L)
      // zero vectors included on purpose: their cosine is undefined (NaN)
      // and the operator must treat that as "no match", never as a dup
      v <- Gen.frequency(
        5 -> Gen.listOfN(4, Gen.choose(-1.0, 1.0)),
        1 -> Gen.const(List(0.0, 0.0, 0.0, 0.0)))
    } yield (cell, v))
  } yield rows.zipWithIndex.map { case ((cell, v), i) => (i.toLong, cell, v) }

  test("semanticDedupFromCells equals the sequential earlier-member reference fold") {
    forAll(membersGen) { members =>
      val df = members.toDF("id", "centroid_id", "v")
        .select(col("id"), col("centroid_id"),
          Similarity.asDouble(col("v")).as("v"))
      val t = 0.5
      def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        if (na == 0.0 || nb == 0.0) None // undefined cosine ⇒ no match
        else Some(Similarity.roundHalfUp(dot / (na * nb), 6))
      }
      val expected = members.map { case (id, cell, v) =>
        val matches = members
          .filter { case (id2, cell2, _) => cell2 == cell && id2 < id }
          .flatMap { case (id2, _, v2) => cos(v2, v).map(id2 -> _) }
          .filter(_._2 >= t)
        val best = matches.sortBy { case (id2, c) => (-c, id2) }.headOption
        (id, cell, best.map(_._1), best.map(_._2), best.isEmpty)
      }.sortBy(_._1)
      val got = Dedup.semanticDedupFromCells(df, threshold = t)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4))).toSeq
      assert(got == expected, s"members=$members")
    }
  }

  private val mixGen: Gen[(List[(Long, String, String)], Long)] = for {
    n <- Gen.choose(1, 14)
    rows <- Gen.listOfN(n, for {
      src <- Gen.oneOf("s1", "s2", "s3")
      nw <- Gen.choose(1, 6)
      ws <- Gen.listOfN(nw, Gen.oneOf("x", "yy", "zzz"))
      t <- Gen.frequency(8 -> Gen.const(ws.mkString(" ")),
        1 -> Gen.const(null: String))
    } yield (src, t))
    budget <- Gen.choose(1L, 12L)
  } yield (rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }, budget)

  test("budgetMix equals the per-source hash-order prefix fold and is monotone in the budget") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    forAll(mixGen) { case (rows, budget) =>
      val df = rows.toDF("doc_id", "text", "source")
      def run(b: Long) = TextAnalysis.budgetMix(df, "doc_id", "text", "source", b)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      val got = run(budget)
      def pri(t: String) = if (t == null) "<null-text>" else md5hex(t)
      rows.groupBy(_._3).foreach { case (_, srcRows) =>
        var cum = 0L
        srcRows.sortBy { case (id, t, _) => (pri(t), id) }.foreach { case (id, t, _) =>
          val n = if (t == null) 0L else t.split(" ").length.toLong
          cum += n
          assert(got(id) == ((n, cum, cum <= budget)), s"doc $id of $rows")
        }
      }
      // monotone: a bigger budget never drops a kept doc
      val bigger = run(budget + 3)
      assert(rows.forall { case (id, _, _) => !got(id)._3 || bigger(id)._3 })
    }
  }

  // random word sequences over a small alphabet, with a planted shared run
  private val winnowDocsGen: Gen[(List[String], List[String], Int)] = for {
    na <- Gen.choose(0, 10)
    nb <- Gen.choose(0, 10)
    runLen <- Gen.choose(7, 12) // >= w + k - 1 = 7 at k=4, w=4
    a <- Gen.listOfN(na, Gen.oneOf("pa", "pb", "pc", "pd", "pe"))
    b <- Gen.listOfN(nb, Gen.oneOf("qa", "qb", "qc", "qd", "qe"))
    run <- Gen.listOfN(runLen, Gen.oneOf("ra", "rb", "rc", "rd", "re"))
  } yield (a ++ run, run ++ b, runLen)

  test("winnowing guarantee: any two docs sharing a >= w+k-1 word run share a fingerprint (arbitrary surroundings)") {
    forAll(winnowDocsGen, n = 16) { case (docA, docB, _) =>
      val df = Seq((1L, docA.mkString(" ")), (2L, docB.mkString(" ")))
        .toDF("doc_id", "text")
      val fps = Dedup.winnowFingerprints(df, "doc_id", "text", k = 4, w = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val (f1, f2) = (fps.filter(_._1 == 1L).map(_._2).toSet,
        fps.filter(_._1 == 2L).map(_._2).toSet)
      assert((f1 intersect f2).nonEmpty,
        s"guarantee violated: a=$docA b=$docB")
    }
  }

  private val cdcDocGen: Gen[List[String]] =
    Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("ca", "cb", "cc", "cd", "ce", "cf")))

  test("cdc chunks: tiling invariant and suffix stability under a random prefix edit") {
    forAll(cdcDocGen, n = 16) { words =>
      val base = words.mkString(" ")
      val df = Seq((1L, base)).toDF("doc_id", "text")
      val ch = Dedup.cdcChunks(df, "doc_id", "text", k = 4, mask = 4)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(5)))
      // tiling: contiguous 1..n
      val n = if (base.isEmpty) 1 else words.length // split("") -> [""]
      assert(ch.head._1 == 1L && ch.last._2 == math.max(n, 1).toLong)
      ch.sliding(2).filter(_.length == 2).foreach { case Array(x, y) =>
        assert(y._1 == x._2 + 1)
      }
      // suffix stability: prepend 3 words; every chunk that starts after
      // the first post-edit boundary must reappear (same hash)
      val edited = Seq((1L, ("zz1 zz2 zz3 " + base).trim))
        .toDF("doc_id", "text")
      val ch2 = Dedup.cdcChunks(edited, "doc_id", "text", k = 4, mask = 4)
        .collect().map(_.getLong(5)).toSet
      // chunks of the base doc strictly after the first boundary-aligned
      // chunk are content-defined: if the base had >= 3 chunks, at least
      // its later chunks must survive the edit
      if (ch.length >= 3) {
        val survivors = ch.drop(2).map(_._3).toSet intersect ch2
        assert(survivors.nonEmpty,
          s"no tail chunk survived a prefix edit: $words")
      }
    }
  }
}

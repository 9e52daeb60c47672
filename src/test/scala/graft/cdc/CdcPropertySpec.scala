package graft.cdc

import graft.TestSpark
import graft.model.DbMapping
import graft.transform.ColumnMapper
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests (SURVEY §5.2): the engine's declarative CDC fold must equal
 * a reference in-memory last-write-wins fold for arbitrary event sequences,
 * and column-mapping resolution must be a bijection onto mapped columns.
 * (Plain ScalaCheck generators driven by fixed seeds — deterministic runs.)
 */
class CdcPropertySpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val opGen = Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
  private val eventsGen: Gen[List[(Long, String, String)]] =
    Gen.listOfN(60, for {
      k <- Gen.choose(0L, 7L)
      op <- opGen
      v <- Gen.alphaStr.map(_.take(5))
    } yield (k, op, v))

  test("CdcApply.latestState equals the sequential last-write-wins fold") {
    forAll(eventsGen) { evs =>
      val seqd = evs.zipWithIndex.map { case ((k, op, v), i) => (k, i.toLong, op, v) }
      // reference fold: replay in order into a map
      val expected = seqd.foldLeft(Map.empty[Long, String]) {
        case (m, (k, _, "DELETE", _)) => m - k
        case (m, (k, _, _, v)) => m + (k -> v)
      }
      val df = seqd.toDF("k", "seq", "op", "v").repartition(4) // shuffled input
      val got = CdcApply.latestState(df, Seq("k"), col("seq"), col("op"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected)
    }
  }

  private val colsGen: Gen[(List[String], Set[String], Map[String, String])] = for {
    n <- Gen.choose(2, 6)
    cols = (0 until n).map(i => s"c$i").toList
    excl <- Gen.someOf(cols)
    renamed <- Gen.someOf(cols.filterNot(excl.contains))
  } yield (cols, excl.toSet, renamed.map(c => s"r_$c" -> c).toMap)

  test("columnsMap(mapAll) is a bijection onto non-excluded source columns") {
    forAll(colsGen) { case (cols, excl, renames) =>
      val m = DbMapping("d", "t", "tt", mapAll = true,
        excludeColumns = excl, targetColumns = renames)
      val resolved = ColumnMapper.columnsMap(m, cols)
      // sources covered exactly once, excluded never
      assert(resolved.map(_._2).toSet == cols.filterNot(excl.contains).toSet)
      assert(resolved.map(_._2).distinct.size == resolved.size)
      // targets unique; renames applied
      assert(resolved.map(_._1).distinct.size == resolved.size)
      renames.foreach { case (tgt, src) =>
        if (!excl.contains(src)) assert(resolved.contains(tgt -> src))
      }
    }
  }

  test("pk-hash partition id is deterministic and stable across evaluations") {
    forAll(Gen.listOfN(30, Gen.choose(-1000L, 1000L))) { keys =>
      val df = keys.toDF("k")
      val a = df.select(col("k"), PkHash.partitionId(Seq(col("k")), 8).as("p")).collect()
      val b = df.select(col("k"), PkHash.partitionId(Seq(col("k")), 8).as("p")).collect()
      assert(a.map(r => (r.getLong(0), r.getInt(1))).toMap ==
        b.map(r => (r.getLong(0), r.getInt(1))).toMap)
      assert(a.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 8))
    }
  }
}

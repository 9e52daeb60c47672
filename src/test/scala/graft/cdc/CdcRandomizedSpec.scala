package graft.cdc

import graft.TestSpark
import graft.model.CanalDml
import graft.streaming.CanalStream
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * Randomized differential test of the full sync materialization
 * (flatten → truncate barrier → pk-change expansion → LWW fold) against a
 * trivially-correct sequential interpreter of the reference's semantics
 * (§2.2): UPDATE = full post-image upsert; PK in `old` ⇒ delete old key then
 * upsert new; DELETE by pk; TRUNCATE clears. Fixed seeds — deterministic.
 */
class CdcRandomizedSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  private def referenceFold(dmls: Seq[CanalDml]): Map[String, String] = {
    var state = Map.empty[String, String]
    dmls.foreach { d =>
      d.`type` match {
        case "TRUNCATE" => state = Map.empty
        case "INSERT" | "UPDATE" =>
          d.data.indices.foreach { i =>
            val row = d.data(i)
            val old = Option(d.old).flatMap(_.lift(i))
            // pk change: pk present in the pre-image (PhoenixSyncService.java:442-447)
            old.flatMap(_.get("id")).foreach(oldPk => state -= oldPk)
            state += row("id") -> row("name")
          }
        case "DELETE" =>
          d.data.foreach(row => state -= row("id"))
      }
    }
    state
  }

  private def randomLog(seed: Int): Seq[CanalDml] = {
    val rnd = new Random(seed)
    var nextEs = 0L
    (0 until 40).map { _ =>
      nextEs += 1
      val typ = rnd.nextInt(10) match {
        case 0 => "TRUNCATE"
        case 1 | 2 => "DELETE"
        case 3 | 4 | 5 => "UPDATE"
        case _ => "INSERT"
      }
      def row() = Map("id" -> rnd.nextInt(6).toString, "name" -> ("v" + rnd.nextInt(100)))
      typ match {
        case "TRUNCATE" =>
          CanalDml("ex", "g", "db", "t", typ, isDdl = false, sql = null,
            es = nextEs, ts = nextEs, data = null, old = null)
        case "UPDATE" =>
          val rows = Seq.fill(1 + rnd.nextInt(2))(row())
          // 40% of updates carry a pk change in old
          val olds = rows.map { _ =>
            if (rnd.nextInt(5) < 2) Map("id" -> rnd.nextInt(6).toString)
            else Map("name" -> "prev")
          }
          CanalDml("ex", "g", "db", "t", typ, isDdl = false, sql = null,
            es = nextEs, ts = nextEs, data = rows, old = olds)
        case _ =>
          CanalDml("ex", "g", "db", "t", typ, isDdl = false, sql = null,
            es = nextEs, ts = nextEs, data = Seq.fill(1 + rnd.nextInt(2))(row()), old = null)
      }
    }
  }

  test("materialize equals the sequential reference interpreter (15 random logs)") {
    (1 to 15).foreach { seed =>
      val log = randomLog(seed)
      val expected = referenceFold(log)
      val got = CanalStream.materialize(graft.queries.Fixtures.toDf(spark, log),
          Seq("id"), Seq("name"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == expected, s"seed=$seed:\n got=$got\n exp=$expected")
    }
  }
}

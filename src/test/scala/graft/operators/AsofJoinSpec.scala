package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val quotes = Seq(               // (sym, t, px) — the right side
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0)
  ).toDF("sym", "t", "px")

  test("backward as-of picks the greatest right time <= left time, per key") {
    val trades = Seq(("a", 5L), ("a", 10L), ("a", 25L), ("a", 99L), ("b", 14L), ("c", 50L))
      .toDF("sym", "tt")
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tt", "t", Seq("px"))
      .orderBy("sym", "tt")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      ("a", 5L, None),          // before any quote
      ("a", 10L, Some(1.0)),    // tie: equal timestamps match (<= semantics)
      ("a", 25L, Some(2.0)),    // between quotes → earlier one
      ("a", 99L, Some(3.0)),    // after last quote
      ("b", 14L, None),         // other key's quotes invisible
      ("c", 50L, None)))        // key with no right rows at all
  }

  test("as-of plan is a single exchange + window, no range self-join") {
    val trades = Seq(("a", 5L)).toDF("sym", "tt")
    val plan = AsofJoin.backward(trades, quotes, Seq("sym"), "tt", "t", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }

  test("as-of agrees with the brute-force range-join form on random data") {
    val rnd = new scala.util.Random(11)
    val l = (0 until 300).map(_ => (rnd.nextInt(5).toString, rnd.nextInt(100).toLong))
      .distinct // brute-force form groups by (k, lt) — keep left rows unique
      .toDF("k", "lt")
    val r = (0 until 100).map(i => (rnd.nextInt(5).toString, rnd.nextInt(100).toLong, i.toDouble))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, t)
      .toDF("k", "rt", "pay")
    val fast = AsofJoin.backward(l, r, Seq("k"), "lt", "rt", Seq("pay"))
      .collect().map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(2)) -1.0 else x.getDouble(2))).sorted
    val brute = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("r.rt") <= col("l.lt"), "left")
      .groupBy(col("l.k"), col("l.lt"))
      .agg(max_by(col("r.pay"), col("r.rt")).as("pay"))
      .collect().map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(2)) -1.0 else x.getDouble(2))).sorted
    assert(fast.toSeq == brute.toSeq)
  }
}

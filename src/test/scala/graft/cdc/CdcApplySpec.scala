package graft.cdc

import graft.TestSpark
import graft.queries.Fixtures
import graft.streaming.CanalStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("latestState keeps last write per key, drops deleted keys") {
    val ev = Seq(
      (1L, 1L, "INSERT", "a"), (1L, 2L, "UPDATE", "b"),
      (2L, 3L, "INSERT", "x"), (2L, 4L, "DELETE", "x"),
      (3L, 5L, "DELETE", "q"), (3L, 6L, "INSERT", "r")
    ).toDF("k", "seq", "op", "v")
    val out = CdcApply.latestState(ev, Seq("k"), col("seq"), col("op"), Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "b"), (3L, "r")))
  }

  test("latestState is order-insensitive to input shuffling (max_by, not last)") {
    val ev = Seq((1L, 2L, "UPDATE", "late"), (1L, 1L, "INSERT", "early"))
      .toDF("k", "seq", "op", "v").repartition(4)
    val out = CdcApply.latestState(ev, Seq("k"), col("seq"), col("op"), Seq("v")).collect()
    assert(out.head.getString(1) == "late")
  }

  test("afterLastTruncate drops state at-or-before the barrier, per table") {
    val ev = Seq(
      ("db", "t1", 1L, "INSERT"), ("db", "t1", 2L, "TRUNCATE"), ("db", "t1", 3L, "INSERT"),
      ("db", "t2", 1L, "INSERT")
    ).toDF("database", "table", "seq", "op")
    val out = CdcApply.afterLastTruncate(ev, Seq("database", "table"), col("seq"), col("op"))
      .select("table", "seq").orderBy("table", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("t1", 3L), ("t2", 1L)))
  }

  test("expandPkChanges emits delete at old key + upsert at new key (K2)") {
    val singles = Seq(
      ("UPDATE", Map("id" -> "3", "n" -> "a2"), Map("id" -> "1"), 10L),
      ("UPDATE", Map("id" -> "2", "n" -> "b2"), Map("n" -> "b1"), 11L)
    ).toDF("type", "data", "old", "seq")
    val out = CdcApply.expandPkChanges(singles, Seq("id"))
      .select("type", "data", "sub_seq").orderBy("seq", "sub_seq").collect()
    assert(out.length == 3)
    assert(out(0).getString(0) == "DELETE" &&
      out(0).getMap[String, String](1) == Map("id" -> "1"))
    assert(out(1).getString(0) == "UPDATE" &&
      out(1).getMap[String, String](1)("id") == "3")
    assert(out(2).getString(0) == "UPDATE") // non-pk-change passes through once
  }

  test("materialize end-to-end: pk-change fixture (K1/K2/K3)") {
    val out = CanalStream.materialize(Fixtures.toDf(spark, Fixtures.pkChangeDmls),
        Seq("id"), Seq("name"))
      .orderBy(col("id").cast("long")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("2", "bob2"), ("3", "alice2"), ("5", "eve")))
  }

  test("materialize end-to-end: truncate fixture (K4)") {
    val out = CanalStream.materialize(Fixtures.toDf(spark, Fixtures.truncateDmls),
        Seq("id"), Seq("name"))
      .orderBy(col("id").cast("long")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("1", "adam2"), ("3", "carol")))
  }

  test("P2 pk-hash routing: same key always lands in the same partition") {
    val df = (1 to 200).map(i => (i % 10, i)).toDF("k", "v")
    val routed = PkHash.routeConcurrent(df, Seq("k"), 3, Seq("v"))
    val partsPerKey = routed
      .withColumn("pid", spark_partition_id())
      .groupBy("k").agg(countDistinct("pid").as("n"))
      .agg(max("n")).head().getLong(0)
    assert(partsPerKey == 1L)
  }

  test("P3 serial routing puts everything in one partition in order") {
    val df = Seq((3, 30), (1, 10), (2, 20)).toDF("seq", "v").repartition(4)
    val routed = PkHash.routeSerial(df, Seq("seq"))
    assert(routed.rdd.getNumPartitions == 1)
    val vals = routed.select("seq").collect().map(_.getInt(0))
    assert(vals.toSeq == Seq(1, 2, 3))
  }
}

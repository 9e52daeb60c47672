package graft.transform

import graft.TestSpark
import graft.model.{CanalDml, DbMapping}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("T1 flatten keeps data[i] aligned with old[i] (SingleDml.java:77-80)") {
    val dml = CanalDml("ex", "g", "db", "t", "UPDATE", isDdl = false, sql = null,
      es = 1, ts = 2,
      data = Seq(Map("id" -> "1", "n" -> "a1"), Map("id" -> "2", "n" -> "b1")),
      old = Seq(Map("n" -> "a0"), Map("id" -> "9", "n" -> "b0")))
    val flat = DmlTransforms.flatten(Seq(dml).toDF())
      .select("pos", "data", "old").orderBy("pos").collect()
    assert(flat.length == 2)
    assert(flat(0).getMap[String, String](2) == Map("n" -> "a0"))
    assert(flat(1).getMap[String, String](2) == Map("id" -> "9", "n" -> "b0"))
  }

  test("T1 TRUNCATE yields one marker row with null data (SingleDml.java:83-90)") {
    val dml = CanalDml("ex", "g", "db", "t", "TRUNCATE", isDdl = false, sql = null,
      es = 1, ts = 2, data = null, old = null)
    val flat = DmlTransforms.flatten(Seq(dml).toDF()).collect()
    assert(flat.length == 1)
    assert(flat(0).getAs[Any]("data") == null)
  }

  test("T2 mapAll: excludes case-sloppily, renames via targetColumns") {
    val df = Seq((1L, "x", "secret", 9)).toDF("id", "name", "PassWord", "age")
    val m = DbMapping("d", "t", "tt", mapAll = true,
      excludeColumns = Set("password"),
      targetColumns = Map("uid" -> "id"))
    val out = ColumnMapper.project(df, m)
    assert(out.columns.toSeq == Seq("uid", "name", "age"))
  }

  test("T2 explicit targetColumns only (no mapAll)") {
    val df = Seq((1L, "x", 9)).toDF("id", "name", "age")
    val m = DbMapping("d", "t", "tt", mapAll = false,
      targetColumns = Map("uid" -> "id", "name" -> ""))
    val out = ColumnMapper.project(df, m)
    assert(out.columns.sorted.toSeq == Seq("name", "uid"))
  }

  test("T3 zero-date sentinel → null; normal dates parse (SyncUtil.java:199-247)") {
    val df = Seq("2024-05-01 10:00:00", "0000-00-00 00:00:00", "0000-00-00").toDF("s")
    val out = df.select(Coercion.coerce($"s", TimestampType).as("t")).collect()
    assert(out(0).getTimestamp(0) != null)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("T3 boolean coercion accepts 0/1/numbers/true/false (SyncUtil.java:63-76)") {
    val df = Seq("0", "1", "2", "true", "false").toDF("s")
    val out = df.select(Coercion.coerce($"s", BooleanType).as("b")).collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(false, true, true, true, false))
  }

  test("T3 string→binary uses ISO-8859-1 bytes (SyncUtil.java:168-180)") {
    val df = Seq("héllo").toDF("s")
    val out = df.select(Coercion.coerce($"s", BinaryType).as("b")).head().getAs[Array[Byte]](0)
    assert(out.toSeq == "héllo".getBytes("ISO-8859-1").toSeq)
    assert(out.length == 5) // é is one byte in latin-1, two in utf-8
  }

  test("T3 malformed values coerce to null, never abort (ANSI leniency)") {
    val df = Seq("not-a-number", "2024-13-99 99:99:99", "garbage").toDF("s")
    val out = df.select(
      Coercion.coerce($"s", LongType).as("l"),
      Coercion.coerce($"s", TimestampType).as("t"),
      Coercion.coerce($"s", DoubleType).as("d")).collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
  }

  test("E1 non-numeric enum input passes through raw (no ANSI crash)") {
    val df = Seq("1", "2", "banana", "99").toDF("s")
    val out = df.select(EnumDecode.decode($"s", Seq("Male", "Female")).as("g"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("Male", "Female", "banana", "99"))
  }

  test("F2 placeholder substitution and WHERE-prefix strip") {
    assert(Conditions.substitute("a > {0} AND b = '{1}'", Seq("5", "x")) == "a > 5 AND b = 'x'")
    assert(Conditions.substitute("WHERE a > {0}", Seq("5")) == "a > 5")
  }

  test("F1 applies only with exactly one param and a SYS_TIME column") {
    val df = Seq(("2024-01-01 00:00:00", 1), ("2024-06-01 00:00:00", 2)).toDF("SYS_TIME", "v")
    assert(Conditions.incremental(df, Seq("2024-03-01 00:00:00")).count() == 1)
    assert(Conditions.incremental(df, Seq.empty).count() == 2)      // no param → no filter
    assert(Conditions.incremental(df, Seq("a", "b")).count() == 2)  // 2 params → no filter
    val noCol = Seq(("x", 1)).toDF("other", "v")
    assert(Conditions.incremental(noCol, Seq("2024-03-01")).count() == 1)
  }
}

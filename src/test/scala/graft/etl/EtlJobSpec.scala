package graft.etl

import graft.{DerbyConn, TestSpark}
import graft.model.{DbMapping, MappingConfig}
import graft.sink.DeleteInsertDialect
import org.scalatest.funsuite.AnyFunSuite

import java.sql.DriverManager

/** §3.2 bulk-import lifecycle against parquet source + Derby target. */
class EtlJobSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:etldb;create=true"
  private def conn() = DriverManager.getConnection(url)

  val config: MappingConfig = MappingConfig(
    dataSourceKey = "ds", destination = "example",
    dbMapping = DbMapping("tpch", "customer", "TPCH2.CUSTOMER",
      targetPk = Map("id" -> "c_custkey"), mapAll = true,
      excludeColumns = Set("c_acctbal"),
      targetColumns = Map("id" -> "c_custkey"),
      etlCondition = "c_nationkey < {0}"))

  test("importOne: parquet → transform (T2/F2) → Derby upsert (K5); idempotent") {
    val c = conn()
    c.createStatement().execute(
      """CREATE TABLE "TPCH2"."CUSTOMER" ("ID" BIGINT PRIMARY KEY,
        | "C_NAME" VARCHAR(64), "C_NATIONKEY" INT, "C_MKTSEGMENT" VARCHAR(32))""".stripMargin)
    c.close()

    val r = EtlJob.importOne(spark, config, s"${TestSpark.sf}/customer.parquet",
      params = Seq("5"), DerbyConn.factory(url), numPartitions = 2, dialect = DeleteInsertDialect)
    assert(r.succeeded, r.errorMessage)

    val expected = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
      .where("c_nationkey < 5").count()
    def targetCount: Long = {
      val rs = conn().createStatement()
        .executeQuery("""SELECT COUNT(1) FROM "TPCH2"."CUSTOMER"""")
      rs.next(); rs.getLong(1)
    }
    assert(targetCount == expected && expected > 0)

    // re-import converges (DELETE-then-UPSERT semantics)
    val r2 = EtlJob.importOne(spark, config, s"${TestSpark.sf}/customer.parquet",
      params = Seq("5"), DerbyConn.factory(url), numPartitions = 2, dialect = DeleteInsertDialect)
    assert(r2.succeeded && targetCount == expected)
  }

  test("X3 orchestration fans out over configs matching the destination") {
    val other = config.copy(destination = "elsewhere")
    val results = EtlJob.etl(spark, "nomatch",
      Map("a" -> config, "b" -> other), Seq("5"),
      _ => s"${TestSpark.sf}/customer.parquet", DerbyConn.factory(url), dialect = DeleteInsertDialect)
    assert(results.isEmpty)
    val byName = EtlJob.etl(spark, "a",
      Map("a" -> config, "b" -> other), Seq("5"),
      _ => s"${TestSpark.sf}/customer.parquet", DerbyConn.factory(url), dialect = DeleteInsertDialect)
    assert(byName.size == 1 && byName.head.succeeded)
  }

  test("failed import returns an EtlResult error, not an exception (X3)") {
    val bad = config.copy(dbMapping = config.dbMapping.copy(targetTable = "NO.SUCH_TABLE"))
    val r = EtlJob.importOne(spark, bad, s"${TestSpark.sf}/customer.parquet",
      Seq("5"), DerbyConn.factory(url), dialect = DeleteInsertDialect)
    assert(!r.succeeded && r.errorMessage.isDefined)
  }
}

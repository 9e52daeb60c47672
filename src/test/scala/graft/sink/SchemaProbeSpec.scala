package graft.sink

import graft.DerbyConn
import graft.model.DbMapping
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.{DriverManager, Types}

class SchemaProbeSpec extends AnyFunSuite {

  test("probe discovers live schema via WHERE 1=2, lowercased names") {
    val url = "jdbc:derby:memory:probedb;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute(
      """CREATE TABLE "S"."T" ("ID" BIGINT NOT NULL, "NAME" VARCHAR(10), "TS" TIMESTAMP)""")
    c.close()
    val m = DbMapping("db", "t", "S.T", targetPk = Map("id" -> "id"))
    val schema = SchemaProbe.probe(m, DerbyConn.factory(url), DeleteInsertDialect)
    assert(schema.fieldNames.toSeq == Seq("id", "name", "ts"))
    assert(schema("id").dataType == LongType && !schema("id").nullable)
    assert(schema("name").dataType == StringType)
    assert(schema("ts").dataType == TimestampType)
  }

  test("cache returns same instance until invalidated (S4 coherence)") {
    val url = "jdbc:derby:memory:probedb2;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("""CREATE TABLE "S"."T2" ("A" INT)""")
    c.close()
    val m = DbMapping("db2", "t2", "S.T2")
    val s1 = SchemaProbe.targetSchema("dest", m, DerbyConn.factory(url), DeleteInsertDialect)
    // evolve the table; cached schema must persist until invalidation
    val c2 = DriverManager.getConnection(url)
    c2.createStatement().execute("""ALTER TABLE "S"."T2" ADD "B" INT""")
    c2.close()
    val s2 = SchemaProbe.targetSchema("dest", m, DerbyConn.factory(url), DeleteInsertDialect)
    assert(s2 == s1)
    SchemaProbe.invalidate("dest", m)
    val s3 = SchemaProbe.targetSchema("dest", m, DerbyConn.factory(url), DeleteInsertDialect)
    assert(s3.fieldNames.toSeq == Seq("a", "b"))
  }

  test("JDBC type → Spark type mapping matrix") {
    assert(SchemaProbe.jdbcToSpark(Types.BIGINT, 0, 0) == LongType)
    assert(SchemaProbe.jdbcToSpark(Types.DECIMAL, 10, 2) == DecimalType(10, 2))
    assert(SchemaProbe.jdbcToSpark(Types.BOOLEAN, 0, 0) == BooleanType)
    assert(SchemaProbe.jdbcToSpark(Types.VARBINARY, 0, 0) == BinaryType)
    assert(SchemaProbe.jdbcToSpark(Types.CLOB, 0, 0) == StringType)
    assert(SchemaProbe.jdbcToSpark(Types.DATE, 0, 0) == DateType)
  }
}

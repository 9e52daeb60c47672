package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle: reference `support/TypeUtil.java:36-140` mapping matrix. */
class TypeMappingSpec extends AnyFunSuite {

  test("integer family, signed and unsigned") {
    assert(TypeMapping.map("tinyint(4)", limit = false) == TypeMapping.Mapped("TINYINT", ByteType))
    assert(TypeMapping.map("tinyint(3) unsigned", limit = false) ==
      TypeMapping.Mapped("UNSIGNED_TINYINT", ShortType))
    assert(TypeMapping.map("smallint(6)", limit = false) == TypeMapping.Mapped("SMALLINT", ShortType))
    assert(TypeMapping.map("mediumint(9)", limit = false) == TypeMapping.Mapped("INTEGER", IntegerType))
    assert(TypeMapping.map("int(10) unsigned", limit = false) ==
      TypeMapping.Mapped("UNSIGNED_INT", LongType))
    assert(TypeMapping.map("bigint(20)", limit = false) == TypeMapping.Mapped("BIGINT", LongType))
    assert(TypeMapping.map("bigint(20) unsigned", limit = false) ==
      TypeMapping.Mapped("UNSIGNED_LONG", DecimalType(20, 0)))
    assert(TypeMapping.map("YEAR", limit = false) == TypeMapping.Mapped("INTEGER", IntegerType))
  }

  test("bit maps to binary, bit(1) to boolean") {
    assert(TypeMapping.map("bit(1)", limit = true) == TypeMapping.Mapped("BINARY(1)", BooleanType))
    assert(TypeMapping.map("bit(8)", limit = false).spark == BinaryType)
    assert(TypeMapping.map("bool", limit = false) == TypeMapping.Mapped("BOOLEAN", BooleanType))
  }

  test("decimal keeps precision only with limit (TypeUtil.java:79-83)") {
    assert(TypeMapping.map("decimal(10,2)", limit = true) ==
      TypeMapping.Mapped("DECIMAL(10,2)", DecimalType(10, 2)))
    assert(TypeMapping.map("decimal(10,2)", limit = false) ==
      TypeMapping.Mapped("DECIMAL", DecimalType(10, 2)))
  }

  test("char/varchar limit behavior (TypeUtil.java:102-111)") {
    assert(TypeMapping.map("varchar(64)", limit = true).targetDdl == "VARCHAR(64)")
    assert(TypeMapping.map("varchar(64)", limit = false).targetDdl == "VARCHAR")
    assert(TypeMapping.map("char(2)", limit = true).targetDdl == "CHAR(2)")
  }

  test("temporal types; TIME stays lossless string in Spark") {
    assert(TypeMapping.map("date", limit = false) == TypeMapping.Mapped("DATE", DateType))
    assert(TypeMapping.map("datetime", limit = false) == TypeMapping.Mapped("TIMESTAMP", TimestampType))
    assert(TypeMapping.map("timestamp unsigned", limit = false).targetDdl == "UNSIGNED_TIMESTAMP")
    assert(TypeMapping.map("time", limit = false) == TypeMapping.Mapped("TIME", StringType))
  }

  test("blob/text families and fallback (TypeUtil.java:112-139)") {
    assert(TypeMapping.map("longblob", limit = false) == TypeMapping.Mapped("VARBINARY", BinaryType))
    assert(TypeMapping.map("mediumtext", limit = false) == TypeMapping.Mapped("VARCHAR", StringType))
    assert(TypeMapping.map("enum('a','b')", limit = false).spark == StringType)
    assert(TypeMapping.map("geometry", limit = false) == TypeMapping.Mapped("VARCHAR", StringType))
  }
}

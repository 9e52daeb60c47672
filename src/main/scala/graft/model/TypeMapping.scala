package graft.model

import org.apache.spark.sql.types._

/**
 * MySQL → target (Phoenix-style) → Spark type matrix, re-expressing the
 * reference's `support/TypeUtil.java:36-140` mapping table. The reference
 * maps MySQL `COLUMN_TYPE` strings (e.g. `"int(10) unsigned"`) to Phoenix
 * DDL types; we additionally map to Spark `DataType` so the same config can
 * drive both the JDBC sink DDL (SURVEY §2 D4) and in-engine coercion (T3).
 */
object TypeMapping {

  final case class Mapped(targetDdl: String, spark: DataType)

  private val precisionRe = "\\((\\d+)(?:\\s*,\\s*(\\d+))?\\)".r

  /** Parse `(p[,s])` out of a MySQL COLUMN_TYPE string. */
  def precision(columnType: String): Option[(Int, Option[Int])] =
    precisionRe.findFirstMatchIn(columnType).map { m =>
      (m.group(1).toInt, Option(m.group(2)).map(_.toInt))
    }

  /**
   * Map one MySQL COLUMN_TYPE. `limit=false` drops length/precision from the
   * target DDL exactly as `TypeUtil.getPhoenixType`'s `limit` flag
   * (`TypeUtil.java:38-111`); unsigned variants map to the wider unsigned
   * target types (`:43-99`).
   */
  def map(columnTypeRaw: String, limit: Boolean): Mapped = {
    val ct = columnTypeRaw.trim.toLowerCase
    val unsigned = ct.contains("unsigned")
    val base = ct.takeWhile(c => c.isLetter)
    val p = precision(ct)
    def lim(t: String): String = p match {
      case Some((n, None)) if limit => s"$t($n)"
      case Some((n, Some(s))) if limit => s"$t($n,$s)"
      case _ => t
    }
    base match {
      case "bit" =>
        if (p.exists(_._1 == 1)) Mapped(if (limit) "BINARY(1)" else "BINARY", BooleanType)
        else Mapped(lim("BINARY"), BinaryType)
      case "tinyint" =>
        if (unsigned) Mapped("UNSIGNED_TINYINT", ShortType) else Mapped("TINYINT", ByteType)
      case "boolean" | "bool" => Mapped("BOOLEAN", BooleanType)
      case "smallint" =>
        if (unsigned) Mapped("UNSIGNED_SMALLINT", IntegerType) else Mapped("SMALLINT", ShortType)
      case "mediumint" => Mapped("INTEGER", IntegerType)
      case "int" | "integer" =>
        if (unsigned) Mapped("UNSIGNED_INT", LongType) else Mapped("INTEGER", IntegerType)
      case "bigint" =>
        if (unsigned) Mapped("UNSIGNED_LONG", DecimalType(20, 0)) else Mapped("BIGINT", LongType)
      case "float" =>
        if (unsigned) Mapped("UNSIGNED_FLOAT", FloatType) else Mapped("FLOAT", FloatType)
      case "double" =>
        if (unsigned) Mapped("UNSIGNED_DOUBLE", DoubleType) else Mapped("DOUBLE", DoubleType)
      case "decimal" | "numeric" =>
        val (pr, sc) = p.map { case (a, b) => (a, b.getOrElse(0)) }.getOrElse((10, 0))
        Mapped(lim("DECIMAL"), DecimalType(pr, sc))
      case "date" =>
        Mapped(if (unsigned) "UNSIGNED_DATE" else "DATE", DateType)
      case "datetime" | "timestamp" =>
        Mapped(if (unsigned) "UNSIGNED_TIMESTAMP" else "TIMESTAMP", TimestampType)
      case "time" =>
        // Spark has no TIME type; keep lossless as string (SURVEY §1.2 decision)
        Mapped(if (unsigned) "UNSIGNED_TIME" else "TIME", StringType)
      case "year" => Mapped("INTEGER", IntegerType)
      case "char" => Mapped(lim("CHAR"), StringType)
      case "varchar" => Mapped(lim("VARCHAR"), StringType)
      case "binary" => Mapped(lim("BINARY"), BinaryType)
      case "varbinary" | "tinyblob" | "blob" | "mediumblob" | "longblob" =>
        Mapped("VARBINARY", BinaryType)
      case "tinytext" | "text" | "mediumtext" | "longtext" | "clob" =>
        Mapped("VARCHAR", StringType)
      case "enum" | "set" => Mapped("VARCHAR", StringType)
      case _ => Mapped("VARCHAR", StringType) // fallback (TypeUtil.java:139)
    }
  }

  /** Spark DataType → target DDL type, for schema evolution from a Spark
    * schema (D4) rather than from MySQL metadata. */
  def sparkToTargetDdl(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case BinaryType => "VARBINARY"
    case _ => "VARCHAR"
  }
}

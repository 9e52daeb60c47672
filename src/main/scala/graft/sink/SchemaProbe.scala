package graft.sink

import graft.model.DbMapping
import org.apache.spark.sql.types._

import java.sql.{Connection, Types}
import java.util.concurrent.ConcurrentHashMap

/**
 * S4 — target schema probe + cache (reference
 * `service/PhoenixSyncService.java:522-570`): discover the live target
 * table's schema from the ResultSet metadata of `SELECT * … WHERE 1=2`,
 * cache per `destination.database.table`, invalidate on DDL
 * (`:182,404` — the cache-coherence trap in SURVEY §2.2).
 */
object SchemaProbe {

  private val cache = new ConcurrentHashMap[String, StructType]()

  def cacheKey(destination: String, mapping: DbMapping): String =
    s"$destination.${mapping.database}.${mapping.table}"

  def invalidate(destination: String, mapping: DbMapping): Unit =
    cache.remove(cacheKey(destination, mapping))

  def targetSchema(destination: String, mapping: DbMapping,
                   conn: () => Connection,
                   dialect: SqlDialect = PhoenixSqlDialect): StructType =
    cache.computeIfAbsent(cacheKey(destination, mapping), _ => probe(mapping, conn, dialect))

  /** Uncached probe (`WHERE 1=2` never scans data — metadata only). */
  def probe(mapping: DbMapping, conn: () => Connection,
            dialect: SqlDialect = PhoenixSqlDialect): StructType = {
    val c = conn()
    try {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT * FROM ${dialect.tableName(mapping)} WHERE 1=2")
        val md = rs.getMetaData
        StructType((1 to md.getColumnCount).map { i =>
          // probe keys are lowercased, as the reference does (:539)
          StructField(md.getColumnName(i).toLowerCase, jdbcToSpark(md.getColumnType(i),
            md.getPrecision(i), md.getScale(i)), md.isNullable(i) != 0)
        })
      } finally st.close()
    } finally c.close()
  }

  /** JDBC type → Spark type (the coercion targets of SyncUtil.setPStmt). */
  def jdbcToSpark(t: Int, precision: Int, scale: Int): DataType = t match {
    case Types.BIT | Types.BOOLEAN => BooleanType
    case Types.TINYINT => ByteType
    case Types.SMALLINT => ShortType
    case Types.INTEGER => IntegerType
    case Types.BIGINT => LongType
    case Types.REAL | Types.FLOAT => FloatType
    case Types.DOUBLE => DoubleType
    case Types.DECIMAL | Types.NUMERIC =>
      DecimalType(math.min(math.max(precision, 1), 38), math.max(scale, 0))
    case Types.DATE => DateType
    case Types.TIME | Types.TIMESTAMP => TimestampType
    case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB => BinaryType
    case _ => StringType
  }
}

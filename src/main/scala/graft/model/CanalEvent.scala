package graft.model

import org.apache.spark.sql.types._

/**
 * Canal CDC event model — the Spark-native re-expression of the reference's
 * `Dml` / `SingleDml` abstractions.
 *
 * Reference shape (field usage): `service/PhoenixSyncService.java:159-188`
 * (destination/groupId/database/table/type/isDdl/sql), `:371,425,474`
 * (data/old row images), `support/SingleDml.java:67-92` (flatten semantics:
 * `data` and `old` are parallel per-row lists; TRUNCATE yields one marker
 * row with null data).
 *
 * Values arrive JSON-decoded as strings and are coerced per target column
 * type at write time (reference `support/SyncUtil.java:61-256`), so the row
 * images are modeled as `Map[String, String]` and coercion is a separate,
 * explicit Catalyst `cast` stage ([[graft.transform.Coercion]]).
 */
final case class CanalDml(
    destination: String,
    groupId: String, // null when absent
    database: String,
    table: String,
    `type`: String, // INSERT | UPDATE | DELETE | TRUNCATE | (DDL kinds)
    isDdl: Boolean,
    sql: String,    // raw DDL text when isDdl
    es: Long,       // binlog execute time (ms) — event time
    ts: Long,       // adapter receive time (ms)
    data: Seq[Map[String, String]], // post-images, one per changed row
    old: Seq[Map[String, String]]   // pre-images of changed cols (UPDATE only)
)

/**
 * One flattened row-change (reference `support/SingleDml.java:10-65`).
 * `seq` is a monotonically increasing per-stream sequence used to preserve
 * binlog order across a Spark shuffle — the reference gets ordering for free
 * from its in-process queues (`PhoenixSyncService.java:96-101`); a
 * distributed engine must carry an explicit ordering key.
 */
final case class SingleDml(
    destination: String,
    groupId: String,
    database: String,
    table: String,
    `type`: String,
    es: Long,
    ts: Long,
    seq: Long,
    data: Map[String, String],
    old: Map[String, String]
)

object CanalEvent {
  /** Spark schema for a Canal JSON event stream (`from_json` target). */
  val dmlSchema: StructType = StructType(Seq(
    StructField("destination", StringType),
    StructField("groupId", StringType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("isDdl", BooleanType),
    StructField("sql", StringType),
    StructField("es", LongType),
    StructField("ts", LongType),
    StructField("data", ArrayType(MapType(StringType, StringType))),
    StructField("old", ArrayType(MapType(StringType, StringType)))
  ))

  val Insert   = "INSERT"
  val Update   = "UPDATE"
  val Delete   = "DELETE"
  val Truncate = "TRUNCATE"

  /** DML types that carry row data (everything else is DDL/marker). */
  val rowTypes: Set[String] = Set(Insert, Update, Delete)
}

package graft.queries

import graft.cdc.CdcApply
import graft.ddl.{DdlParser, SchemaEvolution}
import graft.model.DbMapping
import graft.streaming.CanalStream
import graft.transform.{ColumnMapper, Coercion, Conditions, EnumDecode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered query: Spark implementation + optional DuckDB oracle SQL. */
final case class QueryDef(name: String,
                          fn: (SparkSession, String) => DataFrame,
                          oracle: Option[String])

/**
 * Parity queries — one per implemented operator of SURVEY §2.1, each with a
 * DuckDB oracle (the driver's t2 gate). Fixture-based ops (K2/K4/D1/D4/X2)
 * construct their input literally on both sides so the comparison runs
 * end-to-end through the engine.
 */
object ParityQueries {

  def all: Seq[QueryDef] = Seq(s1Parse, s2Scan, s3Metadata, t1Explode, t2Projection,
    t3Coercion, e1Enum, f1Incremental, f2Templated, a1Count, k1UpsertLww,
    k3CdcApply, k2PkChange, k4Truncate, p1PartitionedScan, p2PkHash,
    d1DdlParse, d4SchemaDiff, x2Router)

  /** S1 — Canal JSON event parsing (the stream ingress layer, exercised on
    * literal event lines; golden oracle). */
  val s1Parse: QueryDef = QueryDef("s1_parse",
    (s, _) => {
      import s.implicits._
      val lines = Seq(
        """{"destination":"example","groupId":"g1","database":"mytest","table":"user","type":"INSERT","isDdl":false,"es":1,"ts":2,"data":[{"id":"1","name":"a"},{"id":"2","name":"b"}],"old":null}""",
        """{"destination":"example","groupId":"g1","database":"mytest","table":"user","type":"UPDATE","isDdl":false,"es":3,"ts":4,"data":[{"id":"2","name":"b2"}],"old":[{"name":"b"}]}""",
        """{"destination":"example","groupId":"g1","database":"mytest","table":"user","type":"ALTER","isDdl":true,"sql":"ALTER TABLE user ADD c INT","es":5,"ts":6,"data":null,"old":null}"""
      ).toDF("value")
      CanalStream.parse(lines)
        .select(col("destination"), col("database"), col("table"), col("type"),
          col("isDdl"), col("es"),
          coalesce(size(col("data")), lit(-1)).cast("long").as("n_rows"),
          element_at(element_at(col("data"), 1), "id").as("first_id"),
          element_at(element_at(col("old"), 1), "name").as("first_old_name"))
        .orderBy("es")
    },
    Some("""SELECT * FROM (VALUES
           | ('example','mytest','user','INSERT',false,1::BIGINT,2::BIGINT,'1',NULL),
           | ('example','mytest','user','UPDATE',false,3::BIGINT,1::BIGINT,'2','b'),
           | ('example','mytest','user','ALTER',true,5::BIGINT,-1::BIGINT,NULL,NULL))
           | AS t(destination, database, "table", "type", isDdl, es, n_rows, first_id, first_old_name)
           | ORDER BY es""".stripMargin))

  /** S2 — source table scan with condition; filter + projection reach the
    * parquet scan (PushedFilters/ReadSchema verified in PlanSpec). */
  val s2Scan: QueryDef = QueryDef("s2_scan",
    (s, d) => Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") && col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_quantity > 45
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** S3 — metadata scan: the engine's schema discovery surfaced as rows
    * (INFORMATION_SCHEMA.COLUMNS analog; golden oracle). */
  val s3Metadata: QueryDef = QueryDef("s3_metadata",
    (s, d) => {
      import s.implicits._
      val fields = Tables.customer(s, d).schema.fields.zipWithIndex.map {
        case (f, i) => (i.toLong + 1, f.name, f.dataType.simpleString)
      }
      fields.toSeq.toDF("ordinal", "column_name", "data_type").orderBy("ordinal")
    },
    Some("""SELECT * FROM (VALUES
           | (1::BIGINT,'c_custkey','bigint'), (2::BIGINT,'c_name','string'),
           | (3::BIGINT,'c_nationkey','int'), (4::BIGINT,'c_acctbal','double'),
           | (5::BIGINT,'c_mktsegment','string'))
           | AS t(ordinal, column_name, data_type) ORDER BY ordinal""".stripMargin))

  /** T1 — Dml→SingleDml explode: pack events into Dml-like row batches per
    * user, then flatten back with positional `old` alignment; the round trip
    * must reproduce the source rows with their in-batch position. */
  val t1Explode: QueryDef = QueryDef("t1_explode",
    (s, d) => {
      val ev = Tables.events(s, d)
      val packed = ev
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("event_id"), col("event_type"), col("value"))))
          .as("data"))
      packed
        .select(col("user_id"), posexplode(col("data")).as(Seq("pos", "row")))
        .select(col("row.event_id").as("event_id"), col("user_id"),
          col("row.event_type").as("event_type"), col("row.value").as("value"),
          col("pos").cast("long").as("pos"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type, value,
           |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS pos
           |FROM events ORDER BY event_id""".stripMargin))

  /** T2 — projection/column mapping: mapAll minus excludes plus renames
    * (reference `SyncUtil.getColumnsMap`). */
  val t2Projection: QueryDef = QueryDef("t2_projection",
    (s, d) => {
      val mapping = DbMapping(database = "tpch", table = "customer",
        targetTable = "TPCH2.CUSTOMER", targetPk = Map("id" -> "c_custkey"),
        mapAll = true, excludeColumns = Set("c_acctbal"),
        targetColumns = Map("id" -> "c_custkey", "name" -> "c_name"))
      ColumnMapper.project(Tables.customer(s, d), mapping).orderBy("id")
    },
    Some("""SELECT c_custkey AS id, c_name AS name, c_nationkey, c_mktsegment
           |FROM customer ORDER BY id""".stripMargin))

  /** T3 — coercion matrix: string→timestamp with the zero-date sentinel,
    * string→int, string→boolean ("0"/"1" rule). */
  val t3Coercion: QueryDef = QueryDef("t3_coercion",
    (s, d) => {
      val ev = Tables.events(s, d)
      val staged = ev.select(
        col("event_id"),
        when(col("event_id") % 97 === 0, lit("0000-00-00 00:00:00"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("s_ts"),
        regexp_extract(col("props"), "[0-9]+", 0).as("s_k"),
        when(col("value") > 100, lit("1")).otherwise(lit("0")).as("s_flag"))
      staged.select(
        col("event_id"),
        Coercion.coerce(col("s_ts"), org.apache.spark.sql.types.TimestampType).as("ts2"),
        Coercion.coerce(col("s_k"), org.apache.spark.sql.types.LongType).as("k_int"),
        Coercion.coerce(col("s_flag"), org.apache.spark.sql.types.BooleanType).as("flag"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
           |  CASE WHEN event_id % 97 = 0 THEN NULL
           |       ELSE strftime(ts, '%Y-%m-%d %H:%M:%S')::TIMESTAMP END AS ts2,
           |  regexp_extract(props, '[0-9]+', 0)::BIGINT AS k_int,
           |  (CASE WHEN value > 100 THEN '1' ELSE '0' END)::BIGINT <> 0 AS flag
           |FROM events ORDER BY event_id""".stripMargin))

  /** E1 — enum decode: 1-based ordinal → label, out-of-range passes raw. */
  val e1Enum: QueryDef = QueryDef("e1_enum",
    (s, d) => Tables.events(s, d)
      .select(col("event_id"),
        EnumDecode.decode((col("event_id") % 4).cast("string"), Seq("Male", "Female"))
          .as("gender"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
           |  CASE WHEN event_id % 4 BETWEEN 1 AND 2
           |       THEN (['Male','Female'])[(event_id % 4)::INT]
           |       ELSE (event_id % 4)::VARCHAR END AS gender
           |FROM events ORDER BY event_id""".stripMargin))

  /** F1 — incremental SYS_TIME watermark filter. */
  val f1Incremental: QueryDef = QueryDef("f1_incremental",
    (s, d) => {
      val src = Tables.events(s, d).withColumnRenamed("ts", "SYS_TIME")
      Conditions.incremental(src, Seq("2024-01-15 00:00:00"))
        .select(col("event_id"), col("SYS_TIME").as("sys_time"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, ts AS sys_time FROM events
           |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id""".stripMargin))

  /** F2 — templated etlCondition with `{i}` substitution. */
  val f2Templated: QueryDef = QueryDef("f2_templated",
    (s, d) => Conditions.templated(Tables.orders(s, d),
        "o_totalprice > {0} AND o_orderpriority = '{1}'", Seq("150000", "1-URGENT"))
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
           |WHERE o_totalprice > 150000 AND o_orderpriority = '1-URGENT'
           |ORDER BY o_orderkey""".stripMargin))

  /** A1 — count endpoint (plus distinct count). */
  val a1Count: QueryDef = QueryDef("a1_count",
    (s, d) => Tables.lineitem(s, d)
      .agg(count(lit(1)).as("cnt"), countDistinct(col("l_orderkey")).as("cnt_orders")),
    Some("SELECT count(*) AS cnt, count(DISTINCT l_orderkey) AS cnt_orders FROM lineitem"))

  /** K1 — upsert last-write-wins fold: every event is an upsert keyed by
    * user_id; final state is the last event's full post-image. Single
    * hash-agg shuffle (`max_by`), no window sort. */
  val k1UpsertLww: QueryDef = QueryDef("k1_upsert_lww",
    (s, d) => {
      val ev = Tables.events(s, d)
      CdcApply.latestState(ev, Seq("user_id"), struct(col("ts"), col("event_id")),
          lit("UPDATE"), Seq("event_id", "event_type", "value"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_id, event_type, value FROM (
           |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
           |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin))

  /** K1+K3 — full CDC materialization with deletes: signup=INSERT,
    * error=DELETE, others=UPDATE; keys whose last op is DELETE are absent. */
  val k3CdcApply: QueryDef = QueryDef("k3_cdc_apply",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("op",
        when(col("event_type") === "error", "DELETE")
          .when(col("event_type") === "signup", "INSERT").otherwise("UPDATE"))
      CdcApply.latestState(ev, Seq("user_id"), struct(col("ts"), col("event_id")),
          col("op"), Seq("event_id", "event_type", "value"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_id, event_type, value FROM (
           |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
           |  FROM events) WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin))

  /** K2 — PK-change delete+upsert (fixture; golden oracle). Runs the full
    * sync materialization: flatten → pk-change expansion → LWW fold. */
  val k2PkChange: QueryDef = QueryDef("k2_pk_change",
    (s, _) => CanalStream.materialize(Fixtures.toDf(s, Fixtures.pkChangeDmls),
        Seq("id"), Seq("name"))
      .select(col("id").cast("long").as("id"), col("name"))
      .orderBy("id"),
    Some("""SELECT * FROM (VALUES (2::BIGINT,'bob2'), (3::BIGINT,'alice2'),
           | (5::BIGINT,'eve')) AS t(id, name) ORDER BY id""".stripMargin))

  /** K4 — truncate barrier (fixture; golden oracle). */
  val k4Truncate: QueryDef = QueryDef("k4_truncate",
    (s, _) => CanalStream.materialize(Fixtures.toDf(s, Fixtures.truncateDmls),
        Seq("id"), Seq("name"))
      .select(col("id").cast("long").as("id"), col("name"))
      .orderBy("id"),
    Some("""SELECT * FROM (VALUES (1::BIGINT,'adam2'), (3::BIGINT,'carol'))
           | AS t(id, name) ORDER BY id""".stripMargin))

  /** P1 — partitioned scan: range-bucketed parallel read (the Spark-native
    * replacement for LIMIT/OFFSET splits), surfaced as per-bucket stats. */
  val p1PartitionedScan: QueryDef = QueryDef("p1_partitioned_scan",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(floor(col("l_orderkey") / 1000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy("bucket"),
    Some("""SELECT CAST(floor(l_orderkey / 1000) AS BIGINT) AS bucket,
           |  count(*) AS n, sum(l_quantity) AS sum_qty
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** P2 — pk-hash partition routing invariant: deterministic key→partition
    * assignment, same key never in two partitions. */
  val p2PkHash: QueryDef = QueryDef("p2_pk_hash",
    (s, d) => Tables.events(s, d)
      .groupBy(pmod(col("user_id"), lit(3)).as("part"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_keys"))
      .orderBy("part"),
    Some("""SELECT user_id % 3 AS part, count(*) AS n, count(DISTINCT user_id) AS n_keys
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** D1/D2 — DDL parser golden: ALTER ADD/DROP + TRUNCATE recognition. */
  val d1DdlParse: QueryDef = QueryDef("d1_ddl_parse",
    (s, _) => {
      import s.implicits._
      val rows = Fixtures.ddlStatements.flatMap { case (id, sql) =>
        val (table, ops) = DdlParser.parse(sql)
        ops.zipWithIndex.map { case (op, i) =>
          op match {
            case DdlParser.AddColumn(c, t, nn, dflt) =>
              (id, i.toLong, table, "ADD", c, t, nn, dflt.orNull)
            case DdlParser.DropColumn(c) =>
              (id, i.toLong, table, "DROP", c, null: String, false, null: String)
            case DdlParser.TruncateTable(t) =>
              (id, i.toLong, table, "TRUNCATE", t, null: String, false, null: String)
          }
        }
      }
      rows.toDF("stmt_id", "op_idx", "table_name", "op", "col_name", "col_type",
        "not_null", "default_val").orderBy("stmt_id", "op_idx")
    },
    Some("""SELECT * FROM (VALUES
           | (1::BIGINT, 0::BIGINT, 'user', 'ADD', 'age', 'INT', false, '18'),
           | (2::BIGINT, 0::BIGINT, 'user', 'ADD', 'gender', 'ENUM', true, NULL),
           | (3::BIGINT, 0::BIGINT, 'user', 'DROP', 'age', NULL, false, NULL),
           | (4::BIGINT, 0::BIGINT, 'user', 'ADD', 'score', 'DECIMAL(10,2)', false, '0.5'),
           | (4::BIGINT, 1::BIGINT, 'user', 'ADD', 'note', 'VARCHAR(255)', false, NULL),
           | (5::BIGINT, 0::BIGINT, 'user', 'TRUNCATE', 'user', NULL, false, NULL))
           | AS t(stmt_id, op_idx, table_name, op, col_name, col_type, not_null, default_val)
           | ORDER BY stmt_id, op_idx""".stripMargin))

  /** D3/D4 — schema diff & evolve golden: CREATE when target missing, ALTER
    * ADD + default backfill when partially present. */
  val d4SchemaDiff: QueryDef = QueryDef("d4_schema_diff",
    (s, _) => {
      import s.implicits._
      val mapping = DbMapping(database = "mytest", table = "user",
        targetTable = "MYTEST2.USER", targetPk = Map("id" -> "id"),
        excludeColumns = Set("password"))
      val source = Seq(
        SchemaEvolution.SourceColumn("id", "bigint", isPk = true, nullable = false, None),
        SchemaEvolution.SourceColumn("name", "varchar(64)", isPk = false, nullable = true, None),
        SchemaEvolution.SourceColumn("age", "int", isPk = false, nullable = true, Some("18")),
        SchemaEvolution.SourceColumn("password", "varchar(64)", isPk = false, nullable = true, None))
      val created = SchemaEvolution.plan(mapping, source, Set.empty)
      val evolved = SchemaEvolution.plan(mapping, source, Set("id", "name"))
      val rows =
        created.createTable.toSeq.map(x => ("create", 0L, x)) ++
          evolved.addColumns.zipWithIndex.map { case (x, i) => ("alter", i.toLong, x) } ++
          evolved.backfills.zipWithIndex.map { case (x, i) => ("backfill", i.toLong, x) }
      rows.toDF("phase", "idx", "stmt").orderBy("phase", "idx")
    },
    Some("""SELECT * FROM (VALUES
           | ('alter', 0::BIGINT, 'ALTER TABLE "MYTEST2"."USER" ADD IF NOT EXISTS "AGE" INTEGER'),
           | ('backfill', 0::BIGINT, 'UPSERT INTO "MYTEST2"."USER" ("ID", "AGE") SELECT "ID", 18 FROM "MYTEST2"."USER"'),
           | ('create', 0::BIGINT, 'CREATE TABLE IF NOT EXISTS "MYTEST2"."USER" ("ID" BIGINT, "NAME" VARCHAR, "AGE" INTEGER, CONSTRAINT pk PRIMARY KEY ("ID"))'))
           | AS t(phase, idx, stmt) ORDER BY phase, idx""".stripMargin))

  /** X2 — event router: config lookup with fan-out; unmatched events drop. */
  val x2Router: QueryDef = QueryDef("x2_router",
    (s, _) => {
      import s.implicits._
      val configs = Fixtures.routerConfigs.toDF("destination", "database", "table", "target")
      val evts = Fixtures.routerEvents.toDF("event_seq", "destination", "database", "table")
      evts.join(configs, Seq("destination", "database", "table"))
        .select("event_seq", "destination", "database", "table", "target")
        .orderBy("event_seq", "target")
    },
    Some("""WITH configs(destination, database, "table", target) AS (VALUES
           |  ('example','mytest','user','MYTEST2.USER'),
           |  ('example','mytest','user','BACKUP.USER'),
           |  ('example','mytest','order','MYTEST2.ORDER'),
           |  ('other','mytest','user','X.Y')),
           |evts(event_seq, destination, database, "table") AS (VALUES
           |  (1::BIGINT,'example','mytest','user'), (2::BIGINT,'example','mytest','order'),
           |  (3::BIGINT,'example','mytest','ghost'), (4::BIGINT,'nope','mytest','user'))
           |SELECT event_seq, e.destination, e.database, e."table", c.target
           |FROM evts e JOIN configs c USING (destination, database, "table")
           |ORDER BY event_seq, target""".stripMargin))
}

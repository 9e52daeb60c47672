package graft.streaming

import graft.cdc.{CdcApply, PkHash}
import graft.model.{CanalEvent, MappingConfig}
import graft.transform.DmlTransforms
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.atomic.AtomicReference

/**
 * S1/X2/X5 + the §3.1 sync hot path as Structured Streaming:
 *
 * `readStream (Canal JSON) → from_json → flatten (T1) → route (X2) →
 * repartition by PK hash (P2/P3) → foreachBatch { ordered apply K1–K4 with
 * D5 self-heal }`.
 *
 * The reference's push-batch SPI (`PhoenixAdapter.sync`,
 * `PhoenixAdapter.java:143-152`) maps to a micro-batch; its in-process
 * worker queues map to the shuffle; binlog order is carried explicitly as
 * `(es, ts, seq, pos)` (SURVEY §7.4 risk 1). DDL events act as a barrier:
 * each micro-batch is split at DDL boundaries and segments apply
 * sequentially (`PhoenixSyncService.java:180-198` runs DDL inline; risk 4).
 *
 * X5 — config hot-reload: the route table is an `AtomicReference` read at
 * the top of every micro-batch, updated by a driver-side watcher
 * (reference polls the conf dir every 3 s,
 * `monitor/PhoenixConfigMonitor.java:41-51`).
 */
object CanalStream {

  /** Parse a raw JSON-line stream into Dml rows. */
  def parse(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol).cast("string"), CanalEvent.dmlSchema).as("e"))
      .select("e.*")

  /** X2 — route one micro-batch to the configs matching its
    * destination/database/table (an event can fan out to several configs). */
  def routeFor(batch: DataFrame, config: MappingConfig): DataFrame = {
    val m = config.dbMapping
    batch.filter(
      col("destination") === config.destination &&
        col("database") === m.database && col("table") === m.table)
  }

  /**
   * Start the sync stream. `applyBatch` receives (config, orderedSingles)
   * per micro-batch — in production it applies through
   * [[graft.sink.UpsertSink]]; tests can capture state instead.
   */
  def start(spark: SparkSession, raw: DataFrame,
            configsRef: AtomicReference[Seq[MappingConfig]],
            numPartitions: Int,
            applyBatch: (MappingConfig, DataFrame) => Unit,
            onDdl: (MappingConfig, DdlBarrier.DdlEvent) => Unit = (_, _) => ()): StreamingQuery = {
    parse(raw).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // seq must reflect source order: canal delivers one ordered binlog
        // stream, so the raw batch is sequenced on a single partition (cheap —
        // micro-batches are bounded). A partition-prefixed id would misorder
        // same-timestamp events across source partitions and could place DML
        // on the wrong side of a DDL barrier (DdlBarrier compares raw seq).
        // Parallelism is restored by the PK-hash shuffle before apply.
        val withSeq = batch.coalesce(1).withColumn("seq", monotonically_increasing_id())
        val flat = DmlTransforms.withOrderKey(DmlTransforms.flatten(withSeq))
        flat.persist()
        try {
          // DDL presence probed once per batch on the cached flatten (rare)
          val anyDdl = !flat.where(col("isDdl")).limit(1).isEmpty
          configsRef.get().foreach { config =>
            val routedAll = routeFor(flat, config)
            val ddl = if (anyDdl) DdlBarrier.ddlEvents(routedAll, config) else Seq.empty
            val dml = routedAll.where(!coalesce(col("isDdl"), lit(false)))
            // DDL acts as an ordering barrier (SURVEY §7.4 risk 4): apply
            // each DML segment, then its following DDL, sequentially
            DdlBarrier.segments(dml, ddl).foreach { case (ddlEvt, segment) =>
              ddlEvt.foreach(d => onDdl(config, d))
              val pk = config.dbMapping.targetPk.values.toSeq.sorted
              // K2 pk-change expansion BEFORE the shuffle: the old-key DELETE
              // must route to the OLD key's partition to stay ordered against
              // that key's other ops. (The reference routes the whole UPDATE
              // by the post-image hash — `PhoenixSyncService.java:609-628` —
              // which races the old-key delete against concurrent old-key
              // writes; the pre-shuffle expansion removes that race.)
              val expanded = CdcApply.expandPkChanges(segment, pk)
              val ordered =
                if (config.concurrent)
                  PkHash.routeConcurrent(expanded,
                    pk.map(p => s"data.$p"), numPartitions, Seq("order_key", "sub_seq"))
                else PkHash.routeSerial(expanded, Seq("order_key", "sub_seq"))
              applyBatch(config, ordered)
            }
          }
        } finally flat.unpersist()
        ()
      }
      .start()
  }

  /**
   * Apply one routed+ordered micro-batch to a JDBC target (the production
   * `applyBatch` for [[start]]): K2 pk-change expansion, T3 coercion of the
   * string row images to the probed target schema (S4), E1 enum decode,
   * then per-partition sequential apply through the sink (K1–K4) with D5
   * self-heal delegated to the caller-supplied `heal`.
   */
  def applyBatchToJdbc(config: MappingConfig, ordered: DataFrame,
                       targetSchema: org.apache.spark.sql.types.StructType,
                       connFactory: () => java.sql.Connection,
                       dialect: graft.sink.SqlDialect = graft.sink.PhoenixSqlDialect,
                       heal: Option[Throwable => Unit] = None): Unit = {
    import graft.sink.{SchemaProbe, UpsertSink}
    import graft.transform.Coercion
    val m = config.dbMapping
    // skipMissing (reference PhoenixSyncService.java:399-404): a mapped
    // column absent from the probed target schema is warn-and-skipped when
    // true; when false the miss is a schema error — heal (D4 sync) then
    // re-probe, failing if still missing. Mapped columns come from the
    // batch's own row images (one tiny distinct-keys agg per segment; the
    // reference checks the same thing per row against target metadata).
    val batchSourceCols = ordered
      .agg(array_distinct(flatten(collect_set(map_keys(col("data"))))).as("ks"))
      .head() match {
        case r if r.isNullAt(0) => Seq.empty[String]
        case r => r.getSeq[String](0)
      }
    val mappedTargets = graft.transform.ColumnMapper.columnsMap(m, batchSourceCols).map(_._1)
    def missingFrom(schema: org.apache.spark.sql.types.StructType): Seq[String] =
      mappedTargets.filterNot(t => schema.fieldNames.exists(_.equalsIgnoreCase(t)))
    // segments with no row images (TRUNCATE-only, or empty between two DDL
    // barriers) have nothing to project — never trigger a spurious heal
    val missing = if (batchSourceCols.isEmpty) Seq.empty else missingFrom(targetSchema)
    val effectiveSchema =
      if (missing.isEmpty) targetSchema
      else if (m.skipMissing) {
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"skipMissing: target ${m.targetTable} lacks mapped columns " +
            s"${missing.mkString(", ")} — skipped")
        targetSchema
      } else {
        val err = new RuntimeException(
          s"ColumnNotFound: target ${m.targetTable} lacks mapped columns ${missing.mkString(", ")}")
        heal match {
          case Some(h) =>
            h(err) // D4 schema sync, then re-probe the healed target
            val reprobed = SchemaProbe.probe(m, connFactory, dialect)
            val still = missingFrom(reprobed)
            if (still.nonEmpty) throw new RuntimeException(
              s"ColumnNotFound: target ${m.targetTable} still lacks ${still.mkString(", ")} after heal")
            reprobed
          case None => throw err
        }
      }
    // input is already pk-change-expanded and partition-ordered by start()
    val fields = effectiveSchema.fields.toSeq
    val decoded = fields.map { f =>
      val raw = element_at(col("data"), f.name)
      val withEnum = m.enumColumns.get(f.name) match {
        case Some(labels) => graft.transform.EnumDecode.decode(raw, labels)
        case None => raw
      }
      Coercion.coerce(withEnum, f.dataType).as(f.name)
    }
    val projected = ordered.select(Seq(col("type")) ++ decoded: _*)
    val names = fields.map(_.name)
    val pkTargetCols = m.targetPk.keys.toSeq.sorted
    val pkIdx = pkTargetCols.map { p =>
      val i = names.indexWhere(_.equalsIgnoreCase(p))
      // -1 + 1 = 0 would silently read the op column as the PK value
      require(i >= 0, s"target PK column '$p' missing from probed target schema " +
        s"(${names.mkString(", ")})")
      i + 1
    }
    val mapping = m
    projected.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val ops = rows.map { r =>
        val op = r.getString(0)
        val vals = (1 to names.size).map(r.get)
        UpsertSink.RowOp(op, vals, pkIdx.map(r.get))
      }
      UpsertSink.applyPartition(ops, mapping, names, connFactory, heal, dialect)
    }
  }

  /**
   * Batch-equivalent materialization of the stream (used for oracle
   * checks): fold a bounded Dml log into final per-table state.
   */
  def materialize(dmls: DataFrame, pkCols: Seq[String], payload: Seq[String]): DataFrame = {
    val flat = DmlTransforms.withOrderKey(
      DmlTransforms.flatten(dmls.withColumn("seq", col("es"))))
    val afterTrunc = CdcApply.afterLastTruncate(
      flat, Seq("database", "table"), col("order_key"), col("type"))
    val expanded = CdcApply.expandPkChanges(afterTrunc, pkCols)
    val projected = expanded.select(
      (Seq(col("type"), struct(col("order_key"), col("sub_seq")).as("ord")) ++
        pkCols.map(p => element_at(col("data"), p).as(p)) ++
        payload.map(p => element_at(col("data"), p).as(p))): _*)
    CdcApply.latestState(projected, pkCols, col("ord"), col("type"), payload)
  }
}

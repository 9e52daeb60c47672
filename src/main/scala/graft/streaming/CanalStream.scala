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
 *
 * INGRESS ORDERING — the reference consumes ONE ordered binlog stream
 * (`PhoenixAdapter.java:143-152`); a Spark ingress is multi-partition, so
 * the order must come from source metadata rather than a driver-side
 * re-sequencing. [[IngressOrdering]] picks the order key:
 *
 *  - [[IngressOrdering.KafkaOffsets]]: `seq = partition << 42 | offset` —
 *    Kafka's per-partition offsets ARE the binlog order under canal's MQ
 *    partitioning (all events of one table hash to one partition, DDL
 *    included), so every comparison the engine makes — per-key order and
 *    DDL-barrier splits, both scoped to one table — happens between seqs
 *    of the SAME partition, where the composite is exact. No extra job, no
 *    coalesce: micro-batches parse/flatten at full source parallelism.
 *  - [[IngressOrdering.FileOrder]]: `seq = fileRank << 42 | positionInFile`
 *    — canal file rotation is chronological, so files rank by name (one
 *    tiny driver `distinct` on the batch's file list); position within a
 *    file is the intra-partition read index (exact while a file stays
 *    within one scan split — set `maxPartitionBytes` ≥ the rotation size).
 *    Batches with no file metadata (memory source) degrade to SingleStream.
 *  - [[IngressOrdering.SingleStream]]: the strict fallback — sequence the
 *    whole batch on one task (`coalesce(1)`). Exact for any source, but
 *    serializes parse/flatten; at 100× CDC volume that single task is the
 *    ingest ceiling, so it is no longer the default.
 *
 * In every mode the seq only breaks ties within `(es, ts)` — binlog
 * timestamps lead the order key ([[DmlTransforms.withOrderKey]]) — and
 * parallelism downstream of the flatten comes from the PK-hash shuffle.
 */
object CanalStream {

  /** How the per-event `seq` (binlog order within equal `(es, ts)`) is
    * derived from the ingress source. See the class doc for the contract
    * each mode assumes. */
  sealed trait IngressOrdering
  object IngressOrdering {
    /** `KafkaOffsets` when the raw stream carries `partition`/`offset`
      * columns, else `FileOrder` (which itself degrades to `SingleStream`
      * on batches without file metadata). */
    case object Auto extends IngressOrdering
    case object SingleStream extends IngressOrdering
    case object KafkaOffsets extends IngressOrdering
    case object FileOrder extends IngressOrdering
  }

  /** Low 42 bits of `seq` hold the within-stream position (Kafka offset /
    * in-file index); bits above hold the stream id (Kafka partition / file
    * rank). Comparisons are only ever made within one table's stream, where
    * the high bits are constant. */
  private val SeqPosBits = 42

  /** Per-segment context handed to `applyBatch`: the distinct source
    * columns seen in this table's batch rows (from the same single pass
    * that probes DDL presence), or None when the table has a DDL barrier in
    * the batch — then columns must be re-derived per segment, since a
    * column may only exist after the ALTER. */
  final case class SegmentCtx(sourceCols: Option[Seq[String]] = None)

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

  /** Resolve `Auto` against the raw stream's columns (exposed for tests). */
  private[streaming] def resolveOrdering(rawColumns: Seq[String],
                                         ordering: IngressOrdering): IngressOrdering =
    ordering match {
      case IngressOrdering.Auto =>
        if (rawColumns.contains("partition") && rawColumns.contains("offset"))
          IngressOrdering.KafkaOffsets
        else IngressOrdering.FileOrder
      case m => m
    }

  /** Parse, carrying the mode's ordering metadata through `from_json`. */
  private def parseOrdered(raw: DataFrame, mode: IngressOrdering): DataFrame = mode match {
    case IngressOrdering.KafkaOffsets =>
      raw.select(
        from_json(col("value").cast("string"), CanalEvent.dmlSchema).as("e"),
        (shiftleft(col("partition").cast("long"), SeqPosBits) +
          col("offset").cast("long")).as("_seq"))
        .select(col("e.*"), col("_seq"))
    case IngressOrdering.FileOrder =>
      raw.select(
        from_json(col("value").cast("string"), CanalEvent.dmlSchema).as("e"),
        input_file_name().as("_src_file"))
        .select(col("e.*"), col("_src_file"))
    case _ => parse(raw)
  }

  /** Materialize the mode's order key as the `seq` column over the cached
    * flattened batch (exposed for tests). `files` is the batch's sorted
    * file list (FileOrder only — aggregated for free in the stats pass);
    * no mode runs an extra Spark job here. */
  private[streaming] def assignSeq(flat0: DataFrame, mode: IngressOrdering,
                                   files: Seq[String] = Seq.empty): DataFrame =
    mode match {
      case IngressOrdering.KafkaOffsets =>
        flat0.withColumnRenamed("_seq", "seq")
      case IngressOrdering.FileOrder =>
        if (files.isEmpty || files.forall(_.isEmpty))
          // no file metadata (memory source): strict single-stream fallback
          flat0.drop("_src_file").coalesce(1)
            .withColumn("seq", monotonically_increasing_id())
        else {
          val rank = map(files.zipWithIndex.flatMap {
            case (f, i) => Seq(lit(f), lit(i.toLong))
          }: _*)
          // a lookup miss (file-name rendering drift between the rank list
          // and input_file_name) must fail the batch, not silently null the
          // order key
          val rankCol = element_at(rank, col("_src_file"))
          val checked = when(rankCol.isNotNull, rankCol)
            .otherwise(raise_error(concat(lit("unranked source file: "), col("_src_file")))
              .cast("long"))
          // in-file position = intra-partition read index (a rotation-sized
          // file stays in one scan split, so the masked partition bits are
          // constant per file and the index carries the line order;
          // monotonically_increasing_id over the CACHED partitions is
          // deterministic across the batch's downstream jobs)
          flat0.withColumn("seq",
              shiftleft(checked, SeqPosBits) +
                monotonically_increasing_id().bitwiseAND(lit((1L << SeqPosBits) - 1)))
            .drop("_src_file")
        }
      case _ =>
        flat0.coalesce(1).withColumn("seq", monotonically_increasing_id())
    }

  /**
   * Start the sync stream. `applyBatch` receives (config, orderedSingles,
   * segmentCtx) per micro-batch segment — in production it applies through
   * [[graft.sink.UpsertSink]] (pass `ctx.sourceCols` to
   * [[applyBatchToJdbc]]); tests can capture state instead.
   *
   * `checkpointLocation` enables restart/recovery: source offsets and batch
   * commits go to the WAL, so a restarted query resumes at the first
   * uncommitted batch. The sink contract is at-least-once — a crash between
   * the JDBC apply and the commit marker replays that whole micro-batch on
   * restart — which is exactly the reference's delivery model
   * (`PhoenixAdapter.sync` retries the push batch until acked), and safe
   * here for the same reason: the apply is an idempotent PK-keyed upsert /
   * delete, so a replay converges to the same final state (SURVEY §7.4
   * risk 5; exercised end-to-end in StreamingSpec's kill-and-restart case).
   */
  def start(spark: SparkSession, raw: DataFrame,
            configsRef: AtomicReference[Seq[MappingConfig]],
            numPartitions: Int,
            applyBatch: (MappingConfig, DataFrame, SegmentCtx) => Unit,
            onDdl: (MappingConfig, DdlBarrier.DdlEvent) => Unit = (_, _) => (),
            ordering: IngressOrdering = IngressOrdering.Auto,
            checkpointLocation: Option[String] = None): StreamingQuery = {
    val mode = resolveOrdering(raw.columns.toSeq, ordering)
    val writer = parseOrdered(raw, mode).writeStream
      .outputMode("append")
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // flatten first (order-preserving per partition), THEN derive the
        // order key — so the single stats pass below can also collect the
        // batch's file list and no ingress mode pays an extra job
        val flat0 = DmlTransforms.flatten(batch)
        flat0.persist()
        try {
          // ONE pass over the cached flatten yields, per routed table, the
          // DDL-presence flag and the distinct source columns (replacing a
          // DDL probe plus one agg per segment on the hot path; the mapped-
          // column check itself is per-row in the reference,
          // `PhoenixSyncService.java:399-404`) — plus, for FileOrder, the
          // source-file set that ranks the batch's files
          val fileAgg =
            if (mode == IngressOrdering.FileOrder)
              Seq(collect_set(col("_src_file")).as("src_files"))
            else Seq.empty
          val aggs = Seq(
            max(coalesce(col("isDdl"), lit(false))).as("any_ddl"),
            array_distinct(flatten(collect_set(map_keys(col("data"))))).as("src_cols")) ++
            fileAgg
          val statRows = flat0.groupBy("destination", "database", "table")
            .agg(aggs.head, aggs.tail: _*)
            .collect()
          val files =
            if (mode == IngressOrdering.FileOrder)
              statRows.flatMap(r => Option(r.getSeq[String](5)).getOrElse(Seq.empty))
                .distinct.sorted.toSeq
            else Seq.empty
          val tableStats = statRows
            .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
              ((r.getBoolean(3), Option(r.getSeq[String](4)).getOrElse(Seq.empty))))
            .toMap
          val flat = DmlTransforms.withOrderKey(assignSeq(flat0, mode, files))
          configsRef.get().foreach { config =>
            val m = config.dbMapping
            val (tableHasDdl, srcCols) =
              tableStats.getOrElse((config.destination, m.database, m.table),
                (false, Seq.empty[String]))
            val routedAll = routeFor(flat, config)
            val ddl = if (tableHasDdl) DdlBarrier.ddlEvents(routedAll, config) else Seq.empty
            val dml = routedAll.where(!coalesce(col("isDdl"), lit(false)))
            val ctx = SegmentCtx(if (tableHasDdl) None else Some(srcCols))
            // DDL acts as an ordering barrier (SURVEY §7.4 risk 4): apply
            // each DML segment, then its following DDL, sequentially
            DdlBarrier.segments(dml, ddl).foreach { case (ddlEvt, segment) =>
              ddlEvt.foreach(d => onDdl(config, d))
              val pk = m.targetPk.values.toSeq.sorted
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
              applyBatch(config, ordered, ctx)
            }
          }
        } finally flat0.unpersist()
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
                       heal: Option[Throwable => Unit] = None,
                       sourceColsHint: Option[Seq[String]] = None): Unit = {
    import graft.sink.{SchemaProbe, UpsertSink}
    import graft.transform.Coercion
    val m = config.dbMapping
    // skipMissing (reference PhoenixSyncService.java:399-404): a mapped
    // column absent from the probed target schema is warn-and-skipped when
    // true; when false the miss is a schema error — heal (D4 sync) then
    // re-probe, failing if still missing. Mapped columns come from the
    // batch's own row images — via `sourceColsHint` when the caller already
    // derived them ([[start]]'s single stats pass), else one distinct-keys
    // agg here (the reference checks the same per row against metadata).
    val batchSourceCols = sourceColsHint.getOrElse {
      ordered
        .agg(array_distinct(flatten(collect_set(map_keys(col("data"))))).as("ks"))
        .head() match {
          case r if r.isNullAt(0) => Seq.empty[String]
          case r => r.getSeq[String](0)
        }
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

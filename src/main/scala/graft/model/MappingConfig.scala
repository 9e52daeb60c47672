package graft.model

/**
 * Mapping configuration — the unit of sync/ETL configuration, mirroring the
 * reference's YAML mapping (`config/MappingConfig.java:100-117` for fields
 * and defaults; sample at `src/main/resources/phoenix/mytest_user.yml`).
 *
 * Defaults match the reference exactly:
 *  - `concurrent=false` (MappingConfig.java:18), `escapeUpper=true` (:119-125)
 *  - `mapAll=false`, `alter=false`, `drop=false`, `skipMissing=false`,
 *    `limit=false` (:104-110)
 *  - `readBatch=5000`, `commitBatch=5000` (:115-116)
 */
final case class DbMapping(
    database: String,
    table: String,
    targetTable: String,
    targetPk: Map[String, String] = Map.empty,   // targetPkCol -> srcPkCol
    mapAll: Boolean = false,
    targetColumns: Map[String, String] = Map.empty, // targetCol -> srcCol ("" = same name)
    excludeColumns: Set[String] = Set.empty,
    etlCondition: String = null,
    enumColumns: Map[String, Seq[String]] = Map.empty, // col -> 1-based labels
    escapeUpper: Boolean = true,
    alter: Boolean = false,
    drop: Boolean = false,
    skipMissing: Boolean = false,
    limit: Boolean = false,
    readBatch: Int = 5000,
    commitBatch: Int = 5000
) {
  /** `targetDb.targetTable` split, as `MappingConfig.getTargetDb/getTargetTable`. */
  def targetDb: Option[String] = {
    val i = targetTable.indexOf('.')
    if (i > 0) Some(targetTable.substring(0, i)) else None
  }
  def targetTableName: String = {
    val i = targetTable.indexOf('.')
    if (i > 0) targetTable.substring(i + 1) else targetTable
  }

  /** Case-sloppy exclusion check (reference checks raw and lowercased:
    * `SyncUtil.java:42`, `PhoenixEtlService.java:117`). */
  def isExcluded(col: String): Boolean =
    excludeColumns.contains(col) || excludeColumns.contains(col.toLowerCase)

  /**
   * Enum decode (reference `MappingConfig.java:273-287`): 1-based ordinal to
   * label; out-of-range or non-enum columns pass the raw value through.
   */
  def decodeEnum(column: String, value: String): String =
    enumColumns.get(column) match {
      case Some(labels) if value != null =>
        value.toIntOption match {
          case Some(i) if i >= 1 && i <= labels.size => labels(i - 1)
          case _ => value
        }
      case _ => value
    }
}

final case class MappingConfig(
    dataSourceKey: String,
    destination: String,
    groupId: String = null,
    outerAdapterKey: String = null,
    concurrent: Boolean = false,
    debug: Boolean = false,
    notifyUrl: String = null,
    dbMapping: DbMapping
) {
  /** Routing key `destination[-groupId]_database-table`
    * (reference `PhoenixSyncService.java:163-168`). */
  def routeKey(includeGroup: Boolean): String = {
    val dest = if (includeGroup && groupId != null) s"$destination-$groupId" else destination
    s"${dest}_${dbMapping.database}-${dbMapping.table}"
  }
}

/**
 * Minimal YAML-subset loader for reference-style mapping files
 * (`config/ConfigLoader.java:24-46` loads these with SnakeYAML; we only need
 * the flat two-level shape of `mytest_user.yml`, so a tiny hand parser keeps
 * the build dependency-free). Supports: `key: value`, one nested block
 * (`dbMapping:`), inline maps `{a: b, c:}`, inline lists `[a, b]`, and block
 * lists for enum values.
 */
object MappingConfigLoader {
  def parse(yaml: String): MappingConfig = {
    val root = scala.collection.mutable.Map[String, String]()
    val db = scala.collection.mutable.Map[String, String]()
    var inDb = false
    var pendingKey: String = null
    var pendingList = scala.collection.mutable.ListBuffer[String]()
    def flushPending(): Unit = if (pendingKey != null) {
      val tgt = if (inDb) db else root
      tgt(pendingKey) = pendingList.mkString("[", ", ", "]")
      pendingKey = null; pendingList = scala.collection.mutable.ListBuffer[String]()
    }
    yaml.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        val indented = line.startsWith("  ") || line.startsWith("\t")
        val t = line.trim
        if (t.startsWith("- ")) { pendingList += t.drop(2).trim }
        else {
          flushPending()
          val i = t.indexOf(':')
          if (i > 0) {
            val k = t.substring(0, i).trim
            val v = t.substring(i + 1).trim
            if (k == "dbMapping" && v.isEmpty) inDb = true
            else if (!indented) { inDb = false; if (v.isEmpty) pendingKey = k else root(k) = v }
            else { if (v.isEmpty && !v.startsWith("{")) pendingKey = k else (if (inDb) db else root)(k) = v }
          }
        }
      }
    }
    flushPending()
    def bool(m: collection.Map[String, String], k: String, d: Boolean) =
      m.get(k).map(_.toBoolean).getOrElse(d)
    def int(m: collection.Map[String, String], k: String, d: Int) =
      m.get(k).map(_.toInt).getOrElse(d)
    def inlineMap(s: String): Map[String, String] =
      s.stripPrefix("{").stripSuffix("}").split(',').iterator.map(_.trim).filter(_.nonEmpty)
        .map { kv =>
          val i = kv.indexOf(':')
          if (i < 0) kv -> "" else kv.substring(0, i).trim -> kv.substring(i + 1).trim
        }.toMap
    def inlineList(s: String): Seq[String] =
      s.stripPrefix("[").stripSuffix("]").split(',').iterator.map(_.trim).filter(_.nonEmpty).toSeq
    // validate the fields no config can route without (the reference's
    // SnakeYAML load into a typed config fails on malformed input; a silent
    // null-field config here would never match a destination and could mask a
    // bad edit — throw so ConfigMonitor can retain the prior good config)
    require(root.contains("destination"), "mapping config missing 'destination'")
    Seq("database", "table", "targetTable").foreach(k =>
      require(db.contains(k), s"mapping config dbMapping missing '$k'"))
    val enumCols: Map[String, Seq[String]] = db.get("enumColumns").map { s =>
      // shape: {gender: [Male, Female]} — split on top-level keys
      val body = s.stripPrefix("{").stripSuffix("}")
      "(\\w+)\\s*:\\s*\\[([^\\]]*)\\]".r.findAllMatchIn(body).map { m =>
        m.group(1) -> m.group(2).split(',').iterator.map(_.trim).filter(_.nonEmpty).toSeq
      }.toMap
    }.getOrElse(Map.empty)
    MappingConfig(
      dataSourceKey = root.getOrElse("dataSourceKey", "defaultDS"),
      destination = root.getOrElse("destination", null),
      groupId = root.getOrElse("groupId", null),
      outerAdapterKey = root.getOrElse("outerAdapterKey", null),
      concurrent = bool(root, "concurrent", d = false),
      debug = bool(root, "debug", d = false),
      notifyUrl = root.getOrElse("notifyUrl", null),
      dbMapping = DbMapping(
        database = db.getOrElse("database", null),
        table = db.getOrElse("table", null),
        targetTable = db.getOrElse("targetTable", null),
        targetPk = db.get("targetPk").map(inlineMap).getOrElse(Map.empty),
        mapAll = bool(db, "mapAll", d = false),
        targetColumns = db.get("targetColumns").map(inlineMap).getOrElse(Map.empty),
        excludeColumns = db.get("excludeColumns").map(inlineList(_).toSet).getOrElse(Set.empty),
        etlCondition = db.getOrElse("etlCondition", null),
        enumColumns = enumCols,
        escapeUpper = bool(db, "escapeUpper", d = true),
        alter = bool(db, "alter", d = false),
        drop = bool(db, "drop", d = false),
        skipMissing = bool(db, "skipMissing", d = false),
        limit = bool(db, "limit", d = false),
        readBatch = int(db, "readBatch", 5000),
        commitBatch = int(db, "commitBatch", 5000)
      )
    )
  }
}

package graft.transform

import graft.model.DbMapping
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * T2 — projection / column mapping (reference `support/SyncUtil.java:19-51`):
 * resolve the target→source column map and apply it as a pure Catalyst
 * projection (rename + exclude), so read-side column pruning reaches the
 * scan — strictly better than the reference, whose scan is always
 * `SELECT *` (`PhoenixEtlService.java:243-244`, write-side-only pruning).
 */
object ColumnMapper {

  /**
   * Resolve targetCol -> srcCol, mirroring `SyncUtil.getColumnsMap`:
   *  - `mapAll`: every source column minus `excludeColumns` (case-sloppy,
   *    `SyncUtil.java:42`), with `targetColumns` renames applied on top;
   *  - else: exactly `targetColumns` (empty value = same name).
   * Returned in deterministic (source-schema, then config) order.
   */
  def columnsMap(mapping: DbMapping, sourceColumns: Seq[String]): Seq[(String, String)] = {
    if (mapping.mapAll) {
      // targetColumns may rename a subset: srcCol -> targetCol overrides.
      // Lookup is case-insensitive — JDBC sources surface upper-cased
      // column names while configs are written lowercase (the reference
      // compares lowercased throughout, `SyncUtil.java:42`).
      val renames: Map[String, String] = mapping.targetColumns.collect {
        case (tgt, src) if src != null && src.nonEmpty => src.toLowerCase -> tgt
      }
      sourceColumns
        .filterNot(mapping.isExcluded)
        .map(src => renames.getOrElse(src.toLowerCase, src) -> src)
    } else {
      mapping.targetColumns.toSeq.sortBy(_._1).map { case (tgt, src) =>
        tgt -> (if (src == null || src.isEmpty) tgt else src)
      }
    }
  }

  /** Apply the mapping as a `select` of aliased columns. */
  def project(df: DataFrame, mapping: DbMapping): DataFrame = {
    val cols: Seq[Column] =
      columnsMap(mapping, df.columns.toSeq).map { case (tgt, src) => col(src).as(tgt) }
    df.select(cols: _*)
  }

  /** Same, but over a `data: Map[String,String]` column of flattened
    * SingleDml rows — used on the sync path where rows are schemaless maps. */
  def projectMapColumn(df: DataFrame, mapping: DbMapping, sourceColumns: Seq[String],
                       dataCol: String = "data"): DataFrame = {
    val cols = columnsMap(mapping, sourceColumns).map { case (tgt, src) =>
      element_at(col(dataCol), src).as(tgt)
    }
    df.select(df.columns.filterNot(_ == dataCol).map(col) ++ cols: _*)
  }
}

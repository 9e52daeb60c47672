package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * T3 — type coercion matrix (reference `support/SyncUtil.java:61-256`,
 * `setPStmt`): CDC values arrive as JSON-decoded strings and are coerced to
 * the *target* column's type. Re-expressed as Catalyst `cast`/`when`
 * expressions (codegen'd — no UDFs), with the reference's two non-standard
 * rules made explicit:
 *
 *  - **Zero dates** `"0000-00-00[ 00:00:00]"` are passed through raw by the
 *    reference (`SyncUtil.java:199-210,237-247`); Spark `cast` would yield
 *    null. We normalize them to null and document the divergence
 *    (SURVEY §2.2 "zero dates") — [[zeroDateToNull]] is applied before the
 *    temporal cast so the behavior is explicit, not accidental.
 *  - **String → binary** uses ISO-8859-1 bytes (`SyncUtil.java:168-180`);
 *    Spark's `cast(string as binary)` is UTF-8, so binary targets use an
 *    explicit `encode(col, 'ISO-8859-1')`.
 *  - **Boolean** accepts "0"/"1"/numbers/"true"/"false"
 *    (`SyncUtil.java:63-76`).
 */
object Coercion {

  /**
   * TRY-mode cast: malformed values coerce to null instead of aborting the
   * job (Spark 4 runs ANSI mode by default, where `cast('garbage' AS INT)`
   * throws). The reference is lenient the same way for temporals
   * (`Util.parseDate` → null, `SyncUtil.java:199-210`), and a CDC pipeline
   * must not die on one bad binlog value at 100 TB scale.
   */
  def tryCast(c: Column, target: DataType): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
    GraftColumnBridge.column(
      Cast(GraftColumnBridge.expression(c), target, None, EvalMode.TRY))
  }

  /** `"0000-00-00"`-prefixed date/datetime strings → null. */
  def zeroDateToNull(c: Column): Column =
    when(c.startsWith("0000-00-00"), lit(null).cast(StringType)).otherwise(c)

  /** Coerce a string-typed column to the target Spark type. */
  def coerce(c: Column, target: DataType): Column = target match {
    case BooleanType =>
      // "0"→false, other numerics→true, else standard boolean cast
      when(c.rlike("^-?[0-9]+$"), tryCast(c, LongType) =!= 0)
        .otherwise(tryCast(c, BooleanType))
    case DateType => tryCast(zeroDateToNull(c), DateType)
    case TimestampType => tryCast(zeroDateToNull(c), TimestampType)
    case BinaryType => encode(c, "ISO-8859-1")
    case dt => tryCast(c, dt)
  }

  /** Coerce all columns of `df` present in `target` to their target types. */
  def coerceTo(df: DataFrame, target: StructType): DataFrame = {
    val byName = target.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val cols = df.columns.map { name =>
      byName.get(name.toLowerCase) match {
        case Some(dt) => coerce(col(name), dt).as(name)
        case None => col(name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}

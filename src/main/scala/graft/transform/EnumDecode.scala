package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/**
 * E1 — enum decode (reference `MappingConfig.java:273-287`,
 * `checkColumnValue`): map a 1-based MySQL ENUM ordinal to its label
 * (`1→"Male"`); out-of-range or non-numeric values pass through unchanged
 * ("forgiving", SURVEY §2.2). Pure built-in expressions: `element_at` over a
 * literal array with a `coalesce` fallback — codegen'd, no UDF.
 */
object EnumDecode {

  /** Decode `c` (numeric-string or numeric ordinal) against `labels`.
    * Non-numeric input passes through raw (ANSI-safe TRY cast — the
    * reference would throw on `Integer.valueOf`, SURVEY §2.2; passing
    * through is the documented, more forgiving choice). */
  def decode(c: Column, labels: Seq[String]): Column = {
    val ord = Coercion.tryCast(c, IntegerType)
    val inRange = ord.isNotNull && ord >= 1 && ord <= labels.size
    when(inRange, element_at(typedLit(labels), ord))
      .otherwise(c.cast(StringType))
  }

  /** Apply all configured enum decodes to a DataFrame's columns. */
  def decodeAll(df: org.apache.spark.sql.DataFrame,
                enumColumns: Map[String, Seq[String]]): org.apache.spark.sql.DataFrame =
    enumColumns.foldLeft(df) { case (d, (colName, labels)) =>
      if (d.columns.contains(colName)) d.withColumn(colName, decode(col(colName), labels)) else d
    }
}

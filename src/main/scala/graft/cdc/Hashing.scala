package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic row-identity hashing for CDC merge.
  *
  * Semantics follow the reference pipeline [upstream `cdc.py`, SURVEY.md
  * §2.1 R3]: a `keyhash` over the configured key columns and a `nonkeyhash`
  * over the remaining columns, each `md5(concat_ws('|', canonical cols))`.
  *
  * Canonicalization is the cross-engine contract (SURVEY.md §7.4): every
  * column is rendered to a string the exact same way in Spark and in ANSI
  * SQL, so the oracle can reproduce the hash byte-for-byte:
  *   - DOUBLE/FLOAT → CAST(x AS DECIMAL(18,2)) → CAST AS STRING
  *     ("1.5" vs "1.50" drift between engines is eliminated; testdata money
  *     columns are all exactly 2dp — FIXTURES.md)
  *   - other types → CAST(x AS STRING)
  *   - NULL → a sentinel that cannot collide with real data, because
  *     concat_ws silently drops nulls (which would make ("a",null) and
  *     ("a") collide).
  *
  * At 100 TB, md5-as-hex-string is a poor join key (32 bytes, not
  * codegen-cheap); [[keyhash64]] is the `xxhash64` variant used by the
  * scale path — the md5 form is kept where the oracle checks it.
  */
object Hashing {
  val NullToken = "<NULL>"
  val Sep = "|"

  /** Render one column to its canonical cross-engine string. */
  def canonical(c: Column, dt: DataType, moneyScale: Int = 2): Column = {
    val s = dt match {
      case DoubleType | FloatType => c.cast(DecimalType(18, moneyScale)).cast(StringType)
      case _                      => c.cast(StringType)
    }
    coalesce(s, lit(NullToken))
  }

  /** The same canonicalization, as a DuckDB SQL fragment (for oracles). */
  def canonicalSql(col: String, isFloating: Boolean, moneyScale: Int = 2): String =
    if (isFloating)
      s"coalesce(CAST(CAST($col AS DECIMAL(18,$moneyScale)) AS VARCHAR), '$NullToken')"
    else s"coalesce(CAST($col AS VARCHAR), '$NullToken')"

  private def canonCols(df: DataFrame, cols: Seq[String]): Seq[Column] = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.map(n => canonical(df(n), types(n)))
  }

  /** md5 hash over the given columns (oracle-checkable). */
  def md5Hash(df: DataFrame, cols: Seq[String]): Column =
    md5(concat_ws(Sep, canonCols(df, cols): _*))

  /** 8-byte xxhash64 over the given columns — the 100 TB join key.
    * Codegen'd, fixed-width, shuffle-cheap; not oracle-checked (DuckDB has
    * no xxhash64). */
  def keyhash64(df: DataFrame, cols: Seq[String]): Column =
    xxhash64(canonCols(df, cols): _*)
}

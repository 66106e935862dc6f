package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md/FIXTURES.md).
  *
  * All queries read only `$sfDir/<table>.parquet` — never absolute sf paths —
  * so the driver can vary the scale factor (SURVEY.md §7.5 rule 7).
  */
object Tables {
  private def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame   = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")

  /** events.ts is TIMESTAMP(NANOS) on disk, which Spark's parquet reader
    * rejects. We read nanos as Long (legacy conf) and truncate to
    * microseconds — the same truncation DuckDB applies with
    * CAST(ts AS TIMESTAMP) — so both engines see identical µs values.
    * `div` is integer division: ts values are positive, so this truncates
    * toward zero exactly like DuckDB's ns→µs cast.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** DuckDB-side equivalent of [[events]]: a CTE normalizing ts to µs.
    * Splice at the head of every events oracle query. */
  val EventsCte: String =
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, " +
      "event_type, value, props FROM events)"
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle SQL the driver
  * hash-compares against. Keys are normative — SURVEY.md §2.2.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def checked(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def implOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

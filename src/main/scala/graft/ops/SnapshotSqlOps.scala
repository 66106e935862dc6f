package graft.ops

import graft.{Q, Tables}
import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, MetadataBuilder, StructField}

/** Oracle-checked queries over the snapshot-table SQL surface
  * (SURVEY.md §2.2 round 13): each builds a REAL snapshot table from a
  * deterministic slice of the fixture tables, drives the DDL/DML verbs
  * under test, and reads the result back through the pure-SQL TVFs —
  * so the r12 DDL machinery (column DEFAULTs, the recorded change
  * feed) is hash-checked end-to-end against DuckDB replaying the same
  * arithmetic from the raw parquet, not just spec-pinned.
  *
  * Exactness: all values snap to integer cents before any arithmetic;
  * feed/DEFAULT replay is integer-exact on both engines. Scale: the
  * fixtures are customer-grain (bounded by the dimension, not the
  * fact tables); the verbs exercised (metadata-only ADD COLUMN,
  * keyed merge, predicate delete) each carry the library's own cost
  * model — one manifest commit plus rewrites proportional to touched
  * files. Temp-dir tables are rebuilt per invocation (cheap at
  * dimension grain) so Verify and Bench stay self-contained.
  */
object SnapshotSqlOps {

  private def centsBase(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    Tables.customer(s, dir).select(
      col("c_custkey").as("k"),
      floor(col("c_acctbal") * 100 + lit(0.5)).cast(LongType).as("cents"),
      col("c_nationkey"))

  private val baseCte =
    """WITH base AS (
      |  SELECT c_custkey AS k,
      |    CAST(floor(c_acctbal * 100 + 5.0e-1) AS BIGINT) AS cents,
      |    c_nationkey
      |  FROM customer)""".stripMargin

  /** `ADD COLUMN ... DEFAULT` + `snapshot_of` time travel, end to end
    * in SQL: v1 commits two-thirds of the customers, v2 adds
    * `score INT DEFAULT 42` (metadata-only — no file is rewritten),
    * v3 appends the remaining third with explicit scores. The latest
    * read must fill the FROZEN default for every pre-add row and the
    * stored value for appended ones; the v2 time-travel read sees the
    * default for ALL rows. DuckDB replays the frozen literal. */
  val snapshotDefault: Q = Q.checked(
    "q_snapshot_default",
    s"""$baseCte,
      |v AS (
      |  SELECT 'latest' AS view, 42 AS score, cents
      |  FROM base WHERE k % 3 <> 0
      |  UNION ALL
      |  SELECT 'latest', CAST(c_nationkey % 5 AS INTEGER), cents
      |  FROM base WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT 'v2', 42, cents FROM base WHERE k % 3 <> 0)
      |SELECT view, CAST(score AS BIGINT) AS score,
      |  CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM v GROUP BY view, score ORDER BY view, score""".stripMargin
  ) { (s, dir) =>
    val tbl = java.nio.file.Files.createTempDirectory("graft_ddl")
      .toString + "/tbl"
    val base = centsBase(s, dir)
    SnapshotLog.commit(s, tbl,
      base.filter(col("k") % 3 =!= 0).select("k", "cents"))
    SnapshotLog.addColumns(s, tbl, Seq(StructField("score", IntegerType,
      nullable = true,
      new MetadataBuilder().putString("CURRENT_DEFAULT", "42").build())))
    SnapshotLog.append(s, tbl,
      base.filter(col("k") % 3 === 0).select(col("k"), col("cents"),
        (col("c_nationkey") % 5).cast(IntegerType).as("score")))
    s.sql(s"""SELECT view, CAST(score AS BIGINT) AS score,
      |  count(*) AS n_cust, CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM (
      |  SELECT 'latest' AS view, score, cents FROM snapshot_of('$tbl')
      |  UNION ALL
      |  SELECT 'v2' AS view, score, cents FROM snapshot_of('$tbl', 2)
      |) GROUP BY view, score ORDER BY view, score""".stripMargin)
  }

  /** The RECORDED change feed's arithmetic, oracle-checked: v1 commits
    * the even customers, v2 turns the feed on, v3 merges (every third
    * key: evens divisible by 12 delete, other matched evens update
    * cents+100, odds insert at cents+7), v4 deletes k ≡ 2 (mod 30).
    * `snapshot_change_feed` must show v1's full file list as inserts,
    * v3's exact pre/post images + tombstones + inserts, v4's deleted
    * rows — aggregated per (version, change type) with exact cent
    * sums, replayed row-for-row by DuckDB from the raw table. */
  val changefeedHistory: Q = Q.checked(
    "q_changefeed_history",
    s"""$baseCte,
      |v1 AS (SELECT k, cents FROM base WHERE k % 2 = 0),
      |feed AS (
      |  SELECT 1 AS v, 'insert' AS ct, cents FROM v1
      |  UNION ALL
      |  SELECT 3, 'delete', cents FROM v1 WHERE k % 12 = 0
      |  UNION ALL
      |  SELECT 3, 'update_preimage', cents FROM v1
      |  WHERE k % 3 = 0 AND k % 12 <> 0
      |  UNION ALL
      |  SELECT 3, 'update_postimage', cents + 100 FROM v1
      |  WHERE k % 3 = 0 AND k % 12 <> 0
      |  UNION ALL
      |  SELECT 3, 'insert', cents + 7 FROM base
      |  WHERE k % 2 = 1 AND k % 3 = 0
      |  UNION ALL
      |  SELECT 4, 'delete', cents FROM v1 WHERE k % 30 = 2)
      |SELECT CAST(v AS BIGINT) AS commit_version, ct AS change_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM feed GROUP BY v, ct ORDER BY commit_version, change_type""".stripMargin
  ) { (s, dir) =>
    val tbl = java.nio.file.Files.createTempDirectory("graft_cdf")
      .toString + "/tbl"
    val base = centsBase(s, dir)
    SnapshotLog.commit(s, tbl,
      base.filter(col("k") % 2 === 0).select("k", "cents"))         // v1
    SnapshotLog.setTableProperties(s, tbl,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))                // v2
    // one merge carrying all three actions, built from the same base
    val changes = base.filter(col("k") % 3 === 0).select(
      col("k"),
      when(col("k") % 2 === 1, col("cents") + 7)
        .when(col("k") % 12 === 0, col("cents"))
        .otherwise(col("cents") + 100).as("cents"),
      (col("k") % 12 === 0).as("is_del"))
    SnapshotLog.merge(s, tbl, changes, keys = Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))   // v3
    SnapshotLog.deleteWhere(s, tbl, col("k") % 30 === 2)            // v4
    s.sql(s"""SELECT _commit_version AS commit_version,
      |  _change_type AS change_type, count(*) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM snapshot_change_feed('$tbl', 1, 4)
      |GROUP BY _commit_version, _change_type
      |ORDER BY commit_version, change_type""".stripMargin)
  }

  val all: Seq[Q] = Seq(snapshotDefault, changefeedHistory)
}

package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SQL DML over the snapshot log (round 8): pure-SQL clients drive
  * DELETE / UPDATE / MERGE / OPTIMIZE through the EXECUTE-style table
  * functions, the full round trip runs through `spark.sql`, library
  * guards surface as SQL-statement errors, and every statement commits
  * exactly one version. */
class SnapshotSqlDmlSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("sql-dml").toString

  test("full DML round trip through spark.sql") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("v")))

    // DELETE
    val del = spark.sql(
      s"SELECT * FROM snapshot_delete_where('$dir', 'k >= 90')").collect()(0)
    assert(del.getString(0) === "delete_where" && del.getLong(2) === 2L)
    assert(spark.sql(s"SELECT count(*) FROM snapshot_of('$dir')")
      .as[Long].head() === 90L)

    // UPDATE with an expression referencing the row
    val upd = spark.sql(s"SELECT * FROM snapshot_update_where('$dir', " +
      "'k < 10', 'v', 'v + 1000')").collect()(0)
    assert(upd.getLong(2) === 3L)
    assert(spark.sql(
      s"SELECT v FROM snapshot_of('$dir') WHERE k = 5").as[Long].head()
      === 5L * 2 + 1000)
    assert(spark.sql(
      s"SELECT v FROM snapshot_of('$dir') WHERE k = 50").as[Long].head()
      === 100L)

    // MERGE: upsert + insert + tombstone delete through a source query
    Seq((5L, -1L, false), (200L, 7L, false), (6L, 0L, true))
      .toDF("k", "v", "is_del").createOrReplaceTempView("dml_changes")
    val mrg = spark.sql(s"SELECT * FROM snapshot_merge_into('$dir', " +
      "'SELECT * FROM dml_changes', 'k', 'is_del', 'is_del')").collect()(0)
    assert(mrg.getLong(2) === 4L)
    val now = spark.sql(s"SELECT * FROM snapshot_of('$dir')")
    assert(now.filter(col("k") === 5L).select("v").as[Long].head() === -1L)
    assert(now.filter(col("k") === 200L).count() === 1)
    assert(now.filter(col("k") === 6L).count() === 0)
    assert(now.count() === 90L) // 90 - 1 delete + 1 insert

    // OPTIMIZE clustered on k; table content unchanged, history intact
    val opt = spark.sql(
      s"SELECT * FROM snapshot_optimize('$dir', 1, 'k')").collect()(0)
    assert(opt.getString(0) === "optimize" && opt.getLong(2) === 5L)
    assert(spark.sql(s"SELECT count(*) FROM snapshot_of('$dir')")
      .as[Long].head() === 90L)
    assert(spark.sql(s"SELECT count(*) FROM snapshot_history('$dir')")
      .as[Long].head() === 5L)
    // time travel still sees the pre-DML state
    assert(spark.sql(s"SELECT count(*) FROM snapshot_of('$dir', 1)")
      .as[Long].head() === 100L)
  }

  test("subscription TVFs: the poll/ack cursor loop and " +
      "snapshot_replicate drive a replica from pure SQL; EXPLAIN " +
      "never moves state") {
    val src = freshDir()
    SnapshotLog.commit(spark, src,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, src,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    val cursor = Files.createTempDirectory("sqlcur").toString + "/cur"
    // first poll: the whole table as inserts, _poll_version = latest
    val p1 = spark.sql(
      s"SELECT * FROM snapshot_poll_changes('$src', '$cursor')")
    assert(p1.columns.toSeq ===
      Seq("k", "v", "_change_type", "_poll_version"))
    assert(p1.count() === 2)
    val ackV = p1.select("_poll_version").distinct().as[Long].head()
    // EXPLAIN of the ack must not move the cursor...
    spark.sql(s"EXPLAIN SELECT * FROM snapshot_ack_changes('$src', " +
      s"'$cursor', $ackV)").collect()
    assert(spark.sql(s"SELECT count(*) FROM snapshot_poll_changes(" +
      s"'$src', '$cursor')").as[Long].head() === 2,
      "EXPLAIN advanced the cursor")
    // ...executing it does
    val ack = spark.sql(s"SELECT * FROM snapshot_ack_changes('$src', " +
      s"'$cursor', $ackV)").collect()(0)
    assert(ack.getString(0) === "ack_changes" && ack.getLong(2) === ackV)
    // caught up: empty relation, same shape as a live poll
    val p2 = spark.sql(
      s"SELECT * FROM snapshot_poll_changes('$src', '$cursor', 'k')")
    assert(p2.count() === 0 &&
      p2.columns.toSeq === p1.columns.toSeq)
    // the source moves on; the keyed poll serves the delta
    SnapshotLog.append(spark, src, Seq((3L, "c")).toDF("k", "v"))
    val p3 = spark.sql(
      s"SELECT * FROM snapshot_poll_changes('$src', '$cursor', 'k')")
    assert(p3.select("k", "_change_type").as[(Long, String)]
      .collect().toSeq === Seq((3L, "insert")))
    // snapshot_replicate: a replica bootstraps and follows from SQL
    val dst = freshDir() + "/replica"
    val ckpt = Files.createTempDirectory("sqlrepl").toString
    def srcRows() = SnapshotLog.read(spark, src).orderBy("k")
      .as[(Long, String)].collect().toSeq
    def dstRows() = SnapshotLog.read(spark, dst).orderBy("k")
      .as[(Long, String)].collect().toSeq
    val rep = spark.sql(s"SELECT * FROM snapshot_replicate('$src', " +
      s"'$dst', 'k', '$ckpt')").collect()(0)
    assert(rep.getString(0) === "replicate")
    assert(dstRows() === srcRows())
    // a second drain (same checkpoint) converges after a source rewrite
    SnapshotLog.updateWhere(spark, src, col("k") === 1L,
      Map("v" -> lit("A")))
    spark.sql(s"SELECT * FROM snapshot_replicate('$src', '$dst', 'k', " +
      s"'$ckpt')").collect()
    assert(dstRows() === srcRows())
  }

  test("snapshot_replace_where TVF: atomic region reload from SQL, " +
      "outside-region guard, EXPLAIN never commits") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 100).select((col("id") % 10).as("grp"),
        col("id").as("k")))
    val before = SnapshotLog.versions(spark, dir).last
    spark.sql(s"SELECT * FROM snapshot_replace_where('$dir', " +
      "'SELECT 3L AS grp, id + 1000 AS k FROM range(5)', " +
      "'grp = 3')").collect()
    assert(SnapshotLog.versions(spark, dir).last === before + 1,
      "replace_where must commit exactly one version")
    val grp3 = SnapshotLog.read(spark, dir).filter(col("grp") === 3)
    assert(grp3.count() === 5)
    assert(grp3.select(min("k")).as[Long].head() === 1000L)
    assert(SnapshotLog.read(spark, dir).count() === 95L)
    // outside-region rows refuse the statement
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_replace_where('$dir', " +
        "'SELECT 4L AS grp, 1L AS k', 'grp = 3')").collect()
    }
    assert(e.getMessage.contains("do NOT match"))
    // EXPLAIN resolves but never runs the verb
    val v = SnapshotLog.versions(spark, dir).last
    spark.sql(s"EXPLAIN SELECT * FROM snapshot_replace_where('$dir', " +
      "'SELECT 3L AS grp, 1L AS k', 'grp = 3')").collect()
    assert(SnapshotLog.versions(spark, dir).last === v,
      "EXPLAIN must not commit")
  }

  test("each DML statement commits exactly one version (no re-execution)") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 10).select(col("id").as("k"), col("id").as("v")))
    // updateWhere is NOT idempotent (v = v + 1): a double-run would show.
    // show() is the hard case — it derives a NEW Dataset over the same
    // logical statement, so the verb guard must live on the shared
    // logical node, not the physical exec
    val r = spark.sql(s"SELECT * FROM snapshot_update_where('$dir', " +
      "'true', 'v', 'v + 1')")
    r.show()
    r.collect(); r.collect() // extra actions must not re-run the verb
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L))
    assert(SnapshotLog.read(spark, dir).agg(sum("v")).as[Long].head()
      === (0 until 10).map(_ + 1).sum)
  }

  test("EXPLAIN and un-executed DML statements never commit (round 9)") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 10).select(col("id").as("k"), col("id").as("v")))
    // building the DataFrame analyzes (and the r8 shape COMMITTED here);
    // the lazy command node must not
    val stmt = spark.sql(s"SELECT * FROM snapshot_update_where('$dir', " +
      "'true', 'v', 'v + 1')")
    assert(SnapshotLog.versions(spark, dir) === Seq(1L),
      "analysis alone committed a version")
    // EXPLAIN resolves AND plans — still no commit
    stmt.explain()
    spark.sql(s"EXPLAIN SELECT * FROM snapshot_delete_where('$dir', 'k = 0')")
      .collect()
    assert(SnapshotLog.versions(spark, dir) === Seq(1L),
      "EXPLAIN committed a version")
    // execution commits exactly once and reports it
    val row = stmt.collect().head
    assert(row.getString(0) === "update_where" && row.getLong(2) === 2L)
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L))
    import spark.implicits._
    assert(SnapshotLog.read(spark, dir).agg(sum("v")).as[Long].head()
      === (0 until 10).map(_ + 1).sum)
  }

  test("library guards surface as SQL errors") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 10).select(col("id").as("k"), col("id").as("v")))

    // duplicate merge keys
    Seq((1L, 10L), (1L, 20L)).toDF("k", "v")
      .createOrReplaceTempView("dup_changes")
    val dup = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_merge_into('$dir', " +
        "'SELECT * FROM dup_changes', 'k')").collect()
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)

    // NULL merge key
    Seq((None: Option[Long], 10L)).toDF("k", "v")
      .createOrReplaceTempView("null_changes")
    val nul = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_merge_into('$dir', " +
        "'SELECT * FROM null_changes', 'k')").collect()
    }
    assert(nul.getMessage.contains("NULL key"), nul.getMessage)

    // unknown SET column
    val unk = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_update_where('$dir', " +
        "'k = 1', 'nope', '0')").collect()
    }
    assert(unk.getMessage.contains("unknown column"), unk.getMessage)

    // nothing committed by the failed statements
    assert(SnapshotLog.versions(spark, dir).size === 1)

    // a MoR delete COMPOSES with SQL DML (r8): the dead row neither
    // updates nor resurrects
    SnapshotLog.deleteWhereMoR(spark, dir, col("k") === 1L)
    spark.sql(s"SELECT * FROM snapshot_update_where('$dir', " +
      "'true', 'v', 'v + 100')").collect()
    val after = spark.sql(s"SELECT * FROM snapshot_of('$dir')")
    assert(after.filter(col("k") === 1L).count() === 0)
    assert(after.filter(col("k") === 2L).select("v").as[Long].head() === 102L)
    assert(after.count() === 9)
  }

  test("snapshot_where: SQL conjunctive pruned reads, typed bounds") {
    val dir = freshDir()
    val df = spark.range(0, 365).select(
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")).as("d"), (col("id") % 3).as("g"),
      col("id").as("v")).repartitionByRange(6, col("d"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("d", "g"))
    val got = spark.sql(s"SELECT * FROM snapshot_where('$dir', " +
      "'d', '2024-03-01', '2024-03-31', 'g', '1', '1')")
    val expect = df.filter(col("d").between("2024-03-01", "2024-03-31") &&
      col("g") === 1L)
    assert(got.collect().map(_.toSeq).toSet ===
      expect.collect().map(_.toSeq).toSet)
    assert(got.count() === expect.count() && got.count() > 0)
    // bad arity is loud
    intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_where('$dir', 'd', '2024-03-01')")
    }
  }

  test("SQL DML preserves partition metadata like the Scala verbs") {
    val dir = freshDir()
    val df = spark.range(0, 90).select(
      element_at(array(lit("a"), lit("b"), lit("c")),
        (col("id") % 3 + 1).cast("int")).as("g"), col("id").as("k"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("g"))
    spark.sql(s"SELECT * FROM snapshot_delete_where('$dir', 'k = 0')")
      .collect()
    val v = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v) === Seq("g"))
    val (got, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("g" -> "a"))
    assert(scanned < total)
    assert(got.filter(col("k") === 0L).count() === 0)
  }
}

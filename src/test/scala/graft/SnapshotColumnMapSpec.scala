package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** METADATA-ONLY `RENAME COLUMN` / `DROP COLUMN` (round 12): the
  * `#schema=` header names columns logically, `#colmap=` maps every
  * renamed column to its immutable PHYSICAL storage name, `#dropped=`
  * burns dropped columns' storage names forever. Zero data moves; time
  * travel reads each version under its own names; every read path
  * (library scan, vectorized catalog scan, streaming feed, CDC diff)
  * and every write path (library verbs, v2 streaming encode) maps
  * through the same two headers; re-using a storage name refuses
  * loudly — the one way this design could silently resurrect bytes. */
class SnapshotColumnMapSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("colmap").toString + "/tbl"

  test("rename is metadata-only: data intact under the new name, old " +
      "versions time-travel under theirs, zero files written") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 10).select(col("id").as("k"), (col("id") * 2).as("v")))
    val filesBefore = SnapshotLog.referencedFiles(spark, dir)
    SnapshotLog.renameColumn(spark, dir, "v", "amount")
    assert(SnapshotLog.referencedFiles(spark, dir) === filesBefore,
      "rename must not write or drop a single data file")
    val now = SnapshotLog.read(spark, dir)
    assert(now.columns.toSeq === Seq("k", "amount"))
    assert(now.select(sum("amount")).as[Long].head() === 90L)
    // v1 still reads under its own (old) name
    val v1 = SnapshotLog.read(spark, dir, Some(1L))
    assert(v1.columns.toSeq === Seq("k", "v"))
    assert(v1.select(sum("v")).as[Long].head() === 90L)
  }

  test("chained renames time-travel correctly at every hop; writes " +
      "after a rename store the ORIGINAL physical name") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "x")).toDF("k", "a"))
    SnapshotLog.renameColumn(spark, dir, "a", "b") // v2
    SnapshotLog.renameColumn(spark, dir, "b", "c") // v3
    SnapshotLog.append(spark, dir, Seq((2L, "y")).toDF("k", "c")) // v4
    assert(SnapshotLog.read(spark, dir).orderBy("k")
      .as[(Long, String)].collect().toSeq === Seq(1L -> "x", 2L -> "y"))
    // the middle hop reads its own name with full data
    assert(SnapshotLog.read(spark, dir, Some(2L)).columns.toSeq
      === Seq("k", "b"))
    assert(SnapshotLog.read(spark, dir, Some(2L)).select("b")
      .as[String].head() === "x")
    // the post-rename append's FILE carries the physical name 'a'
    val newFile = SnapshotLog.referencedFiles(spark, dir)
      .diff(SnapshotLog.read(spark, dir, Some(1L)).inputFiles
        .map(p => new org.apache.hadoop.fs.Path(p).toString).toSet)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(newFile.head),
      org.apache.parquet.format.converter.ParquetMetadataConverter
        .NO_FILTER).getFileMetaData.getSchema
    assert(footer.containsField("a") && !footer.containsField("c"),
      s"post-rename writes must store the physical name; got $footer")
  }

  test("zone-map stats follow the rename: planning-time pruning keeps " +
      "working under the new name") {
    val dir = freshDir()
    SnapshotLog.commitWithStats(spark, dir,
      spark.range(0, 1000).select(col("id").as("k"))
        .repartitionByRange(4, col("k"))
        .sortWithinPartitions("k"), Seq("k"))
    SnapshotLog.renameColumn(spark, dir, "k", "key")
    val (rows, scanned, total) =
      SnapshotLog.readBetweenValues(spark, dir, "key", 0L, 99L)
    assert(rows.count() === 100L)
    assert(scanned < total,
      s"stats must survive the rename and still prune ($scanned/$total)")
    // a stat-covered write after the rename keeps pruning too
    SnapshotLog.deleteWhere(spark, dir, col("key") === 500L)
    val (rows2, s2, t2) =
      SnapshotLog.readBetweenValues(spark, dir, "key", 0L, 99L)
    assert(rows2.count() === 100L && s2 < t2)
  }

  test("drop hides the column; old versions still show it; its storage " +
      "name is burned (re-adding refuses loudly)") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "secret", 5L)).toDF("k", "pii", "v"))
    SnapshotLog.dropColumn(spark, dir, "pii") // v2
    assert(SnapshotLog.read(spark, dir).columns.toSeq === Seq("k", "v"))
    assert(SnapshotLog.read(spark, dir, Some(1L)).select("pii")
      .as[String].head() === "secret", "time travel must keep the column")
    // the storage name is burned: metadata re-add refuses
    val e = intercept[Exception] {
      SnapshotLog.addColumns(spark, dir,
        Seq(org.apache.spark.sql.types.StructField("pii",
          org.apache.spark.sql.types.StringType)))
    }
    assert(e.getMessage.contains("reserved"),
      s"expected the burned-name refusal, got: ${e.getMessage}")
    // ... and so does a widening data write (old bytes would resurrect)
    val w = intercept[Exception] {
      SnapshotLog.append(spark, dir,
        Seq((9L, "nope", 1L)).toDF("k", "pii", "v"))
    }
    assert(w.getMessage.contains("reserved"),
      s"expected the burned-name write refusal, got: ${w.getMessage}")
    // a FRESH name is fine
    SnapshotLog.append(spark, dir, Seq((2L, 6L, "eu")).toDF("k", "v", "region"))
    assert(SnapshotLog.read(spark, dir).columns.toSeq
      === Seq("k", "v", "region"))
  }

  test("guards: partition / CHECK-referenced / last / colliding columns " +
      "refuse loudly") {
    val dir = freshDir()
    SnapshotLog.commitPartitioned(spark, dir,
      Seq(("eu", 1L, 2L)).toDF("region", "k", "v"), Seq("region"))
    SnapshotLog.addCheck(spark, dir, "pos", "v > 0")
    def msg(f: => Any): String =
      intercept[Exception](f).getMessage
    assert(msg(SnapshotLog.renameColumn(spark, dir, "region", "r"))
      .contains("partition column"))
    assert(msg(SnapshotLog.dropColumn(spark, dir, "region"))
      .contains("partition column"))
    assert(msg(SnapshotLog.renameColumn(spark, dir, "v", "w"))
      .contains("CHECK"))
    assert(msg(SnapshotLog.dropColumn(spark, dir, "v"))
      .contains("CHECK"))
    assert(msg(SnapshotLog.renameColumn(spark, dir, "k", "v"))
      .contains("already exists"))
    assert(msg(SnapshotLog.renameColumn(spark, dir, "missing", "m"))
      .contains("no column"))
    // dropping the constraint in the SAME statement releases the column
    SnapshotLog.alterCommit(spark, dir, Seq.empty, Seq.empty,
      dropChecks = Seq("pos"), renameCols = Seq("v" -> "val"))
    assert(SnapshotLog.read(spark, dir).columns.contains("val"))
    assert(SnapshotLog.checksOf(spark, dir,
      SnapshotLog.versions(spark, dir).last).isEmpty)
  }

  test("every verb keeps the mapping alive: merge / delete / optimize / " +
      "update / restore carry #colmap across commits") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("v")))
    SnapshotLog.renameColumn(spark, dir, "v", "amount") // v2
    SnapshotLog.merge(spark, dir,
      Seq((5L, 1000L), (200L, 7L)).toDF("k", "amount"), Seq("k")) // v3
    SnapshotLog.deleteWhere(spark, dir, col("k") === 9L) // v4
    SnapshotLog.updateWhere(spark, dir, col("k") === 3L,
      Map("amount" -> lit(-3L))) // v5
    SnapshotLog.optimize(spark, dir, targetFiles = 1) // maybe v6
    val now = SnapshotLog.read(spark, dir)
    assert(now.columns.toSeq === Seq("k", "amount"))
    assert(now.filter(col("k") === 5L).select("amount")
      .as[Long].head() === 1000L)
    assert(now.filter(col("k") === 3L).select("amount")
      .as[Long].head() === -3L)
    assert(now.filter(col("k") === 9L).count() === 0L)
    assert(now.count() === 100L) // 100 - 1 delete + 1 insert
    // restore across the rename rolls the NAME back with the state
    SnapshotLog.restore(spark, dir, 1L)
    assert(SnapshotLog.read(spark, dir).columns.toSeq === Seq("k", "v"))
    assert(SnapshotLog.read(spark, dir).count() === 100L)
  }

  test("CDC diff after a rename labels changes under the new name") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, 10L)).toDF("k", "v"))
    SnapshotLog.renameColumn(spark, dir, "v", "amount") // v2
    SnapshotLog.append(spark, dir, Seq((2L, 20L)).toDF("k", "amount")) // v3
    val feed = SnapshotLog.changesBetween(spark, dir, 2L, 3L)
    assert(feed.columns.contains("amount"))
    assert(feed.filter(col("_change_type") === "insert").select("amount")
      .as[Long].collect().toSeq === Seq(20L))
    // a feed SPANNING the rename translates the old side through the
    // shared physical name — values must survive, never null out
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L) // v4
    val span = SnapshotLog.changesBetween(spark, dir, 1L, 4L)
    val del = span.filter(col("_change_type") === "delete")
    assert(del.select("amount").as[Long].collect().toSeq === Seq(10L),
      "the renamed column's pre-image value must ride the spanning feed")
    assert(span.filter(col("_change_type") === "insert").select("amount")
      .as[Long].collect().toSeq === Seq(20L))
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN; reads (vectorized " +
      "catalog scan + streaming feed) and DML all map through") {
    val root = Files.createTempDirectory("colmapcat").toString
    spark.conf.set("spark.sql.catalog.gcm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcm.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcm.ns")
    spark.sql("CREATE TABLE gcm.ns.t (k BIGINT, v BIGINT, junk STRING)")
    spark.sql("INSERT INTO gcm.ns.t SELECT id, id * 2, concat('j', id) " +
      "FROM range(50)")
    spark.sql("ALTER TABLE gcm.ns.t RENAME COLUMN v TO amount")
    spark.sql("ALTER TABLE gcm.ns.t DROP COLUMN junk")
    // vectorized batch read (SnapshotBatchRead substitution) maps names
    assert(spark.table("gcm.ns.t").columns.toSeq === Seq("k", "amount"))
    assert(spark.sql("SELECT sum(amount) FROM gcm.ns.t")
      .as[Long].head() === 2450L)
    // DML under the new name
    spark.sql("UPDATE gcm.ns.t SET amount = 0 WHERE k = 1")
    assert(spark.sql("SELECT amount FROM gcm.ns.t WHERE k = 1")
      .as[Long].head() === 0L)
    spark.sql("""
      MERGE INTO gcm.ns.t t
      USING (SELECT * FROM VALUES (2L, 99L), (100L, 1L) AS s(k, amount)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    assert(spark.sql("SELECT amount FROM gcm.ns.t WHERE k IN (2, 100) " +
      "ORDER BY k").as[Long].collect().toSeq === Seq(99L, 1L))
    // INSERT after the rename/drop writes physical names; reads map back
    spark.sql("INSERT INTO gcm.ns.t VALUES (200, 5)")
    assert(spark.sql("SELECT amount FROM gcm.ns.t WHERE k = 200")
      .as[Long].head() === 5L)
    // the streaming feed ships physical names to its executor readers
    val q = spark.readStream.format("graft.sources.SnapshotStreamSource")
      .option("path", s"$root/ns/t").option("startingVersion", "latest")
      .load()
      .writeStream.format("memory").queryName("colmap_feed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO gcm.ns.t VALUES (300, 7)")
      q.processAllAvailable()
      assert(spark.table("colmap_feed").select("amount")
        .as[Long].collect().toSeq === Seq(7L),
        "the streaming feed must decode the renamed column's values")
    } finally q.stop()
    // time travel through SQL still shows the original names
    assert(spark.sql("SELECT * FROM gcm.ns.t VERSION AS OF 2").columns
      .toSeq === Seq("k", "v", "junk"))
  }

  test("v2 streaming write (toTable) maps the epoch files to physical " +
      "names on a renamed table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("colmapsink").toString
    spark.conf.set("spark.sql.catalog.gcs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcs.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.ns")
    spark.sql("CREATE TABLE gcs.ns.s (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gcs.ns.s VALUES (0, 0)")
    spark.sql("ALTER TABLE gcs.ns.s RENAME COLUMN v TO amount")
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("k").selectExpr("k", "k * 2 AS amount")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("colmapsink-ckpt").toString)
      .toTable("gcs.ns.s")
    try { ms.addData(1L, 2L); q.processAllAvailable() } finally q.stop()
    assert(spark.sql("SELECT amount FROM gcs.ns.s ORDER BY k")
      .as[Long].collect().toSeq === Seq(0L, 2L, 4L),
      "executor-written epochs must store physical names reads map back")
  }
}

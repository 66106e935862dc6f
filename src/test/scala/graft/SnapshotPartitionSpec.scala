package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partition-aware manifests (round 8): a SnapshotLog table declares
  * partition columns at creation, writers land partition-pure files
  * under hive dirs recording each file's tuple in the manifest, and
  * [[SnapshotLog.readPartition]] prunes at MANIFEST-PARSE time — the
  * first-order prune at 100 TB, before zone maps and before any file
  * opens. Every verb must preserve the declaration and the tuples. */
class SnapshotPartitionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("part-log").toString

  /** A 3-region, 400-row table partitioned by region. */
  private def mkTable(dir: String): org.apache.spark.sql.DataFrame = {
    val df = spark.range(0, 400).select(
      element_at(array(lit("eu"), lit("us"), lit("ap")),
        (col("id") % 3 + 1).cast("int")).as("region"),
      col("id").as("k"), (col("id") * 7).as("v"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("region"))
    df
  }

  test("commitPartitioned: read returns typed partition columns, full data") {
    val dir = freshDir()
    val df = mkTable(dir)
    val got = SnapshotLog.read(spark, dir)
    assert(got.schema.fieldNames.toSeq === Seq("region", "k", "v"))
    assert(got.schema("region").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(got.collect().map(_.toSeq).toSet ===
      df.collect().map(_.toSeq).toSet)
    assert(SnapshotLog.partitionColsOf(spark, dir, 1L) === Seq("region"))
    // every file carries a recorded tuple
    val parts = SnapshotLog.filePartsOf(spark, dir, 1L)
    val files = SnapshotLog.versions(spark, dir)
    assert(parts.nonEmpty)
    assert(parts.values.forall(_.keySet === Set("region")))
  }

  test("readPartition prunes at manifest-parse time and is exact") {
    val dir = freshDir()
    val df = mkTable(dir)
    val (got, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    assert(scanned < total, s"partition prune scanned $scanned/$total")
    // kept files are EXACTLY the eu files (tuples are exact, not ranges)
    val parts = SnapshotLog.filePartsOf(spark, dir, 1L)
    val euFiles = parts.count(_._2("region") == "eu")
    assert(scanned === euFiles)
    assert(got.collect().map(_.toSeq).toSet ===
      df.filter(col("region") === "eu").collect().map(_.toSeq).toSet)
    // absent partition: zero files planned, empty frame, correct schema
    val (none, s2, _) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "mars"))
    assert(s2 === 0 && none.count() === 0)
    assert(none.schema.fieldNames.toSeq === Seq("region", "k", "v"))
  }

  test("probing a non-partition column is loud") {
    val dir = freshDir()
    mkTable(dir)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readPartition(spark, dir, Map("k" -> 5L))
    }
    assert(e.getMessage.contains("not partitioned by"))
  }

  test("merge preserves partitioning: rewrites stay partition-pure, prune survives") {
    val dir = freshDir()
    mkTable(dir)
    val changes = Seq(
      ("eu", 0L, 999L, false),   // update (id 0 is eu: 0%3=0 -> index 1 eu)
      ("ap", 9999L, 1L, false),  // insert into ap
      ("us", 1L, -1L, true))     // delete (id 1 -> us)
      .toDF("region", "k", "v", "is_del")
    SnapshotLog.merge(spark, dir, changes, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    val v2 = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v2) === Seq("region"))
    // every file of v2 still has a recorded tuple
    val parts = SnapshotLog.filePartsOf(spark, dir, v2)
    val files2 = SnapshotLog.read(spark, dir).inputFiles.length
    assert(parts.size >= files2 - 1) // all manifest files recorded
    val (eu, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    assert(scanned < total)
    assert(eu.filter(col("k") === 0L).select("v").as[Long].head() === 999L)
    val (ap, _, _) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "ap"))
    assert(ap.filter(col("k") === 9999L).count() === 1)
    assert(SnapshotLog.read(spark, dir)
      .filter(col("k") === 1L).count() === 0)
  }

  test("deleteWhere and updateWhere preserve partition metadata") {
    val dir = freshDir()
    mkTable(dir)
    SnapshotLog.deleteWhere(spark, dir, col("k") === 3L)
    var v = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v) === Seq("region"))
    assert(SnapshotLog.filePartsOf(spark, dir, v).nonEmpty)
    SnapshotLog.updateWhere(spark, dir, col("k") === 6L,
      Map("v" -> lit(-1L)))
    v = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v) === Seq("region"))
    val (eu, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    assert(scanned < total)
    assert(eu.filter(col("k") === 6L).select("v").as[Long].head() === -1L)
    assert(eu.filter(col("k") === 3L).count() === 0)
  }

  test("updateWhere can MOVE a row across partitions (rewrite re-partitions)") {
    val dir = freshDir()
    val df = mkTable(dir)
    SnapshotLog.updateWhere(spark, dir, col("k") === 0L,
      Map("region" -> lit("ap")))
    val (ap, _, _) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "ap"))
    assert(ap.filter(col("k") === 0L).count() === 1)
    val (eu, _, _) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    assert(eu.filter(col("k") === 0L).count() === 0,
      "moved row still visible under its OLD partition")
    assert(SnapshotLog.read(spark, dir).count() === df.count())
  }

  test("optimize compacts within the partition layout; prune intact after") {
    val dir = freshDir()
    val df = mkTable(dir)
    // force small-file sprawl inside each partition, then compact
    SnapshotLog.commitPartitioned(spark, dir,
      df.repartition(8), Seq("region"))
    val before = SnapshotLog.read(spark, dir).inputFiles.length
    SnapshotLog.optimize(spark, dir, targetFiles = 1)
    val v = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v) === Seq("region"))
    val after = SnapshotLog.read(spark, dir).inputFiles.length
    assert(after < before, s"compaction did not shrink: $before -> $after")
    // the ~1-file-per-tuple law: a partitioned compaction must never fan
    // out to targetFiles × |tuples| (the r8 shape netted MORE small
    // files than it removed)
    val tuples = df.select("region").distinct().count()
    assert(after <= tuples, s"fan-out: $after files for $tuples tuples")
    val (eu, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    assert(scanned < total)
    assert(eu.count() ===
      df.filter(col("region") === "eu").count())
  }

  test("partitioned optimize with targetFiles > 1 still lands ~1 file per tuple") {
    val dir = freshDir()
    val df = mkTable(dir)
    SnapshotLog.commitPartitioned(spark, dir, df.repartition(8), Seq("region"))
    // pre-fix: repartition(4) × |tuples| partition dirs → up to 4 files
    // in EVERY tuple — compaction that increases the small-file count
    SnapshotLog.optimize(spark, dir, targetFiles = 4)
    val tuples = df.select("region").distinct().count()
    val after = SnapshotLog.read(spark, dir).inputFiles.length
    assert(after <= tuples, s"fan-out: $after files for $tuples tuples")
    // clustered variant: partition columns lead the range partitioner,
    // so a task straddles at most a tuple boundary
    val dir2 = freshDir()
    SnapshotLog.commitPartitioned(spark, dir2, df.repartition(8), Seq("region"))
    SnapshotLog.optimize(spark, dir2, targetFiles = 3, clusterBy = Seq("k"))
    val after2 = SnapshotLog.read(spark, dir2).inputFiles.length
    assert(after2 <= tuples + 3,
      s"clustered fan-out: $after2 files for $tuples tuples")
    assert(SnapshotLog.read(spark, dir2).count() === df.count())
  }

  test("commitBatch appends inherit the partition layout") {
    val dir = freshDir()
    mkTable(dir)
    SnapshotLog.commitBatch(spark, dir,
      Seq(("eu", 5000L, 1L)).toDF("region", "k", "v"), 0L)
    val v = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v) === Seq("region"))
    val (eu, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    assert(scanned < total)
    assert(eu.filter(col("k") === 5000L).count() === 1)
  }

  test("shallow clone and restore carry partition metadata") {
    val src = freshDir(); val dst = freshDir()
    mkTable(src)
    SnapshotLog.shallowClone(spark, src, dst)
    assert(SnapshotLog.partitionColsOf(spark, dst, 1L) === Seq("region"))
    val (eu, scanned, total) =
      SnapshotLog.readPartition(spark, dst, Map("region" -> "eu"))
    assert(scanned < total && eu.count() > 0)
    // materialize keeps the layout, rewriting borrowed files partitioned
    SnapshotLog.materialize(spark, dst)
    val v = SnapshotLog.versions(spark, dst).last
    assert(SnapshotLog.partitionColsOf(spark, dst, v) === Seq("region"))
    val (eu2, s2, t2) =
      SnapshotLog.readPartition(spark, dst, Map("region" -> "eu"))
    assert(s2 < t2 && eu2.count() === eu.count())
    // restore on the source republishes the partition lines
    SnapshotLog.deleteWhere(spark, src, col("k") === 0L)
    SnapshotLog.restore(spark, src, 1L)
    val rv = SnapshotLog.versions(spark, src).last
    assert(SnapshotLog.partitionColsOf(spark, src, rv) === Seq("region"))
    assert(SnapshotLog.readPartition(spark, src,
      Map("region" -> "eu"))._1.filter(col("k") === 0L).count() === 1)
  }

  test("a plain commit replaces the layout; old versions keep theirs") {
    val dir = freshDir()
    val df = mkTable(dir)
    SnapshotLog.commit(spark, dir, df) // unpartitioned replace
    val v2 = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v2).isEmpty)
    assert(SnapshotLog.read(spark, dir).count() === 400)
    // time travel to v1 still partition-prunes
    val (eu, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"),
        version = Some(1L))
    assert(scanned < total && eu.count() > 0)
    // probing v2 is loud — it is not partitioned
    intercept[IllegalArgumentException] {
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    }
  }

  test("vacuum reclaims nested partitioned data files") {
    val dir = freshDir()
    val df = mkTable(dir)
    SnapshotLog.commitPartitioned(spark, dir, df.limit(30), Seq("region"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dropped, removed) =
      SnapshotLog.vacuum(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    assert(dropped === 1 && removed > 0,
      s"vacuum dropped $dropped versions, removed $removed files")
    // survivor still reads fully
    assert(SnapshotLog.read(spark, dir).count() === 30)
    intercept[IllegalArgumentException] {
      SnapshotLog.read(spark, dir, Some(1L))
    }
  }

  test("partition-scoped optimize compacts ONE slice; other slices untouched on disk") {
    val dir = freshDir()
    val df = mkTable(dir)
    SnapshotLog.commitPartitioned(spark, dir, df.repartition(8), Seq("region"))
    def filesByRegion(v: Long): Map[String, Set[String]] =
      SnapshotLog.filePartsOf(spark, dir, v).toSeq
        .groupBy(_._2("region")).map { case (r, fs) => r -> fs.map(_._1).toSet }
    val v0 = SnapshotLog.versions(spark, dir).last
    val before = filesByRegion(v0)
    // compact ONLY the eu slice — the daily-maintenance shape
    val v1 = SnapshotLog.optimize(spark, dir,
      partitionScope = Map("region" -> "eu"))
    assert(v1 > v0)
    val after = filesByRegion(v1)
    assert(after("eu").size < before("eu").size,
      s"eu did not compact: ${before("eu").size} -> ${after("eu").size}")
    assert(after("us") === before("us"), "us files were rewritten")
    assert(after("ap") === before("ap"), "ap files were rewritten")
    assert(SnapshotLog.read(spark, dir).collect().map(_.toSeq).toSet ===
      df.collect().map(_.toSeq).toSet)
    // scoping a non-partition column is loud
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.optimize(spark, dir, partitionScope = Map("k" -> 5L))
    }
    assert(e.getMessage.contains("not partitioned by"))
    // the SQL surface drives the same scope (empty clusterCols slot)
    val report = spark.sql(s"SELECT * FROM snapshot_optimize('$dir', " +
      "1, '', 'region', 'ap')").collect().head
    assert(report.getString(0) === "optimize")
    val v2 = report.getLong(2)
    val after2 = filesByRegion(v2)
    assert(after2("ap").size === 1)
    assert(after2("eu") === after("eu"), "eu rewritten by the ap scope")
  }

  test("z-order optimize on a partitioned table: bounded fan-out, prune intact, rows exact") {
    val dir = freshDir()
    val df = spark.range(0, 600).select(
      element_at(array(lit("eu"), lit("us"), lit("ap")),
        (col("id") % 3 + 1).cast("int")).as("region"),
      col("id").as("k"), ((col("id") * 37) % 100).as("x"),
      ((col("id") * 53) % 100).as("y"))
    SnapshotLog.commitPartitioned(spark, dir, df.repartition(8),
      Seq("region"))
    SnapshotLog.optimize(spark, dir, targetFiles = 2,
      clusterBy = Seq("x", "y"), zorder = true)
    val v = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v) === Seq("region"))
    val tuples = df.select("region").distinct().count()
    val after = SnapshotLog.read(spark, dir).inputFiles.length
    // partition columns lead the z-range partitioner: each task holds at
    // most a boundary-straddle of one tuple
    assert(after <= tuples + 2,
      s"z-order fan-out: $after files for $tuples tuples")
    assert(SnapshotLog.read(spark, dir).collect().map(_.toSeq).toSet ===
      df.collect().map(_.toSeq).toSet)
    val (eu, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    assert(scanned < total)
    assert(eu.count() === 200)
  }

  test("external layouts: percent-encoded UTF-8 refused loudly; ASCII escapes accepted") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cur",
        org.apache.spark.sql.types.StringType)))
    // a writer that percent-encoded the euro sign as %E2%82%AC reads
    // back MOJIBAKE under Spark's char-per-byte partition discovery —
    // the publish must refuse loudly (silently-empty probes are the bug)
    val badRoot = java.nio.file.Files.createTempDirectory("ext-esc").toString
    val badSub = s"$badRoot/cur=%E2%82%AC"
    Seq((1L, 10L)).toDF("k", "v").coalesce(1).write.parquet(badSub)
    val badFiles = new java.io.File(badSub).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).toSeq
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.commitBatchExternal(spark,
        java.nio.file.Files.createTempDirectory("ext-bad").toString,
        badFiles, schema, batchId = 1L, partitionCols = Seq("cur"))
    }
    assert(e.getMessage.contains("multi-byte UTF-8"))
    // ASCII escapes decode identically under both interpretations —
    // accepted, recorded as the real value, and probe exactly (the
    // '=' in the value MUST be escaped in the dir name; this is the
    // hive shape Spark itself writes). Raw non-ASCII dir names (what
    // Spark writes for a euro-sign value) also pass the guard
    // trivially — untestable here only because this container's
    // filesystem charset is ASCII.
    val dir = freshDir()
    val goodRoot = java.nio.file.Files.createTempDirectory("ext-raw").toString
    val goodSub = s"$goodRoot/cur=a%3Db" // value "a=b"
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1).write.parquet(goodSub)
    val files = new java.io.File(goodSub).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).toSeq
    SnapshotLog.commitBatchExternal(spark, dir, files, schema,
      batchId = 1L, partitionCols = Seq("cur"))
    val (got, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("cur" -> "a=b"))
    assert(total === 1 && scanned === 1)
    assert(got.count() === 2)
    assert(got.select("cur").distinct().as[String].head() === "a=b")
  }

  test("special characters in partition values round-trip exactly") {
    val dir = freshDir()
    val df = Seq(("a/b", 1L), ("x=y", 2L), ("p q", 3L), ("t\tu", 4L),
      ("pct%41", 5L), ("plain", 6L)).toDF("cat", "v")
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("cat"))
    // tuples recorded as the RAW values (path escaping undone)
    val parts = SnapshotLog.filePartsOf(spark, dir, 1L)
    val recorded = parts.values.map(_("cat")).toSet
    assert(recorded === Set("a/b", "x=y", "p q", "t\tu", "pct%41", "plain"))
    df.collect().foreach { r =>
      val (got, scanned, total) = SnapshotLog.readPartition(spark, dir,
        Map("cat" -> r.getString(0)))
      assert(scanned === 1 && total === 6)
      assert(got.as[(String, Long)].collect().toSeq ===
        Seq((r.getString(0), r.getLong(1))))
    }
  }

  test("timestamp probes are refused loudly — equality pruning cannot be conservative") {
    val dir = freshDir()
    mkTable(dir)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readPartition(spark, dir,
        Map("region" -> new java.sql.Timestamp(0L)))
    }
    assert(e.getMessage.contains("exact recorded string"))
  }

  test("null partition values: recorded under the hive marker, probe-able") {
    val dir = freshDir()
    val df = Seq((Some("eu"), 1L), (None, 2L), (Some("us"), 3L))
      .toDF("region", "v")
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("region"))
    val (nulls, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> null))
    assert(scanned === 1 && total === 3)
    assert(nulls.select("v").as[Long].collect().toSeq === Seq(2L))
  }

  test("date partition values prune via their canonical rendering") {
    val dir = freshDir()
    val df = spark.range(0, 90).select(
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") / 30).cast("int")).as("d"), col("id").as("v"))
      .repartition(3, col("d")) // one file per date dir
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("d"))
    val (got, scanned, total) = SnapshotLog.readPartition(spark, dir,
      Map("d" -> java.sql.Date.valueOf("2024-01-02")))
    assert(scanned === 1, s"scanned $scanned of $total")
    assert(got.count() === 30)
    assert(got.schema("d").dataType === org.apache.spark.sql.types.DateType)
  }

  test("range and point reads prune on PARTITION columns via manifest tuples") {
    val dir = freshDir()
    // date-partitioned: the date value lives ONLY in directory names —
    // zone maps/blooms cannot exist for it, the tuple is the one signal
    val df = spark.range(0, 90).select(
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") / 30).cast("int")).as("d"), col("id").as("v"))
      .repartition(3, col("d"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("d"))
    val (got, scanned, total) = SnapshotLog.readBetweenValues(spark, dir, "d",
      java.sql.Date.valueOf("2024-01-02"), java.sql.Date.valueOf("2024-01-03"))
    assert(scanned === 2 && total === 3, s"ranged $scanned/$total")
    assert(got.count() === 60)
    // point read on the partition column: tuple equality, no bloom
    val (pt, s2, t2) = SnapshotLog.readPoint(spark, dir, "d",
      java.sql.Date.valueOf("2024-01-03"))
    assert(s2 === 1 && t2 === 3)
    assert(pt.count() === 30)
    // a null-partition file is pruned EXACTLY by a range read (BETWEEN
    // is never true on NULL)
    val dir2 = freshDir()
    SnapshotLog.commitPartitioned(spark, dir2,
      Seq((Some(1L), "a"), (None, "b"), (Some(9L), "c")).toDF("k", "s")
        .repartition(3, col("k")), Seq("k"))
    val (r2, s3, t3) = SnapshotLog.readBetweenValues(spark, dir2, "k", 0L, 5L)
    assert(r2.count() === 1 && s3 < t3, s"null-part prune: $s3/$t3")
  }

  test("SQL snapshot_partition: pure-SQL partition-pruned reads") {
    val dir = freshDir()
    mkTable(dir)
    val got = spark.sql(
      s"SELECT * FROM snapshot_partition('$dir', 'region', 'eu')")
    assert(got.count() ===
      SnapshotLog.read(spark, dir).filter(col("region") === "eu").count())
    assert(got.filter(col("region") =!= "eu").count() === 0)
    // date-rendered values resolve against a date partition column
    val dir2 = freshDir()
    val df = spark.range(0, 60).select(
      date_add(lit(java.sql.Date.valueOf("2024-05-01")),
        (col("id") / 30).cast("int")).as("d"), col("id").as("v"))
    SnapshotLog.commitPartitioned(spark, dir2, df, Seq("d"))
    assert(spark.sql(
      s"SELECT count(*) FROM snapshot_partition('$dir2', 'd', '2024-05-02')")
      .as[Long].head() === 30L)
    // bad arity is loud
    intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_partition('$dir', 'region')")
    }
  }

  test("partitioning composes with zone maps: tuple prune, then range prune") {
    val dir = freshDir()
    val df = spark.range(0, 600).select(
      element_at(array(lit("eu"), lit("us"), lit("ap")),
        (col("id") % 3 + 1).cast("int")).as("region"),
      col("id").as("k"), (col("id") * 7).as("v"))
      .repartitionByRange(6, col("k"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("region"), Seq("k"))
    // zone maps recorded alongside partition tuples
    assert(SnapshotLog.fileStatsOf(spark, dir, 1L).nonEmpty)
    assert(SnapshotLog.filePartsOf(spark, dir, 1L).nonEmpty)
    val (got, scanned, total) =
      SnapshotLog.readBetween(spark, dir, "k", 0L, 50L)
    assert(scanned < total)
    assert(got.count() === 51)
    assert(got.schema.fieldNames.contains("region"))
  }

  test("composite-key merge prunes planning to the key's partition — proven by corrupting the others") {
    // (g, k) composite key against a g-partitioned table: the general
    // semi-join path must scan ONLY g='a' candidate files. Proof at the
    // I/O layer: physically delete every other partition's data files —
    // the merge succeeds iff planning never opens them.
    val dir = freshDir()
    val df = spark.range(0, 300).select(
      element_at(array(lit("a"), lit("b"), lit("c")),
        (col("id") % 3 + 1).cast("int")).as("g"), col("id").as("k"),
      col("id").as("v"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("g"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotLog.filePartsOf(spark, dir, 1L).foreach { case (p, t) =>
      if (t("g") != "a") f.delete(new org.apache.hadoop.fs.Path(p), false)
    }
    val changes = Seq(("a", 0L, 999L), ("a", 3L, 888L)).toDF("g", "k", "v")
    SnapshotLog.merge(spark, dir, changes, Seq("g", "k"))
    val (a, _, _) = SnapshotLog.readPartition(spark, dir, Map("g" -> "a"))
    assert(a.filter(col("k") === 0L).select("v").as[Long].head() === 999L)
    assert(a.filter(col("k") === 3L).select("v").as[Long].head() === 888L)
    assert(a.count() === 100)
  }

  test("single-key merge on the partition column takes the degenerate-stat fast path") {
    // a daily-rollup table keyed AND partitioned by day: the partition
    // tuple is the [v,v] zone map the fast path prunes with. Same
    // corruption proof: every other day's file is gone from disk.
    val dir = freshDir()
    val df = spark.range(0, 30).select(
      date_add(lit(java.sql.Date.valueOf("2024-06-01")),
        col("id").cast("int")).as("day"), (col("id") * 10).as("total"))
      .repartition(30, col("day"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("day"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keep = Set("2024-06-05", "2024-06-20")
    SnapshotLog.filePartsOf(spark, dir, 1L).foreach { case (p, t) =>
      if (!keep(t("day"))) f.delete(new org.apache.hadoop.fs.Path(p), false)
    }
    val changes = Seq(
      (java.sql.Date.valueOf("2024-06-05"), 555L),
      (java.sql.Date.valueOf("2024-06-20"), 2020L)).toDF("day", "total")
    SnapshotLog.merge(spark, dir, changes, Seq("day"))
    keep.foreach { d =>
      val (got, scanned, _) = SnapshotLog.readPartition(spark, dir,
        Map("day" -> d))
      assert(scanned === 1)
      assert(got.select("total").as[Long].head() ===
        (if (d == "2024-06-05") 555L else 2020L))
    }
  }

  test("an empty partitioned table pre-declares the layout; merges inherit it") {
    // the CDC-replica bootstrap shape: create the table with its layout
    // BEFORE any data arrives, so the first merge already lands
    // partition-pure
    val dir = freshDir()
    val empty = Seq.empty[(String, Long, Long)].toDF("region", "k", "v")
    SnapshotLog.commitPartitioned(spark, dir, empty, Seq("region"))
    assert(SnapshotLog.partitionColsOf(spark, dir, 1L) === Seq("region"))
    SnapshotLog.merge(spark, dir,
      Seq(("eu", 1L, 10L), ("us", 2L, 20L)).toDF("region", "k", "v"),
      Seq("k"))
    val v = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.partitionColsOf(spark, dir, v) === Seq("region"))
    val (eu, scanned, total) =
      SnapshotLog.readPartition(spark, dir, Map("region" -> "eu"))
    assert(scanned < total || total === 1)
    assert(eu.select("k").as[Long].collect().toSeq === Seq(1L))
  }

  test("change data feed reads partitioned versions correctly") {
    val dir = freshDir()
    mkTable(dir)
    SnapshotLog.merge(spark, dir,
      Seq(("eu", 0L, 999L)).toDF("region", "k", "v"), Seq("k"))
    val feed = SnapshotLog.changesBetween(spark, dir, 1L, 2L, keys = Seq("k"))
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType.get("update_postimage").contains(1L))
    assert(byType.get("update_preimage").contains(1L))
    val post = feed.filter(col("_change_type") === "update_postimage")
    assert(post.select("region").as[String].head() === "eu")
    assert(post.select("v").as[Long].head() === 999L)
  }
}

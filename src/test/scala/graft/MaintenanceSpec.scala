package graft

import graft.sources.Maintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Compaction: fewer files, identical data, idempotent, crash-staged. */
class MaintenanceSpec extends AnyFunSuite with SparkFixture {

  test("compact merges a many-small-files table without changing its rows") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val src = Tables.orders(spark, Sf)
    src.repartition(37).write.mode("overwrite").parquet(dir) // 37 small files
    val nRows = spark.read.parquet(dir).count()

    val (nBefore, nAfter) = Maintenance.compact(spark, dir, targetBytes = 1L << 30)
    assert(nBefore === 37 && nAfter === 1, s"$nBefore -> $nAfter")

    // exact multiset equality — the real integrity check (a double-sum
    // compare would flake: fold order changes across repartitions)
    val after = spark.read.parquet(dir)
    assert(after.count() === nRows)
    assert(after.exceptAll(src).isEmpty && src.exceptAll(after).isEmpty)

    // idempotent: already-compact tables are left untouched (no rewrite)
    val filesBefore = Maintenance.dataFiles(spark, dir).map(_.toString)
    assert(Maintenance.compact(spark, dir, 1L << 30) === ((1, 1)))
    assert(Maintenance.dataFiles(spark, dir).map(_.toString) === filesBefore)
  }

  test("compact heals a crash between the two swap renames on next entry") {
    val base = Files.createTempDirectory("graft_crash")
    val dir = base.toString + "/t"
    Tables.orders(spark, Sf).repartition(5).write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir).count()
    // simulate the crash window: table staged out to the backup name,
    // replacement never swapped in
    Files.move(java.nio.file.Paths.get(dir),
      base.resolve("_compact_old_t"))
    val (nBefore, nAfter) = Maintenance.compact(spark, dir, 1L << 30)
    assert(nBefore === 5 && nAfter === 1)
    assert(spark.read.parquet(dir).count() === rows)
  }

  test("compact aborts losslessly when a writer recreates the dir after stage-out") {
    val base = Files.createTempDirectory("graft_race")
    val dir = base.toString + "/t"
    val src = Tables.orders(spark, Sf)
    src.repartition(5).write.mode("overwrite").parquet(dir)
    val origRows = spark.read.parquet(dir).count()
    // late writer lands INSIDE the race window: dir recreated between the
    // stage-out rename and the swap-in. Without the guard, rename(tmp, p)
    // nests tmp inside the fresh dir and the backup delete loses origRows.
    val late = src.limit(7)
    val (_, _) = Maintenance.compactWith(spark, dir, 1L << 30) { () =>
      late.write.mode("overwrite").parquet(dir)
    }
    val after = spark.read.parquet(dir)
    // nothing lost: original rows AND the late writer's rows all present
    assert(after.count() === origRows + 7)
    assert(spark.read.parquet(dir).exceptAll(src.unionAll(late)).isEmpty)
    // no leftover staging/backup dirs
    assert(!Files.exists(base.resolve("_compact_old_t")))
    assert(!Files.exists(base.resolve("_compact_tmp_t")))
  }

  test("compact respects the target size (splits instead of one giant file)") {
    val dir = Files.createTempDirectory("graft_compact2").toString + "/t"
    Tables.lineitem(spark, Sf).repartition(24).write.mode("overwrite").parquet(dir)
    val total = Maintenance.dataFiles(spark, dir)
      .map(f => new java.io.File(f.toUri).length).sum
    val target = math.max(total / 4, 1L)
    val (_, nAfter) = Maintenance.compact(spark, dir, target)
    // ceil(total/target) = 4 give or take parquet overhead re-encoding
    assert(nAfter >= 3 && nAfter <= 5, s"got $nAfter files")
  }

  test("compactZOrdered clusters both columns so either one prunes") {
    val dir = Files.createTempDirectory("graft_zcompact").toString + "/t"
    val src = Tables.lineitem(spark, Sf)
      .select((col("l_partkey") % 256).as("px"), (col("l_orderkey") % 256).as("po"))
    src.orderBy("px").repartition(24) // arrival order scrambles po entirely
      .write.mode("overwrite").parquet(dir)
    val nRows = spark.read.parquet(dir).count()

    val bytes = Maintenance.dataFiles(spark, dir)
      .map(f => f.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(f).getLen).sum
    val (nBefore, nAfter) =
      Maintenance.compactZOrdered(spark, dir, "px", "po", bits = 8,
        targetBytes = bytes / 8 + 1)
    assert(nBefore === 24 && nAfter >= 4, s"$nBefore -> $nAfter")

    // identical data after the clustered rewrite
    val after = spark.read.parquet(dir)
    assert(after.count() === nRows)
    assert(after.exceptAll(src).isEmpty && src.exceptAll(after).isEmpty)

    // per-file min/max boxes: a point predicate on the SECOND column
    // must skip at least one file (round-robin arrival order never does)
    val boxes = after.select(col("po"),
        input_file_name().as("f"))
      .groupBy("f").agg(min("po").as("lo"), max("po").as("hi"))
      .collect()
    val touched = boxes.count(r => r.getLong(1) <= 7 && r.getLong(2) >= 7)
    assert(touched < boxes.length,
      s"po=7 touched $touched of ${boxes.length} z-clustered files")
  }

  test("bucketed co-located join: zero Exchange, rows equal the plain join") {
    val o = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Maintenance.writeBucketed(o, "bkt_orders_spec", "o_orderkey", 4)
    Maintenance.writeBucketed(l, "bkt_lineitem_spec", "o_orderkey", 4)
    // disable broadcast so the test proves the SHUFFLE is gone, not hidden
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_orders_spec")
        .join(spark.table("bkt_lineitem_spec"), "o_orderkey")
      val n = j.count() // finalize AQE
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
        s"bucketed join still shuffles:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size === 2,
        s"expected both scans bucket-aware:\n$plan")
      val plain = o.join(l, "o_orderkey")
      assert(n === plain.count())
      assert(j.exceptAll(plain).isEmpty && plain.exceptAll(j).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
    }
  }

  test("hive-partitioned layout prunes directories: numFiles metric, not just the plan") {
    val dir = Files.createTempDirectory("part_prune").toString + "/events"
    Maintenance.writePartitioned(
      Tables.events(spark, Sf).select("event_id", "user_id", "event_type"),
      dir, "event_type")
    val total = spark.read.parquet(dir)
    val totalFiles = total.select(input_file_name()).distinct().count()
    assert(totalFiles >= 5, s"expected >=1 file per event_type, got $totalFiles")
    // AQE off so the scan node (and its metrics) are directly reachable
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.read.parquet(dir).filter(col("event_type") === "click")
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in plan"))
      assert(scan.partitionFilters.nonEmpty,
        "partition filter did not reach the scan (would read every directory)")
      val n = q.count()
      assert(n === Tables.events(spark, Sf)
        .filter(col("event_type") === "click").count())
      val filesRead = scan.metrics("numFiles").value
      assert(filesRead < totalFiles,
        s"pruning read $filesRead of $totalFiles files — no directory was skipped")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // static pruning (previous test) needs the literal in the query;
    // DPP covers the production join shape — fact partitioned on the
    // join key, selective filter only on the DIM side — by planting a
    // runtime subquery filter into the fact scan's PartitionFilters.
    import spark.implicits._
    val dir = Files.createTempDirectory("dpp").toString + "/lineitem"
    Maintenance.writePartitioned(
      Tables.lineitem(spark, Sf)
        .select("l_orderkey", "l_quantity", "l_returnflag"),
      dir, "l_returnflag")
    val fact = spark.read.parquet(dir)
    // the dim must be a real source (not a LocalRelation — the optimizer
    // would fold the filter into it and DPP has no Filter node to see)
    val dimDir = Files.createTempDirectory("dpp_dim").toString + "/flags"
    Seq(("A", "accept"), ("N", "neutral"), ("R", "reject"))
      .toDF("flag", "meaning").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val j = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .filter(col("meaning") === "accept") // selective predicate on DIM only
      .agg(count(lit(1)).as("n"))
    val n = j.collect()(0).getLong(0)
    assert(n === Tables.lineitem(spark, Sf)
      .filter(col("l_returnflag") === "A").count())
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan has no runtime partition filter (DPP did not fire):\n$plan")
  }

  test("compactionReport: per-partition small-file census recommends " +
      "exactly where a scoped optimize would act, and clears after it") {
    import graft.sources.SnapshotLog
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("advisor")
      .toString + "/tbl"
    // region 'a' fragmented (4 files), region 'b' compact (1 file)
    SnapshotLog.commitPartitioned(spark, dir,
      (0L until 40L).map(i => ("a", i)).toDF("region", "k")
        .repartition(4), Seq("region"))
    SnapshotLog.append(spark, dir,
      (100L until 110L).map(i => ("b", i)).toDF("region", "k")
        .coalesce(1))
    val rep = SnapshotLog.compactionReport(spark, dir)
      .orderBy("partition")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(rep.map(_._1) === Seq("region=a", "region=b"))
    val Seq(a, b) = rep
    assert(a._2 === 4 && a._5, s"fragmented partition must recommend: $a")
    assert(b._2 === 1 && !b._5, s"compact partition must not: $b")
    // the SQL surface serves the same relation
    val viaSql = spark.sql(
      s"SELECT * FROM snapshot_compaction_report('$dir') " +
        "WHERE recommend ORDER BY partition")
      .select("partition").as[String].collect().toSeq
    assert(viaSql === Seq("region=a"))
    // act on the report: scoped optimize on exactly the flagged
    // partition; the advisor goes quiet, rows are untouched
    SnapshotLog.optimize(spark, dir, targetFiles = 1,
      partitionScope = Map("region" -> "a"))
    val after = SnapshotLog.compactionReport(spark, dir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(after.forall(!_._5), s"nothing should remain flagged: $after")
    assert(SnapshotLog.read(spark, dir).count() === 50)
    // the CLI verb prints it (arg parsing only — same library call)
    Maintain.run(spark, Seq(dir, "plan"))
  }
}

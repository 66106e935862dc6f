package graft

import graft.sources.SnapshotLog
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Throughput comparison of the two v2 streaming write encoders over a
  * WIDE row shape (round 12): Spark's native InternalRow
  * ParquetWriteSupport vs the parquet example-API Group writer. The
  * Group engine materializes one boxed Group object per row and one
  * boxed value per cell; the native engine streams primitives straight
  * into the column writers — the gap grows with row width. The spec
  * measures both on identical 22-column epochs and asserts the native
  * engine never LOSES (soft 1.2× slack — the Group engine runs first,
  * so JIT warmup bias favors the native side and a real regression
  * would have to overcome it). Absolute numbers print for the survey;
  * content equality is pinned by GraftCatalogSpec's parity test. */
class V2WriteEncodeBenchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("native InternalRow encode >= Group-API throughput on wide rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("encbench").toString
    spark.conf.set("spark.sql.catalog.gwb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gwb.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwb.ns")
    val colsDdl = (1 to 6).map(i => s"s$i STRING").mkString(", ") + ", " +
      (1 to 6).map(i => s"d$i DOUBLE").mkString(", ") + ", " +
      (1 to 6).map(i => s"l$i BIGINT").mkString(", ") +
      ", ts TIMESTAMP, m DECIMAL(18,4), e ARRAY<FLOAT>, k BIGINT"
    val selects = Seq("id AS k") ++
      (1 to 6).map(i => s"concat('value-', id, '-pad-$i-pad') AS s$i") ++
      (1 to 6).map(i => s"CAST(id AS DOUBLE) / $i AS d$i") ++
      (1 to 6).map(i => s"id * $i AS l$i") ++
      Seq("timestamp_micros(id * 1000) AS ts",
        "CAST(CAST(id AS DECIMAL(18,4)) / 7 AS DECIMAL(18,4)) AS m",
        "array(CAST(id AS FLOAT), CAST(-id AS FLOAT), 0.5f) AS e")
    def run(table: String, native: Boolean, rows: Long): Double = {
      spark.sql(s"CREATE TABLE gwb.ns.$table ($colsDdl)")
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[Long]
      spark.conf.set("spark.graft.streamWrite.nativeEncode",
        native.toString)
      val q = try ms.toDF().toDF("id").selectExpr(selects: _*)
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory(s"encb-$table").toString)
        .toTable(s"gwb.ns.$table")
      finally spark.conf.unset("spark.graft.streamWrite.nativeEncode")
      try {
        ms.addData(0L until rows: _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      } finally q.stop()
    }
    run("warm", native = true, 20000L) // JIT/classload warmup epoch
    // best-of-2 per engine: a full `sbt test` runs this spec alongside
    // 80 other suites on the same 32 threads, and a single scheduling
    // spike flipped the one-shot comparison — min damps host noise
    // while keeping the regression guard real
    val groupSec = math.min(run("encg", native = false, 150000L),
      run("encg2", native = false, 150000L))
    val nativeSec = math.min(run("encn", native = true, 150000L),
      run("encn2", native = true, 150000L))
    assert(SnapshotLog.read(spark, s"$root/ns/encn").count() === 150000L)
    info(f"wide-row 150k×22-col epoch (best of 2): group=$groupSec%.2fs " +
      f"native=$nativeSec%.2fs speedup=${groupSec / nativeSec}%.2fx")
    assert(nativeSec <= groupSec * 1.2,
      f"native encode regressed vs the Group engine: " +
        f"$nativeSec%.2fs vs $groupSec%.2fs")
  }
}

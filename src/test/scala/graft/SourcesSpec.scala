package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** CSV/JSON/file-stream source coverage (SURVEY.md §2.2-A impl rows) —
  * testdata is parquet-only and read-only, so these round-trip through
  * temp files. */
class SourcesSpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DoubleType)))

  private def tmpDir(prefix: String): Path =
    Files.createTempDirectory(prefix)

  test("header CSV reads with explicit schema (R1 extract shape)") {
    val dir = tmpDir("csv_src")
    val f = dir.resolve("extract.csv")
    Files.writeString(f, "id,name,price\n1,widget,9.5\n2,gadget,12.25\n3,,0.0\n")
    val df = Sources.csv(spark, f.toString, schema)
    assert(df.count() === 3)
    val r = df.orderBy("id").collect()
    assert(r(0).getLong(0) === 1 && r(0).getString(1) === "widget"
      && r(0).getDouble(2) === 9.5)
    assert(r(2).isNullAt(1), "empty CSV field should be null")
  }

  test("JSON-lines reads with explicit schema") {
    val dir = tmpDir("json_src")
    val f = dir.resolve("extract.json")
    Files.writeString(f,
      """{"id":1,"name":"widget","price":9.5}
        |{"id":2,"name":"gadget","price":12.25}
        |""".stripMargin)
    val df = Sources.jsonLines(spark, f.toString, schema)
    assert(df.count() === 2)
    assert(df.filter(col("name") === "gadget").count() === 1)
  }

  test("parquet file stream delivers one extract per micro-batch") {
    import spark.implicits._
    val in = tmpDir("pq_stream_in")
    val nationSchema = Tables.nation(spark, Sf).schema
    // two "extracts" arriving as separate files
    Tables.nation(spark, Sf).filter(col("n_nationkey") < 10)
      .coalesce(1).write.mode("append").parquet(in.toString)
    Tables.nation(spark, Sf).filter(col("n_nationkey") >= 10)
      .coalesce(1).write.mode("append").parquet(in.toString)

    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = Sources.parquetStream(spark, in.toString, nationSchema,
        maxFilesPerTrigger = 1)
      .writeStream
      .option("checkpointLocation", tmpDir("pq_stream_ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes += b.count()
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(batchSizes.size === 2, s"expected 2 micro-batches, got $batchSizes")
    assert(batchSizes.sum === 25)
  }

  test("ORC round-trips with schema, filter pushdown intact") {
    val dir = tmpDir("orc_src")
    val n = Tables.nation(spark, Sf)
    Sources.writeOrc(n, s"$dir/nation_orc")
    val back = Sources.orc(spark, s"$dir/nation_orc", n.schema)
    assert(back.count() === 25)
    assert(back.exceptAll(n).isEmpty && n.exceptAll(back).isEmpty)
    val filtered = back.filter(col("n_nationkey") === 7)
    // pushed filter reaches the ORC scan (same contract as parquet)
    val scan = filtered.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters") && scan.contains("n_nationkey"),
      s"expected pushdown in ORC scan:\n$scan")
    assert(filtered.count() === 1)
  }

  test("debezium envelope: hostile wire input is dropped, never misread") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val wire = Seq(
      // the four valid shapes
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c","ts_ms":1000}""",
      """{"before":null,"after":{"id":2,"name":"b"},"op":"r","ts_ms":2000}""",
      """{"before":{"id":1,"name":"a"},"after":{"id":1,"name":"a2"},"op":"u","ts_ms":3000}""",
      """{"before":{"id":2,"name":"b"},"after":null,"op":"d","ts_ms":4000}""",
      // hostile/ignorable: truncate op, message op, garbage, truncated
      // JSON, empty string, null-ish tombstone, wrong-typed op
      """{"op":"t","ts_ms":5000}""",
      """{"op":"m","ts_ms":6000}""",
      "not json at all",
      """{"before":{"id":9""",
      "",
      "null",
      """{"before":null,"after":{"id":9,"name":"z"},"op":7,"ts_ms":7000}""")
    val out = graft.sources.Sources.debeziumEnvelope(
      wire.toDF("value"), payload).collect()
    assert(out.length === 4, s"expected only the 4 valid ops, got ${out.length}")
    val byOp = out.groupBy(_.getAs[String]("op")).view.mapValues(_.length).toMap
    assert(byOp === Map("I" -> 2, "U" -> 1, "D" -> 1))
    // d carries the BEFORE image; u carries AFTER
    val d = out.find(_.getAs[String]("op") == "D").get
    assert(d.getAs[Long]("id") === 2L && d.getAs[String]("name") === "b")
    val u = out.find(_.getAs[String]("op") == "U").get
    assert(u.getAs[String]("name") === "a2")
  }

  test("snapshot + change-feed sinks round-trip") {
    val dir = tmpDir("snap")
    val n = Tables.nation(spark, Sf)
    Sources.writeSnapshot(n, s"$dir/current")
    Sources.appendChangeFeed(n.limit(5), s"$dir/changes")
    Sources.appendChangeFeed(n.limit(3), s"$dir/changes")
    assert(spark.read.parquet(s"$dir/current").count() === 25)
    assert(spark.read.parquet(s"$dir/changes").count() === 8)
  }
}

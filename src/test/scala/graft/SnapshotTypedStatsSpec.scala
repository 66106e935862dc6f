package graft

import graft.sources.{LongStat, Probe, SnapshotLog, StrStat}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Typed zone maps / blooms (round 8): manifest file skipping on the
  * predicates real lake tables filter on first — dates, timestamps,
  * decimals, strings — not just BIGINT. Every prune test holds BOTH
  * properties: filesScanned < filesTotal (the prune is real) AND the
  * pruned result equals the unpruned filter (the prune is exact).
  * String bounds are Iceberg-style truncated; the truncation laws are
  * property-tested directly. */
class SnapshotTypedStatsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("typed-stats").toString

  // --- truncation laws -------------------------------------------------

  test("truncStatMin is a lower bound, truncStatMax an upper bound (UTF-8 order)") {
    val samples = Seq(
      "a" * 100, "z" * 33, "short", "",
      "prefix-" + "x" * 60,
      // multi-byte and supplementary chars straddling the cut
      "é" * 40, "中文" * 20, "ab" + "😀" * 20, // 😀 pairs
      "x" * 31 + "😀" + "tail", // surrogate pair AT the boundary
      "￿" * 40, "x" * 31 + "￿￿" * 5)
    samples.foreach { s =>
      val lo = SnapshotLog.truncStatMin(s)
      assert(SnapshotLog.utf8Cmp(lo, s) <= 0, s"min bound broke for $s")
      assert(lo.length <= 32)
      SnapshotLog.truncStatMax(s) match {
        case Some(hi) => assert(SnapshotLog.utf8Cmp(hi, s) >= 0,
          s"max bound broke for ${s.take(40)}")
        case None => () // +inf is trivially an upper bound
      }
    }
    // the un-incrementable case: every retained code point is U+10FFFF
    val top = new String(Array.fill(33)(0x10FFFF), 0, 33)
    assert(SnapshotLog.truncStatMax(top).isEmpty)
    // short strings pass through exactly
    assert(SnapshotLog.truncStatMin("abc") === "abc")
    assert(SnapshotLog.truncStatMax("abc") === Some("abc"))
  }

  // --- date zone maps ---------------------------------------------------

  test("date-clustered table: a date range reads only matching files, exactly") {
    val dir = freshDir()
    val df = spark.range(0, 365)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")).as("d"), (col("id") * 3).as("v"))
      .repartitionByRange(6, col("d"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("d"))
    val lo = java.sql.Date.valueOf("2024-03-01")
    val hi = java.sql.Date.valueOf("2024-03-31")
    val (got, scanned, total) =
      SnapshotLog.readBetweenValues(spark, dir, "d", lo, hi)
    assert(total === 6)
    assert(scanned < total, s"date prune scanned $scanned/$total")
    val expect = df.filter(col("d").between(lo, hi))
      .collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet === expect)
    assert(got.count() === 31)
  }

  test("timestamp zone maps prune and stay exact") {
    val dir = freshDir()
    val df = spark.range(0, 1000)
      .select(timestamp_seconds(lit(1700000000L) + col("id") * 3600)
        .as("ts"), col("id").as("v"))
      .repartitionByRange(5, col("ts"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("ts"))
    val lo = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L + 100 * 3600))
    val hi = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L + 150 * 3600))
    val (got, scanned, total) =
      SnapshotLog.readBetweenValues(spark, dir, "ts", lo, hi)
    assert(scanned < total)
    assert(got.count() === 51)
  }

  // --- decimal zone maps -------------------------------------------------

  test("decimal zone maps prune; off-scale bounds rescale outward (conservative)") {
    val dir = freshDir()
    val df = spark.range(0, 1000)
      .select((col("id") * 25).cast("decimal(12,2)").as("amt"),
        col("id").as("v"))
      .repartitionByRange(5, col("amt"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("amt"))
    val lo = new java.math.BigDecimal("100.00")
    val hi = new java.math.BigDecimal("2000.00")
    val (got, scanned, total) =
      SnapshotLog.readBetweenValues(spark, dir, "amt", lo, hi)
    assert(scanned < total)
    val expect = df.filter(col("amt").between(lo, hi))
      .collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet === expect)
    // a 3-dp bound on a 2-dp column must not lose boundary rows:
    // [99.995, 2000.005] rescales outward to [99.99, 2000.01]
    val (got2, _, _) = SnapshotLog.readBetweenValues(spark, dir, "amt",
      new java.math.BigDecimal("99.995"), new java.math.BigDecimal("2000.005"))
    assert(got2.count() === expect.size) // same multiples of 25 survive
  }

  // --- string zone maps ---------------------------------------------------

  test("string-clustered table: a prefix range prunes files and stays exact") {
    val dir = freshDir()
    // keys aa000..zz999-ish, clustered so each file owns a letter range;
    // values longer than 32 chars exercise truncated bounds
    val df = spark.range(0, 2600)
      .select(concat(
        // 'a' + id/100 as a letter prefix
        chr(lit(97) + (col("id") / 100).cast("int") % 26),
        format_string("%04d", col("id")),
        lit("-" + "pad" * 15)).as("k"), col("id").as("v"))
      .repartitionByRange(6, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    // sanity: truncation actually engaged (keys are > 32 chars)
    val stats = SnapshotLog.fileStatsOf(spark, dir, 1L)
    assert(stats.values.flatMap(_.values).collect {
      case StrStat(lo, _, _) => lo.length }.forall(_ <= 32))
    val (got, scanned, total) =
      SnapshotLog.readBetweenValues(spark, dir, "k", "c", "d")
    assert(total === 6)
    assert(scanned < total, s"string prune scanned $scanned/$total")
    val expect = df.filter(col("k") >= "c" && col("k") <= "d")
      .collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet === expect)
    assert(got.count() === 100) // the 'c' block
  }

  test("string stats survive manifest escaping: tabs, colons, '*', '%', newlines") {
    val dir = freshDir()
    val nasty = Seq("a\tb", "c:d", "e*f", "g%h", "i\nj", "plain", "%2A", "*")
      .zipWithIndex
    val df = nasty.toDF("k", "v").repartition(2, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    // roundtrip: recorded bounds must be real lower/upper bounds of the data
    val stats = SnapshotLog.fileStatsOf(spark, dir, 1L)
    assert(stats.nonEmpty)
    stats.values.flatMap(_.get("k")).foreach {
      case StrStat(lo, hiOpt, _) =>
        assert(hiOpt.isDefined) // short strings never truncate to +inf
        assert(hiOpt.forall(hi => SnapshotLog.utf8Cmp(lo, hi) <= 0))
      case other => fail(s"expected StrStat, got $other")
    }
    // exactness end-to-end across the full range (no prune loss)
    val (got, _, _) = SnapshotLog.readBetweenValues(spark, dir, "k", "", "~")
    assert(got.count() === nasty.size)
    // and a range probe that isolates the '*' / '%' keys exactly
    val (star, _, _) = SnapshotLog.readBetweenValues(spark, dir, "k", "*", "*")
    assert(star.as[(String, Int)].collect().toSet === Set(("*", 7)))
  }

  test("long readBetween delegates unchanged (legacy callers)") {
    val dir = freshDir()
    val df = spark.range(0, 400).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    val (got, scanned, total) = SnapshotLog.readBetween(spark, dir, "k", 0L, 99L)
    assert(scanned < total && got.count() === 100)
  }

  test("legacy untagged #filestat lines still parse as long stats") {
    val dir = freshDir()
    val df = spark.range(0, 100).select(col("id").as("k"))
      .repartitionByRange(2, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    // rewrite the manifest's tagged entries back to the pre-r8 untagged
    // format and assert the reader still plans with them
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(dir, "_log/v1.manifest")
    val lines = scala.io.Source.fromInputStream(f.open(mp)).getLines().toList
    val legacy = lines.map(l =>
      if (l.startsWith("#filestat="))
        l.replaceAll(":LN?:(-?\\d+):(-?\\d+)(:[01])?", ":$1:$2")
      else l)
    assert(legacy != lines, "expected tagged entries to rewrite")
    val out = f.create(mp, true)
    out.write((legacy.mkString("\n") + "\n").getBytes("UTF-8")); out.close()
    val stats = SnapshotLog.fileStatsOf(spark, dir, 1L)
    assert(stats.values.exists(_.get("k").exists(
      _.isInstanceOf[LongStat])))
    val (got, scanned, total) = SnapshotLog.readBetween(spark, dir, "k", 0L, 10L)
    assert(scanned < total && got.count() === 11)
  }

  // --- typed merge fast path ----------------------------------------------

  test("string-keyed sparse merge: planning-time prune + exact COW semantics") {
    val dir = freshDir()
    val base = spark.range(0, 400)
      .select(format_string("k%06d", col("id")).as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k"))
    SnapshotLog.commitWithStats(spark, dir, base, Seq("k"))
    val stats = SnapshotLog.fileStatsOf(spark, dir, 1L)
    // the prune the fast path runs: two keys in the first range file
    val files = SnapshotLog.read(spark, dir).inputFiles.toSeq
    def norm = stats.map { case (p, m) =>
      files.find(_.endsWith(p.split('/').last)).getOrElse(p) -> m }
    val kept = SnapshotLog.pruneByStatsStr(norm.keys.toSeq.sorted, norm,
      "k", Array("k000010", "k000017"))
    assert(kept.size === 1, s"expected 1 candidate, got ${kept.size}")
    // prune laws mirror the long domain
    assert(SnapshotLog.pruneByStatsStr(Seq("nostats"), Map.empty, "k",
      Array("x")) === Seq("nostats"))
    assert(SnapshotLog.pruneByStatsStr(norm.keys.toSeq, norm, "k",
      Array("zzzzzz")).isEmpty)
    // end to end: update + insert + miss-delete, exact
    val changes = Seq(("k000010", 999L, false), ("k000017", 888L, false),
      ("new-key", 1L, false), ("k999999", -1L, true))
      .toDF("k", "v", "is_del")
    SnapshotLog.merge(spark, dir, changes, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    val got = SnapshotLog.read(spark, dir)
    assert(got.count() === 401)
    assert(got.filter(col("k") === "k000010").select("v")
      .as[Long].head() === 999L)
    assert(got.filter(col("k") === "new-key").count() === 1)
    // zone maps survived the merge for the next prune
    assert(SnapshotLog.fileStatsOf(spark, dir, 2L).nonEmpty)
  }

  test("date-keyed sparse merge prunes and matches general-path semantics") {
    val dir = freshDir()
    val base = spark.range(0, 365)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")).as("d"), col("id").as("v"))
      .repartitionByRange(6, col("d"))
    SnapshotLog.commitWithStats(spark, dir, base, Seq("d"))
    val changes = Seq(
      (java.sql.Date.valueOf("2024-02-01"), 999L, false),
      (java.sql.Date.valueOf("2030-01-01"), 1L, false), // insert
      (java.sql.Date.valueOf("2024-02-03"), -1L, true)) // delete
      .toDF("d", "v", "is_del")
    SnapshotLog.merge(spark, dir, changes, Seq("d"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    val got = SnapshotLog.read(spark, dir)
    assert(got.count() === 365) // -1 delete +1 insert
    assert(got.filter(col("d") === "2024-02-01").select("v")
      .as[Long].head() === 999L)
    assert(got.filter(col("d") === "2024-02-03").count() === 0)
    assert(got.filter(col("d") === "2030-01-01").count() === 1)
  }

  // --- typed blooms ---------------------------------------------------------

  test("string blooms: point lookups skip files, exact for present and absent") {
    val dir = freshDir()
    val df = spark.range(0, 4096)
      .select(md5(col("id").cast("string")).as("k"), col("id").as("v"))
      .repartition(8) // scattered: zone maps could not prune a point probe
    SnapshotLog.commit(spark, dir, df)
    SnapshotLog.analyzeBlooms(spark, dir, Seq("k"),
      expectedItems = 1000, fpp = 0.01)
    val probes = df.filter(col("v").isin(0L, 77L, 4095L))
      .select("k").as[String].collect()
    probes.foreach { p =>
      val (got, scanned, total) = SnapshotLog.readPoint(spark, dir, "k", p)
      assert(scanned < total, s"string probe pruned nothing")
      assert(got.count() === 1)
    }
    val (absent, scanned, _) =
      SnapshotLog.readPoint(spark, dir, "k", "not-a-real-hash")
    assert(absent.count() === 0 && scanned <= 2)
  }

  test("date blooms prune point probes through the long encoding") {
    val dir = freshDir()
    val df = spark.range(0, 2048)
      .select(date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        col("id").cast("int")).as("d"), col("id").as("v"))
      .repartition(8, col("v")) // scattered by v, not by date
    SnapshotLog.commit(spark, dir, df)
    SnapshotLog.analyzeBlooms(spark, dir, Seq("d"), expectedItems = 4000)
    val probe = java.sql.Date.valueOf("2020-06-15")
    val (got, scanned, total) = SnapshotLog.readPoint(spark, dir, "d", probe)
    assert(got.count() === 1)
    assert(scanned < total)
    val (absent, _, _) = SnapshotLog.readPoint(spark, dir, "d",
      java.sql.Date.valueOf("1999-01-01"))
    assert(absent.count() === 0)
  }

  test("readWhere: conjunctive ranges prune multiplicatively, stay exact") {
    val dir = freshDir()
    // region-partitioned AND k-clustered: the two prunes compose —
    // each (partition tuple ∧ zone map) cuts files independently
    val df = spark.range(0, 900).select(
      element_at(array(lit("eu"), lit("us"), lit("ap")),
        (col("id") % 3 + 1).cast("int")).as("region"),
      col("id").as("k"), (col("id") * 3).as("v"))
      .repartitionByRange(9, col("k"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("region"), Seq("k"))
    val (both, sBoth, total) = SnapshotLog.readWhere(spark, dir,
      Seq(("region", "eu", "eu"), ("k", 0L, 99L)))
    val (kOnly, sK, _) = SnapshotLog.readWhere(spark, dir,
      Seq(("k", 0L, 99L)))
    assert(sK < total, "zone-map leg pruned nothing")
    assert(sBoth < sK,
      s"conjunction did not tighten: k-only $sK, both $sBoth of $total")
    val expect = df.filter(col("region") === "eu" &&
      col("k").between(0L, 99L)).collect().map(_.toSeq).toSet
    assert(both.collect().map(_.toSeq).toSet === expect)
    // all-pruned conjunction: disjoint ranges, empty exact frame
    val (none, sNone, _) = SnapshotLog.readWhere(spark, dir,
      Seq(("region", "mars", "mars"), ("k", 0L, 9L)))
    assert(sNone === 0 && none.count() === 0)
    assert(none.schema.fieldNames.toSeq === Seq("region", "k", "v"))
  }

  // --- IEEE-754 float/double zone maps (round 9) -----------------------

  test("encodeIeee preserves double order; -0.0 == 0.0; NaN above +Inf") {
    val xs = Seq(Double.NegativeInfinity, -1.7e308, -42.5, -1e-300,
      -Double.MinPositiveValue, -0.0, 0.0, Double.MinPositiveValue,
      1e-300, 0.1, 42.5, 1.7e308, Double.PositiveInfinity)
    xs.sliding(2).foreach { case Seq(a, b) =>
      val (ea, eb) = (SnapshotLog.encodeIeee(a), SnapshotLog.encodeIeee(b))
      if (a == b) assert(ea === eb, s"$a vs $b")
      else assert(ea < eb, s"order broke: $a → $ea, $b → $eb")
    }
    assert(SnapshotLog.encodeIeee(-0.0) === SnapshotLog.encodeIeee(0.0))
    assert(SnapshotLog.encodeIeee(Double.NaN) >
      SnapshotLog.encodeIeee(Double.PositiveInfinity))
  }

  test("double-clustered table: a score band reads fewer files, exactly") {
    val dir = freshDir()
    // scores straddle zero so the sign-flip leg of the encoding is live
    val df = spark.range(0, 1000)
      .select((col("id").cast("double") / 100.0 - 5.0).as("score"),
        col("id").as("v"))
      .repartitionByRange(8, col("score"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("score"))
    val (got, scanned, total) =
      SnapshotLog.readBetweenValues(spark, dir, "score", -1.25d, 0.75d)
    assert(total === 8)
    assert(scanned < total, s"double prune scanned $scanned/$total")
    val expect = df.filter(col("score").between(-1.25d, 0.75d))
      .collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet === expect)
    // integral probes against a double column resolve exactly
    val (got2, s2, _) =
      SnapshotLog.readBetweenValues(spark, dir, "score", -1L, 1L)
    assert(s2 < total)
    assert(got2.count() ===
      df.filter(col("score").between(-1.0d, 1.0d)).count())
  }

  test("mismatched numeric probes resolve to the column's stat domain") {
    val dir = freshDir()
    val df = spark.range(0, 1000)
      .select((col("id") * 25).cast("decimal(12,2)").as("amt"),
        col("id").as("v"))
      .repartitionByRange(5, col("amt"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("amt"))
    // the silent-prune bug class: a raw Long probe against decimal(12,2)
    // must compare at the column's scale (100 → unscaled 10000), not raw
    val (got, scanned, total) =
      SnapshotLog.readBetweenValues(spark, dir, "amt", 100L, 2000L)
    assert(scanned < total)
    val expect = df.filter(col("amt").between(100L, 2000L))
      .collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet === expect)
    assert(got.count() === 77) // 100, 125, ..., 2000
    // Double probes rescale outward too (100.001 floors to 100.00)
    val (got2, _, _) =
      SnapshotLog.readBetweenValues(spark, dir, "amt", 99.995d, 2000.005d)
    assert(got2.count() === 77)
  }

  test("temporal columns reject raw numeric probes loudly") {
    val dir = freshDir()
    val df = spark.range(0, 100)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")).as("d"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"), col("id").as("v"))
      .repartitionByRange(4, col("d"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("d", "ts"))
    intercept[IllegalArgumentException] {
      SnapshotLog.readBetweenValues(spark, dir, "d", 0L, 100L)
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.readBetweenValues(spark, dir, "ts",
        java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-02-01"))
    }
  }

  test("bloom point probes hash in the column's domain; inexact probes stay exact") {
    val dir = freshDir()
    val df = spark.range(0, 2048)
      .select((col("id") * 25).cast("decimal(12,2)").as("amt"),
        (col("id").cast("double") / 10.0).as("score"), col("id").as("v"))
      .repartition(8, col("v"))
    SnapshotLog.commit(spark, dir, df)
    SnapshotLog.analyzeBlooms(spark, dir, Seq("amt", "score"),
      expectedItems = 4000)
    // a Long probe on the decimal column: hashes as unscaled 25000, finds
    // the row (pre-fix it hashed raw 250 → bloom-missed EVERY file and
    // silently returned empty)
    val (eq, scanned, total) = SnapshotLog.readPoint(spark, dir, "amt", 250L)
    assert(eq.count() === 1)
    assert(scanned < total, "decimal bloom pruned nothing")
    // a Double probe on the double column prunes through encodeIeee
    val (eqD, sD, _) = SnapshotLog.readPoint(spark, dir, "score", 7.5d)
    assert(eqD.count() === 1)
    assert(sD < total)
    // an inexact probe (no decimal(12,2) equals 100.005) cannot bloom-
    // prune — all files kept, residual filter returns the exact empty
    val (inexact, sI, tI) = SnapshotLog.readPoint(spark, dir, "amt",
      new java.math.BigDecimal("100.005"))
    assert(sI === tI)
    assert(inexact.count() === 0)
  }

  // --- IN-list / point-set / IS NULL pruning (round 9) -------------------

  test("IN probe: zone maps keep only files admitting SOME value, exactly") {
    val dir = freshDir()
    val df = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 3).as("v")).repartitionByRange(10, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    // three points in two distinct range files out of ten
    val (got, scanned, total) =
      SnapshotLog.readIn(spark, dir, "k", Seq(5L, 17L, 950L))
    assert(total === 10)
    assert(scanned <= 2, s"IN probe scanned $scanned/$total")
    assert(got.select("k").as[Long].collect().sorted === Array(5L, 17L, 950L))
    // a value set entirely outside every zone map: zero files, empty exact
    val (none, sNone, _) = SnapshotLog.readIn(spark, dir, "k", Seq(-5L, 2000L))
    assert(sNone === 0 && none.count() === 0)
    assert(none.schema.fieldNames.toSeq === Seq("k", "v"))
  }

  test("IN probe on strings prunes via truncated bounds, exactly") {
    val dir = freshDir()
    val df = spark.range(0, 2600)
      .select(concat(chr(lit(97) + (col("id") / 100).cast("int") % 26),
        format_string("%04d", col("id"))).as("k"), col("id").as("v"))
      .repartitionByRange(6, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    val (got, scanned, total) =
      SnapshotLog.readIn(spark, dir, "k", Seq("c0200", "c0250"))
    assert(scanned < total, s"string IN scanned $scanned/$total")
    assert(got.count() === 2)
  }

  test("IN probe composes blooms: scattered layout still skips files") {
    val dir = freshDir()
    val df = spark.range(0, 4096)
      .select(md5(col("id").cast("string")).as("k"), col("id").as("v"))
      .repartition(8) // scattered — zone maps cannot prune
    SnapshotLog.commit(spark, dir, df)
    SnapshotLog.analyzeBlooms(spark, dir, Seq("k"),
      expectedItems = 1000, fpp = 0.01)
    val probes = df.filter(col("v").isin(0L, 4095L))
      .select("k").as[String].collect().toSeq
    val (got, scanned, total) = SnapshotLog.readIn(spark, dir, "k", probes)
    assert(got.count() === 2)
    assert(scanned < total, s"bloom IN scanned $scanned/$total")
    // absent values bloom-reject nearly everything
    val (absent, sA, _) =
      SnapshotLog.readIn(spark, dir, "k", Seq("nope-1", "nope-2"))
    assert(absent.count() === 0 && sA <= 2)
  }

  test("IN probe with an inexact value cannot prune but stays exact") {
    val dir = freshDir()
    val df = spark.range(0, 400)
      .select((col("id") * 25).cast("decimal(12,2)").as("amt"),
        col("id").as("v"))
      .repartitionByRange(4, col("amt"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("amt"))
    // 100.005 is unrepresentable at scale 2 — pruning must disable
    // (conservative), the residual keeps the result exact
    val (got, scanned, total) = SnapshotLog.readIn(spark, dir, "amt",
      Seq(new java.math.BigDecimal("100.005"),
        new java.math.BigDecimal("250.00")))
    assert(scanned === total)
    assert(got.count() === 1)
    // all-exact values prune again
    val (got2, s2, _) = SnapshotLog.readIn(spark, dir, "amt",
      Seq(new java.math.BigDecimal("250.00")))
    assert(s2 < total && got2.count() === 1)
  }

  test("IN probe on a partition column prunes by manifest tuple") {
    val dir = freshDir()
    val df = spark.range(0, 900).select(
      element_at(array(lit("eu"), lit("us"), lit("ap")),
        (col("id") % 3 + 1).cast("int")).as("region"),
      col("id").as("k")).repartitionByRange(3, col("k"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("region"), Seq("k"))
    val (got, scanned, total) =
      SnapshotLog.readIn(spark, dir, "region", Seq("eu", "ap"))
    assert(scanned < total, s"partition IN scanned $scanned/$total")
    assert(got.filter(col("region") === "us").count() === 0)
    assert(got.count() === 600)
  }

  test("IS NULL prunes no-null files via the recorded flag, exactly") {
    val dir = freshDir()
    // nulls live only in the high range — clustered so the flag varies
    val df = spark.range(0, 1000).select(col("id").as("k"),
      when(col("id") >= 900, lit(null).cast("long"))
        .otherwise(col("id") * 2).as("v"))
      .repartitionByRange(10, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k", "v"))
    val (got, scanned, total) = SnapshotLog.readFilter(spark, dir,
      Seq(Probe.IsNull("v")))
    assert(total === 10)
    assert(scanned < total, s"IS NULL scanned $scanned/$total")
    assert(got.count() === 100)
    assert(got.filter(col("v").isNotNull).count() === 0)
    // NOT NULL stays exact (stats cannot prune it; partition tuples can)
    val (nn, _, _) = SnapshotLog.readFilter(spark, dir,
      Seq(Probe.NotNull("v")))
    assert(nn.count() === 900)
  }

  test("IS NULL / NOT NULL prune by partition tuple incl. the null partition") {
    val dir = freshDir()
    val df = spark.range(0, 300).select(
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("r"), (col("id") % 3).cast("string")))
        .as("region"),
      col("id").as("k")).repartitionByRange(3, col("k"))
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("region"), Seq("k"))
    val (nulls, sN, total) = SnapshotLog.readFilter(spark, dir,
      Seq(Probe.IsNull("region")))
    assert(sN < total, s"null-partition prune scanned $sN/$total")
    assert(nulls.count() === 100)
    val (notNulls, sNN, _) = SnapshotLog.readFilter(spark, dir,
      Seq(Probe.NotNull("region")))
    assert(sNN < total)
    assert(notNulls.count() === 200)
  }

  test("one-sided ranges prune (>= lo only / <= hi only)") {
    val dir = freshDir()
    val df = spark.range(0, 1000).select(col("id").as("k"))
      .repartitionByRange(10, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    val (ge, sGe, total) = SnapshotLog.readFilter(spark, dir,
      Seq(Probe.Range("k", Some(900L), None)))
    assert(sGe < total && ge.count() === 100)
    val (le, sLe, _) = SnapshotLog.readFilter(spark, dir,
      Seq(Probe.Range("k", None, Some(99L))))
    assert(sLe < total && le.count() === 100)
  }

  test("readFilterSql: parsed predicate prunes ranges, IN, IS NULL; OR stays exact") {
    val dir = freshDir()
    val df = spark.range(0, 1000).select(
      element_at(array(lit("eu"), lit("us"), lit("ap")),
        (col("id") % 3 + 1).cast("int")).as("region"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") % 365).cast("int")).as("d"),
      when(col("id") >= 900, lit(null).cast("long"))
        .otherwise(col("id")).as("score"),
      col("id").as("k"))
      .repartitionByRange(10, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k", "score"))
    // conjunctive mixed predicate: range + IN (no region stats — the
    // conjunct contributes nothing, stays residual-only) + bare-string
    // coercion is NOT needed for k (long)
    val (got, scanned, total) = SnapshotLog.readFilterSql(spark, dir,
      "k >= 100 AND k <= 199 AND region IN ('eu','us')")
    assert(scanned < total)
    val expect = df.filter(col("k").between(100, 199) &&
      col("region").isin("eu", "us")).collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet === expect)
    // IS NULL conjunct prunes via the flag
    val (nulls, sNull, _) =
      SnapshotLog.readFilterSql(spark, dir, "score IS NULL")
    assert(sNull < total && nulls.count() === 100)
    // an OR tree prunes PER DISJUNCT (r10): union of the two point
    // probes' file sets — far fewer than all files, still exact
    val (ors, sOr, tOr) = SnapshotLog.readFilterSql(spark, dir,
      "k = 5 OR k = 950")
    assert(sOr < tOr, s"OR disjuncts did not prune: $sOr/$tOr")
    assert(ors.select("k").as[Long].collect().sorted === Array(5L, 950L))
  }

  test("readFilterSql: OR-of-ranges prunes to the union; AND-of-OR intersects; case-insensitive columns prune") {
    val dir = freshDir()
    val df = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") % 4).as("g"), (col("id") * 3).as("v"))
      .repartitionByRange(10, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k", "g"))
    // the retention-scan shape: day < a OR day > b — here k-bands
    val (got, scanned, total) = SnapshotLog.readFilterSql(spark, dir,
      "k < 100 OR k > 899")
    assert(scanned < total, s"OR of ranges scanned $scanned/$total")
    assert(got.select("k").as[Long].collect().sorted ===
      ((0L until 100L) ++ (900L until 1000L)).toArray)
    // a conjunct ANDed over the OR intersects on top of the union
    val (both, sBoth, tBoth) = SnapshotLog.readFilterSql(spark, dir,
      "(k < 100 OR k > 899) AND k >= 950")
    assert(sBoth < scanned, s"AND-of-OR did not tighten: $sBoth vs $scanned")
    assert(both.select("k").as[Long].collect().sorted ===
      (950L until 1000L).toArray)
    // an unprunable disjunct keeps its conjunct conservative but exact
    val (loose, sLoose, tLoose) = SnapshotLog.readFilterSql(spark, dir,
      "k < 10 OR v = k + 5000")
    assert(sLoose === tLoose) // v = k + 5000 cannot prune — keep all
    assert(loose.count() === 10)
    // case-mismatched column names resolve under the session's default
    // case-insensitive rules — they PRUNE instead of throwing
    val (ci, sCi, tCi) = SnapshotLog.readFilterSql(spark, dir,
      "K BETWEEN 100 AND 199")
    assert(sCi < tCi, s"case-mismatched probe did not prune: $sCi/$tCi")
    assert(ci.count() === 100)
  }

  test("readFilterSql coerces string literals under the column's type") {
    val dir = freshDir()
    val df = spark.range(0, 365)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")).as("d"), col("id").as("v"))
      .repartitionByRange(6, col("d"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("d"))
    val (got, scanned, total) = SnapshotLog.readFilterSql(spark, dir,
      "d BETWEEN '2024-03-01' AND '2024-03-31'")
    assert(scanned < total, s"coerced date prune scanned $scanned/$total")
    assert(got.count() === 31)
    // equality through coercion also prunes
    val (eq, sEq, _) = SnapshotLog.readFilterSql(spark, dir,
      "d = '2024-06-15'")
    assert(sEq < total && eq.count() === 1)
  }

  test("snapshot_filter TVF: pure-SQL pruned read matches the Scala API") {
    val dir = freshDir()
    val df = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 7).as("v")).repartitionByRange(10, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    val got = spark.sql(
      s"SELECT * FROM snapshot_filter('$dir', 'k IN (3, 501, 998)')")
    assert(got.select("k").as[Long].collect().sorted === Array(3L, 501L, 998L))
    // version pinning arg
    val v2 = SnapshotLog.commit(spark, dir,
      spark.range(1000, 1100).select(col("id").as("k"), (col("id") * 7).as("v")))
    val pinned = spark.sql(
      s"SELECT * FROM snapshot_filter('$dir', 'k >= 990', 1)")
    assert(pinned.count() === 10) // v1 stops at 999
    val latest = spark.sql(
      s"SELECT * FROM snapshot_filter('$dir', 'k >= 990', $v2)")
    assert(latest.count() === 100) // commit REPLACES: v2 is 1000..1099
  }

  test("legacy stats (no null flag) keep IS NULL conservative") {
    val dir = freshDir()
    val df = spark.range(0, 100).select(col("id").as("k"))
      .repartitionByRange(2, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    // strip the null flag back to the r8 format (LN:lo:hi:0 → L:lo:hi)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(dir, "_log/v1.manifest")
    val lines = scala.io.Source.fromInputStream(f.open(mp)).getLines().toList
    val legacy = lines.map(l =>
      if (l.startsWith("#filestat="))
        l.replaceAll(":LN:(-?\\d+):(-?\\d+):[01]", ":L:$1:$2")
      else l)
    assert(legacy != lines, "expected LN entries to rewrite")
    val out = f.create(mp, true)
    out.write((legacy.mkString("\n") + "\n").getBytes("UTF-8")); out.close()
    // no flag — IS NULL cannot prune, result still exact (empty)
    val (got, scanned, total) = SnapshotLog.readFilter(spark, dir,
      Seq(Probe.IsNull("k")))
    assert(scanned === total)
    assert(got.count() === 0)
    // and ranges still prune through the legacy entries
    val (ranged, sR, _) = SnapshotLog.readBetween(spark, dir, "k", 0L, 10L)
    assert(sR < total && ranged.count() === 11)
  }
}

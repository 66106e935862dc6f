package graft

import graft.dedup.{MinHashLsh, SimHash}
import graft.sim.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** LSH-family verification against exact ground truth (SURVEY.md §5.2 —
  * the hash-seed-sensitive paths that can never be DuckDB-oracled).
  * xxhash64 is deterministic, so these asserts are exact, not flaky.
  */
class LshSpec extends AnyFunSuite with SparkFixture {

  private def docs: DataFrame =
    Tables.documents(spark, Sf).select("doc_id", "text")

  /** Exact all-pairs Jaccard ≥ threshold over 3-shingles (O(n²) — fine at
    * sf0.001's 500 docs, and only ever run in tests). */
  private def exactPairs(threshold: Double): DataFrame = {
    val sh = MinHashLsh.withShingles(docs, "text", 3)
      .select(col("doc_id"), col("shingles"))
    val a = sh.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    val nInt = size(array_intersect(col("sh_a"), col("sh_b")))
    val jac = nInt.cast(DoubleType) /
      (size(col("sh_a")) + size(col("sh_b")) - nInt)
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  test("MinHash-LSH: sub-shingle-size docs neither crash the verify stage nor pair up") {
    import spark.implicits._
    // two docs below shingleSize share the sentinel signature; without the
    // eligibility filter they become a candidate pair whose Jaccard is
    // 0/0 — a DIVIDE_BY_ZERO crash under Spark 4's default ANSI mode
    val corpus = Seq(
      (1L, "hi"), (2L, "ok go"), // 1 and 2 tokens < shingleSize 3
      (3L, "scan row slow table value part hash merge"),
      (4L, "scan row slow table value part hash join")).toDF("doc_id", "text")
    val pairs = MinHashLsh.nearDuplicates(corpus, "doc_id", "text",
        MinHashLsh.Config(numHashes = 32, bands = 8, threshold = 0.2))
      .collect()
    assert(!pairs.exists(r => r.getLong(0) <= 2 || r.getLong(1) <= 2),
      "short docs must not form candidate pairs")
    assert(pairs.exists(r => r.getLong(0) == 3L && r.getLong(1) == 4L),
      "real near-dup pair lost")
  }

  test("MinHash-LSH: emitted pairs carry exact Jaccard and are a subset of truth") {
    val cfg = MinHashLsh.Config(numHashes = 32, bands = 8, threshold = 0.5)
    val lsh = MinHashLsh.nearDuplicates(docs, "doc_id", "text", cfg)
    val truth = exactPairs(0.5)
    // verify step computes exact jaccard → every emitted pair must appear
    // in the exact ground truth with the same value
    assert(lsh.exceptAll(truth).count() === 0,
      "LSH emitted a pair not in exact ground truth")
  }

  test("MinHash-LSH: high-similarity pairs are recalled") {
    val cfg = MinHashLsh.Config(numHashes = 32, bands = 8, threshold = 0.5)
    val lsh = MinHashLsh.nearDuplicates(docs, "doc_id", "text", cfg)
      .select("id_a", "id_b")
    val strong = exactPairs(0.8).select("id_a", "id_b")
    val nStrong = strong.count()
    val found = strong.intersect(lsh).count()
    // P[miss | j ≥ 0.8] = (1 − j⁴)⁸ ≤ 0.76⁴·... ≈ 1.2% per pair — and
    // xxhash64 is fixed, so this is a deterministic property of the corpus
    assert(nStrong > 0, "corpus has no planted strong near-dups at sf0.001")
    assert(found >= (nStrong * 0.8).toLong,
      s"recall too low: $found of $nStrong strong pairs")
  }

  test("cross-corpus LSH: exact subset of truth, strong cross pairs recalled") {
    // decontamination shape: probe = the ~1% eval split, corpus = the rest
    val probe = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val cfg = MinHashLsh.Config(numHashes = 32, bands = 8, threshold = 0.5)
    val cross = MinHashLsh.crossNearDuplicates(corpus, probe,
      "doc_id", "text", cfg)
    // ground truth: the same exact all-pairs Jaccard, restricted to
    // (corpus, probe) pairs in either id order
    val t = exactPairs(0.5)
    val truth = t.unionByName(t.select(col("id_b").as("id_a"),
        col("id_a").as("id_b"), col("jaccard")))
      .join(probe.select(col("doc_id").as("id_b")), "id_b")
      .join(corpus.select(col("doc_id").as("id_a")), "id_a")
      .select("id_a", "id_b", "jaccard")
    assert(cross.exceptAll(truth).count() === 0,
      "cross-LSH emitted a pair not in exact cross ground truth")
    val strong = truth.filter(col("jaccard") >= 0.8).select("id_a", "id_b")
    val nStrong = strong.count()
    val found = strong.intersect(cross.select("id_a", "id_b")).count()
    assert(found >= (nStrong * 0.8).toLong,
      s"cross recall too low: $found of $nStrong strong pairs")
  }

  test("hot-bucket salting: identical candidate set, fan-out split across salts") {
    import spark.implicits._
    // plant a pathological bucket: 40 docs sharing the exact same
    // boilerplate text land in the SAME (band, bucket) for every band,
    // plus a few distinct docs as background
    val boiler = "terms of service apply to all content on this page"
    val corpus = ((0 until 40).map(i => (i.toLong, boiler)) ++ Seq(
      (100L, "completely different text about spark shuffles and joins here"),
      (101L, "completely different text about spark shuffles and joins there"),
      (102L, "unrelated third document mentioning neither of the others")))
      .toDF("doc_id", "text")
    val cfg = MinHashLsh.Config(numHashes = 16, bands = 4)
    val buckets = MinHashLsh.bandBuckets(
      MinHashLsh.signatures(corpus, "doc_id", "text",
        cfg.shingleSize, cfg.numHashes), "doc_id", cfg)
    val salts = 8
    val plain = MinHashLsh.candidatePairs(buckets, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = MinHashLsh.candidatePairsSalted(buckets, "doc_id", salts)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot bucket really is hot (40·39/2 pairs), and salting must not
    // change the answer by a single pair
    assert(plain.size >= 40 * 39 / 2, s"hot bucket too cold: ${plain.size}")
    assert(salted === plain)
    // the skew is actually split: the hot bucket's 40 build rows spread
    // across the salted join keys, so no single (band, bucket, salt) key
    // holds more than a hash-uneven fraction of them
    val perKey = buckets
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)))
      .groupBy("band_id", "band_hash", "salt").count()
      .agg(max("count")).collect()(0).getLong(0)
    val unsaltedMax = buckets.groupBy("band_id", "band_hash").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(unsaltedMax === 40L, s"expected one 40-member bucket: $unsaltedMax")
    assert(perKey < unsaltedMax / 2,
      s"salting failed to split the hot key: max/key = $perKey")
  }

  test("SimHash: banding recall is exact for Hamming ≤ 3 (pigeonhole)") {
    val h = SimHash.signatures(docs, "doc_id", "text")
    val a = h.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = h.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
    val blocked = SimHash.nearDuplicates(docs, "doc_id", "text", maxDist = 3)
    assert(blocked.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(blocked).count() === 0)
  }

  test("ANN: bucket candidates rank with the same cosine as brute force") {
    val e = Tables.embeddings(spark, Sf)
    val ann = Ann.annTopK(e, "vec_id", "embedding", probeId = 0L, k = 10,
      nBits = 4).collect()
    assert(ann.nonEmpty, "probe bucket is empty at nBits=4")
    val brute = Ann.bruteTopK(e, "vec_id", "embedding", probeId = 0L, k = 2000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { r =>
      val (id, cos) = (r.getLong(0), r.getDouble(2))
      assert(math.abs(brute(id) - cos) < 1e-12,
        s"ANN cosine for $id diverges from brute force")
    }
  }

  test("ANN: identical vectors land in the same bucket") {
    val e = Tables.embeddings(spark, Sf).limit(50)
    val twice = e.union(e)
    val buckets = Ann.withBucket(twice, "embedding", nBits = 8)
      .groupBy("vec_id").agg(countDistinct("bucket").as("nb"))
    assert(buckets.filter(col("nb") =!= 1).count() === 0)
  }
}

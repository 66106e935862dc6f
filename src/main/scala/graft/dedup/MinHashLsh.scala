package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash + LSH near-duplicate detection — the 100 TB dedup path
  * (SURVEY.md §2.2-K impl row; north star BASELINE.json).
  *
  * Pipeline: word n-gram shingles → k-permutation minhash signature
  * (xxhash64 family, seeded by permutation index) → banded bucket keys →
  * equi-join on (band, bucket) for candidates → exact Jaccard verify.
  *
  * Scale design: the only shuffles are (a) the band-bucket equi-join and
  * (b) the verify join-back — never an all-pairs comparison. Bucket keys
  * are 8-byte longs (xxhash64), not strings. Candidate volume is bounded
  * by the banding parameters (P[bucket-collision] = 1 − (1 − j^r)^b for
  * Jaccard j), so skew from a hot bucket is the only risk — AQE's skew
  * join handles moderate cases, and [[candidatePairsSalted]] spreads a
  * pathological bucket across s join keys (identical candidate set,
  * LshSpec-verified) when a boilerplate-heavy corpus demands it. All expressions are built-ins inside codegen; no
  * UDFs, no MLlib dependency.
  *
  * The LSH output is hash-seed sensitive, so it is impl-only: the
  * DuckDB-checked oracle proxies are q_dedup_near / q_dedup_ngram
  * (deterministic prefix blocking + exact Jaccard), and LshSpec asserts
  * recall against exact n-gram Jaccard ground truth.
  */
object MinHashLsh {

  /** Banding configuration. numHashes = bands · rowsPerBand. */
  final case class Config(
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** Distinct word n-gram shingle expression over `textCol` (empty array
    * for texts shorter than n tokens). NOTE: `split` inside a lambda is
    * re-evaluated per element — always tokenize into a column first
    * ([[withShingles]] does) and pass the token column name here.
    *
    * These HOFs (`transform`/`slice`/`concat_ws`) run interpreted, not
    * codegen'd, and allocate a string per shingle — fine for the
    * candidate-verify stage and test ground truth (both touch a vanishing
    * fraction of the corpus), but the corpus-wide signature pass must NOT
    * go through them: [[signatures]] hashes token chains natively instead. */
  def shingleExpr(toksCol: String, n: Int): String =
    s"""array_distinct(transform(
       |  sequence(1, greatest(size($toksCol) - ${n - 1}, 0)),
       |  i -> concat_ws(' ', slice($toksCol, i, $n))))""".stripMargin

  /** Distinct word n-gram shingles per document. */
  def withShingles(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("shingles", expr(shingleExpr("__toks", n)))
      .drop("__toks")

  /** k-minhash signature as k flat columns m0..m{k-1}, straight from the
    * tokenized text: mj = min over n-token shingles of hashLong(chain, j),
    * where `chain` left-folds the per-token xxhash64 values
    * ([[graft.functions.HashExprs.MinHashSig]]). Mixing one 8-byte
    * shingle hash with the permutation index makes the k hash functions
    * independent draws from the xxhash64 family.
    *
    * Execution shape (round 3): ONE codegen'd loop per document — zero
    * explode, zero shuffle, zero shingle-string allocation. The round-2
    * explode → hash → groupBy(id)-with-k-min-aggs shape paid a full row
    * explosion plus a shuffle to compute what is a pure per-row function,
    * and the LSH candidate self-join evaluated that subplan twice (once
    * per join side); its shingle-string HOF input was the residual
    * bottleneck (interpreted, one string alloc per shingle per side). A
    * document with fewer than n tokens yields a Long.MaxValue-sentinel
    * signature; [[nearDuplicates]] filters such docs out BEFORE banding —
    * they have no shingles to compare (Jaccard undefined: 0/0 throws
    * under Spark 4's default ANSI mode), and all of them share the one
    * sentinel band bucket, which would otherwise grow O(m²) candidates. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 n: Int, k: Int): DataFrame =
    docs.withColumn("__sig",
        graft.functions.HashExprs.minHashSig(split(col(textCol), " "), n, k))
      .select(col(idCol) +:
        (0 until k).map(j => element_at(col("__sig"), j + 1).as(s"m$j")): _*)

  /** Explode each signature into its band buckets:
    * (id, band_id, band_hash) where band_hash = xxhash64 over the band's
    * signature rows — an 8-byte join key. */
  def bandBuckets(sigs: DataFrame, idCol: String, cfg: Config): DataFrame = {
    val r = cfg.rowsPerBand
    val bandHashes = (0 until cfg.bands).map { b =>
      xxhash64((lit(b) +: (0 until r).map(i => col(s"m${b * r + i}"))): _*)
    }
    sigs.select(col(idCol),
      posexplode(array(bandHashes: _*)).as(Seq("band_id", "band_hash")))
  }

  /** Candidate pairs: ids sharing any (band, bucket), a < b, deduped. */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col(idCol).as("id_a"), col("band_id"), col("band_hash"))
    val b = buckets.select(col(idCol).as("id_b"),
      col("band_id").as("band_id_b"), col("band_hash").as("band_hash_b"))
    a.join(b, col("band_id") === col("band_id_b")
        && col("band_hash") === col("band_hash_b")
        && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** [[candidatePairs]] with HOT-BUCKET SALTING — the skew mitigation for
    * a pathological corpus (one boilerplate string shared by millions of
    * docs puts them all in one (band, bucket) key, and that single
    * reducer owns an m² pair blow-up). The left side takes
    * salt = xxhash64(id) mod s; the right side replicates each bucket row
    * to ALL s salts; the join key grows by salt. The candidate set is
    * IDENTICAL to the unsalted join — every (a, b) pair still meets
    * exactly once, at b's replica carrying a's salt — but a bucket of m
    * members now spreads across s join keys of ~m/s build rows each, so
    * no task sees the full m² fan-out. Costs an s× replication of the
    * (8-byte, id-only) right side; use when AQE skew splitting alone
    * cannot cut it. */
  def candidatePairsSalted(buckets: DataFrame, idCol: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be positive")
    val a = buckets.select(col(idCol).as("id_a"), col("band_id"),
      col("band_hash"), pmod(xxhash64(col(idCol)), lit(salts)).as("salt"))
    val b = buckets.select(col(idCol).as("id_b"),
        col("band_id").as("band_id_b"), col("band_hash").as("band_hash_b"))
      .withColumn("salt_b",
        explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    a.join(b, col("band_id") === col("band_id_b")
        && col("band_hash") === col("band_hash_b")
        && col("salt") === col("salt_b")
        && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** End-to-end: candidates verified with exact Jaccard over the shingle
    * sets, thresholded. Output: (id_a, id_b, jaccard).
    *
    * The corpus-wide pass computes only token-chain signatures (no
    * shingle strings); the verify step materializes string shingles only
    * for the candidate pairs, which are a vanishing fraction of the
    * corpus — cheaper than shuffling the full shingle arrays through two
    * join-backs. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     cfg: Config = Config()): DataFrame = {
    // drop sub-n-token docs: no shingles → Jaccard is 0/0 (ANSI error),
    // and their shared sentinel signature would bucket them all together
    val eligible = docs.select(idCol, textCol)
      .filter(size(split(col(textCol), " ")) >= cfg.shingleSize)
    val sigs = signatures(eligible, idCol, textCol,
      cfg.shingleSize, cfg.numHashes)
    val cands = candidatePairs(bandBuckets(sigs, idCol, cfg), idCol)
    val texts = docs.select(col(idCol), col(textCol))
    verifyJaccard(cands,
      texts.select(col(idCol).as("id_a"), col(textCol).as("text_a")),
      texts.select(col(idCol).as("id_b"), col(textCol).as("text_b")),
      cfg)
  }

  /** Cross-corpus near-duplicates: corpus docs whose Jaccard to any PROBE
    * doc clears the threshold — near-dup decontamination (q_decontaminate
    * flags exact n-gram overlap; this catches lightly-edited eval leaks
    * that exact match misses). Output: (id_a = corpus id, id_b = probe id,
    * jaccard).
    *
    * Scale shape: the probe set (an eval benchmark) is orders of
    * magnitude smaller than the corpus, so its band buckets are BROADCAST
    * — the 100 TB corpus side is map-only probed, never shuffled;
    * signatures are one codegen'd pass per side as in [[nearDuplicates]].
    * Ids may collide across tables (separate id spaces), so unlike the
    * self-join there is no `a < b` trick — dedup is by the (id_a, id_b)
    * pair itself. */
  def crossNearDuplicates(corpus: DataFrame, probe: DataFrame,
                          idCol: String, textCol: String,
                          cfg: Config = Config()): DataFrame = {
    def eligible(df: DataFrame): DataFrame = df.select(idCol, textCol)
      .filter(size(split(col(textCol), " ")) >= cfg.shingleSize)
    def buckets(df: DataFrame): DataFrame =
      bandBuckets(signatures(eligible(df), idCol, textCol,
        cfg.shingleSize, cfg.numHashes), idCol, cfg)
    val bc = buckets(corpus).select(col(idCol).as("id_a"),
      col("band_id"), col("band_hash"))
    val bp = buckets(probe).select(col(idCol).as("id_b"),
      col("band_id").as("band_id_b"), col("band_hash").as("band_hash_b"))
    val cands = bc.join(broadcast(bp),
        col("band_id") === col("band_id_b")
          && col("band_hash") === col("band_hash_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccard(cands,
      corpus.select(col(idCol).as("id_a"), col(textCol).as("text_a")),
      broadcast(probe.select(col(idCol).as("id_b"), col(textCol).as("text_b"))),
      cfg)
  }

  /** Shared exact-Jaccard verify stage: join candidate pairs back to both
    * texts, shingle, threshold. The ONE copy of the verify math — the
    * self-join ([[nearDuplicates]]) and cross-corpus
    * ([[crossNearDuplicates]]) paths must never drift apart. */
  private def verifyJaccard(cands: DataFrame, textsA: DataFrame,
                            textsB: DataFrame, cfg: Config): DataFrame = {
    val nInt = size(array_intersect(col("sh_a"), col("sh_b")))
    val jac = nInt.cast(DoubleType) /
      (size(col("sh_a")) + size(col("sh_b")) - nInt)
    cands
      .join(textsA, "id_a")
      .join(textsB, "id_b")
      .withColumn("toks_a", split(col("text_a"), " "))
      .withColumn("toks_b", split(col("text_b"), " "))
      .withColumn("sh_a", expr(shingleExpr("toks_a", cfg.shingleSize)))
      .withColumn("sh_b", expr(shingleExpr("toks_b", cfg.shingleSize)))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= cfg.threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}

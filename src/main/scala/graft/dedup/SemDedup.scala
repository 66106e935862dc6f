package graft.dedup

import graft.sim.Ivf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Semantic deduplication — cluster-then-dedup over an embedding column
  * (SemDeDup, Abbas et al. 2023, arXiv:2303.09540): quantize the corpus
  * with a k-means coarse quantizer, then compare vectors ONLY within
  * their cluster; a vector is a semantic duplicate if some lower-id
  * cluster-mate lies within the cosine threshold. Completes the dedup
  * suite's embedding leg: exact (hash), prefix, n-gram, MinHash-LSH,
  * SimHash, bounded-window cosine (q_dedup_embed) — and now
  * cluster-blocked cosine, the published shape for "these two documents
  * say the same thing in different words".
  *
  * Scale design: the quantizer is bounded model state (the Ivf pattern —
  * k centroid rows collected once, assignment a zero-shuffle codegen'd
  * [[graft.functions.VectorExprs.NearestCentroid]] map). The pair stage
  * is an EQUI-join on list_id — never all-pairs across the corpus; its
  * per-cluster cost is quadratic in cluster size, which is the knob the
  * caller controls: k grows with the corpus (clusters stay
  * constant-sized) and [[graft.sim.Ivf.splitHotLists]] splits any list
  * the seeding left hot, so no single task ever sees a super-sized
  * cluster. The assigned+normed frame is lazily localCheckpoint'ed
  * (the GraphOps precedent): it feeds three consumers (both join sides
  * and the final verdict join), and without truncation each would
  * re-scan the corpus and re-run assignment. Cosines are snapped to
  * integer micro-units before the threshold compare, so the dup
  * decision is an integer compare — deterministic across engines,
  * layouts and fold-order-preserving re-runs.
  */
object SemDedup {

  /** `list_id` (from Ivf.assign) and `nrm` are working columns; inputs
    * carrying either would be silently clobbered — refuse instead. */
  private def requireCleanColumns(df: DataFrame, who: String): Unit =
    Seq("list_id", "nrm").foreach(c =>
      require(!df.columns.contains(c),
        s"$who: input already has a '$c' column — rename it first " +
          "(it is a reserved working column here)"))

  /** The one snapped-cosine rule both dedup paths share: cosine of the
    * (emb_a, emb_b) pair in integer micro-units, floor(x·1e6 + 0.5). */
  private def cos6: Column =
    floor(graft.functions.VectorExprs.dotVec(col("emb_a"), col("emb_b")) /
      (col("nrm_a") * col("nrm_b")) * 1e6 + 0.5).cast(LongType)

  /** Assign to the quantizer + attach the L2 norm, lazily checkpointed
    * so the three downstream consumers share one materialization. */
  private def assignNormed(df: DataFrame, cents: DataFrame, idCol: String,
                           embCol: String): DataFrame =
    Ivf.assign(df, cents, idCol, embCol)
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.norm2(col(embCol))))
      .localCheckpoint(false)

  private def aProjection(assigned: DataFrame, idCol: String,
                          embCol: String): DataFrame =
    assigned.select(col("list_id"), col(idCol).as("id_a"),
      col(embCol).as("emb_a"), col("nrm").as("nrm_a"))

  private def bProjection(assigned: DataFrame, idCol: String,
                          embCol: String): DataFrame =
    assigned.select(col("list_id").as("list_b"), col(idCol).as("id_b"),
      col(embCol).as("emb_b"), col("nrm").as("nrm_b"))

  /** Per-vector dup verdicts: input columns + (list_id, is_dup).
    * `tauMicro` is the cosine threshold in 1e-6 units (e.g. 950000 =
    * 0.95). A vector is a dup iff a lower-`idCol` member of its cluster
    * has snapped cosine ≥ tauMicro — the deterministic "keep the
    * smallest id per semantic ball" election. `maxListSize` > 0 splits
    * hot lists before pairing: `splitRounds` = 1 (default) runs the
    * single halving round, larger values iterate toward the fixpoint
    * ([[graft.sim.Ivf.splitHotListsToFixpoint]]) — the adversarial-skew
    * setting, bounding every cluster (and so the quadratic pair term)
    * at maxListSize except exact-duplicate clumps no plane can cut. */
  def verdicts(df: DataFrame, idCol: String, embCol: String,
               seedCol: String, tauMicro: Long, iters: Int = 2,
               maxListSize: Int = 0, splitRounds: Int = 1): DataFrame = {
    requireCleanColumns(df, "SemDedup.verdicts")
    verdictsWith(df, Ivf.centroidsIter(df, embCol, seedCol, iters),
      idCol, embCol, tauMicro, maxListSize, splitRounds)
  }

  /** [[verdicts]] under a CALLER-SUPPLIED quantizer (list_id, centroid)
    * — the frozen-quantizer path: a quantizer trained once (e.g. the
    * `Maintain train-quantizer` artifact) makes daily batch verdicts
    * stable across runs, exactly the reason the incremental/streaming
    * paths freeze theirs. Training determinism makes the two entry
    * points interchangeable: verdicts(df, …) ==
    * verdictsWith(df, centroidsIter(df, …), …) by construction. */
  def verdictsWith(df: DataFrame, cents: DataFrame, idCol: String,
                   embCol: String, tauMicro: Long, maxListSize: Int = 0,
                   splitRounds: Int = 1): DataFrame = {
    requireCleanColumns(df, "SemDedup.verdictsWith")
    val cents2 =
      if (maxListSize > 0)
        Ivf.splitHotListsToFixpoint(df, cents, embCol, maxListSize,
          maxRounds = splitRounds)
      else cents
    val assigned = assignNormed(df, cents2, idCol, embCol)
    // equi-join on the cluster id; the id inequality only prunes pairs.
    // Snap BEFORE the threshold so the verdict is an integer compare.
    val dupIds = aProjection(assigned, idCol, embCol)
      .join(bProjection(assigned, idCol, embCol),
        col("list_id") === col("list_b") && col("id_a") < col("id_b"))
      .withColumn("cos6", cos6)
      .filter(col("cos6") >= tauMicro)
      .select(col("id_b").as("dup_id"))
      .distinct()
    assigned.join(dupIds, col(idCol) === col("dup_id"), "left")
      .withColumn("is_dup", col("dup_id").isNotNull)
      .drop("dup_id", "nrm")
  }

  /** Per-cluster dedup report: (list_id, n_vecs, n_dups, n_kept),
    * ordered by list_id. The aggregate is cluster-grain — bounded by the
    * quantizer size, not the corpus. */
  def report(df: DataFrame, idCol: String, embCol: String, seedCol: String,
             tauMicro: Long, iters: Int = 2, maxListSize: Int = 0): DataFrame =
    verdicts(df, idCol, embCol, seedCol, tauMicro, iters, maxListSize)
      .groupBy("list_id")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"),
        sum(when(col("is_dup"), 0L).otherwise(1L)).as("n_kept"))
      .orderBy("list_id")

  /** INCREMENTAL semantic dedup — the daily-ingest shape (the embedding
    * twin of the q_dedup_incr text path): classify ONLY the incoming
    * `delta` against the standing `corpus`, under the corpus-trained
    * (frozen) quantizer. The ingest rule: a delta vector is a dup iff
    * some same-cluster CORPUS vector (corpus members always win — they
    * are already accepted) or some LOWER-id same-cluster delta vector
    * lies within the snapped-cosine threshold.
    *
    * Cost is O(Δ · cluster), never corpus² and never corpus-driven: the
    * pair join is delta-driven on the cluster id, the corpus side
    * arrives pre-assigned from its catalog/parquet home (here re-derived
    * for a self-contained call), and re-training is a deliberate
    * OFFLINE event — a frozen quantizer is what makes yesterday's
    * verdicts stable under today's ingest. SemDedupSpec pins the
    * verdicts against a sequential reference of exactly this rule and
    * proves the closure law: no kept delta vector is within τ of any
    * corpus cluster-mate. Output: delta columns + (list_id, is_dup). */
  def incrementalVerdicts(corpus: DataFrame, delta: DataFrame, idCol: String,
                          embCol: String, seedCol: String, tauMicro: Long,
                          iters: Int = 2): DataFrame = {
    requireCleanColumns(corpus, "SemDedup.incrementalVerdicts")
    requireCleanColumns(delta, "SemDedup.incrementalVerdicts")
    val cents = Ivf.centroidsIter(corpus, embCol, seedCol, iters)
    ingestVerdicts(assignNormed(corpus, cents, idCol, embCol),
      assignNormed(delta, cents, idCol, embCol), idCol, embCol, tauMicro)
  }

  /** The ingest rule over PRE-ASSIGNED frames (both carrying list_id +
    * nrm): the seam [[graft.streaming.SemDedupStream]] uses so its
    * accepted-vector store — persisted with assignment and norm — never
    * re-runs the quantizer on the state side. Output: `da`'s columns
    * with is_dup, nrm dropped. */
  private[graft] def ingestVerdicts(ca: DataFrame, da: DataFrame,
                                    idCol: String, embCol: String,
                                    tauMicro: Long): DataFrame = {
    // candidate "a" side: every corpus member, plus delta members (the id
    // inequality below restricts those to lower ids)
    val aSide = aProjection(ca, idCol, embCol)
      .withColumn("is_corpus_a", lit(true))
      .unionByName(aProjection(da, idCol, embCol)
        .withColumn("is_corpus_a", lit(false)))
    val dupIds = aSide.join(bProjection(da, idCol, embCol),
        col("list_id") === col("list_b") &&
          (col("is_corpus_a") || col("id_a") < col("id_b")))
      .withColumn("cos6", cos6)
      .filter(col("cos6") >= tauMicro)
      .select(col("id_b").as("dup_id"))
      .distinct()
    da.join(dupIds, col(idCol) === col("dup_id"), "left")
      .withColumn("is_dup", col("dup_id").isNotNull)
      .drop("dup_id", "nrm")
  }

  /** Assignment + norm as a PUBLIC projection for state persistence:
    * (input columns + list_id + nrm). What [[ingestVerdicts]] expects on
    * both sides; a stream's accepted store writes exactly this. */
  def assignForStore(df: DataFrame, cents: DataFrame, idCol: String,
                     embCol: String): DataFrame = {
    requireCleanColumns(df, "SemDedup.assignForStore")
    Ivf.assign(df, cents, idCol, embCol)
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.norm2(col(embCol))))
  }

  /** Per-cluster report over [[incrementalVerdicts]]:
    * (list_id, n_delta, n_dups, n_kept), ordered by list_id. */
  def incrementalReport(corpus: DataFrame, delta: DataFrame, idCol: String,
                        embCol: String, seedCol: String, tauMicro: Long,
                        iters: Int = 2): DataFrame =
    incrementalVerdicts(corpus, delta, idCol, embCol, seedCol, tauMicro,
        iters)
      .groupBy("list_id")
      .agg(count(lit(1)).as("n_delta"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"),
        sum(when(col("is_dup"), 0L).otherwise(1L)).as("n_kept"))
      .orderBy("list_id")
}

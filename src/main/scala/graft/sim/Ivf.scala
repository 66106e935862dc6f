package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF-style ANN (the "IVF variant" of the north-star brief): a coarse
  * quantizer partitions the corpus into inverted lists; a probe searches
  * only the nProbe nearest lists.
  *
  * The quantizer trains with k DETERMINISTIC Lloyd iterations
  * ([[centroidsIter]]): iteration 1 is the label-seeded means (no RNG,
  * so tests are exact); each further iteration reassigns every vector to
  * its nearest centroid and recomputes the per-list means — plain Lloyd,
  * one distributed aggregate per iteration. Oversized lists split along
  * their highest-variance dimension ([[splitHotLists]]): at 100 TB the
  * list id becomes the partition/bucket key, so a probe reads nProbe
  * partitions instead of the whole corpus, and list sizes are the skew
  * knob (hot-list splitting, like IVF-PQ systems do).
  *
  * The quantizer itself is MODEL state, not data: lists × dim doubles
  * (4096 lists × 64 dims ≈ 2 MB), bounded and data-size-independent. It is
  * collected to the driver once and inlined into the assignment expression
  * as literals, so assignment is a zero-shuffle, zero-join, fully
  * codegen'd map over the corpus — the round-2 version instead
  * crossJoined every vector with the centroid frame through an
  * interpreted `aggregate()` lambda and then joined the argmin back by
  * id (two extra shuffles plus per-row interpretation).
  */
object Ivf {

  /** Per-seed-list centroids as DOUBLE arrays: (list_id, centroid). */
  def centroids(df: DataFrame, embCol: String, seedCol: String): DataFrame =
    df.select(col(seedCol).cast(LongType).as("list_id"),
        posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("list_id", "pos")
      .agg(avg(col("v").cast(DoubleType)).as("mean_v"))
      .groupBy("list_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_v"))))
        .as("pairs"))
      .select(col("list_id"),
        expr("transform(pairs, p -> p.mean_v)").as("centroid"))

  /** k deterministic Lloyd iterations: iteration 1 is the label-seeded
    * means; each further iteration reassigns every vector to its nearest
    * centroid (ties to the smallest list_id) and recomputes per-list
    * means. No RNG anywhere, so a given corpus + seed column always
    * yields the same quantizer. A list that loses all members simply
    * disappears (classic Lloyd). Cost: one aggregate over the corpus per
    * iteration; the inter-iteration state is the bounded quantizer. */
  def centroidsIter(df: DataFrame, embCol: String, seedCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "need at least one Lloyd iteration")
    (2 to iters).foldLeft(centroids(df, embCol, seedCol)) { (c, _) =>
      centroids(assign(df, c, "", embCol), embCol, "list_id")
    }
  }

  /** One hot-list split round (the IVF skew knob): every list holding
    * more than `maxListSize` vectors is cut in two at its MEMBER mean
    * along its highest-variance dimension (FP ties → smallest dimension
    * index); the low half keeps the list id, the high half gets a fresh
    * id above the current max, and BOTH children are re-centered to
    * their member means. Splitting at the member mean (not the possibly
    * stale input centroid) guarantees both halves are non-empty whenever
    * the dimension has any variance. Cold lists keep their ids and
    * centroids untouched. Deterministic — the split plane is derived,
    * not sampled. Call again if a child is still hot (each round halves
    * the worst case).
    *
    * Degenerate hot lists — every member identical, zero variance on
    * every dimension — cannot be separated by any plane (and splitting
    * exact duplicates would not reduce probe cost anyway: one probe
    * would just hit both children). Such a list is returned UNCHANGED,
    * so `splitHotLists(df, cents, …) == cents` is the explicit
    * termination signal: a caller looping until no list is hot must also
    * stop at this fixpoint instead of iterating forever. */
  def splitHotLists(df: DataFrame, cents: DataFrame, embCol: String,
      maxListSize: Long): DataFrame = {
    val cs = collectCentroids(cents)
    val assigned = assignLit(df, cs, embCol)
    // lists-sized model state: sizes, then per-hot-list split dimension
    val sizes = assigned.groupBy("list_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hot = cs.map(_._1).filter(l => sizes.getOrElse(l, 0L) > maxListSize)
    if (hot.isEmpty) return cents
    // per hot list: highest-variance dimension + the MEMBER mean along it
    // (ties → smallest index). var == 0 on the best dimension means every
    // member is identical — unsplittable, excluded below.
    val splitPlane: Map[Long, (Int, Double, Double)] = assigned
      .filter(col("list_id").isin(hot: _*))
      .select(col("list_id"), posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("list_id", "pos")
      .agg(var_pop(col("v").cast(DoubleType)).as("varv"),
        avg(col("v").cast(DoubleType)).as("meanv"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (lid, rows) =>
        val (negVar, pos, mean) =
          rows.map(r => (-r.getDouble(2), r.getInt(1), r.getDouble(3))).min
        lid -> ((pos, mean, -negVar))
      }
    val splittable = hot.filter(l => splitPlane(l)._3 > 0.0)
    if (splittable.isEmpty) return cents // all-duplicate fixpoint: signal
    val newId: Map[Long, Long] = {
      val maxLid = cs.map(_._1).max
      splittable.sorted.zipWithIndex
        .map { case (l, i) => l -> (maxLid + 1 + i) }.toMap
    }
    val reassigned = splittable.foldLeft(col("list_id")) { (acc, l) =>
      val (d, mean, _) = splitPlane(l)
      when(col("list_id") === l &&
        element_at(col(embCol), d + 1).cast(DoubleType) > mean,
        lit(newId(l))).otherwise(acc)
    }
    val hotChildren = centroids(
      assigned.filter(col("list_id").isin(splittable: _*))
        .withColumn("list_id", reassigned),
      embCol, "list_id")
    cents.filter(!col("list_id").isin(splittable: _*))
      .unionByName(hotChildren)
  }

  /** [[splitHotLists]] iterated to its FIXPOINT (bounded by `maxRounds`):
    * the loop the single-round scaladoc tells adversarial-skew call
    * sites to run, packaged so they cannot get the termination test
    * wrong. Each round halves the worst hot list, so rounds needed ≈
    * log2(hottest/maxListSize); the fixpoint signal is splitHotLists
    * returning its INPUT (same reference — no frame comparison needed),
    * which covers both "nothing hot" and "hot but degenerate"
    * (all-identical members, unsplittable by any plane). On return,
    * every list is either within `maxListSize` or an exact-duplicate
    * clump no plane can cut (and splitting exact duplicates would not
    * reduce pair cost anyway). Per round: one assignment pass + a
    * lists-sized collect — bounded model state, the Ivf contract. */
  def splitHotListsToFixpoint(df: DataFrame, cents: DataFrame,
      embCol: String, maxListSize: Long, maxRounds: Int = 16): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var cur = cents
    var i = 0
    while (i < maxRounds) {
      val next = splitHotLists(df, cur, embCol, maxListSize)
      if (next eq cur) return cur
      cur = next; i += 1
    }
    cur
  }

  /** Materialize the (tiny, bounded) quantizer: (list_id, centroid) sorted
    * by list_id. */
  private def collectCentroids(cents: DataFrame): Seq[(Long, Array[Double])] =
    cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq

  /** Assign every vector to its nearest centroid (one Lloyd step).
    * Output: df columns + list_id. Nearest list per vector, FP ties broken
    * to the smallest list_id for determinism — the old
    * min(struct(d2, list_id)) semantics, now a single codegen'd loop
    * ([[graft.functions.VectorExprs.NearestCentroid]]) instead of a
    * megabyte-scale unrolled tree. */
  def assign(df: DataFrame, cents: DataFrame, idCol: String,
             embCol: String): DataFrame =
    assignLit(df, collectCentroids(cents), embCol)

  private def assignLit(df: DataFrame, cs: Seq[(Long, Array[Double])],
                        embCol: String): DataFrame =
    df.withColumn("list_id",
      graft.functions.VectorExprs.nearestCentroid(col(embCol),
        cs.map(_._2).toArray, cs.map(_._1).toArray))

  /** IVF top-k: search only the nProbe lists nearest to the probe vector.
    * Output: (idCol, list_id, cos_sim), the k best candidates.
    *
    * The probe is one row — its vector and the quantizer distances are
    * driver-side scalar math; the corpus-side work is a single filtered
    * scan (list_id ∈ probed) with an unrolled-literal dot product feeding
    * TakeOrderedAndProject. The fold shapes mirror [[Ann.bruteTopK]]
    * term-for-term so probed cosines are bit-identical to brute force
    * (IvfSpec asserts < 1e-12). */
  def probeTopK(df: DataFrame, idCol: String, embCol: String, seedCol: String,
                probeId: Long, k: Int, nProbe: Int,
                iters: Int = 1): DataFrame = {
    val cs = collectCentroids(centroidsIter(df, embCol, seedCol, iters))
    // an absent probe id yields an empty result, not a crash — lookups
    // for deleted/unknown ids are a normal caller path
    val probeRow = df.filter(col(idCol) === probeId)
      .select(col(embCol)).limit(1).collect().headOption match {
      case Some(r) => r
      case None => return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          // id keeps the INPUT's dtype — a content-dependent schema flip
          // between the found and absent paths would break consumers
          org.apache.spark.sql.types.StructField(idCol,
            df.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("list_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cos_sim",
            org.apache.spark.sql.types.DoubleType))))
    }
    val probe = probeRow.getSeq[Float](0).map(_.toDouble).toArray
    probeOne(df, cs, idCol, embCol, probe, probeId, k, nProbe)
  }

  /** One probe against an ALREADY-TRAINED quantizer — the scoring core
    * shared by [[probeTopK]] and [[multiProbeTopK]]. Driver-side: the
    * nProbe nearest lists; executor-side: one filtered scan feeding
    * TakeOrderedAndProject. */
  private def probeOne(df: DataFrame, cs: Seq[(Long, Array[Double])],
      idCol: String, embCol: String, probe: Array[Double], probeId: Long,
      k: Int, nProbe: Int): DataFrame = {
    val probedLists = cs.map { case (lid, c) =>
      val d2 = probe.indices.foldLeft(0.0) { (acc, i) =>
        acc + (probe(i) - c(i)) * (probe(i) - c(i))
      }
      (d2, lid)
    }.sorted.take(nProbe).map(_._2)

    import graft.functions.VectorExprs.{dotLit, norm2}
    val dot = dotLit(col(embCol), probe)
    val normSelf = sqrt(norm2(col(embCol)))
    val normProbe = lit(math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x)))

    assignLit(df, cs, embCol)
      .filter(col("list_id").isin(probedLists: _*) && col(idCol) =!= probeId)
      .withColumn("cos_sim", dot / (normSelf * normProbe))
      .select(col(idCol), col("list_id"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Batch-of-probes IVF top-k: train the quantizer ONCE, then answer
    * every probe against it — the shape a recall dashboard or an
    * offline eval wants ([[probeTopK]] re-trains per call, which is k
    * probes × k-means at scale). Output: (probe_id, idCol, list_id,
    * cos_sim), k rows per FOUND probe id (absent ids contribute no
    * rows). Each probe's cosines are bit-identical to its single-probe
    * call — same quantizer, same fold shapes. */
  def multiProbeTopK(df: DataFrame, idCol: String, embCol: String,
      seedCol: String, probeIds: Seq[Long], k: Int, nProbe: Int,
      iters: Int = 1): DataFrame = {
    require(probeIds.nonEmpty, "need at least one probe id")
    val cs = collectCentroids(centroidsIter(df, embCol, seedCol, iters))
    // bounded collect: |probeIds| vectors
    val probes = df.filter(col(idCol).isin(probeIds: _*))
      .select(col(idCol), col(embCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    probeIds.filter(probes.contains).map { pid =>
      probeOne(df, cs, idCol, embCol, probes(pid), pid, k, nProbe)
        .select(lit(pid).as("probe_id"), col(idCol), col("list_id"),
          col("cos_sim"))
    }.reduce(_.unionByName(_))
  }
}

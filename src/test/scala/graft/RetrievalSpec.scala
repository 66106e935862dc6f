package graft

import graft.ops.{RetrievalOps, TextRankOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the retrieval/passage operators (cross-engine
  * value equality is the driver's DuckDB gate; these pin the semantics the
  * oracle can't see — brute-force parity, rank laws, fusion arithmetic). */
class RetrievalSpec extends AnyFunSuite with SparkFixture {

  test("q_dedup_passage: matches a brute-force shingle cross-check") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .as[(Long, Seq[String])].collect()
    // brute force: per-doc distinct 8-gram set, then cross-doc membership
    val sets = docs.collect { case (id, t) if t.length >= 8 =>
      id -> t.sliding(8).map(_.mkString(" ")).toSet
    }
    val expect = sets.map { case (id, sh) =>
      val others = sets.filter(_._1 != id)
      val dup = sh.count(g => others.exists(_._2.contains(g)))
      (id, sh.size.toLong, dup.toLong, dup.toLong * 1000 / sh.size)
    }.sortBy(_._1).toSeq
    val got = RetrievalOps.passageDedup.fn(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
    // short docs (< 8 tokens) are excluded by construction, not zeroed
    val shortIds = docs.collect { case (id, t) if t.length < 8 => id }.toSet
    assert(got.map(_._1).toSet.intersect(shortIds).isEmpty)
  }

  test("q_dedup_passage_incr: matches a brute-force screen of batch vs standing") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .as[(Long, Seq[String])].collect()
    def shingles(t: Seq[String]) =
      if (t.length >= 8) t.sliding(8).map(_.mkString(" ")).toSet
      else Set.empty[String]
    val standing = docs.collect { case (id, t) if id % 5 != 0 => shingles(t) }
      .fold(Set.empty[String])(_ ++ _)
    val expect = docs.collect { case (id, t) if id % 5 == 0 && t.length >= 8 =>
      val sh = shingles(t)
      val seen = sh.count(standing)
      (id, sh.size.toLong, seen.toLong,
        (sh.size - seen).toLong * 1000 / sh.size)
    }.sortBy(_._1).toSeq
    val got = RetrievalOps.passageIncr.fn(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    // screening, not in-batch dedup: two incoming docs sharing a shingle
    // absent from standing both count it as novel
    assert(got.nonEmpty)
  }

  test("q_dedup_passage_clean: matches a sequential reference of the removal rule") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    // sequential reference: owner(h) = lowest doc_id containing shingle h;
    // in every other doc, tokens under any occurrence of h are removed
    val owner = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, t) =>
      if (t.length >= 8)
        t.sliding(8).foreach { g =>
          val k = g.mkString(" ")
          if (!owner.contains(k)) owner(k) = id
        }
    }
    val expect = docs.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      if (t.length >= 8)
        t.sliding(8).zipWithIndex.foreach { case (g, i) =>
          if (owner(g.mkString(" ")) < id)
            (i until i + 8).foreach(covered(_) = true)
        }
      val kept = t.indices.filterNot(covered).map(t)
      (id, t.length.toLong, covered.count(identity).toLong, kept.mkString(" "))
    }.toSeq
    val got = RetrievalOps.passageClean.fn(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got === expect)
    // treatment/report consistency: n_removed > 0 exactly when the report
    // found at least one cross-doc duplicated shingle in that doc
    val dupDocs = RetrievalOps.passageDedup.fn(spark, Sf).collect()
      .collect { case r if r.getLong(2) > 0 => r.getLong(0) }.toSet
    val removedDocs = got.collect { case (id, _, rm, _) if rm > 0 => id }.toSet
    // a doc with dup shingles but which is canonical owner of ALL of them
    // removes nothing, so removedDocs ⊆ dupDocs (strict subset allowed)
    assert(removedDocs.subsetOf(dupDocs))
  }

  test("q_rrf_fusion: fused score is exactly the sum of the two rank legs") {
    val lexTop = TextRankOps
      .bm25DocScores(Tables.documents(spark, Sf), Seq("join", "fast", "table"))
      .orderBy(col("score_dec").desc, col("doc_id")).limit(50)
      .collect().map(_.getLong(0)).toSeq
    val rows = RetrievalOps.rrfFusion.fn(spark, Sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val lexRank = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val vecRank = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lexRank.isDefined || vecRank.isDefined) // full-outer, never both-null
      val want = lexRank.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        vecRank.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(3) === want, s"doc ${r.getLong(0)}")
      // lex_rank must agree with the scorer's own top-50 ordering
      lexRank.foreach { lr =>
        assert(lexTop(lr.toInt - 1) === r.getLong(0), s"lex rank $lr")
      }
    }
    // output is ordered by fused score desc with doc_id tiebreak
    val keys = rows.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(keys === keys.sorted)
  }

  test("q_eval_ndcg: DCG ≤ IDCG always; equality iff ranking sorts by relevance") {
    val r = RetrievalOps.evalNdcg.fn(spark, Sf).collect()
    assert(r.length === 1)
    val (dcg, idcg, milli) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(dcg > 0 && idcg >= dcg, s"dcg=$dcg idcg=$idcg")
    assert(milli === dcg * 1000 / idcg && milli <= 1000)
    // cross-check against a double-precision NDCG of the same top-10:
    // integer micro-weights approximate 1/log2(rank+1) to ≤1e-6, so the
    // milli value must match the float computation to ±1 milli
    val ranked = TextRankOps
      .bm25DocScores(Tables.documents(spark, Sf), Seq("join", "fast", "table"))
      .orderBy(col("score_dec").desc, col("doc_id")).limit(10)
      .collect().map(_.getLong(1)).toSeq // rel = n_terms, in rank order
    def dcgF(rels: Seq[Long]) = rels.zipWithIndex.map { case (rel, i) =>
      (math.pow(2, rel.toDouble) - 1) / (math.log(i + 2.0) / math.log(2.0))
    }.sum
    val expect = dcgF(ranked) / dcgF(ranked.sorted.reverse) * 1000
    assert(math.abs(milli - expect) <= 1.0, s"milli=$milli float=$expect")
  }

  test("q_dedup_cross_source: matches brute-force shingle-type intersection") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
      .select(col("source"), split(col("text"), " ").as("t"))
      .as[(String, Seq[String])].collect()
    val bySrc = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap { case (_, t) =>
        if (t.length >= 8) t.sliding(8).map(_.mkString(" ")).toSeq else Seq.empty
      }.toSet
    }
    val expect = (for {
      (a, sa) <- bySrc; (b, sb) <- bySrc if a < b
      shared = sa.intersect(sb).size if shared > 0
    } yield (a, b, shared.toLong, sa.size.toLong, sb.size.toLong,
      shared.toLong * 1000 / math.min(sa.size, sb.size)))
      .toSeq.sortBy(x => (x._1, x._2))
    val got = RetrievalOps.crossSource.fn(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
  }

  test("inverted index: query-over-index equals scan-over-corpus, with real pruning") {
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString + "/idx"
    val docs = Tables.documents(spark, Sf)
    RetrievalOps.writeInvertedIndex(docs, dir)
    val terms = Seq("join", "fast", "table")
    // exact equality with the corpus-scan path (shared bm25Score)
    val fromIndex = RetrievalOps.queryInvertedIndex(spark, dir, terms).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fromCorpus = graft.ops.TextRankOps.bm25Query.fn(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromIndex === fromCorpus)
    // pruning is physical, not cosmetic: the postings scan reads only the
    // query terms' bucket directories (AQE off so scan metrics are
    // reachable — the MaintenanceSpec recipe)
    val totalFiles = spark.read.parquet(s"$dir/postings")
      .select(input_file_name()).distinct().count()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = RetrievalOps.queryInvertedIndex(spark, dir, terms)
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.schema.fieldNames.contains("token") => f
      }.getOrElse(fail("no postings FileSourceScanExec in plan"))
      assert(scan.partitionFilters.nonEmpty,
        "bucket filter did not reach partition pruning")
      assert(scan.metadata("PushedFilters").contains("In(token"),
        s"token IN list not pushed down: ${scan.metadata("PushedFilters")}")
      q.collect()
      val filesRead = scan.metrics("numFiles").value
      assert(filesRead < totalFiles,
        s"pruning read $filesRead of $totalFiles files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("rrf ranks are dense 1..k within each leg (no gaps from the limit)") {
    val rows = RetrievalOps.rrfFusion.fn(spark, Sf).collect()
    def ranks(i: Int) =
      rows.collect { case r if !r.isNullAt(i) => r.getLong(i) }.sorted.toSeq
    // the top-20 needn't contain a full prefix of either leg, but every
    // present rank must be within 1..50 and distinct
    Seq(1, 2).foreach { i =>
      val rs = ranks(i)
      assert(rs.distinct === rs)
      assert(rs.forall(r => r >= 1 && r <= 50))
    }
  }
}

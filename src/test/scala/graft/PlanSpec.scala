package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §4): pushdown, pruning, broadcast
  * and top-k strategies must actually reach the plan — these are the
  * 100 TB canaries. ScanFilterOps's Scaladoc promises exactly this suite.
  */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q_scan_project prunes the parquet read schema to selected columns") {
    val plan = formatted(ops.ScanFilterOps.scanProject.fn(spark, Sf))
    assert(plan.contains("ReadSchema"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey"))
    assert(!readSchema.contains("l_tax"), "unprojected column reached the scan")
    assert(!readSchema.contains("l_returnflag"))
  }

  test("q_filter pushes predicates into the parquet scan") {
    val plan = formatted(ops.ScanFilterOps.filter.fn(spark, Sf))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("In(l_returnflag"), s"missing pushdown: $pushed")
    assert(pushed.contains("IsNotNull"), s"missing pushdown: $pushed")
  }

  test("q_join_broadcast broadcasts the dimension tables") {
    val df = ops.JoinOps.joinBroadcast.fn(spark, Sf)
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "dim join degenerated to a sort-merge join")
  }

  test("partition pruning: a date-partitioned layout scans only matching partitions") {
    import org.apache.spark.sql.functions._
    // the 100 TB layout: fact tables partitioned by a date-derived column;
    // a filter on that column must reach PartitionFilters, not the data
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      Tables.orders(spark, Sf)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.partitionBy("o_year").mode("overwrite").parquet(dir)
      val pruned = spark.read.parquet(dir).filter(col("o_year") === 1995)
      val plan = formatted(pruned)
      val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
      assert(pf.contains("o_year"), s"no partition filter in: $pf")
      // and the pruned scan reads strictly fewer files than the full scan
      def files(df: DataFrame): Long =
        df.queryExecution.executedPlan.collectLeaves().map {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics.get("numFiles").map(_.value).getOrElse(0L)
          case _ => 0L
        }.sum
      pruned.collect(); val full = spark.read.parquet(dir); full.collect()
      assert(files(pruned) > 0 && files(pruned) < files(full),
        s"pruned=${files(pruned)} full=${files(full)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q_topk plans TakeOrderedAndProject, not a global sort") {
    val plan = formatted(ops.SortSetOps.topk.fn(spark, Sf))
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("join strategy hints are honored (SHUFFLE_HASH vs MERGE) — the 100 TB tuning knob") {
    import org.apache.spark.sql.functions._
    // default for two large-ish sides is sort-merge; SHUFFLE_HASH skips
    // both sorts when one side fits per-partition memory — at scale the
    // choice is per-join, so the engine must let hints through
    val o = Tables.orders(spark, Sf)
    val l = Tables.lineitem(spark, Sf)
    def planOf(hinted: DataFrame): String = {
      hinted.collect()
      hinted.queryExecution.executedPlan.toString
    }
    val shj = planOf(l.join(o.hint("SHUFFLE_HASH"),
      col("l_orderkey") === col("o_orderkey")))
    assert(shj.contains("ShuffledHashJoin"), s"hint ignored:\n$shj")
    val smj = planOf(l.join(o.hint("MERGE"),
      col("l_orderkey") === col("o_orderkey")))
    assert(smj.contains("SortMergeJoin"), s"hint ignored:\n$smj")
  }

  test("q_agg_group uses two-phase hash aggregation (map-side partial)") {
    val plan = formatted(ops.AggOps.aggGroup.fn(spark, Sf))
    val n = plan.linesIterator.count(_.matches(".*HashAggregate.*"))
    assert(n >= 2, s"expected partial+final HashAggregate, got $n in:\n$plan")
  }

  test("native expressions run inside WholeStageCodegen (no interpreted fallback)") {
    // the custom doGenCode expressions must not break codegen spans:
    // their stages should appear under a WholeStageCodegen subtree
    for (q <- Seq(ops.TextSimOps.simTopk, ops.TextSimOps.dedupEmbed,
        ops.ImplOps.dedupMinhash, ops.ImplOps.dedupSimhash)) {
      val df = q.fn(spark, Sf)
      df.collect()
      // compact plan strings mark WholeStageCodegen stages as "*(n)"
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"${q.name}: no codegen span in plan")
    }
  }

  test("oracle queries stay UDF-free (whole-stage codegen preserved)") {
    // one sanctioned exception: q_topk_group_agg IS the typed-Aggregator
    // surface (k-bounded shuffle is its whole point — TopKAgg scaladoc)
    Registry.all.filter(_.oracle.isDefined)
      .filterNot(_.name == "q_topk_group_agg").foreach { q =>
      val plan = q.fn(spark, Sf).queryExecution.optimizedPlan.toString
      assert(!plan.contains("UDF"), s"${q.name} contains a UDF")
      assert(!plan.contains("pythonUDF"), s"${q.name} contains a python UDF")
    }
  }

  test("no registered query plans a cartesian product (global sweep)") {
    // q_join_theta is the sanctioned non-equi join (BroadcastNestedLoop
    // over a 25-row dim — its whole point); everything else must plan
    // hash/merge joins only. CartesianProduct is never acceptable: at
    // 100 TB it is the plan that does not finish.
    Registry.all.filterNot(_.name == "q_join_theta").foreach { q =>
      val plan = q.fn(spark, Sf).queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
    }
  }

  test("q_ship_priority: both date filters push to scans; top-10 is TakeOrdered") {
    val df = ops.JoinOps.shipPriority.fn(spark, Sf)
    val plan = formatted(df)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan(l_shipdate"), s"lineitem filter not pushed: $pushed")
    assert(pushed.contains("LessThan(o_orderdate"), s"orders filter not pushed: $pushed")
    assert(plan.contains("TakeOrderedAndProject"), "top-10 degenerated to a global sort")
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("o_totalprice") && !read.contains("c_name"),
      "unprojected columns reached a scan")
  }

  test("q_simjoin_prefix: frequency table broadcasts; no token-grain verify shuffle") {
    val df = ops.SimJoinOps.simjoinPrefix.fn(spark, Sf)
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "vocab-sized gf frame must broadcast, not shuffle the token relation")
    assert(plan.contains("sorted_intersect_count") || plan.contains("sortedintersectcount"),
      s"verification must use the native merge kernel")
  }

  test("q_incr_join maintenance keeps the touched-key shape end-to-end") {
    val plan = formatted(ops.CdcOps.incrJoin.fn(spark, Sf))
    assert(plan.contains("LeftAnti"), "survivors must anti-join touched keys")
    assert(plan.contains("LeftSemi"), "recompute slices must semi-join touched keys")
  }

  test("q_skew_report: singleton summary broadcasts; top-5 is TakeOrdered") {
    val df = ops.AuditOps.skewReport.fn(spark, Sf)
    val plan = formatted(df)
    assert(plan.contains("TakeOrderedAndProject"),
      "top-5 degenerated to a global sort")
    df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "1-row summary must broadcast, not shuffle the key frame")
  }

  test("q_asof_tolerance / q_time_travel: one window shuffle, no joins") {
    for (q <- Seq(ops.JoinOps.asofTolerance, ops.WindowOps.timeTravel)) {
      val plan = q.fn(spark, Sf).queryExecution.executedPlan.toString
      assert(!plan.contains("Join"),
        s"${q.name}: point-in-time lookup must be a window pass, not a join")
      assert(plan.contains("Window"), s"${q.name}: missing window operator")
    }
  }

  test("q_reach: hop expansion is hash joins, never a cartesian product") {
    val plan = ops.GraphOps.reach.fn(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"BFS frontier join degenerated:\n$plan")
  }

  test("q_shortest_path: relaxation rounds are hash joins over the checkpointed edges") {
    val plan = ops.GraphOps.shortestPath.fn(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"relaxation join degenerated:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      "edge list must come from the one-time checkpoint, not a re-derive per round")
  }

  test("q_winsorize: bounds broadcast back; top output is one agg, no extra sort") {
    val df = ops.StatOps.winsorize.fn(spark, Sf)
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-supplier bound frame must broadcast, not shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_boilerplate: shingle agg is two-phase hash; top-50 is TakeOrdered") {
    val plan = formatted(ops.TextSimOps.boilerplate.fn(spark, Sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-50 degenerated to a full sort:\n$plan")
    assert(plan.contains("HashAggregate"), s"no hash aggregation:\n$plan")
  }

  test("q_event_dedup_window: one shuffle on the user key, never a global sort") {
    val df = ops.StreamShapeOps.eventDedupWindow.fn(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    // exactly one hash exchange for the lag window (on user_id); the
    // only other allowed exchange is the presentation ORDER BY's range
    // partitioning
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.exists(l =>
        l.contains("hashpartitioning") && l.contains("user_id")),
      s"missing user-key hash exchange:\n$plan")
    assert(exchanges.size <= 2, s"extra shuffles beyond window+present:\n$plan")
  }

  test("q_cdc_evolve: evolution alignment stays map-side above the state scan") {
    val df = ops.CdcOps.cdcEvolve.fn(spark, Sf)
    // executedPlan.toString: ONE representation per node (formatted mode
    // lists tree + detail and double-counts)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // one full-outer merge join; the align step (null backfill + value
    // hash recompute) must appear as Project expressions, never as an
    // extra shuffle or a second join
    val joins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"evolution must not add a join:\n$plan")
    assert(plan.contains("FullOuter"), s"merge join lost full-outer:\n$plan")
  }

  test("q_text_zipf / q_collect / q_sample_quota: per-group top-K is a k-bounded aggregate, no rank window") {
    // the rank-window twin sorts a whole group (one language / segment)
    // in a single task — parallelism capped at the group count; the
    // k-capped Aggregator buffer combines map-side instead
    for (q <- Seq(ops.LmOps.textZipf, ops.AggOps.collectTop,
        ops.CurateOps.sampleQuota)) {
      val qe = q.fn(spark, Sf).queryExecution
      val wins = qe.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.isEmpty, s"${q.name}: rank window survived the rewrite")
      assert(qe.sparkPlan.toString.contains("ObjectHashAggregate"),
        s"${q.name}: expected the k-bounded Aggregator plan")
    }
  }

  test("q_pmi / q_oov_rate: vocab top-K is TakeOrdered, no partition-less window") {
    // the r5 rank-window formulation sorted the WHOLE distinct-token
    // vocabulary on one partition; top-K under a total order must plan
    // TakeOrderedAndProject (parallel partial top-K) instead
    for (q <- Seq(ops.LmOps.pmi, ops.LmOps.oovRate)) {
      val qe = q.fn(spark, Sf).queryExecution
      assert(qe.sparkPlan.toString.contains("TakeOrderedAndProject"),
        s"${q.name}: vocab top-K degenerated to a sort")
      val wins = qe.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.isEmpty, s"${q.name}: unexpected window operator")
    }
  }

  test("q_skyline: prefix-max windows partition by bucket; only the bucket frame is unpartitioned") {
    val qe = ops.StatOps.skyline.fn(spark, Sf).queryExecution
    val wins = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "missing prefix-max windows")
    val (bounded, scaled) = wins.partition(_.partitionSpec.isEmpty)
    // the data-scaled per-price frame must be partitioned (by bkt)
    assert(scaled.nonEmpty &&
      scaled.forall(_.partitionSpec.exists(_.toString.contains("bkt"))),
      s"per-price prefix-max not partitioned by bucket:\n${qe.sparkPlan}")
    // any unpartitioned window may run only over the bucket frame, whose
    // row count is bounded by the price DOMAIN (bkt/bmax), never by data
    assert(bounded.forall { w =>
      val cols = w.child.output.map(_.name).toSet
      cols.contains("bmax") && !cols.contains("price")
    }, s"partition-less window over a data-scaled frame:\n${qe.sparkPlan}")
  }

  test("q_shuffle_shards: one hash exchange, no global sort of the corpus") {
    val df = ops.SampleOps.shuffleShards.fn(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 1, s"epoch sharding must cost ONE shuffle, got $hashEx:\n$plan")
    // allowed sorts: the 16-row presentation ORDER BY (on shard) and the
    // SortAggregate's LOCAL per-partition sorts on the 1-char nibble key
    // (string min/max buffers are not hash-agg-able; no exchange under
    // them, so the corpus is never globally sorted)
    val sorts = plan.linesIterator.filter(_.contains("Sort ")).toSeq
    assert(sorts.forall(l =>
        l.contains("shard") || l.contains("_groupingexpression")),
      s"unexpected sort of a non-shard frame (global corpus sort?):\n$plan")
    assert(!plan.linesIterator.exists(l =>
        l.contains("Sort [okey")),
      s"corpus sorted by the full order key — that IS the global sort:\n$plan")
  }

  test("q_filter_funnel: the only partition-less window runs on the stage frame") {
    val qe = ops.CurateOps.filterFunnel.fn(spark, Sf).queryExecution
    val wins = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "missing funnel cumulative window")
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val cols = w.child.output.map(_.name).toSet
      assert(cols.contains("n_docs") && !cols.contains("doc_id"),
        s"partition-less window over a data-scaled frame:\n${qe.sparkPlan}")
    }
  }

  test("q_agg_filter: all filtered aggregates come from ONE lineitem scan") {
    val qe = ops.AggOps.aggFilter.fn(spark, Sf).queryExecution
    val scans = qe.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size === 1,
      s"FILTER aggregates re-scanned the table (${scans.size} scans):\n${qe.sparkPlan}")
  }

  test("multiset set-ops plan aggregates, never joins") {
    for (q <- Seq(ops.SetOps.exceptAll, ops.SetOps.intersectAll)) {
      val plan = q.fn(spark, Sf).queryExecution.sparkPlan.toString
      assert(!plan.contains("Join"), s"${q.name} planned a join:\n$plan")
    }
  }

  test("passage dedup plans: zero data-scaled windows; aggregates do the counting") {
    // the hot-boilerplate-shingle hardening: cross-doc counts/owners must
    // be groupBy+join (map-side combined, AQE-skew-splittable), never a
    // window partitioned by the shingle hash
    Seq(ops.RetrievalOps.passageDedup, ops.RetrievalOps.crossSource,
      ops.RetrievalOps.passageIncr)
      .foreach { q =>
        val wins = q.fn(spark, Sf).queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(wins.isEmpty,
          s"${q.name}: expected window-free plan, found ${wins.size} WindowExec")
      }
    // passageClean keeps exactly its two intended windows: the per-doc
    // coverage frame (partitioned by doc_id) — never one over the hash
    val cleanWins = ops.RetrievalOps.passageClean.fn(spark, Sf)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(cleanWins.nonEmpty)
    cleanWins.foreach { w =>
      val keys = w.partitionSpec.map(_.toString).mkString(",")
      assert(keys.contains("doc_id"),
        s"coverage window not partitioned by doc_id: $keys")
    }
  }

  test("q_eval_ndcg: ranking reduces via TakeOrdered; eval windows are post-limit") {
    val qe = ops.RetrievalOps.evalNdcg.fn(spark, Sf).queryExecution
    val plan = qe.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 should be a parallel partial top-k:\n$plan")
    // any partition-less window must sit above the 10-row limit, i.e.
    // its child carries the rank/eval columns, not raw corpus columns
    qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      val cols = w.child.output.map(_.name).toSet
      assert(!cols.contains("token") && !cols.contains("text"),
        s"eval window over a corpus-scaled frame: ${cols.mkString(",")}")
    }
  }

  test("q_embed_drift: one two-phase aggregation over the exploded dims") {
    val plan = formatted(ops.AuditOps.embedDrift.fn(spark, Sf))
    // partial + final HashAggregate pairs and no join anywhere — the
    // pivot-diff is CASE aggregation on the bounded (label, dim) frame
    assert(!plan.contains("Join"), s"drift should not plan a join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "expected two-phase aggregation chains")
  }

  test("de-cliffed group ops: no window partitioned ONLY by a tiny group key") {
    // every converted site may still use windows, but only over bounded
    // frames (score/value/bucket grain) or with a bucket in the key —
    // never `partition by <5-value column>` over the raw corpus
    val tinyKeys = Set("c_mktsegment", "lang", "source", "seg")
    val converted = Seq(ops.CurateOps.quantileDisc, ops.SampleOps.quantileCont,
      ops.SampleOps.sampleWeighted, ops.CurateOps.qualityCut,
      ops.StatOps.rankSum)
    converted.foreach { q =>
      q.fn(spark, Sf).queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.foreach { w =>
        val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        val rowGrainInput = w.child.output.map(_.name)
          .exists(c => c == "doc_id" || c == "c_custkey" || c == "o_orderkey")
        assert(!(keys.subsetOf(tinyKeys) && rowGrainInput),
          s"${q.name}: corpus-grain window partitioned only by $keys")
      }
    }
  }

  test("q_vocab_growth: the prefix-sum window runs on the 20-bucket frame, not the corpus") {
    val qe = ops.LmOps.vocabGrowth.fn(spark, Sf).queryExecution
    val wins = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "missing cumulative window")
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val cols = w.child.output.map(_.name).toSet
      // the bounded frame carries bucket-grain counts only — a doc_id or
      // bigram column here would mean the window sees corpus-grain rows
      assert(!cols.contains("doc_id") && !cols.contains("bigram"),
        s"partition-less window over a data-scaled frame:\n${qe.sparkPlan}")
    }
  }

  test("q_token_budget: every window is partitioned by source (never partition-less)") {
    val qe = ops.CurateOps.tokenBudget.fn(spark, Sf).queryExecution
    val wins = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "missing budget prefix-sum window")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"partition-less window in the budget fill:\n${qe.sparkPlan}")
  }

  test("q_spearman: no corpus window hangs off the 3-value flag alone — " +
      "ranks come from the qty grid and (flag, price-bucket) partitions") {
    val qe = ops.AssocOps.spearman.fn(spark, Sf).queryExecution
    val wins = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "missing rank windows")
    // the row-grain rank window must partition by MORE than the return
    // flag (the price bucket bounds each partition's share of the
    // corpus — the range-partitioned global-sort discipline); the
    // single-key windows are the domain-bounded GRID cumsums, which
    // must sit above an aggregate, never the raw scan
    wins.foreach { w =>
      if (w.partitionSpec.size < 2) {
        val overAgg = w.find {
          case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
          case _ => false
        }.isDefined
        assert(overAgg,
          s"single-key window over a non-aggregated frame:\n${qe.sparkPlan}")
      }
    }
  }

  test("q_regr_slope / q_bit_ops / q_kl_source: single-pass shapes — no windows, no sorts before the output ORDER BY") {
    for (q <- Seq(ops.StatOps.regrSlope, ops.ScalarOps.bitOps)) {
      val plan = q.fn(spark, Sf).queryExecution.sparkPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"${q.name} planned a window")
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.size === 1, s"${q.name}: expected one events scan")
    }
    // KL reads the token frame three ways but must never window it
    val kl = ops.LmOps.klSource.fn(spark, Sf).queryExecution.sparkPlan
    assert(kl.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "q_kl_source planned a window")
  }

  test("dtype envelope: no oracle query ships decimal at the checked boundary (global sweep)") {
    // verified r9 by scanning every green output's arrow schema: the
    // driver hash accepts int32/int64/float64/string/date/timestamp/bool
    // ONLY. q_gini (decimal 38,0) and q_hhi/q_autocorr/q_chi_square
    // (decimal 28,0) each shipped bit-identical VALUES and still failed
    // the hash. Exact decimal arithmetic stays internal; boundaries ship
    // BIGINT ratios or a terminal DOUBLE cast.
    import org.apache.spark.sql.types.DecimalType
    Registry.all.filter(_.oracle.isDefined).foreach { q =>
      val bad = q.fn(spark, Sf).schema.fields
        .filter(_.dataType.isInstanceOf[DecimalType])
      assert(bad.isEmpty,
        s"${q.name} ships decimal columns at the oracle boundary: " +
          bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    }
  }

  test("registry names are unique and entry returns rows") {
    assert(Registry.all.map(_.name).distinct.size === Registry.all.size)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_decile_spend / q_abc_class: global rank rides a RANGE " +
      "exchange, never a partition-less data-scaled window") {
    import org.apache.spark.sql.execution.window.WindowExec
    Seq(ops.OlapRankOps.decileSpend -> "o_custkey",
        ops.OlapRankOps.abcClass -> "l_partkey").foreach {
      case (q, grainCol) =>
        val qe = q.fn(spark, Sf).queryExecution
        val plan = qe.executedPlan.toString
        assert(plan.contains("rangepartitioning"),
          s"${q.name}: the distributed sort-rank's range exchange is " +
            s"missing:\n$plan")
        // any partition-less window must ride a frame that has already
        // shed the data grain (the per-range-partition offsets frame or
        // the bounded prefix frame), never customer/part-grain rows
        qe.sparkPlan.collect { case w: WindowExec => w }
          .filter(_.partitionSpec.isEmpty).foreach { w =>
            val cols = w.child.output.map(_.name).toSet
            assert(!cols.contains(grainCol),
              s"${q.name}: partition-less window over $grainCol-grain " +
                s"rows:\n${qe.sparkPlan}")
          }
    }
  }

  test("q_top_customer_share: k-bounded aggregator, NO per-year rank " +
      "window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = ops.TrendOps.topCustomerShare.fn(spark, Sf).queryExecution
    val wins = qe.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.isEmpty,
      s"top-20-per-year must ride TopKAgg, not a fat per-year rank " +
        s"window:\n${qe.sparkPlan}")
  }

  test("no static broadcast hint on SF-scaled frames; AQE/stats still " +
      "broadcast them at small SF") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hints(df: DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    // these queries join customer/supplier/part-scaled sides and must be
    // completely hint-free: a forced broadcast() on an SF-scaled frame is
    // the plan that dies at the driver at 100 TB (billions of rows), while
    // stats/AQE pick broadcast-hash for free while the side actually fits
    val hintFree = Seq(ops.TpchOps.volumeShipping, ops.TpchOps.marketShare,
      ops.TpchOps.productProfit, ops.TpchOps.promoShare,
      ops.TpchOps.smallQtyRevenue, ops.TpchOps.largeOrders,
      ops.TpchOps.disjunctiveRev, ops.TpchOps.waitingSupplier,
      ops.JoinOps.shipPriority)
    hintFree.foreach { q =>
      assert(hints(q.fn(spark, Sf)) === 0,
        s"${q.name}: static broadcast hint on an SF-scaled side")
    }
    // these keep hints ONLY on bounded frames (nation/region dims, 1-row
    // aggregates) — pin the exact count so a hint on a scaled side cannot
    // sneak back in
    val bounded = Seq(
      ops.TpchOps.returnedItems -> 1, // nation (25 rows)
      ops.TpchOps.topSupplier -> 1,   // 1-row max frame
      ops.JoinOps.localSupplier -> 2, // region filter + 25-row nation dim
      ops.GraphOps.basketPairs -> 1)  // 1-row order-count frame
    bounded.foreach { case (q, n) =>
      assert(hints(q.fn(spark, Sf)) === n,
        s"${q.name}: expected $n bounded-dim hints only")
    }
    // and dropping the hints must NOT cost the local plan its broadcasts:
    // at this SF the dims fit comfortably, so stats/AQE still pick
    // broadcast-hash for the representative deep join tree
    val df = ops.JoinOps.localSupplier.fn(spark, Sf)
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hint-free dims no longer broadcast at small SF:\n$plan")
  }

  test("TrendOps windows: lag frames customer-partitioned; cumulative " +
      "frames bounded") {
    import org.apache.spark.sql.execution.window.WindowExec
    // q_reactivation / q_gap_pctl: every order-grain window must be
    // partitioned by the customer key (scale-stable ~25-row frames)
    Seq(ops.TrendOps.reactivation, ops.TrendOps.gapPctl).foreach { q =>
      val qe = q.fn(spark, Sf).queryExecution
      val wins = qe.sparkPlan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"${q.name}: missing lag window")
      wins.filter(_.partitionSpec.isEmpty).foreach { w =>
        val cols = w.child.output.map(_.name).toSet
        assert(!cols.contains("o_orderkey") && !cols.contains("o_custkey"),
          s"${q.name}: partition-less window over order-grain rows:\n" +
            qe.sparkPlan)
      }
      assert(wins.exists(_.partitionSpec.exists(
          _.toString.contains("o_custkey"))),
        s"${q.name}: lag window not customer-partitioned:\n${qe.sparkPlan}")
    }
    // q_backlog: the only partition-less window rides the calendar-month
    // frame (month-grain columns), never order/line-grain rows
    locally {
      val qe = ops.TrendOps.backlog.fn(spark, Sf).queryExecution
      qe.sparkPlan.collect { case w: WindowExec => w }
        .filter(_.partitionSpec.isEmpty).foreach { w =>
          val cols = w.child.output.map(_.name).toSet
          assert(cols.contains("n_placed") && !cols.contains("o_orderkey"),
            s"q_backlog: cumulative window not on the month frame:\n" +
              qe.sparkPlan)
        }
    }
    // q_embed_sign_buckets: the share window rides the ≤256-row bucket
    // frame, never vector-grain rows
    locally {
      val qe = ops.TrendOps.embedSignBuckets.fn(spark, Sf).queryExecution
      qe.sparkPlan.collect { case w: WindowExec => w }
        .filter(_.partitionSpec.isEmpty).foreach { w =>
          val cols = w.child.output.map(_.name).toSet
          assert(cols.contains("n") && !cols.contains("embedding"),
            s"q_embed_sign_buckets: share window over vector-grain rows:\n" +
              qe.sparkPlan)
        }
    }
  }
}

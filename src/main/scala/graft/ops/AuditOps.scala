package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality auditing over the warehouse shape itself: referential
  * integrity, categorical independence, and join-cardinality estimation
  * — the checks a pipeline runs BEFORE trusting or planning a 100 TB
  * join, complementing ops/GovernOps (which audits content, not shape).
  *
  * Scale design: FK audits are broadcast anti-joins (key side only —
  * the fact table never carries payload columns into the probe); the
  * χ² statistic aggregates a ≤|lang|·|source| contingency frame; the
  * join-size estimate reads BOTH tables once at key grain and never
  * executes the join it sizes — Σₖ c₁(k)·c₂(k) is exactly what a
  * planner needs to choose broadcast vs shuffle vs salt.
  */
object AuditOps {

  /** Referential-integrity audit: orphan counts for the three fact→dim
    * arrows of the schema (lineitem→orders, lineitem→part,
    * orders→customer). One row per check — the shape of a nightly
    * data-contract report. Anti-join probes carry only the key column;
    * dims broadcast. */
  val fkAudit: Q = Q.checked(
    "q_fk_audit",
    """SELECT 'lineitem->orders' AS fk, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_orphans
      |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |UNION ALL
      |SELECT 'lineitem->part', count(*),
      |  CAST(sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      |UNION ALL
      |SELECT 'orders->customer', count(*),
      |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |ORDER BY fk""".stripMargin
  ) { (s, dir) =>
    def audit(name: String, fact: org.apache.spark.sql.DataFrame,
        fk: String, dim: org.apache.spark.sql.DataFrame, pk: String) =
      fact.select(col(fk))
        .join(broadcast(dim.select(col(pk))), col(fk) === col(pk), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(pk).isNull, 1).otherwise(0)).cast(LongType)
            .as("n_orphans"))
        .select(lit(name).as("fk"), col("n_rows"), col("n_orphans"))
    val li = Tables.lineitem(s, dir)
    audit("lineitem->orders", li, "l_orderkey",
        Tables.orders(s, dir), "o_orderkey")
      .unionByName(audit("lineitem->part", li, "l_partkey",
        Tables.part(s, dir), "p_partkey"))
      .unionByName(audit("orders->customer", Tables.orders(s, dir),
        "o_custkey", Tables.customer(s, dir), "c_custkey"))
      .orderBy("fk")
  }

  /** χ² independence statistic for the lang × source contingency table.
    * Each cell term (o−e)²/e is rearranged to integer arithmetic:
    * (o·N − rt·ct)² / (rt·ct·N) — numerator and denominator are exact
    * BIGINTs (≪ 2⁵³, so their doubles are exact), the division is one
    * correctly-rounded IEEE op, and each term is snapped to BIGINT at
    * 1e10 (the entropy recipe) so the cross-cell sum is order-free.
    * The contingency frame is ≤ |lang|·|source| rows — every aggregate
    * after the first groupBy is effectively free. */
  val chisq: Q = Q.checked(
    "q_chisq",
    """WITH o AS (SELECT lang, source, count(*) AS o
      |           FROM documents GROUP BY lang, source),
      |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM o
      |       GROUP BY lang),
      |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM o
      |       GROUP BY source),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
      |terms AS (
      |  SELECT CAST(floor(
      |      (CAST(o.o AS DOUBLE) * CAST(n.n AS DOUBLE)
      |        - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE))
      |        * (CAST(o.o AS DOUBLE) * CAST(n.n AS DOUBLE)
      |          - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE))
      |        / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
      |          * CAST(n.n AS DOUBLE))
      |        * 1e10 + 5.0e-1) AS BIGINT) AS t10
      |  FROM o JOIN rt ON o.lang = rt.lang
      |    JOIN ct ON o.source = ct.source, n)
      |SELECT CAST(sum(t10) AS DOUBLE) / 1e10 AS chi2,
      |  (SELECT CAST((count(*) - 1) AS BIGINT) FROM rt)
      |    * (SELECT CAST((count(*) - 1) AS BIGINT) FROM ct) AS dof,
      |  (SELECT n FROM n) AS n
      |FROM terms""".stripMargin
  ) { (s, dir) =>
    val o = Tables.documents(s, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rt = o.groupBy("lang").agg(sum(col("o")).cast(LongType).as("rt"))
    val ct = o.groupBy("source").agg(sum(col("o")).cast(LongType).as("ct"))
    val n = o.agg(sum(col("o")).cast(LongType).as("n"))
    val dof = rt.agg((count(lit(1)) - 1).as("dl")).crossJoin(
      ct.agg((count(lit(1)) - 1).as("ds")))
      .select((col("dl") * col("ds")).as("dof"))
    // every factor goes int64→double BEFORE any multiply: a per-factor
    // cast is correctly rounded and deterministic, whereas an int64
    // product rt*ct*n wraps silently past n³ > 2^63 (Spark) while DuckDB
    // raises — a latent cross-engine divergence at scale. Both engines
    // now run the identical left-assoc IEEE op sequence.
    val num = col("o").cast(DoubleType) * col("n").cast(DoubleType) -
      col("rt").cast(DoubleType) * col("ct").cast(DoubleType)
    o.join(broadcast(rt), "lang").join(broadcast(ct), "source")
      .crossJoin(broadcast(n))
      .select(floor(num * num
          / (col("rt").cast(DoubleType) * col("ct").cast(DoubleType)
            * col("n").cast(DoubleType))
          * lit(1e10) + lit(0.5)).cast(LongType).as("t10"),
        col("n"))
      .agg((sum(col("t10")).cast(DoubleType) / lit(1e10)).as("chi2"),
        max(col("n")).as("n"))
      .crossJoin(broadcast(dof))
      .select(col("chi2"), col("dof"), col("n"))
  }

  /** Exact join-cardinality computation WITHOUT executing the join:
    * |lineitem ⋈ orders| = Σₖ c₁(k)·c₂(k) over per-key counts — the
    * planner primitive behind broadcast/salt decisions (q_join_skew's
    * NSalt and Salt.hotColdJoin's hot-key cut both start from exactly
    * this frame). Also surfaces the max per-key fan-out (the skew
    * signal) and the shared-key count. Each table is read ONCE at key
    * grain; the output is one row regardless of input size. */
  val joinSizeEst: Q = Q.checked(
    "q_join_size_est",
    """WITH c1 AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
      |            GROUP BY l_orderkey),
      |c2 AS (SELECT o_orderkey AS k, count(*) AS c FROM orders
      |       GROUP BY o_orderkey)
      |SELECT CAST(sum(c1.c * c2.c) AS BIGINT) AS join_rows,
      |  count(*) AS n_shared_keys,
      |  CAST(max(c1.c * c2.c) AS BIGINT) AS max_key_fanout
      |FROM c1 JOIN c2 ON c1.k = c2.k""".stripMargin
  ) { (s, dir) =>
    val c1 = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("c1"))
    val c2 = Tables.orders(s, dir)
      .groupBy(col("o_orderkey").as("k2")).agg(count(lit(1)).as("c2"))
    c1.join(c2, col("k") === col("k2"))
      .agg(sum(col("c1") * col("c2")).cast(LongType).as("join_rows"),
        count(lit(1)).as("n_shared_keys"),
        max(col("c1") * col("c2")).cast(LongType).as("max_key_fanout"))
  }

  /** Benford first-digit audit of order totals — the classic fabricated-
    * numbers screen: observed share of each leading digit vs the Benford
    * expectation log10(1 + 1/d). The leading digit comes from the
    * STRING of the exact integer cents (floor(x·100 + 0.5) — 2-dp money
    * never ties), never from float log10 of the raw value, whose
    * behavior at powers of ten is a cross-engine hazard; the Benford
    * constants are integer-argument log10 snapped at 1e10 (the entropy
    * recipe). One hash aggregation with a 9-row key space — partials
    * collapse map-side. */
  val benford: Q = Q.checked(
    "q_benford",
    """WITH d AS (
      |  SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 5.0e-1)
      |    AS BIGINT) AS VARCHAR), 1, 1) AS digit
      |  FROM orders WHERE o_totalprice > 0),
      |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
      |SELECT digit, n,
      |  CAST(n AS DOUBLE) / CAST(t.t AS DOUBLE) AS observed,
      |  CAST(CAST(floor(log10(CAST(CAST(digit AS BIGINT) + 1 AS DOUBLE))
      |      * 1e10 + 5.0e-1) AS BIGINT)
      |    - CAST(floor(log10(CAST(digit AS DOUBLE)) * 1e10 + 5.0e-1)
      |      AS BIGINT) AS DOUBLE) / 1e10 AS benford
      |FROM c, t ORDER BY digit""".stripMargin
  ) { (s, dir) =>
    val c = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 0)
      .select(substring(floor(col("o_totalprice") * 100 + lit(0.5))
        .cast(LongType).cast(StringType), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).cast(LongType).as("t"))
    c.crossJoin(broadcast(t))
      .select(col("digit"), col("n"),
        (col("n").cast(DoubleType) / col("t").cast(DoubleType))
          .as("observed"),
        ((floor(log10((col("digit").cast(LongType) + 1).cast(DoubleType))
            * lit(1e10) + lit(0.5)).cast(LongType)
          - floor(log10(col("digit").cast(DoubleType)) * lit(1e10)
            + lit(0.5)).cast(LongType)).cast(DoubleType) / lit(1e10))
          .as("benford"))
      .orderBy("digit")
  }

  /** Join-key skew report — the pre-flight every big join should run
    * before the planner commits to a strategy: per-key cardinality
    * profile of a join column (here lineitem.l_suppkey), surfacing the
    * top-5 heavy hitters plus the key count, total rows, max per-key
    * count, and an integer skew ratio (max/avg in milli-units). This is
    * the frame [[q_join_skew]]'s salt count and Salt.hotColdJoin's
    * hot-key cut are derived from, exposed as a first-class diagnostic.
    *
    * Scale shape: ONE key-grain aggregation (partials collapse
    * map-side), a broadcast singleton summary, and a
    * TakeOrderedAndProject top-5 — output size is constant regardless of
    * input size. All integers; heavy-hitter ties resolve by key. */
  val skewReport: Q = Q.checked(
    "q_skew_report",
    """WITH c AS (SELECT l_suppkey AS k, count(*) AS cnt FROM lineitem
      |           GROUP BY l_suppkey),
      |s AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
      |        CAST(max(cnt) AS BIGINT) AS max_c
      |      FROM c)
      |SELECT k, cnt, n_keys, total, max_c,
      |  (max_c * 1000 * n_keys) // total AS skew_milli
      |FROM c, s ORDER BY cnt DESC, k LIMIT 5""".stripMargin
  ) { (s, dir) =>
    val c = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").as("k")).agg(count(lit(1)).as("cnt"))
    val summary = c.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).cast(LongType).as("total"),
      max(col("cnt")).cast(LongType).as("max_c"))
    c.crossJoin(broadcast(summary))
      .withColumn("skew_milli",
        expr("(max_c * 1000 * n_keys) div total"))
      .orderBy(col("cnt").desc, col("k"))
      .limit(5)
  }

  /** Embedding-distribution drift monitor: split the corpus into two
    * cohorts (vec_id parity stands in for "reference window" vs "current
    * window" — production substitutes an ingestion-date predicate) and
    * report, per label cluster, the L1 distance between the cohorts'
    * per-dimension mean vectors in exact micro-units — the "did the
    * embedding distribution shift under me" alarm every
    * similarity-search/dedup deployment needs before its thresholds
    * silently rot.
    *
    * Exactness: per-element contributions snap to floor(x·1e6) BEFORE
    * summing (floor is toward −inf in both engines, values may be
    * negative), the per-dim mean is integer `div` (truncation toward
    * zero in both), so every emitted number is engine-exact. Scale: one
    * posexplode (map-only) + ONE (cohort,label,dim)-grain aggregation
    * (map-side combined, 2·|labels|·64 output rows), then a dim-grain
    * pivot-diff on that bounded frame. */
  val embedDrift: Q = Q.checked(
    "q_embed_drift",
    """WITH e AS (SELECT vec_id % 2 AS cohort, label, embedding
      |           FROM embeddings),
      |d AS (SELECT cohort, label,
      |        unnest(range(1, 65)) AS dim,
      |        embedding[unnest(range(1, 65))] AS x
      |      FROM e),
      |m AS (SELECT cohort, label, dim,
      |        CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
      |             AS BIGINT) AS s,
      |        count(*) AS n
      |      FROM d GROUP BY 1, 2, 3),
      |p AS (SELECT label, dim,
      |        min(CASE WHEN cohort = 0 THEN s // n END) AS mean_ref,
      |        min(CASE WHEN cohort = 1 THEN s // n END) AS mean_cur,
      |        min(CASE WHEN cohort = 0 THEN n END) AS n_ref,
      |        min(CASE WHEN cohort = 1 THEN n END) AS n_cur
      |      FROM m GROUP BY 1, 2)
      |SELECT label, CAST(min(n_ref) AS BIGINT) AS n_ref,
      |  CAST(min(n_cur) AS BIGINT) AS n_cur,
      |  CAST(sum(abs(mean_ref - mean_cur)) AS BIGINT) AS drift_micro
      |FROM p GROUP BY label ORDER BY label""".stripMargin
  ) { (s, dir) =>
    val d = Tables.embeddings(s, dir)
      .select((col("vec_id") % 2).as("cohort"), col("label"),
        posexplode(col("embedding")).as(Seq("dim0", "x")))
      .select(col("cohort"), col("label"), (col("dim0") + 1).as("dim"),
        floor(col("x").cast(DoubleType) * 1000000).cast(LongType).as("x6"))
    val m = d.groupBy("cohort", "label", "dim")
      .agg(sum("x6").as("s"), count(lit(1)).as("n"))
    val p = m.groupBy("label", "dim")
      .agg(
        min(when(col("cohort") === 0, expr("s div n"))).as("mean_ref"),
        min(when(col("cohort") === 1, expr("s div n"))).as("mean_cur"),
        min(when(col("cohort") === 0, col("n"))).as("n_ref"),
        min(when(col("cohort") === 1, col("n"))).as("n_cur"))
    p.groupBy("label")
      .agg(min("n_ref").as("n_ref"), min("n_cur").as("n_cur"),
        sum(abs(col("mean_ref") - col("mean_cur"))).as("drift_micro"))
      .orderBy("label")
  }

  /** Per-source training-data datasheet — the "dataset card" table a
    * data curator publishes alongside a corpus release (Datasheets for
    * Datasets, Gebru et al. 2021): per source, the document count,
    * character and whitespace-token volume, language breadth, exact-dup
    * rate, and share of the whole corpus. One aggregate answers the
    * release-review questions (is any source dominating the mix? which
    * source carries the duplication debt?) that otherwise take a query
    * per metric.
    *
    * Exactness: every measure is an exact BIGINT off one scan — the
    * token estimate is `length - length(replace(text,' ','')) + 1`
    * (identical integer semantics cross-engine, no regex dialect risk),
    * dup detection is count(DISTINCT md5(text)) (same hex in both
    * engines). The two ratios are single IEEE divisions of exact
    * integers — deterministic, never membership-deciding.
    *
    * Scale: ONE pass over documents builds the per-source frame (the
    * multi-distinct plans as one expand, map-side combined); the frame
    * is then eagerly materialized (it is SOURCE-GRAIN — bounded by the
    * source count, not the corpus) so the corpus total re-aggregates the
    * ~|sources|-row checkpoint instead of replanning a second scan of
    * the table (without the checkpoint Catalyst derives `tot` from the
    * raw scan again — column-pruned to one column, but still a full
    * corpus pass at 100 TB). The total broadcasts back as a 1-row cross
    * join. */
  val datasetCard: Q = Q.checked(
    "q_dataset_card",
    """WITH per AS (
      |  SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |    CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
      |         AS BIGINT) AS n_tokens,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_uniq_texts
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM per)
      |SELECT source, n_docs, n_chars, n_tokens, n_langs, n_uniq_texts,
      |  CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE) AS corpus_share,
      |  1.0 - CAST(n_uniq_texts AS DOUBLE) / CAST(n_docs AS DOUBLE)
      |    AS dup_rate
      |FROM per CROSS JOIN tot ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val per = Tables.documents(s, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(expr("length(text) - length(replace(text, ' ', '')) + 1"))
          .as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(md5(col("text"))).as("n_uniq_texts"))
      .localCheckpoint(true) // source-grain (~|sources| rows): one corpus scan
    val tot = per.agg(sum("n_docs").as("n"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_tokens"),
        col("n_langs"), col("n_uniq_texts"),
        (col("n_docs").cast(DoubleType) / col("n").cast(DoubleType))
          .as("corpus_share"),
        (lit(1.0) - col("n_uniq_texts").cast(DoubleType)
          / col("n_docs").cast(DoubleType)).as("dup_rate"))
      .orderBy("source")
  }

  /** Cross-source near-duplicate overlap matrix — which source PAIRS
    * share content fingerprints, and how many: the companion table to
    * [[datasetCard]]'s intra-source dup rate (a hot overlap cell means
    * one source mirrors another — deduplicate ACROSS them before
    * weighting the mix). The fingerprint is the 40-char prefix blocking
    * key the near-dup clustering pillar already uses
    * (q_cluster_canonical / q_split_leakfree), so a cell counts exactly
    * the cross-source candidate edges that clustering would chase —
    * the md5-exact grain shows empty on corpora whose copies are
    * near-copies, which is the common 100 TB reality.
    *
    * Scale: the corpus collapses to fingerprint grain in ONE aggregate —
    * collect_set(source) per fingerprint subsumes the r14 DISTINCT, and
    * the source set per key is bounded by the SOURCE count (tens), so
    * the map-side partials never grow even on a key every document
    * shares. Pairs come out of an index HOF over the sorted set (a key
    * shared by all S sources yields C(S,2) pairs map-side) — the r14
    * self-join on h evaluated the distinct subtree twice and shuffled
    * both sides. Exact BIGINT counts; ordered (source_a < source_b)
    * cells. */
  val sourceOverlap: Q = Q.checked(
    "q_source_overlap",
    """WITH t AS (SELECT DISTINCT substring(text, 1, 40) AS h, source
      |           FROM documents)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  CAST(count(*) AS BIGINT) AS n_shared_keys
      |FROM t a JOIN t b ON a.h = b.h AND a.source < b.source
      |GROUP BY a.source, b.source
      |ORDER BY source_a, source_b""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(substring(col("text"), 1, 40).as("h"), col("source"))
      .groupBy("h")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .select(explode(expr(
        """flatten(transform(srcs,
          |  (a, i) -> transform(slice(srcs, i + 2, size(srcs)),
          |    b -> named_struct('source_a', a, 'source_b', b))))"""
          .stripMargin)).as("pr"))
      .select(col("pr.source_a").as("source_a"),
        col("pr.source_b").as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared_keys"))
      .orderBy("source_a", "source_b")
  }

  val all: Seq[Q] =
    Seq(fkAudit, chisq, joinSizeEst, benford, skewReport, embedDrift,
      datasetCard, sourceOverlap)
}

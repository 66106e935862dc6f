package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation surface (SURVEY.md §2.2-D).
  *
  * Determinism contract with the DuckDB oracle (SURVEY.md §7.4/§7.5):
  * money sums are computed over `DECIMAL(18,2)`-cast inputs — exact,
  * association-order-independent — then cast to DOUBLE for a
  * schema-stable output. Averages divide the exact decimal sum (as
  * double) by the count, which is bit-identical across engines. No
  * floating aggregation whose result depends on partition order ever
  * reaches a checked output unrounded.
  */
object AggOps {
  private val D = DecimalType(18, 2)

  /** Flagship: TPC-H Q1 shape over lineitem [SURVEY §2.2 q_agg_group]. */
  val aggGroup: Q = Q.checked(
    "q_agg_group",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D)).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(D)).cast(DoubleType).as("sum_base_price"),
        sum(col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D)))
          .cast(DoubleType).as("sum_disc_price"),
        (sum(col("l_quantity").cast(D)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(D)).cast(DoubleType) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Distinct aggregates per group. */
  val aggDistinct: Q = Q.checked(
    "q_agg_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_suppkey) AS distinct_supp,
      |  count(DISTINCT l_partkey) AS distinct_part,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("distinct_supp"),
        countDistinct(col("l_partkey")).as("distinct_part"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Statistical moments per event_type, computed from exact decimal sums
    * (sum, sum-of-squares) so variance/stddev are association-order-free
    * — plain stddev_samp over doubles is partition-order-dependent and
    * can flake the hash compare (SURVEY §7.4). */
  val aggStats: Q = Q.checked(
    "q_agg_stats",
    Tables.EventsCte +
      """
        |SELECT event_type, count(*) AS n,
        |  min(value) AS min_v, max(value) AS max_v,
        |  (CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |   - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |  / (count(*) - 1) AS var_v,
        |  sqrt((CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |   - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |  / (count(*) - 1)) AS std_v
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, dir) =>
    val v = col("value").cast(D)
    val sumSq = sum(v * v).cast(DoubleType)
    val sumV = sum(v).cast(DoubleType)
    val n = count(lit(1))
    val variance = (sumSq - sumV * sumV / n) / (n - lit(1))
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min("value").as("min_v"), max("value").as("max_v"),
        variance.as("var_v"), sqrt(variance).as("std_v"))
      .orderBy("event_type")
  }

  /** ROLLUP (r_name ← n_name) with grouping_id. */
  val aggRollup: Q = Q.checked(
    "q_agg_rollup",
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(grouping_id(r_name, n_name) AS BIGINT) AS gid
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name")
      // ROLLUP expressed as its grouping-sets expansion: Dataset.rollup on a
      // join output trips Spark's ambiguous-self-join heuristic on the
      // grouping columns; groupingSets resolves cleanly (same plan, same
      // semantics)
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq.empty),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** CUBE (returnflag × linestatus). */
  val aggCube: Q = Q.checked(
    "q_agg_cube",
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** Explicit GROUPING SETS ((mktsegment),(n_name),()). */
  val aggGroupingSets: Q = Q.checked(
    "q_agg_grouping_sets",
    s"""SELECT c_mktsegment, n_name, count(*) AS n_cust,
       |  ${dsumSql("c_acctbal")} AS sum_bal,
       |  CAST(grouping_id(c_mktsegment, n_name) AS BIGINT) AS gid
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
       |ORDER BY gid, c_mktsegment NULLS FIRST, n_name NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("c_mktsegment")), Seq(col("n_name")), Seq.empty),
        col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
        col("n_name").asc_nulls_first)
  }

  /** Portable pivot: event_type → columns via conditional counts.
    * count(CASE …) (BIGINT in both engines) rather than sum(int), which
    * DuckDB widens to HUGEINT. */
  val pivotCase: Q = Q.checked(
    "q_pivot_case",
    Tables.EventsCte +
      """
        |SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(*) AS n
        |FROM ev GROUP BY 1 ORDER BY day""".stripMargin
  ) { (s, dir) =>
    def cnt(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(cnt("click").as("n_click"), cnt("view").as("n_view"),
        cnt("purchase").as("n_purchase"), cnt("signup").as("n_signup"),
        cnt("error").as("n_error"), count(lit(1)).as("n"))
      .orderBy("day")
  }

  /** Deterministic string aggregation: array_sort + array_join instead of
    * collect_list order (which is partition-order-dependent); the oracle's
    * string_agg carries an explicit ORDER BY. Output bounded: one row per
    * (returnflag, linestatus). */
  val aggStrAgg: Q = Q.checked(
    "q_str_agg",
    """SELECT l_returnflag, l_linestatus,
      |  string_agg(DISTINCT CAST(l_shipmode_b AS VARCHAR), ',' ORDER BY CAST(l_shipmode_b AS VARCHAR)) AS buckets
      |FROM (SELECT l_returnflag, l_linestatus, l_orderkey % 8 AS l_shipmode_b
      |      FROM lineitem)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("l_orderkey") % 8).cast(StringType).as("b"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(array_join(array_sort(collect_set(col("b"))), ",").as("buckets"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Pearson correlation from exact decimal component sums (the builtin
    * corr() folds doubles in partition order — association-sensitive),
    * combined with one fixed sequence of IEEE ops mirrored in the oracle.
    * The result is rounded to 9dp: sum(price²) exceeds 2^53 scale-units,
    * where DuckDB's decimal→double conversion double-rounds (int128 →
    * double, then ÷10^scale) while Spark's BigDecimal path rounds once —
    * a 1-ulp divergence observed at sf0.001. */
  val aggCorr: Q = Q.checked(
    "q_agg_corr",
    """SELECT l_returnflag, count(*) AS n,
      |  round(
      |  (count(*) * CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |      * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))
      |  / (sqrt(count(*) * CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |      - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |        * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
      |   * sqrt(count(*) * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |      - CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |        * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)))
      |  , 9) AS corr_qty_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    val q = col("l_quantity").cast(D)
    val p = col("l_extendedprice").cast(D)
    val n = count(lit(1))
    val sq = sum(q).cast(DoubleType)
    val sp = sum(p).cast(DoubleType)
    val sqp = sum(q * p).cast(DoubleType)
    val sqq = sum(q * q).cast(DoubleType)
    val spp = sum(p * p).cast(DoubleType)
    val corr = round((n * sqp - sq * sp) /
      (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 9)
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(n.as("n"), corr.as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Boolean / conditional aggregates: bool_and, bool_or, count_if, and a
    * deterministic any_value (made order-independent by aggregating a
    * column that is constant within each group — the only way any_value
    * is oracle-checkable). All exact integer/boolean logic. */
  val aggBool: Q = Q.checked(
    "q_agg_bool",
    """SELECT o_orderpriority,
      |  bool_and(o_totalprice > 1000)   AS all_over_1k,
      |  bool_or(o_totalprice > 400000)  AS any_over_400k,
      |  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
      |  any_value(substr(o_orderpriority, 1, 1)) AS prio_digit
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
        count_if(col("o_orderstatus") === "F").as("n_finished"),
        any_value(substring(col("o_orderpriority"), 1, 1)).as("prio_digit"))
      .orderBy("o_orderpriority")
  }

  /** Ordered collect: the top-5 customers per segment by balance, joined
    * into one comma-separated string per group. `collect_list` alone is
    * partition-order-exposed, so the order is pinned BY CONSTRUCTION:
    * rank first (total (balance desc, custkey) order), collect
    * (rn, name) structs, `sort_array` on the struct (rn leads), then
    * project names — same pinned order as the oracle's
    * `string_agg(... ORDER BY rn)`. The collect runs over the ≤5-rows-
    * per-group survivor frame, never the raw table. */
  val collectTop: Q = Q.checked(
    "q_collect",
    """WITH r AS (
      |  SELECT c_mktsegment, c_name, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |SELECT c_mktsegment,
      |  string_agg(c_name, ',' ORDER BY rn) AS top5_names,
      |  CAST(min(c_acctbal) AS DOUBLE) AS bal_floor
      |FROM r WHERE rn <= 5
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    // k-bounded TopKAgg instead of a row_number window: the window twin
    // sorts EVERY customer of a segment in one task (5 segments ⇒
    // parallelism 5, corpus-scale per task); the aggregator's buffer
    // caps the shuffle at 5 rows per segment per map partition and the
    // 25-row result broadcasts back for the name lookup. Same total
    // order (acctbal desc, custkey asc) ⇒ hash-identical output.
    val top5 = udaf(new graft.functions.TopKAgg(5))
    val c = Tables.customer(s, dir)
    val top = c.groupBy("c_mktsegment")
      .agg(top5(col("c_acctbal"), col("c_custkey")).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("c_mktsegment"), (col("pos") + 1).as("rn"),
        col("t._2").as("c_custkey"), col("t._1").as("c_acctbal"))
    c.select("c_custkey", "c_name")
      .join(broadcast(top), "c_custkey")
      .groupBy("c_mktsegment")
      .agg(
        array_join(expr(
          "transform(sort_array(collect_list(struct(rn, c_name)))," +
            " x -> x.c_name)"), ",").as("top5_names"),
        min(col("c_acctbal")).cast(DoubleType).as("bal_floor"))
      .orderBy("c_mktsegment")
  }

  /** GROUPING() markers on a rollup — the only way a consumer can tell a
    * subtotal row's NULL from genuinely-null data; every BI layer on top
    * of a rollup needs them. Markers also give subtotal rows a stable
    * sort group. */
  val groupingMarker: Q = Q.checked(
    "q_grouping_marker",
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      |  coalesce(o_orderpriority, '(all)') AS prio,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      |  count(*) AS n
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, status, prio""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(grouping(col("o_orderstatus")).cast(LongType).as("g_status"),
        grouping(col("o_orderpriority")).cast(LongType).as("g_prio"),
        count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("prio"),
        col("g_status"), col("g_prio"), col("n"))
      .orderBy("g_status", "g_prio", "status", "prio")
  }

  /** FILTER-clause aggregates (SQL:2003) — several differently-filtered
    * aggregates out of ONE scan and ONE shuffle, the idiom that replaces
    * N self-joins in reporting queries. Spark's DataFrame spelling is
    * `agg(f(when(cond, x)))`: `when` without otherwise yields NULL, and
    * every aggregate skips NULLs, which is exactly FILTER semantics
    * (incl. count(DISTINCT col) FILTER — nulls never form a group).
    * Money goes through the DECIMAL(18,2) recipe before summing. */
  val aggFilter: Q = Q.checked(
    "q_agg_filter",
    """SELECT l_returnflag,
      |  count(*) AS n_lines,
      |  count(*) FILTER (WHERE l_discount >= 0.05) AS n_highdisc,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
      |    FILTER (WHERE l_shipdate < TIMESTAMP '1998-01-01') AS DOUBLE)
      |    AS rev_pre98,
      |  count(DISTINCT l_suppkey) FILTER (WHERE l_quantity >= 45)
      |    AS n_bulk_supp
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("l_discount") >= 0.05, 1)).as("n_highdisc"),
        dsum(when(expr("l_shipdate < TIMESTAMP '1998-01-01'"),
          col("l_extendedprice"))).as("rev_pre98"),
        countDistinct(when(col("l_quantity") >= 45, col("l_suppkey")))
          .as("n_bulk_supp"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(aggGroup, aggDistinct, aggStats, aggRollup, aggCube,
    aggGroupingSets, pivotCase, aggStrAgg, aggCorr, aggBool, collectTop,
    groupingMarker, aggFilter)
}

package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface (SURVEY.md §2.2-H): string / date / math / json /
  * hash / array / explode / map — all Spark built-ins (codegen'd, no UDFs).
  *
  * Cross-engine determinism notes (SURVEY §7.4/§7.5):
  *  - int-returning Spark funcs (length, year, datediff, …) are cast to
  *    BIGINT because the DuckDB twins return BIGINT and the driver
  *    stringifies values ("3" vs "3", but a double would print "3.0").
  *  - round() is applied ONLY to irrational-derived doubles (sqrt/ln/
  *    cosine): for those a decimal tie is measure-zero, so Spark's
  *    BigDecimal-string rounding and DuckDB's scaled-rint rounding agree.
  *    Money (exact-2dp doubles) is never re-rounded at a coarser scale —
  *    round(2.675, 2) is 2.68 in Spark but 2.67 in DuckDB.
  *  - floats widen to double exactly; products of two floats are exact in
  *    double (24+24 < 53 mantissa bits); sums go through DECIMAL where the
  *    fold order is not provably identical.
  */
object ScalarOps {

  /** String suite over part names. */
  val strFuncs: Q = Q.checked(
    "q_str_funcs",
    """SELECT p_partkey,
      |  upper(p_name) AS up,
      |  lower(p_brand) AS lo,
      |  substr(p_name, 1, 12) AS sub,
      |  CAST(length(p_name) AS BIGINT) AS len,
      |  trim(p_type) AS trm,
      |  replace(p_name, ' ', '_') AS rep,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS has_red
      |FROM part ORDER BY p_partkey""".stripMargin
  ) { (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 12).as("sub"),
        length(col("p_name")).cast(LongType).as("len"),
        trim(col("p_type")).as("trm"),
        regexp_replace(col("p_name"), " ", "_").as("rep"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_name").like("%red%"), 1).otherwise(0).as("has_red"))
      .orderBy("p_partkey")
  }

  /** Date suite over o_orderdate, aggregated per (year, month) so the
    * output is bounded (~84 rows) at any scale factor. */
  val dateFuncs: Q = Q.checked(
    "q_date_funcs",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  count(*) AS n,
      |  CAST(min(day(o_orderdate)) AS BIGINT) AS min_day,
      |  CAST(max(day(o_orderdate)) AS BIGINT) AS max_day,
      |  CAST(min(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS min_day_num,
      |  min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_start,
      |  min(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)) AS min_plus3m,
      |  CAST(min(epoch(o_orderdate)) AS BIGINT) AS min_epoch
      |FROM orders
      |GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"))
      .agg(count(lit(1)).as("n"),
        min(dayofmonth(col("o_orderdate"))).cast(LongType).as("min_day"),
        max(dayofmonth(col("o_orderdate"))).cast(LongType).as("max_day"),
        min(datediff(col("o_orderdate").cast(DateType),
          lit("1992-01-01").cast(DateType))).cast(LongType).as("min_day_num"),
        min(date_trunc("month", col("o_orderdate")).cast(DateType)).as("month_start"),
        min(add_months(col("o_orderdate"), 3)).as("min_plus3m"),
        min(unix_timestamp(col("o_orderdate"))).as("min_epoch"))
      .orderBy("yr", "mo")
  }

  /** Math suite on a deterministic lineitem slice (o_orderkey % 997 = 0) so
    * per-row output stays bounded; ORDER BY spans all columns because
    * (l_orderkey, l_linenumber) is not unique in the testdata. */
  val mathFuncs: Q = Q.checked(
    "q_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25.0) AS q_abs,
      |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_ceil,
      |  CAST(floor(l_discount * 100) AS BIGINT) AS disc_floor,
      |  round(sqrt(l_extendedprice), 4) AS price_sqrt,
      |  round(ln(l_quantity), 6) AS q_ln,
      |  pow(l_quantity, 2) AS q_sq,
      |  CAST(sign(l_discount - 0.04) AS BIGINT) AS disc_sign,
      |  l_orderkey % 7 AS key_mod
      |FROM lineitem
      |WHERE l_orderkey % 997 = 0
      |ORDER BY l_orderkey, l_linenumber, q_abs, disc_ceil, disc_floor,
      |  price_sqrt, q_ln, q_sq, disc_sign, key_mod""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 997 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25.0).as("q_abs"),
        ceil(col("l_discount") * 100).cast(LongType).as("disc_ceil"),
        floor(col("l_discount") * 100).cast(LongType).as("disc_floor"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        round(log(col("l_quantity")), 6).as("q_ln"),
        pow(col("l_quantity"), 2).as("q_sq"),
        signum(col("l_discount") - 0.04).cast(LongType).as("disc_sign"),
        (col("l_orderkey") % 7).as("key_mod"))
      .orderBy("l_orderkey", "l_linenumber", "q_abs", "disc_ceil",
        "disc_floor", "price_sqrt", "q_ln", "q_sq", "disc_sign", "key_mod")
  }

  /** JSON extraction: events.props = {"k": <int>}, bucketed aggregate. */
  val json: Q = Q.checked(
    "q_json",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  count(*) AS n,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1 ORDER BY k_bucket""".stripMargin
  ) { (s, dir) =>
    // project k once — three get_json_object calls per row would parse the
    // JSON three times (no CSE across aggregate expressions)
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("k_bucket")
  }

  /** md5 + sha256 over canonicalized customer columns — the identity-hash
    * pattern (SURVEY §2.2-H q_hash; canonicalization per graft.cdc.Hashing). */
  val hashFuncs: Q = Q.checked(
    "q_hash",
    """SELECT c_custkey,
      |  md5(concat_ws('|', coalesce(CAST(c_custkey AS VARCHAR), '<NULL>'),
      |                     coalesce(c_mktsegment, '<NULL>'))) AS h_md5,
      |  sha256(concat_ws('|', coalesce(CAST(c_custkey AS VARCHAR), '<NULL>'),
      |                        coalesce(c_mktsegment, '<NULL>'))) AS h_sha,
      |  md5(coalesce(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR), '<NULL>')) AS h_bal
      |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val payload = concat_ws("|",
      coalesce(col("c_custkey").cast(StringType), lit("<NULL>")),
      coalesce(col("c_mktsegment"), lit("<NULL>")))
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        md5(payload).as("h_md5"),
        sha2(payload, 256).as("h_sha"),
        md5(coalesce(col("c_acctbal").cast(DecimalType(18, 2)).cast(StringType),
          lit("<NULL>"))).as("h_bal"))
      .orderBy("c_custkey")
  }

  /** Array higher-order functions over the embedding column — no UDFs:
    * size / element_at / slice / transform+aggregate stay inside codegen. */
  val array: Q = Q.checked(
    "q_array",
    """SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS first_v,
      |  CAST(embedding[64] AS DOUBLE) AS last_v,
      |  round(list_sum(list_transform(embedding[1:8],
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS ss8
      |FROM embeddings ORDER BY vec_id""".stripMargin
  ) { (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        element_at(col("embedding"), 1).cast(DoubleType).as("first_v"),
        element_at(col("embedding"), 64).cast(DoubleType).as("last_v"),
        round(expr(
          """aggregate(slice(embedding, 1, 8), CAST(0 AS DOUBLE),
            |(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin),
          4).as("ss8"))
      .orderBy("vec_id")
  }

  /** Generator surface: posexplode the embedding array and aggregate per
    * position. Float sums go through DECIMAL(18,8) (exact, fold-order-free);
    * min/max are exact. Spark's 0-based pos is shifted to DuckDB's 1-based
    * subscripts. */
  val explode: Q = Q.checked(
    "q_explode",
    """SELECT pos, count(*) AS n,
      |  CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,8))) AS DOUBLE) AS sum_v,
      |  CAST(min(val) AS DOUBLE) AS min_v,
      |  CAST(max(val) AS DOUBLE) AS max_v
      |FROM (SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
      |             unnest(embedding) AS val
      |      FROM embeddings)
      |GROUP BY pos ORDER BY pos""".stripMargin
  ) { (s, dir) =>
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("pos0", "val")))
      .select((col("pos0") + 1).cast(LongType).as("pos"), col("val"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        // float → DOUBLE → DECIMAL on BOTH sides: DuckDB's direct
        // FLOAT→DECIMAL cast rounds at float precision and drifts
        sum(col("val").cast(DoubleType).cast(DecimalType(18, 8)))
          .cast(DoubleType).as("sum_v"),
        min(col("val")).cast(DoubleType).as("min_v"),
        max(col("val")).cast(DoubleType).as("max_v"))
      .orderBy("pos")
  }

  /** MapType round-trip: parse props into a map, extract the scalar back
    * out (maps never appear in checked output — SURVEY §7.5 rule 4). The
    * oracle extracts the same scalar via JSON — semantic, not syntactic,
    * equivalence. */
  val mapOps: Q = Q.checked(
    "q_map",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS k_mod,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin
  ) { (s, dir) =>
    // translate (plain char mapping) instead of a regex scrub — same
    // output, no per-row regex engine
    val m = expr("""str_to_map(translate(props, '{}" ', ''), ',', ':')""")
    val k = element_at(m, "k").cast(LongType)
    Tables.events(s, dir)
      .withColumn("k", k)
      .groupBy((col("k") % 5).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("k_mod")
  }

  /** Null semantics in one frame: NULLIF-constructed nulls, null-safe
    * equality (`<=>` / IS NOT DISTINCT FROM — true only when both sides
    * are null here, since the domains are disjoint), null-skipping
    * count/count(DISTINCT), and COALESCE fallback. The corner every
    * engine port gets wrong somewhere; one row of exact integers pins
    * all of it cross-engine. */
  val nullSemantics: Q = Q.checked(
    "q_null_semantics",
    """WITH t AS (
      |  SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS p1,
      |    NULLIF(o_orderstatus, 'O') AS s1
      |  FROM orders)
      |SELECT count(*) AS n,
      |  CAST(sum(CASE WHEN p1 IS NOT DISTINCT FROM s1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_nullsafe_eq,
      |  CAST(sum(CASE WHEN p1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_null_p,
      |  CAST(count(p1) AS BIGINT) AS n_nonnull_p,
      |  CAST(count(DISTINCT p1) AS BIGINT) AS nd_p,
      |  coalesce(min(p1), 'none') AS min_p
      |FROM t""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("p1"),
        nullif(col("o_orderstatus"), lit("O")).as("s1"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("p1") <=> col("s1"), 1).otherwise(0)).cast(LongType)
          .as("n_nullsafe_eq"),
        sum(when(col("p1").isNull, 1).otherwise(0)).cast(LongType)
          .as("n_null_p"),
        count(col("p1")).as("n_nonnull_p"),
        countDistinct(col("p1")).as("nd_p"),
        coalesce(min(col("p1")), lit("none")).as("min_p"))
  }

  /** Bitwise scalar + aggregate suite (SQL:2016 bit_and/bit_or/bit_xor):
    * per event type, a 16-bit user-presence mask (bit_or of a shifted
    * one-hot), its popcount, the xor-fold of the props integer k, and the
    * and-fold of (k | 256) — the compact-bitmap idioms (presence masks,
    * permission folds, parity checks) that replace collect_set at scale.
    * One hash aggregation with map-side combine; bit folds are
    * associative+commutative, so partial aggregation is exact.
    *
    * Both engines evaluate identical integer ops — no floats anywhere.
    * Spark's `^` is DuckDB's POWER: the oracle must use DuckDB's xor()/
    * bit_xor() spellings, never `^` (a silent cross-dialect trap). */
  val bitOps: Q = Q.checked(
    "q_bit_ops",
    """WITH e AS (
      |  SELECT event_type, user_id,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  CAST(bit_or(1 << CAST(user_id % 16 AS INT)) AS BIGINT) AS user_mask,
      |  CAST(bit_count(CAST(bit_or(1 << CAST(user_id % 16 AS INT))
      |    AS BIGINT)) AS BIGINT) AS user_mask_bits,
      |  CAST(bit_xor(k) AS BIGINT) AS k_xor,
      |  CAST(bit_and(k | 256) AS BIGINT) AS k_and
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("CAST(bit_or(shiftleft(1, CAST(user_id % 16 AS INT))) AS BIGINT)")
          .as("user_mask"),
        expr("""CAST(bit_count(CAST(bit_or(shiftleft(1,
          CAST(user_id % 16 AS INT))) AS BIGINT)) AS BIGINT)""")
          .as("user_mask_bits"),
        expr("CAST(bit_xor(k) AS BIGINT)").as("k_xor"),
        expr("CAST(bit_and(k | 256) AS BIGINT)").as("k_and"))
      .orderBy("event_type")
  }

  /** regexp_extract_all + global regexp_replace — the PII-shaped scrub
    * pair: per segment, digit-group counts and the distinct masked-name
    * space after replacing every digit with '#'. Dialect pin: Spark's
    * regexp_replace is global by default, DuckDB's needs the 'g' flag —
    * the oracle says so explicitly (first-match-only would silently
    * leave PII in suffixes). Map-only expressions + one hash agg. */
  val regexpAll: Q = Q.checked(
    "q_regexp_all",
    """SELECT c_mktsegment,
      |  count(*) AS n,
      |  CAST(sum(len(regexp_extract_all(c_name, '[0-9]+'))) AS BIGINT)
      |    AS n_digit_groups,
      |  count(DISTINCT regexp_replace(c_name, '[0-9]', '#', 'g'))
      |    AS n_masked,
      |  min(regexp_extract(c_name, '([0-9]+)', 1)) AS min_digits
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""
      .stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(size(expr("regexp_extract_all(c_name, '[0-9]+', 0)")))
          .cast(LongType).as("n_digit_groups"),
        countDistinct(regexp_replace(col("c_name"), "[0-9]", "#"))
          .as("n_masked"),
        min(regexp_extract(col("c_name"), "([0-9]+)", 1)).as("min_digits"))
      .orderBy("c_mktsegment")
  }

  /** Spark 4 VARIANT path over semi-structured data: synthesize a
    * nested JSON document per event (byte-identical string concat in
    * both engines — never engine-side JSON serialization, whose field
    * order/spacing differ), `parse_json` it ONCE into a VariantType
    * column, and extract typed nested fields with `variant_get`. The
    * oracle reads the same bytes with DuckDB's json_extract — proving
    * the variant decode agrees with a classic JSON engine on values.
    *
    * Why variant at 100 TB: a variant column is parsed once at ingest
    * into a shredded binary encoding, so N downstream `variant_get`s
    * are field reads, not N re-parses of the text — the q_json comment
    * ("no CSE across aggregate expressions") is the problem variant
    * exists to solve. Plan shape: map-only synth+parse, one hash
    * aggregation, 5-row result. */
  val variantOps: Q = Q.checked(
    "q_variant",
    """WITH js AS (
      |  SELECT event_type,
      |    '{"u":' || CAST(user_id AS VARCHAR) || ',"inner":' || props || '}'
      |      AS doc
      |  FROM events)
      |SELECT event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(doc, '$.inner.k') AS BIGINT))
      |    AS BIGINT) AS sum_k,
      |  CAST(max(CAST(json_extract_string(doc, '$.u') AS BIGINT))
      |    AS BIGINT) AS max_u,
      |  CAST(count(DISTINCT CAST(json_extract_string(doc, '$.inner.k')
      |    AS BIGINT) % 7) AS BIGINT) AS k_res
      |FROM js GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, dir) =>
    val v = Tables.events(s, dir)
      .select(col("event_type"),
        parse_json(concat(lit("{\"u\":"), col("user_id").cast(StringType),
          lit(",\"inner\":"), col("props"), lit("}"))).as("doc"))
      .select(col("event_type"),
        try_variant_get(col("doc"), "$.inner.k", "bigint").as("k"),
        try_variant_get(col("doc"), "$.u", "bigint").as("u"))
    v.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast(LongType).as("sum_k"),
        max(col("u")).as("max_u"),
        countDistinct(col("k") % 7).as("k_res"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(strFuncs, dateFuncs, mathFuncs, json, hashFuncs,
    array, explode, mapOps, nullSemantics, bitOps, regexpAll, variantOps)
}

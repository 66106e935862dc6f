package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation salting for hot join keys (SURVEY.md §4; AQE's skew
  * join covers sort-merge cases, but broadcast-ineligible skewed
  * aggregations and storage-partitioned joins still want explicit salt).
  *
  * `saltedJoin`: the skewed (big) side gets a deterministic salt in
  * [0, n) derived from xxhash64 over ALL its columns (content-derived —
  * no rand(), so retries/speculative tasks stay consistent); the small
  * side is exploded n× with every salt value. The join key becomes
  * (key, salt), splitting each hot key's rows across n tasks.
  *
  * `saltedAgg` pattern: two-phase aggregation via an added salt column —
  * partial per (key, salt), final per key. For algebraic aggregates this
  * is what map-side partials already do; use it only for holistic ops.
  */
object Salt {

  /** Content-derived salt column in [0, n). */
  def saltCol(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(n))

  /** Equi-join `big ⋈ small` on `key`, salted n ways. Result columns =
    * big's ++ small's (minus the duplicated key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 n: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(big, n))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
      .withColumnRenamed(key, "__key_small")
    saltedBig
      .join(saltedSmall,
        saltedBig(key) === col("__key_small")
          && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt", "__key_small")
  }

  /** Production two-path skew join: replicate the small side ONLY for the
    * detected hot keys; everything else joins plainly. Replication cost
    * drops from n × |small| to n × |hot|, which is what makes n=64+
    * affordable against a power-law key (the uniform-replication
    * [[saltedJoin]] pays n × |small| regardless).
    *
    * `hotKeys` comes from a cheap pre-pass (e.g. approximate top-k key
    * counts over a sample — at 100 TB you ALWAYS know your heavy hitters
    * before the join); it is broadcast twice as a tiny literal-ish frame.
    * Disjointness of the two paths makes the union exact: every big row
    * goes through exactly one path. */
  def hotColdJoin(big: DataFrame, small: DataFrame, key: String,
                  hotKeys: DataFrame, n: Int): DataFrame = {
    val hk = broadcast(hotKeys.select(col(key).as("__hot_key")).distinct())
    val isHot = col(key) === col("__hot_key")
    val bigHot = big.join(hk, isHot, "left_semi")
    val bigCold = big.join(hk, isHot, "left_anti")
    val smallHot = small.join(hk, isHot, "left_semi")
    val smallCold = small.join(hk, isHot, "left_anti")
    saltedJoin(bigHot, smallHot, key, n)
      // align column order with saltedJoin output (big's ++ small's sans key)
      .unionByName(bigCold.join(smallCold, key)
        .select(bigCold.columns.map(col) ++
          smallCold.columns.filterNot(_ == key).map(col): _*))
  }
}

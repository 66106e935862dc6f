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
}

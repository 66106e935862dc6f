package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The bucketized bounded-window self-join shared by q_dedup_embed,
  * q_fuzzy_match, and (in spirit) q_join_range: pairs (a, b) inside the
  * same blocking keys with 0 < key_b − key_a ≤ W, planned as a plain
  * shuffled EQUI-join — no range probe, no nested loop.
  *
  * Mechanics: bucket = ⌊key / W⌋. A partner within (key, key+W] lives in
  * a's bucket or the next one, so side a is exploded into {bucket,
  * bucket+1} (candidate volume exactly 2·n rows) and the window becomes
  * an equality on (blocks…, bucket) plus the residual range guard.
  * Pair count grows O(n·W) — linear in n — where unwindowed within-block
  * pairs grow O(block²); bucket count grows with n, so parallelism
  * scales with data. */
object BlockedSelfJoin {

  /** Self-join `df` on (blockCols…, key window of W). Output columns:
    * `key_a`, `key_b`, the block columns (side a's), and
    * `<payload>_a` / `<payload>_b` for each payload column. */
  def windowPairs(df: DataFrame, keyCol: String, blockCols: Seq[String],
                  payloadCols: Seq[String], w: Int): DataFrame = {
    val bk = (col(keyCol) / w).cast(LongType)
    val a = df.select(
        (col(keyCol).as("key_a") +: blockCols.map(col)) ++
          payloadCols.map(c => col(c).as(s"${c}_a")) :+ bk.as("__bk"): _*)
      .withColumn("__bucket", explode(array(col("__bk"), col("__bk") + 1)))
    val b = df.select(
      (col(keyCol).as("key_b") +: blockCols.map(c => col(c).as(s"__${c}_b"))) ++
        payloadCols.map(c => col(c).as(s"${c}_b")) :+ bk.as("__bucket_b"): _*)
    val joinCond = blockCols
      .map(c => col(c) === col(s"__${c}_b"))
      .foldLeft(col("__bucket") === col("__bucket_b"))(_ && _) &&
      col("key_b") > col("key_a") && col("key_b") <= col("key_a") + w
    a.join(b, joinCond)
      .drop("__bk", "__bucket", "__bucket_b")
      .drop(blockCols.map(c => s"__${c}_b"): _*)
  }
}

package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level CDC configuration [upstream `config.yaml`, SURVEY.md §2.1
  * R10]: which columns identify a row, and which carry its value.
  */
final case class CdcConfig(keyCols: Seq[String], valueCols: Seq[String]) {
  require(keyCols.nonEmpty, "CDC requires at least one key column")
  def allCols: Seq[String] = keyCols ++ valueCols
}

/** The reference's core dataflow [upstream `cdc.py`, SURVEY.md §2.1
  * R3+R5+R6+R7+R8], as pure DataFrame → DataFrame functions.
  *
  * One full-outer join on `keyhash` is the only shuffle; operation codes
  * are derived in a single `when/otherwise` classifier column (no
  * per-class count() jobs — counts come from one groupBy("op")).
  *
  * 100 TB design (SURVEY.md §4): the previous-state snapshot should be
  * written hash-partitioned/bucketed by keyhash so the join's state side
  * needs no shuffle; only the (much smaller) incremental extract moves.
  * With `useXxhash64=true` the join key is an 8-byte long instead of a
  * 32-char md5 hex string — markedly cheaper to shuffle and compare.
  */
object CdcMerge {
  val KeyHash = "keyhash"
  val NonKeyHash = "nonkeyhash"
  val OpCol = "op"

  /** Schema-metadata key on the [[KeyHash]] column recording the exact
    * key-column list (ordered, comma-joined) the hash was computed over.
    * Parquet and the catalog both persist column metadata, so a state
    * generation carries its own key provenance — alignStateToConfig
    * compares it order-sensitively against the live config and refuses
    * to reuse a keyhash computed over a different key set/order. */
  val KeyColsMeta = "graft.cdc.keyCols"

  val Insert = "I"
  val Update = "U"
  val Delete = "D"
  val Unchanged = "N"

  /** Prefix of the prior-image columns emitted by
    * `classifyHashed(..., withPriors = true)`. */
  val OldPrefix = "__old_"

  /** R3: project to the configured columns and add identity hashes. */
  def withHashes(df: DataFrame, cfg: CdcConfig,
                 useXxhash64: Boolean = false): DataFrame = {
    val projected = df.select(cfg.allCols.map(col): _*)
    val kh = if (useXxhash64) Hashing.keyhash64(projected, cfg.keyCols)
             else Hashing.md5Hash(projected, cfg.keyCols)
    val nkh = if (useXxhash64) Hashing.keyhash64(projected, cfg.valueCols)
              else Hashing.md5Hash(projected, cfg.valueCols)
    val khMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(KeyColsMeta, cfg.keyCols.mkString(",")).build()
    projected.select(projected.columns.map(col) :+
      kh.as(KeyHash, khMeta) :+ nkh.as(NonKeyHash): _*)
  }

  /** R5+R6: full-outer join previous state with the incoming extract and
    * classify every row as I/U/D/N. Output schema: the configured columns
    * (current values for I/U/N, previous values for D) + keyhash + op.
    */
  def classify(prev: DataFrame, curr: DataFrame, cfg: CdcConfig,
               useXxhash64: Boolean = false): DataFrame =
    classifyHashed(withHashes(prev, cfg, useXxhash64),
      withHashes(curr, cfg, useXxhash64), cfg)

  /** classify() for inputs that already carry keyhash/nonkeyhash — the
    * bucketed-state path ([[graft.streaming.CdcBucketed]]) persists the
    * hashes with the snapshot so the merge join needs no re-hash AND no
    * shuffle on the state side.
    *
    * The join matches on keyhash AND the business key columns: the 64-bit
    * xxhash64 keyhash alone has ~50% probability of at least one birthday
    * collision by ~5 × 10⁹ distinct keys — at the 100 TB design point a
    * collision would silently fuse two unrelated keys into one wrong
    * U/D row. With the business keys in the join condition the hash is
    * only a shuffle/bucket-narrowing prefix (the 8-byte compare rejects
    * almost all non-matches before the wider key compare), and
    * correctness no longer depends on hash uniqueness. Null-safe equality
    * keeps rows with null key parts joinable, matching the hash path
    * (hashing treats nulls deterministically). */
  def classifyHashed(prevHashed: DataFrame, currHashed: DataFrame,
                     cfg: CdcConfig): DataFrame =
    classifyHashed(prevHashed, currHashed, cfg, withPriors = false)

  /** [[classifyHashed]] with an opt-in prior-image output: U rows
    * additionally carry each value column's PREVIOUS value as
    * `__old_<col>` (null on I; unused on D, whose regular columns already
    * hold previous values). Downstream incremental maintenance
    * ([[IncrementalAgg]]) needs the pre-image to retract an update's old
    * contribution; key columns never need priors — the join matches on
    * them, so they cannot change within a U. */
  def classifyHashed(prevHashed: DataFrame, currHashed: DataFrame,
                     cfg: CdcConfig, withPriors: Boolean): DataFrame = {
    val p = prevHashed.alias("p")
    val c = currHashed.alias("c")
    val joinCond = cfg.keyCols.foldLeft(col(s"p.$KeyHash") === col(s"c.$KeyHash")) {
      (acc, k) => acc && (col(s"p.$k") <=> col(s"c.$k"))
    }
    val joined = p.join(c, joinCond, "full_outer")
    val op = when(col(s"p.$KeyHash").isNull, Insert)
      .when(col(s"c.$KeyHash").isNull, Delete)
      .when(col(s"p.$NonKeyHash") =!= col(s"c.$NonKeyHash"), Update)
      .otherwise(Unchanged)
    // side selection switches on the MATCH (c.keyhash present), not on
    // per-column coalesce: an update that legitimately sets a value column
    // to NULL must land as NULL, not fall back to the previous value
    val fromCurr = col(s"c.$KeyHash").isNotNull
    val priorCols =
      if (!withPriors) Seq.empty
      else cfg.valueCols.map(n => when(fromCurr && col(s"p.$KeyHash").isNotNull,
        col(s"p.$n")).as(s"$OldPrefix$n"))
    val outCols = cfg.allCols.map(n =>
      when(fromCurr, col(s"c.$n")).otherwise(col(s"p.$n")).as(n)) ++
      priorCols ++
      Seq(coalesce(col(s"c.$KeyHash"), col(s"p.$KeyHash")).as(KeyHash), op.as(OpCol))
    joined.select(outCols: _*)
  }

  /** R8: per-operation row counts, derived from one aggregation over the
    * classified feed (never count()-per-class — that is one job per op). */
  def counts(classified: DataFrame): DataFrame =
    classified.groupBy(OpCol).count()

  /** R7: the next current-state snapshot — everything except deletes,
    * carrying current values. */
  def applyChanges(classified: DataFrame, cfg: CdcConfig): DataFrame =
    classified.filter(col(OpCol) =!= Delete)
      .select(cfg.allCols.map(col): _*)

  /** Change feed (I/U/D only — the rows a downstream consumer needs),
    * stamped with a caller-supplied batch id so checked outputs stay
    * deterministic (no current_timestamp — SURVEY.md §7.5 rule 3). */
  def changeFeed(classified: DataFrame, batchId: Long): DataFrame =
    classified.filter(col(OpCol) =!= Unchanged)
      .withColumn("batch_id", lit(batchId))
}

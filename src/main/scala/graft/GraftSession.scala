package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's recommended session defaults, shared by the
  * three mains and available to library users.
  *
  * - shuffle partitions = cores on local mode (the 200 default leaves 168
  *   empty tasks per shuffle at this box size); on a real cluster size to
  *   ~2–3× total cores or let AQE coalesce from a higher initial number
  * - AQE on (Spark 4 default) — runtime re-plan, skew-join splitting
  * - UTC session timezone — the oracle contract (SURVEY §7.5 rule 6)
  * - graft SQL functions registered via `spark.sql.extensions`
  *   ([[graft.functions.GraftExtensions]]) — the same conf line works on
  *   any stock Spark cluster
  * - subset co-partitioning allowed: the CDC merge joins on
  *   (keyhash, key columns) while the state table is bucketed by keyhash
  *   alone; equal keys imply equal keyhash, so clustering by the hash
  *   prefix is sufficient and keeps the state side Exchange-free
  *   (`requireAllClusterKeysForCoPartition=true`, the default, would
  *   re-shuffle BOTH sides on the full key list)
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE partition coalescing targets BYTES, but this engine's hot
      // stages are CPU-dense per byte (HOF pair generators, shingle
      // explodes over zstd-compact rows): the default 1 MB
      // minPartitionSize coalesced a 17 MB pair-generation shuffle to 4
      // tasks (432 ms/task measured) while 28 cores idled. Lowering the
      // floor is scale-SAFE, not a local tune: with parallelismFirst
      // (default true) the coalesce target is max(bytes/parallelism,
      // minPartitionSize), so at production shuffle sizes
      // bytes/parallelism dominates and this floor never binds — it
      // only stops byte-targeting from serializing small CPU-heavy
      // stages. Env-overridable for IO-bound deployments.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      // let AQE re-plan (and in particular COALESCE) the plan fragments
      // under .persist(): with the default (false), a cached frame
      // freezes at the static shuffle-partition count, so a vocab-sized
      // persisted frame caches as `spark.sql.shuffle.partitions` tiny
      // partitions and every iterative consumer (BPE training rounds)
      // schedules that many tasks per pass. Scale-neutral: AQE targets
      // bytes, so big cached frames keep their parallelism; only
      // sub-advisory fragments coalesce. Output is partitioning-
      // independent everywhere (the engine's determinism discipline).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")

  /** Session for the driver-contract mains: cores from SPARK_GRAFT_CPUS. */
  def forDriver(): SparkSession = {
    val spark =
      builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

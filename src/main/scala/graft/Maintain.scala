package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions.expr

/** Deployment entry for snapshot-log table maintenance — the operations
  * an owner schedules against a production table, one verb per run:
  *
  * {{{
  * sbt "runMain graft.Maintain <tableDir> history"
  * sbt "runMain graft.Maintain <tableDir> plan [smallFileBytes]"
  * sbt "runMain graft.Maintain <tableDir> optimize [targetFiles [col...] [where=pcol=val ...]]"
  * sbt "runMain graft.Maintain <tableDir> analyze <col> [col...]"
  * sbt "runMain graft.Maintain <tableDir> vacuum [keepLast]"
  * sbt "runMain graft.Maintain <tableDir> vacuum-plan [keepLast]"
  * sbt "runMain graft.Maintain <tableDir> restore <version>"
  * sbt "runMain graft.Maintain <tableDir> clone <dstDir> [version]"
  * sbt "runMain graft.Maintain <tableDir> materialize"
  * sbt "runMain graft.Maintain <tableDir> apply-dv"
  * sbt "runMain graft.Maintain <tableDir> add-check <name> <sqlExpr>"
  * sbt "runMain graft.Maintain <tableDir> drop-check <name>"
  * sbt "runMain graft.Maintain <tableDir> delete-where <sqlPred>"
  * sbt "runMain graft.Maintain <tableDir> update-where <col> <valueExpr> <sqlPred>"
  * sbt "runMain graft.Maintain <indexDir> compact-index bm25|ivf|fingerprint|semvec"
  * sbt "runMain graft.Maintain <embCorpus> train-quantizer <outDir> <idCol> <embCol> <clusters> [iters]"
  * sbt "runMain graft.Maintain <srcDir> replicate <dstDir> <key,cols> <ckptDir> [maxBytes]"
  * sbt "runMain graft.Maintain <tableDir> poll-changes <cursorFile> [key,cols [maxVersions [maxBytes]]]"
  * sbt "runMain graft.Maintain <tableDir> ack-changes <cursorFile> <version>"
  * }}}
  *
  * Every verb is the library call a scheduler would script — this main
  * only parses arguments, prints the outcome, and exits non-zero on the
  * library's loud failures (the alerting hook). Z-order compaction:
  * `optimize` with two or more cluster columns interleaves them.
  */
object Maintain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.forDriver()
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  /** The verb dispatcher, session-injected so specs drive it without
    * owning the session lifecycle. */
  def run(spark: org.apache.spark.sql.SparkSession,
      args: Seq[String]): Unit = {
    require(args.length >= 2, "usage: graft.Maintain <tableDir> <verb> [...]")
    val (dir, verb) = (args(0), args(1))
    val rest = args.drop(2)
    verb match {
        case "history" =>
          SnapshotLog.history(spark, dir).show(100, false)
        case "plan" => // [smallFileBytes] — the compaction advisor
          SnapshotLog.compactionReport(spark, dir,
            rest.headOption.map(_.toLong)
              .getOrElse(128L * 1024 * 1024)).show(1000, false)
        case "optimize" =>
          // [targetFiles [col... [where=pcol=val ...]]] — where= args
          // scope the compaction to one partition's files (the daily-
          // maintenance shape; values as their canonical rendering)
          val target = rest.headOption.map(_.toInt).getOrElse(1)
          val (scopes, cols) = rest.drop(1).partition(_.startsWith("where="))
          val scope: Map[String, Any] = scopes.map { s =>
            val kv = s.stripPrefix("where=")
            val i = kv.indexOf('=')
            require(i > 0, s"bad scope '$s' (want where=col=value)")
            kv.take(i) -> (kv.drop(i + 1): Any)
          }.toMap
          val v = SnapshotLog.optimize(spark, dir, targetFiles = target,
            clusterBy = cols, zorder = cols.size >= 2,
            partitionScope = scope)
          println(s"[maintain] optimize -> v$v")
        case "analyze" =>
          require(rest.nonEmpty, "analyze needs at least one column")
          println(s"[maintain] analyze -> v${
            SnapshotLog.analyze(spark, dir, rest)}")
        case "vacuum" => // [keepLast [minAgeHours]]
          val keep = rest.headOption.map(_.toInt).getOrElse(3)
          val minAge = rest.lift(1).map(_.toDouble * 3600 * 1000)
            .map(_.toLong).getOrElse(0L)
          val (vs, files) = SnapshotLog.vacuum(spark, dir, keepLast = keep,
            minAgeMs = minAge)
          println(s"[maintain] vacuum dropped $vs version(s), $files file(s)")
        case "vacuum-plan" => // [keepLast [minAgeHours]] — dry run
          val keep = rest.headOption.map(_.toInt).getOrElse(3)
          val minAge = rest.lift(1).map(_.toDouble * 3600 * 1000)
            .map(_.toLong).getOrElse(0L)
          val plan = SnapshotLog.vacuumPlan(spark, dir, keepLast = keep,
            minAgeMs = minAge)
          plan.groupBy("kind")
            .agg(org.apache.spark.sql.functions.count("*").as("n"),
              org.apache.spark.sql.functions.sum("bytes").as("bytes"))
            .orderBy("kind").show(truncate = false)
          println(s"[maintain] vacuum-plan: ${plan.count()} artifact(s) " +
            "would be reclaimed (nothing deleted)")
        case "restore" =>
          println(s"[maintain] restore -> v${
            SnapshotLog.restore(spark, dir, rest.head.toLong)}")
        case "clone" =>
          val v = SnapshotLog.shallowClone(spark, dir, rest.head,
            rest.lift(1).map(_.toLong))
          println(s"[maintain] cloned -> ${rest.head} v$v")
        case "materialize" =>
          println(s"[maintain] materialize -> v${
            SnapshotLog.materialize(spark, dir)}")
        case "apply-dv" =>
          println(s"[maintain] apply-dv -> v${
            SnapshotLog.applyDeletionVectors(spark, dir)}")
        case "add-check" =>
          println(s"[maintain] add-check -> v${SnapshotLog.addCheck(
            spark, dir, rest.head, rest.drop(1).mkString(" "))}")
        case "drop-check" =>
          println(s"[maintain] drop-check -> v${
            SnapshotLog.dropCheck(spark, dir, rest.head)}")
        case "delete-where" =>
          println(s"[maintain] delete-where -> v${SnapshotLog.deleteWhere(
            spark, dir, expr(rest.mkString(" ")))}")
        case "update-where" => // <col> '<value expr>' <pred...>
          require(rest.length >= 3,
            "update-where needs <col> <valueExpr> <pred>")
          println(s"[maintain] update-where -> v${SnapshotLog.updateWhere(
            spark, dir, expr(rest.drop(2).mkString(" ")),
            Map(rest.head -> expr(rest(1))))}")
        case "train-quantizer" =>
          // <outDir> <idCol> <embCol> <clusters> [iters] — dir is the
          // embedding corpus (parquet). Deterministic: seeds synthesize
          // from pmod(xxhash64(id), k), Lloyd iterations have no RNG, so
          // the artifact is reproducible from (corpus, k, iters). The
          // output (list_id, centroid) parquet is what streaming
          // dedup_semantic and the batch stage's quantizer_path load —
          // train once, judge every day against the same geometry.
          require(rest.length >= 4, "train-quantizer <outDir> <idCol> " +
            "<embCol> <clusters> [iters]")
          val (outP, idC, embC) = (rest(0), rest(1), rest(2))
          val k = rest(3).toLong
          require(k >= 1, s"clusters must be >= 1, got $k")
          val it = rest.lift(4).map(_.toInt).getOrElse(2)
          import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
          val cents = graft.sim.Ivf.centroidsIter(
            spark.read.parquet(dir).withColumn("__seed",
              pmod(xxhash64(col(idC)), lit(k))),
            embC, "__seed", it)
          cents.write.mode("overwrite").parquet(outP)
          println(s"[maintain] train-quantizer -> " +
            s"${spark.read.parquet(outP).count()} centroids at $outP")
        case "compact-index" =>
          // bm25 | ivf | fingerprint — dir is the INDEX/STORE dir here
          rest.headOption match {
            case Some("bm25") =>
              val (dropped, cleared) =
                graft.streaming.CdcIndex.compact(spark, dir)
              println(s"[maintain] compact-index dropped $dropped " +
                s"row(s), cleared $cleared tombstone(s)")
            case Some("ivf") =>
              val (dropped, cleared) =
                graft.streaming.CdcIvf.compact(spark, dir)
              println(s"[maintain] compact-index dropped $dropped " +
                s"row(s), cleared $cleared tombstone(s)")
            case Some("fingerprint") =>
              val (folded, files) =
                graft.dedup.FingerprintStore.compact(spark, dir)
              println(s"[maintain] compact-index folded $folded row(s), " +
                s"reclaimed $files file(s)")
            case Some("semvec") =>
              // dir = the SemDedupStream outDir (accepted_vecs inside)
              val (folded, files) =
                graft.streaming.SemDedupStream.compact(spark, dir)
              println(s"[maintain] compact-index folded $folded row(s), " +
                s"reclaimed $files file(s)")
            case other => throw new IllegalArgumentException(
              s"compact-index needs bm25|ivf|fingerprint|semvec, got $other")
          }
        case "replicate" => // <dstDir> <key,cols> <ckptDir> [maxBytes]
          require(rest.length >= 3,
            "replicate needs <dstDir> <key,cols> <checkpointDir> [maxBytes]")
          val keys = rest(1).split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          SnapshotLog.replicate(spark, dir, rest.head, keys, rest(2),
            maxBytesPerTrigger = rest.lift(3).map(_.toLong))
            .awaitTermination() // AvailableNow: catch up, then exit
          println(s"[maintain] replicate -> ${rest.head} v${
            SnapshotLog.versions(spark, rest.head).lastOption.getOrElse(0L)}")
        case "poll-changes" => // <cursorFile> [key,cols [maxV [maxBytes]]]
          require(rest.nonEmpty,
            "poll-changes needs <cursorFile> [key,cols [maxV [maxBytes]]]")
          val keys = rest.lift(1)
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Seq.empty)
          SnapshotLog.pollChanges(spark, dir, rest.head, keys,
            maxVersions = rest.lift(2).map(_.toLong),
            maxBytes = rest.lift(3).map(_.toLong)) match {
            case None => println("[maintain] poll-changes: caught up")
            case Some((feed, latest)) =>
              feed.show(100, false)
              println(s"[maintain] poll-changes -> ack version $latest " +
                "after applying")
          }
        case "ack-changes" => // <cursorFile> <version>
          require(rest.length >= 2, "ack-changes needs <cursorFile> <version>")
          SnapshotLog.ackChanges(spark, dir, rest.head, rest(1).toLong)
          println(s"[maintain] ack-changes -> ${rest(1)}")
        case other =>
          throw new IllegalArgumentException(s"unknown verb '$other'")
    }
  }
}

package graft

import graft.sources.{LongStat, Probe, SnapshotLog, StrStat}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Model-based randomized testing of the snapshot log: a seeded random
  * program of table verbs (append / schema-widening append / COW delete /
  * MoR delete / DV compaction / COW update / keyed merge with tombstones /
  * compaction / restore / vacuum) runs
  * against BOTH the log and a sequential in-memory model; after every
  * step the table must equal the model, and a randomly chosen RETAINED
  * version must equal the model's recorded history for that version —
  * including its schema width (restore rolls metadata back with data, so
  * a pre-evolution version reads two columns again). Example-based specs
  * pin each verb alone — this pins their COMPOSITION under orderings no
  * example author would enumerate. Seeds are fixed: failures reproduce.
  */
class SnapshotModelSpec extends AnyFunSuite with SparkFixture {

  private def freshDir() =
    Files.createTempDirectory("snapmodel").toString + "/tbl"

  // a model row: key -> (v, optional w) — w appears via schema evolution
  private type Row3 = (Long, String, Option[Long])

  private def tableRows(dir: String, v: Option[Long] = None): Seq[Row3] = {
    val df = SnapshotLog.read(spark, dir, v)
    val hasW = df.columns.contains("w")
    df.collect().map { r =>
      (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v")),
        if (hasW && !r.isNullAt(r.fieldIndex("w")))
          Some(r.getLong(r.fieldIndex("w"))) else None)
    }.toSeq.sorted
  }

  private def run(seed: Int, steps: Int,
      partitioned: Boolean = false): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = freshDir()
    var model = Map.empty[Long, (String, Option[Long])] // unique keys/step
    var history = Map.empty[Long, Seq[Row3]]
    var nextBatch = 0L
    var step = 0

    def df2(rows: Seq[(Long, String)]) = rows.toDF("k", "v")
    def snap: Seq[Row3] =
      model.toSeq.map { case (k, (v, w)) => (k, v, w) }.sorted
    def record(v: Long): Unit = history += v -> snap

    // start non-empty so read() never hits the loud empty-table guard.
    // Partitioned mode declares the layout on the MUTABLE value column
    // at creation; every verb in the program must then preserve it
    // (rewrites relocating rows whose v changed included).
    model = Map(1L -> ("seed", None))
    record(
      if (partitioned)
        SnapshotLog.commitPartitioned(spark, dir, df2(Seq((1L, "seed"))),
          Seq("v"))
      else SnapshotLog.commit(spark, dir, df2(Seq((1L, "seed")))))

    while (step < steps) {
      step += 1
      rnd.nextInt(15) match {
        case 0 | 1 => // append a batch of fresh-keyed rows (base schema)
          val rows = (0 until 1 + rnd.nextInt(4))
            .map(j => (step * 100L + j, s"a$step-$j"))
          model ++= rows.map { case (k, v) => k -> (v, None) }
          record(SnapshotLog.commitBatch(spark, dir, df2(rows), nextBatch))
          nextBatch += 1
        case 2 => // schema-widening append: adds column w
          val rows = (0 until 1 + rnd.nextInt(3))
            .map(j => (step * 100L + j, s"w$step-$j", step.toLong))
          model ++= rows.map { case (k, v, w) => k -> (v, Some(w)) }
          record(SnapshotLog.commitBatch(spark, dir,
            rows.toDF("k", "v", "w"), nextBatch))
          nextBatch += 1
        case 3 => // COW delete of a residue class, never the whole table
          val (m, r) = (3 + rnd.nextInt(4), rnd.nextInt(3))
          val survivors = model.filterNot { case (k, _) => k % m == r }
          if (survivors.nonEmpty) {
            model = survivors
            record(SnapshotLog.deleteWhere(spark, dir, col("k") % m === r))
          }
        case 4 => // keyed merge: replace some existing keys, insert fresh,
          // tombstone some existing (base-schema changes — merge aligns)
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
          val inserts = (0 until rnd.nextInt(3))
            .map(j => (step * 100L + 50 + j, s"i$step-$j"))
          val (toDelete, toReplace) = existing.partition(_ => rnd.nextBoolean())
          val changes = toReplace.map(k => (k, s"u$step", false)) ++
            inserts.map { case (k, v) => (k, v, false) } ++
            toDelete.map(k => (k, "", true))
          val next = (model -- toDelete) ++
            toReplace.map(k => k -> (s"u$step", None: Option[Long])) ++
            inserts.map { case (k, v) => k -> (v, None: Option[Long]) }
          if (changes.nonEmpty && next.nonEmpty) {
            model = next
            record(SnapshotLog.merge(spark, dir,
              changes.toDF("k", "v", "del"), keys = Seq("k"),
              deleteWhen = Some(col("del")), dropCols = Seq("del")))
          }
        case 5 => // compaction: rows must be untouched
          record(SnapshotLog.optimize(spark, dir, targetFiles = 2))
        case 6 => // restore to a random retained version — data AND schema
          val vs = SnapshotLog.versions(spark, dir)
          val toV = vs(rnd.nextInt(vs.size))
          model = history(toV).map { case (k, v, w) => k -> (v, w) }.toMap
          record(SnapshotLog.restore(spark, dir, toV))
        case 7 => // vacuum: drops history, never the current state
          val keep = 1 + rnd.nextInt(4)
          SnapshotLog.vacuum(spark, dir, keepLast = keep, orphanGraceMs = 0L)
          val retained = SnapshotLog.versions(spark, dir).toSet
          history = history.filter { case (v, _) => retained(v) }
        case 8 => // COW UPDATE of a residue class (expressions see pre-image)
          val (m, r) = (3 + rnd.nextInt(4), rnd.nextInt(3))
          if (model.exists { case (k, _) => k % m == r }) {
            model = model.map {
              case (k, (_, w)) if k % m == r => k -> (s"U$step-${k % m}", w)
              case kv => kv
            }
            record(SnapshotLog.updateWhere(spark, dir, col("k") % m === r,
              Map("v" -> concat(lit(s"U$step-"), col("k") % m))))
          }
        case 9 => // constraint toggle: metadata rides every other verb;
          // while present, a violating append must refuse atomically
          val latest = SnapshotLog.versions(spark, dir).last
          if (SnapshotLog.checksOf(spark, dir, latest).isEmpty) {
            record(SnapshotLog.addCheck(spark, dir, "k_floor", "k > -100"))
            val vsBefore = SnapshotLog.versions(spark, dir)
            val refused =
              try {
                SnapshotLog.commitBatch(spark, dir,
                  Seq((-500L, "bad")).toDF("k", "v"), nextBatch)
                false
              } catch { case _: IllegalArgumentException => true }
            assert(refused, s"[seed $seed step $step] violating batch landed")
            assert(SnapshotLog.versions(spark, dir) === vsBefore,
              s"[seed $seed step $step] refusal must commit nothing")
          } else {
            record(SnapshotLog.dropCheck(spark, dir, "k_floor"))
          }
        case 10 => // timestamp time travel must resolve to the newest version
          val v = SnapshotLog.versionAsOf(spark, dir, System.currentTimeMillis())
          assert(v === SnapshotLog.versions(spark, dir).last,
            s"[seed $seed step $step] asOf(now) must be the latest version")
        case 11 => // MERGE-ON-READ delete of a residue class: the model
          // cannot tell MoR from COW — exactly the r8 composition law.
          // Every later verb in the program (append/merge/update/COW
          // delete/optimize/restore) then runs against a possibly
          // DV-bearing version and must still equal the model.
          val (m, r) = (3 + rnd.nextInt(4), rnd.nextInt(3))
          val survivors = model.filterNot { case (k, _) => k % m == r }
          if (survivors.nonEmpty) {
            model = survivors
            record(SnapshotLog.deleteWhereMoR(spark, dir, col("k") % m === r))
          }
        case 12 => // DV compaction: a semantic no-op, like optimize
          record(SnapshotLog.applyDeletionVectors(spark, dir))
        case 13 => // REPLACE WHERE a residue class: region delete + fresh
          // rows in ONE commit; fresh keys constructed ≡ r (mod m) so
          // the incoming-rows contract holds by construction
          val (m, r) = (3 + rnd.nextInt(4), rnd.nextInt(3))
          val fresh = (0 until 1 + rnd.nextInt(3))
            .map(j => ((step * 1000L + j) * m + r, s"r$step-$j"))
          model = model.filterNot { case (k, _) => k % m == r } ++
            fresh.map { case (k, v) => k -> (v, None: Option[Long]) }
          record(SnapshotLog.replaceWhere(spark, dir, df2(fresh),
            col("k") % m === r))
        case 14 => // dynamic partition overwrite: replace every row of
          // one (possibly existing) value-partition with fresh rows;
          // refused loudly on the unpartitioned layout
          val v0 = rnd.shuffle(model.values.map(_._1).toSeq).headOption
            .getOrElse(s"p$step")
          val fresh = (0 until 1 + rnd.nextInt(3))
            .map(j => (step * 100L + 70 + j, v0))
          if (partitioned) {
            model = model.filterNot { case (_, (v, _)) => v == v0 } ++
              fresh.map { case (k, v) => k -> (v, None: Option[Long]) }
            record(SnapshotLog.overwritePartitions(spark, dir, df2(fresh)))
          } else {
            val vsBefore = SnapshotLog.versions(spark, dir)
            val refused =
              try { SnapshotLog.overwritePartitions(spark, dir, df2(fresh))
                false }
              catch { case _: IllegalArgumentException => true }
            assert(refused, s"[seed $seed step $step] dynamic overwrite " +
              "must refuse an unpartitioned table")
            assert(SnapshotLog.versions(spark, dir) === vsBefore,
              s"[seed $seed step $step] refusal must commit nothing")
          }
      }
      // invariant 1: the table equals the model after every step
      assert(tableRows(dir) === snap,
        s"[seed $seed step $step] table diverged from model")
      // invariant 2: a random retained version equals its recorded history
      val vs = SnapshotLog.versions(spark, dir)
      val probe = vs(rnd.nextInt(vs.size))
      assert(tableRows(dir, Some(probe)) === history(probe),
        s"[seed $seed step $step] time travel to v$probe diverged")
      // invariant 5 (r9): a random probe read (range / IN / IS [NOT]
      // NULL) equals the model's filter — zone maps, null flags,
      // partition tuples and deletion vectors composed under whatever
      // file layout the verb history produced. Stats may or may not
      // exist at any given step; the result must be exact either way.
      if (model.nonEmpty) {
        val keys = model.keys.toSeq.sorted
        val hasW = SnapshotLog.read(spark, dir).columns.contains("w")
        val kind = if (hasW) rnd.nextInt(4) else rnd.nextInt(2)
        val (probes, keep): (Seq[Probe], Row3 => Boolean) =
          kind match {
            case 0 =>
              val lo = keys(rnd.nextInt(keys.size))
              val hi = lo + rnd.nextInt(300)
              (Seq(Probe.Range("k", Some(lo), Some(hi))),
                t => t._1 >= lo && t._1 <= hi)
            case 1 =>
              val vals = rnd.shuffle(keys).take(1 + rnd.nextInt(3))
              (Seq(Probe.In("k", vals)),
                t => vals.contains(t._1))
            case 2 =>
              (Seq(Probe.IsNull("w")), t => t._3.isEmpty)
            case _ =>
              (Seq(Probe.NotNull("w")), t => t._3.nonEmpty)
          }
        val (got, _, _) = SnapshotLog.readFilter(spark, dir, probes)
        val hasWGot = got.columns.contains("w")
        val gotRows = got.collect().map { r =>
          (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v")),
            if (hasWGot && !r.isNullAt(r.fieldIndex("w")))
              Some(r.getLong(r.fieldIndex("w"))) else None)
        }.toSeq.sorted
        assert(gotRows === snap.filter(keep),
          s"[seed $seed step $step] probe read $probes diverged")
      }
      if (partitioned) {
        // invariant 3: every verb preserved the declared layout
        assert(SnapshotLog.partitionColsOf(spark, dir, vs.last) === Seq("v"),
          s"[seed $seed step $step] partition declaration lost")
        // invariant 4: a partition-pruned slice read equals the model's
        // slice — against whatever file layout the verb history produced
        if (model.nonEmpty) {
          val vals = model.values.map(_._1).toSeq.distinct.sorted
          val v0 = vals(rnd.nextInt(vals.size))
          val (got, _, _) =
            SnapshotLog.readPartition(spark, dir, Map("v" -> v0))
          val gotRows = got.collect().map(r =>
            (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v"))))
            .toSeq.sorted
          val want = model.toSeq.collect {
            case (k, (vv, _)) if vv == v0 => (k, vv) }.sorted
          assert(gotRows === want,
            s"[seed $seed step $step] partition slice '$v0' diverged")
        }
      }
    }
  }

  test("branch isolation: independent random programs on source and clone") {
    import spark.implicits._
    val rnd = new scala.util.Random(1729)
    val (src, dst) = (freshDir(), freshDir())
    var mSrc = (1L to 6L).map(k => k -> (s"s$k", None: Option[Long])).toMap
    SnapshotLog.commit(spark, src,
      mSrc.toSeq.map { case (k, (v, _)) => (k, v) }.toDF("k", "v"))
    SnapshotLog.shallowClone(spark, src, dst)
    var mDst = mSrc
    def snapOf(m: Map[Long, (String, Option[Long])]): Seq[Row3] =
      m.toSeq.map { case (k, (v, w)) => (k, v, w) }.sorted
    for (step <- 1 to 16) {
      // pick a side, mutate it, then check BOTH sides every step — the
      // invariant is that the other side never moves
      val onSrc = rnd.nextBoolean()
      val (dir, m) = if (onSrc) (src, mSrc) else (dst, mDst)
      val m2 = rnd.nextInt(3) match {
        case 0 =>
          val rows = Seq((step * 10L + (if (onSrc) 0 else 5), s"a$step"))
          SnapshotLog.commitBatch(spark, dir, rows.toDF("k", "v"), step.toLong)
          m ++ rows.map { case (k, v) => k -> (v, None) }
        case 1 =>
          val (mm, r) = (3 + rnd.nextInt(3), rnd.nextInt(3))
          val surv = m.filterNot { case (k, _) => k % mm == r }
          if (surv.nonEmpty) {
            SnapshotLog.deleteWhere(spark, dir, col("k") % mm === r); surv
          } else m
        case 2 =>
          val (mm, r) = (3 + rnd.nextInt(3), rnd.nextInt(3))
          if (m.exists { case (k, _) => k % mm == r }) {
            SnapshotLog.updateWhere(spark, dir, col("k") % mm === r,
              Map("v" -> lit(s"u$step")))
            m.map { case (k, (_, w)) if k % mm == r => k -> (s"u$step", w)
                    case kv => kv }
          } else m
      }
      if (onSrc) mSrc = m2 else mDst = m2
      assert(tableRows(src) === snapOf(mSrc),
        s"[step $step] source diverged (mutated ${if (onSrc) "src" else "dst"})")
      assert(tableRows(dst) === snapOf(mDst),
        s"[step $step] branch diverged (mutated ${if (onSrc) "src" else "dst"})")
    }
    // each side's vacuum leaves the other intact; the branch must
    // materialize before the SOURCE vacuums (the documented clone
    // contract — src retention does not know about branches)
    SnapshotLog.vacuum(spark, dst, keepLast = 1, orphanGraceMs = 0L)
    SnapshotLog.materialize(spark, dst)
    SnapshotLog.vacuum(spark, src, keepLast = 1, orphanGraceMs = 0L)
    assert(tableRows(src) === snapOf(mSrc))
    assert(tableRows(dst) === snapOf(mDst))
  }

  test("genuinely CONCURRENT committers linearize: 3 threads of " +
      "append/merge/delete on one table; every retained version equals " +
      "the version-ordered replay of the committed ops (seed 7717)") {
    import spark.implicits._
    import java.util.concurrent.ConcurrentLinkedQueue
    val dir = freshDir()
    // shared key space 0..29 — the serial-order check is vacuous on
    // disjoint keys; contention is the point
    SnapshotLog.commit(spark, dir,
      (0L until 30L).map(k => (k, "init")).toDF("k", "v"))
    sealed trait Op { def version: Long }
    case class Merged(version: Long, rows: Map[Long, String]) extends Op
    case class Deleted(version: Long, keys: Set[Long]) extends Op
    case class Appended(version: Long, rows: Map[Long, String]) extends Op
    val log = new ConcurrentLinkedQueue[Op]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val opsPerThread = 5
    val threads = (0 until 3).map { t =>
      new Thread(() => {
        try {
          val rnd = new scala.util.Random(7717 + t)
          var fresh = 1000L * (t + 1) // thread-unique append keys
          for (i <- 0 until opsPerThread) rnd.nextInt(3) match {
            case 0 => // keyed merge over shared keys (upsert)
              val rows = (0 until 4).map(_ =>
                rnd.nextLong(30) -> s"m$t-$i").distinct.toMap
              val v = SnapshotLog.merge(spark, dir,
                rows.toSeq.toDF("k", "v"), keys = Seq("k"))
              log.add(Merged(v, rows)); ()
            case 1 => // COW delete of a shared-key slice
              val ks = (0 until 3).map(_ => rnd.nextLong(30)).toSet
              val v = SnapshotLog.deleteWhere(spark, dir,
                col("k").isin(ks.toSeq: _*))
              log.add(Deleted(v, ks)); ()
            case 2 => // append of fresh keys
              val rows = (0 until 2).map { _ =>
                fresh += 1; fresh -> s"a$t-$i"
              }.toMap
              val v = SnapshotLog.append(spark, dir,
                rows.toSeq.toDF("k", "v"))
              log.add(Appended(v, rows)); ()
          }
        } catch { case e: Throwable => failures.add(e); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    // every committer finished every op: losers of a commit race RETRY
    // internally (rebase) — none may strand an exception or hang
    assert(failures.isEmpty,
      s"concurrent committer failed: ${failures.peek()}")
    val ops = {
      import scala.jdk.CollectionConverters._
      log.asScala.toSeq.sortBy(_.version)
    }
    assert(ops.size === 3 * opsPerThread, "an op vanished without error")
    // versions are the serialization: all distinct, and the table's
    // committed history is exactly init + one version per op
    assert(ops.map(_.version).distinct.size === ops.size,
      s"two ops claim one version: ${ops.map(_.version)}")
    val vs = SnapshotLog.versions(spark, dir)
    assert(vs.size === ops.size + 1,
      s"history ${vs.size} != 1 + ${ops.size} committed ops")
    // linearizability: EVERY retained version equals the version-ordered
    // prefix replay of the committed ops (not just the final state)
    var model = (0L until 30L).map(_ -> "init").toMap
    def check(v: Long): Unit = {
      val got = SnapshotLog.read(spark, dir, Some(v))
        .as[(Long, String)].collect().toMap
      assert(got === model, s"version $v diverges from the serial replay")
    }
    check(vs.head)
    ops.foreach { op =>
      model = op match {
        case Merged(_, rows)   => model ++ rows
        case Deleted(_, keys)  => model -- keys
        case Appended(_, rows) => model ++ rows
      }
      check(op.version)
    }
  }

  test("random verb programs match the sequential model (seed 42)") {
    run(seed = 42, steps = 25)
  }

  test("random verb programs match the sequential model (seed 271828)") {
    run(seed = 271828, steps = 25)
  }

  test("random verb programs match the sequential model (seed 9001)") {
    run(seed = 9001, steps = 25)
  }

  test("random verb programs on a PARTITIONED table (seed 6174)") {
    run(seed = 6174, steps = 25, partitioned = true)
  }

  test("random verb programs on a PARTITIONED table (seed 1001)") {
    run(seed = 1001, steps = 25, partitioned = true)
  }
}

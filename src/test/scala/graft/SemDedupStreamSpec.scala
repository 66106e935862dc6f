package graft

import graft.sim.Ivf
import graft.streaming.SemDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

// top-level for encoders
final case class Vec(vec_id: Long, embedding: Array[Float])

/** Streaming semantic dedup: per-batch verdicts against the
  * accepted-vector store under a frozen quantizer, equal to a sequential
  * ingest reference across micro-batches; replay-idempotent. */
class SemDedupStreamSpec extends AnyFunSuite with SparkFixture {

  private val Tau = 350000L

  private def e = Tables.embeddings(spark, Sf)

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cos6(a: Array[Float], b: Array[Float]): Long =
    math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      * 1e6 + 0.5).toLong

  /** Sequential reference: fold batches through the ingest rule, carrying
    * the accepted set. Assignment mirrors NearestCentroid (min distance,
    * FP ties to smallest list id). */
  private def referenceAccepted(
      cents: Seq[(Long, Array[Double])],
      batches: Seq[Seq[(Long, Array[Float])]]): Set[Long] = {
    def listOf(v: Array[Float]): Long =
      cents.map { case (lid, c) =>
        var d = 0.0; var i = 0
        while (i < c.length) {
          val t = v(i).toDouble - c(i); d += t * t; i += 1
        }
        (d, lid)
      }.minBy(identity)._2
    var accepted = Vector.empty[(Long, Long, Array[Float])] // (id, list, emb)
    batches.foreach { batch =>
      val assigned = batch.sortBy(_._1).map { case (id, emb) =>
        (id, listOf(emb), emb) }
      assigned.foreach { case (id, lid, emb) =>
        val dupVsAccepted = accepted.exists { case (_, alid, aemb) =>
          alid == lid && cos6(aemb, emb) >= Tau }
        // NB: the lower-id batch member counts whether or not IT was
        // accepted — the engine's aSide carries the whole batch
        val dupInBatch = assigned.exists { case (oid, olid, oemb) =>
          oid < id && olid == lid && cos6(oemb, emb) >= Tau }
        if (!dupVsAccepted && !dupInBatch)
          accepted :+= ((id, lid, emb))
      }
    }
    accepted.map(_._1).toSet
  }

  test("stream equals the sequential ingest rule across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("semdedup_out").toString
    val ckpt = Files.createTempDirectory("semdedup_ckpt").toString
    val cents = Ivf.centroidsIter(e, "embedding", "label", iters = 2)

    val base = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    // batch 1: first 150 vectors; batch 2: next 150 PLUS exact copies of
    // three batch-1 vectors under new ids — guaranteed cross-batch dups
    val b1 = base.take(150).toSeq
    val b2 = base.slice(150, 300).toSeq ++
      base.take(3).map { case (id, emb) => (10000L + id, emb) }

    val ms = MemoryStream[Vec]
    val q = SemDedupStream.run(ms.toDF, outDir, ckpt, cents,
      SemDedupStream.Config(tauMicro = Tau))
    try {
      ms.addData(b1.map { case (id, emb) => Vec(id, emb) })
      q.processAllAvailable()
      ms.addData(b2.map { case (id, emb) => Vec(id, emb) })
      q.processAllAvailable()
    } finally q.stop()

    val store = spark.read.parquet(SemDedupStream.storePath(outDir))
    val got = store.select("vec_id").collect().map(_.getLong(0)).toSet
    val centsSeq = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq
    val want = referenceAccepted(centsSeq, Seq(b1, b2))
    assert(got === want)
    // the planted exact copies must all be rejected as cross-batch dups
    assert(Seq(10000L, 10001L, 10002L).forall(id => !got.contains(id)))
    // and the store carries assignment + norm for shuffle-free reuse
    assert(store.columns.toSet ===
      Set("vec_id", "embedding", "list_id", "nrm", "batch_id"))
  }

  test("replayed micro-batch is idempotent (dynamic partition overwrite)") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("semdedup_replay").toString
    val cents = Ivf.centroidsIter(e, "embedding", "label", iters = 2)
    val batch = e.select("vec_id", "embedding").limit(100)
    val n1 = SemDedupStream.mergeBatch(spark, batch, 0L, outDir, cents)
    val snap1 = spark.read.parquet(SemDedupStream.storePath(outDir))
      .orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    val n2 = SemDedupStream.mergeBatch(spark, batch, 0L, outDir, cents)
    val snap2 = spark.read.parquet(SemDedupStream.storePath(outDir))
      .orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(n1 === n2 && snap1 === snap2)
  }

  test("compaction folds history to generation -1: later batches " +
      "screen identically to an uncompacted twin, folded replays " +
      "no-op, the newest batch still replays") {
    val cents = Ivf.centroidsIter(e, "embedding", "label", iters = 2)
    val base = e.select("vec_id", "embedding")
    val b0 = base.filter(col("vec_id") < 100)
    // b1 plants exact copies of two b0 vectors under new ids — verdicts
    // that depend on the FOLDED generation being read correctly
    val b1 = base.filter(col("vec_id") >= 100 && col("vec_id") < 200)
      .unionByName(base.filter(col("vec_id") < 2)
        .withColumn("vec_id", col("vec_id") + 50000L))
    val b2 = base.filter(col("vec_id") >= 200 && col("vec_id") < 300)
      .unionByName(base.filter(col("vec_id") < 1)
        .withColumn("vec_id", col("vec_id") + 60000L))
    val dirA = Files.createTempDirectory("semdedup_cp_a").toString
    val dirB = Files.createTempDirectory("semdedup_cp_b").toString
    def content(d: String) =
      spark.read.parquet(SemDedupStream.storePath(d))
        .select("vec_id", "list_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (d <- Seq(dirA, dirB)) {
      SemDedupStream.mergeBatch(spark, b0, 0L, d, cents)
      SemDedupStream.mergeBatch(spark, b1, 1L, d, cents)
    }
    // b0/b1 hold disjoint rows, so the fold dedups nothing: folded = 0
    // (file-count reclaim is the production win at daily cadence — at
    // two-batch test scale the fold's task count can even exceed the
    // input's, so the reclaim sign is not a law here)
    val (folded, _) = SemDedupStream.compact(spark, dirA)
    assert(folded === 0L, s"disjoint batches folded $folded rows away")
    assert(SemDedupStream.compactionWatermark(spark, dirA) === Some(0L))
    assert(content(dirA) === content(dirB),
      "compaction changed store content")
    // folded-batch replay is a no-op (its rows live in generation -1)
    val snap = content(dirA)
    assert(SemDedupStream.mergeBatch(spark, b0, 0L, dirA, cents) === 0L)
    assert(content(dirA) === snap, "folded replay polluted the store")
    // the newest (possibly uncommitted) batch still replays in place
    val rB1 = SemDedupStream.mergeBatch(spark, b1, 1L, dirA, cents)
    assert(rB1 > 0L && content(dirA) === snap,
      "newest-batch replay diverged through the fold")
    // a NEW batch screens identically against fold vs per-batch layout
    val nA = SemDedupStream.mergeBatch(spark, b2, 2L, dirA, cents)
    val nB = SemDedupStream.mergeBatch(spark, b2, 2L, dirB, cents)
    assert(nA === nB, s"fold changed a later verdict: $nA vs $nB")
    assert(content(dirA) === content(dirB))
    // planted cross-batch dup from generation -1 must still reject
    assert(!content(dirA).exists(_._1 >= 60000L),
      "a dup of a FOLDED vector was accepted — the fold lost recall")
    // second fold absorbs batch 1; content is stable, files shrink
    val filesBefore = spark.read
      .parquet(SemDedupStream.storePath(dirA))
      .select(input_file_name()).distinct().count()
    SemDedupStream.compact(spark, dirA)
    assert(SemDedupStream.compactionWatermark(spark, dirA) === Some(1L))
    assert(content(dirA) === content(dirB))
    val filesAfter = spark.read
      .parquet(SemDedupStream.storePath(dirA))
      .select(input_file_name()).distinct().count()
    assert(filesAfter <= filesBefore,
      s"second fold grew the file count: $filesBefore -> $filesAfter")
  }
}

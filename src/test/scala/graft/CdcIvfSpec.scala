package graft

import graft.sim.IvfIndex
import graft.streaming.CdcIvf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The CDC-maintained IVF index must answer every probe exactly as a
  * fresh IvfIndex rebuild of the current vector set under the same
  * frozen quantizer — through inserts, updates, deletes, same-batch
  * churn, replay, and physical compaction. */
class CdcIvfSpec extends AnyFunSuite with SparkFixture {

  private val probe = Array.fill(64)(0.1)

  private def top10(dir: String) =
    CdcIvf.query(spark, dir, probe, k = 10, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def rebuildTop10(cur: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = {
    val freshDir = Files.createTempDirectory("ivffresh").toString + "/idx"
    IvfIndex.write(cur, freshDir, "vec_id", "embedding", "label",
      cents = Some(cents))
    IvfIndex.query(spark, freshDir, probe, "vec_id", "embedding",
      k = 10, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("I/U/D feed probes bit-identical to a frozen-quantizer rebuild") {
    val dir = Files.createTempDirectory("cdcivf").toString + "/idx"
    val e = Tables.embeddings(spark, Sf).select("vec_id", "embedding", "label")
    CdcIvf.train(spark, e, dir)
    val cents = spark.read.parquet(CdcIvf.centroidsPath(dir))
    val neg = transform(col("embedding"),
      x => -x).cast("array<float>").as("embedding")

    // batch 0: insert everything except vec_id % 7 == 0
    CdcIvf.applyChanges(spark,
      e.filter(col("vec_id") % 7 =!= 0)
        .select(lit("I").as("op"), col("vec_id"), col("embedding")),
      0L, dir)
    val cur0 = e.filter(col("vec_id") % 7 =!= 0)
    assert(top10(dir) === rebuildTop10(cur0, cents), "after inserts")

    // batch 1: negate %5==1 vectors (U), delete %11==2 (D) — ids in both
    // classes get TWO same-batch events and the delete must win
    val upd = e.filter(col("vec_id") % 7 =!= 0 && col("vec_id") % 5 === 1)
      .select(lit("U").as("op"), col("vec_id"), neg)
    val del = e.filter(col("vec_id") % 7 =!= 0 && col("vec_id") % 11 === 2)
      .select(lit("D").as("op"), col("vec_id"),
        lit(null).cast("array<float>").as("embedding"))
    CdcIvf.applyChanges(spark, upd.unionByName(del), 1L, dir)
    val cur1 = cur0.filter(col("vec_id") % 11 =!= 2)
      .select(col("vec_id"),
        when(col("vec_id") % 5 === 1, neg).otherwise(col("embedding"))
          .as("embedding"),
        col("label"))
    val expect1 = rebuildTop10(cur1, cents)
    assert(top10(dir) === expect1, "after update+delete batch")

    // at-least-once replay: byte-identical partitions, same answer
    CdcIvf.applyChanges(spark, upd.unionByName(del), 1L, dir)
    assert(top10(dir) === expect1, "after replaying batch 1")

    // compaction folds every CHECKPOINT-SAFE batch; the newest (1) may
    // still replay, so its partitions and tombstones survive verbatim —
    // cleared is 0 here and probes are identical
    val (dropped, cleared) = CdcIvf.compact(spark, dir)
    assert(dropped > 0 && cleared === 0L)
    assert(new java.io.File(CdcIvf.tombstonesPath(dir)).exists())
    assert(top10(dir) === expect1, "after compaction")
    // replaying the kept newest batch is still a byte-identical no-op
    CdcIvf.applyChanges(spark, upd.unionByName(del), 1L, dir)
    assert(top10(dir) === expect1, "replay after compaction")

    // post-compaction life: batch 2 deletes the top hit AND inserts a
    // fresh vector (an insert has no tombstone — the replay law's
    // hardest case)
    val victim = expect1.head._1
    val fresh = e.filter(col("vec_id") % 7 === 0).limit(1)
      .select(lit("I").as("op"), col("vec_id"), col("embedding"))
    val freshId = fresh.select("vec_id").head.getLong(0)
    val b2 = fresh.unionByName(
      spark.range(1).select(lit("D").as("op"), lit(victim).as("vec_id"),
        lit(null).cast("array<float>").as("embedding")))
    CdcIvf.applyChanges(spark, b2, 2L, dir)
    val cur2 = cur1.filter(col("vec_id") =!= victim)
      .unionByName(e.filter(col("vec_id") === freshId))
    val expect2 = rebuildTop10(cur2, cents)
    assert(top10(dir) === expect2, "delete+insert after compaction")
    assert(!top10(dir).exists(_._1 === victim))

    // second compact folds batch 1 (cleared now), keeps batch 2; a
    // replay of batch 2 must not duplicate its INSERT against the fold
    val (_, cleared2) = CdcIvf.compact(spark, dir)
    assert(cleared2 > 0L)
    assert(top10(dir) === expect2, "after second compaction")
    CdcIvf.applyChanges(spark, b2, 2L, dir)
    assert(top10(dir) === expect2,
      "replayed insert duplicated against its own compacted copy")
  }

  test("same-batch insert-then-delete stays dead; queryById guards") {
    val dir = Files.createTempDirectory("cdcivf2").toString + "/idx"
    val e = Tables.embeddings(spark, Sf).select("vec_id", "embedding", "label")
    CdcIvf.train(spark, e, dir)
    import spark.implicits._
    val base = e.filter(col("vec_id") < 50)
      .select(lit("I").as("op"), col("vec_id"), col("embedding"),
        lit(0L).as("seq"))
    // vec 1 lives and dies inside batch 0
    val churn = e.filter(col("vec_id") === 1)
      .select(lit("D").as("op"), col("vec_id"),
        lit(null).cast("array<float>").as("embedding"), lit(1L).as("seq"))
    CdcIvf.applyChanges(spark, base.unionByName(churn), 0L, dir)
    assert(!top10(dir).exists(_._1 === 1L))
    intercept[IllegalArgumentException] {
      CdcIvf.queryById(spark, dir, probeId = 1L)
    }
    // a live member probes fine and excludes itself
    val byId = CdcIvf.queryById(spark, dir, probeId = 2L).collect()
    assert(byId.nonEmpty && !byId.exists(_.getLong(0) === 2L))
  }
}

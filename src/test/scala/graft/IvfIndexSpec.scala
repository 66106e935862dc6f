package graft

import graft.sim.{Ivf, IvfIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The persisted IVF index must answer probes bit-identically to the
  * per-call IVF (same quantizer parameters), and its reads must prune to
  * the probed list directories physically. */
class IvfIndexSpec extends AnyFunSuite with SparkFixture {

  test("index query == per-call Ivf.probeTopK exactly; scans prune to probed lists") {
    val dir = Files.createTempDirectory("ivfidx").toString + "/idx"
    val e = Tables.embeddings(spark, Sf)
    IvfIndex.write(e, dir, "vec_id", "embedding", "label", iters = 2)

    val fromIndex = IvfIndex
      .queryById(spark, dir, probeId = 0L, "vec_id", "embedding", k = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val perCall = Ivf
      .probeTopK(e, "vec_id", "embedding", "label", probeId = 0L, k = 10,
        nProbe = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromIndex === perCall) // bit-identical, not approximately equal

    // physical pruning: the vectors scan reads only the probed lists'
    // directories (AQE off so the scan node's metrics are reachable)
    val totalFiles = spark.read.parquet(IvfIndex.vectorsPath(dir))
      .select(input_file_name()).distinct().count()
    val nLists = spark.read.parquet(IvfIndex.centroidsPath(dir)).count()
    assert(nLists > 3, s"need >3 lists for pruning to mean anything, got $nLists")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = Array.fill(64)(0.1)
      val q = IvfIndex.query(spark, dir, probe, "vec_id", "embedding",
        k = 10, nProbe = 3)
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in plan"))
      assert(scan.partitionFilters.nonEmpty, "list_id filter not a partition filter")
      q.collect()
      assert(scan.metrics("numFiles").value < totalFiles,
        s"read ${scan.metrics("numFiles").value} of $totalFiles files — no pruning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q_eval_ann_recall: deterministic, bounded, and exact vs the leg outputs") {
    val rows = graft.ops.ImplOps.evalAnnRecall.fn(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(rows.map(_._1) === Seq("ivf", "lsh", "pq_rerank"))
    rows.foreach { case (m, nProbes, macroR, minR, maxR) =>
      assert(nProbes === 8L, m)
      assert(minR >= 0 && maxR <= 1000, m)
      assert(minR <= macroR && macroR <= maxR,
        s"$m: macro $macroR outside [$minR, $maxR]")
    }
    // deterministic end to end (no RNG anywhere in the legs)
    val again = graft.ops.ImplOps.evalAnnRecall.fn(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(again === rows)
    // the re-ranked PQ leg must beat a macro recall floor on this fixture
    // (its candidate shortlist covers the corpus 4x over at refine=50)
    assert(rows.collect { case ("pq_rerank", _, m, _, _) => m }.head >= 500)
  }

  test("multi-probe IVF/PQ are bit-identical to their single-probe calls") {
    val e = Tables.embeddings(spark, Sf)
    val probes = Seq(3L, 17L, 42L)
    val ivfMulti = graft.sim.Ivf.multiProbeTopK(e, "vec_id", "embedding",
      "label", probes, k = 5, nProbe = 3, iters = 2).collect()
      .groupBy(_.getLong(0))
    probes.foreach { p =>
      val single = graft.sim.Ivf.probeTopK(e, "vec_id", "embedding", "label",
        p, k = 5, nProbe = 3, iters = 2).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val multi = ivfMulti(p).map(r => (r.getLong(1), r.getDouble(3))).toSeq
      assert(multi === single, s"ivf probe $p diverged")
    }
    val pqMulti = graft.sim.Pq.multiProbeTopK(e, "vec_id", "embedding",
      probes, k = 5, refine = 20).collect().groupBy(_.getLong(0))
    probes.foreach { p =>
      val single = graft.sim.Pq.probeTopK(e, "vec_id", "embedding",
        p, k = 5, refine = 20).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val multi = pqMulti(p).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(multi === single, s"pq probe $p diverged")
    }
  }

  test("unknown probe id fails loudly") {
    val dir = Files.createTempDirectory("ivfidx2").toString + "/idx"
    IvfIndex.write(Tables.embeddings(spark, Sf), dir, "vec_id", "embedding",
      "label", iters = 1)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.queryById(spark, dir, probeId = -42L, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("not in index"))
  }
}

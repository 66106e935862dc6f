package graft

import graft.ops.ClassifierOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.math.{BigDecimal => JBig, RoundingMode}
import java.security.MessageDigest

/** Ground truth for the hashed-feature linear classifier: the trained
  * weights must be BIT-EQUAL to a sequential reference performing the
  * same snapped arithmetic (the distributed sums are decimal-exact, so
  * there is no tolerance anywhere). */
class ClassifierSpec extends AnyFunSuite with SparkFixture {

  private def bucket(token: String): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    val hex = d.take(2).map(b => f"$b%02x").mkString // first 4 hex chars
    Integer.parseInt(hex, 16) % ClassifierOps.B
  }

  private def snap12(v: Double): JBig =
    new JBig(v).setScale(12, RoundingMode.HALF_UP)

  /** (doc features Map[j -> x], y) per doc, mirroring featureFrame. */
  private def collectFeats(): Seq[(Map[Int, Double], Int)] = {
    import spark.implicits._
    Tables.documents(spark, Sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
      .map { case (_, text) =>
        val toks = text.split(" ").toSeq
        val dl = toks.length
        val y = if (toks.distinct.length * 2 >= dl) 1 else 0
        val tf = toks.groupBy(bucket).map { case (j, g) =>
          j -> g.length.toDouble / dl
        }
        (tf + (ClassifierOps.B -> 1.0), y)
      }
  }

  private def seqTrain(docs: Seq[(Map[Int, Double], Int)]): Array[Long] = {
    val n = docs.length
    (1 to ClassifierOps.Iters).foldLeft(Array.fill(ClassifierOps.B + 1)(0L)) {
      (w, _) =>
        // margin per doc: exact sum of snapped x*w terms (order-free)
        val resid = docs.map { case (x, y) =>
          val margin = x.toSeq.map { case (j, xv) =>
            snap12(xv * (w(j).toDouble / 1e6))
          }.foldLeft(JBig.ZERO)(_.add(_))
          val p = 1.0 / (1.0 + math.exp(-margin.doubleValue()))
          (x, p - y)
        }
        val g = Array.fill(ClassifierOps.B + 1)(JBig.ZERO)
        resid.foreach { case (x, r) =>
          x.foreach { case (j, xv) => g(j) = g(j).add(snap12(r * xv)) }
        }
        w.indices.map { j =>
          math.round((w(j).toDouble / 1e6 -
            ClassifierOps.Lr * g(j).doubleValue() / n) * 1e6)
        }.toArray
    }
  }

  test("q_quality_train: weights bit-equal to the sequential reference") {
    val expect = seqTrain(collectFeats())
    val got = ClassifierOps.qualityTrain.fn(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L to ClassifierOps.B.toLong))
    assert(got.map(_._2).toSeq === expect.toSeq)
    // training moved the weights (the loop is not a fixpoint at w=0)
    assert(expect.exists(_ != 0L))
  }

  test("training reduces logistic loss vs the zero model") {
    val docs = collectFeats()
    def loss(w: Array[Long]): Double = docs.map { case (x, y) =>
      val m = x.map { case (j, xv) => xv * (w(j).toDouble / 1e6) }.sum
      val p = 1.0 / (1.0 + math.exp(-m))
      -(y * math.log(p max 1e-15) + (1 - y) * math.log((1 - p) max 1e-15))
    }.sum / docs.length
    val trained = seqTrain(docs)
    assert(loss(trained) < loss(Array.fill(ClassifierOps.B + 1)(0L)))
  }

  test("q_quality_eval: held-out confusion matrix matches sequential train+apply") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    def hexHead(id: Long): Char = {
      val d = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${d(0)}%02x".charAt(0)
    }
    def featsOf(ds: Seq[(Long, String)]) = ds.map { case (_, text) =>
      val toks = text.split(" ").toSeq
      val dl = toks.length
      val y = if (toks.distinct.length * 2 >= dl) 1 else 0
      val tf = toks.groupBy(bucket).map { case (j, g) =>
        j -> g.length.toDouble / dl
      }
      (tf + (ClassifierOps.B -> 1.0), y)
    }
    val (trainDocs, testDocs) = docs.partition(d => hexHead(d._1) < '8')
    val w = seqTrain(featsOf(trainDocs))
    var (tp, tn, fp, fn) = (0L, 0L, 0L, 0L)
    featsOf(testDocs).foreach { case (x, y) =>
      val margin = x.toSeq.map { case (j, xv) =>
        snap12(xv * (w(j).toDouble / 1e6))
      }.foldLeft(JBig.ZERO)(_.add(_))
      val pred = if (margin.signum() > 0) 1 else 0
      (y, pred) match {
        case (1, 1) => tp += 1; case (0, 0) => tn += 1
        case (0, 1) => fp += 1; case _ => fn += 1
      }
    }
    val r = ClassifierOps.qualityEval.fn(spark, Sf).collect()
    assert(r.length === 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
      === ((tp, tn, fp, fn)))
    assert(r(0).getLong(4) === (tp + tn) * 1000 / (tp + tn + fp + fn))
    assert(tp + tn + fp + fn === testDocs.length.toLong)
  }

  test("q_quality_model: bucket weights match the shared LCG rule") {
    import spark.implicits._
    val byDoc = Tables.documents(spark, Sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    ClassifierOps.qualityScore.fn(spark, Sf).collect().take(50).foreach { r =>
      val toks = byDoc(r.getLong(0)).split(" ")
      val want = toks.map(t => ClassifierOps.demoWeightMilli(bucket(t).toLong)).sum
      assert(r.getLong(1) === toks.length.toLong)
      assert(r.getLong(2) === want, s"doc ${r.getLong(0)}")
      assert(r.getLong(3) === (if (want > 0) 1L else 0L))
    }
  }
}

package graft

import graft.functions.{HashExprs, VectorExprs}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.GraftExtensions: the SQL surface must hit the exact
  * same native expressions as the Column API — parity is exact equality,
  * not approximate. */
class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("simhash64 and minhash_sig are callable from SQL and match the Column API") {
    Tables.documents(spark, Sf).limit(50).createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash64(split(text, ' ')) AS sh,
        |  minhash_sig(split(text, ' '), 3, 8) AS mh
        |FROM ext_docs""".stripMargin)
    val viaCol = spark.table("ext_docs")
      .select(col("doc_id"),
        HashExprs.simHash64(split(col("text"), " ")).as("sh"),
        HashExprs.minHashSig(split(col("text"), " "), 3, 8).as("mh"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("dot_vec and norm2_sq are callable from SQL and match the Column API") {
    Tables.embeddings(spark, Sf).limit(50).createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      """SELECT a.vec_id, dot_vec(a.embedding, b.embedding) AS d,
        |  norm2_sq(a.embedding) AS n2
        |FROM ext_vecs a JOIN ext_vecs b ON b.vec_id = a.vec_id + 1""".stripMargin)
    val a = spark.table("ext_vecs").select(col("vec_id"), col("embedding"))
    val b = spark.table("ext_vecs")
      .select(col("vec_id").as("vid_b"), col("embedding").as("emb_b"))
    val viaCol = a.join(b, col("vid_b") === col("vec_id") + 1)
      .select(col("vec_id"),
        VectorExprs.dotVec(col("embedding"), col("emb_b")).as("d"),
        VectorExprs.norm2(col("embedding")).as("n2"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("sorted_intersect_count is callable from SQL and equals array_intersect size") {
    Tables.documents(spark, Sf).limit(60).createOrReplaceTempView("ext_si")
    val sets = spark.sql(
      """SELECT doc_id,
        |  sort_array(array_distinct(transform(split(text, ' '), t -> xxhash64(t))))
        |    AS s
        |FROM ext_si""".stripMargin)
    sets.createOrReplaceTempView("ext_sets")
    val viaSql = spark.sql(
      """SELECT a.doc_id, b.doc_id AS doc_b,
        |  sorted_intersect_count(a.s, b.s) AS i,
        |  CAST(size(array_intersect(a.s, b.s)) AS BIGINT) AS i_ref
        |FROM ext_sets a JOIN ext_sets b ON b.doc_id = a.doc_id + 1""".stripMargin)
      .collect()
    assert(viaSql.nonEmpty)
    viaSql.foreach(r => assert(r.getLong(2) === r.getLong(3),
      s"pair (${r.getLong(0)}, ${r.getLong(1)}): merge count != builtin"))
  }

  test("sorted_intersect_count throws on null elements (no phantom 0 matches)") {
    // sort_array places nulls FIRST, so a real malformed signature is
    // visited immediately by the merge
    val e = intercept[Exception] {
      spark.sql("SELECT sorted_intersect_count(array(CAST(NULL AS BIGINT), " +
        "CAST(1 AS BIGINT)), array(CAST(0 AS BIGINT), CAST(1 AS BIGINT)))")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null array element")),
      s"expected the null-element error, got: $e")
  }

  test("optimizer rewrites dot_vec(a, a) to norm2_sq(a), bit-identically") {
    val df = Tables.embeddings(spark, Sf).limit(20)
      .select(
        VectorExprs.dotVec(col("embedding"), col("embedding")).as("d"),
        VectorExprs.norm2(col("embedding")).as("n"))
    // traverse every plan node — .expressions alone only sees the root
    def dotsIn(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case n =>
        n.expressions.flatMap(_.collect { case d: VectorExprs.DotVec => d })
      }.flatten
    assert(dotsIn(df.queryExecution.optimizedPlan).isEmpty,
      "dot_vec(a,a) survived optimization")
    df.collect().foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // distinct columns must NOT be rewritten
    val df2 = Tables.embeddings(spark, Sf).limit(5)
      .select(col("embedding").as("e2"), col("embedding"))
      .select(VectorExprs.dotVec(col("embedding"), col("e2")).as("d"))
    // e2 aliases the same attribute, so semanticEquals still holds after
    // alias resolution — the rewrite is correct there too; use a genuinely
    // different vector to assert non-rewrite
    val diff = Tables.embeddings(spark, Sf).limit(5)
      .select(VectorExprs.dotVec(col("embedding"),
        expr("reverse(embedding)")).as("d"))
    assert(dotsIn(diff.queryExecution.optimizedPlan).nonEmpty,
      "distinct-vector dot_vec wrongly rewritten")
    df2.collect() // and the alias case still executes fine
  }

  test("minhash_sig rejects non-literal n/k at analysis time") {
    Tables.documents(spark, Sf).limit(5).createOrReplaceTempView("ext_docs2")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT minhash_sig(split(text, ' '), CAST(n_chars AS INT), 8) " +
          "FROM ext_docs2").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("minhash_sig rejects an out-of-Int-range Long literal (no silent toInt)") {
    Tables.documents(spark, Sf).limit(5).createOrReplaceTempView("ext_docs3")
    // 4294967297 = 2^32 + 1 → toInt would silently become 1
    val e = intercept[Exception] {
      spark.sql(
        "SELECT minhash_sig(split(text, ' '), 3, 4294967297) FROM ext_docs3")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"expected analysis error, got: ${e.getMessage}")
  }
}

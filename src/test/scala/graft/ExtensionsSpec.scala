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

  test("minhash_sig rejects non-literal n/k at analysis time") {
    Tables.documents(spark, Sf).limit(5).createOrReplaceTempView("ext_docs2")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT minhash_sig(split(text, ' '), CAST(n_chars AS INT), 8) " +
          "FROM ext_docs2").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}

package graft.ops

// TEMPORARY measurement scratch (not committed): dumps the physical plan
// of the classifier featureFrame in the r14 shape vs the current shape.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

object PlanDumpTmp {
  private val B = ClassifierOps.B
  private def bucketCol(token: org.apache.spark.sql.Column) =
    (conv(substring(md5(token.cast(BinaryType)), 1, 4), 16, 10)
      .cast(LongType) % B).as("j")

  /** r14 featureFrame, verbatim. */
  def featureFrameOld(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("token"))
      .select(col("doc_id"), col("dl"), col("token"),
        bucketCol(col("token")))
    val lab = tok.groupBy("doc_id")
      .agg(max("dl").as("dl"), countDistinct("token").as("types"))
      .select(col("doc_id"), col("dl"),
        when(col("types") * 2 >= col("dl"), 1).otherwise(0).as("y"))
    val feats = tok.groupBy("doc_id", "dl", "j")
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("j"),
        (col("tf").cast(DoubleType) / col("dl").cast(DoubleType)).as("x"))
    val bias = lab.select(col("doc_id"), lit(B.toLong).as("j"),
      lit(1.0).as("x"))
    feats.unionByName(bias)
      .join(lab.select("doc_id", "y"), "doc_id")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    println("========== featureFrame_r14 ==========")
    println(featureFrameOld(docs).queryExecution
      .explainString(ExplainMode.fromString("formatted")))
    println("========== featureFrame_r15 ==========")
    println(ClassifierOps.featureFrame(docs).queryExecution
      .explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Throwaway environment/entry probe (not part of the driver contract). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    e.show(10, truncate = false)
    println("entry rows: " + e.count())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: fresh session, SparkEntry.entry, rows>0.
  * Run: sbt "Test/runMain graft.EntrySmoke" */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY rows=$n")
    df.show(3)
    assert(n > 0)
    spark.stop()
  }
}

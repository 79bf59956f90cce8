package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    RelationalQueries.ensureViews(spark, sfDir)
    names.foreach { n =>  // warm
      queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[benchone] $n: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}

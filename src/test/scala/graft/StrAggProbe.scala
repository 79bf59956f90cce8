package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch: measure the SortAggregate-elimination win — min/max(string)
  * group-by, which vanilla Spark can only sort-aggregate (string buffers
  * are not hash-agg-able), vs the tier's object accumulators. */
object StrAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else "/tmp/graft-scale/s2/_root_testdata_sf0.1_x100_min6-2fd6"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(dir + "/documents.parquet")
    def q = docs.groupBy(col("lang"), col("source"))
      .agg(min(col("text")), max(col("text")), count(lit(1)))
    def time(tag: String): Unit = {
      q.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[stragg] $tag min=${ts.min}%.3f (${ts.map(t => f"$t%.3f").mkString(" ")})")
    }
    spark.conf.set("spark.graft.columnar.partialAgg", "false")
    time("builtin-sortagg")
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    time("tier")
    val df = q
    df.collect()
    println("[stragg] fired=" +
      df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"))
    // identity
    spark.conf.set("spark.graft.columnar.partialAgg", "false")
    val base = q.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val ours = q.collect().map(_.toString).sorted
    println("[stragg] identical=" + base.sameElements(ours))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r19 #2: q_events_hourly read 2.49× vs DuckDB in the driver's
  * x100 window (bar is 2×). Decompose the row the way dedup_exact was:
  * scan+filter / key projection / partial agg (tier on vs off) / full
  * query, interleaved in one window, against the noop sink. Also prints
  * whether the columnar tier fired (executed-plan check) and the stage
  * shuffle volumes.
  * Run: SPARK_GRAFT_SF_DIR=<x100 dir> sbt "Test/runMain graft.EventsHourlyProbe"
  */
object EventsHourlyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (1L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft-scale/s2/_root_testdata_sf0.1_x100_min6-2fd6")
    RelationalQueries.ensureViews(spark, dir)

    def time(label: String, df: => DataFrame, rounds: Int = 2): Double = {
      spark.sparkContext.setJobDescription(s"probe: $label")
      var best = Double.MaxValue
      for (_ <- 0 until rounds) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    val full = SparkEntry.queries("q_events_hourly")(spark, dir)
    // tier fired? (executed plan, post-AQE)
    full.queryExecution.executedPlan.execute().count()
    val fired = full.queryExecution.executedPlan.toString
      .contains("GraftColumnarPartialAgg")
    println(s"[probe] tier fired on q_events_hourly: $fired")

    val ev = spark.table("events")
    val filtered = ev.where(col("event_type").isin("click", "view"))
    val keys = filtered.select(
      date_trunc("hour", col("ts")).as("h"), col("event_type"), col("value"))
    val agg = keys.groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))

    for (r <- 1 to 3) {
      val s0 = time("scan+filter", filtered.select(col("ts"), col("event_type"), col("value")))
      val s1 = time("keys projection", keys)
      spark.conf.set("spark.graft.columnar.partialAgg", "false")
      val aOff = time("agg (tier OFF)", agg)
      val fOff = time("FULL (tier OFF)",
        SparkEntry.queries("q_events_hourly")(spark, dir))
      spark.conf.set("spark.graft.columnar.partialAgg", "true")
      val aOn = time("agg (tier ON)", agg)
      val fOn = time("FULL (tier ON)",
        SparkEntry.queries("q_events_hourly")(spark, dir))
      println(f"[probe] round $r: scan=$s0%.3f keys=$s1%.3f " +
        f"aggOff=$aOff%.3f aggOn=$aOn%.3f fullOff=$fOff%.3f fullOn=$fOn%.3f")
    }
    spark.stop()
  }
}

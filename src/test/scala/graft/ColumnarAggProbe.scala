package graft

import org.apache.spark.sql.SparkSession

/** Scratch: confirm the columnar partial-agg rewrite fires at runtime and
  * produces identical results to the built-in, then time both. */
object ColumnarAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q1_agg", "q_events_hourly", "delta_scan_agg", "dedup_exact",
      "emb_centroids")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect() // force final AQE plan
      val fin = df.queryExecution.executedPlan.toString
      val hit = fin.contains("GraftColumnarPartialAgg")
      println(s"[colagg] $n rewrite=${if (hit) "YES" else "no"}")
      spark.conf.set("spark.graft.columnar.partialAgg", "false")
      val base = SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted
      spark.conf.set("spark.graft.columnar.partialAgg", "true")
      val ours = SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted
      println(s"[colagg] $n identical=${base.sameElements(ours)} rows=${base.length}")
    }
    // timing loop on q1_agg
    def time(name: String, enabled: Boolean): Unit = {
      spark.conf.set("spark.graft.columnar.partialAgg", enabled.toString)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"[colagg] $name enabled=$enabled run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("q1_agg", enabled = false)
    time("q1_agg", enabled = true)
    time("q_events_hourly", enabled = false)
    time("q_events_hourly", enabled = true)
    time("emb_centroids", enabled = false)
    time("emb_centroids", enabled = true)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene inspector: prints formatted plans for selected queries so
  * pushdown/broadcast/codegen can be eyeballed.
  * Run: sbt "Test/runMain graft.PlanDump q5_multi_join delta_dv_scan" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (sys.env.contains("SPARK_GRAFT_SF_DIR")) sys.env("SPARK_GRAFT_SF_DIR")
      else "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("delta_scan_agg")
    names.foreach { n =>
      println(s"\n================ $n ================")
      val df = SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[time] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // the columnar tier anchors at runtime (AQE applies columnar rules
      // per stage), so only the POST-execution plan shows it — and the
      // noop write above runs its OWN QueryExecution, so df's plan must
      // be executed directly (RDD count, no driver collect) first
      df.queryExecution.executedPlan.execute().count()
      val exec = df.queryExecution.executedPlan.toString
      println(s"[executed] GraftColumnarPartialAgg present: " +
        exec.contains("GraftColumnarPartialAgg"))
    }
    spark.stop()
  }
}

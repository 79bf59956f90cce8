package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time (and optionally explain) individual bench queries under
  * the SAME session config Bench uses. GRAFT_EXPLAIN=1 prints the AQE
  * final plan per query. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_BROADCAST", (24L * 1024 * 1024).toString))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("GRAFT_ADVISORY_BYTES", (1L * 1024 * 1024).toString))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", (16L * 1024 * 1024).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // ad-hoc conf experiments: GRAFT_CONF="k=v;k2=v2"
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_STAGES=1: print per-stage wall time + shuffle volumes after
    // each timed run — the breakdown `explain` can't give.
    if (sys.env.get("GRAFT_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = s.stageInfo
            val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
            val m = i.taskMetrics
            println(f"[stage] ${i.stageId}%3d ${ms.getOrElse(-1L)}%6d ms  " +
              f"tasks=${i.numTasks}%3d  in=${m.inputMetrics.bytesRead/1048576.0}%8.1f MB  " +
              f"shR=${m.shuffleReadMetrics.totalBytesRead/1048576.0}%8.1f MB  " +
              f"shW=${m.shuffleWriteMetrics.bytesWritten/1048576.0}%8.1f MB  ${i.name.take(60)}")
          }
        })
    val queries = SparkEntry.queries
    RelationalQueries.ensureViews(spark, sfDir)
    names.foreach { n =>  // warm
      queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    // GRAFT_AB_CONF="conf.key:v1,v2" (or legacy GRAFT_AB_BROADCAST="v1,v2"):
    // run each query under both values back-to-back (noise-immune A/B
    // inside one host window), min of 2 each
    val abSpec = sys.env.get("GRAFT_AB_CONF")
      .map { s => val Array(k, vs) = s.split(":", 2); (k, vs) }
      .orElse(sys.env.get("GRAFT_AB_BROADCAST")
        .map(("spark.sql.autoBroadcastJoinThreshold", _)))
    abSpec match {
      case Some((key, ab)) =>
        val Array(a, b) = ab.split(',')
        names.foreach { n =>
          def timed(v: String): Double = {
            spark.conf.set(key, v)
            val t0 = System.nanoTime()
            queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          timed(a); timed(b) // warm both plan shapes
          val ta = math.min(timed(a), { val x = timed(a); x })
          val tb = math.min(timed(b), { val x = timed(b); x })
          println(f"[benchone] $n: A($a)=$ta%.3f s  B($b)=$tb%.3f s")
        }
      case None =>
        names.foreach { n =>
          val t0 = System.nanoTime()
          val df = queries(n)(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          println(f"[benchone] $n: ${(System.nanoTime()-t0)/1e9}%.3f s")
          if (sys.env.get("GRAFT_EXPLAIN").contains("1")) {
            df.collect()
            println(s"[benchone] $n final plan:\n${df.queryExecution.executedPlan}")
          }
        }
    }
    spark.stop()
  }
}

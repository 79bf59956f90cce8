package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose emb_centroids at x100 into its cost components —
  * job floor, label-only scan+agg (fixed stage cost), array decode alone,
  * vector-sum partial without the explode/sort tail, and the full query —
  * to decide whether the remaining gap vs DuckDB is aggregate work (fixable
  * in the tier) or Spark's multi-stage fixed cost (floor). */
object CentroidProbe {
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
    val emb = spark.read.parquet(dir + "/embeddings.parquet")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[centroid] $name%-28s min=${ts.min}%.3f s  (${ts.map(t => f"$t%.3f").mkString(" ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("job_floor")(noop(spark.range(1).toDF()))
    time("scan_label_count")(noop(emb.select(col("label")).groupBy(col("label")).count()))
    time("scan_arrays_only")(noop(emb.select(col("embedding"))))
    time("vecsum_partial_tail_off")(noop(
      emb.groupBy(col("label"))
        .agg(graft.functions.VectorSumAgg.vectorSum(col("embedding"), 64).as("s"),
          count(lit(1)).as("n"))))
    time("full_query")(noop(graft.pipeline.Similarity.centroids(emb)))
    spark.conf.set("spark.graft.columnar.partialAgg", "false")
    time("full_query_tier_off")(noop(graft.pipeline.Similarity.centroids(emb)))
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    spark.stop()
  }
}

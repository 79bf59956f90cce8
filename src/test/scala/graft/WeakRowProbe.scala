package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch harness: decompose the three r16 weak bench rows
  * (dedup_exact, emb_centroids, q_events_hourly) into scan / per-row
  * expression / grouping components on a scale dir — the AggProbe
  * treatment that pinned q1_agg as an engine constant. Exploration only —
  * not part of the bench. Pass the x100 micro dir (or any sf dir). */
object WeakRowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    RelationalQueries.ensureViews(spark, dir)
    val docs = spark.table("documents")
    val events = spark.table("events")
    val emb = spark.table("embeddings")

    def t(name: String)(df: => DataFrame): Double = {
      val xs = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[weakrow] $name run$i: $s%.3f s")
        s
      }
      xs.min
    }

    // --- dedup_exact: scan → text materialization → md5 → group ---
    t("docs_count")(docs.groupBy().agg(count(lit(1))))
    t("docs_textlen")(docs.groupBy().agg(sum(length(col("text")))))
    t("docs_md5_nogroup")(docs.groupBy().agg(
      sum(length(graft.functions.GraftFunctions.md5(col("text"))))))
    t("docs_xxh_group")(docs
      .groupBy(xxhash64(col("text")).as("h"))
      .agg(min(col("doc_id")), count(lit(1))))
    t("docs_md5hex_group")(docs
      .groupBy(graft.functions.GraftFunctions.md5(col("text")).as("h"))
      .agg(min(col("doc_id")), count(lit(1))))
    t("dedup_exact_full")(graft.pipeline.Dedup.exact(docs))

    // --- q_events_hourly: scan+filter → trunc → group ---
    t("ev_filter_count")(events
      .where(col("event_type").isin("click", "view"))
      .groupBy().agg(count(lit(1))))
    t("ev_trunc_nogroup")(events
      .where(col("event_type").isin("click", "view"))
      .groupBy().agg(avg(unix_micros(date_trunc("hour", col("ts"))))))
    t("ev_group_notrunc")(events
      .where(col("event_type").isin("click", "view"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)), round(sum(col("value")), 2)))
    t("ev_hourly_full")(events
      .where(col("event_type").isin("click", "view"))
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .orderBy(col("h"), col("event_type")))

    // --- emb_centroids: scan → vector-sum agg (no group) → full ---
    t("emb_count")(emb.groupBy().agg(count(lit(1))))
    t("emb_vecsum_nogroup")(emb.groupBy().agg(
      graft.functions.VectorSumAgg.vectorSum(col("embedding"), 64)))
    t("emb_centroids_full")(graft.pipeline.Similarity.centroids(emb))

    spark.stop()
  }
}

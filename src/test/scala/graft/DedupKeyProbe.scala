package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch harness: A/B the r19 md5-binary tier grouping key on the
  * dedup_exact shape (built-in HashAggregate over a projected digest vs
  * the columnar tier digesting in the key path). Exploration only — not
  * part of the bench. Pass the x100 micro dir (or any sf dir). */
object DedupKeyProbe {
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

    def t(name: String, runs: Int = 5)(df: => DataFrame): Double = {
      val xs = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[dedupkey] $name run$i: $s%.3f s")
        s
      }
      val m = xs.min
      println(f"[dedupkey] $name MIN: $m%.3f s")
      m
    }

    // sanity: the rewrite fires with the tier on. The tier anchors at
    // runtime (AQE applies columnar rules per stage) and a noop write
    // runs its OWN QueryExecution, so the df's own plan must execute
    // before inspection (same approach as PlanDump)
    def fired(df: DataFrame): Boolean = {
      df.queryExecution.executedPlan.execute().count()
      df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg")
    }
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    println(s"[dedupkey] tier fired on dedup_exact: " +
      fired(graft.pipeline.Dedup.exact(docs)))

    spark.conf.set("spark.graft.columnar.partialAgg", "false")
    val base = t("dedup_exact_builtin")(graft.pipeline.Dedup.exact(docs))
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val tier = t("dedup_exact_tier")(graft.pipeline.Dedup.exact(docs))
    println(f"[dedupkey] builtin=$base%.3f tier=$tier%.3f speedup=${base / tier}%.2fx")

    // hash64 variant: 8-byte long key instead of the 16-byte digest
    spark.conf.set("spark.graft.columnar.partialAgg", "false")
    val base64 = t("dedup_hash64_builtin")(graft.pipeline.Dedup.exactByHash64(docs))
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    println(s"[dedupkey] tier fired on dedup_exact_hash64: " +
      fired(graft.pipeline.Dedup.exactByHash64(docs)))
    val tier64 = t("dedup_hash64_tier")(graft.pipeline.Dedup.exactByHash64(docs))
    println(f"[dedupkey] hash64 builtin=$base64%.3f tier=$tier64%.3f " +
      f"speedup=${base64 / tier64}%.2fx vs-md5-tier=${tier / tier64}%.2fx")
    spark.stop()
  }
}

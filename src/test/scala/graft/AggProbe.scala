package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch harness: decompose the q1_agg constant (scan vs decode vs agg)
  * on a scale dir. Exploration only — not part of the bench. */
object AggProbe {
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
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k.trim, v.trim) })
    spark.sparkContext.setLogLevel("WARN")
    RelationalQueries.ensureViews(spark, dir)
    val li = spark.table("lineitem")

    def t(name: String)(df: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[aggprobe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    t("count_only")(li.groupBy().agg(count(lit(1))))
    t("sum1_nogroup")(li.groupBy().agg(sum(col("l_quantity"))))
    t("sum4_nogroup")(li.groupBy().agg(
      sum(col("l_quantity")), sum(col("l_extendedprice")),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))))
    t("group_strings_count")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1))))
    t("q1_full")(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      round(sum(col("l_quantity")), 2),
      round(sum(col("l_extendedprice")), 2),
      round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2),
      round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2),
      round(avg(col("l_quantity")), 4),
      round(avg(col("l_extendedprice")), 4),
      round(avg(col("l_discount")), 4),
      count(lit(1))))
    spark.stop()
  }
}

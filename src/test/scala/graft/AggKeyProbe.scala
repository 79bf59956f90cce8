package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Close-or-convict probe for the q1_agg weak row: does swapping the
  * 2-string group key for an int dictionary key buy back the pinned
  * row-based-HashAggregate constant (AggProbe r11: 1.1s of the 2.0s at
  * x300 is group-by-2-strings+count)? Times the CURRENT shape against a
  * char-code int-key variant (flags are 1-char, so
  * `ascii(flag)*256 + ascii(status)` is a loss-free dictionary) and a
  * count-only floor, hot, on the x100 lineitem. Run:
  * sbt "Test/runMain graft.AggKeyProbe <dir>" */
object AggKeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale/s2/_root_testdata_sf0.1_x100_min6-2fd6")
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    // parquet directly — the bench's actual scan shape (page-cache-warm
    // files, dictionary-encoded strings), NOT a Spark cache whose string
    // column decompression would swamp the agg signal
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    // interleaved rounds: variants alternate inside the same host window
    // so a noise burst hits all of them, not whichever ran second
    val plans = scala.collection.mutable.LinkedHashMap.empty[String, () => DataFrame]
    def time(name: String)(f: => DataFrame): Unit = plans(name) = () => f
    def runAll(rounds: Int): Unit = {
      plans.values.foreach(p => p().collect()) // warm
      val ts = plans.keys.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
      (1 to rounds).foreach { _ =>
        plans.foreach { case (n, p) =>
          val t0 = System.nanoTime(); p().collect()
          ts(n) += (System.nanoTime() - t0) / 1e9
        }
      }
      plans.keys.foreach { n =>
        println(f"PROBE $n min=${ts(n).min}%.3f runs=${ts(n).map(t => f"$t%.3f").mkString(",")}")
      }
    }

    def aggs = Seq(
      round(sum(col("l_quantity")), 2).as("sum_qty"),
      round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
      round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
      round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
      round(avg(col("l_quantity")), 4).as("avg_qty"),
      round(avg(col("l_extendedprice")), 4).as("avg_price"),
      round(avg(col("l_discount")), 4).as("avg_disc"),
      count(lit(1)).as("count_order"))

    time("strings (current)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
    time("int char-code key") {
      li.groupBy((ascii(col("l_returnflag")) * 256 + ascii(col("l_linestatus"))).as("k"))
        .agg(aggs.head, aggs.tail: _*)
        .select(char(col("k").divide(256).cast("int")).as("l_returnflag"),
          char((col("k") % 256).cast("int")).as("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("sum_charge"), col("avg_qty"), col("avg_price"), col("avg_disc"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
    time("count-only strings") {
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1)).as("n"))
    }
    time("count-only int key") {
      li.groupBy((ascii(col("l_returnflag")) * 256 + ascii(col("l_linestatus"))).as("k"))
        .agg(count(lit(1)).as("n"))
    }
    // floors: global agg (no grouping) over the same 8 measures, and a
    // bare 1-column sum — how much of the full shape is scan vs grouping
    time("global agg (no group key)") {
      li.agg(aggs.head, aggs.tail: _*)
    }
    time("scan floor sum(l_quantity)") {
      li.agg(sum(col("l_quantity")).as("s"))
    }
    runAll(4)

    // second experiment: the non-default VECTORIZED first-level hash map
    // (row-based fast map is the default); conf is read at codegen, so
    // re-plan under the flag and interleave against the baseline again
    plans.clear()
    def withConf(k: String, v: String)(f: => DataFrame): DataFrame = {
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try f finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
    def q1(df: DataFrame): DataFrame =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    time("q1 rowmap (default)") { q1(li) }
    time("q1 vectorized fastmap") {
      withConf("spark.sql.codegen.aggregate.map.vectorized.enable", "true")(q1(li))
    }
    time("q1 no twolevel map") {
      withConf("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")(q1(li))
    }
    runAll(4)
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized identity property for the columnar partial-agg tier: over
  * GENERATED query shapes (key sets, aggregate sets, filters — the whole
  * claimed surface incl. the r18 integral/timestamp additions), the tier
  * must produce byte-identical results to the built-in HashAggregate.
  * Within a partition both operators accumulate in row order, so double
  * sums are bit-equal too (no flush at this scale) — the comparison is
  * exact. This is the test class that would have caught the r17 Divide
  * defect: the fixed specs enumerate known shapes, the property explores
  * the combinations nobody thought to write down. */
class ColumnarAggPropertySpec extends AnyFunSuite {
  import TestSpark._

  // deterministic fixture: every interesting column class in one table —
  // low/high-card strings, int/long/date/timestamp/bool keys, nullable
  // doubles with NaN, nullable ints, small longs (sum-safe), BIG longs
  // near/over 2^53 (filter exactness), written as 3 files
  private lazy val dataPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-colagg-prop").toString + "/t"
    spark.range(4000).selectExpr(
      "case when id % 31 = 0 then null else concat('k', id % 5) end as k",
      "case when id % 29 = 0 then null else cast(id % 20 as int) end as k2",
      "id % 7 as kl",
      "case when id % 41 = 0 then null else id % 2 = 0 end as b",
      "date_add(date'1995-01-01', cast(id % 900 as int)) as dt",
      // one in eleven timestamps is pre-1970: negative micros must floor
      // (not truncate toward zero) through the date_trunc key arithmetic
      "timestamp_seconds(case when id % 11 = 0 then id * 3600 - 600000000 " +
        "else 800000000 + id * 3600 end) as ts",
      "case when id % 23 = 0 then null " +
        "when id % 97 = 0 then cast('NaN' as double) " +
        "else cast(id % 113 as double) * 1.7 - 40.0 end as d",
      "case when id % 13 = 0 then null else cast(id % 51 as int) - 25 end as li",
      "case when id % 17 = 0 then null else id * 1048576 - 1000000 end as ll",
      "9007199254740990 + id % 7 as lb", // straddles 2^53 = ...992
      "concat('s', id % 997) as s2")
      .repartition(3).write.parquet(p)
    p
  }

  private case class Shape(keys: Seq[String], aggs: Seq[String], filter: Option[String])

  private val keyGen: Gen[Seq[String]] =
    Gen.choose(0, 2).flatMap(n => Gen.pick(n,
      Seq("k", "k2", "kl", "b", "dt", "trunc_h", "trunc_d", "md5_s2",
        "md5_k", "xx_s2", "xx_k")).map(_.toSeq))

  private val aggGen: Gen[Seq[String]] =
    Gen.choose(1, 4).flatMap(n => Gen.pick(n, Seq(
      "sum_d", "avg_d", "min_d", "max_d", "count_star", "count_li",
      "sum_li", "sum_ll", "min_li", "max_li", "min_ll", "max_ll",
      "min_dt", "max_ts", "sum_expr", "min_s2", "max_k", "count_k",
      "stddev_d", "varpop_d")).map(_.toSeq))

  private val filterGen: Gen[Option[String]] =
    Gen.option(Gen.oneOf(
      "d_gt", "li_ge", "ll_lt", "lb_gt_2p53", "ts_le", "dt_ge",
      "k_eq", "k_in", "nn_d", "nn_k", "and_two", "or_same",
      // literal-on-left twins (swapped operands, mirrored comparator)
      "rev_d_lt", "rev_li_le", "rev_lb_2p53", "rev_k_eq", "rev_or_same"))

  private def col2(name: String): Column = name match {
    case "trunc_h" => date_trunc("hour", col("ts"))
    case "trunc_d" => date_trunc("day", col("ts"))
    // md5-binary expression keys (r19 tier surface); md5_k is nullable.
    // build() hex()es the BinaryType key column so the digest bytes are
    // compared directly (Row.toString on Array[Byte] is identity-based)
    case "md5_s2" => graft.functions.GraftFunctions.md5Binary(col("s2"))
    case "md5_k" => graft.functions.GraftFunctions.md5Binary(col("k"))
    // xxhash64 expression keys (r19 tier surface): a LONG key, so it
    // round-trips through the compared output directly; xx_k is nullable
    // (null hashes to the seed — XxHash64 is never null)
    case "xx_s2" => xxhash64(col("s2"))
    case "xx_k" => xxhash64(col("k"))
    case c => col(c)
  }
  private def agg2(name: String): Column = name match {
    case "sum_d" => sum(col("d"))
    case "avg_d" => avg(col("d"))
    case "min_d" => min(col("d"))
    case "max_d" => max(col("d"))
    case "count_star" => count(lit(1))
    case "count_li" => count(col("li"))
    case "sum_li" => sum(col("li"))
    case "sum_ll" => sum(col("ll"))
    case "min_li" => min(col("li"))
    case "max_li" => max(col("li"))
    case "min_ll" => min(col("ll"))
    case "max_ll" => max(col("ll"))
    case "min_dt" => min(col("dt"))
    case "max_ts" => max(col("ts"))
    case "sum_expr" => sum(col("d") * (lit(1.0) - col("d") * lit(0.001)))
    case "min_s2" => min(col("s2"))
    case "max_k" => max(col("k")) // nullable string
    case "count_k" => count(col("k"))
    case "stddev_d" => stddev_samp(col("d"))
    case "varpop_d" => var_pop(col("d"))
  }
  private def filter2(name: String): Column = name match {
    case "d_gt" => col("d") > 10.0
    case "li_ge" => col("li") >= -3
    case "ll_lt" => col("ll") < 1500000000L
    case "lb_gt_2p53" => col("lb") > 9007199254740992L // exactness boundary
    case "ts_le" => col("ts") <= lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00"))
    case "dt_ge" => col("dt") >= lit(java.sql.Date.valueOf("1996-01-01"))
    case "k_eq" => col("k") === "k2"
    case "k_in" => col("k").isin("k0", "k3", "nope")
    case "nn_d" => col("d").isNotNull
    case "nn_k" => col("k").isNotNull
    case "and_two" => col("d") > -5.0 && col("li") < 20
    case "or_same" => col("k") === "k1" || col("k") === "k4"
    case "rev_d_lt" => lit(10.0) < col("d") // ≡ d > 10.0
    case "rev_li_le" => lit(-3) <= col("li") // ≡ li >= -3
    case "rev_lb_2p53" => lit(9007199254740992L) < col("lb") // exactness boundary
    case "rev_k_eq" => lit("k2") === col("k")
    case "rev_or_same" => lit("k1") === col("k") || col("k") === "k4"
  }

  private def build(s: Shape): DataFrame = {
    var df = spark.read.parquet(dataPath)
    s.filter.foreach(f => df = df.where(filter2(f)))
    val keyed = s.keys.zipWithIndex.map { case (k, i) => col2(k).as(s"gk$i") }
    val grouped = df.groupBy(keyed: _*)
      .agg(agg2(s.aggs.head), s.aggs.tail.map(agg2): _*)
    // binary (md5) keys can't round-trip through Row.toString (Array
    // toString is identity-based) — hex them so the emitted digest BYTES
    // are part of the compared rows, not just the grouping they induce
    val binKeys = s.keys.zipWithIndex.collect {
      case (k, i) if k.startsWith("md5_") => s"gk$i"
    }
    binKeys.foldLeft(grouped)((d, c) => d.withColumn(c, hex(col(c))))
  }

  // aggregates whose value is independent of how a group's rows split
  // across partial rows: min/max (any type), counts, integral sums.
  // Double sum/avg/Welford change FP association when a flush splits a
  // group — those are covered under flush by the fixed tolerance test
  // in ColumnarAggSpec, not by byte-identity.
  private val exactAggGen: Gen[Seq[String]] =
    Gen.choose(1, 4).flatMap(n => Gen.pick(n, Seq(
      "min_d", "max_d", "count_star", "count_li", "sum_li", "sum_ll",
      "min_li", "max_li", "min_ll", "max_ll", "min_dt", "max_ts",
      "min_s2", "max_k", "count_k")).map(_.toSeq))

  private def runIdentityProperty(minShapes: Int,
      aggs: Gen[Seq[String]] = aggGen): Unit = {
    var fired = 0
    var total = 0
    val shapeGen = for {
      ks <- keyGen; as <- aggs; f <- filterGen
    } yield Shape(ks, as, f)
    val prop = Prop.forAll(shapeGen) { s =>
      total += 1
      spark.conf.set("spark.graft.columnar.partialAgg", "false")
      val base = build(s).collect().map(_.toString).sorted
      spark.conf.set("spark.graft.columnar.partialAgg", "true")
      val ours = build(s)
      val oursRows = ours.collect().map(_.toString).sorted
      if (ours.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"))
        fired += 1
      val ok = oursRows.sameElements(base)
      if (!ok) System.err.println(s"[colagg-prop] DIVERGED on $s\n" +
        s"  base=${base.take(3).mkString("|")}\n  ours=${oursRows.take(3).mkString("|")}")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(minShapes), prop)
    assert(res.passed, s"identity property failed: $res")
    // the generator must actually exercise the tier, not just fall back
    assert(fired * 5 >= total,
      s"rewrite fired on only $fired/$total generated shapes — generator drifted off the surface")
  }

  test("generated shapes: tier == built-in, byte-identical") {
    runIdentityProperty(40)
  }

  test("generated shapes under forced overflow flushes (maxGroups=64)") {
    // every generated key set with cardinality > 64 now crosses flush
    // boundaries — partial rows split per group across snapshots, across
    // every key kind (incl. md5/xxhash64 digests) and filter shape at
    // once. Aggregates are restricted to split-exact ones (see
    // exactAggGen): for those a mid-partition flush changes WHERE
    // partials split, never the merged result, so byte-identity against
    // the (unflushed) built-in must hold unchanged.
    val prev = System.getProperty("graft.columnar.agg.maxGroups")
    System.setProperty("graft.columnar.agg.maxGroups", "64")
    try runIdentityProperty(25, exactAggGen)
    finally {
      if (prev == null) System.clearProperty("graft.columnar.agg.maxGroups")
      else System.setProperty("graft.columnar.agg.maxGroups", prev)
    }
  }
}

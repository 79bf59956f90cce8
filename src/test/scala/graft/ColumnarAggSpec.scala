package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The columnar partial-agg rewrite must be result-identical to the
  * built-in HashAggregate on every shape it claims, including the nasty
  * ones: null inputs, null keys, non-dictionary keys, table overflow
  * (flush-and-reset), empty input, filters, and date_trunc keys. */
class ColumnarAggSpec extends AnyFunSuite {
  import TestSpark._

  private def both(df: => DataFrame): (Array[String], Array[String]) = {
    spark.conf.set("spark.graft.columnar.partialAgg", "false")
    val base = df.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val ours = df.collect().map(_.toString).sorted
    (base, ours)
  }

  private def identical(df: => DataFrame): Unit = {
    val (base, ours) = both(df)
    assert(ours.sameElements(base),
      s"columnar agg diverged: base=${base.take(3).mkString("|")} ours=${ours.take(3).mkString("|")}")
  }

  private def pq(name: String): DataFrame = Fixtures.readParquet(spark, sfDir, name)

  test("string-key sums/avg/count over lineitem (q1 shape)") {
    identical(pq("lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        avg(col("l_discount")), count(lit(1))))
  }

  test("null inputs and null keys aggregate identically") {
    val src = pq("lineitem").select(
      when(col("l_orderkey") % 7 === 0, lit(null)).otherwise(col("l_returnflag")).as("k"),
      when(col("l_orderkey") % 5 === 0, lit(null)).otherwise(col("l_quantity")).as("v"))
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    src.write.parquet(p)
    identical(spark.read.parquet(p).groupBy(col("k"))
      .agg(sum(col("v")), avg(col("v")), count(lit(1))))
    // all-null value group: sum must be null, avg null, count > 0
    val all = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"),
      lit(null).cast("double").as("v")).write.parquet(all)
    identical(spark.read.parquet(all).groupBy(col("k"))
      .agg(sum(col("v")), avg(col("v")), count(lit(1))))
  }

  test("non-dictionary long keys and int keys") {
    identical(pq("lineitem").groupBy(col("l_orderkey") % 97)
      .agg(sum(col("l_quantity")), count(lit(1))))
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select((col("l_orderkey") % 1000).cast("int").as("k"),
      col("l_quantity").as("v")).write.parquet(p)
    identical(spark.read.parquet(p).groupBy(col("k"))
      .agg(sum(col("v")), avg(col("v")), count(lit(1))))
  }

  test("high-cardinality keys overflow the table and flush correctly") {
    val prev = System.getProperty("graft.columnar.agg.maxGroups")
    System.setProperty("graft.columnar.agg.maxGroups", "64")
    try {
      // ~thousands of distinct keys per partition >> 64: many flushes; the
      // final agg must still merge to the same totals. A flushed group
      // contributes TWO partial rows, so double addition order differs —
      // compare with a relative tolerance (Spark itself does not promise
      // bit-equal double aggregation across partial-row layouts); counts
      // must stay exact.
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .sortBy(_._1)
      val q = () => pq("lineitem").groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1)))
      spark.conf.set("spark.graft.columnar.partialAgg", "false")
      val base = rows(q())
      spark.conf.set("spark.graft.columnar.partialAgg", "true")
      val ours = rows(q())
      assert(ours.length == base.length)
      base.zip(ours).foreach { case ((bk, bs, ba, bc), (ok, os, oa, oc)) =>
        assert(bk == ok && bc == oc)
        assert(math.abs(bs - os) <= 1e-9 * math.max(1.0, math.abs(bs)))
        assert(math.abs(ba - oa) <= 1e-9 * math.max(1.0, math.abs(ba)))
      }
    } finally {
      if (prev == null) System.clearProperty("graft.columnar.agg.maxGroups")
      else System.setProperty("graft.columnar.agg.maxGroups", prev)
    }
  }

  test("global (no-key) aggregation, including empty input") {
    identical(pq("lineitem").agg(sum(col("l_quantity")), avg(col("l_tax")), count(lit(1))))
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").where(lit(false))
      .select(col("l_quantity")).write.parquet(p)
    identical(spark.read.parquet(p).agg(sum(col("l_quantity")), count(lit(1))))
  }

  test("filter + project + date_trunc key (events_hourly shape)") {
    val ev = Fixtures.readNormalized(spark, sfDir, "events")
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    ev.write.parquet(p)
    identical(spark.read.parquet(p)
      .where(col("event_type").isin("click", "view"))
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)), round(sum(col("value")), 2)))
    // numeric filter + minute trunc
    identical(spark.read.parquet(p)
      .where(col("value") > 10.0)
      .groupBy(date_trunc("minute", col("ts")))
      .agg(sum(col("value")), count(lit(1))))
  }

  test("min/max over doubles, including all-null groups and NaN ordering") {
    identical(pq("lineitem").groupBy(col("l_returnflag"))
      .agg(max(col("l_extendedprice")), min(col("l_discount")),
        max(col("l_quantity") * (lit(1) + col("l_tax")))))
    // all-null group → null min/max; NaN must order as the LARGEST double
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"),
      when(col("l_orderkey") % 3 === 0, lit(Double.NaN))
        .when(col("l_orderkey") % 3 === 1, lit(null))
        .otherwise(col("l_quantity")).as("v")).write.parquet(p)
    identical(spark.read.parquet(p).groupBy(col("k"))
      .agg(max(col("v")), min(col("v")), count(lit(1))))
  }

  test("vector-sum aggregate (centroids shape) matches the imperative path") {
    val emb = pq("embeddings")
    identical(graft.pipeline.Similarity.centroids(emb))
    // with nulls: some arrays entirely null
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    emb.select(col("label"),
      when(col("vec_id") % 5 === 0, lit(null)).otherwise(col("embedding")).as("embedding"))
      .write.parquet(p)
    identical(graft.pipeline.Similarity.centroids(spark.read.parquet(p)))
    // and the rewrite really fires on this shape
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = graft.pipeline.Similarity.centroids(emb)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"))
  }

  test("grouping by a hive-partition column (constant batch vectors)") {
    // partition columns surface as constant vectors appended to the batch;
    // they have no dictionary, so this exercises the generic key path
    val p = Fixtures.delta(spark, sfDir, "lineitem", Fixtures.Part)
    identical(spark.read.format("graftdelta").load(p)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 4), avg(col("l_discount")), count(lit(1))))
  }

  test("deletion-vector scans aggregate identically (deleted rows excluded)") {
    // the DV fixture deletes splitCol % 10 = 7 rows; the batches the scan
    // emits must already exclude them on BOTH paths
    val p = Fixtures.delta(spark, sfDir, "lineitem", Fixtures.Dv)
    identical(spark.read.format("graftdelta").load(p)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 4), count(lit(1))))
    val full = Fixtures.readParquet(spark, sfDir, "lineitem").count()
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val dv = spark.read.format("graftdelta").load(p)
      .agg(count(lit(1))).collect()(0).getLong(0)
    assert(dv < full, "DV scan must exclude deleted rows")
  }

  test("the rewrite actually fires on the q1 shape") {
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = pq("lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")), count(lit(1)))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "expected the columnar partial agg in the final plan")
  }

  test("division never compiles into the tier (null/ANSI-error semantics)") {
    // Spark's Divide is null on a zero divisor in legacy mode and raises
    // DIVIDE_BY_ZERO under ANSI — a raw IEEE '/' in the tier would feed
    // ±Inf into the sum instead. Any Divide must keep the built-in agg.
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"), col("l_quantity").as("a"),
      when(col("l_orderkey") % 11 === 0, lit(0.0)).otherwise(col("l_tax")).as("b"))
      .write.parquet(p)
    val df = spark.read.parquet(p).groupBy(col("k")).agg(sum(col("a") / col("b")))
    assert(!df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "Divide must decline the columnar rewrite")
    // legacy mode: x/0.0 is NULL, sum skips those rows — and since the
    // rewrite declined, both settings of the kill-switch agree trivially
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try identical(spark.read.parquet(p).groupBy(col("k")).agg(sum(col("a") / col("b"))))
    finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("long filters past 2^53 compare exactly (no double widening)") {
    // 2^53 + 1 is not representable in double; a double-widened compare
    // would collapse it onto 2^53 and flip the predicate
    val big = 9007199254740992L // 2^53
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"), col("l_quantity").as("v"),
      (col("l_orderkey") % 3 + lit(big)).as("id")).write.parquet(p)
    def q = spark.read.parquet(p).where(col("id") > lit(big))
      .groupBy(col("k")).agg(sum(col("v")), count(lit(1)))
    identical(q)
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = q
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "the exact long comparison path should still rewrite")
  }

  test("element-level nulls in vector-sum arrays fall back to the checked path") {
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("embeddings").selectExpr("vec_id", "label",
      "transform(embedding, (x, i) -> case when i = 3 and vec_id % 4 = 0 " +
        "then cast(null as float) else x end) as embedding")
      .write.parquet(p)
    identical(graft.pipeline.Similarity.centroids(spark.read.parquet(p)))
  }

  test("NaN rows pass numeric filters per Spark's ordering (NaN is the largest double)") {
    // found by ColumnarAggPropertySpec: Spark's GreaterThan on doubles
    // orders NaN greatest (NaN > 10.0 is TRUE); a primitive Java compare
    // silently dropped those rows from filtered aggregates
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"), col("l_quantity").as("v"),
      when(col("l_orderkey") % 7 === 0, lit(Double.NaN))
        .otherwise(col("l_extendedprice")).as("f")).write.parquet(p)
    identical(spark.read.parquet(p).where(col("f") > 10.0)
      .groupBy(col("k")).agg(sum(col("v")), count(lit(1))))
    identical(spark.read.parquet(p).where(col("f") <= 100000.0)
      .groupBy(col("k")).agg(sum(col("v")), count(lit(1))))
    identical(spark.read.parquet(p).where(col("f") === lit(Double.NaN))
      .groupBy(col("k")).agg(count(lit(1))))
  }

  test("timestamp/date filters compare exactly and still rewrite (q1 filter shape)") {
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"), col("l_quantity").as("v"),
      col("l_shipdate").as("ts"), col("l_shipdate").cast("date").as("d"))
      .write.parquet(p)
    def q = spark.read.parquet(p)
      .where(col("ts") <= lit(java.sql.Timestamp.valueOf("1997-09-02 00:00:00")))
      .groupBy(col("k")).agg(sum(col("v")), count(lit(1)))
    identical(q)
    identical(spark.read.parquet(p)
      .where(col("d") >= lit(java.sql.Date.valueOf("1995-01-01")))
      .groupBy(col("k")).agg(sum(col("v")), count(lit(1))))
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = q
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "timestamp-filtered agg should rewrite")
  }

  test("integral aggregates: sum(long/int), min/max(long/int/date/ts), count(col)") {
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"),
      col("l_orderkey").as("lk"),
      col("l_linenumber").cast("int").as("ik"),
      col("l_shipdate").cast("date").as("d"),
      col("l_shipdate").cast("timestamp").as("ts"),
      when(col("l_orderkey") % 5 === 0, lit(null)).otherwise(col("l_orderkey")).as("nl"))
      .write.parquet(p)
    def q = spark.read.parquet(p).groupBy(col("k"))
      .agg(sum(col("lk")), sum(col("ik")), min(col("lk")), max(col("ik")),
        min(col("d")), max(col("d")), min(col("ts")), max(col("ts")),
        count(col("nl")), count(lit(1)))
    identical(q)
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = q
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "integral aggregate shapes should rewrite")
    // all-null value group: sum/min/max null, count(col) 0, count(*) > 0
    val p2 = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"),
      lit(null).cast("bigint").as("v")).write.parquet(p2)
    identical(spark.read.parquet(p2).groupBy(col("k"))
      .agg(sum(col("v")), min(col("v")), max(col("v")), count(col("v")), count(lit(1))))
  }

  test("min/max over strings (binary order), including null keys and all-null groups") {
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"),
      when(col("l_orderkey") % 9 === 0, lit(null))
        .otherwise(concat(col("l_linestatus"), lit("-"),
          (col("l_orderkey") % 37).cast("string"))).as("s"))
      .write.parquet(p)
    def q = spark.read.parquet(p).groupBy(col("k"))
      .agg(min(col("s")), max(col("s")), count(lit(1)))
    identical(q)
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = q
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "string min/max shapes should rewrite")
    // all-null string column
    val p2 = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"),
      lit(null).cast("string").as("s")).write.parquet(p2)
    identical(spark.read.parquet(p2).groupBy(col("k"))
      .agg(min(col("s")), max(col("s")), count(col("s"))))
  }

  test("string min/max survive table overflow flushes (multiple partials per group)") {
    val prev = System.getProperty("graft.columnar.agg.maxGroups")
    System.setProperty("graft.columnar.agg.maxGroups", "64")
    try {
      val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
      pq("lineitem").select(col("l_orderkey").as("k"),
        when(col("l_orderkey") % 9 === 0, lit(null))
          .otherwise(concat(col("l_linestatus"), (col("l_partkey") % 101).cast("string")))
          .as("s")).write.parquet(p)
      // string/long results are exact, so plain identity applies even
      // though each group contributes several partial rows
      identical(spark.read.parquet(p).groupBy(col("k"))
        .agg(min(col("s")), max(col("s")), count(col("s")), count(lit(1))))
    } finally {
      if (prev == null) System.clearProperty("graft.columnar.agg.maxGroups")
      else System.setProperty("graft.columnar.agg.maxGroups", prev)
    }
  }

  test("stddev/variance (samp + pop): bit-identical partials incl. NaN/null/single-row groups") {
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"),
      when(col("l_orderkey") % 23 === 0, lit(null))
        .when(col("l_orderkey") % 97 === 0, lit(Double.NaN))
        .otherwise(col("l_extendedprice")).as("v")).write.parquet(p)
    def q = spark.read.parquet(p).groupBy(col("k"))
      .agg(stddev_samp(col("v")), stddev_pop(col("v")),
        var_samp(col("v")), var_pop(col("v")), count(lit(1)))
    identical(q)
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = q
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "stddev/variance shapes should rewrite")
    // single-row groups (var_samp/stddev_samp null there) and an
    // all-null group
    val p2 = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_orderkey").as("k"),
      when(col("l_orderkey") % 3 === 0, lit(null)).otherwise(col("l_tax")).as("v"))
      .write.parquet(p2)
    identical(spark.read.parquet(p2).groupBy(col("k"))
      .agg(stddev_samp(col("v")), var_samp(col("v")), var_pop(col("v"))))
  }

  test("sum(long) overflow: ANSI raises ARITHMETIC_OVERFLOW, legacy wraps") {
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").limit(100).select(col("l_returnflag").as("k"),
      lit(Long.MaxValue / 10).as("v")).write.parquet(p)
    def q = spark.read.parquet(p).groupBy(col("k")).agg(sum(col("v")))
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val e = intercept[Exception] { q.collect() }
    def classOfChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Seq(x.getClass.getName, Option(x.getMessage).getOrElse("")))
        .toSeq
    assert(classOfChain(e).exists(s =>
      s.contains("ARITHMETIC_OVERFLOW") || s.contains("SparkArithmeticException")),
      s"expected Spark's overflow error, got: ${classOfChain(e).mkString(" | ")}")
    // legacy: both the built-in and the tier wrap silently and agree
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try identical(q)
    finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("md5-binary expression key (exact-dedup shape): identical and rewrites") {
    // the full operator, oracle-shaped output (digest key dropped)
    identical(graft.pipeline.Dedup.exact(pq("documents")))
    // nullable text: null keys group together on both paths
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("documents").select(col("doc_id"),
      when(col("doc_id") % 13 === 0, lit(null)).otherwise(col("text")).as("text"))
      .write.parquet(p)
    identical(graft.pipeline.Dedup.exact(spark.read.parquet(p)))
    // the digest BYTES the tier emits must equal the built-in's — not
    // just induce the same groups (a consistent-but-wrong digest would
    // pass every key-dropped comparison); hex() atop the aggregate
    // output makes the binary key row-comparable
    identical(pq("documents")
      .groupBy(graft.functions.GraftFunctions.md5Binary(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("copies"))
      .select(hex(col("h")).as("hx"), col("doc_id"), col("copies")))
    // and the rewrite actually fires on the raw groupBy(md5_bin) shape
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = pq("documents")
      .groupBy(graft.functions.GraftFunctions.md5Binary(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("copies"))
      .select(col("doc_id"), col("copies"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "md5-binary key shape should rewrite")
    // md5 over a COMPUTED string (not a scan attribute) must decline
    val df2 = pq("documents")
      .groupBy(graft.functions.GraftFunctions.md5Binary(lower(col("text"))).as("h"))
      .agg(count(lit(1)))
    df2.collect()
    assert(!df2.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "md5 of a computed string must keep the built-in operator")
  }

  test("md5-binary keys over a DV delta scan (deleted rows excluded from digests)") {
    // combines two tier features: deletion-vector row filtering in the
    // scan's emitted batches and the kind-2 digest key path over them
    val p = Fixtures.delta(spark, sfDir, "lineitem", Fixtures.Dv)
    identical(spark.read.format("graftdelta").load(p)
      .groupBy(graft.functions.GraftFunctions.md5Binary(col("l_returnflag")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("mk"))
      .select(col("n"), col("mk")))
  }

  test("md5-binary keys survive table overflow flushes") {
    val prev = System.getProperty("graft.columnar.agg.maxGroups")
    System.setProperty("graft.columnar.agg.maxGroups", "64")
    try {
      // ~unique digests >> 64 → many lazy flushes; stored digests are
      // copies so flushed rows must stay intact after the table resets
      identical(graft.pipeline.Dedup.exact(pq("documents")))
      // digest bytes across flush boundaries, not just group identity
      identical(pq("documents")
        .groupBy(graft.functions.GraftFunctions.md5Binary(col("text")).as("h"))
        .agg(count(lit(1)).as("copies"))
        .select(hex(col("h")).as("hx"), col("copies")))
    } finally {
      if (prev == null) System.clearProperty("graft.columnar.agg.maxGroups")
      else System.setProperty("graft.columnar.agg.maxGroups", prev)
    }
  }

  test("literal-on-left comparisons compile (swapped operands, flipped comparator)") {
    // 5 < x shapes that Catalyst does not normalize
    identical(pq("lineitem").where(lit(10.0) < col("l_quantity"))
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")), count(lit(1))))
    identical(pq("lineitem").where(lit(25.0) >= col("l_quantity"))
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")), count(lit(1))))
    identical(pq("lineitem").where(lit(3000L) > col("l_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1))))
    identical(pq("lineitem").where(lit("A") === col("l_returnflag"))
      .groupBy(col("l_linestatus")).agg(count(lit(1))))
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = pq("lineitem").where(lit(10.0) < col("l_quantity"))
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "literal-on-left numeric filter should still rewrite")
  }

  test("SortAggregate source: order-sensitive double aggs decline (scan-order peel)") {
    // min(string) forces a SortAggregate; mixing in sum(double) would make
    // the tier accumulate doubles in scan order where the built-in
    // accumulates post-sort — byte-identity is only guaranteed for
    // order-insensitive aggregates, so this shape must keep the built-in
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"), col("l_linestatus").as("s"),
      col("l_quantity").as("v")).write.parquet(p)
    val mixed = spark.read.parquet(p).groupBy(col("k"))
      .agg(min(col("s")), sum(col("v")))
    mixed.collect()
    assert(!mixed.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "sum(double) under a peeled SortAggregate must decline")
    identical(spark.read.parquet(p).groupBy(col("k")).agg(min(col("s")), sum(col("v"))))
    // order-insensitive companions (count, integral sum, min/max) still rewrite
    val ok = spark.read.parquet(p).groupBy(col("k"))
      .agg(min(col("s")), max(col("s")), count(lit(1)), max(col("v")))
    ok.collect()
    assert(ok.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "order-insensitive aggs under SortAggregate should still rewrite")
    identical(spark.read.parquet(p).groupBy(col("k"))
      .agg(min(col("s")), max(col("s")), count(lit(1)), max(col("v"))))
  }

  test("avg over int and long columns (Cast path) is identical and fires") {
    // Average over an integral column plans as Average(Cast(col as double));
    // compile() strips the Cast and reads the int/long vector as double —
    // exactly the built-in's update order, so results are byte-identical
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("lineitem").select(col("l_returnflag").as("k"),
      (col("l_orderkey") % 1000).cast("int").as("iv"),
      col("l_orderkey").as("lv")).write.parquet(p)
    identical(spark.read.parquet(p).groupBy(col("k"))
      .agg(avg(col("iv")), avg(col("lv")), count(lit(1))))
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = spark.read.parquet(p).groupBy(col("k"))
      .agg(avg(col("iv")), avg(col("lv")))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "avg(int)/avg(long) should rewrite via the Cast path")
  }

  test("first/last decline the rewrite (order-dependent semantics)") {
    // First/Last depend on encounter order, which the tier does not
    // preserve across its open-addressing table and flush boundaries —
    // the catch-all decline must keep the built-in aggregate
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = pq("lineitem").groupBy(col("l_returnflag"))
      .agg(first(col("l_quantity")), count(lit(1)))
    df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "first() must decline the columnar rewrite")
  }

  test("xxhash64 expression keys: identical groups (incl. null→seed) and fires") {
    // groupBy(xxhash64(text)): the 64-bit hash IS the grouping value; the
    // tier computes it with the same XXH64.hashUTF8String the built-in
    // uses, so groups (and any collisions) are identical. A null input
    // hashes to the SEED — XxHash64 is never null — which the identity
    // over nulled-out rows pins.
    val p = java.nio.file.Files.createTempDirectory("graft-colagg").toString + "/t"
    pq("documents").select(
      when(col("doc_id") % 13 === 0, lit(null)).otherwise(col("text")).as("text"),
      col("doc_id")).write.parquet(p)
    identical(spark.read.parquet(p).groupBy(xxhash64(col("text")).as("h"))
      .agg(min(col("doc_id")), count(lit(1))))
    spark.conf.set("spark.graft.columnar.partialAgg", "true")
    val df = spark.read.parquet(p).groupBy(xxhash64(col("text")).as("h"))
      .agg(min(col("doc_id")), count(lit(1)))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "xxhash64 key should rewrite into the tier")
    // multi-child xxhash64 declines (seed threads through both children)
    val multi = spark.read.parquet(p)
      .groupBy(xxhash64(col("text"), col("doc_id")).as("h")).agg(count(lit(1)))
    multi.collect()
    assert(!multi.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"),
      "multi-child xxhash64 must keep the built-in project")
    identical(spark.read.parquet(p)
      .groupBy(xxhash64(col("text"), col("doc_id")).as("h")).agg(count(lit(1))))
  }

  test("xxhash64 keys over a DV delta scan and across overflow flushes") {
    // deleted rows must not be hashed; hash keys stored at flush must
    // survive the table reset (the long is copied by value, but the
    // slot bookkeeping is shared with every other kind)
    val p = Fixtures.delta(spark, sfDir, "lineitem", Fixtures.Dv)
    identical(spark.read.format("graftdelta").load(p)
      .groupBy(xxhash64(col("l_returnflag")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("mk")))
    val prev = System.getProperty("graft.columnar.agg.maxGroups")
    System.setProperty("graft.columnar.agg.maxGroups", "64")
    try identical(graft.pipeline.Dedup.exactByHash64(pq("documents")))
    finally {
      if (prev == null) System.clearProperty("graft.columnar.agg.maxGroups")
      else System.setProperty("graft.columnar.agg.maxGroups", prev)
    }
  }

  test("kill-switch disables the rewrite") {
    spark.conf.set("spark.graft.columnar.partialAgg", "false")
    try {
      val df = pq("lineitem")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
      df.collect()
      assert(!df.queryExecution.executedPlan.toString.contains("GraftColumnarPartialAgg"))
    } finally spark.conf.set("spark.graft.columnar.partialAgg", "true")
  }
}

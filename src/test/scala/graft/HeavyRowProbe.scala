package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Stage decomposition for the two heaviest full-suite bench rows
  * (dedup_jaccard_pairs ~3.2 s, dedup_minhash_pairs ~3.1 s at sf0.1):
  * times each pipeline stage against the noop sink (guide §1.4) so the
  * totals can be attributed to scan/shingle, aggregate, candidate join, or
  * verify.
  *
  * r19 findings (numbers in OPTIMIZATION_r19.md):
  * - jaccard: the candidate stage (self-join + pair distinct) is the
  *   dominant cost, and the pair DISTINCT dominates inside it — a
  *   posting-list rewrite (df count + collect_set(doc_id) in one
  *   aggregation, C(df,2) pairs expanded in place) removed two shuffles of
  *   the shingle table but won nothing locally (interleaved same-window
  *   A/B over 4 rounds: old 3.39–3.91 s vs new 3.33–4.26 s) because the
  *   higher-order-function expansion (transform/slice lambdas are
  *   interpreted, not codegen'd) costs what the join machinery saves.
  *   REVERTED; the pair-multiset shuffle into distinct is the floor.
  * - minhash: the 32-way min-md5 aggregate is the dominant cost (~1.2 s of
  *   the 1.7–2.0 s sig+set aggregate; the same aggregate without the md5
  *   mins is 0.43 s). A single multi-hash native expression producing
  *   array<string> of all 32 hex digests (one input read, thread-local
  *   digest, no per-hash concat) measured ~20% SLOWER end-to-end
  *   (interleaved A/B: old 1.96–2.18 s vs new 2.31–2.64 s): materializing
  *   a 32-element string array across the project→aggregate row boundary
  *   costs more than the per-hash expression dispatch it removes — the
  *   builtin-shaped chain already runs on the thread-local digest
  *   (Dedup.md5 shadows functions.md5 with GraftMd5Hex). REVERTED; the 32
  *   digest computations per shingle are the floor.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.HeavyRowProbe" */
object HeavyRowProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    RelationalQueries.ensureViews(spark, dir)
    val docs = spark.table("documents")

    def time(label: String, df: => DataFrame, rounds: Int = 2): Double = {
      spark.sparkContext.setJobDescription(s"probe: $label")
      var best = Double.MaxValue
      for (_ <- 0 until rounds) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[probe] $label%-34s $best%7.3f s (best of $rounds)")
      best
    }

    // --- dedup_jaccard_pairs stages ---
    val sh = Dedup.shingles(docs)
    val hsh = sh.select(col("doc_id"), xxhash64(col("s")).as("s"))
    time("jaccard: shingles", sh)
    time("jaccard: hashed shingles", hsh)
    val cold = hsh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df") <= 100).select(col("s"))
    time("jaccard: df filter (index)", cold)
    val shc = hsh.join(cold, Seq("s"))
    val cands = shc.as("a").join(shc.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    time("jaccard: candidates (distinct)", cands)
    val ss = sh.groupBy(col("doc_id")).agg(sort_array(collect_set(col("s"))).as("ss"))
    time("jaccard: shingle sets", ss)
    time("jaccard: FULL", Dedup.jaccardPairsDfCapped(docs))

    // --- dedup_minhash_pairs stages ---
    val mins = (0 until 32).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")))).as(s"mh_$i"))
    val aggs = mins :+ sort_array(collect_set(xxhash64(col("s")))).as("ss")
    val sigAndSet = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    time("minhash: sig+set aggregate", sigAndSet)
    val setOnly = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(xxhash64(col("s")))).as("ss"))
    time("minhash: set-only aggregate", setOnly)
    time("minhash: FULL", Dedup.minhashPairs(docs))
    spark.stop()
  }
}

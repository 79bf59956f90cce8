package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators a large-scale training-data pipeline needs
 * beyond dedup/similarity: sliding-window chunking, benchmark
 * decontamination, token-budget sharding and unigram-LM surprisal
 * scoring. All are oracle-checked (DuckDB re-derives every row) and all
 * are constant-shuffle-count plans:
 *
 * - chunking: per-row generate+explode, shuffle-free until the final
 *   order;
 * - decontamination: the benchmark n-gram set is orders smaller than the
 *   corpus, so it broadcasts — the corpus is scanned once and never
 *   shuffled (at larger benchmark sizes, put a bloom filter of the
 *   benchmark set in front of the same join);
 * - sharding: the classic two-level distributed prefix sum — parallel
 *   windows inside coarse doc_id buckets plus one tiny bucket-prefix
 *   table (|corpus|/bucketSize rows) that broadcasts back;
 * - surprisal: two token aggregates (per-doc tf and the vocab count —
 *   vocab is orders smaller than the corpus) and one broadcast join.
 */
object Curation {

  /** Distinct word-`n`-gram strings per doc: (doc_id, s). Short docs
    * (< n tokens) contribute nothing: concat_ws drops the null
    * out-of-range accesses, and the word-count guard rejects the
    * resulting short string. */
  def wordNgrams(docs: DataFrame, n: Int): DataFrame = {
    val parts = (0 until n).map(j => s"t[i+$j]").mkString(", ")
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, greatest(size(t)-$n, 0)), " +
          s"i -> concat_ws(' ', $parts)))")).as("s"))
      .where(size(split(col("s"), " ")) === n)
  }

  /**
   * Sliding-window character chunking: window `size` chars, stride
   * `stride` (overlap = size - stride). Every doc yields
   * `(len - size + stride - 1) div stride + 1` chunks (min 1); the last
   * chunk may be short. Emits the chunk's md5 rather than its text so
   * downstream exact-dedup of chunks is a plain hash-group — and the
   * oracle result stays narrow.
   *
   * Per-row generate + explode: no shuffle until the caller aggregates.
   */
  def chunk(docs: DataFrame, size: Int = 120, stride: Int = 100): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        expr(s"(greatest(length(text)-$size, 0) + ${stride - 1}) div $stride + 1")
          .as("nc"))
      .select(col("doc_id"),
        explode(expr("sequence(0, nc - 1)")).as("chunk_id"), col("text"))
      .select(col("doc_id"), col("chunk_id"),
        graft.functions.GraftFunctions.md5(
          expr(s"substr(text, cast(chunk_id * $stride + 1 as int), $size)")).as("h"),
        expr(s"cast(length(substr(text, cast(chunk_id * $stride + 1 as int), $size)) as bigint)")
          .as("n"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /**
   * Benchmark decontamination: flag corpus docs sharing any word-`n`-gram
   * with the benchmark set (here: docs with doc_id % benchMod == 0 stand
   * in for a held-out eval set). Returns (doc_id, n_shared) for
   * contaminated NON-benchmark docs, n_shared = distinct shared n-grams.
   *
   * The benchmark n-gram set is tiny relative to the corpus (real eval
   * sets are ~MBs against TBs), so it is broadcast — the corpus-side
   * n-gram stream is scanned once, never shuffled; the per-doc count is
   * the only aggregation.
   */
  def decontaminate(docs: DataFrame, n: Int = 5, benchMod: Long = 31): DataFrame = {
    val ng = wordNgrams(docs, n)
    val bench = ng.where(col("doc_id") % benchMod === 0).select(col("s")).distinct()
    ng.where(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), "s")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /**
   * [[decontaminate]] with a Bloom-filter prefilter — the 100 TB shape.
   * A broadcast of the EXACT benchmark n-gram set is O(total string
   * bytes); at real benchmark sizes (10⁸ n-grams) that broadcast
   * dominates. Instead:
   *  1. the benchmark n-grams collapse into ONE Bloom filter blob
   *     (`BloomFilterAggregate` over xxhash64 — a few MB at any string
   *     volume; the same sketch Spark's runtime bloom join injects),
   *  2. corpus n-grams are prefiltered by codegen'd
   *     `BloomFilterMightContain` — a scan-side predicate, no join, no
   *     shuffle — leaving ~fpp·|corpus| survivors plus the true hits,
   *  3. survivors verify against the exact set with a SHUFFLED join (the
   *     exact set never passes through the driver), so false positives
   *     cost only verify work and the result is EXACT (same oracle as
   *     [[decontaminate]]).
   * The benchmark n-gram set is cached (it feeds the blob aggregation and
   * the verify join in the returned plan). Cache lifetime tracks the
   * RETURNED DataFrame: each invocation registers a weak reference whose
   * referent is the returned plan and which carries the bench DataFrame
   * strongly — while the caller can still execute the returned plan the
   * cache entry stays warm; once the caller drops it, the reference is
   * enqueued and reclaimed by a daemon blocking on the queue (plus a
   * drain at every invocation, belt and braces) — so even the LAST
   * invocation's entry unpersists shortly after its plan is GC'd, with
   * no further calls required. Live entries are therefore bounded by the
   * number of returned plans the caller still holds, each pinned only as
   * long as its session is anyway reachable through the caller's own
   * handle. A failure between persist and registration unpersists
   * eagerly on the error path.
   *
   * CALLER CONTRACT (cache lifetime): the weak ref tracks the EXACT
   * returned DataFrame object. Hold that handle while executing any
   * plan derived from it (`result.filter(...)` etc.) — deriving a
   * child and dropping the original lets GC enqueue the ref, and the
   * persisted bench set is unpersisted out from under the derived
   * plan. That is a CACHE loss, never a correctness loss (the lineage
   * recomputes), and reclaim timing is GC-dependent by design: eager
   * determinism would require an explicit release() on the public API,
   * which this deliberately avoids.
   * `expectedItems <= 0` (the default) sizes the
   * Bloom filter from a `bench.count()` over the already-cached set — a
   * fixed guess undersizes at real benchmark volumes (10⁸ n-grams),
   * driving fpp toward 1 and silently degrading the prefilter to a no-op.
   * The blob is ~1 byte/n-gram at the 3% default fpp (12 MB at 10⁷,
   * 120 MB at 10⁸ — still orders under the exact string set).
   */
  private val bloomRefQueue = new java.lang.ref.ReferenceQueue[DataFrame]()
  private class BenchCacheRef(returned: DataFrame, val bench: DataFrame)
    extends java.lang.ref.WeakReference[DataFrame](returned, bloomRefQueue)
  // strong set keeps the refs (and through them the bench handles)
  // reachable until their queue entry is drained
  private val liveBloomRefs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[BenchCacheRef]()

  private def reclaim(r: java.lang.ref.Reference[_ <: DataFrame]): Unit =
    r match {
      case b: BenchCacheRef =>
        // a stopped SparkContext makes unpersist throw — the blocks are
        // already gone then, so a failed unpersist needs no recovery
        try b.bench.unpersist(false) catch { case _: Exception => }
        liveBloomRefs.remove(b)
      case _ =>
    }

  /** Unpersist every bench cache whose returned plan has been GC'd. */
  private def drainBloomRefs(): Unit = {
    var r = bloomRefQueue.poll()
    while (r != null) { reclaim(r); r = bloomRefQueue.poll() }
  }

  // a daemon also blocks on the queue, so the LAST invocation's cache is
  // reclaimed when its plan drops even if decontaminateBloom is never
  // called again — without it that final entry (and its session, held
  // through the bench lineage) would stay pinned for the JVM lifetime
  private lazy val bloomReaper: Thread = {
    val t = new Thread(() => {
      var run = true
      while (run) {
        try reclaim(bloomRefQueue.remove())
        catch { case _: InterruptedException => run = false case _: Exception => }
      }
    }, "graft-bloom-cache-reaper")
    t.setDaemon(true)
    t.start()
    t
  }

  def decontaminateBloom(docs: DataFrame, n: Int = 5, benchMod: Long = 31,
      expectedItems: Long = 0L): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val ng = wordNgrams(docs, n)
    // cached: the benchmark lineage feeds BOTH the blob aggregation (runs
    // now) and the verify join in the returned plan — without the cache
    // the scan+tokenize+explode+distinct would run twice
    bloomReaper // ensure the reclaim daemon is running
    drainBloomRefs() // reclaim caches whose returned plans were dropped
    val bench = ng.where(col("doc_id") % benchMod === 0).select(col("s"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try decontaminateBloomBody(bench, ng, benchMod, expectedItems)
    catch { case e: Throwable =>
      // a failure before the cache-lifetime ref is registered (e.g. the
      // sizing count) would otherwise orphan the persisted entry forever
      try bench.unpersist(false) catch { case _: Exception => }
      throw e
    }
  }

  private def decontaminateBloomBody(bench: DataFrame, ng: DataFrame,
      benchMod: Long, expectedItems: Long): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val corpus = ng.where(col("doc_id") % benchMod =!= 0)
    // sizing pass doubles as the cache materializer: the blob agg and the
    // verify join both read the cached blocks it populates
    val nItems =
      if (expectedItems > 0) expectedItems
      else math.max(bench.count(), 4096L)
    // Spark silently CLAMPS BloomFilterAggregate to the runtime bloom-join
    // conf caps (4M items / 64M bits by default) — at 10⁸ n-grams that
    // clamp drives fpp toward 1 and the prefilter degrades to a no-op.
    // The raised caps (bounded at 2³¹ bits / 256 MB) are INVOCATION-LOCAL:
    // the blob aggregation runs on a cloneSession() fork whose isolated
    // SQLConf carries them — the same pattern DeltaWriter uses for variant
    // shredding — so a concurrent query on the caller's session never sees
    // raised caps and concurrent decontaminateBloom calls can't restore
    // each other's stale values. The fork shares sharedState, so the agg
    // still reads the cached `bench` blocks (cache lookup is by plan).
    val needBits = math.min(
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(nItems, 0.03),
      Int.MaxValue.toLong)
    val blob = {
      val aggSess = org.apache.spark.sql.GraftColumnBridge
        .cloneSession(bench.sparkSession)
      aggSess.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        math.max(nItems, 4000000L).toString)
      aggSess.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        math.max(needBits, 67108864L).toString)
      val blobCol = column(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          expression(xxhash64(col("s"))), nItems)
          .toAggregateExpression())
      org.apache.spark.sql.GraftColumnBridge.ofRows(aggSess,
          bench.agg(blobCol.as("bf")).queryExecution.logical)
        .head().getAs[Array[Byte]]("bf")
    }
    val mightContain = column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(blob,
          org.apache.spark.sql.types.BinaryType),
        expression(xxhash64(col("s")))))
    // verify join is SHUFFLED, not broadcast: at real benchmark sizes the
    // exact set is exactly what must never funnel through the driver —
    // the bloom already shrank the probe side to ~fpp·|corpus| + hits, so
    // both join inputs are one distributed pass
    val result = corpus.where(mightContain)
      .join(bench, "s")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_shared"))
      .orderBy(col("doc_id"))
    // cache lives exactly as long as the caller can still run `result`
    liveBloomRefs.add(new BenchCacheRef(result, bench))
    result
  }

  /**
   * Token-budget sharding: assign docs (in doc_id order) to contiguous
   * shards of ~`budget` whitespace tokens each — the standard layout step
   * before writing training shards. shard(doc) = tokensBefore(doc) div
   * budget, where tokensBefore is the exclusive prefix sum in doc_id
   * order.
   *
   * A naive `Window.orderBy(doc_id)` global cumsum is a single-task
   * bottleneck; this is the two-level distributed prefix sum instead:
   * per-doc local cumsums run as parallel windows PARTITIONED by a coarse
   * doc_id bucket, and only the per-bucket totals (|corpus|/bucketSize
   * rows) pass through one tiny ordered window before broadcasting back.
   * Returns the per-shard summary (shard, n_docs, toks, first_doc,
   * last_doc).
   */
  def shardByTokenBudget(docs: DataFrame, budget: Long = 2000,
      bucketSize: Long = 100): DataFrame = {
    val perDoc = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("nt"),
      expr(s"doc_id div $bucketSize").as("bucket"))
    val localW = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = perDoc.withColumn("bef_local",
      coalesce(sum(col("nt")).over(localW), lit(0L)))
    val bucketW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = perDoc.groupBy(col("bucket")).agg(sum(col("nt")).as("bt"))
      .withColumn("bef_bucket", coalesce(sum(col("bt")).over(bucketW), lit(0L)))
      .select(col("bucket"), col("bef_bucket"))
    local.join(broadcast(prefixes), "bucket")
      .select(col("doc_id"), col("nt"),
        expr(s"(bef_local + bef_bucket) div $budget").as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("toks"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"))
  }

  /**
   * Repetition-ratio quality filter (the Gopher-rules style "fraction of
   * tokens in the most frequent n-gram" signal): flags docs whose single
   * most frequent word-bigram accounts for ≥ 1/20 of all bigram
   * occurrences (docs with < `minBigrams` bigrams are skipped — a
   * 10-token doc trivially "repeats"). Integer-only threshold, so the
   * flag set is engine-portable. Two doc-keyed aggregations, both
   * map-side combined — linear at corpus scale.
   */
  def repetitionFlags(docs: DataFrame, minBigrams: Long = 20): DataFrame =
    wordNgrams2WithMultiplicity(docs)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_n"), sum(col("c")).as("total_n"))
      .where(col("top_n") * 20 >= col("total_n") && col("total_n") >= minBigrams)
      .orderBy(col("doc_id"))

  /** Word bigrams WITH multiplicity (repetition needs counts, unlike the
    * distinct shingles dedup uses). */
  private def wordNgrams2WithMultiplicity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, greatest(size(t)-2, 0)), " +
          "i -> concat_ws(' ', t[i], t[i+1]))")).as("b"))
      .where(size(split(col("b"), " ")) === 2)

  /**
   * Unigram-LM surprisal per document: Σ over token occurrences of
   * -ln p(token) under the corpus unigram model — the classic cheap
   * quality/outlier score (high = rare-token-heavy docs). The per-word
   * log is integer-quantized (floor(ln(T/c)·1000)) BEFORE the per-doc
   * sum, so every accumulation is exact 64-bit and the score is
   * engine-portable bit-for-bit.
   *
   * The corpus total T is a single driver scalar (one count). The vocab
   * count table gets NO broadcast hint: a web-scale corpus has billions
   * of unique tokens, so a forced broadcast is a driver OOM — the join
   * shuffles on `token` (both sides are already token-keyed aggregates)
   * and AQE still picks broadcast when the vocab is actually small.
   */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("token"))
      .where(length(col("token")) > 0)
    val counts = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c"))).collect()(0).getLong(0)
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    tf.join(counts, "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") *
        floor(log(lit(total.toDouble) / col("c")) * 1000).cast("long"))
        .as("surprisal"))
      .orderBy(col("doc_id"))
  }

  /**
   * Composed curation verdict — the end-to-end corpus filter a training
   * pipeline runs: keep a doc unless it is a near-duplicate (non-canonical
   * member of a Jaccard cluster), benchmark-contaminated, repetitive, or
   * too short. Every signal is one of the oracle-checked operators in
   * this package, so the composition is engine-reproducible end to end.
   * Returns (doc_id, keep, reasons) with reasons a fixed-order CSV.
   *
   * The flag sets are NOT broadcast: each is a doc-id subset that is
   * corpus-proportional in the worst case (a mostly-short or
   * high-duplication corpus — exactly what curation exists to filter), so
   * a forced broadcast is a driver OOM at 100 TB. Instead the four sets
   * union into one (doc_id, r) stream, aggregate ONCE by doc_id into the
   * four flags (map-side combined — each source emits at most one row per
   * doc), and a single plain left join attaches them; AQE still broadcasts
   * the aggregated flag table when it is actually small.
   */
  def verdict(docs: DataFrame, minChars: Long = 50): DataFrame = {
    val short = docs.where(col("n_chars") < minChars)
      .select(col("doc_id"), lit("short").as("r"))
    val rep = repetitionFlags(docs).select(col("doc_id"), lit("rep").as("r"))
    val dup = Dedup.canonicalize(Dedup.jaccardPairsDfCapped(docs))
      .where(col("keep_id") =!= col("doc_id"))
      .select(col("doc_id"), lit("dup").as("r"))
    val contam = decontaminate(docs)
      .select(col("doc_id"), lit("contam").as("r"))
    val flags = dup.unionByName(contam).unionByName(rep).unionByName(short)
      .groupBy(col("doc_id"))
      .agg(max(col("r") === "dup").as("f_dup"),
        max(col("r") === "contam").as("f_contam"),
        max(col("r") === "rep").as("f_rep"),
        max(col("r") === "short").as("f_short"))
    val reasons = concat_ws(",",
      when(col("f_dup"), "dup"), when(col("f_contam"), "contam"),
      when(col("f_rep"), "rep"), when(col("f_short"), "short"))
    docs.select(col("doc_id"))
      .join(flags, Seq("doc_id"), "left")
      .select(col("doc_id"), (reasons === "").as("keep"), reasons.as("reasons"))
      .orderBy(col("doc_id"))
  }
}

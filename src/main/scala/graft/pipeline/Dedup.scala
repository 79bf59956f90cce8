package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Deduplication operators over the `documents` table: exact (hash-group),
 * exact-normalized, n-gram Jaccard, MinHash+LSH and SimHash near-dup.
 *
 * Scale design (100 TB): every operator is a constant number of shuffles
 * keyed on content hashes / shingles / band buckets — no driver-side
 * loops, no all-pairs materialization. MinHash bands turn the quadratic
 * candidate space into |bucket|² within hash buckets only; SimHash
 * chunk-match does the same for hamming-distance candidates.
 */
object Dedup {

  /** Exact dedup: one surviving doc_id per distinct text (md5 key). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("copies"))
      .select(col("doc_id"), col("copies"))
      .orderBy(col("doc_id"))

  /** Exact dedup after normalization (lowercase, collapsed whitespace). */
  def exactNormalized(docs: DataFrame): DataFrame =
    docs.groupBy(md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("copies"))
      .select(col("doc_id"), col("copies"))
      .orderBy(col("doc_id"))

  /** Distinct word-3-gram shingles per doc: (doc_id, s). */
  def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, greatest(size(t)-3, 0)), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))")).as("s"))
      .where(col("s") =!= "")

  /** Shingles under a 64-bit hash key: narrower shuffle + cheaper join
    * comparisons than raw strings (collision odds ~2^-64 per pair —
    * the standard trade at corpus scale). */
  private def hashedShingles(docs: DataFrame): DataFrame =
    shingles(docs).select(col("doc_id"), xxhash64(col("s")).as("s"))

  /**
   * Exact n-gram Jaccard similar pairs with J ≥ 2/7, via inverted-index
   * join on shingles (integer-only threshold test: 7·|∩| ≥ 2·|∪| — no
   * float boundary risk against the oracle).
   */
  def jaccardPairs(docs: DataFrame): DataFrame = {
    val sh = hashedShingles(docs)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("sa.sz") + col("sb.sz") - col("inter")).as("uni"))
      .where(col("inter") * 7 >= col("uni") * 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Per-doc MinHash signature: `numHashes` min-hashes over shingles.
    * One aggregation, signatures live as an array column. */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 32): DataFrame = {
    val sh = hashedShingles(docs)
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"mh_$i"))
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /**
   * MinHash+LSH near-dup candidates, exact-verified: band the signature
   * (bandSize rows per band), bucket-join on (band, bandHash), then verify
   * candidates with exact Jaccard ≥ 2/7. Probabilistic recall, exact
   * precision (reported pairs are all true pairs).
   */
  def minhashPairs(docs: DataFrame, numHashes: Int = 32, bandSize: Int = 4): DataFrame = {
    val sig = minhashSignatures(docs, numHashes)
    val numBands = numHashes / bandSize
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until numBands).map(b =>
        hash((b * bandSize until (b + 1) * bandSize).map(i => col("sig")(i)): _*)): _*))
        .as(Seq("band", "bh")))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact verification against per-doc shingle SETS (array_intersect per
    // candidate pair) — two hash-joins moving one array per doc, instead of
    // re-exploding shingles into |pairs|·|shingles| rows
    val sets = hashedShingles(docs).groupBy(col("doc_id"))
      .agg(collect_set(col("s")).as("ss"))
    cands
      .join(sets.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sa.ss"), col("sb.ss"))).cast("long").as("inter"),
        (size(col("sa.ss")) + size(col("sb.ss"))).cast("long").as("szsum"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("szsum") - col("inter")).as("uni"))
      .where(col("inter") * 7 >= col("uni") * 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  /**
   * Cluster canonicalization: map every doc in a near-dup pair graph to
   * its cluster representative (min doc_id), by iterative min-label
   * propagation over the pair edges — `iters` rounds of join+min, fully
   * distributed (the bounded-depth stand-in for connected components;
   * near-dup clusters are shallow in practice).
   *
   * @param pairs (id_a, id_b) edges with id_a < id_b
   * @return (doc_id, keep_id): rows with doc_id != keep_id are the drop list
   */
  def canonicalize(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
    // symmetric neighbor list: (node, neighbor)
    val nbrs = edges.select(col("id_a").as("n"), col("id_b").as("m"))
      .union(edges.select(col("id_b").as("n"), col("id_a").as("m")))
    var labels = nbrs.select(col("n")).distinct()
      .select(col("n").as("doc_id"), col("n").as("keep_id"))
    for (_ <- 0 until iters) {
      // each node adopts the min label among itself and its neighbors
      val viaNbr = nbrs
        .join(labels, nbrs("m") === labels("doc_id"))
        .select(col("n").as("doc_id"), col("keep_id"))
      labels = labels.union(viaNbr)
        .groupBy(col("doc_id")).agg(min(col("keep_id")).as("keep_id"))
    }
    labels.orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ 3: pigeonhole on four
    * 16-bit chunks (any pair within distance 3 shares ≥ 1 exact chunk),
    * bucket-join per chunk, verify with bit_count. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val withSig = docs.select(col("doc_id"),
      TextOps.simhash(col("text")).as("sig"))
    val chunked = withSig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "cv")))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }
}

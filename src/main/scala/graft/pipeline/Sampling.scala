package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. Random sampling
 * (`df.sample`) is irreproducible across runs and engines; these operators
 * key every decision on a stable content hash (md5 of the row key) so the
 * SAME rows are selected on every run, on every engine, at every scale —
 * and a DuckDB oracle can re-derive the selection bit-for-bit.
 *
 * Scale notes (100 TB lens):
 *  - `deterministicSample` is a pure per-row filter — no shuffle, fully
 *    codegen'd, pushes through column pruning; selectivity is uniform
 *    because md5 is uniform on the key.
 *  - `stratifiedSample` caps rows PER LABEL. It ranks by hash within each
 *    label partition — Spark 4 rewrites `row_number <= n` into
 *    WindowGroupLimit, so each task keeps a bounded top-n heap and only
 *    n rows per label per partition reach the shuffle (no full sort of
 *    100 TB). Label cardinality bounds parallelism of the final rank, so
 *    labels are expected to be categorical (lang, source, quality tier),
 *    not high-cardinality ids.
 */
object Sampling {
  // Shadows functions.md5 with the thread-local-digest variant (identical
  // hex output; Spark's Md5 builds a MessageDigest per row via provider
  // reflection, which degrades badly in long-lived sessions).
  private def md5(c: Column): Column = graft.functions.GraftFunctions.md5(c)

  /** Stable bucket in [0, buckets): first 8 hex chars of md5(key) as an
    * unsigned int, mod buckets. Matches DuckDB
    * `CAST(('0x'||substr(md5(key),1,8)) AS BIGINT) % buckets`. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep ~pct% of rows, chosen by the key's hash bucket — shuffle-free,
    * reproducible, engine-portable. */
  def deterministicSample(df: DataFrame, key: Column, pct: Int,
      buckets: Int = 100): DataFrame = {
    require(pct >= 0 && pct <= buckets, s"pct must be in [0,$buckets]")
    df.filter(hashBucket(key, buckets) < pct)
  }

  /** At most `n` rows per label, selected in md5(key) order (a stable,
    * engine-portable shuffle of each stratum). */
  def stratifiedSample(df: DataFrame, label: Column, key: Column,
      n: Int): DataFrame = {
    val rank = row_number().over(
      Window.partitionBy(label).orderBy(md5(key.cast("string")), key))
    df.withColumn("_rk", rank).filter(col("_rk") <= n).drop("_rk")
  }
}

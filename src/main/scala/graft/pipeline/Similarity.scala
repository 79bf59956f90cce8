package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (`Array[Float]` column):
 * brute-force cosine top-k as the exact baseline, and a random-hyperplane
 * LSH-bucketed variant as the 100 TB scale path (candidates only within
 * matching/adjacent buckets instead of all-pairs).
 *
 * Cosine is computed with `zip_with`/`aggregate` built-ins in double
 * precision — stays inside codegen, no UDF serialization per row.
 */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k cosine neighbors of `queryId`'s vector (self excluded).
    * The query vector rides along via a broadcast single-row cross join —
    * one scan, no driver collect. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int = 10): DataFrame = {
    val q = emb.where(col("vec_id") === queryId)
      .select(asDouble(col("embedding")).as("qv"))
    emb.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(asDouble(col("embedding")), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** All similar pairs with cosine ≥ `minSim` within a bounded id block
    * (exact, used as oracle-checked baseline). */
  def pairsAboveThreshold(emb: DataFrame, maxId: Long, minSim: Double): DataFrame = {
    val e = emb.where(col("vec_id") < maxId)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 4).as("sim"))
      .where(col("sim") >= minSim)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Deterministic random hyperplanes (seeded) as literal columns. */
  private def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-projection LSH bucket id for a vector column. */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, lit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * LSH-bucketed approximate top-k: compare the query only against
   * vectors whose bucket is within hamming distance 1 of the query's
   * bucket (multi-probe). At scale the bucket column is a cheap
   * pre-computed partition key; candidate count ≈ n · (numPlanes+1) / 2^numPlanes.
   */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int = 10,
      numPlanes: Int = 6, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, 64, seed)
    val withBucket = emb.select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val q = withBucket.where(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("bucket").as("qb"))
    withBucket.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .where(bit_count(col("bucket").bitwiseXOR(col("qb"))) <= 1)
      .select(col("vec_id"),
        round(cosine(col("v"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-label centroid, one row per (label, dimension). */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("label"), (col("pos") + 1).as("i"))
      .agg(round(avg(col("x")), 4).as("v"))
      .orderBy(col("label"), col("i"))
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic scale-up of the driver testdata: replicate the sf0.1 fact
 * tables `factor`× with per-replica key offsets (join relationships
 * preserved; dims stay as-is, giving the realistic 10× fan-in), cached
 * under /tmp. Purpose: a benchmark scale where per-query work dominates
 * the ~0.5-1s JVM floor that drowns the sf0.1 signal (VERDICT r2: "until
 * it does, this ratio measures JVM floor, not the engine").
 */
object SyntheticScale {
  private val GEN = "s2" // s2: replicas coalesced into few well-sized files

  /** Build (once) and return a parquet dir shaped like the driver's sfN
    * dirs, containing `factor`× the base data. With `replicateOnly`, only
    * the named fact tables replicate; every other table is written at base
    * size (a cheap targeted dir for sampling a few queries at a scale the
    * full corpus would make expensive to generate). */
  def ensure(spark: SparkSession, baseDir: String, factor: Int,
      replicateOnly: Option[Set[String]] = None): String = synchronized {
    val key = baseDir.stripSuffix("/").replaceAll("[^A-Za-z0-9.]", "_")
    // the targeted-dir name encodes WHICH tables replicate: growing the
    // micro-sample's table set must build a new dir, not silently reuse a
    // cached one that lacks the new fact tables at scale
    val sub = replicateOnly.map(s => s"_min${s.size}-" +
      Integer.toHexString(s.toSeq.sorted.mkString(",").hashCode).take(4))
      .getOrElse("")
    val dir = s"/tmp/graft-scale/$GEN/${key}_x$factor$sub"
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) return dir
    val dirPath = Paths.get(dir)
    if (Files.exists(dirPath)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dirPath).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    Files.createDirectories(dirPath)

    def base(t: String): DataFrame = Fixtures.readNormalized(spark, baseDir, t)
    def offsetOf(t: String, k: String): Long =
      base(t).agg(max(col(k))).collect()(0).getLong(0) + 1
    val ordOff = offsetOf("orders", "o_orderkey")
    val custOff = offsetOf("customer", "c_custkey")
    val docOff = offsetOf("documents", "doc_id")
    val vecOff = offsetOf("embeddings", "vec_id")
    val evOff = offsetOf("events", "event_id")

    /** factor replicas with the given key columns shifted per replica.
      * Output is coalesced into a few well-sized files — a union of
      * factor× the source's partitioning otherwise emits dozens of tiny
      * parquet files whose per-task/open overhead is what gets measured,
      * not the engine (same small-file problem OPTIMIZE exists to fix). */
    def replicate(t: String, shifts: Map[String, Long], files: Int = 4): Unit = {
      if (replicateOnly.exists(!_.contains(t))) {
        base(t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
        return
      }
      val src = base(t)
      val reps = (0 until factor).map { i =>
        shifts.foldLeft(src) { case (df, (c, off)) =>
          df.withColumn(c, col(c) + lit(i * off))
        }
      }
      reps.reduce(_ union _).coalesce(files).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    replicate("lineitem", Map("l_orderkey" -> ordOff), files = 8)
    replicate("orders", Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
    replicate("customer", Map("c_custkey" -> custOff))
    replicate("documents", Map("doc_id" -> docOff))
    replicate("embeddings", Map("vec_id" -> vecOff))
    replicate("events", Map("event_id" -> evOff))
    // dims unreplicated: every replica's facts reference the same dims
    Seq("part", "supplier", "nation", "region").foreach { t =>
      base(t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    Files.createFile(marker)
    dir
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with typed
 * metadata, processed batch-wise with `mapPartitions` (the Scala analog of
 * `mapInPandas`: iterator-of-batches shape, executor-side, no
 * driver collect).
 *
 * The actual codec decode is STUBBED (`decodeStub`) — no image/audio
 * libraries ship in this environment — but everything Spark-side is real:
 * schema, binary payloads, batched iteration, partitioning, and the
 * feature-extraction contract.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic synthetic payload per doc: xorshift byte stream seeded
    * by doc_id (stands in for real image/audio bytes). */
  def syntheticMedia(docId: Long): Array[Byte] = {
    val len = 256 + (docId % 128).toInt
    val out = new Array[Byte](len)
    var s = docId * 0x9E3779B97F4A7C15L + 1
    var i = 0
    while (i < len) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      out(i) = (s & 0xff).toByte
      i += 1
    }
    out
  }

  /** Attach a synthetic media column + metadata to the documents table
    * (executor-side generation — the binary payloads never hit the driver). */
  def withMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.map { r =>
      val id = r.getLong(0)
      Row(id, syntheticMedia(id),
        Row("fake/raw", 16 + (id % 16).toInt, 16 + (id % 8).toInt))
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /**
   * STUB decode: a real deployment would decode image/audio here
   * (codec library call). The deterministic fake extracts a byte
   * histogram + mean so the full pipeline is testable end-to-end.
   */
  private def decodeStub(media: Array[Byte]): (Array[Long], Double) = {
    // ??? <- real codec goes here (e.g. JPEG decode → pixel tensor)
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < media.length) {
      val b = media(i) & 0xff
      hist(b >> 4) += 1
      sum += b
      i += 1
    }
    (hist, if (media.length == 0) 0.0 else sum.toDouble / media.length)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_len", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Batched feature extraction over the media column: mapPartitions with
    * an explicit batch size — the `mapInPandas` contract (iterator of
    * batches in, iterator of batches out), executor-parallel. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("media")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch-shaped processing: real codecs amortize setup per batch
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val (hist, mean) = decodeStub(bytes)
            Row(id, bytes.length, math.rint(mean * 100) / 100, hist.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** End-to-end: documents → media → features, ordered for determinism. */
  def mediaFeatures(docs: DataFrame): DataFrame =
    extractFeatures(withMedia(docs))
      .select(col("doc_id"), col("media_len"), col("mean_byte"),
        col("hist")(0).as("hist0"), col("hist")(15).as("hist15"))
      .orderBy(col("doc_id"))
}

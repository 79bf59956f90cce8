package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with typed
 * metadata, processed batch-wise with typed `mapPartitions` (the Scala
 * analog of `mapInPandas`: iterator-of-batches shape, executor-side, no
 * driver collect). Dataset + Encoder transformations throughout — the
 * plan stays Catalyst-visible (pushdown/AQE apply) with only the codec
 * boundary crossing an object-serialization fence, instead of dropping
 * the whole subtree to an untyped RDD.
 *
 * The actual codec decode is STUBBED (`decodeStub`) — no image/audio
 * libraries ship in this environment — but everything Spark-side is real:
 * schema, binary payloads, batched iteration, partitioning, and the
 * feature-extraction contract.
 *
 * Payload bytes are an md5 chain (block k of doc d = md5("d:k")), so the
 * synthetic bytes — and therefore every extracted feature — are
 * reproducible by any engine with md5() (the DuckDB oracle re-derives
 * them from hex chars).
 */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int)
  case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)
  case class MediaFeatureRow(
      doc_id: Long, media_len: Long, mean_byte_x100: Long, hist: Seq[Long])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic synthetic payload per doc: concatenated md5 digests of
    * "docId:blockIndex", truncated to 256 + docId % 128 bytes (stands in
    * for real image/audio bytes). Digest goes through [[graft.functions
    * .GraftMd5Hex]]'s thread-local instance — never a per-row
    * `MessageDigest.getInstance` provider lookup. */
  def syntheticMedia(docId: Long): Array[Byte] = {
    val len = 256 + (docId % 128).toInt
    val out = new Array[Byte](len)
    var off = 0
    var blk = 0
    while (off < len) {
      val d = graft.functions.GraftMd5Hex.digestBytes(
        s"$docId:$blk".getBytes("UTF-8"))
      val n = math.min(16, len - off)
      System.arraycopy(d, 0, out, off, n)
      off += n
      blk += 1
    }
    out
  }

  /** Attach a synthetic media column + metadata to the documents table
    * (executor-side generation — the binary payloads never hit the driver). */
  def withMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, syntheticMedia(id),
        MediaMeta("fake/raw", 16 + (id % 16).toInt, 16 + (id % 8).toInt))
    }
  }

  /**
   * STUB decode: a real deployment would decode image/audio here
   * (codec library call). The deterministic fake extracts a byte
   * histogram + scaled integer mean so the full pipeline is testable
   * end-to-end with exact (integer) arithmetic.
   */
  private def decodeStub(media: Array[Byte]): (Array[Long], Long) = {
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
    (hist, if (media.length == 0) 0L else sum * 100 / media.length)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_len", LongType, nullable = false),
    StructField("mean_byte_x100", LongType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Batched feature extraction over the media column: typed mapPartitions
    * with an explicit batch size — the `mapInPandas` contract (iterator of
    * batches in, iterator of batches out), executor-parallel. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped processing: real codecs amortize setup per batch
        batch.iterator.map { r =>
          val (hist, meanX100) = decodeStub(r.media)
          MediaFeatureRow(r.doc_id, r.media.length.toLong, meanX100,
            hist.toIndexedSeq)
        }
      }
    }
  }

  /** End-to-end: documents → media → features, ordered for determinism. */
  def mediaFeatures(docs: DataFrame): DataFrame =
    extractFeatures(withMedia(docs))
      .select(col("doc_id"), col("media_len"), col("mean_byte_x100"),
        col("hist")(0).as("hist0"), col("hist")(15).as("hist15"))
      .orderBy(col("doc_id"))
}

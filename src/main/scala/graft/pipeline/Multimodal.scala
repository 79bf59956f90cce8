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
 * Decode status: the IMAGE (PPM/P6 raw + PNG/JPEG via the JDK's built-in
 * `javax.imageio` codecs), AUDIO (WAV/RIFF PCM — 8/16/24/32-bit, mono or
 * stereo) and VIDEO (Y4M/YUV4MPEG2 frame sampling) pipelines below are
 * REAL end to end — actual decoders feeding integer feature extraction,
 * oracle-checked pixel-/sample-exact for every lossless format (PNG
 * included: DEFLATE round-trips bits). JPEG decodes for real too but is
 * LOSSY, so it is covered by tolerance-banded spec assertions instead of
 * a hash-exact oracle (decoder variance across engines is expected).
 * Only formats with NO JVM-built-in codec (MP3/AAC/H.264) remain behind
 * `decodeStub`; the Spark-side plumbing (schema, binary payloads,
 * batched iteration, partitioning, feature contract) is shared and real
 * for all of them.
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
   * STUB decode for formats with no JVM-built-in codec (MP3/AAC/H.264 —
   * a real deployment links an external codec library for those; images
   * do NOT belong here anymore: PNG/JPEG/GIF/BMP/TIFF decode for real
   * through `javax.imageio`, see [[decodeImage]]). The deterministic
   * fake extracts a byte histogram + scaled integer mean so the full
   * pipeline is testable end-to-end with exact (integer) arithmetic.
   */
  private def decodeStub(media: Array[Byte]): (Array[Long], Long) = {
    // ??? <- external codec goes here (e.g. H.264 decode → frame tensor)
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

  // ------------------------------------------------------------------
  // REAL image decode: PPM (P6). The container ships no codec libraries,
  // so JPEG/PNG stay out of reach — but PPM is a real, widely-used image
  // format (netpbm) whose binary layout a pure-JVM parser handles
  // completely: magic, whitespace/comment-tolerant header, maxval, then
  // raw interleaved RGB. The pipeline below is the full multimodal shape
  // with NO stub anywhere: encode (synthetic but genuine PPM bytes) →
  // distributed batched DECODE → per-channel means + a nearest-neighbor
  // 4×4 thumbnail checksum, all integer-exact so the DuckDB oracle
  // re-derives every feature from the pixel formula — a wrong header
  // offset, channel de-interleave or sampling index fails the hash gate.
  // ------------------------------------------------------------------

  // all-BIGINT row: the oracle compare is type-faithful, so widths ride
  // as longs like every other oracle-facing integer column
  case class PpmFeatureRow(doc_id: Long, w: Long, h: Long,
      mean_r_x100: Long, mean_g_x100: Long, mean_b_x100: Long, thumb_sum: Long)

  /** Deterministic pixel channel value: pixel ordinal `p` (row-major),
    * channel `c` (0=R,1=G,2=B). Shared contract with the oracle SQL. */
  @inline private def pixelValue(docId: Long, p: Long, c: Int): Int =
    ((docId * 31 + p * 7 + c * 13) % 256).toInt

  /** A genuine P6 PPM image for `docId`: 16+(id%16) × 16+(id%8), maxval
    * 255, every 5th doc carries a header comment line (the part naive
    * parsers break on). */
  def syntheticPpm(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 16).toInt
    val h = 16 + (docId % 8).toInt
    val comment = if (docId % 5 == 0) "# synthetic netpbm fixture\n" else ""
    val header = s"P6\n$comment$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      body(p * 3) = pixelValue(docId, p, 0).toByte
      body(p * 3 + 1) = pixelValue(docId, p, 1).toByte
      body(p * 3 + 2) = pixelValue(docId, p, 2).toByte
      p += 1
    }
    val out = new Array[Byte](header.length + body.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(body, 0, out, header.length, body.length)
    out
  }

  /** REAL P6 decoder: returns (width, height, rgb bytes). Handles the
    * format's whitespace rules and `#` comments; rejects non-P6 magic,
    * maxval ≠ 255 and truncated payloads loudly. */
  def decodePpm(media: Array[Byte]): (Int, Int, Array[Byte]) = {
    var i = 0
    def die(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a P6 PPM: $msg")
    def skipWs(): Unit = {
      var in = true
      while (in && i < media.length) {
        val ch = media(i) & 0xff
        if (ch == '#') { while (i < media.length && media(i) != '\n') i += 1 }
        else if (ch == ' ' || ch == '\n' || ch == '\r' || ch == '\t') i += 1
        else in = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < media.length && media(i) >= '0' && media(i) <= '9') {
        v = v * 10 + (media(i) - '0'); i += 1; any = true
      }
      if (!any) die("expected integer in header")
      v
    }
    if (media.length < 2 || media(0) != 'P' || media(1) != '6') die("bad magic")
    i = 2
    val w = int()
    val h = int()
    val maxval = int()
    if (maxval != 255) die(s"unsupported maxval $maxval")
    // guard the raster-size arithmetic: absurd header dims must die here,
    // not wrap Int and slip a short raster past the truncation check
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue)
      die(s"implausible dimensions ${w}x$h")
    i += 1 // exactly ONE whitespace byte separates maxval from raster
    val need = w * h * 3
    if (media.length - i < need)
      die(s"truncated raster: have ${media.length - i}, need $need")
    val rgb = new Array[Byte](need)
    System.arraycopy(media, i, rgb, 0, need)
    (w, h, rgb)
  }

  // ------------------------------------------------------------------
  // REAL compressed-image decode: PNG + JPEG through the JDK's built-in
  // `javax.imageio` codecs (PNG/JPEG/GIF/BMP/TIFF readers ship with every
  // JDK — no external library). This is the format a training-data
  // pipeline's images actually arrive in. PNG is LOSSLESS (DEFLATE), so
  // decoded pixels are bit-exact against the generation formula and the
  // DuckDB oracle re-derives every feature — a wrong color-channel order,
  // row stride or alpha handling fails the hash gate. JPEG runs the same
  // encode→decode→features pipeline but is lossy; it is asserted at spec
  // level with tolerance bands (dims exact, per-channel means within a
  // few units), since bit-exactness across JPEG decoders is not a
  // guarantee any engine makes.
  // ------------------------------------------------------------------

  // all-BIGINT row (oracle compare is type-faithful)
  case class ImgFeatureRow(doc_id: Long, w: Long, h: Long,
      mean_r_x100: Long, mean_g_x100: Long, mean_b_x100: Long, edge_sum: Long)

  /** Deterministic pixel channel value for the compressed-image fixtures:
    * pixel ordinal `p` (row-major), channel `c` (0=R,1=G,2=B). Shared
    * contract with the oracle SQL (distinct constants from the PPM
    * formula so a cross-wired fixture cannot pass the wrong oracle). */
  @inline private def imgPixelValue(docId: Long, p: Long, c: Int): Int =
    ((docId * 23 + p * 5 + c * 17) % 256).toInt

  /** A genuine image file for `docId` in `format` ("png" or "jpg"):
    * 12+(id%12) × 12+(id%6), RGB pixels from [[imgPixelValue]], encoded
    * by the JDK's own writer — the decode path is then exercised against
    * real DEFLATE/DCT bitstreams, not hand-assembled bytes. */
  def syntheticImage(docId: Long, format: String): Array[Byte] = {
    val w = 12 + (docId % 12).toInt
    val h = 12 + (docId % 6).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      img.setRGB(p % w, p / w,
        (imgPixelValue(docId, p, 0) << 16) |
          (imgPixelValue(docId, p, 1) << 8) |
          imgPixelValue(docId, p, 2))
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for '$format'")
    bos.toByteArray
  }

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP/TIFF):
    * returns (width, height, packed ARGB row-major). Rejects undecodable
    * bytes loudly. Disk-caching is disabled once per JVM — executors must
    * never round-trip image streams through temp files. */
  def decodeImage(media: Array[Byte]): (Int, Int, Array[Int]) = {
    javax.imageio.ImageIO.setUseCache(false) // idempotent, executor-safe
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
    if (img == null)
      throw new IllegalArgumentException(
        "undecodable image: no ImageIO reader claimed the byte stream")
    val w = img.getWidth
    val h = img.getHeight
    // getRGB converts any underlying raster layout (palette, 3BYTE_BGR,
    // 16-bit …) to packed sRGB ints — one contract for every format
    (w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  /** documents → `format` payloads (executor-side encode) → batched REAL
    * ImageIO decode → integer features. mean_c_x100 = Σ channel · 100 /
    * (w·h); edge_sum = Σ over the top row and left column (the pixels a
    * stride or de-interleave bug displaces first) of r + 2g + 3b. */
  def imageFeatures(docs: DataFrame, format: String,
      batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { id =>
            val (w, h, argb) = decodeImage(syntheticImage(id, format))
            var sr = 0L; var sg = 0L; var sb = 0L
            var p = 0
            while (p < w * h) {
              val v = argb(p)
              sr += (v >> 16) & 0xff
              sg += (v >> 8) & 0xff
              sb += v & 0xff
              p += 1
            }
            def rgb123(p: Int): Long = {
              val v = argb(p)
              ((v >> 16) & 0xff) + 2L * ((v >> 8) & 0xff) + 3L * (v & 0xff)
            }
            var edge = 0L
            var x = 0
            while (x < w) { edge += rgb123(x); x += 1 } // top row (incl. p=0)
            var y = 1
            while (y < h) { edge += rgb123(y * w); y += 1 } // left column
            val n = (w * h).toLong
            ImgFeatureRow(id, w.toLong, h.toLong,
              sr * 100 / n, sg * 100 / n, sb * 100 / n, edge)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** PNG pipeline — lossless, oracle-exact. */
  def pngFeatures(docs: DataFrame): DataFrame = imageFeatures(docs, "png")

  /** Nearest-neighbor resize of a packed-ARGB raster: target pixel
    * (tx, ty) samples source pixel (tx·w/tw, ty·h/th) — integer floor,
    * the classic point-sampling kernel. Pure function so the oracle can
    * re-derive every resized pixel from the generation formula. */
  def resizeNearest(argb: Array[Int], w: Int, h: Int,
      tw: Int, th: Int): Array[Int] = {
    require(w > 0 && h > 0 && tw > 0 && th > 0, s"bad resize ${w}x$h -> ${tw}x$th")
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      val sy = ty * h / th
      var tx = 0
      while (tx < tw) {
        out(ty * tw + tx) = argb(sy * w + tx * w / tw)
        tx += 1
      }
      ty += 1
    }
    out
  }

  case class ResizeRow(doc_id: Long, rw: Long, rh: Long, rsum: Long)

  /** documents → PNG payloads → REAL decode → nearest-neighbor resize to
    * `tw`×`th` → integer checksum Σ(r + 2g + 3b) over the RESIZED raster.
    * The resize is the multimodal pipeline's standard normalization step
    * (every training image to one model input size); point sampling keeps
    * it integer-exact so the oracle re-derives each sampled source pixel
    * from the generation formula — an off-by-one in the sampling index
    * fails the hash gate. */
  def pngResize(docs: DataFrame, tw: Int = 8, th: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { id =>
            val (w, h, argb) = decodeImage(syntheticImage(id, "png"))
            val small = resizeNearest(argb, w, h, tw, th)
            var s = 0L
            var p = 0
            while (p < small.length) {
              val v = small(p)
              s += ((v >> 16) & 0xff) + 2L * ((v >> 8) & 0xff) + 3L * (v & 0xff)
              p += 1
            }
            ResizeRow(id, tw.toLong, th.toLong, s)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // REAL audio decode: WAV (RIFF PCM) — like PPM, a genuine container
  // format a pure-JVM parser handles completely: RIFF/WAVE magic, chunk
  // walk (unknown chunks SKIPPED, as real writers insert LIST/INFO
  // chunks), fmt validation, little-endian samples at 8/16/24/32 bits,
  // mono or stereo — the RIFF variants real pipelines actually hit.
  // Features are classic audio-curation signals in exact integers: total
  // absolute amplitude, peak, zero-crossing count.
  // ------------------------------------------------------------------

  case class WavFeatureRow(doc_id: Long, n_samples: Long, sum_abs: Long,
      peak: Long, zero_crossings: Long)

  /** Deterministic sample `i` for `docId`: a -2000..2000 16-bit PCM wave.
    * Shared contract with the oracle SQL. */
  @inline private def sampleValue(docId: Long, i: Long): Int =
    (((docId * 37 + i * 11) % 4001) - 2000).toInt

  /** A genuine 16-bit mono PCM WAV for `docId` (8 kHz, 256 + id%256
    * samples); every 3rd doc carries a LIST chunk between fmt and data —
    * the part naive offset-based parsers break on. */
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = 256 + (docId % 256).toInt
    val junk = if (docId % 3 == 0) 12 else 0 // "LIST" + size + 4 payload
    val dataBytes = n * 2
    val riffSize = 4 + (8 + 16) + junk + (8 + dataBytes)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(8000 * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    if (junk > 0)
      out.put("LIST".getBytes("US-ASCII")).putInt(4)
        .put("INFO".getBytes("US-ASCII"))
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) { out.putShort(sampleValue(docId, i).toShort); i += 1 }
    out.array()
  }

  /** Decoded PCM audio: `samples` is channel-interleaved (frame f,
    * channel c at index f·channels + c), values already centered —
    * 8-bit's unsigned 128-offset is removed at decode, so silence is 0
    * at every bit depth. */
  case class WavPcm(channels: Int, bits: Int, samples: Array[Int]) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
  }

  /** REAL RIFF/WAVE decoder: integer PCM at 8/16/24/32 bits, mono or
    * stereo (any channel count), little-endian — the RIFF variants real
    * corpora actually contain. Walks chunks (skips unknown ones,
    * honoring RIFF's even-byte padding rule), validates the fmt chunk,
    * rejects truncation loudly. 8-bit WAV is unsigned-with-128-offset
    * per the spec; 24-bit needs explicit sign extension — both handled. */
  def decodeWav(media: Array[Byte]): WavPcm = {
    def die(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a PCM WAV: $msg")
    val buf = java.nio.ByteBuffer.wrap(media)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (media.length < 12 || fourcc() != "RIFF") die("bad RIFF magic")
    buf.getInt // riff size
    if (fourcc() != "WAVE") die("bad WAVE magic")
    var channels = 0
    var bits = 0
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) die(s"truncated chunk $id")
      id match {
        case "fmt " =>
          if (size < 16) die(s"fmt chunk too small ($size)")
          val p = buf.position()
          val codec = buf.getShort
          channels = buf.getShort.toInt
          buf.getInt; buf.getInt; buf.getShort
          bits = buf.getShort.toInt
          if (codec != 1) die(s"unsupported codec $codec (not integer PCM)")
          if (channels < 1) die(s"implausible channel count $channels")
          if (bits != 8 && bits != 16 && bits != 24 && bits != 32)
            die(s"unsupported bit depth $bits")
          buf.position(p + size + (size & 1))
        case "data" =>
          if (bits == 0) die("data chunk before fmt")
          val bytesPer = bits / 8
          val n = size / bytesPer
          val samples = new Array[Int](n)
          var i = 0
          bits match {
            case 8 => // unsigned, 128 = silence (the WAV spec's one quirk)
              while (i < n) { samples(i) = (buf.get & 0xff) - 128; i += 1 }
            case 16 =>
              while (i < n) { samples(i) = buf.getShort.toInt; i += 1 }
            case 24 => // 3-byte LE; the top byte read signed sign-extends
              while (i < n) {
                val b0 = buf.get & 0xff
                val b1 = buf.get & 0xff
                val b2 = buf.get.toInt
                samples(i) = (b2 << 16) | (b1 << 8) | b0
                i += 1
              }
            case 32 =>
              while (i < n) { samples(i) = buf.getInt; i += 1 }
          }
          return WavPcm(channels, bits, samples)
        case _ => // real writers insert LIST/INFO etc — skip, pad to even
          buf.position(buf.position() + size + (size & 1))
      }
    }
    die("no data chunk")
  }

  /** documents → WAV payloads → batched decode → integer audio features.
    * zero_crossings counts sign flips between consecutive samples
    * (negative vs non-negative). */
  def wavFeatures(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { id =>
            val pcm = decodeWav(syntheticWav(id))
            // the decoder accepts any channel count now — this MONO
            // feature contract must refuse interleaved streams loudly,
            // not count L/R sign flips as zero crossings (multi-channel
            // corpora go through wavChannelFeatures)
            require(pcm.channels == 1,
              s"wavFeatures is a mono contract; got ${pcm.channels} channels" +
                " — use wavChannelFeatures for multi-channel audio")
            val s = pcm.samples
            var sumAbs = 0L
            var peak = 0L
            var zc = 0L
            var i = 0
            while (i < s.length) {
              val a = math.abs(s(i).toLong)
              sumAbs += a
              if (a > peak) peak = a
              if (i > 0 && (s(i - 1) < 0) != (s(i) < 0)) zc += 1
              i += 1
            }
            WavFeatureRow(id, s.length.toLong, sumAbs, peak, zc)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  case class WavChFeatureRow(doc_id: Long, channel: Long, n_samples: Long,
      sum_abs: Long, peak: Long, zero_crossings: Long)

  /** Deterministic 24-bit sample for frame `i`, channel `ch` of `docId`:
    * ±2,000,000 — deliberately outside the int16 range, so a decoder
    * that silently truncates to 16 bits or botches 24-bit sign extension
    * produces wrong values, not coincidentally-right ones. Shared
    * contract with the oracle SQL. */
  @inline private def sample24Value(docId: Long, i: Long, ch: Long): Int =
    (((docId * 37 + i * 11 + ch * 10007) % 4000001) - 2000000).toInt

  /** A genuine 24-bit STEREO PCM WAV for `docId` (8 kHz, 200 + id%200
    * frames, channel-interleaved 3-byte little-endian samples); every
    * 3rd doc carries a LIST chunk between fmt and data. */
  def syntheticWav24Stereo(docId: Long): Array[Byte] = {
    val n = 200 + (docId % 200).toInt // frames
    val channels = 2
    val blockAlign = channels * 3
    val junk = if (docId % 3 == 0) 12 else 0 // "LIST" + size + 4 payload
    val dataBytes = n * blockAlign
    val riffSize = 4 + (8 + 16) + junk + (8 + dataBytes)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(8000) // sample rate
      .putInt(8000 * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(24) // bits per sample
    if (junk > 0)
      out.put("LIST".getBytes("US-ASCII")).putInt(4)
        .put("INFO".getBytes("US-ASCII"))
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) {
      var ch = 0
      while (ch < channels) {
        val v = sample24Value(docId, i, ch)
        out.put((v & 0xff).toByte)
          .put(((v >> 8) & 0xff).toByte)
          .put(((v >> 16) & 0xff).toByte)
        ch += 1
      }
      i += 1
    }
    out.array()
  }

  /** documents → 24-bit stereo WAV payloads → batched decode →
    * per-CHANNEL feature rows (the multi-channel contract: one row per
    * (doc, channel), so downstream curation can filter on any channel's
    * signal independently). Same feature set as [[wavFeatures]], computed
    * over the de-interleaved per-channel sample stream. */
  def wavChannelFeatures(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { id =>
            val pcm = decodeWav(syntheticWav24Stereo(id))
            val nCh = pcm.channels
            (0 until nCh).iterator.map { ch =>
              var sumAbs = 0L
              var peak = 0L
              var zc = 0L
              var prev = 0
              var f = 0
              while (f < pcm.nFrames) {
                val v = pcm.samples(f * nCh + ch)
                val a = math.abs(v.toLong)
                sumAbs += a
                if (a > peak) peak = a
                if (f > 0 && (prev < 0) != (v < 0)) zc += 1
                prev = v
                f += 1
              }
              WavChFeatureRow(id, ch.toLong, pcm.nFrames.toLong, sumAbs, peak, zc)
            }
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("channel"))
  }

  // ------------------------------------------------------------------
  // REAL video decode: Y4M (YUV4MPEG2) — the raw-video container mjpeg
  // tools/ffmpeg exchange: an ASCII stream header (W/H/framerate/
  // colourspace tags in any order), then per-frame "FRAME\n" markers each
  // followed by a raw C420 YUV plane set. A pure-JVM parser covers it
  // completely; the operator is the task's "frame-sample" shape: decode →
  // sample every k-th frame → per-sampled-frame luma statistics.
  // ------------------------------------------------------------------

  case class Y4mFeatureRow(doc_id: Long, w: Long, h: Long, n_frames: Long,
      n_sampled: Long, luma_sum: Long, luma_max: Long)

  /** Deterministic luma of pixel `p` in frame `f`: shared with the oracle. */
  @inline private def lumaValue(docId: Long, f: Int, p: Long): Int =
    ((docId * 17 + f * 101 + p * 3) % 256).toInt

  /** A genuine YUV4MPEG2 stream for `docId`: 8+(id%8)×2 luma cols ×
    * 8+(id%4)×2 rows (C420 needs even dims), 4 + id%5 frames, chroma
    * planes constant 128. Header tag order varies per doc — parsers must
    * read tags, not offsets. */
  def syntheticY4m(docId: Long): Array[Byte] = {
    val w = (8 + (docId % 8).toInt) * 2
    val h = (8 + (docId % 4).toInt) * 2
    val frames = 4 + (docId % 5).toInt
    val tags =
      if (docId % 2 == 0) s"W$w H$h F25:1 Ip A1:1 C420jpeg"
      else s"C420jpeg F30:1 W$w H$h"
    val header = s"YUV4MPEG2 $tags\n".getBytes("US-ASCII")
    val ySize = w * h
    val cSize = (w / 2) * (h / 2)
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames * (frameMark.length + ySize + 2 * cSize))
    out.write(header)
    var f = 0
    while (f < frames) {
      out.write(frameMark)
      var p = 0
      while (p < ySize) { out.write(lumaValue(docId, f, p)); p += 1 }
      var c = 0
      while (c < 2 * cSize) { out.write(128); c += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** REAL Y4M decoder: returns (w, h, per-frame luma planes). Parses the
    * tag-based stream header (any tag order, unknown tags ignored — the
    * format's contract), validates C420, walks FRAME markers, rejects
    * truncation loudly. */
  def decodeY4m(media: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    def die(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a Y4M stream: $msg")
    var i = 0
    def line(): String = {
      val start = i
      while (i < media.length && media(i) != '\n') i += 1
      if (i >= media.length) die("unterminated header line")
      i += 1
      new String(media, start, i - 1 - start, "US-ASCII")
    }
    val header = line()
    if (!header.startsWith("YUV4MPEG2")) die("bad magic")
    var w = -1
    var h = -1
    var colourspace = "C420" // the format's default
    header.split(' ').drop(1).filter(_.nonEmpty).foreach { tag =>
      tag.head match {
        case 'W' => w = tag.tail.toInt
        case 'H' => h = tag.tail.toInt
        case 'C' => colourspace = tag
        case _ => // F/I/A/X… tags: valid, irrelevant here
      }
    }
    if (w <= 0 || h <= 0) die("missing W/H tags")
    if (!colourspace.startsWith("C420")) die(s"unsupported $colourspace")
    // guard the plane-size arithmetic against Int wrap (same contract as
    // the PPM decoder: absurd dims die loudly, never index negatively)
    if (w.toLong * h * 3 / 2 > Int.MaxValue)
      die(s"implausible dimensions ${w}x$h")
    val ySize = w * h
    val frameSize = ySize + 2 * ((w / 2) * (h / 2))
    val frames = Seq.newBuilder[Array[Byte]]
    while (i < media.length) {
      val mark = line()
      if (!mark.startsWith("FRAME")) die(s"expected FRAME marker, got '$mark'")
      if (media.length - i < frameSize)
        die(s"truncated frame: have ${media.length - i}, need $frameSize")
      frames += java.util.Arrays.copyOfRange(media, i, i + ySize)
      i += frameSize
    }
    (w, h, frames.result())
  }

  /** documents → Y4M payloads → batched decode → frame-sampled luma
    * features: every `stride`-th frame contributes its luma sum; `luma_max`
    * is the max luma byte over sampled frames. */
  def y4mFrameSample(docs: DataFrame, stride: Int = 2,
      batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { id =>
            val (w, h, frames) = decodeY4m(syntheticY4m(id))
            var lumaSum = 0L
            var lumaMax = 0L
            var sampled = 0L
            var f = 0
            while (f < frames.length) {
              if (f % stride == 0) {
                sampled += 1
                val y = frames(f)
                var p = 0
                while (p < y.length) {
                  val v = y(p) & 0xff
                  lumaSum += v
                  if (v > lumaMax) lumaMax = v
                  p += 1
                }
              }
              f += 1
            }
            Y4mFeatureRow(id, w.toLong, h.toLong, frames.length.toLong,
              sampled, lumaSum, lumaMax)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** documents → PPM payloads (executor-side) → batched decode →
    * integer features. mean_c_x100 = Σ channel · 100 / (w·h); thumb_sum =
    * Σ over the 4×4 nearest-neighbor downsample of r + 2g + 3b. */
  def ppmFeatures(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { id =>
            val (w, h, rgb) = decodePpm(syntheticPpm(id))
            val sums = new Array[Long](3)
            var p = 0
            while (p < w * h) {
              sums(0) += rgb(p * 3) & 0xff
              sums(1) += rgb(p * 3 + 1) & 0xff
              sums(2) += rgb(p * 3 + 2) & 0xff
              p += 1
            }
            var thumb = 0L
            var ty = 0
            while (ty < 4) {
              var tx = 0
              while (tx < 4) {
                val sp = (ty * h / 4) * w + (tx * w / 4)
                thumb += (rgb(sp * 3) & 0xff) + 2L * (rgb(sp * 3 + 1) & 0xff) +
                  3L * (rgb(sp * 3 + 2) & 0xff)
                tx += 1
              }
              ty += 1
            }
            val n = (w * h).toLong
            PpmFeatureRow(id, w.toLong, h.toLong,
              sums(0) * 100 / n, sums(1) * 100 / n, sums(2) * 100 / n, thumb)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }
}

package graft.delta

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID
import java.util.zip.CRC32

import org.roaringbitmap.RoaringBitmap

/**
 * Deletion-vector bitmap + file codec, per the public Delta protocol
 * ("Deletion Vector Format"): a 64-bit roaring bitmap stored as the
 * "portable" RoaringBitmapArray serialization —
 *   [magic 1681511377 i32 LE][number of 32-bit bitmaps i64 LE]
 *   { [key i32 LE][standard RoaringFormatSpec 32-bit bitmap] }*
 * wrapped in a DV file:
 *   [version byte = 1] then per DV at `offset`:
 *   [dataSize i32 BE][data: portable bitmap][CRC-32 of data, i32 BE]
 *
 * The reference consumes these decoded per file as selection vectors
 * (src/functions/delta_scan/delta_multi_file_list.cpp:448-462); here the
 * decoded bitmap backs an in-scan filter on `_metadata.row_index`.
 */
object DvCodec {

  val PortableMagic = 1681511377

  /** 64-bit bitmap modeled as sorted map high32 → 32-bit roaring bitmap. */
  final case class Bitmap64(parts: scala.collection.SortedMap[Int, RoaringBitmap]) {
    def contains(v: Long): Boolean = {
      val key = (v >>> 32).toInt
      parts.get(key).exists(_.contains(v.toInt))
    }
    def cardinality: Long = parts.valuesIterator.map(_.getLongCardinality).sum
    def forall(f: Long => Unit): Unit =
      parts.foreach { case (k, bm) =>
        bm.forEach((i: Int) => f((k.toLong << 32) | (i.toLong & 0xffffffffL)))
      }
  }

  object Bitmap64 {
    def fromValues(values: Iterable[Long]): Bitmap64 = {
      val m = scala.collection.mutable.SortedMap.empty[Int, RoaringBitmap]
      values.foreach { v =>
        require(v >= 0, s"negative row index $v")
        m.getOrElseUpdate((v >>> 32).toInt, new RoaringBitmap).add(v.toInt)
      }
      Bitmap64(scala.collection.immutable.SortedMap.from(m))
    }

    /** Bitmap union (non-destructive). */
    def or(a: Bitmap64, b: Bitmap64): Bitmap64 = {
      val m = scala.collection.mutable.SortedMap.empty[Int, RoaringBitmap]
      a.parts.foreach { case (k, bm) => m.put(k, bm.clone()) }
      b.parts.foreach { case (k, bm) =>
        m.get(k) match {
          case Some(mine) => mine.or(bm)
          case None => m.put(k, bm.clone())
        }
      }
      Bitmap64(scala.collection.immutable.SortedMap.from(m))
    }

    /** Difference a ∖ b (non-destructive) — the rows newly deleted when a
      * DV grows from b to a (CDF bitmap-diff derivation). */
    def andNot(a: Bitmap64, b: Bitmap64): Bitmap64 = {
      val m = scala.collection.mutable.SortedMap.empty[Int, RoaringBitmap]
      a.parts.foreach { case (k, bm) =>
        val r = b.parts.get(k) match {
          case Some(other) => RoaringBitmap.andNot(bm, other)
          case None => bm.clone()
        }
        if (!r.isEmpty) m.put(k, r)
      }
      Bitmap64(scala.collection.immutable.SortedMap.from(m))
    }

    val empty: Bitmap64 = Bitmap64(scala.collection.immutable.SortedMap.empty[Int, RoaringBitmap])
  }

  /** Serialize to the portable RoaringBitmapArray format (little-endian). */
  def serialize(bm: Bitmap64): Array[Byte] = {
    var size = 4 + 8
    val serializedParts = bm.parts.toSeq.map { case (k, part) =>
      part.runOptimize()
      val buf = ByteBuffer.allocate(part.serializedSizeInBytes())
        .order(ByteOrder.LITTLE_ENDIAN)
      part.serialize(buf)
      size += 4 + buf.position()
      (k, buf.array().take(buf.position()))
    }
    val out = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(PortableMagic)
    out.putLong(bm.parts.size.toLong)
    serializedParts.foreach { case (k, bytes) => out.putInt(k); out.put(bytes) }
    out.array()
  }

  def deserialize(bytes: Array[Byte]): Bitmap64 = {
    val in = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = in.getInt
    require(magic == PortableMagic, s"bad DV magic $magic")
    val n = in.getLong
    val m = scala.collection.mutable.SortedMap.empty[Int, RoaringBitmap]
    (0L until n).foreach { _ =>
      val key = in.getInt
      val part = new RoaringBitmap
      part.deserialize(in)
      in.position(in.position() + part.serializedSizeInBytes())
      m.put(key, part)
    }
    Bitmap64(scala.collection.immutable.SortedMap.from(m))
  }

  // ---- DV file framing ----------------------------------------------------

  /** One DV blob framed for a DV file; returns (fileBytes, offset, dataSize)
    * for a file holding a single DV. */
  def frameSingle(data: Array[Byte]): (Array[Byte], Int, Int) = {
    val crc = new CRC32
    crc.update(data)
    val out = new ByteArrayOutputStream(1 + 4 + data.length + 4)
    out.write(1) // format version
    val offset = 1
    val bb = ByteBuffer.allocate(4 + data.length + 4) // big-endian frame
    bb.putInt(data.length)
    bb.put(data)
    bb.putInt(crc.getValue.toInt)
    out.write(bb.array())
    (out.toByteArray, offset, data.length)
  }

  /** Frame several DV blobs into ONE file's bytes (a multi-DV file — the
    * protocol allows many DVs per file, each addressed by its offset);
    * returns (fileBytes, per-blob offsets aligned with `datas`). */
  def frameMany(datas: Seq[Array[Byte]]): (Array[Byte], Seq[Int]) = {
    val out = new ByteArrayOutputStream()
    out.write(1) // format version, once per file
    val offsets = Seq.newBuilder[Int]
    var pos = 1
    datas.foreach { data =>
      offsets += pos
      val crc = new CRC32
      crc.update(data)
      val bb = ByteBuffer.allocate(4 + data.length + 4) // big-endian frame
      bb.putInt(data.length)
      bb.put(data)
      bb.putInt(crc.getValue.toInt)
      out.write(bb.array())
      pos += 4 + data.length + 4
    }
    (out.toByteArray, offsets.result())
  }

  /** Read one framed DV from file bytes at `offset`, verifying CRC. */
  def readFramed(file: Array[Byte], offset: Int): Array[Byte] = {
    val bb = ByteBuffer.wrap(file)
    bb.position(offset)
    val size = bb.getInt
    val data = new Array[Byte](size)
    bb.get(data)
    val expected = bb.getInt
    val crc = new CRC32
    crc.update(data)
    require(crc.getValue.toInt == expected, "DV checksum mismatch")
    data
  }

  // ---- Z85 (ZeroMQ base-85) — used for "u"/"i" storage types -------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85 input must be 4-byte aligned")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (bytes(i + j) & 0xffL))
      val chunk = new Array[Char](5)
      (4 to 0 by -1).foreach { j => chunk(j) = Z85Alphabet((v % 85).toInt); v /= 85 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, "z85 input must be 5-char aligned")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      (0 until 5).foreach { j =>
        val d = Z85Decode(s.charAt(i + j).toInt)
        require(d >= 0, s"bad z85 char ${s.charAt(i + j)}")
        v = v * 85 + d
      }
      (3 to 0 by -1).foreach { j => out(o + j) = (v & 0xff).toByte; v >>= 8 }
      i += 5
      o += 4
    }
    out
  }

  def uuidToZ85(uuid: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  def z85ToUuid(s: String): UUID = {
    val bytes = z85Decode(s)
    val bb = ByteBuffer.wrap(bytes)
    new UUID(bb.getLong, bb.getLong)
  }
}

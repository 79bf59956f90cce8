package graft.delta

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the DV wire codecs. DeltaAdvancedSpec pins these
  * against fixed reference vectors; foreign-written tables can carry any
  * shape the protocol allows, so the round-trip laws are checked here
  * over generated inputs — row indexes above 2^32 (multi-part bitmaps),
  * run-heavy ranges (runOptimize's RLE container path), empty bitmaps,
  * multi-blob DV files, and arbitrary Z85 payloads.
  */
class DvCodecPropertySpec extends AnyFunSuite {
  import DvCodec._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, s"$name: $res")
  }

  /** small ids, ids straddling the 2^32 part boundary, and dense runs */
  private val genRowIds: Gen[Set[Long]] = {
    val small = Gen.chooseNum(0L, 100000L)
    val high = Gen.chooseNum((1L << 32) - 1000, (1L << 32) + 1000)
    val huge = Gen.chooseNum(0L, (1L << 40) - 1)
    val point = Gen.oneOf(small, high, huge)
    val run = for {
      start <- Gen.oneOf(small, high)
      len <- Gen.chooseNum(1, 2000)
    } yield (start until start + len).toSet
    for {
      points <- Gen.listOf(point)
      runs <- Gen.listOf(run)
    } yield points.toSet ++ runs.flatten
  }

  private def contents(bm: Bitmap64): Set[Long] = {
    val b = Set.newBuilder[Long]
    bm.forall(b += _)
    b.result()
  }

  test("portable bitmap serialize/deserialize round-trips any id set") {
    check("bitmap round-trip", Prop.forAll(genRowIds) { ids =>
      val bm = Bitmap64.fromValues(ids)
      val back = deserialize(serialize(bm))
      back.cardinality == ids.size.toLong &&
        contents(back) == ids &&
        ids.forall(back.contains) &&
        !back.contains(if (ids.isEmpty) 7L else ids.max + 1)
    })
  }

  test("or/andNot agree with set union/difference") {
    check("bitmap algebra", Prop.forAll(genRowIds, genRowIds) { (a, b) =>
      val ba = Bitmap64.fromValues(a)
      val bb = Bitmap64.fromValues(b)
      contents(Bitmap64.or(ba, bb)) == (a ++ b) &&
        contents(Bitmap64.andNot(ba, bb)) == (a -- b)
    })
  }

  test("multi-blob DV file framing reads every blob back, CRC-verified") {
    val genBlob = Gen.chooseNum(0, 512).flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    check("framing", Prop.forAll(Gen.nonEmptyListOf(genBlob)) { blobs =>
      val (file, offsets) = frameMany(blobs)
      file(0) == 1.toByte &&
        offsets.zip(blobs).forall { case (off, blob) =>
          readFramed(file, off).sameElements(blob)
        }
    })
  }

  test("a corrupted DV payload byte fails the CRC check") {
    val bm = Bitmap64.fromValues(Seq(1L, 5L, (1L << 33) + 7))
    val (file, off, size) = frameSingle(serialize(bm))
    assert(size > 0)
    // flip one payload byte (offset + 4 skips the length header)
    file(off + 4 + size / 2) = (file(off + 4 + size / 2) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](readFramed(file, off))
    assert(e.getMessage.contains("checksum"))
  }

  test("'p' DV descriptors resolve as URIs: encoded specials round-trip") {
    import org.apache.hadoop.fs.Path
    // a DV that lives in a directory with a space, as shallowClone would
    // serialize it (encoded URI string) — must resolve to the literal path
    val raw = new Path("/tmp/dv dir/deletion_vector_x.bin")
    val serialized = raw.toUri.toString
    assert(serialized.contains("%20"))
    val d = DeletionVectorDescriptor("p", serialized, Some(1), 10, 3)
    val resolved = DeletionVectorStore.resolvePath(new Path("/unused"), d)
    assert(resolved.toUri.getPath == "/tmp/dv dir/deletion_vector_x.bin")
    // plain absolute paths (the common case) stay as-is
    val plain = DeletionVectorDescriptor("p", "/tmp/t/deletion_vector_y.bin", Some(1), 10, 3)
    assert(DeletionVectorStore.resolvePath(new Path("/unused"), plain)
      .toUri.getPath == "/tmp/t/deletion_vector_y.bin")
  }

  test("z85 encode/decode round-trips any 4-aligned payload, uuids included") {
    val gen4 = Gen.chooseNum(0, 64)
      .flatMap(n => Gen.containerOfN[Array, Byte](n * 4, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    check("z85 round-trip", Prop.forAll(gen4) { bytes =>
      z85Decode(z85Encode(bytes)).sameElements(bytes)
    })
    check("uuid round-trip", Prop.forAll(Gen.uuid) { u =>
      z85ToUuid(uuidToZ85(u)) == u
    })
  }
}

package graft.delta

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property for partition-value serialization: the log stores
  * every partition value as a string, so `toSerialized` then `toInternal`
  * must reproduce the Catalyst value exactly for any input — negative and
  * pre-1970 dates, timestamp microseconds, decimal scales, strings with
  * the characters that classically break naive partition handling
  * ('=', '/', unicode, leading/trailing spaces). A value that drifts here
  * both corrupts injected partition columns AND breaks partition pruning
  * (the pruner compares against the same serialized form).
  */
class PartitionUtilPropertySpec extends AnyFunSuite {
  import PartitionUtil._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("integer family round-trips") {
    check("long", Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { v =>
      toInternal(toSerialized(v), LongType) == v
    })
    check("int", Prop.forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { v =>
      toInternal(toSerialized(v), IntegerType) == v
    })
    check("short/byte", Prop.forAll(Gen.chooseNum(Short.MinValue, Short.MaxValue)) { v =>
      toInternal(toSerialized(v), ShortType) == v &&
        toInternal(toSerialized(v.toByte), ByteType) == v.toByte
    })
  }

  test("strings round-trip, including partition-hostile characters") {
    val hostile = Gen.oneOf("=", "/", "a=b/c", " lead", "trail ", "déjà vu",
      "中文", "__HIVE_DEFAULT_PARTITION__", "a%2Fb")
    val gen = Gen.frequency(3 -> Gen.asciiPrintableStr.filter(_.nonEmpty), 1 -> hostile)
    check("string", Prop.forAll(gen) { s =>
      toInternal(toSerialized(s), StringType) == UTF8String.fromString(s)
    })
  }

  test("dates round-trip across the whole civil range") {
    val genDate = Gen.chooseNum(-719162L, 2932896L) // 0001-01-01 .. 9999-12-31 epoch days
      .map(d => java.time.LocalDate.ofEpochDay(d))
    check("date", Prop.forAll(genDate) { ld =>
      toInternal(toSerialized(ld), DateType) == ld.toEpochDay.toInt &&
        toInternal(toSerialized(java.sql.Date.valueOf(ld)), DateType) == ld.toEpochDay.toInt
    })
  }

  test("timestamps round-trip at microsecond precision in the session zone") {
    // micros within +-200 years of epoch; Instant path (external Catalyst)
    val genMicros = Gen.chooseNum(-6311520000000000L, 6311520000000000L)
    check("timestamp", Prop.forAll(genMicros) { us =>
      val inst = java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      toInternal(toSerialized(inst), TimestampType) == us
    })
  }

  test("decimals round-trip at declared precision/scale") {
    val genDec = for {
      unscaled <- Gen.chooseNum(-999999999999L, 999999999999L)
      scale <- Gen.chooseNum(0, 6)
    } yield (BigDecimal(BigInt(unscaled), scale), scale)
    check("decimal", Prop.forAll(genDec) { case (bd, scale) =>
      val dt = DecimalType(18, scale)
      toInternal(toSerialized(bd), dt) == Decimal(bd, 18, scale)
    })
  }

  test("null and empty-string disambiguation") {
    assert(toInternal(null, LongType) == null)
    assert(toInternal(null, StringType) == null)
    // empty string is a VALUE for strings, null for every other type
    assert(toInternal("", StringType) == UTF8String.fromString(""))
    assert(toInternal("", LongType) == null)
    assert(toSerialized(null) == null)
  }
}

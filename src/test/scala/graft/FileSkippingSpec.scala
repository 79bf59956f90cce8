package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.delta.{FileSkipping, ParsedStats}

/** Unit tests for stats-based skipping through casts: Date→Timestamp unit
  * conversion and the value-preserving-cast whitelist (narrowing casts must
  * conservatively keep the file). */
class FileSkippingSpec extends AnyFunSuite {
  // force the UTC-session SparkSession so SQLConf.get sees timeZone=UTC
  private val spark = TestSpark.spark

  private def stats(json: String): ParsedStats = ParsedStats.parse(json).get

  private def micros(iso: String): Long = {
    val i = java.time.Instant.parse(iso)
    i.getEpochSecond * 1000000L + i.getNano / 1000
  }

  private val dateSchema = StructType(Seq(StructField("d", DateType)))
  private val dateStats = stats(
    """{"numRecords":10,
       |"minValues":{"d":"2024-01-01"},"maxValues":{"d":"2024-01-31"},
       |"nullCount":{"d":0}}""".stripMargin)
  private val dAttr = AttributeReference("d", DateType)()

  test("date stats vs timestamp literal: in-range keeps, out-of-range skips") {
    // Spark coerces `d >= TIMESTAMP '...'` to `cast(d AS timestamp) >= lit`
    def pred(iso: String) = GreaterThanOrEqual(
      Cast(dAttr, TimestampType), Literal(micros(iso), TimestampType))
    assert(FileSkipping.mayContain(dateStats, dateSchema, pred("2024-01-15T00:00:00Z")),
      "literal inside the file's date range must keep the file")
    assert(FileSkipping.mayContain(dateStats, dateSchema, pred("2024-01-31T12:00:00Z")),
      "midday on the max date is still within the day's micros range")
    assert(!FileSkipping.mayContain(dateStats, dateSchema, pred("2024-02-15T00:00:00Z")),
      "literal after the range must skip the file")
    // equality on a specific in-range instant keeps; after range skips
    def eq(iso: String) = EqualTo(
      Cast(dAttr, TimestampType), Literal(micros(iso), TimestampType))
    assert(FileSkipping.mayContain(dateStats, dateSchema, eq("2024-01-10T08:30:00Z")))
    assert(!FileSkipping.mayContain(dateStats, dateSchema, eq("2024-02-01T00:00:00Z")))
  }

  test("date stats vs timestamp_ntz literal converts days to micros") {
    val p = LessThan(Cast(dAttr, TimestampNTZType),
      Literal(micros("2024-01-01T00:00:00Z"), TimestampNTZType))
    assert(!FileSkipping.mayContain(dateStats, dateSchema, p),
      "strictly before the min day must skip")
  }

  test("narrowing double→int cast is not followed (file kept)") {
    val schema = StructType(Seq(StructField("x", DoubleType)))
    val st = stats(
      """{"numRecords":5,"minValues":{"x":5.5},"maxValues":{"x":5.9},
         |"nullCount":{"x":0}}""".stripMargin)
    val x = AttributeReference("x", DoubleType)()
    // 5.7 casts to 5 and matches even though double stats exclude 5
    val p = EqualTo(Cast(x, IntegerType), Literal(5, IntegerType))
    assert(FileSkipping.mayContain(st, schema, p),
      "narrowing cast must conservatively keep the file")
  }

  test("widening int→long cast is followed (file skipped when out of range)") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val st = stats(
      """{"numRecords":5,"minValues":{"i":1},"maxValues":{"i":10},
         |"nullCount":{"i":0}}""".stripMargin)
    val i = AttributeReference("i", IntegerType)()
    val out = EqualTo(Cast(i, LongType), Literal(20L, LongType))
    val in = EqualTo(Cast(i, LongType), Literal(7L, LongType))
    assert(!FileSkipping.mayContain(st, schema, out))
    assert(FileSkipping.mayContain(st, schema, in))
  }

  test("long→int narrowing cast is not followed") {
    val schema = StructType(Seq(StructField("l", LongType)))
    val st = stats(
      """{"numRecords":5,"minValues":{"l":4294967296},"maxValues":{"l":4294967306},
         |"nullCount":{"l":0}}""".stripMargin)
    val l = AttributeReference("l", LongType)()
    // 4294967296L wraps to 0 under non-ANSI cast-to-int
    val p = EqualTo(Cast(l, IntegerType), Literal(0, IntegerType))
    assert(FileSkipping.mayContain(st, schema, p))
  }
}

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

  test("all-NULL stats (min/max absent) skip equality, keep IS NULL — issue-297 analog") {
    // parquet omits min/max for all-NULL columns; the stats carry only
    // nullCount == numRecords (reference issues/null_stats_conversion__issue_297.test)
    val schema = StructType(Seq(StructField("x", DoubleType)))
    val st = stats("""{"numRecords":3,"minValues":{},"maxValues":{},"nullCount":{"x":3}}""")
    val x = AttributeReference("x", DoubleType)()
    assert(!FileSkipping.mayContain(st, schema, EqualTo(x, Literal(42.0, DoubleType))),
      "x = 42 cannot match a file whose every x is NULL")
    assert(!FileSkipping.mayContain(st, schema,
      GreaterThan(x, Literal(0.0, DoubleType))))
    assert(FileSkipping.mayContain(st, schema, IsNull(x)))
    assert(!FileSkipping.mayContain(st, schema, IsNotNull(x)))
    // partially-null file with min/max present: everything keeps
    val st2 = stats(
      """{"numRecords":3,"minValues":{"x":42.0},"maxValues":{"x":42.0},"nullCount":{"x":2}}""")
    assert(FileSkipping.mayContain(st2, schema, EqualTo(x, Literal(42.0, DoubleType))))
    assert(FileSkipping.mayContain(st2, schema, IsNull(x)))
    assert(FileSkipping.mayContain(st2, schema, IsNotNull(x)))
  }

  test("appending all-NULL rows writes min/max-absent stats and scans back") {
    // write-path half of issue 297: an all-NULL DOUBLE batch must commit
    // (no crash), omit its min/max, and record nullCount = numRecords
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("nullstats").toString + "/t"
    // when-without-otherwise keeps the column NULLABLE (a plain lit would
    // stamp NOT NULL into the table schema and correctly refuse the nulls)
    val one = spark.range(1).select(when(col("id") >= 0, 42.0).as("x")).coalesce(1)
    val nulls = spark.range(2).select(lit(null).cast("double").as("x")).coalesce(1)
    graft.delta.DeltaWriter.append(spark, one, dir)
    graft.delta.DeltaWriter.append(spark, nulls, dir)
    val log = graft.delta.DeltaLog.forPath(spark, dir)
    val adds = log.update().allFiles
    assert(adds.length == 2)
    val parsed = adds.flatMap(a => a.stats.flatMap(ParsedStats.parse))
    assert(parsed.exists(p =>
      p.nullCount.get("x").contains(2L) && !p.minValues.contains("x")),
      s"all-NULL add must omit min/max and carry nullCount=2: " +
        adds.flatMap(_.stats).mkString(" | "))
    val back = graft.delta.DeltaTable.forPath(spark, dir).toDF
    assert(back.count() == 3 && back.where(col("x").isNull).count() == 2)
    // and the skipping layer prunes `x = 7` down to zero files
    assert(back.where(col("x") === 7.0).count() == 0)
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

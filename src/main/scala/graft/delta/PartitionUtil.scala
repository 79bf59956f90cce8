package graft.delta

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Delta partition-value (de)serialization: the log stores partition values
 * as strings (null as JSON null / empty), typed by the table schema. The
 * reference turns them into per-file constant vectors
 * (src/functions/delta_scan/delta_multi_file_reader.cpp:193-230); here they
 * become the `InternalRow` of a `PartitionDirectory`, so Spark injects them
 * as constant partition columns without reading them from parquet.
 */
object PartitionUtil {

  /** The session timezone (driver-side planning path). */
  private def sessionZone: java.time.ZoneId =
    try java.time.ZoneId.of(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    catch { case _: Exception => java.time.ZoneOffset.UTC }

  /** Serialized partition value string → Catalyst internal value. */
  def toInternal(s: String, dt: DataType): Any = {
    if (s == null || (s.isEmpty && !dt.isInstanceOf[StringType])) return null
    dt match {
      case _: StringType => UTF8String.fromString(s)
      case _: ByteType => java.lang.Byte.valueOf(s.toByte)
      case _: ShortType => java.lang.Short.valueOf(s.toShort)
      case _: IntegerType => java.lang.Integer.valueOf(s.toInt)
      case _: LongType => java.lang.Long.valueOf(s.toLong)
      case _: FloatType => java.lang.Float.valueOf(s.toFloat)
      case _: DoubleType => java.lang.Double.valueOf(s.toDouble)
      case _: BooleanType => java.lang.Boolean.valueOf(s.toBoolean)
      case d: DecimalType => Decimal(BigDecimal(s), d.precision, d.scale)
      case _: DateType =>
        java.lang.Integer.valueOf(java.time.LocalDate.parse(s).toEpochDay.toInt)
      case _: TimestampNTZType =>
        // zone-free: micros are defined as the wall-clock value itself
        val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        java.lang.Long.valueOf(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000)
      case _: TimestampType =>
        // protocol serialization "yyyy-MM-dd HH:mm:ss[.ffffff]" is a local
        // wall-clock string; Spark writes/reads it in the SESSION zone, so
        // parse with the same zone or injected values shift by the offset
        val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        val inst = ldt.atZone(sessionZone).toInstant
        java.lang.Long.valueOf(inst.getEpochSecond * 1000000L + inst.getNano / 1000)
      case _: BinaryType => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case _ => throw new IllegalArgumentException(s"Unsupported partition type $dt")
    }
  }

  /** Catalyst external (Row) value → protocol string serialization. */
  def toSerialized(v: Any): String = v match {
    case null => null
    case ts: java.sql.Timestamp =>
      // render in the SESSION zone (round-trips with toInternal above)
      ts.toInstant.atZone(sessionZone).toLocalDateTime
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    case i: java.time.Instant =>
      i.atZone(sessionZone).toLocalDateTime
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    case d: java.sql.Date => d.toLocalDate.toString
    case ld: java.time.LocalDate => ld.toString
    case other => other.toString
  }

  /** Per-file partition values → InternalRow in partitionSchema order. */
  def internalRow(values: Map[String, String], partitionSchema: StructType): InternalRow =
    new GenericInternalRow(
      partitionSchema.fields.map(f => toInternal(values.getOrElse(f.name, null), f.dataType)): Array[Any])
}

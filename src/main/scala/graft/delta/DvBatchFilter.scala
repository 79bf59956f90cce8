package graft.delta

import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

import graft.delta.DvCodec.Bitmap64

/**
 * Columnar deletion-vector application: filters a `ColumnarBatch` against a
 * per-file row-index bitmap WITHOUT dropping the whole scan to row-at-a-time
 * (the Spark-side analog of the reference's selection-vector delete filter,
 * delta_multi_file_reader.cpp:24-48, which also keeps vectors intact).
 *
 * Fast paths, in order:
 *  1. file has no DV → re-wrap the source vectors (drop the row-index
 *     column) — zero copy;
 *  2. batch's row-index range misses the bitmap → same zero-copy re-wrap;
 *  3. batch contains deleted rows → copy the survivors into fresh on-heap
 *     vectors (bounded by batch size, typically 4096 rows).
 *
 * At scale this is the difference between "one DV'd file among 10k" costing
 * one batch copy vs. the entire table scanning row-at-a-time.
 */
private[delta] object DvBatchFilter {

  /** Types the survivor-copier handles; non-atomic schemas fall back to the
    * row path in GraftParquetFileFormat. */
  def allAtomic(schema: StructType): Boolean =
    schema.fields.forall(_.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | BinaryType | DateType |
           TimestampType | TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    })

  def filterBatch(batch: ColumnarBatch, bm: Bitmap64, idxOrdinal: Int,
      keep: Array[Int], outTypes: Array[DataType]): ColumnarBatch = {
    val n = batch.numRows()
    val deleted =
      if (bm == null) 0
      else {
        val idxCol = batch.column(idxOrdinal)
        var d = 0
        var r = 0
        while (r < n) {
          if (bm.contains(idxCol.getLong(r))) d += 1
          r += 1
        }
        d
      }
    if (deleted == 0) {
      // zero-copy: new wrapper over the SAME vectors, minus the idx column
      val vs = new Array[ColumnVector](keep.length)
      var i = 0
      while (i < keep.length) { vs(i) = batch.column(keep(i)); i += 1 }
      new ColumnarBatch(vs, n)
    } else {
      val out = new Array[ColumnVector](keep.length)
      val idxCol = batch.column(idxOrdinal)
      val nOut = n - deleted
      var c = 0
      while (c < keep.length) {
        val dst = new OnHeapColumnVector(math.max(nOut, 1), outTypes(c))
        copySurvivors(batch.column(keep(c)), outTypes(c), idxCol, bm, n, dst)
        out(c) = dst
        c += 1
      }
      new ColumnarBatch(out, nOut)
    }
  }

  private def copySurvivors(src: ColumnVector, dt: DataType, idxCol: ColumnVector,
      bm: Bitmap64, n: Int, dst: OnHeapColumnVector): Unit = {
    var r = 0
    var w = 0
    while (r < n) {
      if (!bm.contains(idxCol.getLong(r))) {
        if (src.isNullAt(r)) dst.putNull(w)
        else dt match {
          case BooleanType => dst.putBoolean(w, src.getBoolean(r))
          case ByteType => dst.putByte(w, src.getByte(r))
          case ShortType => dst.putShort(w, src.getShort(r))
          case IntegerType | DateType => dst.putInt(w, src.getInt(r))
          case LongType | TimestampType | TimestampNTZType =>
            dst.putLong(w, src.getLong(r))
          case FloatType => dst.putFloat(w, src.getFloat(r))
          case DoubleType => dst.putDouble(w, src.getDouble(r))
          case StringType =>
            val b = src.getUTF8String(r).getBytes
            dst.putByteArray(w, b, 0, b.length)
          case BinaryType =>
            val b = src.getBinary(r)
            dst.putByteArray(w, b, 0, b.length)
          case d: DecimalType =>
            dst.putDecimal(w, src.getDecimal(r, d.precision, d.scale), d.precision)
          case other =>
            throw new IllegalStateException(s"unsupported batch DV type $other")
        }
        w += 1
      }
      r += 1
    }
  }
}

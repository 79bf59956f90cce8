package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the text-pipeline operators that have no
 * built-in equivalent (beyond-reference surface per BASELINE.json: SimHash
 * document sketches and winnowing-style rolling-hash fingerprints).
 *
 * Implemented as expressions (not UDFs) so they stay inside Tungsten rows
 * and avoid serialization of a closure per row; CodegenFallback keeps the
 * surrounding WholeStageCodegen span intact.
 */
object TextHash {
  /** FNV-1a 64-bit over UTF-8 bytes — stable, allocation-free. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(tokens: Iterator[Array[Byte]]): Long = {
    val acc = new Array[Int](64)
    while (tokens.hasNext) {
      val h = fnv1a64(tokens.next())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Winnowing-style fingerprint: min FNV hash over all `k`-byte windows.
    * Equal fingerprints ⇒ likely shared k-gram (document fingerprinting). */
  def minRollingHash(bytes: Array[Byte], k: Int): Long = {
    if (bytes.length <= k) return fnv1a64(bytes)
    var min = Long.MaxValue
    var i = 0
    while (i + k <= bytes.length) {
      // FNV over the window (k is small; O(n·k) with zero allocation)
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + k) {
        h ^= (bytes(j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** simhash64(array<string>) → long. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val it = (0 until n).iterator
      .filterNot(arr.isNullAt)
      .map(i => arr.getUTF8String(i).getBytes)
    TextHash.simhash64(it)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

/** rolling_fingerprint(string, k) → long (k fixed at construction). */
case class RollingFingerprint(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHash.minRollingHash(input.asInstanceOf[UTF8String].getBytes, k)
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}

object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge._
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def rollingFingerprint(c: Column, k: Int = 16): Column =
    column(RollingFingerprint(expression(c), k))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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
object TextExpressions {
  /** Analysis-time input check shared by the text expressions: a
    * wrong-typed argument (SQL-registered functions accept anything
    * syntactically) must fail ANALYSIS with a clear message, never crash
    * per-row in eval. Nullability/containsNull-insensitive, the same
    * rule ExpectsInputTypes applies (sameType is private[sql]). */
  private def same(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ae, _), ArrayType(be, _)) => same(ae, be)
    case _ => a == b
  }
  private[functions] def requireType(e: Expression, expected: DataType,
      fn: String): TypeCheckResult =
    if (same(expected, e.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires ${expected.catalogString}, got ${e.dataType.catalogString}")
}

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

/** md5 → lowercase hex, byte-identical to Spark's `md5()` / DuckDB's
  * `md5()`, but with a THREAD-LOCAL MessageDigest. Spark's built-in Md5
  * (via commons-codec DigestUtils) constructs a fresh MessageDigest per
  * row through `java.security.Provider` reflection — observed degrading
  * ~100× under long-lived multi-query sessions (provider service lookup
  * churn). The digest instance is reused per thread; `doGenCode` keeps
  * the surrounding WholeStageCodegen span. */
case class GraftMd5Hex(child: Expression) extends UnaryExpression
    {
  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType(child, StringType, prettyName)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(GraftMd5Hex.hex(input.asInstanceOf[UTF8String].getBytes))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GraftMd5Hex.hex($c.getBytes()))")
  override protected def withNewChildInternal(c: Expression): GraftMd5Hex = copy(c)
  override def prettyName: String = "graft_md5"
}

/** md5 → raw 16-byte digest (BinaryType). For callers that only need a
  * collision-safe GROUPING key and drop it from the output (exact dedup):
  * skips the 32-char hex encode + String + UTF8String re-encode per row,
  * and the grouping key is 16 bytes instead of 32. Same thread-local
  * digest as [[GraftMd5Hex]]. */
case class GraftMd5Bin(child: Expression) extends UnaryExpression
    {
  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType(child, StringType, prettyName)
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullSafeEval(input: Any): Any =
    GraftMd5Hex.digestBytes(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftMd5Hex.digestBytes($c.getBytes())")
  override protected def withNewChildInternal(c: Expression): GraftMd5Bin = copy(c)
  override def prettyName: String = "graft_md5_bin"
}

object GraftMd5Hex {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Raw 16-byte digest through the same thread-local instance — for
    * callers that consume digest BYTES (e.g. synthetic media payloads)
    * rather than hex, so nothing per-row touches the provider registry. */
  def digestBytes(bytes: Array[Byte]): Array[Byte] = {
    val md = digest.get()
    md.reset()
    md.digest(bytes)
  }
}

/** simhash64(array<string>) → long. */
case class SimHash64(child: Expression) extends UnaryExpression
    with CodegenFallback {
  // wrong-typed SQL input (plain string, array<int>) must be an ANALYSIS
  // error, not a per-row ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType(child, ArrayType(StringType), prettyName)
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
  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType(child, StringType, prettyName)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHash.minRollingHash(input.asInstanceOf[UTF8String].getBytes, k)
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}

/** sorted_intersect_count(array<long> asc, array<long> asc) → long.
  *
  * |a ∩ b| by linear merge over two ASCENDING long arrays — the hot
  * expression of the dedup verify joins. The built-in `array_intersect`
  * allocates and populates a hash set per CALL, and Catalyst pushes the
  * Jaccard threshold into the verify join's condition where the intersect
  * is evaluated up to 3× per candidate pair (condition twice + project) —
  * measured 9s/stage at sf0.1. The merge does ~|a|+|b| long compares with
  * zero allocation, so the duplicated evaluation is immaterial. Callers
  * must build the arrays with `sort_array(collect_set(_))`. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // array<int> would silently read packed garbage through getLong —
  // require array<long> at analysis
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TextExpressions.requireType(left, ArrayType(LongType), prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TextExpressions.requireType(right, ArrayType(LongType), prettyName)
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayOps.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCount = copy(l, r)
  override def prettyName: String = "sorted_intersect_count"
}

/** lower_alpha_count(string) → long: number of ASCII 'a'-'z' characters.
  *
  * Semantically identical to `length(regexp_replace(s, '[^a-z]', ''))` —
  * UTF-8 multi-byte sequences have every byte ≥ 0x80, so a raw byte scan
  * for [0x61,0x7a] counts exactly the ASCII lowercase letters and never
  * a continuation byte. The regexp form allocates a full copy of the
  * string per row through java.util.regex; at corpus scale that
  * allocation churn was the hot path of the text-quality operators
  * (text_token_stats: 25% of the x30 bench wall). This is a zero-
  * allocation single pass, codegen'd into the surrounding span. */
case class LowerAlphaCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType(child, StringType, prettyName)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ArrayOps.lowerAlphaCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayOps.lowerAlphaCount($c)")
  override protected def withNewChildInternal(c: Expression): LowerAlphaCount = copy(c)
  override def prettyName: String = "lower_alpha_count"
}

object ArrayOps {
  /** Bytes in [0x61,0x7a]; signed-byte compare excludes ≥0x80 for free. */
  def lowerAlphaCount(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var c = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') c += 1L
      i += 1
    }
    c
  }

  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }
}

object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge._
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def rollingFingerprint(c: Column, k: Int = 16): Column =
    column(RollingFingerprint(expression(c), k))
  /** Drop-in for `functions.md5` (same lowercase-hex output). */
  def md5(c: Column): Column = column(GraftMd5Hex(expression(c)))

  /** Raw 16-byte md5 digest (BinaryType) — grouping-key-only variant. */
  def md5Binary(c: Column): Column = column(GraftMd5Bin(expression(c)))
  /** Count of ASCII a-z chars — `length(regexp_replace(c,'[^a-z]',''))`
    * without the per-row allocation (see [[LowerAlphaCount]]). */
  def lowerAlphaCount(c: Column): Column = column(LowerAlphaCount(expression(c)))
  /** |a ∩ b| over two ascending `array<long>`s (see [[SortedIntersectCount]]). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/**
 * z_order_code(b0, b1, ..) → long: bit-interleave up to four 16-bit
 * bucket codes into one Morton (Z-order) key. Sorting by the key
 * clusters rows so that every prefix range of the sort is a small
 * hyper-rectangle in (b0, b1, ..) space — after a rewrite, each data
 * file's per-column min/max stats are tight on EVERY z-ordered column,
 * which is what multi-column file skipping needs (single-column sort
 * gives tight stats on that column only).
 *
 * Children must already be bucket codes in [0, 65535] (null → 0); the
 * caller ([[graft.delta.Optimize.zorder]]) derives them by min/max
 * scaling. Codegen'd via arity-specific static helpers — the expression
 * rides the full-table rewrite, so it must not break whole-stage codegen.
 */
case class ZOrderCode(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty && children.size <= 4,
    s"z_order_code takes 1-4 bucket columns, got ${children.size}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "z_order_code arguments must be INT bucket codes")
  }

  override def eval(input: InternalRow): Any = {
    val codes = children.map { c =>
      val v = c.eval(input)
      if (v == null) 0 else v.asInstanceOf[Int]
    }
    codes.size match {
      case 1 => codes.head.toLong
      case 2 => ZOrderCode.interleave2(codes(0), codes(1))
      case 3 => ZOrderCode.interleave3(codes(0), codes(1), codes(2))
      case _ => ZOrderCode.interleave4(codes(0), codes(1), codes(2), codes(3))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val evals = children.map(_.genCode(ctx))
    val args = evals.map(e => s"(${e.isNull} ? 0 : ${e.value})")
    val call = children.size match {
      case 1 => s"(long) ${args.head}"
      case n => s"graft.functions.ZOrderCode.interleave$n(${args.mkString(", ")})"
    }
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(
      code = code"${childCode}long ${ev.value} = $call;",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): ZOrderCode = copy(children = cs)
  override def prettyName: String = "z_order_code"
}

object ZOrderCode {
  /** Spread the low 16 bits of `v` so consecutive bits land `k` apart. */
  private def spread(v: Int, k: Int): Long = {
    var out = 0L
    var b = 0
    while (b < 16) {
      out |= ((v >> b) & 1L) << (b * k)
      b += 1
    }
    out
  }
  def interleave2(a: Int, b: Int): Long = spread(a, 2) | (spread(b, 2) << 1)
  def interleave3(a: Int, b: Int, c: Int): Long =
    spread(a, 3) | (spread(b, 3) << 1) | (spread(c, 3) << 2)
  def interleave4(a: Int, b: Int, c: Int, d: Int): Long =
    spread(a, 4) | (spread(b, 4) << 1) | (spread(c, 4) << 2) | (spread(d, 4) << 3)

  import org.apache.spark.sql.GraftColumnBridge._
  def zOrderCode(cols: Seq[Column]): Column =
    column(ZOrderCode(cols.map(expression)))
}

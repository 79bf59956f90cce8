package graft.delta

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Soundness property for stats-based file skipping: if `mayContain`
  * says a file cannot match a predicate, then NO row of that file
  * satisfies it — over generated data AND generated predicates. This is
  * the silent-wrong-results class (a pruned file with a matching row
  * loses data with no error), so the fixed matrices in
  * AllTypesSkippingSpec are backed here by randomized evidence. The
  * converse (keeping a non-matching file) is allowed by the conservative
  * contract and not asserted.
  */
class FileSkippingPropertySpec extends AnyFunSuite {
  private val schema = StructType(Seq(StructField("c", LongType), StructField("s", StringType)))
  private val attrC = AttributeReference("c", LongType)()
  private val attrS = AttributeReference("s", StringType)()

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  // ---- generated file contents: longs and short strings, with nulls ----
  private val genLongRows: Gen[List[Option[Long]]] =
    Gen.nonEmptyListOf(Gen.frequency(
      9 -> Gen.chooseNum(-1000L, 1000L).map(Some(_)),
      1 -> Gen.const(None)))

  private val genStr: Gen[String] =
    Gen.chooseNum(0, 4).flatMap(n => Gen.stringOfN(n, Gen.alphaChar))
  private val genStrRows: Gen[List[Option[String]]] =
    Gen.nonEmptyListOf(Gen.frequency(9 -> genStr.map(Some(_)), 1 -> Gen.const(None)))

  private def statsJson(rows: List[Option[Any]], col: String, quote: Boolean): ParsedStats = {
    val present = rows.flatten
    def lit(v: Any) = if (quote) "\"" + v + "\"" else v.toString
    val minMax =
      if (present.isEmpty) ""
      else {
        val (mn, mx) = present.head match {
          case _: Long =>
            val l = present.map(_.asInstanceOf[Long]); (l.min, l.max)
          case _ =>
            val s = present.map(_.asInstanceOf[String]); (s.min, s.max)
        }
        s""""minValues":{"$col":${lit(mn)}},"maxValues":{"$col":${lit(mx)}},"""
      }
    val json =
      s"""{"numRecords":${rows.size},$minMax"nullCount":{"$col":${rows.count(_.isEmpty)}}}"""
    ParsedStats.parse(json).getOrElse(fail(s"unparseable stats: $json"))
  }

  // ---- generated predicates over one column ----
  private def genPred(attr: AttributeReference, genLit: Gen[Literal]): Gen[Expression] = {
    val leaf: Gen[Expression] = Gen.oneOf(
      genLit.map(EqualTo(attr, _)),
      genLit.map(LessThan(attr, _)),
      genLit.map(LessThanOrEqual(attr, _)),
      genLit.map(GreaterThan(attr, _)),
      genLit.map(GreaterThanOrEqual(attr, _)),
      genLit.map(l => Not(EqualTo(attr, l))),
      Gen.const(IsNull(attr)),
      Gen.const(IsNotNull(attr)),
      Gen.nonEmptyListOf(genLit).map(ls => In(attr, ls)))
    def node(depth: Int): Gen[Expression] =
      if (depth == 0) leaf
      else Gen.frequency(
        2 -> leaf,
        1 -> Gen.zip(node(depth - 1), node(depth - 1)).map { case (a, b) => And(a, b) },
        1 -> Gen.zip(node(depth - 1), node(depth - 1)).map { case (a, b) => Or(a, b) })
    node(2)
  }

  private def evalRow(pred: Expression, attr: AttributeReference, v: Option[Any]): Boolean = {
    val bound = pred.transform { case a: AttributeReference if a.sameRef(attr) =>
      BoundReference(0, a.dataType, nullable = true)
    }
    val cell = v match {
      case Some(s: String) => UTF8String.fromString(s)
      case Some(x) => x
      case None => null
    }
    java.lang.Boolean.TRUE == bound.eval(InternalRow(cell))
  }

  private def soundness(attr: AttributeReference, col: String, quote: Boolean,
      genRows: Gen[List[Option[Any]]], genLit: Gen[Literal]): Prop =
    Prop.forAll(genRows, genPred(attr, genLit)) { (rows, pred) =>
      val st = statsJson(rows, col, quote)
      FileSkipping.mayContain(st, schema, pred) ||
        rows.forall(v => !evalRow(pred, attr, v))
    }

  test("a skipped file can never contain a matching LONG row") {
    val genLit = Gen.chooseNum(-1100L, 1100L).map(Literal(_))
    check("long soundness", soundness(attrC, "c", quote = false,
      genLongRows.map(_.map(_.map(x => x: Any))), genLit))
  }

  test("a skipped file can never contain a matching STRING row") {
    val genLit = genStr.map(s => Literal(UTF8String.fromString(s), StringType))
    check("string soundness", soundness(attrS, "s", quote = true,
      genStrRows.map(_.map(_.map(x => x: Any))), genLit))
  }

  test("all-null and empty-stats files are handled conservatively") {
    // no minValues/maxValues at all (e.g. stats-less writer): must keep
    val noStats = ParsedStats.parse("""{"numRecords":5}""").get
    assert(FileSkipping.mayContain(noStats, schema, EqualTo(attrC, Literal(1L))))
    // all-null column: equality to a value cannot match, IS NULL must
    val allNull = ParsedStats.parse(
      """{"numRecords":3,"nullCount":{"c":3}}""").get
    assert(!FileSkipping.mayContain(allNull, schema, EqualTo(attrC, Literal(1L))))
    assert(FileSkipping.mayContain(allNull, schema, IsNull(attrC)))
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{RollingFingerprint, SimHash64}

/**
 * SparkSessionExtensions entry point: registers the native expressions for
 * SQL use (`SELECT simhash64(...)`, `rolling_fingerprint(...)`) and the
 * dynamic file-pruning optimizer rule.
 *
 * Usage: SparkSession.builder().withExtensions(new GraftExtensions) or
 * spark.sql.extensions=graft.GraftExtensions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // join-derived runtime file re-pruning (data columns; DPP covers
    // partitions) — preCBO so it sees the optimized join tree exactly once
    e.injectPreCBORule(s => new graft.delta.DynamicFilePruning(s))
    // unfiltered count(*) answered from the log (DV-aware) — no scan
    e.injectPreCBORule(s => new graft.delta.MetadataOnlyCount(s))
    // graft catalog identifiers → full-fidelity V1 delta scan
    e.injectResolutionRule(s => new graft.delta.GraftCatalogResolution(s))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((
      new FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => RollingFingerprint(c, 16)
        case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(k, _)) =>
          RollingFingerprint(c, k.toString.toInt)
        case _ => throw new IllegalArgumentException(
          "rolling_fingerprint(text[, k])")
      }))
  }
}

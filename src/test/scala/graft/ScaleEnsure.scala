package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: pre-build the synthetic Nx scale dir (same path Bench uses)
  * so BenchOne / PlanDump sessions can measure at scale without paying the
  * build inside the measured session. Args: <sfDir> <factor...> where a
  * factor is `N` (all tables) or `N:tbl1,tbl2` (targeted micro dir). */
object ScaleEnsure {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val specs = args.drop(1).map { a =>
      a.split(':') match {
        case Array(f) => (f.toInt, None: Option[Set[String]])
        case Array(f, ts) => (f.toInt, Some(ts.split(',').toSet))
      }
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    specs.foreach { case (f, only) =>
      val dir = SyntheticScale.ensure(spark, sfDir, f, replicateOnly = only)
      println(s"[scale-ensure] x$f ready at $dir")
      RelationalQueries.ensureViews(spark, dir)
      println(s"[scale-ensure] x$f delta fixtures ready")
    }
    spark.stop()
  }
}

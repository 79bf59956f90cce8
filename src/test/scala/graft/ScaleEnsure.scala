package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: pre-build the synthetic Nx scale dir (same path Bench uses)
  * so BenchOne / PlanDump sessions can measure at scale without paying the
  * build inside the measured session. Args: <sfDir> <factor...>. */
object ScaleEnsure {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factors = args.drop(1).map(_.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    factors.foreach { f =>
      val dir = SyntheticScale.ensure(spark, sfDir, f)
      println(s"[scale-ensure] x$f ready at $dir")
      RelationalQueries.ensureViews(spark, dir)
      println(s"[scale-ensure] x$f delta fixtures ready")
    }
    spark.stop()
  }
}

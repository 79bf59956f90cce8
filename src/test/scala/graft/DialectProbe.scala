package graft

/** One-off dialect probe: constructs the TPC-DS derivation layer relies
  * on must behave identically in Spark SQL and DuckDB. Run:
  * sbt "Test/runMain graft.DialectProbe" */
object DialectProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val r = spark.sql(
      """SELECT DATE '1998-01-01' + CAST(5 AS INT) AS d5,
        | year(DATE '1999-03-04') AS y, quarter(DATE '1999-03-04') AS q,
        | dayofmonth(DATE '1999-03-04') AS dom,
        | CAST(floor(7/2) AS BIGINT) AS fd,
        | concat('S', 5) AS c,
        | DATE '1998-01-01' + 396 AS d396""".stripMargin).collect()(0)
    println(s"PROBE date-arith -> $r")
    val r2 = spark.sql(
      """SELECT d FROM (SELECT DATE '1998-01-01' + CAST(400 AS INT) AS d)
        |WHERE d BETWEEN '1999-02-01' AND cast('1999-04-02' AS date)""".stripMargin)
      .collect().toSeq
    println(s"PROBE date-between-str -> $r2")
    // CTE shadowing a base view of the same name: inner FROM must hit the base
    spark.range(3).toDF("v").createOrReplaceTempView("shadowt")
    val r3 = spark.sql(
      "WITH shadowt AS (SELECT v * 10 AS v FROM shadowt) SELECT sum(v) FROM shadowt")
      .collect()(0)
    println(s"PROBE cte-shadow -> $r3")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.delta._

/** Manual verification probe: drives the public library API off the happy
  * path (bad paths, bad versions, schema mismatch) and prints what the
  * user-facing surface does. Run: sbt "Test/runMain graft.ProbeMain" */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfDir = TestSpark.sfDir
    def probe(name: String)(f: => Any): Unit =
      try println(s"PROBE $name -> OK: ${f.toString.take(120)}")
      catch { case e: Throwable => println(s"PROBE $name -> ${e.getClass.getSimpleName}: ${e.getMessage.take(160)}") }

    probe("open non-delta dir") {
      DeltaTable.forPath(spark, "/tmp/definitely-not-a-table").toDF.count()
    }
    probe("open plain parquet dir as delta") {
      DeltaTable.forPath(spark, s"$sfDir/lineitem.parquet").toDF.count()
    }
    val path = java.nio.file.Files.createTempDirectory("probe").toString + "/t"
    val src = Fixtures.readParquet(spark, sfDir, "region")
    probe("create table") { DeltaWriter.append(spark, src, path) }
    probe("time travel to missing version") {
      DeltaTable.forPath(spark, path).toDF(versionAsOf = 99).count()
    }
    probe("append mismatched schema") {
      DeltaWriter.append(spark, src.withColumnRenamed("r_name", "bogus"), path)
    }
    probe("append extra column") {
      DeltaWriter.append(spark, src.withColumn("extra", lit(1)), path)
    }
    probe("double append then read") {
      DeltaWriter.append(spark, src, path)
      DeltaTable.forPath(spark, path).toDF.count()
    }
    probe("query pushdown log") {
      GraftMetrics.clear()
      val p2 = Fixtures.delta(spark, sfDir, "lineitem", Fixtures.Plain)
      DeltaTable.forPath(spark, p2).toDF.filter(col("l_orderkey") < 10).count()
      GraftMetrics.pushdownLog(spark).collect().mkString("; ")
    }
    probe("CDF over an empty version range") {
      DeltaTable.forPath(spark, path).changes(50, 60).count()
    }
    probe("CDF with inverted range") {
      DeltaTable.forPath(spark, path).changes(3, 1).count()
    }
    probe("CHECK constraint violation names the constraint") {
      val cpath = java.nio.file.Files.createTempDirectory("probe-ck").toString + "/t"
      DeltaWriter.append(spark, src, cpath,
        configuration = Map("delta.constraints.key_small" -> "r_regionkey < 2"))
      DeltaWriter.append(spark, src, cpath) // keys 0-4: violates < 2
    }
    probe("vacuum on a fresh table is a no-op") {
      DeltaTable.forPath(spark, path).vacuum(retentionMs = 0L, force = true)
    }
    probe("vacuum below the retention floor without force is refused") {
      DeltaTable.forPath(spark, path).vacuum(retentionMs = 0L)
    }
    probe("DELETE on an append-only table is refused") {
      val apath = java.nio.file.Files.createTempDirectory("probe-ao").toString + "/t"
      DeltaWriter.append(spark, src, apath,
        configuration = Map("delta.appendOnly" -> "true"))
      DeltaTable.forPath(spark, apath).delete(col("r_regionkey") === 0)
    }
    probe("lying _last_checkpoint size falls back to eager replay, reads fine") {
      val lpath = java.nio.file.Files.createTempDirectory("probe-lazy").toString + "/t"
      DeltaWriter.append(spark, Fixtures.readParquet(spark, sfDir, "supplier")
        .repartition(12), lpath)
      DeltaTable.forPath(spark, lpath).checkpoint()
      // corrupt the pointer's action count: the lazy path must disqualify
      // itself (row-count validation) and the eager path still serve reads
      val ptr = java.nio.file.Paths.get(lpath, "_delta_log", "_last_checkpoint")
      val txt = new String(java.nio.file.Files.readAllBytes(ptr))
      java.nio.file.Files.write(ptr,
        txt.replaceAll("\"size\":\\d+", "\"size\":999")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      DeltaLog.clearCache()
      spark.conf.set("spark.graft.lazySnapshot.minActions", "10")
      try DeltaTable.forPath(spark, lpath).toDF.count()
      finally spark.conf.unset("spark.graft.lazySnapshot.minActions")
    }
    probe("explicit insert into GENERATED ALWAYS identity is refused") {
      val ipath = java.nio.file.Files.createTempDirectory("probe-id").toString + "/t"
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rid",
          org.apache.spark.sql.types.LongType, nullable = true,
          Identity.metadataFor(start = 1, step = 1)),
        org.apache.spark.sql.types.StructField("r_name",
          org.apache.spark.sql.types.StringType, nullable = true)))
      DeltaWriter.append(spark, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), ipath)
      DeltaWriter.append(spark,
        src.select(col("r_regionkey").cast("long").as("rid"), col("r_name")), ipath)
    }
    probe("UPDATE on a row-tracked table materializes ids (row count back)") {
      val rpath = java.nio.file.Files.createTempDirectory("probe-rt").toString + "/t"
      DeltaWriter.append(spark, src, rpath,
        configuration = Map("delta.enableRowTracking" -> "true"))
      DeltaTable.forPath(spark, rpath).update(col("r_regionkey") === 0,
        Map("r_name" -> lit("x")))
    }
    probe("dynamic partition overwrite on an unpartitioned table is refused") {
      DeltaWriter.overwrite(spark, src, path, dynamicPartitions = true)
    }
    probe("batch CDF read without a starting boundary is refused") {
      spark.read.format("graftdelta").option("readChangeFeed", "true")
        .load(path).count()
    }
    probe("unsupported reader feature fails loudly") {
      val fpath = java.nio.file.Files.createTempDirectory("probe-ft").toString + "/t"
      DeltaWriter.append(spark, src, fpath)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(fpath, "_delta_log", f"${1L}%020d.json"),
        ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["someFutureFeature"],"writerFeatures":[]}}""" + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      DeltaLog.clearCache()
      DeltaTable.forPath(spark, fpath).toDF.count()
    }
    spark.stop()
  }
}

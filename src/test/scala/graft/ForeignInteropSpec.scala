package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.delta._

/** Foreign-writer interop: hand-authored logs (DAT analog) read correctly —
  * the shapes our own writer never emits. */
class ForeignInteropSpec extends AnyFunSuite {
  import TestSpark._

  test("foreign inlined log: absolute paths, URL-encoded names, reconciliation") {
    val p = ForeignFixtures.inline(spark, sfDir)
    val got = DeltaTable.forPath(spark, p).toDF
    val want = Fixtures.readNormalized(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // unknown configuration keys ride along inertly
    val conf = DeltaTable.forPath(spark, p).snapshot.metadata.configuration
    assert(conf.contains("delta.constraints.key_is_positive"))
    assert(conf.get("foreign.writer.custom").contains("yes"))
    // a literal '+' in a file name is referenced BARE in a URI-encoded
    // log path; URI percent-decoding must keep it ('+' -> space is form
    // decoding and would resolve to the wrong file)
    val decoded = DeltaTable.forPath(spark, p).snapshot.allFiles.map(_.decodedPath)
    assert(decoded.contains("file+a.parquet"), decoded.mkString(", "))
    assert(decoded.contains("file b.parquet"), decoded.mkString(", "))
  }

  test("log path decoding: URI percent semantics, not form semantics") {
    import graft.delta.Actions.percentDecode
    assert(percentDecode("a+b.parquet") == "a+b.parquet") // bare '+' survives
    assert(percentDecode("a%2Bb.parquet") == "a+b.parquet") // %2B decodes to '+'
    assert(percentDecode("file%20b.parquet") == "file b.parquet")
    assert(percentDecode("x%3Dy/a%25b.parquet") == "x=y/a%b.parquet")
    assert(percentDecode("plain/nested.parquet") == "plain/nested.parquet")
    // malformed sequences (a sloppy foreign writer's bare '%') pass
    // through raw instead of aborting replay — the reference's
    // url_decode (delta_multi_file_list.cpp:26-42) is tolerant this way
    assert(percentDecode("100%.parquet") == "100%.parquet")
    assert(percentDecode("a%ZZb.parquet") == "a%ZZb.parquet")
  }

  test("DV 'p' path: raw non-URI absolute paths resolve literally") {
    import graft.delta.{DeletionVectorDescriptor, DeletionVectorStore}
    def p(s: String) = DeletionVectorStore.resolvePath(
      new org.apache.hadoop.fs.Path("/tbl"),
      DeletionVectorDescriptor("p", s, None, 10, 2)).toString
    // well-formed URI: percent-decoded (delta-spark read)
    assert(p("file:/t%20bl/dv.bin").endsWith("/t bl/dv.bin"))
    // legacy raw path with a space / bare '%': not a URI — read literally
    assert(p("/t bl/dv.bin") == "/t bl/dv.bin")
    assert(p("/tbl/100% done/dv.bin") == "/tbl/100% done/dv.bin")
  }

  test("foreign stats shapes: partial/absent stats never mis-prune") {
    val p = ForeignFixtures.inline(spark, sfDir)
    // n_nationkey >= 10 hits all three files; B has minValues-only stats
    // and C has none — both MUST survive pruning
    val got = DeltaTable.forPath(spark, p).toDF
      .filter(col("n_nationkey") >= 10)
    val want = Fixtures.readNormalized(spark, sfDir, "nation")
      .filter(col("n_nationkey") >= 10)
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(got.count() == want.count())
    // ...while a fully-stats'd predicate still skips: keys %3==0 live only
    // in file-a, whose full stats allow skipping the others where bounds
    // are present (prune soundness is the assertion; skipping is bonus)
    val zero = DeltaTable.forPath(spark, p).toDF.filter(col("n_nationkey") === 0)
    assert(zero.count() == 1)
  }

  test("struct-form checkpoint stats restore JSON stats + partition values") {
    val p = ForeignFixtures.statsAsStruct(spark, sfDir)
    assert(!new java.io.File(p, "_delta_log/00000000000000000000.json").exists())
    val snap = DeltaTable.forPath(spark, p).snapshot
    // every add restored a JSON stats string and the partition map
    assert(snap.allFiles.nonEmpty)
    snap.allFiles.foreach { f =>
      assert(f.stats.nonEmpty, s"${f.path}: stats lost in struct-form decode")
      assert(f.parsedStats.exists(_.numRecords.exists(_ > 0)),
        s"${f.path}: restored stats unparseable: ${f.stats}")
      assert(f.partitionValues != null && f.partitionValues.contains("c_mktsegment"),
        s"${f.path}: partitionValues lost in struct-form decode")
    }
    // restored min/max stats actually PRUNE: a predicate below the global
    // median keeps strictly fewer files than the table has
    val keyAttr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "c_custkey", org.apache.spark.sql.types.LongType)()
    val dataSchema = snap.dataSchema
    val pruned = FileSkipping.prune(snap.allFiles, dataSchema, Seq(
      org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(keyAttr,
        org.apache.spark.sql.catalyst.expressions.Literal(5L))))
    assert(pruned.size < snap.allFiles.size,
      s"no file skipped (${pruned.size}/${snap.allFiles.size}) — struct stats not restored")
    // end-to-end result matches the parquet oracle
    val got = DeltaTable.forPath(spark, p).toDF
      .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") <= 500)
    val want = Fixtures.readNormalized(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") <= 500)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    assert(got.count() == want.count())
    assert(got.select(want.columns.map(col).toIndexedSeq: _*).exceptAll(want).isEmpty)

    // the LAZY (Dataset-backed) decode path restores partition values too —
    // it aligns checkpoint columns independently of the eager path
    graft.delta.DeltaLog.clearCache()
    spark.conf.set("spark.graft.lazySnapshot.minActions", "1")
    try {
      val lazyGot = DeltaTable.forPath(spark, p).toDF
        .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") <= 500)
      assert(lazyGot.count() == want.count(),
        "lazy checkpoint decode must restore partitionValues_parsed")
    } finally {
      spark.conf.unset("spark.graft.lazySnapshot.minActions")
      graft.delta.DeltaLog.clearCache()
    }
  }

  test("foreign checkpoint layout decodes via fallback; v0 json deleted") {
    val p = ForeignFixtures.checkpointed(spark, sfDir)
    assert(!new java.io.File(p, "_delta_log/00000000000000000000.json").exists())
    val got = DeltaTable.forPath(spark, p).toDF
    val want = Fixtures.readNormalized(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("v2 checkpoint: uuid manifest + sidecars reconstruct the table") {
    val p = ForeignFixtures.v2checkpointed(spark, sfDir)
    // v0 json is gone — the v2 manifest is the only complete state source,
    // and the protocol gate must accept readerFeatures=[v2Checkpoint]
    assert(!new java.io.File(p, "_delta_log/00000000000000000000.json").exists())
    val got = DeltaTable.forPath(spark, p).toDF
    val want = Fixtures.readNormalized(spark, sfDir, "part")
      .select("p_partkey", "p_brand", "p_size", "p_retailprice")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val snap = DeltaTable.forPath(spark, p).snapshot
    assert(snap.protocol.readerFeatures.exists(_.contains("v2Checkpoint")))
    // the stale sidecar tombstone reconciled away, 3 live files remain
    assert(snap.allFiles.size == 3)
  }

  test("v2 JSON manifest: relative AND absolute sidecar pointers resolve") {
    val p = ForeignFixtures.v2jsonManifest(spark, sfDir)
    assert(!new java.io.File(p, "_delta_log/00000000000000000000.json").exists())
    val got = DeltaTable.forPath(spark, p).toDF
    val want = Fixtures.readNormalized(spark, sfDir, "region")
      .select("r_regionkey", "r_name")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("v2 checkpoint WRITE: delta.checkpointPolicy=v2 emits manifest + sidecars " +
       "our own reader replays without the JSON log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-v2write").toString + "/t"
    val src = Fixtures.readParquet(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    DeltaWriter.append(spark, src.filter(col("s_suppkey") % 2 === 0).repartition(2), dir)
    Alter.setProperties(spark, DeltaLog.forPath(spark, dir),
      Map("delta.checkpointPolicy" -> "v2"))
    // protocol stamped in the SAME commit as the policy
    val snapP = DeltaLog.forPath(spark, dir).update()
    assert(snapP.protocol.readerFeatures.exists(_.contains("v2Checkpoint")))
    assert(snapP.protocol.writerFeatures.exists(_.contains("v2Checkpoint")))
    DeltaWriter.append(spark, src.filter(col("s_suppkey") % 2 === 1).repartition(2), dir)
    Checkpoints.checkpoint(DeltaLog.forPath(spark, dir))           // v2 layout @ v2
    val logDir = new java.io.File(dir, "_delta_log")
    val manifest = logDir.listFiles().filter(_.getName.matches(
      raw"\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet"))
    assert(manifest.length == 1, logDir.listFiles().map(_.getName).mkString(","))
    val sidecars = new java.io.File(logDir, "_sidecars")
    assert(sidecars.isDirectory && sidecars.listFiles().nonEmpty)
    // no classic checkpoint written
    assert(!new java.io.File(logDir, "00000000000000000002.checkpoint.parquet").exists())
    // the checkpoint is the ONLY state source for v0/v1 once their JSONs
    // go (the checkpointed version's own commit stays, as after cleanup)
    (0 to 1).foreach(v =>
      new java.io.File(logDir, f"$v%020d.json").delete())
    DeltaLog.clearCache()
    val got = DeltaTable.forPath(spark, dir).toDF
    assert(got.count() == src.count())
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
    // a later append + re-checkpoint keeps working on the v2 layout
    DeltaWriter.append(spark, src.limit(3), dir)
    Checkpoints.checkpoint(DeltaLog.forPath(spark, dir))
    DeltaLog.clearCache()
    assert(DeltaTable.forPath(spark, dir).toDF.count() == src.count() + 3)

    // misplaced-manifest defense applies to OUR OWN v2 writes too: copy
    // the v3 manifest under a v4 name + an empty v4 commit — the bogus
    // candidate must be rejected (checkpointMetadata.version mismatch)
    // and replay must land on the true state
    val manifests = logDir.listFiles().filter(_.getName.matches(
      raw"\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet")).sortBy(_.getName)
    val good = manifests.last
    val bogus = new java.io.File(logDir,
      good.getName.replaceFirst(raw"^\d{20}", f"${4L}%020d"))
    java.nio.file.Files.copy(good.toPath, bogus.toPath)
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${4L}%020d.json").toPath,
      """{"commitInfo":{"timestamp":1700000009000,"operation":"NOOP"}}
        |""".stripMargin.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try {
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, dir).toDF.count() == src.count() + 3)
      assert(DeltaTable.forPath(spark, dir).snapshot.version == 4)
    } finally {
      bogus.delete()
      new java.io.File(logDir, f"${4L}%020d.json").delete()
      DeltaLog.clearCache()
    }
  }

  test("misplaced v2 manifest is refused; reader falls back to older checkpoint") {
    val p = ForeignFixtures.v2checkpointed(spark, sfDir)
    val logDir = new java.io.File(p, "_delta_log")
    val good = logDir.listFiles().find(_.getName.matches(
      raw"\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet")).get
    // copy the v1 manifest to a v2-named one (a misplaced/corrupt write):
    // its checkpointMetadata.version=1 contradicts the v2 name, so the
    // candidate must be rejected and replay must fall back to the REAL v1
    // checkpoint + the v2 commit json — same final state, never a misread
    val bogus = new java.io.File(logDir,
      good.getName.replaceFirst(raw"^\d{20}", f"${2L}%020d"))
    java.nio.file.Files.copy(good.toPath, bogus.toPath)
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${2L}%020d.json").toPath,
      """{"commitInfo":{"timestamp":1700000003000,"operation":"NOOP"}}
        |""".stripMargin.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try {
      DeltaLog.clearCache()
      val got = DeltaTable.forPath(spark, p).toDF
      assert(got.count() ==
        Fixtures.readNormalized(spark, sfDir, "part").count())
      assert(DeltaTable.forPath(spark, p).snapshot.version == 2)
    } finally {
      bogus.delete()
      new java.io.File(logDir, f"${2L}%020d.json").delete()
      DeltaLog.clearCache()
    }
  }

  test("in-commit timestamps drive time travel; ICT appends stay monotone") {
    val p = ForeignFixtures.inCommitTimestamps(spark, sfDir)
    val src = Fixtures.readNormalized(spark, sfDir, "nation")
    val log = DeltaLog.forPath(spark, p)
    // probe between ICT0 (1600000000000) and ICT1 (1600000600000): the
    // decoy commitInfo.timestamp fields are ~1000 days later and the
    // files' real modTimes are "now" — only the ICT field resolves v0
    assert(log.versionAtTimestamp(1600000300000L) == 0L)
    assert(log.versionAtTimestamp(1600000600000L) == 1L)
    assert(log.versionAtTimestamp(1600009999999L) == 2L)
    val v0 = DeltaTable.forPath(spark, p).toDF(0L)
    assert(v0.count() == src.filter(org.apache.spark.sql.functions.col("n_nationkey") % 2 === 0).count())
    assert(DeltaTable.forPath(spark, p).toDF.count() == src.count())
    // history reports the ICT, not the decoy
    val hist = DeltaTable.forPath(spark, p).history().collect()
    assert(hist.map(_.getAs[Long]("timestamp")).toSet ==
      Set(1600000000000L, 1600000600000L, 1600001200000L))
    // ICT WRITE: our append to (a COPY of — the fixture is cached) the
    // foreign ICT table must stamp a monotone in-commit timestamp —
    // strictly above the (far-future-decoyed) v2 ICT even though
    // wall-clock "now" is far below it
    val pc = {
      val dst = java.nio.file.Files.createTempDirectory("graft-ictw").toString + "/t"
      val srcP = java.nio.file.Paths.get(p)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(srcP).iterator().asScala.foreach { f =>
        val t = java.nio.file.Paths.get(dst, srcP.relativize(f).toString)
        if (java.nio.file.Files.isDirectory(f)) java.nio.file.Files.createDirectories(t)
        else { java.nio.file.Files.createDirectories(t.getParent); java.nio.file.Files.copy(f, t) }
      }
      dst
    }
    graft.delta.DeltaWriter.append(spark,
      src.select("n_nationkey", "n_name", "n_regionkey").limit(1), pc)
    DeltaLog.clearCache()
    val log2 = DeltaLog.forPath(spark, pc)
    val hist2 = DeltaTable.forPath(spark, pc).history().collect()
      .map(r => r.getAs[Long]("version") -> r.getAs[Long]("timestamp")).toMap
    assert(hist2(3L) > hist2(2L), s"ICT not monotone: $hist2")
    assert(hist2(3L) == 1600001200001L || hist2(3L) >= System.currentTimeMillis() - 3600000,
      s"v3 ICT neither prev+1 nor wall clock: ${hist2(3L)}")
    // time travel resolves the new commit through its ICT
    assert(log2.versionAtTimestamp(hist2(3L)) == 3L)
  }

  test("enabling ICT via ALTER stamps the feature + enablement provenance") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ict").toString + "/t"
    val src = Fixtures.readParquet(spark, sfDir, "region")
    DeltaWriter.append(spark, src, dir)
    Alter.setProperties(spark, DeltaLog.forPath(spark, dir),
      Map("delta.enableInCommitTimestamps" -> "true"))
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.protocol.writerFeatures.exists(_.contains("inCommitTimestamp")),
      snap.protocol.toString)
    assert(snap.metadata.configuration
      .get("delta.inCommitTimestampEnablementVersion").contains("1"))
    // the enabling commit and every later one carry ICTs; v0 has none
    DeltaWriter.append(spark, src.limit(1), dir)
    val byV = DeltaLog.forPath(spark, dir).commitHistory()
      .map(h => h._1 -> h._2).toMap
    val v1 = DeltaLog.forPath(spark, dir).readCommit(1L)
      .flatMap(_.commitInfo).head
    val v2 = DeltaLog.forPath(spark, dir).readCommit(2L)
      .flatMap(_.commitInfo).head
    assert(v1.inCommitTimestamp.isDefined && v2.inCommitTimestamp.isDefined)
    assert(v2.inCommitTimestamp.get > v1.inCommitTimestamp.get)
    val v0 = DeltaLog.forPath(spark, dir).readCommit(0L).flatMap(_.commitInfo).head
    assert(v0.inCommitTimestamp.isEmpty)
  }

  test("ICT at create: feature stamped, DML commits stay monotone") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ict2").toString + "/t"
    val src = Fixtures.readParquet(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    DeltaWriter.append(spark, src, dir,
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.delete(col("n_nationkey") % 2 === 0)                                 // v1
    t.update(col("n_nationkey") === 1, Map("n_name" -> lit("x")))          // v2
    graft.delta.Optimize.compact(spark, DeltaLog.forPath(spark, dir))      // maybe v3
    DeltaLog.clearCache()
    val log = DeltaLog.forPath(spark, dir)
    assert(log.update().protocol.writerFeatures.exists(_.contains("inCommitTimestamp")))
    val icts = log.listCommitVersions().map(v =>
      log.readCommit(v).flatMap(_.commitInfo).head.inCommitTimestamp)
    assert(icts.forall(_.isDefined), icts.toString)
    val vals = icts.flatten
    assert(vals == vals.sorted && vals.distinct == vals, s"ICTs not monotone: $vals")
  }
}

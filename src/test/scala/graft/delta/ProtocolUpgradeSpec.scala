package graft.delta

import org.scalatest.funsuite.AnyFunSuite

/** Legacy→table-features protocol upgrades must carry every feature the
  * legacy version IMPLIED (Delta protocol "Table Features" upgrade rule);
  * the implied list lives in ONE place
  * ([[ProtocolGate.legacyImpliedWriterFeatures]]) shared by every upgrade
  * path — ADVICE r9: the two hand-kept copies stopped at writer version 4,
  * so upgrading a (2,5) column-mapped table silently dropped columnMapping
  * while delta.columnMapping.mode stayed set (protocol/metadata
  * inconsistency spec-conformant writers reject). */
class ProtocolUpgradeSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  test("featureUpgrade from legacy (2,5)/(2,6) implies columnMapping/identityColumns") {
    val p25 = Protocol(minReaderVersion = 2, minWriterVersion = 5)
    val up = Alter.featureUpgrade(p25, Seq("rowTracking")).get
    assert(up.minWriterVersion == 7)
    val w = up.writerFeatures.get.toSet
    assert(w.contains("columnMapping"), s"columnMapping dropped: $w")
    assert(Set("appendOnly", "invariants", "checkConstraints",
      "changeDataFeed", "generatedColumns", "rowTracking").subsetOf(w))
    assert(!w.contains("identityColumns")) // writer version 6 feature, not implied at 5

    val up6 = Alter.featureUpgrade(
      Protocol(minReaderVersion = 2, minWriterVersion = 6), Seq("deletionVectors")).get
    assert(up6.writerFeatures.get.toSet.contains("identityColumns"))
    assert(up6.writerFeatures.get.toSet.contains("columnMapping"))
  }

  test("DV-delete protocol upgrade shares the implied list (2,5 keeps columnMapping)") {
    val p25 = Protocol(minReaderVersion = 2, minWriterVersion = 5)
    val meta = Metadata(id = "t",
      schemaString = new org.apache.spark.sql.types.StructType()
        .add("a", org.apache.spark.sql.types.IntegerType).json)
    val log = DeltaLog.forPath(spark,
      java.nio.file.Files.createTempDirectory("graft-proto").toString + "/t")
    val snap = new Snapshot(log, 0L, p25, meta, Nil, Map.empty, Nil)
    val np = DeltaDelete.protocolUpgradeActions(snap).head.protocol.get
    assert(np.minReaderVersion == 3 && np.minWriterVersion == 7)
    assert(np.writerFeatures.get.toSet.contains("columnMapping"))
    assert(np.writerFeatures.get.toSet.contains("deletionVectors"))
    assert(np.readerFeatures.get.toSet == Set("columnMapping", "deletionVectors"))
  }

  test("a protocol that already names features implies nothing extra") {
    val named = Protocol(3, 7, Some(Seq("deletionVectors")), Some(Seq("deletionVectors")))
    val upNamed = Alter.featureUpgrade(named, Seq("rowTracking")).get
    assert(upNamed.writerFeatures.get.toSet == Set("deletionVectors", "rowTracking"))
  }
}

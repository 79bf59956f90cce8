package graft.delta

/** A table requires a protocol capability this engine does not implement.
  * Reading anyway could silently return wrong results, so reads fail loudly
  * (the reference surfaces kernel errors the same way,
  * test/sql/main/test_error_messages.test:11-40). */
final class UnsupportedTableFeatureException(msg: String)
  extends UnsupportedOperationException(msg)

/**
 * Protocol gating on read: validate `minReaderVersion` / `readerFeatures`
 * against what this engine ACTUALLY implements before any snapshot is
 * served. A foreign table written with an unhandled reader feature (e.g.
 * v2Checkpoint) must error, not be silently misread.
 */
object ProtocolGate {

  /** Reader versions with fixed capability sets: 1 = base, 2 = column
    * mapping (name + id modes are implemented), 3 = table features. */
  val maxReaderVersion = 3

  /** Reader features this engine implements end-to-end.
    * `v2Checkpoint` = uuid-named manifests + `_sidecars/` file-action
    * parquet (DeltaLog.readV2Checkpoint). `vacuumProtocolCheck` is a
    * readerWriter feature with no read-path semantics, so reads may
    * proceed. Anything else (future column-mapping modes, collations, …)
    * fails loudly rather than risk a silent misread. */
  val supportedReaderFeatures: Set[String] = Set(
    "deletionVectors",
    "columnMapping",
    "timestampNtz",
    "variantType", "variantType-preview",
    "typeWidening", "typeWidening-preview",
    "v2Checkpoint",
    "vacuumProtocolCheck")

  def validate(p: Protocol, tablePath: String): Unit = {
    if (p.minReaderVersion > maxReaderVersion)
      throw new UnsupportedTableFeatureException(
        s"Table $tablePath requires minReaderVersion=${p.minReaderVersion}; " +
          s"this engine supports up to $maxReaderVersion")
    if (p.minReaderVersion >= 3) {
      val requested = p.readerFeatures.getOrElse(Nil).toSet
      val unsupported = requested -- supportedReaderFeatures
      if (unsupported.nonEmpty)
        throw new UnsupportedTableFeatureException(
          s"Table $tablePath requires unsupported reader feature(s) " +
            s"${unsupported.toSeq.sorted.mkString("[", ", ", "]")}; supported: " +
            supportedReaderFeatures.toSeq.sorted.mkString("[", ", ", "]"))
    }
  }
}

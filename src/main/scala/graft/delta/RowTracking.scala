package graft.delta

/**
 * Row tracking (protocol writer feature `rowTracking`): every add action
 * carries a `baseRowId`, and row i of the file has fresh row id
 * baseRowId + i; the highest assigned id is tracked in the
 * `delta.rowTracking` domain metadata (`rowIdHighWaterMark`). Fresh ids
 * are stable under DV deletes (positions never move) — this engine
 * assigns on append/overwrite, preserves the fields through JSON commits
 * AND checkpoints, and REFUSES row-moving operations (UPDATE/MERGE/
 * OPTIMIZE) on row-tracked tables rather than silently breaking id
 * stability ([[ProtocolGate]]).
 *
 * Assignment is pure driver-side bookkeeping over the commit's add
 * actions (numRecords comes from the per-file stats already computed by
 * the write) — zero extra jobs, any commit size.
 */
object RowTracking {

  val DomainName = "delta.rowTracking"

  def enabled(snap: Snapshot): Boolean =
    snap.protocol.writerFeatures.exists(_.contains("rowTracking")) ||
      snap.metadata.configuration.get("delta.enableRowTracking")
        .exists(_.equalsIgnoreCase("true"))

  def enabledAtCreate(configuration: Map[String, String]): Boolean =
    configuration.get("delta.enableRowTracking").exists(_.equalsIgnoreCase("true"))

  /** Current high-water mark (highest assigned row id), -1 when none. */
  def highWaterMark(snap: Snapshot): Long =
    snap.domainMetadata.find(d => d.domain == DomainName && !d.removed)
      .flatMap { d =>
        try Option(ActionJson.mapper.readTree(d.configuration).get("rowIdHighWaterMark"))
          .map(_.asLong)
        catch { case _: Exception => None }
      }.getOrElse(-1L)

  /**
   * Assign `baseRowId` + `defaultRowCommitVersion` to `adds` continuing
   * from `hwm`, and produce the updated domain-metadata action. Files
   * without stats count as empty (our writer always stats real files).
   * Returns (assigned adds, new mark, domain action) — or the input
   * unchanged when nothing needed assigning.
   */
  def assign(adds: Seq[AddFile], hwm: Long, commitVersion: Long)
      : (Seq[AddFile], Long, Option[DomainMetadata]) = {
    var next = hwm + 1
    val assigned = adds.map { a =>
      val n = a.parsedStats.flatMap(_.numRecords).getOrElse(0L)
      val out = a.copy(baseRowId = Some(next),
        defaultRowCommitVersion = Some(commitVersion))
      next += n
      out
    }
    val newHwm = next - 1
    val dm = DomainMetadata(DomainName,
      s"""{"rowIdHighWaterMark":$newHwm}""", removed = false)
    (assigned, newHwm, Some(dm))
  }
}

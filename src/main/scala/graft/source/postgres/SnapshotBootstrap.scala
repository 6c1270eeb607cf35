package graft.source.postgres

import graft.config.StreamDef

/** S7 — snapshot orchestration & crash recovery as a deterministic state
  * machine over an abstract catalog.
  *
  * The reference's contract (reference: src/processor/processor.zig:254-343,
  * src/source/postgres/source.zig:169-286, marker
  * replication_protocol.zig:174-214):
  *
  *  1. A MARKER publication is created BEFORE the slot — a durable
  *     "snapshot in progress" flag.
  *  2. Slot creation exports a snapshot; rows read under it become READ
  *     events stamped with the slot's consistent point.
  *  3. The marker is dropped only after the snapshot fully flushes — so
  *     marker-present-at-startup means an interrupted snapshot: drop the
  *     orphaned slot and redo from a fresh consistent point.
  *  4. Resources read by several read-opted streams are deduplicated.
  *
  * [[Catalog]] abstracts the five side effects; production backs it with
  * JDBC, tests with an in-memory fake — the decision logic is identical and
  * fully covered either way.
  */
object SnapshotBootstrap {

  /** Side-effect boundary (JDBC in production, fake in tests). */
  trait Catalog {
    def markerExists(marker: String): Boolean
    def createMarker(marker: String): Unit
    def dropMarker(marker: String): Unit
    def slotExists(slot: String): Boolean
    /** Returns (consistentPoint, exportedSnapshotName). */
    def createSlot(slot: String): (Long, String)
    def dropSlot(slot: String): Unit
    /** Emit all current rows of `resource` as READ events stamped with
      * `boundaryLsn`, under the exported snapshot. */
    def snapshotResource(resource: String, snapshotName: String, boundaryLsn: Long): Unit
    /** Delivery barrier: returns only when every emitted READ event is
      * durably in the sink (producer flush — processor.zig:336-343). */
    def flushSink(): Unit
  }

  sealed trait Outcome
  /** Snapshot ran (fresh or redo) and streaming starts at `consistentPoint`. */
  final case class Snapshotted(consistentPoint: Long, resources: Seq[String]) extends Outcome
  /** Slot already existed and no marker — clean restart, resume streaming. */
  case object Resumed extends Outcome
  /** No stream opted into READ — slot ensured, no snapshot phase. */
  final case class NoSnapshotNeeded(consistentPoint: Long) extends Outcome

  /** Distinct snapshot resources across read-opted streams
    * (processor.zig:280-298). */
  def readResources(streams: Seq[StreamDef]): Seq[String] =
    streams.filter(_.needsInitialSnapshot).map(_.normalized.resource).distinct

  def run(cat: Catalog, slot: String, streams: Seq[StreamDef],
      marker: String = "graft_snapshot_marker"): Outcome = {
    val resources = readResources(streams)

    // Crash recovery: marker present ⇒ prior snapshot never finished ⇒ the
    // slot (if any) is orphaned mid-snapshot; its consistent point no longer
    // matches what the sink saw. Drop and redo.
    if (cat.markerExists(marker)) {
      if (cat.slotExists(slot)) cat.dropSlot(slot)
      cat.dropMarker(marker)
    }

    if (cat.slotExists(slot)) return Resumed

    if (resources.isEmpty) {
      val (point, _) = cat.createSlot(slot)
      return NoSnapshotNeeded(point)
    }

    cat.createMarker(marker) // durable flag FIRST
    val (point, snapshotName) = cat.createSlot(slot)
    resources.foreach(r => cat.snapshotResource(r, snapshotName, point))
    cat.flushSink() // READ events must be delivered before the flag drops
    cat.dropMarker(marker)
    Snapshotted(point, resources)
  }
}

package graft.streaming

import graft.model.{BlockRef, WriteRequest}
import scala.collection.mutable

/** Driver-side fork tree (reference pipeline.go:190–226, 303–328).
  *
  * Holds the reversible segment of the chain — every block past the last
  * irreversible block (LIB) — keyed by block id, each link carrying the
  * `WriteRequest` payload it produced. Intentionally NOT distributed: the
  * reference bounds this at ~300 blocks (pipeline.go:110), so it is small
  * driver state, exactly like the reference's in-process ForkDB. Reads at a
  * specific block id resolve their speculative overlay by walking parent
  * links back to LIB (`ReversibleSegment`).
  *
  * Thread-safety: synchronized, mirroring the reference's
  * `speculativeReadsLock` RWMutex (pipeline.go:163–164).
  */
final class ForkDB {

  private final case class Link(ref: BlockRef, parentId: String, payload: WriteRequest)

  private val links = mutable.Map.empty[String, Link]
  private var libRef: BlockRef = BlockRef.empty
  private var headRef: BlockRef = BlockRef.empty

  def lib: BlockRef = synchronized(libRef)
  def head: BlockRef = synchronized(headRef)
  def size: Int = synchronized(links.size)

  /** StepNew: link a block into the tree (pipeline.go:340–367). */
  def addLink(ref: BlockRef, parentId: String, payload: WriteRequest): Unit = synchronized {
    links.update(ref.id, Link(ref, parentId, payload))
    if (ref.num >= headRef.num) headRef = ref
  }

  /** The ordered chain (LIB, ref] — oldest first — or None if `ref` does not
    * connect to the LIB (fluxdb.go:125–140 ErrRequestedBlockNotFound). */
  def reversibleSegment(refId: String): Option[Seq[WriteRequest]] = synchronized {
    val acc = mutable.ListBuffer.empty[WriteRequest]
    var cur = refId
    var steps = 0
    while (cur != libRef.id && steps <= links.size) {
      links.get(cur) match {
        case None       => return if (libRef.id.isEmpty && acc.isEmpty) Some(Nil) else None
        case Some(link) => acc.prepend(link.payload); cur = link.parentId; steps += 1
      }
    }
    Some(acc.toSeq)
  }

  /** Speculative writes for a request at `refId` — the reference's
    * `FetchSpeculativeWrites` (pipeline.go:228–265). */
  def speculativeWrites(refId: String): Option[Seq[WriteRequest]] = reversibleSegment(refId)

  /** StepIrreversible: advance the LIB and purge links at or below it,
    * keeping `purgeDepth` blocks of history behind LIB for late readers
    * (pipeline.go:404–431; purge ≥ 200 blocks behind, pipeline.go:426). */
  def moveLIB(newLib: BlockRef, purgeDepth: Int = 200): Unit = synchronized {
    libRef = newLib
    val cutoff = if (newLib.num > purgeDepth) newLib.num - purgeDepth else 0L
    links.filterInPlace { case (_, link) => link.ref.num > cutoff }
  }
}

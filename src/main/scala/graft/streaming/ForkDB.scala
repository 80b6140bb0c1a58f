package graft.streaming

import graft.model.{BlockRef, WriteRequest}
import scala.collection.mutable

/** Result of a speculative-writes fetch, mirroring the reference's
  * (writes, atFinalBlock, err) triple (pipeline.go:228–265). */
sealed trait SpeculativeFetch
object SpeculativeFetch {
  /** `writes` is the ordered overlay (oldest first); `atFinalBlock` is the
    * LIB height the overlay sits on. */
  final case class Writes(writes: Seq[WriteRequest], atFinalBlock: Long)
      extends SpeculativeFetch
  /** ErrNotReady: no head block processed yet. */
  case object NotReady extends SpeculativeFetch
  /** ErrRequestedBlockNotFound: above head, or an id that connects to
    * neither the current chain nor any tracked fork branch. */
  case object RequestedBlockNotFound extends SpeculativeFetch
}

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

  /** Speculative writes for a request at `refId` (by-id form). */
  def speculativeWrites(refId: String): Option[Seq[WriteRequest]] = reversibleSegment(refId)

  /** Full `FetchSpeculativeWrites` parity (pipeline.go:228–265):
    *   - `None` request → the whole current overlay (LIB, head];
    *   - a ref with an id → resolve that id's branch (current chain or a
    *     tracked fork), [[SpeculativeFetch.RequestedBlockNotFound]] if it
    *     connects to neither;
    *   - a BARE block num (`id == ""`) → the current chain truncated at
    *     that num;
    *   - no head processed yet → [[SpeculativeFetch.NotReady]]; a request
    *     above head → RequestedBlockNotFound. */
  def fetchSpeculativeWrites(request: Option[BlockRef] = None): SpeculativeFetch =
    synchronized {
      if (headRef == BlockRef.empty) return SpeculativeFetch.NotReady
      val atFinal = libRef.num
      request match {
        case Some(r) if r.num > headRef.num => SpeculativeFetch.RequestedBlockNotFound
        case None =>
          SpeculativeFetch.Writes(reversibleSegment(headRef.id).getOrElse(Nil), atFinal)
        case Some(r) if r.id == headRef.id || (r.id.isEmpty && r.num == headRef.num) =>
          SpeculativeFetch.Writes(reversibleSegment(headRef.id).getOrElse(Nil), atFinal)
        case Some(r) if r.id.nonEmpty =>
          reversibleSegment(r.id) match {
            case Some(ws) => SpeculativeFetch.Writes(ws, atFinal)
            case None     => SpeculativeFetch.RequestedBlockNotFound
          }
        case Some(r) =>
          // Bare num below head: the current chain's prefix at or below it
          // (fetchSpeculativeWritesForBlockNumInCurrentChain).
          val chain = reversibleSegment(headRef.id).getOrElse(Nil)
          SpeculativeFetch.Writes(chain.takeWhile(_.height <= r.num), atFinal)
      }
    }

  /** StepIrreversible: advance the LIB and purge links at or below it,
    * keeping `purgeDepth` blocks of history behind LIB for late readers
    * (pipeline.go:404–431; purge ≥ 200 blocks behind, pipeline.go:426). */
  def moveLIB(newLib: BlockRef, purgeDepth: Int = 200): Unit = synchronized {
    libRef = newLib
    // The head is the highest block PROCESSED, not the highest reversible
    // one: an all-irreversible stream still becomes "ready"
    // (pipeline.go:137 sets the head on every handled block).
    if (newLib.num >= headRef.num) headRef = newLib
    val cutoff = if (newLib.num > purgeDepth) newLib.num - purgeDepth else 0L
    links.filterInPlace { case (_, link) => link.ref.num > cutoff }
  }
}

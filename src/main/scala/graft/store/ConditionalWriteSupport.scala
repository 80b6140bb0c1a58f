package graft.store

import org.apache.hadoop.fs.Path

/** Optional STORE CAPABILITY: atomic conditional replace — the
  * object-store If-Match precondition (S3 conditional PUT, GCS
  * `ifGenerationMatch`, Azure Blob ETag preconditions) surfaced on the
  * Hadoop `FileSystem` handle graft already holds.
  *
  * What it buys: the manifest protocol's residual mtime-lease TOCTOU
  * family — a takeover racing a woken holder on the generation sidecar,
  * and the escalated merge tail's placeholder→record swap racing a
  * takeover — is CLOSED outright instead of guarded. On a conditional
  * store every contended sidecar replacement is a compare-and-swap on
  * the exact bytes the replacer's ownership judgment read, so a stale
  * writer's late PUT (or a takeover racing a live one) FAILS at the
  * store and surfaces as the ordinary loud conflict, never as sidecar
  * damage. Stores without the capability keep today's guarded behavior:
  * check-to-write re-checks plus head-check-detectable damage (the
  * README "Store requirements" table documents both classes).
  *
  * Implementations adapt the store's native precondition: an S3 adapter
  * maps `expected` to the ETag it observed for those bytes (simple-PUT
  * ETags are content-derived), GCS to the object generation it read,
  * Azure to the blob's ETag. The contract is content-level so the
  * protocol layer stays store-agnostic. The test shim
  * (`ConditionalFileSystem`) implements it with a process lock — same
  * semantics, local store.
  */
trait ConditionalWriteSupport {

  /** Atomically replace `path`'s content with `replacement` iff its
    * CURRENT content equals `expected`. Returns true when the swap
    * landed; false when the precondition failed — the object's content
    * differs, or the object no longer exists. Must be atomic with
    * respect to concurrent `replaceIfMatch` and create calls on the
    * same path (the store's own conditional-PUT arbitration). Never
    * creates the object when absent. */
  def replaceIfMatch(path: Path, expected: Array[Byte],
      replacement: Array[Byte]): Boolean
}

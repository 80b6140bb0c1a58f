package graft

import java.net.URI

import org.apache.hadoop.fs.Path

import graft.store.ConditionalWriteSupport

/** [[RenamelessFileSystem]] plus the conditional-replace capability —
  * models an object store with write preconditions (S3 conditional PUT
  * If-Match, GCS `ifGenerationMatch`, Azure Blob ETag). The CAS is a
  * process-wide lock around read-compare-write: the same linearizable
  * arbitration the store's own precondition machinery provides, local
  * implementation. Everything else (renameless copies, conditional
  * create, fault windows) is inherited, so the protocol specs exercise
  * the FULL object-store posture with the one added capability. */
class ConditionalFileSystem extends RenamelessFileSystem
    with ConditionalWriteSupport {

  override def getScheme: String = ConditionalFileSystem.Scheme
  override def getUri: URI = URI.create(s"${ConditionalFileSystem.Scheme}:///")

  override def replaceIfMatch(path: Path, expected: Array[Byte],
      replacement: Array[Byte]): Boolean =
    ConditionalFileSystem.lock.synchronized {
      ConditionalFileSystem.casAttempts.incrementAndGet()
      if (!exists(path)) {
        ConditionalFileSystem.casRefusals.incrementAndGet()
        return false
      }
      val in = open(path)
      val cur =
        try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      if (!java.util.Arrays.equals(cur, expected)) {
        ConditionalFileSystem.casRefusals.incrementAndGet()
        false
      } else {
        val out = create(path, true)
        try out.write(replacement) finally out.close()
        true
      }
    }
}

object ConditionalFileSystem {
  val Scheme = "condstore"
  private[graft] val lock = new Object
  val casAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
  val casRefusals = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { casAttempts.set(0); casRefusals.set(0) }
}

package graft

import java.net.URI
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** A local FileSystem masquerading as an S3-class object store: `rename`
  * is NOT atomic — it is copy-then-delete (each object copy atomic, the
  * aggregate not), with one-shot fault injection between the halves — and
  * every rename is recorded so a spec can assert what the commit
  * protocol's visibility path actually relies on.
  *
  * The reference delegates commit atomicity to its KV backend
  * (store/kv/store.go:332–467); [[graft.store.ManifestTable]] claims the
  * equivalent safety on stores where rename is a copy — this shim is what
  * turns that design claim into a tested property.
  */
class RenamelessFileSystem extends RawLocalFileSystem {
  override def getScheme: String = RenamelessFileSystem.Scheme
  override def getUri: URI = URI.create(s"${RenamelessFileSystem.Scheme}:///")

  // RawLocalFileSystem's FileStatus loads permissions LAZILY via
  // `new java.io.File(path.toUri)`, which rejects any scheme but "file".
  // Materialize plain statuses (perms are irrelevant to these specs).
  private def eager(st: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime, 0L,
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault, null, null,
      st.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(eager)

  /** Non-overwrite create, per [[RenamelessFileSystem.createMode]] — the
    * primitive [[graft.store.ManifestTable]]'s mutual exclusion rests on:
    *
    *   - [[RenamelessFileSystem.ConditionalCreate]] (default): a true
    *     atomic create-if-absent — HDFS semantics, and S3 once the
    *     connector issues conditional PUTs (If-None-Match). Modeled with
    *     POSIX `createNewFile` (itself atomic).
    *   - [[RenamelessFileSystem.ToctouCreate]]: exists-then-create with
    *     an injectable window between the halves — what a RAW LOCAL
    *     MOUNT (or an S3 connector without conditional create) actually
    *     does; a racer landing in the window is silently overwritten.
    *
    * Both modes fire [[RenamelessFileSystem.armCreateWindow]]'s one-shot
    * hook at their decision point so specs can interleave a second
    * publisher deterministically. */
  /** The mode logic shared by both public create arities: returns true
    * when the caller should proceed with overwrite=true (the object is
    * now ours), throws FileAlreadyExistsException when the store class
    * refuses. Overwrite creates pass straight through. */
  private def admitCreate(f: Path, overwrite: Boolean): Boolean = {
    import RenamelessFileSystem._
    if (overwrite) return false
    createMode match {
      case ToctouCreate =>
        if (exists(f)) throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"$f already exists")
        fireCreateWindow(f) // the TOCTOU gap: a racer creates here
        true // blind — silently overwrites the racer
      case ConditionalCreate =>
        fireCreateWindow(f) // scheduling delay before the atomic PUT
        val local = pathToFile(f)
        Option(local.getParentFile).foreach(_.mkdirs())
        if (!local.createNewFile())
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$f already exists")
        true
    }
  }

  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    val admitted = admitCreate(f, overwrite)
    super.create(f, permission, overwrite || admitted, bufferSize,
      replication, blockSize, progress)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    val admitted = admitCreate(f, overwrite)
    super.create(f, overwrite || admitted, bufferSize, replication,
      blockSize, progress)
  }

  /** Recursive-listing hook: fires [[RenamelessFileSystem.armListWindow]]'s
    * one-shot body before delegating — lets a spec interleave a
    * concurrent cleaner (deleting the listed directory) between a
    * sweep's root listing and its per-directory probe. */
  override def listLocatedStatus(f: Path)
      : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] = {
    RenamelessFileSystem.fireListWindow(f)
    super.listLocatedStatus(f)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    import RenamelessFileSystem._
    val srcIsDir =
      try getFileStatus(src).isDirectory
      catch { case _: java.io.IOException => false }
    renames.add(Rename(src.toUri.getPath, dst.toUri.getPath, srcIsDir))
    maybeFire(FailBeforeCopy, dst, s"before copy $src -> $dst")
    val ok =
      if (srcIsDir)
        FileUtil.copy(this, src, this, dst, false, true, getConf)
      else {
        // SINGLE-object copy is ATOMIC on an S3-class store: a concurrent
        // reader sees the old object or the new one, never partial bytes.
        // A raw streamed copy into `dst` broke exactly that (an async
        // changefeed poll read a half-written `_gen` pointer — a torn
        // read impossible on real object storage), so model the per-object
        // contract: stream to a hidden sibling, promote by POSIX rename.
        // The AGGREGATE copy-then-delete stays non-atomic — that is the
        // hazard this shim exists to inject faults into.
        val tmp = new Path(dst.getParent,
          s".inflight-${java.util.UUID.randomUUID().toString}")
        val copied = FileUtil.copy(this, src, this, tmp, false, true, getConf)
        copied && {
          val promoted = super.rename(tmp, dst) || {
            if (exists(dst)) super.delete(dst, false)
            super.rename(tmp, dst)
          }
          if (!promoted) super.delete(tmp, false)
          promoted
        }
      }
    maybeFire(FailBetweenCopyAndDelete, dst,
      s"after copy, before delete of $src -> $dst")
    if (ok) delete(src, true)
    ok
  }
}

object RenamelessFileSystem {
  val Scheme = "renameless"

  final case class Rename(src: String, dst: String, srcIsDir: Boolean)

  sealed trait FailMode
  case object NoFail extends FailMode
  /** Rename fails outright — nothing reached the destination. */
  case object FailBeforeCopy extends FailMode
  /** The copy landed whole (object PUTs are atomic) but the source was
    * never deleted and the caller saw a failure — the classic non-atomic
    * rename window. */
  case object FailBetweenCopyAndDelete extends FailMode

  /** How non-overwrite `create` behaves — which store class is modeled. */
  sealed trait CreateMode
  /** Atomic create-if-absent: HDFS, or S3 with conditional PUT enabled. */
  case object ConditionalCreate extends CreateMode
  /** exists-then-create with a real window: raw local mounts / connectors
    * without conditional create — the documented UNSAFE posture. */
  case object ToctouCreate extends CreateMode

  @volatile var createMode: CreateMode = ConditionalCreate

  @volatile private var windowBody: () => Unit = () => ()
  @volatile private var windowSuffix: Option[String] = None

  /** Arm a ONE-SHOT interleave fired inside the next non-overwrite create
    * whose path ends with `suffix` — at the TOCTOU gap (Toctou mode) or
    * just before the atomic PUT (Conditional mode). */
  def armCreateWindow(suffix: String)(body: => Unit): Unit = {
    windowBody = () => body
    windowSuffix = Some(suffix)
  }

  private def fireCreateWindow(f: Path): Unit =
    windowSuffix match {
      case Some(sfx) if f.toUri.getPath.endsWith(sfx) =>
        windowSuffix = None // one-shot, disarmed BEFORE the body runs
        val body = windowBody
        windowBody = () => ()
        body()
      case _ => ()
    }

  @volatile private var listBody: () => Unit = () => ()
  @volatile private var listSuffix: Option[String] = None

  /** Arm a ONE-SHOT interleave fired just before the next recursive
    * listing of a path ending with `suffix`. */
  def armListWindow(suffix: String)(body: => Unit): Unit = {
    listBody = () => body
    listSuffix = Some(suffix)
  }

  private def fireListWindow(f: Path): Unit =
    listSuffix match {
      case Some(sfx) if f.toUri.getPath.endsWith(sfx) =>
        listSuffix = None
        val body = listBody
        listBody = () => ()
        body()
      case _ => ()
    }

  @volatile private var armed: FailMode = NoFail
  @volatile private var armedDstSuffix: String = ""
  val renames = new ConcurrentLinkedQueue[Rename]()

  /** Arm a ONE-SHOT fault for the next rename whose destination path ends
    * with `dstSuffix` (empty = any). */
  def arm(mode: FailMode, dstSuffix: String = ""): Unit = {
    armedDstSuffix = dstSuffix
    armed = mode
  }

  def reset(): Unit = {
    armed = NoFail; armedDstSuffix = ""; renames.clear()
    createMode = ConditionalCreate
    windowSuffix = None; windowBody = () => ()
    listSuffix = None; listBody = () => ()
  }

  def recorded: Seq[Rename] = {
    val b = Seq.newBuilder[Rename]
    renames.forEach(r => b += r)
    b.result()
  }

  private def maybeFire(at: FailMode, dst: Path, what: String): Unit =
    if (armed == at &&
      (armedDstSuffix.isEmpty || dst.toUri.getPath.endsWith(armedDstSuffix))) {
      armed = NoFail // one-shot
      throw new java.io.IOException(s"injected object-store fault $what")
    }
}

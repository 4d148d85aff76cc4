package graft.gold

import org.apache.hadoop.fs.{FileSystem, Path}

/** A commit-CAS primitive was requested on a filesystem scheme with no
  * registered atomic backend. This is a deliberate LOUD refusal, not a
  * degraded fallback: Hadoop's `rename`/`create(overwrite=false)` on
  * object-store connectors (s3a, and MinIO behind it — the reference's
  * own substrate, consumer/kafka_to_minio.py:45-51) are client-side
  * checked copy+delete / exists-then-create with no exclusivity, so
  * treating them as CAS would silently void every atomicity guarantee
  * the concurrency protocol makes (two contenders could both "win" a
  * pointer — the exact lost-update class the q249 races pin). Recovery:
  * register a [[CommitBackend]] for the scheme that maps the two
  * primitives onto the store's own conditional-write API (S3
  * `If-None-Match: *` PUT, GCS `x-goog-if-generation-match: 0`, Azure
  * `If-None-Match: *`) via [[CommitCas.register]].
  */
final class UnsupportedCommitStoreException(msg: String)
  extends RuntimeException(msg)

/** The two atomic primitives every pointer store here commits through,
  * implementable per storage scheme:
  *
  *  - [[publish]]: move `tmp` to the fresh name `dst` such that EXACTLY
  *    ONE contender can succeed; `true` iff this contender committed
  *    `dst`. Any return of `false` MUST mean "a contender owns `dst`" —
  *    genuine I/O faults must throw, not report a lost CAS (callers
  *    translate `false` into re-derive/retry loops that would spin
  *    against a commit that never happened).
  *  - [[createExclusive]]: atomically create empty `p` iff absent — the
  *    reservation primitive; same false-means-contended contract.
  *
  * On an object store, both map to ONE conditional PUT (create-if-absent
  * of a small object); [[ConditionalPutBackend]] adapts that single
  * primitive to this interface.
  */
trait CommitBackend {
  def publish(f: FileSystem, tmp: Path, dst: Path): Boolean
  def createExclusive(f: FileSystem, p: Path): Boolean
}

/** Adapter for stores whose native atomic primitive is a conditional
  * "PUT if absent" of object bytes (S3/GCS/Azure conditional writes):
  * implement [[putIfAbsent]] with the store's API and both CAS
  * primitives follow — [[publish]] reads the staged tmp file's bytes
  * (pointer files here are tiny by design: a generation map or
  * `{"gen":N}`) and conditionally PUTs them at `dst`, deleting `tmp`
  * only after a win; [[createExclusive]] is a conditional PUT of an
  * empty object.
  */
abstract class ConditionalPutBackend extends CommitBackend {
  /** Atomically create `dst` with `bytes` iff `dst` is absent; `true`
    * iff this caller created it. Must throw (not return false) on
    * genuine I/O faults.
    */
  def putIfAbsent(f: FileSystem, dst: Path, bytes: Array[Byte]): Boolean

  final def publish(f: FileSystem, tmp: Path, dst: Path): Boolean = {
    val in = f.open(tmp)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](8192)
        var n = in.read(b)
        while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
        buf.toByteArray
      } finally in.close()
    val won = putIfAbsent(f, dst, bytes)
    if (won) f.delete(tmp, false)
    won
  }

  final def createExclusive(f: FileSystem, p: Path): Boolean =
    putIfAbsent(f, p, Array.emptyByteArray)
}

/** The commit-point primitives shared by every pointer store here
  * (SnapshotStore, MultiSnapshot, BaseDelta manifests), dispatched by
  * filesystem scheme through an explicit capability registry — a scheme
  * with no registered backend gets a typed
  * [[UnsupportedCommitStoreException]] instead of a silently non-atomic
  * rename (see that exception's scaladoc for why the refusal is the
  * only safe default on object stores).
  *
  * Built-in backends:
  *
  *  - `file` — commit via hard LINK: `FileSystem.rename` on RawLocal
  *    delegates to POSIX rename(2), which silently REPLACES an existing
  *    destination and reports success — two contenders racing one
  *    version name would both "win" and the second would clobber the
  *    first's committed pointer (observed live in a q249 race). link(2)
  *    is atomic and fails with EEXIST when the target exists.
  *    Reservations use `java.io.File.createNewFile` (O_CREAT|O_EXCL) —
  *    Hadoop's `create(p, false)` on RawLocal is a non-atomic
  *    exists-check-then-create that barrier-synchronized writers
  *    actually hit.
  *  - `hdfs` / `viewfs` — rename to a nonexistent target and
  *    `create(overwrite=false)` are both atomic at the NameNode (the
  *    classic HDFS contracts).
  *
  * Exception discipline (both primitives): only the already-exists
  * family maps to `false` ("lost the CAS"); every other I/O failure
  * (disk full, permissions, connection loss) PROPAGATES — mapping it to
  * false would surface a storage fault as CommitConflictException and
  * send callers into redo loops against a commit that never happened.
  */
private[graft] object CommitCas {

  /** file:// — link(2) commit + O_EXCL reservation. */
  object LinkBackend extends CommitBackend {
    def publish(f: FileSystem, tmp: Path, dst: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        // some local filesystems surface EEXIST as a bare
        // FileSystemException with reason "File exists"
        case e: java.nio.file.FileSystemException
            if Option(e.getReason).exists(_.toLowerCase.contains("file exists")) =>
          false
      }

    def createExclusive(f: FileSystem, p: Path): Boolean =
      new java.io.File(p.toUri.getPath).createNewFile()
  }

  /** NameNode-atomic rename / create(overwrite=false) — HDFS-family. */
  object RenameBackend extends CommitBackend {
    // rename-to-fresh-name reports a contended target by RETURNING
    // false (the HDFS contract); genuine faults throw from the RPC
    def publish(f: FileSystem, tmp: Path, dst: Path): Boolean =
      f.rename(tmp, dst)

    def createExclusive(f: FileSystem, p: Path): Boolean =
      try { f.create(p, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitBackend]()
  registry.put("file", LinkBackend)
  registry.put("hdfs", RenameBackend)
  registry.put("viewfs", RenameBackend)

  /** Register (or replace) the backend for a scheme — how object-store
    * deployments plug their conditional-PUT implementation in (a
    * [[ConditionalPutBackend]] over the store's native conditional
    * write). Returns the previous backend, if any.
    */
  def register(scheme: String, backend: CommitBackend): Option[CommitBackend] =
    Option(registry.put(scheme.toLowerCase, backend))

  /** Remove a registered backend (tests; a removed built-in scheme
    * reverts to the typed refusal).
    */
  def deregister(scheme: String): Option[CommitBackend] =
    Option(registry.remove(scheme.toLowerCase))

  /** The scheme's backend, or the typed loud refusal. */
  def backendFor(f: FileSystem): CommitBackend = {
    val scheme = Option(f.getUri.getScheme).getOrElse("file").toLowerCase
    Option(registry.get(scheme)).getOrElse(
      throw new UnsupportedCommitStoreException(
        s"CommitCas: no atomic commit backend registered for scheme " +
          s"'$scheme' — its FileSystem rename/create(overwrite=false) " +
          "are not exclusive-atomic (on s3a they are client-side-checked " +
          "copy+delete / exists-then-create), so the concurrency " +
          "protocol's commit points would silently stop being CAS. " +
          "Register a ConditionalPutBackend over the store's " +
          "conditional-write API via CommitCas.register(scheme, backend)."))
  }

  /** Move `tmp` to the fresh name `dst`; `true` iff this contender
    * committed it. See [[CommitBackend.publish]] for the contract.
    */
  def publish(f: FileSystem, tmp: Path, dst: Path): Boolean =
    backendFor(f).publish(f, tmp, dst)

  /** Atomic create-no-overwrite — the reservation primitive. */
  def createExclusive(f: FileSystem, p: Path): Boolean =
    backendFor(f).createExclusive(f, p)
}

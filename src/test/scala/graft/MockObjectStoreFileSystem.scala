package graft

import java.net.URI
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

/** A local-disk FileSystem that reproduces the OBJECT-STORE connector
  * semantics the commit protocol must refuse to trust (the s3a shape —
  * the reference's own MinIO substrate): single-file `rename` is a
  * client-side destination check followed by copy+delete, so two racing
  * renamers can BOTH observe dest-absent and both "win"; `create(p,
  * overwrite=false)` inherits RawLocal's exists-check-then-create
  * TOCTOU. Registered under the `mock` scheme via
  * `fs.mock.impl` so specs can address real parquet data through it.
  * Directory renames delegate to POSIX (the committer's task-file moves
  * aren't what's being modeled — the pointer-file commit is).
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    if (getFileStatus(src).isDirectory) return super.rename(src, dst)
    if (exists(dst)) return false // client-side check — the TOCTOU window
    val in = open(src)
    val out = create(dst, true) // non-exclusive PUT, replaces silently
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096)
    finally { in.close(); out.close() }
    delete(src, false)
    true
  }
}

/** The backend an object-store deployment registers: both CAS
  * primitives ride ONE conditional "create iff absent" PUT. Simulated
  * here with POSIX link(2) (atomic, EEXIST on contention) standing in
  * for the store's `If-None-Match: *` PUT — the SPI contract is only
  * that the call is atomic-exclusive and throws on genuine faults.
  */
object MockConditionalPut extends graft.gold.ConditionalPutBackend {
  def putIfAbsent(f: FileSystem, dst: Path,
                  bytes: Array[Byte]): Boolean = {
    val dstP = java.nio.file.Paths.get(dst.toUri.getPath)
    java.nio.file.Files.createDirectories(dstP.getParent)
    val tmp = java.nio.file.Files.createTempFile(
      dstP.getParent, ".condput", ".tmp")
    try {
      java.nio.file.Files.write(tmp, bytes)
      try { java.nio.file.Files.createLink(dstP, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally { java.nio.file.Files.deleteIfExists(tmp); () }
  }
}

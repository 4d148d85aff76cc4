package graft

/** Per-JVM scratch-directory factory: every TRANSIENT state root the
  * engine creates (in-query fixture roots, mutable fixture copies, perf
  * scratch) lands under ONE parent tempdir that a single shutdown hook
  * removes recursively.
  *
  * Why this exists (measured, round 12): bench/verify JVMs used to leak
  * hundreds of `/tmp` entries per run (one `createTempDirectory` per
  * state-building query × runs × queries, never reclaimed). The
  * accumulated directory pressure degraded LATER runs of identical
  * code — the erase-family pair measured 5.4 s on a clean `/tmp` vs
  * 9.8 s after ~4k leaked dirs — which first presented as a phantom
  * per-commit perf regression. One parent entry per JVM, gone at exit,
  * makes bench numbers a function of the code again.
  *
  * The SHARED fixture pool ([[Fixtures.cached]]) is deliberately NOT
  * under this parent — its whole point is surviving the JVM.
  */
object Scratch {

  private lazy val parent: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(p.toFile)))
    p
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRec)
    f.delete()
    ()
  }

  /** A fresh empty directory under the self-cleaning parent. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(parent, prefix).toString
}

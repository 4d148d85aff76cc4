package graft

import org.apache.spark.sql.functions._

/** The fixture cache is load-bearing for correctness (oracle queries
  * read it): builds must be once-per-(version, sf, family), commit via
  * the done-marker, and mutable copies must be fully isolated from the
  * shared cache.
  */
class FixturesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("cached: one build per family, marker-committed, crash-rebuilt") {
    var builds = 0
    val fam = s"spec-${System.nanoTime()}"
    def build(dir: String): Unit = {
      builds += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/payload.txt"), "v1")
    }
    val d1 = Fixtures.cached(spark, sf, fam)(build)
    val d2 = Fixtures.cached(spark, sf, fam)(build)
    assert(d1 == d2 && builds == 1, s"rebuilt a committed fixture ($builds)")
    // a crashed build (marker missing) is rebuilt from scratch
    new java.io.File(d1, "_FIXTURE_DONE").delete()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d1/stale.txt"), "junk")
    Fixtures.cached(spark, sf, fam)(build)
    assert(builds == 2, "uncommitted fixture must rebuild")
    assert(!new java.io.File(d1, "stale.txt").exists(),
      "rebuild must not inherit a crashed build's partial state")
  }

  test("mutableCopy: private, isolated from the shared cache and other copies") {
    val fam = s"spec-copy-${System.nanoTime()}"
    def build(dir: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/payload.txt"), "shared")
    val c1 = Fixtures.mutableCopy(spark, sf, fam)(build)
    val c2 = Fixtures.mutableCopy(spark, sf, fam)(build)
    assert(c1 != c2)
    // the copy's contract is the ENGINE's file lifecycle: files are
    // immutable — a mutation deletes and recreates (new inode), never
    // writes in place (hardlink farms share inodes, so an in-place
    // write would not be isolated; no engine path does one)
    val p1 = java.nio.file.Paths.get(s"$c1/payload.txt")
    java.nio.file.Files.delete(p1)
    java.nio.file.Files.writeString(p1, "mutated")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$c2/payload.txt")) == "shared")
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"${Fixtures.dir(sf, fam)}/payload.txt")) == "shared",
      "a copy's mutation leaked into the shared cache")
    // deleting files from a copy never touches the shared cache
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$c2/payload.txt"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"${Fixtures.dir(sf, fam)}/payload.txt")))
  }

  test("mutableCopy isolation under a REAL engine mutation: erase on a copy leaves the shared fixture byte-identical") {
    import scala.jdk.CollectionConverters._
    def crcSnapshot(root: String): Map[String, Long] = {
      val base = java.nio.file.Paths.get(root)
      java.nio.file.Files.walk(base).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map { p =>
          val crc = new java.util.zip.CRC32()
          crc.update(java.nio.file.Files.readAllBytes(p))
          base.relativize(p).toString -> crc.getValue
        }.toMap
    }
    val shared = Fixtures.search3(spark, sf)
    val sharedDir = Fixtures.dir(sf, "search3")
    val before = crcSnapshot(sharedDir)
    val probe = operators.SearchIndex.search(spark, shared,
      Seq("data", "bank")).collect().toSet
    val copy = Fixtures.search3Copy(spark, sf)
    val docs = Tables.documents(spark, sf)
    operators.SearchIndex.erase(spark, copy,
      docs.filter(pmod(col("doc_id"), lit(3)) === 0).select(col("doc_id")))
    val after = crcSnapshot(sharedDir)
    assert(after == before,
      "erasing a hardlink copy perturbed the shared fixture's bytes")
    assert(operators.SearchIndex.search(spark, shared, Seq("data", "bank"))
      .collect().toSet == probe,
      "shared fixture serving changed after a copy was erased")
  }

  test("mts3 fixture equals a fresh fold of the full log (recipe integrity)") {
    val root = Fixtures.mts3(spark, sf)
    val t = graft.streaming.MultiTableStream.readCommitted(spark, root)
    val ev = Tables.events(spark, sf)
    // the fact upserts every event by unique event_id → row counts match
    assert(t("event_fact").count() == ev.count())
    assert(graft.streaming.MultiTableStream.lastFoldedBatch(spark, root)
      .contains(2L))
    // read-only consumers must not have perturbed the committed state:
    // the previous commit (v2) stays resolvable (q248's contract)
    val c = graft.gold.MultiSnapshot.commitAt(spark, root, 2L)
    assert(c.version == 2L)
  }
}

package graft.gold

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table atomic publish — one commit spanning several snapshot
  * tables, so readers always see a MUTUALLY CONSISTENT set of
  * generations. The single-table [[SnapshotStore]] cannot express the
  * banking invariant that matters across tables: a transactions fact
  * published moments after its accounts dim must not be readable with
  * the OLD dim (phantom FK orphans during the gap). Lakehouse formats
  * grew the same organ (Delta commit coordination / Iceberg's
  * multi-table transactions in the REST catalog); here it is one more
  * pointer level:
  *
  *  - each member table stages its new generation under
  *    `root/<table>/gen=<g>` (durable, invisible — nothing references
  *    it yet);
  *  - ONE coordinator pointer `root/_commit/v<N>` (tmp + rename-to-
  *    fresh-name, the same single-small-file PUT as SnapshotStore —
  *    atomic on HDFS/POSIX and on object stores by the store's own
  *    semantics) maps every table name to its committed generation;
  *  - readers resolve the coordinator ONCE and then touch only
  *    immutable generation dirs — a concurrent publish of ANY subset of
  *    tables cannot tear a multi-table read.
  *
  * Crash isolation: a crash after staging any prefix of the tables
  * leaves orphan generation dirs and the coordinator untouched — readers
  * still see the previous consistent set, and the next publish
  * overwrites the orphans (generation numbers come from the committed
  * coordinator, never from directory listings). Retention mirrors
  * SnapshotStore: the previous commit's generations survive one cycle
  * for in-flight readers; older ones are retired on commit.
  *
  * Partial publishes are legal: tables absent from a `publish` call keep
  * their current generation in the new commit (the common case — the
  * fact advances every batch, the dim only when it changes).
  *
  * Concurrency contract: single writer, any number of readers.
  */
object MultiSnapshot {

  final case class Commit(version: Long, gens: Map[String, Long])

  private def commitRoot(root: String) = s"$root/_commit"
  private def tablePath(root: String, table: String) = s"$root/$table"
  def genPath(root: String, table: String, gen: Long): String =
    s"$root/$table/gen=$gen"

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitFile(root: String, v: Long) =
    new Path(commitRoot(root), f"v$v%020d")

  private def commitVersions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val dir = new Path(commitRoot(root))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case n if n.startsWith("v") && n.drop(1).forall(_.isDigit) => n.drop(1).toLong
    }.sorted
  }

  private def readCommitFile(spark: SparkSession, root: String,
                             v: Long): Commit = {
    val f = fs(spark, root)
    val in = f.open(commitFile(root, v))
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // format: one "table=gen" pair per line — no JSON parser needed,
    // table names are path segments (no '=', '\n')
    val gens = body.linesIterator.filter(_.nonEmpty).map { line =>
      val i = line.lastIndexOf('=')
      require(i > 0, s"MultiSnapshot: malformed commit line '$line' in v$v")
      line.substring(0, i) -> line.substring(i + 1).toLong
    }.toMap
    Commit(v, gens)
  }

  /** The committed state, or None for an unpublished root. */
  def currentCommit(spark: SparkSession, root: String): Option[Commit] =
    commitVersions(spark, root).lastOption
      .map(readCommitFile(spark, root, _))

  /** Cross-table TIME TRAVEL: the commit at `version`, refused loudly
    * when it has been retired (retention keeps the current and previous
    * commit pointers — the in-flight-reader window; an erasure vacuum
    * shrinks it to the current commit only, deliberately: erased state
    * must not be resolvable). The returned commit's generation dirs are
    * immutable, so reads through it are as consistent as the current
    * ones.
    */
  def commitAt(spark: SparkSession, root: String, version: Long): Commit = {
    val vs = commitVersions(spark, root)
    require(vs.contains(version),
      s"MultiSnapshot.commitAt: version $version is not retained at $root " +
        s"(retained: ${vs.mkString(", ")}) — retention keeps the current " +
        "and previous commits; older pointers are retired on publish and " +
        "erasure vacuums everything but current")
    readCommitFile(spark, root, version)
  }

  /** Every table of the retained commit `version` — the consistent
    * multi-table view AS OF that commit (pointer entries excluded, as in
    * [[readAll]]).
    */
  def readAllAt(spark: SparkSession, root: String,
                version: Long): Map[String, DataFrame] = {
    val c = commitAt(spark, root, version)
    c.gens.filterNot(_._1.startsWith(PointerPrefix)).map { case (t, g) =>
      t -> spark.read.parquet(genPath(root, t, g))
    }
  }

  /** Namespace for EXTERNAL-POINTER commit entries ([[publish]]'s
    * `pointers`): committed as `@name=value` lines, so the generic
    * gen-dir machinery (readAll, retirement) never mistakes them for
    * staged tables. [[pointer]] resolves them.
    */
  val PointerPrefix = "@"

  /** The committed pointer value for an external table (e.g. a
    * BaseDelta fact's as-of batch id), if present in the commit.
    */
  def pointer(c: Commit, table: String): Option[Long] =
    c.gens.get(PointerPrefix + table)

  /** Atomically publish new contents for `tables` (a subset of the
    * root's tables; others carry forward). Returns the new commit.
    *
    * `pointers` commits EXTERNAL state references in the SAME atomic
    * flip: each (name, value) lands in the commit file verbatim (under
    * the `@` namespace) with no staging and no retirement here — the
    * O(batch) path for a fact held as a [[BaseDelta]] table, whose
    * durable-but-invisible staging is its own delta dir and whose
    * committed view is `readAt(value)`. Readers resolving the
    * coordinator get the gen tables AND the pointer values of one
    * consistent commit.
    */
  def publish(spark: SparkSession, root: String,
              tables: Map[String, DataFrame],
              pointers: Map[String, Long] = Map.empty): Commit = {
    require(tables.nonEmpty || pointers.nonEmpty,
      "MultiSnapshot.publish: no tables given")
    (tables.keys ++ pointers.keys).foreach(t =>
      require(!t.contains("=") && !t.contains("/") && !t.startsWith("_") &&
        !t.startsWith(PointerPrefix),
        s"MultiSnapshot: illegal table name '$t'"))
    require(tables.keySet.intersect(pointers.keySet).isEmpty,
      "MultiSnapshot.publish: a table cannot be both staged and a pointer")
    val f = fs(spark, root)
    val prev = currentCommit(spark, root)
    val prevGens = prev.map(_.gens).getOrElse(Map.empty)
    // STAGE: durable, invisible; overwrite any orphan from a crashed run
    val staged = tables.map { case (t, df) =>
      val gen = prevGens.getOrElse(t, 0L) + 1
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(genPath(root, t, gen))
      t -> gen
    }
    val newGens = prevGens ++ staged ++
      pointers.map { case (t, v) => (PointerPrefix + t) -> v }
    // COMMIT: one pointer PUT
    val v = prev.map(_.version).getOrElse(0L) + 1
    f.mkdirs(new Path(commitRoot(root)))
    val tmp = new Path(commitRoot(root), f".v$v%020d.tmp")
    val out = f.create(tmp, true)
    try out.write(newGens.toSeq.sortBy(_._1)
      .map { case (t, g) => s"$t=$g" }.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, commitFile(root, v)))
      sys.error(s"MultiSnapshot.publish: commit rename failed for v$v — " +
        "the new generations are NOT committed")
    // RETIRE: generations unreachable from BOTH the new and the previous
    // commit (in-flight readers may still hold the previous), and all but
    // the last two commit pointers
    val keep: Map[String, Set[Long]] = (newGens.keySet ++ prevGens.keySet)
      .map(t => t -> Set(newGens.get(t), prevGens.get(t)).flatten).toMap
    keep.foreach { case (t, keepGens) =>
      val dir = new Path(tablePath(root, t))
      if (f.exists(dir)) f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("gen=") && n.stripPrefix("gen=").forall(_.isDigit) &&
            !keepGens.contains(n.stripPrefix("gen=").toLong))
          f.delete(st.getPath, true)
      }
    }
    commitVersions(spark, root).dropRight(2)
      .foreach(pv => f.delete(commitFile(root, pv), false))
    Commit(v, newGens)
  }

  /** Resolve ONE commit and read every STAGED table from it — the
    * mutually consistent multi-table view. Pointer entries (`@name`)
    * are external state references the caller resolves via [[pointer]]
    * + its own reader (e.g. `BaseDelta.readAt`); they are excluded
    * here because the coordinator holds only their as-of value.
    */
  def readAll(spark: SparkSession, root: String): Map[String, DataFrame] = {
    val c = currentCommit(spark, root).getOrElse(
      sys.error(s"MultiSnapshot.readAll: nothing committed at $root"))
    c.gens.filterNot(_._1.startsWith(PointerPrefix)).map { case (t, g) =>
      t -> spark.read.parquet(genPath(root, t, g))
    }
  }

  /** Retire every generation NOT referenced by the CURRENT commit, and
    * every older commit pointer — the erasure override of the one-cycle
    * retention [[publish]] keeps for in-flight readers: after a
    * subject-erasing publish the pre-erasure generations' bytes must go
    * NOW, not next cycle. Storage-metadata work only; returns deleted
    * paths for the operation ledger.
    */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val c = currentCommit(spark, root).getOrElse(return Seq.empty)
    val keep: Map[String, Set[Long]] = c.gens
      .filterNot(_._1.startsWith(PointerPrefix))
      .map { case (t, g) => t -> Set(g) }
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    keep.foreach { case (t, keepGens) =>
      val dir = new Path(tablePath(root, t))
      if (f.exists(dir)) f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("gen=") && n.stripPrefix("gen=").forall(_.isDigit) &&
            !keepGens.contains(n.stripPrefix("gen=").toLong)) {
          f.delete(st.getPath, true)
          deleted += st.getPath.toString
        }
      }
    }
    commitVersions(spark, root).filterNot(_ == c.version).foreach { v =>
      f.delete(commitFile(root, v), false)
      deleted += commitFile(root, v).toString
    }
    deleted.toSeq
  }

  /** Commit history over the RETAINED window — the DESCRIBE HISTORY
    * analog for the coordinator: one row per (version, table) with the
    * committed generation (or pointer value for `@` members) and
    * per-version flags for which tables ADVANCED in that commit
    * (derivable only inside the retained window — the previous commit is
    * the baseline, so the oldest retained version reports every member
    * as advanced=false/unknown=null). Driver-side metadata only
    * (commit files are small and ≤ retained count).
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val vs = commitVersions(spark, root)
    val commits = vs.map(readCommitFile(spark, root, _))
    val byVersion = commits.map(c => c.version -> c.gens).toMap
    val rows = commits.flatMap { c =>
      val prev = byVersion.get(c.version - 1)
      c.gens.toSeq.map { case (t, g) =>
        val isPointer = t.startsWith(PointerPrefix)
        val advanced: Option[Boolean] = prev.map(p => !p.get(t).contains(g))
        (c.version, if (isPointer) t.stripPrefix(PointerPrefix) else t,
          if (isPointer) "pointer" else "staged", g, advanced)
      }
    }
    rows.toDF("version", "table_name", "member_kind", "generation",
      "advanced_in_version")
  }

  /** One table from the current commit (still coordinator-resolved, so
    * repeated calls within one commit cycle are consistent with
    * [[readAll]] of that commit).
    */
  def read(spark: SparkSession, root: String, table: String): DataFrame = {
    val c = currentCommit(spark, root).getOrElse(
      sys.error(s"MultiSnapshot.read: nothing committed at $root"))
    val g = c.gens.getOrElse(table,
      sys.error(s"MultiSnapshot.read: table '$table' not in commit v${c.version}"))
    spark.read.parquet(genPath(root, table, g))
  }
}

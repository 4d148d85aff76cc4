package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gold.{BaseDelta, MultiSnapshot, SnapshotStore}
import graft.functions.{HashFunctions, PlanHints, VectorFunctions}

/** Incrementally-maintained hyperplane-LSH vector index — the persisted
  * form of [[Similarity.lshTopK]], and the structural counterpoint to
  * the IVF [[VectorIndex]]:
  *
  *  - IVF routes through a DATA-DEPENDENT quantizer (centroids elected
  *    from the corpus), so the routing degrades under embedding drift
  *    and the index needs the whole `Managed`/`refreshQuantizer`
  *    generation machinery to stay healthy.
  *  - LSH routes through DATA-INDEPENDENT hyperplanes (pure functions of
  *    `(table, plane, dim)` via splitmix64), so buckets NEVER go stale:
  *    fold is trivially append-only forever, there is no refresh cycle,
  *    no generation pointer, and no drift alarm to watch. The price is
  *    the other side of the same coin — bucket occupancy can't adapt to
  *    the data (a dense cone of vectors all land together where IVF
  *    would split cells), so per-probe selectivity is tuned only by the
  *    static `(numTables, numPlanes)` choice, frozen at first fold.
  *
  * State is two [[BaseDelta]] tables under one root:
  *
  *  - `vectors` — (id, vec): the raw embeddings, keyed by id. The only
  *    table that holds subject bytes; erasure is keyed here.
  *  - `bands`   — (id, tbl, bucket): one row per (vector, table), ids
  *    only — vectors never ride the bucket rows (the
  *    [[Dedup.embeddingNearDup]] anti-OOM layout, persisted).
  *
  * plus a 1-row frozen `params` snapshot (`numTables`, `numPlanes`):
  * bucket ids are only comparable under one hyperplane family, so the
  * first fold freezes the family and every later fold and serve runs
  * under it — a mismatched fold fails loudly instead of silently
  * splitting the corpus across incompatible bucketings.
  *
  * Fold writes `vectors` first, `bands` last, under one batch id; the
  * replay ledger consults each table independently, so every crash
  * interleaving converges: a crash between the two appends leaves an
  * orphan vectors delta that the replay completes (bands recompute
  * deterministically from the same hyperplanes), and a batch id a
  * table's compaction already floored is skipped on THAT table only —
  * never re-appended, so a post-erasure replay cannot resurrect erased
  * vectors (the [[VectorIndex.fold]] guard, applied per table).
  *
  * Query cost: candidates are bucket-equality matches in any table —
  * expected ≈ numTables · n / 2^numPlanes per query for near-orthogonal
  * corpora; the corpus never shuffles (query bands and the candidate id
  * list ride broadcasts). With `numPlanes = 0` every vector shares one
  * bucket, making the serve EXACTLY brute-force top-k — the
  * SQL-expressible oracle surface (q274), the same role
  * `nProbe = nCells` plays for IVF. Partial-recall serving under real
  * planes is law-bounded (q275's planted-twin recall: identical vectors
  * collide in every table, so twin recall is 1.0 by construction).
  *
  * Contract: each id arrives in exactly one batch (upstream dedup
  * gate); vectors are non-zero (cosine); single fold/maintenance
  * writer, any readers (every commit CAS-serializes; readers serve
  * through [[conflictIfRetired]]).
  */
object LshVectorIndex {

  final case class State(root: String) {
    def vectorsTable: BaseDelta.Table =
      BaseDelta.Table(s"$root/vectors", Seq("id"), Seq("id"), None)
    def bandsTable: BaseDelta.Table =
      BaseDelta.Table(s"$root/bands", Seq("id", "tbl"), Seq("bucket"), None)
    def paramsPath: String = s"$root/params"
  }

  /** Composite retired-state guard over the index's three stores — the
    * reader recipe for serving during concurrent maintenance (an erase's
    * compaction + vacuum can retire files a running query resolved;
    * inside this guard that surfaces as the typed retryable conflict).
    */
  def conflictIfRetired[A](spark: SparkSession, st: State)(body: => A): A =
    MultiSnapshot.retiredGuard(s"LshVectorIndex(${st.root})", () =>
      BaseDelta.stateFingerprint(spark, st.vectorsTable)
        .map { case (k, v) => s"vectors.$k" -> v } ++
        BaseDelta.stateFingerprint(spark, st.bandsTable)
          .map { case (k, v) => s"bands.$k" -> v } ++
        SnapshotStore.currentGen(spark, st.paramsPath)
          .map("params" -> _).toMap)(body)

  /** The frozen (numTables, numPlanes) family, or None before first fold. */
  def params(spark: SparkSession, st: State): Option[(Int, Int)] =
    if (!SnapshotStore.exists(spark, st.paramsPath)) None
    else {
      val r = SnapshotStore.read(spark, st.paramsPath).head()
      Some((r.getAs[Int]("num_tables"), r.getAs[Int]("num_planes")))
    }

  /** Fold one embedding batch (idCol, vecCol) into the index. The first
    * fold freezes the hyperplane family; later folds must pass the same
    * `numTables`/`numPlanes` (loud mismatch, never a silent split).
    */
  def fold(spark: SparkSession, st: State, batch: DataFrame,
           batchId: Long, idCol: String, vecCol: String,
           numTables: Int = 8, numPlanes: Int = 8,
           maxDeltas: Int = 64): Unit = conflictIfRetired(spark, st) {
    require(numTables > 0 && numPlanes >= 0,
      s"LshVectorIndex.fold: numTables $numTables must be > 0, " +
        s"numPlanes $numPlanes must be >= 0")
    // per-table replay ledgers: bands is written LAST, so a batch id
    // applied there implies the whole fold landed; a crash between the
    // two appends re-enters here and completes only the missing side
    def applied(t: BaseDelta.Table): Boolean =
      BaseDelta.deltaBatches(spark, t).contains(batchId) ||
        BaseDelta.timeTravelFloor(spark, t).exists(_ >= batchId)
    if (applied(st.bandsTable) && applied(st.vectorsTable)) return
    if (batch.isEmpty) return
    params(spark, st) match {
      case Some((t, p)) =>
        require(t == numTables && p == numPlanes,
          s"LshVectorIndex.fold: index at ${st.root} froze " +
            s"(numTables=$t, numPlanes=$p) at first fold; " +
            s"got ($numTables, $numPlanes) — bucket ids are only " +
            "comparable under one hyperplane family")
      case None =>
        import spark.implicits._
        if (SnapshotStore.currentGen(spark, st.paramsPath).isEmpty)
          SnapshotStore.publish(
            Seq((numTables, numPlanes)).toDF("num_tables", "num_planes"),
            st.paramsPath)
    }
    val rows = batch.select(col(idCol).as("id"), col(vecCol).as("vec"))
    if (!applied(st.vectorsTable))
      BaseDelta.appendAndMaybeCompact(spark, st.vectorsTable, rows,
        batchId, maxDeltas)
    if (!applied(st.bandsTable)) {
      // map-only: all numTables bucket ids in one native expression
      // pass, then ids-only explode — vectors never ride band rows
      val bands = rows
        .withColumn("__bkts",
          HashFunctions.lshBuckets(col("vec"), numTables, numPlanes))
        .select(col("id"), posexplode(col("__bkts")).as(Seq("tbl", "bucket")))
      BaseDelta.appendAndMaybeCompact(spark, st.bandsTable, bands,
        batchId, maxDeltas)
    }
  }

  /** Top-k nearest indexed vectors per query. (query_id, neighbor_id,
    * cosine, rank) — self-matches excluded, ties broken by neighbor id
    * (q24's cross-engine recipe). `numPlanes = 0` at fold time ≡ exact
    * brute-force top-k.
    *
    * Plan shape: query bands are a UNION of per-table projections (not
    * an explode — Generate is stats-blind, the broadcast_of_generate
    * lint class) so the broadcast decision sees real numbers; the bands
    * table joins that broadcast on (tbl, bucket), candidates dedupe as
    * id pairs, and raw vectors join back via two small-side broadcasts.
    * The corpus never shuffles for scoring.
    */
  def topK(spark: SparkSession, st: State, queries: DataFrame,
           idCol: String, vecCol: String, k: Int, roundTo: Int = 6,
           maxBroadcastQueryBytes: Long = Similarity.MaxBroadcastQueryBytes)
          : DataFrame = {
    val (numTables, numPlanes) = params(spark, st).getOrElse(
      sys.error(s"LshVectorIndex.topK: index at ${st.root} has no frozen " +
        "params — fold at least one batch first"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val qBands = (0 until numTables).map { t =>
      q.select(col("query_id"), lit(t).as("tbl"),
        element_at(
          HashFunctions.lshBuckets(col("qv"), numTables, numPlanes),
          t + 1).as("bucket"))
    }.reduce(_.unionByName(_))
    val cand = BaseDelta.read(spark, st.bandsTable)
      .join(PlanHints.broadcastIfSmall(qBands, maxBroadcastQueryBytes),
        Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"))
      .distinct()
    val scored = BaseDelta.read(spark, st.vectorsTable)
      .join(PlanHints.broadcastIfSmall(cand, maxBroadcastQueryBytes),
        Seq("id"))
      .join(PlanHints.broadcastIfSmall(q, maxBroadcastQueryBytes),
        Seq("query_id"))
      .withColumn("cosine",
        round(VectorFunctions.cosine(col("qv"), col("vec")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("cosine"), col("rank").cast("int").as("rank"))
  }

  /** Right-to-erasure: remove `ids`' rows from BOTH tables via filtered
    * compactions + writer-safe vacuum — serving afterwards is identical
    * to an index that never folded them. The hyperplane family is
    * untouched (it is data-independent — there is nothing OF the
    * subject in it, the exact property that lets LSH skip the
    * [[VectorIndex.eraseManaged]] retired-generation sweep entirely:
    * no generations exist to hold pre-erasure bytes).
    */
  def erase(spark: SparkSession, st: State,
            ids: DataFrame): Unit = conflictIfRetired(spark, st) {
    val subj = broadcast(ids.select(col(ids.columns.head)
      .as("__erase_id")).distinct())
    Seq(st.vectorsTable, st.bandsTable).foreach { t =>
      val bound = BaseDelta.deltaBatches(spark, t).foldLeft(-1L)(_ max _)
      BaseDelta.compact(spark, t, transform = Some(df =>
        df.join(subj, col("id") === col("__erase_id"), "left_anti")))
      BaseDelta.vacuum(spark, t, writerSafeUpTo = Some(bound))
    }
  }

  /** DEFERRED right-to-erasure: immediate legal ack via tombstone
    * ledgers on both tables — serving excludes the ids from this call
    * on, the physical rewrites ride the next compactions. ONE id-level
    * receipt (rows counted on `vectors`, where the subject bytes live;
    * the bands ack is pure metadata — same one-receipt-per-subject
    * stance as the search index's postings/positions/docstats split).
    */
  def eraseLogical(spark: SparkSession, st: State,
                   ids: DataFrame): DataFrame = conflictIfRetired(spark, st) {
    val receipt = BaseDelta.logicalErase(spark, st.vectorsTable, "id", ids)
    BaseDelta.logicalErase(spark, st.bandsTable, "id", ids,
      countRows = false)
    receipt
  }
}

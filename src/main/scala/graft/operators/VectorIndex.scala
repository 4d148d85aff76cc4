package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gold.{BaseDelta, SnapshotStore}
import graft.functions.VectorFunctions

/** Incrementally-maintained IVF vector index — the steady-state form of
  * [[Similarity.ivfTopK]], which re-elects centroids and re-assigns the
  * WHOLE corpus on every call. A continuously-ingesting embedding
  * pipeline instead folds each batch in O(batch) and serves queries from
  * persisted state (the `SearchIndex`/`ClusterIndex` recipe, applied to
  * the ANN family — the one family that still recomputed from scratch):
  *
  *  - `centroids` — the coarse quantizer, elected ONCE from the first
  *    batch ([[Similarity.centroids]]' seeded deterministic election,
  *    optionally Lloyd-refined) and FROZEN behind a [[SnapshotStore]]
  *    generation ledger. Freezing is standard IVF practice (FAISS trains
  *    the quantizer on a sample, then only adds): cell ids stay stable so
  *    postings never need re-assignment; quantizer staleness is a
  *    monitored quantity (`Similarity.embeddingDrift` anchors to exactly
  *    these frozen centroids), and a re-train is a new index root.
  *  - `postings` — a [[BaseDelta]] table of (id, cell_id, vec): each
  *    batch assigns against the BROADCAST frozen centroids (map-only)
  *    and appends ONE delta dir; replayed batch ids overwrite their own
  *    delta (exactly-once by merge + ledger).
  *
  * Query cost: routing = |Q| × nCells broadcast scores; scoring touches
  * only the probed cells' postings via the cell_id hash join against the
  * BROADCAST query frame — the corpus never shuffles for scoring
  * (q24/q115's plan contract, now over persisted state). With
  * `nProbe = nCells` the probe covers every cell, making the result
  * EXACTLY brute-force top-k — the SQL-expressible oracle surface
  * (q244); partial probes trade recall for cells skipped, spec-bounded.
  *
  * Contract: each id arrives in exactly one batch (upstream dedup gate);
  * vectors are non-zero (cosine); single writer, any readers.
  */
object VectorIndex {

  final case class State(root: String) {
    def postingsTable: BaseDelta.Table =
      BaseDelta.Table(s"$root/postings", Seq("id"), Seq("cell_id"), None)
    def centroidsPath: String = s"$root/centroids"
    /** Frozen PQ codebook (micro-unit longs, position-indexed) — present
      * only when the index folds with `pqM > 0`.
      */
    def codebookPath: String = s"$root/codebook"
  }

  private def readCodebook(spark: SparkSession, st: State): Array[Long] =
    SnapshotStore.read(spark, st.codebookPath)
      .orderBy(col("pos")).collect().map(_.getLong(1))

  /** Fold one embedding batch (idCol, vecCol) into the index. The first
    * batch elects and freezes the quantizer (`nCells`, `refineIters`);
    * later batches only assign + append. With `pqM > 0` the first batch
    * also trains and freezes a PQ codebook (`pqM` subspaces × `pqK`
    * codes), and every posting additionally carries its m-code PQ encode
    * — the bytes [[topKAdc]] scans instead of raw vectors. Use the same
    * `pqM`/`pqK` on every fold of one index root.
    */
  def fold(spark: SparkSession, st: State, batch: DataFrame,
           batchId: Long, idCol: String, vecCol: String, nCells: Int = 16,
           refineIters: Int = 0, maxDeltas: Int = 64,
           pqM: Int = 0, pqK: Int = 16): Unit = {
    // replay ledger (delta ids + compaction fold floor): a replayed
    // batch id is a SKIP, not an overwrite — after an [[erase]]
    // compaction, an overwrite under an already-folded id would
    // resurrect erased vectors
    val applied =
      BaseDelta.deltaBatches(spark, st.postingsTable).contains(batchId) ||
        BaseDelta.timeTravelFloor(spark, st.postingsTable).exists(_ >= batchId)
    if (applied) return
    // an empty batch must not elect an empty quantizer (which would
    // blank every later assignment) or stage an unreadable empty delta
    if (batch.isEmpty) return
    if (!SnapshotStore.exists(spark, st.centroidsPath)) {
      val seeded = Similarity.centroids(batch, idCol, vecCol, nCells)
      val cents =
        if (refineIters > 0)
          Similarity.kmeansRefine(batch, idCol, vecCol, seeded, refineIters)
        else seeded
      // ledger: whichever batch observes the missing quantizer publishes
      // generation 1 exactly once; a concurrent replay seeing it
      // published skips (single-writer contract)
      if (SnapshotStore.currentGen(spark, st.centroidsPath).isEmpty)
        SnapshotStore.publish(cents, st.centroidsPath)
    }
    if (pqM > 0 && !SnapshotStore.exists(spark, st.codebookPath)) {
      val cb = Pq.codebookMicro(batch, idCol, vecCol, pqM, pqK)
      import spark.implicits._
      if (SnapshotStore.currentGen(spark, st.codebookPath).isEmpty)
        SnapshotStore.publish(
          cb.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("pos", "v"),
          st.codebookPath)
    }
    val cents = SnapshotStore.read(spark, st.centroidsPath)
    val assigned0 = Similarity
      .assignCells(batch.select(col(idCol), col(vecCol)), cents,
        idCol, vecCol, nProbe = 1)
      .select(col(idCol).as("id"), col("cell_id"), col(vecCol).as("vec"))
    val assigned =
      if (pqM <= 0) assigned0
      else assigned0.withColumn("codes",
        Pq.encode(col("vec"), readCodebook(spark, st), pqM, pqK))
    BaseDelta.appendAndMaybeCompact(spark, st.postingsTable, assigned,
      batchId, maxDeltas)
  }

  /** Top-k nearest indexed vectors per query over the probed cells.
    * (query_id, neighbor_id, cosine, rank) — self-matches excluded, ties
    * broken by neighbor id (engine-exact with `roundTo`-rounded cosine,
    * q24's proven cross-engine recipe). `nProbe = nCells` ≡ exact
    * brute-force top-k.
    */
  def topK(spark: SparkSession, st: State, queries: DataFrame,
           idCol: String, vecCol: String, k: Int, nProbe: Int = 4,
           roundTo: Int = 6): DataFrame = {
    val cents = SnapshotStore.read(spark, st.centroidsPath)
    val q = Similarity.assignCells(
        queries.select(col(idCol), col(vecCol)), cents, idCol, vecCol,
        nProbe = nProbe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell_id"))
    val scored = BaseDelta.read(spark, st.postingsTable)
      .join(broadcast(q), Seq("cell_id"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine",
        round(VectorFunctions.cosine(col("qv"), col("vec")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("cosine"), col("rank").cast("int").as("rank"))
  }

  /** The composed IVF → PQ-ADC → exact-rerank serve over PERSISTED
    * state — [[Similarity.ivfPqTopK]]'s shape (the actual 100 TB ANN
    * path: probed cells scanned as m byte-codes, not d floats; ADC
    * shortlist re-ranked with exact cosine from the stored vectors).
    * Requires the index to have folded with `pqM > 0` (same `pqM`/`pqK`
    * here). Broadcast-only scoring: per-query LUTs and the shortlist
    * both ride broadcasts, postings never shuffle.
    */
  def topKAdc(spark: SparkSession, st: State, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int = 4,
              shortlist: Int = 64, pqM: Int = 4, pqK: Int = 16,
              roundTo: Int = 6): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cents = SnapshotStore.read(spark, st.centroidsPath)
    val cb = readCodebook(spark, st)
    val q = Similarity.assignCells(
        queries.select(col(idCol), col(vecCol)), cents, idCol, vecCol,
        nProbe = nProbe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell_id"))
      .withColumn("__lut", Pq.lut(col("qv"), cb, pqM, pqK))
    val post = BaseDelta.read(spark, st.postingsTable)
    // ADC pass: code bytes only, within probed cells
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").asc, col("id").asc)
    val short = post.join(broadcast(q), Seq("cell_id"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("__adc", Pq.adc(col("codes"), col("__lut"), pqK))
      .withColumn("__ar", row_number().over(wAdc))
      .filter(col("__ar") <= shortlist)
    // exact re-rank over the shortlist's stored vectors
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    short
      .withColumn("cosine",
        round(VectorFunctions.cosine(col("qv"), col("vec")), roundTo))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("cosine"), col("rank").cast("int").as("rank"))
  }

  /** Right-to-erasure over the index: remove `ids`' postings (vector,
    * cell assignment, PQ codes) via one filtered compaction + vacuum —
    * serving afterwards is identical to an index that never folded those
    * vectors. The frozen quantizer is untouched: centroids are
    * aggregate statistics, not subject rows (same stance as PCA
    * components / IDF tables; retrain to a new root if policy demands
    * it). Folding continues normally — the postings ledger is
    * append-overwrite by batch id, which compaction preserves.
    */
  def erase(spark: SparkSession, st: State, ids: DataFrame): Unit = {
    val subj = broadcast(ids.select(col(ids.columns.head)
      .as("__erase_id")).distinct())
    BaseDelta.compact(spark, st.postingsTable, transform = Some(df =>
      df.join(subj, col("id") === col("__erase_id"), "left_anti")))
    BaseDelta.vacuum(spark, st.postingsTable)
    ()
  }

  /** Number of cells in the frozen quantizer (for `nProbe = nCells`
    * exact serving and recall experiments).
    */
  def nCells(spark: SparkSession, st: State): Int =
    SnapshotStore.read(spark, st.centroidsPath).count().toInt
}

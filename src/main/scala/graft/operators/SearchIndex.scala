package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gold.{BaseDelta, SnapshotStore}

/** Incrementally-maintained BM25 search index — `TextAnalysis.bm25`
  * recomputes corpus statistics from raw text on every call; this keeps
  * the three artifacts a search engine actually persists and folds each
  * document batch in O(batch):
  *
  *  - `postings` — (term_h, doc_id, tf): 64-bit token hashes, one row
  *    per distinct (term, doc). Query-term pruning pushes `term_h IN
  *    (…)` through the merge-on-read aggregate down to the parquet
  *    scans (term_h is a grouping column), so a K-term query opens only
  *    the row groups holding those K hashes — postings for every other
  *    term in the corpus never leave the files.
  *  - `docstats` — (doc_id, dl): the length normalizer.
  *  - `stats` — ONE (n_docs, sum_dl) row behind the SnapshotStore
  *    generation ledger (batch b commits generation b+1 — replays
  *    skip), so N/avgdl never require scanning per-doc state.
  *
  * BM25 statistics are additive (df, N, Σdl all sum across batches),
  * so the folded index scores IDENTICALLY to a from-scratch
  * `bm25` over the accumulated corpus — q202's oracle runs the full
  * posting-list SQL and the fold must match it hash-exactly. Token
  * hashes ride the shuffle instead of term strings (q55/bigramNll's
  * proven no-collision equivalence).
  *
  * Contract: each doc_id arrives in exactly one batch (upstream
  * `Dedup.incrementalExact` is the dedup gate); a replayed batch id is
  * a no-op via the delta-overwrite + generation ledger. Zero-token
  * docs count toward neither N nor avgdl — `bm25`'s semantics.
  *
  * Query cost: O(postings of the query's terms) + a docstats semi-join
  * + one broadcast stats row. Nothing corpus-sized moves.
  */
object SearchIndex {

  final case class State(root: String) {
    def postingsTable: BaseDelta.Table =
      BaseDelta.Table(s"$root/postings", Seq("term_h", "doc_id"), Seq("tf"), None)
    def docstatsTable: BaseDelta.Table =
      BaseDelta.Table(s"$root/docstats", Seq("doc_id"), Seq("dl"), None)
    /** Positional postings — (term_h, doc_id, pos), the phrase-query
      * surface; immutable facts, so the key is the whole row.
      */
    def positionsTable: BaseDelta.Table =
      BaseDelta.Table(s"$root/positions", Seq("term_h", "doc_id", "pos"),
        Seq("one"), None)
    def statsPath: String = s"$root/stats"
  }

  private def round6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Fold one document batch (idCol, textCol) into the index. Replays
    * are no-ops by ledger: the postings table's delta-id list plus its
    * compaction fold boundary record every applied batch (the
    * ClusterIndex recipe) — robust to out-of-band stats republishes
    * ([[erase]] corrects the stats row without consuming a batch id).
    */
  def fold(spark: SparkSession, st: State, batch: DataFrame, batchId: Long,
           idCol: String, textCol: String, maxDeltas: Int = 16): Unit = {
    val applied =
      BaseDelta.deltaBatches(spark, st.postingsTable).contains(batchId) ||
        BaseDelta.timeTravelFloor(spark, st.postingsTable).exists(_ >= batchId)
    if (applied) return
    val tk = TextAnalysis.tokens(col(textCol))
    val docs = batch.select(col(idCol).as("doc_id"),
        when(length(trim(col(textCol))) === 0, lit(0L))
          .otherwise(size(tk).cast("long")).as("dl"),
        tk.as("__tk"))
      .filter(col("dl") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val postings = docs
        .select(col("doc_id"), explode(col("__tk")).as("__tok"))
        .groupBy(xxhash64(col("__tok")).as("term_h"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      BaseDelta.appendAndMaybeCompact(spark, st.postingsTable, postings,
        batchId, maxDeltas)
      BaseDelta.appendAndMaybeCompact(spark, st.docstatsTable,
        docs.select("doc_id", "dl"), batchId, maxDeltas)
      val positions = docs
        .select(col("doc_id"), posexplode(col("__tk")).as(Seq("pos", "__tok")))
        .select(xxhash64(col("__tok")).as("term_h"), col("doc_id"),
          col("pos").cast("long").as("pos"), lit(1L).as("one"))
      BaseDelta.appendAndMaybeCompact(spark, st.positionsTable, positions,
        batchId, maxDeltas)
      // the batch-applied ledger above already guards replays, so the
      // stats row simply accumulates (its generation number is NOT the
      // ledger — erasure corrections may bump it out of band)
      val delta = docs.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      val merged =
        if (SnapshotStore.exists(spark, st.statsPath))
          SnapshotStore.read(spark, st.statsPath).unionByName(delta)
            .agg(sum(col("n_docs")).as("n_docs"),
              sum(col("sum_dl")).as("sum_dl"))
        else delta
      SnapshotStore.publish(merged, st.statsPath)
      ()
    } finally docs.unpersist()
  }

  /** Right-to-erasure over the INDEX: remove every trace of `docIds`
    * from postings, positions, docstats, and the corpus statistics —
    * search results after an erasure are bit-identical to an index that
    * never saw those documents (spec-pinned against `bm25` over the
    * surviving corpus). Implementation: each state table compacts with
    * an anti-join filter (one rewrite per table, vacuumed so the bytes
    * go now), and the stats row RECOMPUTES from the surviving docstats —
    * O(current index), the erasure-op price, never paid on the fold
    * path. Folding continues normally afterwards: the fold ledger reads
    * applied batch ids from the postings deltas/fold-floor, which the
    * erasure compaction preserves monotonically.
    *
    * At 100 TB the rewrite dominates, so BATCH subject requests: one
    * `erase` call with the accumulated id set pays the same rewrite as
    * one id — GDPR's 30-day window is the amortization budget every
    * production erasure pipeline uses (Perf `gov-r8` measures the
    * one-shot cost at 10M docs).
    */
  def erase(spark: SparkSession, st: State, docIds: DataFrame): Unit = {
    val ids = broadcast(docIds.select(col(docIds.columns.head)
      .as("__erase_id")).distinct())
    def drop(t: BaseDelta.Table): Unit = {
      BaseDelta.compact(spark, t, transform = Some(df =>
        df.join(ids, col("doc_id") === col("__erase_id"), "left_anti")))
      BaseDelta.vacuum(spark, t)
    }
    drop(st.postingsTable); drop(st.positionsTable); drop(st.docstatsTable)
    val corrected = BaseDelta.read(spark, st.docstatsTable)
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
    SnapshotStore.publish(corrected, st.statsPath)
    SnapshotStore.vacuum(spark, st.statsPath)
    ()
  }

  /** BM25 scores of every indexed doc matching ≥1 query term —
    * bit-identical to `TextAnalysis.bm25` over the accumulated corpus.
    * Returns (doc_id, n_terms, score); wrap in `.orderBy(desc).limit(k)`
    * for top-k serving (plans as distributed TakeOrdered).
    */
  def search(spark: SparkSession, st: State,
             queryTerms: Seq[String], k1: Double = 1.2,
             b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.distinct
    // normalize + hash the query's terms through the SAME expressions the
    // fold used (tokens = lower(trim(text)) split): an uppercased or
    // whitespace-padded query term must find its postings, not silently
    // match nothing — the bm25-equivalence contract is over normalized
    // terms
    val hashes = spark.createDataFrame(terms.map(Tuple1(_))).toDF("t")
      .select(xxhash64(lower(trim(col("t"))))).collect()
      .map(_.getLong(0)).toSeq.distinct
    val post = BaseDelta.read(spark, st.postingsTable)
      .filter(col("term_h").isin(hashes: _*))
    val stats = SnapshotStore.read(spark, st.statsPath)
      .select(col("n_docs").cast("double").as("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val dfreq = post.groupBy(col("term_h"))
      .agg(count(lit(1)).cast("double").as("df"))
    val dl = BaseDelta.read(spark, st.docstatsTable)
    val idf = log((col("n_docs") - col("df") + lit(0.5))
      / (col("df") + lit(0.5)) + lit(1.0))
    post.join(broadcast(dfreq), Seq("term_h"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("__t6", round6(
        (idf * (col("tf").cast("double") * lit(k1 + 1.0))) /
          (col("tf").cast("double") + lit(k1) * (lit(1.0 - b)
            + lit(b) * (col("dl").cast("double") / col("avgdl")))))
        .cast("decimal(18,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__t6")).cast("double").as("score"))
  }

  /** Exact phrase search from the PERSISTED positional postings — the
    * index-side form of [[TextAnalysis.phraseMatch]]: term i's postings
    * shift to `start = pos − i`, an occurrence is one (doc, start) key
    * present in every term frame. The `term_h IN (…)` prune reaches the
    * positional table's scans exactly as in [[search]], so a k-term
    * phrase reads only those k hashes' row groups — document text is
    * never touched at query time. Returns (doc_id, n_occurrences);
    * bit-identical to `phraseMatch` over the accumulated corpus (the
    * spec-pinned equivalence).
    */
  def phraseSearch(spark: SparkSession, st: State,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    // same normalization discipline as [[search]]: hash lower(trim(term))
    // so caller casing/padding can't silently zero out a phrase
    val hashes = spark.createDataFrame(phrase.distinct.map(Tuple1(_)))
      .toDF("t").select(col("t"), xxhash64(lower(trim(col("t")))).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pos = BaseDelta.read(spark, st.positionsTable)
      .filter(col("term_h").isin(hashes.values.toSeq: _*))
    val frames = phrase.zipWithIndex.map { case (t, i) =>
      pos.filter(col("term_h") === hashes(t))
        .select(col("doc_id"), (col("pos") - i).as("__start"))
    }
    frames.reduce((a, b) => a.join(b, Seq("doc_id", "__start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }
}

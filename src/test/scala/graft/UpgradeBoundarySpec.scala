package graft

import org.apache.spark.sql.functions._
import graft.gold.{SnapshotStore, StateLedger}
import graft.operators.{SearchIndex, TextAnalysis}

/** Replay semantics ACROSS the ledger-column upgrade boundary: states
  * written by pre-ledger code carry no `__last_batch`/`last_batch`
  * column, and upgrades force a restart whose first action is commonly
  * a replay of the last folded batch. These merges are ADDITIVE (sums,
  * moments, n_docs) — "refold once" is a silent double-count, so the
  * pre-ledger answer must fall back to the round-8 generation-parity
  * check, and must hand over to the true ledger the moment the column
  * exists.
  */
class UpgradeBoundarySpec extends SparkSpec {
  import spark.implicits._

  test("StateLedger: pre-ledger state answers replay via generation parity, not 'refold once'") {
    val path = tmpDir("ledg-upg") + "/s"
    // pre-ledger code folded batch 0 and committed generation 1, no column
    SnapshotStore.publish(Seq(("a", 10L)).toDF("k", "total"), path)
    assert(StateLedger.applied(spark, path, 0L),
      "restart replay of batch 0 would refold into the additive state")
    assert(!StateLedger.applied(spark, path, 1L),
      "parity must not claim batches the state never saw")
    // first post-upgrade fold stamps the column — the ledger takes over
    SnapshotStore.publish(
      StateLedger.stamp(Seq(("a", 14L)).toDF("k", "total"), 1L), path)
    assert(StateLedger.applied(spark, path, 1L))
    assert(!StateLedger.applied(spark, path, 2L))
    // a maintenance republish inflates the generation; the COLUMN still
    // rules — parity must never re-enter once the ledger exists
    SnapshotStore.publish(SnapshotStore.read(spark, path), path)
    assert(!StateLedger.applied(spark, path, 2L),
      "generation inflation re-entered the parity fallback past the upgrade")
    assert(StateLedger.lastBatch(spark, path).contains(1L))
  }

  test("SearchIndex: replaying the last batch over pre-ledger stats does not double-count n_docs/sum_dl") {
    val docs = Seq(
      (1L, "bank account risk"), (2L, "data lake house"),
      (3L, "risk model bank")).toDF("doc_id", "text")
    val st = SearchIndex.State(tmpDir("idx-upg") + "/s")
    SearchIndex.fold(spark, st, docs, 0L, "doc_id", "text")
    val before = SnapshotStore.read(spark, st.statsPath)
      .select("n_docs", "sum_dl").head()
    // simulate a pre-ledger stats row: same numbers, no last_batch column
    SnapshotStore.publish(
      SnapshotStore.read(spark, st.statsPath).drop("last_batch"),
      st.statsPath)
    // upgrade restart replays batch 0 — the per-table delta ledgers skip
    // their writes; stats must skip too (parity fallback), not refold
    SearchIndex.fold(spark, st, docs, 0L, "doc_id", "text")
    val after = SnapshotStore.read(spark, st.statsPath)
      .select("n_docs", "sum_dl").head()
    assert(after == before,
      s"stats double-counted across the upgrade boundary: $before -> $after")
    // serving parity with the from-scratch corpus score survives it all
    val got = SearchIndex.search(spark, st, Seq("bank", "risk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = TextAnalysis.bm25(docs, "doc_id", "text", Seq("bank", "risk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }
}

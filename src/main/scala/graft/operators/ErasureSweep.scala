package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gold.BaseDelta

/** One deletion request, EVERY derived artifact — the sweep a
  * right-to-erasure pipeline actually runs: the subject's rows were
  * erased from the tables (`Erasure.*`), but the search index still
  * scores their tokens, the vector index still returns their
  * embeddings, and the near-dup cluster index still carries their
  * shingle postings. `eraseDerived` sweeps one subject-id frame across
  * all given indexes and returns ONE combined receipt — the audit
  * artifact proving each artifact was evaluated (reference domain:
  * GDPR deletion over banking CDC marts, readme.md:33-41).
  *
  * There is NO shared commit point across the roots (each index is its
  * own storage root with its own atomic protocol), so the sweep is
  * sequential-and-idempotent rather than atomic: every per-tier erase
  * is exact in effect and erasing absent ids is a no-op, so a crash
  * mid-sweep is repaired by re-invoking with the SAME subjects —
  * completed tiers converge (their receipt rows then report
  * `n_subject_rows = 0`), remaining tiers complete.
  *
  * `deferred = true` is the production ack path: search and vector
  * indexes flip tombstone ledgers (milliseconds, serving immediately
  * excludes the subjects, physical rewrite rides the next compaction —
  * `BaseDelta.pendingTombstones` empty is the per-table receipt-upgrade
  * signal). Cluster indexes split the difference: removing a doc can
  * SPLIT a cluster it bridged, so the structural re-pair and the small
  * clusters-table rewrite run eagerly in BOTH modes (serving is exact
  * on return), while deferred mode tombstones the expensive shingle
  * postings instead of rewriting them (mode `deferred_structural`;
  * eager mode stays `eager_structural`).
  *
  * Receipt: one row per artifact —
  * (artifact, root, mode, status, n_subject_rows), where
  * `n_subject_rows` counts the subject's rows found in that artifact's
  * primary state table BEFORE the erase (docstats / vector postings /
  * cluster assignments). The count rides one broadcast semi-join per
  * artifact — O(state scan), negligible next to the rewrite it audits.
  * The per-artifact loop is driver-side over the HANDFUL of artifact
  * roots (bounded by the argument lists, not by data).
  */
object ErasureSweep {

  def eraseDerived(spark: SparkSession, subjects: DataFrame,
                   search: Seq[SearchIndex.State] = Nil,
                   vector: Seq[VectorIndex.State] = Nil,
                   cluster: Seq[ClusterIndex.State] = Nil,
                   managedVector: Seq[VectorIndex.Managed] = Nil,
                   deferred: Boolean = false): DataFrame = {
    val subj = broadcast(subjects.select(col(subjects.columns.head)
      .as("__subject")).distinct())

    def found(df: DataFrame, keyCol: String): Long =
      df.join(subj, col(keyCol) === col("__subject"), "left_semi").count()

    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (String, String, String, String, Long)]

    // each tier's audit count + erase ride that tier's retired-state
    // guard: a concurrent fold's compaction retiring the count's
    // resolved files mid-scan is the typed retryable conflict (retry
    // the whole sweep — it is idempotent), never a raw read failure
    search.foreach { st =>
      SearchIndex.conflictIfRetired(spark, st) {
        val n = found(BaseDelta.read(spark, st.docstatsTable,
          allowSchemaEvolution = true), "doc_id")
        if (deferred) {
          SearchIndex.eraseLogical(spark, st, subj)
          rows += (("search_index", st.root, "deferred", "pending", n))
        } else {
          SearchIndex.erase(spark, st, subj)
          rows += (("search_index", st.root, "eager", "erased", n))
        }
      }
    }
    vector.foreach { st =>
      VectorIndex.conflictIfRetired(spark, st) {
        val n = found(BaseDelta.read(spark, st.postingsTable,
          allowSchemaEvolution = true), "id")
        if (deferred) {
          VectorIndex.eraseLogical(spark, st, subj)
          rows += (("vector_index", st.root, "deferred", "pending", n))
        } else {
          VectorIndex.erase(spark, st, subj)
          rows += (("vector_index", st.root, "eager", "erased", n))
        }
      }
    }
    cluster.foreach { st =>
      ClusterIndex.conflictIfRetired(spark, st) {
        val n = found(ClusterIndex.clusters(spark, st), "id")
        if (deferred) {
          // structural re-labeling is eager (serving exact on return);
          // the expensive postings rewrite rides the tombstone ledger —
          // hence still "pending" until materialized
          ClusterIndex.eraseLogical(spark, st, subj)
          rows += (("cluster_index", st.root, "deferred_structural",
            "pending", n))
        } else {
          ClusterIndex.erase(spark, st, subj)
          rows += (("cluster_index", st.root, "eager_structural", "erased", n))
        }
      }
    }
    // managed (refresh-capable) vector indexes: the active generation
    // erases like a plain vector index, and RETIRED quantizer
    // generations' bytes are destroyed in both modes (see
    // [[VectorIndex.eraseManaged]]) — a deferred ack that left the
    // subject readable in a retired sub-index would not be erasure
    managedVector.foreach { m =>
      VectorIndex.conflictIfRetiredManaged(spark, m) {
        val act = VectorIndex.active(spark, m)
        val n = found(BaseDelta.read(spark, act.postingsTable,
          allowSchemaEvolution = true), "id")
        VectorIndex.eraseManaged(spark, m, subj, deferred)
        val (mode, status) =
          if (deferred) ("deferred", "pending") else ("eager", "erased")
        rows += (("vector_index_managed", m.root, mode, status, n))
      }
    }

    spark.createDataFrame(rows.toSeq)
      .toDF("artifact", "root", "mode", "status", "n_subject_rows")
  }
}

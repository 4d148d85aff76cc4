package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Model-DAG lineage extractor — the `dbt docs` analog (readme.md's
  * documented docs surface; reference models declare lineage via
  * `ref()`/`source()` under banking_dbt/models).
  *
  * dbt derives its DAG from declarations; here the registry IS code, so
  * lineage comes from the ANALYZED logical plans: for each registry query,
  * walk the plan tree, collect every file-source leaf, and map its root
  * path back to a catalog table name. No query executes — plans are
  * analyzed, never run — so this is metadata-only and costs milliseconds
  * per model regardless of data scale.
  *
  * The result is the (model, source_table) edge list a docs site or an
  * impact analysis ("which marts read `events`?") consumes. Queries whose
  * builders have write side effects (the storage-layout demos) should not
  * be passed here — building their DataFrame stages data; stick to the
  * declarative tiers.
  */
object Lineage {

  /** Source-table names read by an already-built DataFrame: every
    * file-relation leaf's root paths, mapped `<dir>/<name>.parquet` →
    * `name`. Sorted + distinct so the edge list is deterministic.
    */
  def sourceTables(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map { p =>
            val base = p.getName
            if (base.endsWith(".parquet")) base.stripSuffix(".parquet") else base
          }.toSeq
        case _ => Seq.empty[String]
      }
    }.flatten.distinct.sorted

  /** The lineage edge list for a set of registry queries: one row per
    * (model, source_table) edge, models in the given order, tables
    * alphabetical within a model.
    */
  def edges(spark: SparkSession, dir: String,
            queryNames: Seq[String]): DataFrame = {
    import spark.implicits._
    queryNames.flatMap { qn =>
      sourceTables(Queries.queries(qn)(spark, dir)).map(t => (qn, t))
    }.toDF("model", "source_table")
  }
}

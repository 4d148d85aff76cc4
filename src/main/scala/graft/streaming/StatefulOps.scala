package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over streams via `flatMapGroupsWithState`
  * (SURVEY.md §2.7) — the operator tier for semantics no built-in
  * aggregation expresses.
  *
  * `KeyedLatest` keeps, per key, the current (latest-by-version) row and
  * emits a change record only when the winner changes: a streaming
  * latest-wins dedup with *incremental* output — unlike
  * `dropDuplicates`, replayed or stale events neither emit nor grow
  * state, and unlike re-running the batch window the output is just the
  * delta. State size is O(keys); at 1000 executors state shards by the
  * grouping key like any keyed state.
  */
object StatefulOps {

  case class KeyedEvent(key: Long, version: Long, value: Double)
  case class KeyedState(version: Long, value: Double)
  case class ChangeRecord(key: Long, version: Long, value: Double, change: String)

  def latestByKey(events: Dataset[KeyedEvent]): Dataset[ChangeRecord] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyedState, ChangeRecord](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[KeyedState]) =>
          val incoming = rows.toSeq
          if (incoming.isEmpty) Iterator.empty
          else {
            val best = incoming.maxBy(e => (e.version, e.value))
            val prior = state.getOption
            if (prior.forall(p => best.version > p.version)) {
              state.update(KeyedState(best.version, best.value))
              Iterator.single(ChangeRecord(key, best.version, best.value,
                if (prior.isEmpty) "insert" else "update"))
            } else Iterator.empty // stale or replayed: no output, no state growth
          }
      }
  }

  /** Convenience: run a DataFrame with (key, version, value) columns
    * through `latestByKey`.
    */
  def latestByKeyDf(df: DataFrame, keyCol: String, versionCol: String,
                    valueCol: String): Dataset[ChangeRecord] = {
    import df.sparkSession.implicits._
    latestByKey(df.select(
      col(keyCol).cast("long").as("key"),
      col(versionCol).cast("long").as("version"),
      col(valueCol).cast("double").as("value")).as[KeyedEvent])
  }
}

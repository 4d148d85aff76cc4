package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Debezium-envelope parsing (SURVEY.md §2 rows 2-3, 12).
  *
  * The reference consumes Kafka JSON envelopes and keeps only
  * `payload.after` — silently dropping deletes
  * (consumer/kafka_to_minio.py:66-70). We keep `op`/`ts_ms` so deletes stay
  * representable (the readme declares delete capture as a goal,
  * readme.md:69); callers filter when they want after-image parity.
  *
  * All parsing is `from_json` on a declarative plan — PERMISSIVE mode keeps
  * malformed rows as a `_corrupt_record` quarantine column instead of
  * failing the batch (the reference's `ON_ERROR='CONTINUE'` semantics,
  * docker/dags/minio_to_snowflake_dag.py:82).
  */
object Envelope {

  val CorruptCol = "_corrupt_record"

  /** Parse a DataFrame with a JSON-string `value` column holding Debezium
    * envelopes into columns: after.*, op, ts_ms, _corrupt_record.
    *
    * Delete events carry `after: null` on the wire; their row image (and in
    * particular the key) lives in `before`. For op='d' rows with a null
    * after-image we surface the before-image columns instead, so tombstones
    * reach downstream merges with a real key — the capability the reference
    * declares but silently drops (readme.md:69 vs kafka_to_minio.py:67-70).
    * Updates never fall back to `before` (their after-image nulls are
    * legitimate values).
    *
    * `passthrough` columns of the raw frame (e.g. the Kafka `topic` for
    * multi-topic routing) are carried into the output unchanged, ahead of
    * the envelope columns.
    */
  def parse(raw: DataFrame, valueCol: String, afterSchema: StructType,
            passthrough: Seq[String] = Nil): DataFrame = {
    val env = graft.model.Schemas.envelope(afterSchema)
      .add(CorruptCol, org.apache.spark.sql.types.StringType)
    val isDelete = col("e.payload.op") === lit("d") && col("e.payload.after").isNull
    raw
      .withColumn("e", from_json(
        col(valueCol), env,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
      .select(
        (passthrough.map(col) ++
          afterSchema.fieldNames.toSeq.map(f =>
          when(isDelete, col(s"e.payload.before.$f"))
            .otherwise(col(s"e.payload.after.$f")).as(f)) ++
          Seq(
            col("e.payload.op").as("op"),
            col("e.payload.ts_ms").as("ts_ms"),
            col(s"e.$CorruptCol").as(CorruptCol))): _*)
  }

  /** Split a parsed frame into (clean, quarantine). Quarantine = rows whose
    * JSON did not parse (SURVEY.md §2 row R1: dead-letter routing).
    */
  def quarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    val bad = parsed.filter(col(CorruptCol).isNotNull)
    val good = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    (good, bad)
  }

  /** After-image rows only — the reference pipeline's behavior (deletes have
    * `after: null` and vanish). `keepDeletes=true` retains op='d' rows for
    * downstream tombstone handling.
    */
  def afterImages(parsed: DataFrame, keyCol: String, keepDeletes: Boolean = false): DataFrame =
    if (keepDeletes) parsed
    else parsed.filter(col("op") =!= lit("d") && col(keyCol).isNotNull)

  /** Typed extraction out of a JSON-string column — the Snowflake
    * `v:field::type` staging idiom (stg_customers.sql:5-9) on Spark:
    * `get_json_object` + try_cast, fully codegen'd. try_cast because
    * Spark 4 ANSI mode would otherwise kill the job on one malformed
    * value — dirty fields surface as nulls for the quarantine checks
    * instead (readme.md:240-247 semantics).
    */
  def jsonField(jsonCol: Column, path: String, castTo: String): Column =
    get_json_object(jsonCol, s"$$.$path").try_cast(castTo)
}

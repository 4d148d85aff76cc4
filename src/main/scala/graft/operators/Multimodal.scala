package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-decoded per partition.
  *
  * The real decode (JPEG/PNG/audio codec) needs native libraries that are
  * not in this container, so `decodeStub` is a clearly-marked deterministic
  * fake — but everything Spark-side is real and tested: the schema shape
  * (binary payload + metadata struct), the batch iteration
  * (`mapPartitions`, so a codec context is initialized once per partition,
  * not per row), the partition sizing, and the projection pushdown (the
  * binary column is only read when the decode projection needs it).
  *
  * At 100 TB: payloads dominate size, so the layout keeps metadata in
  * separate (pushdown-prunable) columns; filters on metadata never touch
  * the payload bytes. Partition sizing: `spark.sql.files.maxPartitionBytes`
  * governs bytes per task — with ~MB-scale payloads, keep default 128 MB
  * so a task holds O(100) payloads in flight.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Wrap a string column as a binary payload (UTF-8) — the test stand-in
    * for reading real media bytes.
    */
  def asPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** STUB — deterministic fake decode. A real build replaces the body with
    * a codec call (e.g. TwelveMonkeys ImageIO / JavaCV); the signature,
    * batching, and output schema are the production shape.
    * "width"/"height" are derived from payload bytes so tests exercise
    * real data flow.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Long, Int, Int) = {
    var sum = 0L
    var i = 0
    val n = math.min(bytes.length, 64)
    while (i < n) { sum += (bytes(i) & 0xff).toLong * (i + 1); i += 1 }
    val w = 64 + (sum % 1024).toInt
    val h = 64 + ((sum / 1024) % 1024).toInt
    (bytes.length, sum, w, h)
  }

  /** Batch feature extraction over the payload column: one decoder
    * "context" per partition, metadata struct per row. Non-payload columns
    * pass through untouched.
    */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val outSchema = inSchema.add(StructField("media_meta", MetaSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (codec context, buffers)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (n, ck, w, h) =
          if (bytes == null) (0, 0L, 0, 0) else decodeStub(bytes)
        Row.fromSeq(r.toSeq :+ Row(n, ck, w, h))
      }
    }(enc)
  }

  /** Frame-sampling shape for video-like payloads: split the payload into
    * fixed-size "frames" and explode — demonstrates the row-explosion
    * pattern (and its partition-size impact) without a real codec.
    */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
                   frameBytes: Int = 256, everyNth: Int = 4): DataFrame =
    df.withColumn("frame_id",
        explode(sequence(lit(0),
          greatest(floor((length(col(payloadCol)) - 1) / frameBytes).cast("int"), lit(0)))))
      .filter(col("frame_id") % everyNth === 0)
      .withColumn("frame",
        col(payloadCol).substr(
          (col("frame_id") * frameBytes + 1).cast("int"), lit(frameBytes)))
}

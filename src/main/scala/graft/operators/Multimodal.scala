package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * The decode is two-tier:
  *  - `MediaHeaders` is a REAL pure-JVM container-header parser — JPEG
  *    (SOF marker scan), PNG (IHDR), GIF (logical screen descriptor) —
  *    needing no native codecs: width/height come from the actual byte
  *    structure of the payload.
  *  - payloads that are not a recognized image container fall back to
  *    `decodeStub`, a clearly-marked deterministic fake (full pixel decode
  *    of arbitrary media needs codec libraries not in this container).
  *
  * Metadata extraction is a native Catalyst expression (`MediaMeta`), not a
  * `mapPartitions` pass: pass-through columns are never deserialized and
  * the stage stays inside whole-stage codegen. `extractFeaturesBatch`
  * keeps the per-partition batch shape for decoders that need a real codec
  * context (init once per partition, not per row).
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
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Audio-tier metadata: real RIFF/WAVE header fields when the payload
    * is a PCM WAV container, zeros + format "unknown" otherwise (the
    * n_bytes/checksum fingerprint is still real there — same contract as
    * the image tier's stub fallback).
    */
  val AudioMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Video-tier metadata: real ISO-BMFF (MP4) box-walk fields when the
    * payload is a parseable container — `ftyp` major brand, `mvhd`
    * timescale/duration, `tkhd` 16.16 fixed-point presentation size,
    * `stsz` sample count — zeros + format "unknown" otherwise (the
    * n_bytes/checksum fingerprint stays real there, matching the image
    * and audio tiers' fallback contract).
    */
  val VideoMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("major_brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))

  /** Pixel-tier output of the batch path: dimensions from the DECODED
    * raster (not the header) + mean Rec.601 luminance. Null when the
    * payload is not a decodable image.
    */
  val PixelSchema: StructType = StructType(Seq(
    StructField("px_width", IntegerType, nullable = false),
    StructField("px_height", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Wrap a string column as a binary payload (UTF-8) — the test stand-in
    * for reading real media bytes.
    */
  def asPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** STUB — deterministic fake decode for non-image payloads. A real build
    * replaces this tier with a codec call (e.g. an ImageIO plugin /
    * JavaCV); "width"/"height" are derived from payload bytes so tests
    * exercise real data flow.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Long, Int, Int) = {
    val sum = checksum64(bytes)
    val w = 64 + (sum % 1024).toInt
    val h = 64 + ((sum / 1024) % 1024).toInt
    (bytes.length, sum, w, h)
  }

  /** Position-weighted sum of the first 64 bytes — the cheap content
    * fingerprint both decode tiers report.
    */
  def checksum64(bytes: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    val n = math.min(bytes.length, 64)
    while (i < n) { sum += (bytes(i) & 0xff).toLong * (i + 1); i += 1 }
    sum
  }

  private def co(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)

  /** Metadata struct for a payload column (native expression; see
    * MediaMeta).
    */
  def mediaMeta(payload: Column): Column = co(MediaMeta(ex(payload)))

  /** Audio metadata struct for a payload column (native expression; see
    * AudioMeta — the second modality on the same codegen'd-kernel
    * pattern).
    */
  def audioMeta(payload: Column): Column = co(AudioMeta(ex(payload)))

  /** Video metadata struct for a payload column (native expression; see
    * VideoMeta — the third modality on the same codegen'd-kernel
    * pattern).
    */
  def videoMeta(payload: Column): Column = co(VideoMeta(ex(payload)))

  /** Feature extraction over the payload column, as a projection: real
    * header-derived dimensions for JPEG/PNG/GIF payloads, stub tier
    * otherwise. Non-payload columns pass through untouched (and never
    * leave columnar/codegen form).
    */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("media_meta", mediaMeta(col(payloadCol)))

  /** Batch form: one decoder context per partition (init once, stream rows
    * through) — and unlike the expression form it runs a REAL full pixel
    * decode: payloads whose container `MediaHeaders` recognizes go through
    * the JDK's `javax.imageio` (PNG/JPEG/GIF readers ship with the JVM, no
    * native libs), adding a `pixel_meta` struct with raster-derived
    * dimensions and mean luminance. `media_meta` stays byte-identical to
    * `extractFeatures`; `pixel_meta` is null for non-images and for image
    * headers whose body doesn't actually decode (truncated/corrupt).
    */
  def extractFeaturesBatch(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val outSchema = inSchema
      .add(StructField("media_meta", MetaSchema))
      .add(StructField("pixel_meta", PixelSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition codec context: ImageIO readers are created once here
      // and reused across the partition's rows (reader init dwarfs per-row
      // work for small payloads). Disposal hangs off task COMPLETION, not
      // iterator exhaustion — a limit()/take() or a downstream failure
      // never drains the iterator, and native-backed readers would leak.
      val decoder = new PixelDecoder
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        // null payload → null structs, matching the expression form exactly
        val (meta, pixel) =
          if (bytes == null) (null, null)
          else MediaHeaders.parse(bytes) match {
            case Some((w, h, fmt)) =>
              (Row(bytes.length, checksum64(bytes), w, h, fmt),
                decoder.decode(bytes, fmt)
                  .map { case (pw, ph, luma) => Row(pw, ph, luma) }.orNull)
            case None =>
              val (n, ck, w, h) = decodeStub(bytes)
              (Row(n, ck, w, h, "unknown"), null)
          }
        Row.fromSeq(r.toSeq :+ meta :+ pixel)
      }
    }(enc)
  }

  /** Perceptual-hash column over image payloads: per-partition codec
    * context (same lifecycle as `extractFeaturesBatch`), 64-bit dHash per
    * decodable payload, null otherwise. Map-only — payload bytes never
    * ride a shuffle; downstream dedup moves only (id, 8-byte hash).
    */
  def dhashFrame(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val idIdx = inSchema.fieldIndex(idCol)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      inSchema(idIdx), StructField("dhash", org.apache.spark.sql.types.LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val decoder = new PixelDecoder
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val h: Any =
          if (bytes == null) null
          else MediaHeaders.parse(bytes) match {
            case Some((_, _, fmt)) => decoder.dhash(bytes, fmt).orNull
            case None => null
          }
        Row(r.get(idIdx), h)
      }
    }(enc)
  }

  /** Near-duplicate image pairs by perceptual hash: dHash each payload,
    * then the same pigeonhole bucket join as SimHash text dedup (a pair
    * within `maxHamming` of 64 bits must agree exactly on one of
    * maxHamming+1 chunks). Undecodable payloads drop out (null hash).
    * Output: (id_a, id_b, hamming).
    */
  def dhashNearDup(df: DataFrame, idCol: String, payloadCol: String = "payload",
                   maxHamming: Int = 6): DataFrame = {
    val chunks = math.min(maxHamming + 1, 8)
    val hashed = dhashFrame(df, idCol, payloadCol)
      .filter(col("dhash").isNotNull)
      .select(col(idCol).as("id"), col("dhash").as("simhash"))
    Dedup.simHashPairs(hashed, chunks = chunks, maxHamming = maxHamming)
  }

  /** Deterministic grayscale PNG encoding of a byte seed (16×16, pixel =
    * seed byte, cyclic): the encode half of the round-trip the harness
    * data lacks real image payloads for. PNG is lossless, so decode
    * recovers the exact pixel grid on any JVM — the dHash downstream sees
    * real codec output, not the seed bytes.
    */
  def pngFromBytes(seed: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < 256) {
      val v = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
      raster.setSample(i % 16, i / 16, 0, v)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** `pngFromBytes` as a column over a string/binary column (UDF tier —
    * encode is demo plumbing, not a hot path).
    */
  def pngPayload(src: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null else pngFromBytes(s.getBytes("UTF-8")))
    f(src)
  }

  /** [[pngFromBytes]] with a PROVABLY BOUNDED perturbation: the four
    * pixels of dHash grid cell (0,0) — x<2, y<2 on the 16×16 raster
    * (column cell = x·9/16, row cell = y·8/16) — are inverted. A cell
    * (r,c) participates only in comparison bits (r,c−1) and (r,c), and
    * cell (0,0) has no left neighbour, so
    * hamming(dhash(original), dhash(perturbed)) ≤ 1 by construction.
    * Planted next to the unperturbed encoding, this gives recall oracles
    * a near-duplicate whose Hamming bound is a theorem, not a tuning.
    */
  def pngFromBytesPerturbed(seed: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < 256) {
      val x = i % 16
      val y = i / 16
      val v = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
      raster.setSample(x, y, 0, if (x < 2 && y < 2) 255 - v else v)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** [[pngFromBytesPerturbed]] as a column (UDF tier, same contract as
    * [[pngPayload]]).
    */
  def pngPayloadPerturbed(src: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null else pngFromBytesPerturbed(s.getBytes("UTF-8")))
    f(src)
  }

  /** A REAL RIFF/WAVE container synthesized deterministically from seed
    * bytes: 8 kHz mono 16-bit PCM, `16 + len(seed) % 480` frames whose
    * samples derive from the seed (testdata carries no audio payloads, so
    * queries synthesize the container and the header parse stays a real
    * byte-structure walk — the q89/pngFromBytes recipe for audio). The
    * frame-count formula is intentionally SQL-derivable from the seed
    * length so a DuckDB oracle can pin every header field exactly.
    */
  def wavFromBytes(seed: Array[Byte]): Array[Byte] = {
    val nFrames = 16 + (seed.length % 480)
    val dataBytes = nFrames * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataBytes)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1)                      // PCM
    buf.putShort(1)                      // mono
    buf.putInt(8000)                     // sample rate
    buf.putInt(8000 * 2)                 // byte rate
    buf.putShort(2)                      // block align
    buf.putShort(16)                     // bits per sample
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataBytes)
    var i = 0
    while (i < nFrames) {
      val b = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
      buf.putShort((((b * 251 + i * 7919) % 65536) - 32768).toShort)
      i += 1
    }
    buf.array()
  }

  /** [[wavFromBytes]] as a column over a string column (UDF tier — the
    * synthesis is demo plumbing like [[pngPayload]], not a hot path; the
    * PARSE side stays a codegen'd expression).
    */
  def wavPayload(src: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null else wavFromBytes(s.getBytes("UTF-8")))
    f(src)
  }

  /** A REAL ISO-BMFF (MP4) container synthesized deterministically from
    * seed bytes: `ftyp` (isom) + a full `moov` tree — `mvhd` (timescale
    * 25), `trak`/`tkhd` (16.16 fixed-point size), `mdia`/`mdhd`/`hdlr`
    * ("vide") and an `stbl` with `stsd`/`stts`/`stsz`/`stco` — plus an
    * `mdat` of one byte per sample. Every field the parser reads is a
    * pure function of the seed LENGTH (SQL-derivable, the
    * wavFromBytes/q269 recipe): n_samples = 25 + len%480 (duration at
    * timescale 25), width = 160 + len%320, height = 120 + len%240,
    * total container size = 413 + n_samples bytes. Box sizes are NOT
    * word-aligned (hdlr is 33 bytes) — ISO-BMFF has no RIFF-style
    * padding, and the parser must not assume it.
    */
  def mp4FromBytes(seed: Array[Byte]): Array[Byte] = {
    val n = 25 + (seed.length % 480)
    val w = 160 + (seed.length % 320)
    val h = 120 + (seed.length % 240)
    val total = 413 + n
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    def unityMatrix(): Unit = {
      buf.putInt(0x00010000); buf.putInt(0); buf.putInt(0)
      buf.putInt(0); buf.putInt(0x00010000); buf.putInt(0)
      buf.putInt(0); buf.putInt(0); buf.putInt(0x40000000)
    }
    // ftyp (24)
    buf.putInt(24); fourcc("ftyp"); fourcc("isom"); buf.putInt(0x200)
    fourcc("isom"); fourcc("mp41")
    // moov (381) = 8 + mvhd(108) + trak(265)
    buf.putInt(381); fourcc("moov")
    //   mvhd v0 (108)
    buf.putInt(108); fourcc("mvhd"); buf.putInt(0) // version 0, flags 0
    buf.putInt(0); buf.putInt(0)                   // creation, modification
    buf.putInt(25); buf.putInt(n)                  // timescale, duration
    buf.putInt(0x00010000)                         // rate 1.0
    buf.putShort(0x0100.toShort)                   // volume 1.0
    buf.putShort(0); buf.putLong(0L)               // reserved
    unityMatrix()
    (0 until 6).foreach(_ => buf.putInt(0))        // pre_defined
    buf.putInt(2)                                  // next_track_ID
    //   trak (265) = 8 + tkhd(92) + mdia(165)
    buf.putInt(265); fourcc("trak")
    //     tkhd v0 (92), flags 3 = enabled|in_movie
    buf.putInt(92); fourcc("tkhd"); buf.putInt(3)
    buf.putInt(0); buf.putInt(0)                   // creation, modification
    buf.putInt(1); buf.putInt(0)                   // track_ID, reserved
    buf.putInt(n)                                  // duration
    buf.putLong(0L)                                // reserved
    buf.putShort(0); buf.putShort(0)               // layer, alternate_group
    buf.putShort(0); buf.putShort(0)               // volume (video: 0), reserved
    unityMatrix()
    buf.putInt(w << 16); buf.putInt(h << 16)       // 16.16 fixed point
    //     mdia (165) = 8 + mdhd(32) + hdlr(33) + minf(92)
    buf.putInt(165); fourcc("mdia")
    //       mdhd v0 (32)
    buf.putInt(32); fourcc("mdhd"); buf.putInt(0)
    buf.putInt(0); buf.putInt(0)                   // creation, modification
    buf.putInt(25); buf.putInt(n)                  // timescale, duration
    buf.putShort(0x55C4.toShort)                   // language "und"
    buf.putShort(0)                                // pre_defined
    //       hdlr (33) — deliberately odd-sized: no RIFF padding in BMFF
    buf.putInt(33); fourcc("hdlr"); buf.putInt(0)
    buf.putInt(0); fourcc("vide")
    buf.putInt(0); buf.putInt(0); buf.putInt(0)    // reserved
    buf.put(0.toByte)                              // empty name (NUL)
    //       minf (92) = 8 + stbl(84)
    buf.putInt(92); fourcc("minf")
    buf.putInt(84); fourcc("stbl")
    buf.putInt(16); fourcc("stsd"); buf.putInt(0); buf.putInt(0)
    buf.putInt(24); fourcc("stts"); buf.putInt(0)
    buf.putInt(1); buf.putInt(n); buf.putInt(1)    // one run: n samples, dur 1
    buf.putInt(20); fourcc("stsz"); buf.putInt(0)
    buf.putInt(1); buf.putInt(n)                   // uniform 1-byte samples, count n
    buf.putInt(16); fourcc("stco"); buf.putInt(0); buf.putInt(0)
    // mdat (8 + n): one seed-derived byte per sample
    buf.putInt(8 + n); fourcc("mdat")
    var i = 0
    while (i < n) {
      val b = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
      buf.put(((b * 131 + i * 31) % 256).toByte)
      i += 1
    }
    buf.array()
  }

  /** [[mp4FromBytes]] as a column over a string column (UDF tier — the
    * synthesis is demo plumbing like [[pngPayload]]/[[wavPayload]]; the
    * PARSE side stays a codegen'd expression).
    */
  def mp4Payload(src: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null else mp4FromBytes(s.getBytes("UTF-8")))
    f(src)
  }

  /** Frame-sampling shape for video-like payloads: split the payload into
    * fixed-size "frames" and explode — demonstrates the row-explosion
    * pattern (and its partition-size impact) without a real codec.
    *
    * The `everyNth` stride rides INSIDE the sequence generator, not a
    * post-explode filter: the generate emits n/everyNth rows instead of
    * n rows with 3/4 discarded — at 100 TB the discarded explosion is
    * real shuffle/codegen work, not noise. Output rows are identical to
    * the filter form (frame ids 0, N, 2N, …).
    */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
                   frameBytes: Int = 256, everyNth: Int = 4): DataFrame =
    df.withColumn("frame_id",
        explode(sequence(lit(0),
          greatest(floor((length(col(payloadCol)) - 1) / frameBytes).cast("int"), lit(0)),
          lit(everyNth))))
      .withColumn("frame",
        col(payloadCol).substr(
          (col("frame_id") * frameBytes + 1).cast("int"), lit(frameBytes)))
}

/** Per-partition pixel-decode context over the JDK's `javax.imageio`: one
  * reusable `ImageReader` per container format, full raster decode per
  * payload. This is the "real codec behind the batch path" tier — PNG,
  * JPEG and GIF decode to actual pixels with zero non-JDK dependencies;
  * genuinely unknown bytes remain the stub tier's job.
  */
final class PixelDecoder {
  private val readers =
    scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]

  /** Full decode: (pixel width, pixel height, mean Rec.601 luminance in
    * [0,255]). None when ImageIO has no reader for `fmt` or the payload
    * body fails to decode (truncated/corrupt image with a valid header).
    */
  def decode(bytes: Array[Byte], fmt: String): Option[(Int, Int, Double)] =
    readImage(bytes, fmt).flatMap { img =>
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) None
      else {
        // getRGB handles every color model uniformly; a throughput-tuned
        // build would read the raster buffer directly per model
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, sum / (w.toLong * h)))
      }
    }

  /** Full raster decode to a BufferedImage, None on unknown format or
    * corrupt body.
    */
  def readImage(bytes: Array[Byte], fmt: String): Option[java.awt.image.BufferedImage] =
    try {
      val reader = readers.getOrElse(fmt, {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (!it.hasNext) return None
        val r = it.next()
        readers.update(fmt, r)
        r
      })
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        val img = reader.read(0)
        if (img.getWidth <= 0 || img.getHeight <= 0) None else Some(img)
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Perceptual difference hash (dHash) over the decoded raster: box-
    * sample the luminance plane to a 9×8 grid (explicit area averaging —
    * NOT Graphics2D scaling, whose interpolation is implementation-
    * defined; this is deterministic across JVMs), then bit (r,c) = 1 iff
    * cell(r,c) > cell(r,c+1). 64 bits; near-identical images differ in a
    * few bits, so hamming distance is the dedup radius. None when the
    * payload doesn't decode.
    */
  def dhash(bytes: Array[Byte], fmt: String): Option[Long] =
    readImage(bytes, fmt).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val cells = Array.ofDim[Double](8, 9)
      val counts = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val r = math.min((y.toLong * 8 / h).toInt, 7)
        var x = 0
        while (x < w) {
          val c = math.min((x.toLong * 9 / w).toInt, 8)
          val rgb = img.getRGB(x, y)
          cells(r)(c) += 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          counts(r)(c) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val l = if (counts(r)(c) == 0) 0.0 else cells(r)(c) / counts(r)(c)
          val rt = if (counts(r)(c + 1) == 0) 0.0 else cells(r)(c + 1) / counts(r)(c + 1)
          if (l > rt) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      hash
    }

  def close(): Unit = {
    readers.values.foreach(_.dispose())
    readers.clear()
  }
}

/** Pure-JVM image container header parsing — no codecs, no native libs:
  * dimensions come straight from the byte layout each format publishes.
  */
object MediaHeaders {

  /** (width, height, format) when `bytes` starts with a recognized image
    * container, else None.
    */
  def parse(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    val png = pngDims(bytes)
    if (png != null) return Some((png(0), png(1), "png"))
    val jpg = jpegDims(bytes)
    if (jpg != null) return Some((jpg(0), jpg(1), "jpeg"))
    val gif = gifDims(bytes)
    if (gif != null) return Some((gif(0), gif(1), "gif"))
    None
  }

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first): 4-byte
    * length, "IHDR", width (BE32 at 16), height (BE32 at 20).
    */
  def pngDims(b: Array[Byte]): Array[Int] = {
    if (b.length < 24) return null
    if (u8(b, 0) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G' ||
        u8(b, 4) != 0x0D || u8(b, 5) != 0x0A || u8(b, 6) != 0x1A || u8(b, 7) != 0x0A)
      return null
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return null
    Array(be32(b, 16), be32(b, 20))
  }

  /** JPEG: FF D8, then marker segments; dimensions live in the first SOFn
    * segment (FF C0..CF excluding C4/C8/CC): [len16][precision8]
    * [height16][width16].
    */
  def jpegDims(b: Array[Byte]): Array[Int] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return null
      // skip fill bytes (FF FF ... FF marker)
      var j = i
      while (j + 1 < b.length && u8(b, j + 1) == 0xFF) j += 1
      if (j + 1 >= b.length) return null  // truncated: ends in FF padding
      val marker = u8(b, j + 1)
      if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        if (j + 8 >= b.length) return null
        return Array(be16(b, j + 7), be16(b, j + 5))  // width, height
      }
      if (marker == 0xD9 || marker == 0xDA) return null  // EOI / scan data: no SOF seen
      // standalone markers carry no length field: RST0-7, TEM, (stray) SOI
      if ((marker >= 0xD0 && marker <= 0xD8) || marker == 0x01) i = j + 2
      else {
        if (j + 3 >= b.length) return null
        i = j + 2 + be16(b, j + 2)
      }
    }
    null
  }

  /** GIF87a/89a: logical screen width (LE16 at 6) and height (LE16 at 8).
    * Caveat: unlike PNG/JPEG, the GIF magic is printable ASCII, so a text
    * payload beginning "GIF89a" collides — inherent to magic-byte
    * sniffing (the `file` utility shares it). The nonzero-dimension check
    * rejects part of that space; callers handling untrusted text corpora
    * should additionally gate on a media-typed column.
    */
  def gifDims(b: Array[Byte]): Array[Int] = {
    if (b.length < 10) return null
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    val w = le16(b, 6); val h = le16(b, 8)
    if (w == 0 || h == 0) return null
    Array(w, h)
  }

  @inline private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL

  /** RIFF/WAVE: "RIFF"[size]"WAVE", then word-aligned chunks
    * `[id4][size LE32][payload]`; the "fmt " chunk carries
    * audioFormat(LE16)=1 for PCM, channels(LE16), sampleRate(LE32),
    * byteRate(LE32), blockAlign(LE16), bitsPerSample(LE16); the "data"
    * chunk's size / blockAlign = frame count. Returns
    * (channels, sampleRate, bitsPerSample, nFrames) or null when the
    * payload is not a parseable PCM WAV. Chunk walk tolerates extra
    * chunks (LIST/INFO/fact) in any order — real encoders emit them —
    * and rejects truncated declarations rather than reading past the
    * buffer.
    */
  def wavMeta(b: Array[Byte]): Array[Long] = {
    if (b.length < 44) return null
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return null
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return null
    var i = 12
    var channels = 0L; var rate = 0L; var bits = 0L; var blockAlign = 0L
    var dataSize = -1L; var haveFmt = false
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      // a declared chunk size larger than the whole buffer is a corrupt/
      // truncated container — reject BEFORE the index math (an unsigned
      // 4 GB size would overflow the Int increment into a loop)
      if (size > b.length.toLong) return null
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return null
        if (le16(b, i + 8) != 1) return null // PCM only
        channels = le16(b, i + 10).toLong
        rate = le32(b, i + 12)
        blockAlign = le16(b, i + 20).toLong
        bits = le16(b, i + 22).toLong
        haveFmt = true
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
          b(i + 3) == 'a') {
        // declared size beyond the buffer = truncated container
        if (i + 8 + size > b.length) return null
        dataSize = size
      }
      i += 8 + size.toInt + (size & 1L).toInt // chunks are word-aligned
    }
    if (!haveFmt || dataSize < 0 || channels == 0 || rate == 0 ||
        blockAlign == 0) return null
    Array(channels, rate, bits, dataSize / blockAlign)
  }

  @inline private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i).toLong & 0xFFFFFFFFL) << 32) |
      (be32(b, i + 4).toLong & 0xFFFFFFFFL)
  @inline private def ascii4(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Mutable accumulator for the ISO-BMFF box walk. */
  private final class Mp4Acc {
    var brand: String = null
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    var nSamples = 0L
    var haveMvhd = false
    var haveTkhd = false
  }

  /** ISO-BMFF (ISO/IEC 14496-12) header walk: boxes are
    * `[size BE32][type 4cc][payload]` with size==1 → 64-bit largesize
    * follows, size==0 → box extends to end of file; container boxes
    * (moov/trak/mdia/minf/stbl) nest. Reads `ftyp` major brand, `mvhd`
    * timescale+duration (version 0 AND 1 layouts), `tkhd` 16.16
    * fixed-point width/height (v0/v1), `stsz` sample count. Unknown
    * boxes (mdat/free/uuid/udta/…) are skipped by declared size; a
    * declared size past the buffer, below the header size, or
    * overflowing is a corrupt/truncated container → null. No word
    * alignment — BMFF boxes pack tightly, unlike RIFF chunks.
    *
    * Returns `[timescale, duration, width, height, nSamples]` via the
    * accumulator; null when not a parseable MP4 (missing ftyp/mvhd/tkhd
    * or structurally corrupt).
    */
  private def mp4Walk(b: Array[Byte], start: Long, end: Long,
                      acc: Mp4Acc): Boolean = {
    var i = start
    while (i + 8 <= end) {
      val ii = i.toInt
      var size: Long = be32(b, ii).toLong & 0xFFFFFFFFL
      var hdr = 8L
      if (size == 1L) {
        if (i + 16 > end) return false
        size = be64(b, ii + 8)
        hdr = 16L
      } else if (size == 0L) size = end - i
      if (size < hdr || size > end - i) return false // corrupt/truncated
      val p = (i + hdr).toInt
      val payloadLen = size - hdr
      ascii4(b, ii + 4) match {
        case "ftyp" =>
          if (payloadLen < 8) return false
          acc.brand = ascii4(b, p)
        case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
          if (!mp4Walk(b, i + hdr, i + size, acc)) return false
        case "mvhd" =>
          val v = u8(b, p)
          if (v == 0) {
            if (payloadLen < 20) return false
            acc.timescale = be32(b, p + 12).toLong & 0xFFFFFFFFL
            acc.duration = be32(b, p + 16).toLong & 0xFFFFFFFFL
          } else if (v == 1) {
            if (payloadLen < 32) return false
            acc.timescale = be32(b, p + 20).toLong & 0xFFFFFFFFL
            acc.duration = be64(b, p + 24)
          } else return false
          acc.haveMvhd = true
        case "tkhd" =>
          val v = u8(b, p)
          val off = if (v == 0) 76 else if (v == 1) 88 else return false
          if (payloadLen < off + 8) return false
          acc.width = be32(b, p + off) >>> 16
          acc.height = be32(b, p + off + 4) >>> 16
          acc.haveTkhd = true
        case "stsz" =>
          if (payloadLen < 12) return false
          acc.nSamples = be32(b, p + 8).toLong & 0xFFFFFFFFL
        case _ => () // skip by size (mdat, free, uuid, stts, stco, …)
      }
      i += size
    }
    true
  }

  /** (timescale, duration, width, height, nSamples, brand) for a
    * parseable MP4 container, null otherwise. Exposed for specs; the
    * expression tier goes through [[videoMeta]].
    */
  def mp4Meta(b: Array[Byte]): (Array[Long], String) = {
    if (b.length < 16) return null
    val acc = new Mp4Acc
    if (!mp4Walk(b, 0L, b.length.toLong, acc)) return null
    if (acc.brand == null || !acc.haveMvhd || !acc.haveTkhd) return null
    (Array(acc.timescale, acc.duration, acc.width.toLong,
      acc.height.toLong, acc.nSamples), acc.brand)
  }

  /** Kernel for the VideoMeta expression (static-forwardable for
    * codegen).
    */
  def videoMeta(bytes: Array[Byte]): InternalRow = {
    val m = mp4Meta(bytes)
    if (m != null)
      InternalRow(bytes.length, Multimodal.checksum64(bytes),
        UTF8String.fromString("mp4"), UTF8String.fromString(m._2),
        m._1(0).toInt, m._1(1), m._1(2).toInt, m._1(3).toInt, m._1(4))
    else
      InternalRow(bytes.length, Multimodal.checksum64(bytes),
        UTF8String.fromString("unknown"), UTF8String.fromString(""),
        0, 0L, 0, 0, 0L)
  }

  /** Kernel for the AudioMeta expression (static-forwardable for
    * codegen).
    */
  def audioMeta(bytes: Array[Byte]): InternalRow = {
    val w = wavMeta(bytes)
    if (w != null)
      InternalRow(bytes.length, Multimodal.checksum64(bytes),
        UTF8String.fromString("wav"), w(0).toInt, w(1).toInt, w(2).toInt,
        w(3))
    else
      InternalRow(bytes.length, Multimodal.checksum64(bytes),
        UTF8String.fromString("unknown"), 0, 0, 0, 0L)
  }

  /** Kernel for the MediaMeta expression (static-forwardable for codegen). */
  def mediaMeta(bytes: Array[Byte]): InternalRow =
    parse(bytes) match {
      case Some((w, h, fmt)) =>
        InternalRow(bytes.length, Multimodal.checksum64(bytes), w, h,
          UTF8String.fromString(fmt))
      case None =>
        val (n, ck, w, h) = Multimodal.decodeStub(bytes)
        InternalRow(n, ck, w, h, UTF8String.fromString("unknown"))
    }
}

/** binary payload → struct<n_bytes, checksum, width, height, format>;
  * header-real for JPEG/PNG/GIF, stub tier otherwise. Codegen is a single
  * static kernel call, so metadata projection stays in whole-stage codegen
  * and pass-through columns are never materialized.
  */
/** binary payload → struct<n_bytes, checksum, format, n_channels,
  * sample_rate, bits_per_sample, n_frames>; header-real for RIFF/WAVE PCM
  * containers, zeroed "unknown" tier otherwise. Same single-static-kernel
  * codegen shape as [[MediaMeta]] — the projection stays inside
  * whole-stage codegen and never leaves columnar form for pass-through
  * columns.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Multimodal.AudioMetaSchema
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.audioMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.operators.MediaHeaders.audioMeta($a);")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"audio_meta needs a binary argument, got $other")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** binary payload → struct<n_bytes, checksum, format, major_brand,
  * timescale, duration, width, height, n_samples>; header-real for
  * ISO-BMFF (MP4) containers via a full box walk, zeroed "unknown" tier
  * otherwise. Same single-static-kernel codegen shape as [[MediaMeta]] /
  * [[AudioMeta]].
  */
case class VideoMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Multimodal.VideoMetaSchema
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.videoMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.operators.MediaHeaders.videoMeta($a);")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"video_meta needs a binary argument, got $other")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MediaMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Multimodal.MetaSchema
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.mediaMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.operators.MediaHeaders.mediaMeta($a);")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"media_meta needs a binary argument, got $other")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

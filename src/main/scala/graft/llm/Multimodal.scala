package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Opaque media payload + typed metadata (the multimodal column contract). */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Output of the (stubbed) decode stage. */
case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
                         height: Long, n_frames: Long)

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The container has no image/audio codecs, so decode is a STUB — a
  * deterministic fake (hash-derived dimensions) clearly marked below.
  * Everything around it is real and scale-shaped: binary columns stay
  * opaque through the plan (no row-level materialization on the
  * driver), metadata extraction is codegen'd expressions, and the
  * per-batch decode boundary is a mapPartitions-style closure that on a
  * real cluster would call into the codec library per executor.
  */
object Multimodal {

  /** Binary metadata extraction over an opaque payload column.
    * Payload synthesized from text (no binary column in the test data);
    * the operator shape — octet length, magic-bytes header sniff — is
    * what a real image/audio table needs.
    */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 8))).as("header_hex"))

  /** STUB DECODE: deterministic fake feature extraction.
    * On a real cluster this closure is where the codec call goes
    * (decode → resize → frame-sample), executed per-partition so the
    * library is initialized once per task, not per row. The fake
    * derives "dimensions" from a stable hash so tests are reproducible.
    */
  def decodeStub(spark: SparkSession, sfDir: String): DataFrame = {
    val withPayload = Tables.documents(spark, sfDir)
      .withColumn("payload", col("text").cast("binary"))
    withPayload.select(
      col("doc_id"),
      // ??? real codec goes here; deterministic fake below:
      pmod(xxhash64(col("payload")), lit(1920L)).plus(1).as("fake_width"),
      pmod(xxhash64(col("payload"), lit(1)), lit(1080L)).plus(1).as("fake_height"),
      (length(col("payload")) / lit(3)).cast("long").as("fake_n_frames"))
  }

  /** Batch-decode over partitions: the shape a real codec integration
    * takes on a cluster — the (expensive) codec/library handle is
    * initialized ONCE per partition/task, then streamed over that
    * partition's rows; output is a typed Dataset that re-enters
    * Catalyst. The codec itself is a STUB (no image/audio libs in this
    * container): `initCodec` and the per-row "decode" are deterministic
    * fakes with the real call sites marked.
    */
  def decodePartitions(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    media.mapPartitions { rows =>
      // ??? real codec init goes here (once per task, not per row):
      // val codec = ImageCodec.open(...)
      val codecSeed = 0x5EED
      rows.map { r =>
        // ??? real decode: codec.decode(r.payload)
        val h = java.util.Arrays.hashCode(r.payload).toLong ^ codecSeed
        MediaFeatures(r.doc_id, r.payload.length.toLong,
          math.floorMod(h, 1920L) + 1, math.floorMod(h >> 16, 1080L) + 1,
          r.payload.length.toLong / 3)
      }
    }
  }

  /** Frame sampling plumbing: slice every k-th "frame" (byte window)
    * from the payload — the partition/batch shape of real video
    * frame-sampling without the codec.
    */
  def frameSample(spark: SparkSession, sfDir: String, frameBytes: Int = 32, every: Int = 4): DataFrame = {
    val stride = frameBytes * every
    Tables.documents(spark, sfDir)
      .withColumn("payload", col("text").cast("binary"))
      // sequence(0, n-1) is DESCENDING for n=0 (Spark generates a
      // down-step sequence when start > stop) — guard with greatest and
      // a post-filter so zero-frame docs emit nothing.
      .withColumn("n_frames", expr(s"cast(length(payload) / $stride as int)"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(expr(
          s"transform(sequence(0, greatest(n_frames - 1, 0)), " +
          s"i -> substring(payload, i * $stride + 1, $frameBytes))")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .filter(col("frame_idx") < col("n_frames"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        lower(hex(col("frame"))).as("frame_hex"))
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media sample: opaque encoded bytes + typed metadata. The schema a
  * 100 TB multimodal lake stores per row — content stays an opaque
  * `binary` column (parquet keeps it out of dictionary/stats paths) and
  * all engine logic keys off the typed metadata columns. */
case class MediaSample(
    sample_id: Long,
    modality: String, // "image" | "audio" | "video"
    content: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int,
    duration_ms: Int)

/** Decoded feature row produced by the (stubbed) decoder. */
case class MediaFeatures(
    sample_id: Long,
    modality: String,
    n_bytes: Long,
    features: Array[Float])

/** Multimodal-column operators: ingest schema, deterministic
  * feature-extraction plumbing, and frame sampling.
  *
  * The actual codecs (JPEG decode, resampling, ffmpeg frame extraction)
  * are NOT in this container, so the decode kernel is a clearly-marked
  * deterministic STUB ([[fakeDecode]]); everything around it — the
  * schema, the partition-batched `mapPartitions` shape (decoder state
  * initialized once per partition, exactly how a JNI codec handle would
  * be), the binary-slice frame sampler, and the column pruning behavior
  * — is real and tested. Swapping in a real codec changes only the body
  * of `fakeDecode`.
  */
object Multimodal {

  /** Deterministic synthetic media corpus derived from the documents
    * table (text bytes reinterpreted as encoded content) — exercises the
    * binary-column path without shipping media files. */
  def syntheticCorpus(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("sample_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("content"),
      (pmod(col(idCol), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col(idCol), lit(48)) * 16 + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (length(col(textCol)) * 10).cast("int").as("duration_ms"))

  /** STUB decode kernel: a real build replaces this with the codec call
    * (e.g. TurboJPEG / libsndfile via JNI). Deterministic: feature i is
    * a hash of (content, i) scaled into [-1, 1). */
  private def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // xxhash-style integer mix over (length, first/last bytes, i) —
      // cheap, deterministic, and content-sensitive.
      var h = 0x9E3779B97F4A7C15L + content.length.toLong * 0xC2B2AE3D27D4EB4FL + i
      var j = 0
      val step = math.max(1, content.length / 16)
      while (j < content.length) { h = (h ^ content(j)) * 0x165667B19E3779F9L; j += step }
      h ^= (h >>> 29)
      out(i) = ((h % 1000003L).toDouble / 1000003.0).toFloat
      i += 1
    }
    out
  }

  /** Partition-batched feature extraction: one decoder "handle" per
    * partition (the shape a JNI codec needs), rows streamed through it.
    * No shuffle — a pure mapPartitions over the scan. */
  def extractFeatures(samples: Dataset[MediaSample], dim: Int = 16)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    samples.mapPartitions { it =>
      // Real codec: open the decoder handle here, close on exhaustion.
      it.map(s => MediaFeatures(s.sample_id, s.modality, s.content.length.toLong,
        fakeDecode(s.content, dim)))
    }
  }

  /** Frame sampling: cut the encoded payload into `n` evenly-spaced
    * fixed-width byte windows (a real build decodes frames at these
    * offsets instead). Pure column ops — substring works natively on
    * binary — so the sampler stays inside whole-stage codegen. */
  def sampleFrames(samples: DataFrame, n: Int = 4, frameBytes: Int = 32): DataFrame = {
    val len = length(col("content"))
    val frames = (0 until n).map { i =>
      val off = (len - frameBytes).cast("double") * (i.toDouble / math.max(1, n - 1))
      struct(lit(i).as("frame_idx"),
        col("content").substr(greatest(off, lit(0.0)).cast("int") + 1,
          lit(frameBytes)).as("frame"))
    }
    samples.select(col("sample_id"), col("modality"),
        explode(array(frames: _*)).as("__f"))
      .select(col("sample_id"), col("modality"),
        col("__f.frame_idx").as("frame_idx"),
        col("__f.frame").as("frame"),
        xxhash64(col("__f.frame")).as("frame_hash"))
  }

  /** Resize stub: records the target geometry in metadata and truncates
    * the payload proportionally (a real build re-encodes). Keeps the
    * (schema, pruning, codegen) contract of the real operator. */
  def resize(samples: DataFrame, w: Int, h: Int): DataFrame =
    samples
      .withColumn("content",
        col("content").substr(lit(1),
          greatest(lit(1), (length(col("content")) * w * h /
            greatest(col("width") * col("height"), lit(1))).cast("int"))))
      .withColumn("width", lit(w)).withColumn("height", lit(h))
}

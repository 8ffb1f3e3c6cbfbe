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

/** Decoded feature row produced by the decoder. */
case class MediaFeatures(
    sample_id: Long,
    modality: String,
    n_bytes: Long,
    decoded: Boolean,
    features: Array[Float])

/** One sampled frame: decoded pixel row (decodable content) or encoded
  * byte window (opaque content). */
case class MediaFrame(
    sample_id: Long,
    modality: String,
    frame_idx: Int,
    frame: Array[Byte],
    decoded: Boolean)

/** Multimodal-column operators: ingest schema, feature extraction,
  * frame sampling, and resize over a REAL decode boundary.
  *
  * The decode boundary is [[Ppm]] (complete in-container binary-PPM P6
  * image codec) plus [[Jpeg]] (baseline-sequential JFIF decoder, round
  * 9; progressive SOF2 too since round 15 — the dominant crawl image
  * format no longer stubs in either entropy layout) plus [[Wav]]
  * (complete in-container RIFF/WAVE integer PCM audio codec) plus
  * [[Y4m]] (complete in-container YUV4MPEG2 uncompressed video codec):
  * content that parses as any of the four is genuinely decoded to its
  * pixel/sample/frame grid and the downstream operators run on real
  * data. Formats that still need external codecs (arithmetic-coded or
  * hierarchical JPEG, compressed audio, H.264/VP9 video — libjpeg-turbo,
  * libsndfile, ffmpeg) are NOT in this container; bytes that fail
  * every parse take the clearly-marked deterministic STUB path
  * ([[fakeDecode]] / byte-window slicing / proportional truncation),
  * exactly as before. Swapping in a real
  * external codec extends only the decode dispatch, not the operator
  * plumbing: the partition-batched `mapPartitions` shape (decoder state
  * initialized once per partition, how a JNI codec handle would be) is
  * unchanged. Resize stays an image operation (audio "resize" would be
  * resampling — a different operator, not a geometry change).
  */
object Multimodal {

  /** Deterministic synthetic media corpus derived from the documents
    * table: each row is a REAL binary-PPM (P6) image — header plus a
    * `width*height` RGB grid cyclically filled from the document's
    * UTF-8 bytes — so the decode path downstream is honest, and the
    * metadata columns state the image's true geometry. Dimensions stay
    * small (4..16 x 4..14) to bound row size; everything is pure column
    * ops (codegen'd), and the DuckDB oracle rebuilds identical bytes. */
  def syntheticCorpus(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = (pmod(col(idCol), lit(13)) + 4).cast("int")
    val h = (pmod(col(idCol), lit(11)) + 4).cast("int")
    val need = w * h * lit(3)
    val base = concat(col(textCol), lit(".")) // never empty
    val reps = ceil(need.cast("double") / length(encode(base, "UTF-8")))
      .cast("int")
    // byte-cyclic fill: repeat the string, encode once, slice bytewise
    // (encode(repeat(s)) == repeat(encode(s)) byte-for-byte)
    val pixels = encode(call_function("repeat", base, reps), "UTF-8")
      .substr(lit(1), need)
    val header = encode(
      format_string("P6\n%d %d\n255\n", w, h), "UTF-8")
    docs.select(
      col(idCol).cast("long").as("sample_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      concat(header, pixels).as("content"),
      w.as("width"),
      h.as("height"),
      lit(16000).as("sample_rate"),
      (length(col(textCol)) * 10).cast("int").as("duration_ms"))
  }

  /** Deterministic synthetic MIXED-modality corpus: unlike
    * [[syntheticCorpus]] (all rows P6), each row's content genuinely
    * matches its modality label — image rows are binary PPMs, audio
    * rows are 16-bit mono RIFF/WAVE PCM (sample i = the document's
    * i-th cyclic UTF-8 byte, 0..255), video rows are mono YUV4MPEG2
    * streams (frame f = the next `w*h` cyclic bytes) — so every decode
    * boundary is exercised end-to-end with oracle-reconstructable
    * bytes. A pure mapPartitions over the scan; no shuffle. */
  def mixedCorpus(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text")(
      implicit spark: SparkSession): Dataset[MediaSample] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val base = (text + ".").getBytes("UTF-8") // never empty
          def cyc(off: Int, n: Int): Array[Byte] =
            Array.tabulate[Byte](n)(i => base((off + i) % base.length))
          val w = (id % 13 + 4).toInt
          val h = (id % 11 + 4).toInt
          (id % 3) match {
            case 0 =>
              MediaSample(id, "image",
                Ppm.encode(Ppm.Image(w, h, 255, cyc(0, w * h * 3))),
                w, h, 0, 0)
            case 1 =>
              val n = (id % 50 + 20).toInt
              val data = new Array[Byte](2 * n) // LE: low byte = doc byte,
              var i = 0                         // high byte = 0
              while (i < n) { data(2 * i) = base(i % base.length); i += 1 }
              MediaSample(id, "audio", Wav.encode(Wav.Audio(8000, 1, 16, data)),
                0, 0, 8000, n * 1000 / 8000)
            case _ =>
              val nf = (id % 4 + 2).toInt
              val frames = Array.tabulate(nf)(fi => cyc(fi * w * h, w * h))
              MediaSample(id, "video",
                Y4m.encode(Y4m.Video(w, h, 30, 1, "mono", frames)),
                w, h, 0, nf * 1000 / 30)
          }
        }
      }
  }

  /** Deterministic synthetic RIFF/WAVE corpus: 8-bit mono PCM at
    * 8 kHz, `n = id%40+20` samples = the document's cyclic UTF-8
    * bytes, through the REAL [[Wav.encode]] — so a byte-level oracle
    * pins the codec's actual container layout, not a parallel
    * reimplementation. The parameters are chosen so every container
    * byte stays ≤ 0x7F for the ASCII testdata corpus (RIFF/data sizes
    * < 128, sample rate 8000 = LE 0x40 0x1F, 8-bit block align):
    * bytes ≤ 0x7F are single-byte UTF-8, which is what lets DuckDB
    * rebuild the exact byte stream in VARCHAR space (chr/md5/substr
    * all agree with the binary side there — the q_cdc_media
    * contract). */
  def syntheticWavCorpus(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text")(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val base = (text + ".").getBytes("UTF-8") // never empty
          val n = (id % 40 + 20).toInt
          val data = Array.tabulate[Byte](n)(i => base(i % base.length))
          (id, Wav.encode(Wav.Audio(8000, 1, 8, data)))
        }
      }.toDF("sample_id", "content")
  }

  /** Deterministic synthetic YUV4MPEG2 corpus: mono `w×h` frames
    * (the P6 dims), `nf = id%4+2` frames cyclically filled from the
    * document's UTF-8 bytes as one continuous stream, through the REAL
    * [[Y4m.encode]]. Y4M is ASCII-framed (text header + `FRAME\n`
    * markers) and the synthetic plane bytes are ASCII for the testdata
    * corpus, so the whole container is ≤ 0x7F and DuckDB rebuilds the
    * exact bytes in VARCHAR space (see [[syntheticWavCorpus]]). */
  def syntheticY4mCorpus(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text")(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val base = (text + ".").getBytes("UTF-8")
          val w = (id % 13 + 4).toInt
          val h = (id % 11 + 4).toInt
          val nf = (id % 4 + 2).toInt
          val frames = Array.tabulate(nf)(fi =>
            Array.tabulate[Byte](w * h)(i => base((fi * w * h + i) % base.length)))
          (id, Y4m.encode(Y4m.Video(w, h, 30, 1, "mono", frames)))
        }
      }.toDF("sample_id", "content")
  }

  /** STUB decode kernel for content no in-container codec covers: a
    * real build replaces this with the codec call (e.g. TurboJPEG /
    * libsndfile via JNI). Deterministic: feature i is a hash of
    * (content, i) scaled into [-1, 1). */
  private def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // xxhash-style integer mix over (length, strided bytes, i) —
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
    * P6 content decodes for real ([[Ppm.featurize]]: channel means +
    * luminance histogram from the actual pixel grid, `decoded = true`);
    * RIFF/WAVE PCM content likewise ([[Wav.featurize]]: mean / RMS /
    * extremes + amplitude histogram from the actual sample grid);
    * YUV4MPEG2 content likewise ([[Y4m.featurize]]: plane means +
    * temporal motion + luma histogram from the actual frame grid);
    * anything else takes the declared stub. No shuffle — a pure
    * mapPartitions over the scan. */
  def extractFeatures(samples: Dataset[MediaSample], dim: Int = 16)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    samples.mapPartitions { it =>
      // Real external codec: open the decoder handle here, close on
      // exhaustion. The in-container P6/WAV paths are stateless.
      it.map { s =>
        val n = s.content.length.toLong
        Ppm.decode(s.content).orElse(Jpeg.decode(s.content)) match {
          case Some(img) =>
            MediaFeatures(s.sample_id, s.modality, n, decoded = true,
              Ppm.featurize(img, dim))
          case None => Wav.decode(s.content) match {
            case Some(audio) =>
              MediaFeatures(s.sample_id, s.modality, n, decoded = true,
                Wav.featurize(audio, dim))
            case None => Y4m.decode(s.content) match {
              case Some(video) =>
                MediaFeatures(s.sample_id, s.modality, n, decoded = true,
                  Y4m.featurize(video, dim))
              case None =>
                MediaFeatures(s.sample_id, s.modality, n, decoded = false,
                  fakeDecode(s.content, dim))
            }
          }
        }
      }
    }
  }

  /** Frame sampling over DECODED content: P6 images yield `n` evenly
    * spaced pixel ROWS of the real grid (frame i = row
    * floor(i*(h-1)/(n-1)), `width*3` bytes); RIFF/WAVE PCM yields `n`
    * evenly spaced sample-frame-aligned windows of the DECODED data
    * chunk (≈`frameBytes` wide, rounded up to whole sample frames);
    * YUV4MPEG2 yields `n` evenly spaced ACTUAL video frames (frame i =
    * stream frame floor(i*(F-1)/(n-1)), the full planar YUV payload —
    * the one modality where "frame sampling" is literal); content no
    * codec covers falls back to `n` evenly spaced `frameBytes`-wide
    * windows of the encoded payload (the pre-codec behavior, kept for
    * opaque bytes). */
  def sampleFrames(samples: Dataset[MediaSample], n: Int = 4,
      frameBytes: Int = 32)(implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    require(n > 0, s"frame count must be positive, got $n")
    samples.mapPartitions { it =>
      it.flatMap { s =>
        Ppm.decode(s.content).orElse(Jpeg.decode(s.content)) match {
          case Some(img) =>
            (0 until n).iterator.map { i =>
              val row =
                if (n == 1) 0
                else (i.toLong * (img.height - 1) / (n - 1)).toInt
              val off = row * img.width * 3
              MediaFrame(s.sample_id, s.modality, i,
                java.util.Arrays.copyOfRange(img.pixels, off, off + img.width * 3),
                decoded = true)
            }
          case None => Wav.decode(s.content) match {
            case Some(audio) =>
              val fr = audio.bytesPerSample * audio.channels
              val win = math.max(fr, (frameBytes + fr - 1) / fr * fr)
              val len = audio.data.length
              (0 until n).iterator.map { i =>
                val ratio = if (n == 1) 0.0 else i.toDouble / (n - 1)
                val off =
                  math.max(0.0, (len - win).toDouble * ratio).toInt / fr * fr
                val end = math.min(len, off + win)
                MediaFrame(s.sample_id, s.modality, i,
                  java.util.Arrays.copyOfRange(audio.data, math.min(off, end), end),
                  decoded = true)
              }
            case None => Y4m.decode(s.content) match {
              case Some(video) =>
                (0 until n).iterator.map { i =>
                  val fi =
                    if (n == 1) 0
                    else (i.toLong * (video.numFrames - 1) / (n - 1)).toInt
                  MediaFrame(s.sample_id, s.modality, i,
                    video.frames(fi).clone(), decoded = true)
                }
              case None =>
                val len = s.content.length
                (0 until n).iterator.map { i =>
                  val ratio = if (n == 1) 0.0 else i.toDouble / (n - 1)
                  val off = math.max(0.0, (len - frameBytes).toDouble * ratio).toInt
                  val end = math.min(len, off + frameBytes)
                  MediaFrame(s.sample_id, s.modality, i,
                    java.util.Arrays.copyOfRange(s.content, math.min(off, end), end),
                    decoded = false)
                }
            }
          }
        }
      }
    }
  }

  /** Perceptual image fingerprints over DECODED content: P6 rows get a
    * real [[Ppm.aHash]] (`decoded = true`); anything else gets a
    * deterministic stub fingerprint over the encoded bytes (first 8
    * bytes of the md5 content hash — exact-dup-only semantics, the
    * honest fallback when no pixel grid exists). The image near-dup
    * primitive: group or Hamming-band on `ahash`. A pure mapPartitions
    * over the scan; no shuffle.
    * @return (sample_id, modality, decoded, ahash) */
  def imageHashes(samples: Dataset[MediaSample])(
      implicit spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    samples.mapPartitions { it =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.map { s =>
        Ppm.decode(s.content).orElse(Jpeg.decode(s.content)) match {
          case Some(img) => (s.sample_id, s.modality, true, Ppm.aHash(img))
          case None =>
            md5.reset()
            val h = md5.digest(s.content)
            val hex = new StringBuilder(16)
            (0 until 8).foreach(i => hex.append(f"${h(i) & 0xFF}%02X"))
            (s.sample_id, s.modality, false, hex.toString)
        }
      }
    }.toDF("sample_id", "modality", "decoded", "ahash")
  }

  /** Content fingerprints for ALL THREE modalities over DECODED data —
    * the near-dup primitive per media type: P6 images get
    * [[Ppm.aHash]] (16 hex), PCM audio gets [[Wav.energyHash]]
    * (16 hex), y4m video gets first-frame || last-frame
    * [[Y4m.frameHash]] (32 hex — temporal endpoints, the
    * frame-sampling convention); content no codec covers gets the
    * md5-prefix exact-dup fallback, flagged `decoded = false`. All
    * decoded paths are pure integer arithmetic (engine-reproducible).
    * A pure mapPartitions over the scan; no shuffle.
    * @return (sample_id, modality, decoded, fingerprint) */
  def mediaFingerprints(samples: Dataset[MediaSample])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    samples.mapPartitions { it =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.map { s =>
        Ppm.decode(s.content).orElse(Jpeg.decode(s.content)) match {
          case Some(img) => (s.sample_id, s.modality, true, Ppm.aHash(img))
          case None => Wav.decode(s.content) match {
            case Some(audio) =>
              (s.sample_id, s.modality, true, Wav.energyHash(audio))
            case None => Y4m.decode(s.content) match {
              case Some(video) =>
                (s.sample_id, s.modality, true,
                  Y4m.frameHash(video, 0) +
                    Y4m.frameHash(video, video.numFrames - 1))
              case None =>
                md5.reset()
                val h = md5.digest(s.content)
                val hex = new StringBuilder(16)
                (0 until 8).foreach(i => hex.append(f"${h(i) & 0xFF}%02X"))
                (s.sample_id, s.modality, false, hex.toString)
            }
          }
        }
      }
    }.toDF("sample_id", "modality", "decoded", "fingerprint")
  }

  /** Audio ENERGY PROFILE over decoded content — the voice/silence
    * feature a speech-data pipeline trims and filters on: the decoded
    * PCM stream is cut into fixed `windowSamples`-sample windows (the
    * final partial window included) and each window reports its energy
    * Σ amplitude² over CENTERED integer samples ([[Wav.Audio.sample]]),
    * an exact integer — bitwise replayable, no floats anywhere. A
    * window is `silent` iff its MEAN square sits below
    * `silenceMeanSquare`, compared as the integer cross-product
    * energy < threshold·n (no division). Content the audio codec does
    * not cover yields no rows (energy has no meaning for images). A
    * pure mapPartitions over the scan; no shuffle. */
  /** Per-document KEEP/TRIM verdict composed off the energy-window
    * math (the speech-pipeline silence trim): leading and trailing
    * SILENT windows (same exact-integer verdict as
    * [[audioEnergyWindows]]) are cut, the kept span re-encodes through
    * the REAL [[Wav.encode]], and an all-silent clip reports
    * keep = false with an empty payload. Trim bounds are in samples
    * (window-aligned at the start; the end is the decoded length when
    * the last loud window is the final partial one). Non-audio rows
    * yield nothing; pure mapPartitions, no shuffle — so the gate runs
    * unchanged on a stream.
    *
    * Output: (sample_id, n_windows, keep, trim_start, trim_end,
    * n_kept, payload — the re-encoded WAV, empty when dropped). */
  def audioTrim(
      samples: Dataset[MediaSample],
      windowSamples: Int = 8,
      silenceMeanSquare: Long = 100L)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(windowSamples > 0,
      s"windowSamples must be positive, got $windowSamples")
    require(silenceMeanSquare >= 0,
      s"silenceMeanSquare must be >= 0, got $silenceMeanSquare")
    samples.mapPartitions { it =>
      it.flatMap { s =>
        Wav.decode(s.content) match {
          case Some(audio) =>
            val n = audio.numSamples
            val nw = (n + windowSamples - 1) / windowSamples
            var first = -1
            var last = -1
            var wi = 0
            while (wi < nw) {
              val start = wi * windowSamples
              val end = math.min(start + windowSamples, n)
              var e = 0L
              var i = start
              while (i < end) {
                val v = audio.sample(i).toLong
                e += v * v
                i += 1
              }
              if (e >= silenceMeanSquare * (end - start)) {
                if (first < 0) first = wi
                last = wi
              }
              wi += 1
            }
            if (first < 0)
              Iterator.single((s.sample_id, nw, false, 0L, 0L, 0L,
                Array.emptyByteArray))
            else {
              val ts = first.toLong * windowSamples
              val te = math.min(n.toLong, (last + 1).toLong * windowSamples)
              val bps = audio.bytesPerSample
              val slice = java.util.Arrays.copyOfRange(audio.data,
                (ts * bps).toInt, (te * bps).toInt)
              Iterator.single((s.sample_id, nw, true, ts, te, te - ts,
                Wav.encode(audio.copy(data = slice))))
            }
          case None => Iterator.empty
        }
      }
    }.toDF("sample_id", "n_windows", "keep", "trim_start", "trim_end",
      "n_kept", "payload")
  }

  def audioEnergyWindows(
      samples: Dataset[MediaSample],
      windowSamples: Int = 8,
      silenceMeanSquare: Long = 100L)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(windowSamples > 0,
      s"windowSamples must be positive, got $windowSamples")
    require(silenceMeanSquare >= 0,
      s"silenceMeanSquare must be >= 0, got $silenceMeanSquare")
    samples.mapPartitions { it =>
      it.flatMap { s =>
        Wav.decode(s.content) match {
          case Some(audio) =>
            val n = audio.numSamples
            (0 until n by windowSamples).iterator.zipWithIndex.map {
              case (start, wi) =>
                val end = math.min(start + windowSamples, n)
                var e = 0L
                var i = start
                while (i < end) {
                  val v = audio.sample(i).toLong
                  e += v * v
                  i += 1
                }
                val len = end - start
                (s.sample_id, wi, len, e, e < silenceMeanSquare * len)
            }
          case None => Iterator.empty
        }
      }
    }.toDF("sample_id", "win_idx", "n_samples", "energy", "silent")
  }

  /** Audio resample over DECODED content: RIFF/WAVE PCM rows are
    * genuinely rate-converted ([[Wav.resampleLinear]] — exact integer
    * two-tap interpolation, re-encoded as WAV) with the `sample_rate`
    * metadata updated; content no audio codec covers passes through
    * UNCHANGED (a rate conversion has no meaning for images or video —
    * the dual of [[resize]], which skips audio). A pure mapPartitions
    * over the scan; no shuffle. */
  def resampleAudio(samples: Dataset[MediaSample], targetRate: Int)(
      implicit spark: SparkSession): Dataset[MediaSample] = {
    import spark.implicits._
    samples.mapPartitions { it =>
      it.map { s =>
        Wav.decode(s.content) match {
          case Some(audio) =>
            val r = Wav.resampleLinear(audio, targetRate)
            s.copy(content = Wav.encode(r), sample_rate = targetRate,
              duration_ms =
                (r.numSamples / math.max(1, r.channels) * 1000L / targetRate).toInt)
          case None => s
        }
      }
    }
  }

  /** Resize over DECODED content: P6 images are genuinely resized
    * (nearest-neighbour over the real pixel grid, re-encoded as P6);
    * YUV4MPEG2 video likewise (the same nearest-neighbour map applied
    * per frame per plane at each plane's subsampled geometry,
    * re-encoded as y4m); content no codec covers keeps the documented
    * stub behavior (payload truncated proportionally to the metadata
    * pixel-count ratio). Metadata geometry is updated either way.
    * Audio is deliberately NOT routed here: a geometric resize has no
    * audio meaning (that operator would be resampling). */
  def resize(samples: Dataset[MediaSample], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[MediaSample] = {
    import spark.implicits._
    samples.mapPartitions { it =>
      it.map { s =>
        Ppm.decode(s.content).orElse(Jpeg.decode(s.content)) match {
          case Some(img) =>
            s.copy(content = Ppm.encode(Ppm.resizeNearest(img, w, h)),
              width = w, height = h)
          case None => Y4m.decode(s.content) match {
            case Some(video) =>
              s.copy(content = Y4m.encode(Y4m.resizeNearest(video, w, h)),
                width = w, height = h)
            case None =>
              val keep = math.min(s.content.length.toLong, math.max(1L,
                s.content.length.toLong * w * h /
                  math.max(1L, s.width.toLong * s.height))).toInt
              s.copy(content = java.util.Arrays.copyOf(s.content, keep),
                width = w, height = h)
          }
        }
      }
    }
  }
}

package graft.multimodal

/** Honest, dependency-free RIFF/WAVE PCM codec — the audio analogue of
  * [[Ppm]]: simple enough to implement completely in-container, so the
  * audio modality runs end-to-end on GENUINELY decoded sample grids
  * instead of encoded payload bytes.
  *
  * Accepted: canonical RIFF container (`RIFF` + size + `WAVE`), chunk
  * walk with even padding, `fmt ` chunk of audio format 1 (integer
  * PCM), 1..8 channels, 8-bit (unsigned) or 16-bit (signed
  * little-endian) samples, and one `data` chunk. Anything else — float
  * PCM, ADPCM, compressed containers — needs an external codec and
  * stays behind the declared stub in [[Multimodal]].
  */
object Wav {

  /** Decoded audio: raw interleaved PCM payload plus the format needed
    * to interpret it. `sample(i)` yields the i-th interleaved sample
    * CENTERED at zero (8-bit is stored excess-128). */
  final case class Audio(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      data: Array[Byte]) {
    def bytesPerSample: Int = bitsPerSample / 8
    def numSamples: Int = data.length / bytesPerSample
    def sample(i: Int): Int =
      if (bitsPerSample == 8) (data(i) & 0xFF) - 128
      else ((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort.toInt
    /** Full-scale magnitude: 128 (8-bit) or 32768 (16-bit). */
    def fullScale: Int = 1 << (bitsPerSample - 1)
  }

  /** Largest accepted data chunk — a hostile header cannot OOM a task. */
  private val MaxDataBytes = 1 << 26 // 64 MiB

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)

  private def tag(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Strict parse: None on any malformed container, non-PCM format,
    * unsupported width, or out-of-bounds chunk (never throws — the
    * decode boundary must degrade, not kill the task, on arbitrary
    * bytes). The data chunk is truncated down to a whole number of
    * sample frames. */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 12) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var fmtSeen = false
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || !fmtSeen)) {
      val id = tag(bytes, pos)
      val size = u32(bytes, pos + 4)
      if (size < 0 || size > Int.MaxValue.toLong ||
        pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = u16(bytes, pos + 8)
          channels = u16(bytes, pos + 10)
          val rate = u32(bytes, pos + 12)
          bits = u16(bytes, pos + 22)
          if (audioFormat != 1) return None // integer PCM only
          if (channels < 1 || channels > 8) return None
          if (rate < 1L || rate > 384000L) return None
          if (bits != 8 && bits != 16) return None
          sampleRate = rate.toInt
          fmtSeen = true
        case "data" =>
          if (size > MaxDataBytes) return None
          dataOff = pos + 8
          dataLen = size.toInt
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      pos += 8 + size.toInt + (size.toInt & 1) // RIFF pads chunks to even
    }
    if (!fmtSeen || dataOff < 0) return None
    val frame = (bits / 8) * channels
    val whole = dataLen / frame * frame // whole sample frames only
    Some(Audio(sampleRate, channels, bits,
      java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + whole)))
  }

  /** Canonical 44-byte-header encoding of a decoded audio. When the
    * data chunk is odd-length (possible for 8-bit mono with an odd
    * sample count) a RIFF pad byte is appended — excluded from the
    * data chunk size, included in the RIFF size — so external chunk
    * walkers that advance on even boundaries (as [[decode]] does)
    * stay conformant. */
  def encode(a: Audio): Array[Byte] = {
    val blockAlign = a.bytesPerSample * a.channels
    val byteRate = a.sampleRate * blockAlign
    val pad = a.data.length & 1
    val out = new Array[Byte](44 + a.data.length + pad)
    def putTag(p: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, out, p, 4)
    }
    def put16(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >>> 8).toByte
    }
    def put32(p: Int, v: Int): Unit = {
      put16(p, v & 0xFFFF); put16(p + 2, v >>> 16)
    }
    putTag(0, "RIFF"); put32(4, 36 + a.data.length + pad); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, a.channels)
    put32(24, a.sampleRate); put32(28, byteRate); put16(32, blockAlign)
    put16(34, a.bitsPerSample); putTag(36, "data"); put32(40, a.data.length)
    System.arraycopy(a.data, 0, out, 44, a.data.length)
    out
  }

  /** Energy-contour fingerprint over the DECODED sample grid — the
    * audio analogue of [[Ppm.aHash]]: the interleaved sample sequence
    * is cut into 64 index windows [j*n/64, (j+1)*n/64); bit j is set
    * iff the window's energy share STRICTLY exceeds the uniform share
    * (64 * ssq_j > total_ssq — exact integer comparison, no sqrt, no
    * floats), emitted as 16 uppercase hex chars (MSB-first row bytes).
    * Engine-reproducible; loudness-pattern near-dups differ in few
    * bits. Windows emptied by n < 64 contribute 0 bits. */
  def energyHash(a: Audio): String = {
    val n = a.numSamples
    if (n == 0) return "0" * 16
    val ssq = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val s = a.sample(i).toLong
      val j = (i.toLong * 64 / n).toInt
      ssq(j) += s * s
      total += s * s
      i += 1
    }
    val out = new StringBuilder(16)
    var row = 0
    while (row < 8) {
      var byte = 0
      var c = 0
      while (c < 8) {
        if (64L * ssq(row * 8 + c) > total) byte |= 1 << (7 - c)
        c += 1
      }
      out.append(f"$byte%02X")
      row += 1
    }
    out.toString
  }

  /** Linear-interpolation resample to `targetRate` — the audio
    * analogue of [[Ppm.resizeNearest]] (a geometric resize has no audio
    * meaning; rate conversion does). Pure integer math: output frame j
    * reads input position j*(n-1)/(m-1) as an exact rational, and the
    * two-tap interpolation rounds half-away-from-zero — so the result
    * is engine-reproducible (the DuckDB oracle mirrors the same
    * arithmetic). Channels resample independently; 8-bit audio is
    * centered before interpolation and re-biased after. */
  def resampleLinear(a: Audio, targetRate: Int): Audio = {
    require(targetRate >= 1 && targetRate <= 384000,
      s"target rate out of range: $targetRate")
    val n = a.numSamples / a.channels // frames per channel
    if (n == 0 || targetRate == a.sampleRate)
      return Audio(targetRate, a.channels, a.bitsPerSample, a.data.clone())
    val m = math.max(1, (n.toLong * targetRate / a.sampleRate).toInt)
    val bps = a.bytesPerSample
    val out = new Array[Byte](m * a.channels * bps)
    def read(frame: Int, ch: Int): Int = a.sample(frame * a.channels + ch)
    def write(frame: Int, ch: Int, v: Int): Unit = {
      val idx = frame * a.channels + ch
      if (a.bitsPerSample == 8) out(idx) = (v + 128).toByte
      else {
        out(2 * idx) = (v & 0xFF).toByte
        out(2 * idx + 1) = ((v >> 8) & 0xFF).toByte
      }
    }
    var j = 0
    while (j < m) {
      var ch = 0
      while (ch < a.channels) {
        val v =
          if (m == 1 || n == 1) read(0, ch)
          else {
            val den = (m - 1).toLong
            val pNum = j.toLong * (n - 1)
            val i = (pNum / den).toInt
            val frac = pNum % den
            if (frac == 0L) read(i, ch)
            else {
              // two-tap linear interp, exact integers, round half-away
              val num = read(i, ch) * (den - frac) + read(i + 1, ch) * frac
              val s = if (num < 0) -1L else 1L
              (s * ((2L * math.abs(num) + den) / (2L * den))).toInt
            }
          }
        write(j, ch, v)
        ch += 1
      }
      j += 1
    }
    Audio(targetRate, a.channels, a.bitsPerSample, out)
  }

  /** Real sample statistics as a fixed-width feature vector — the audio
    * mirror of [[Ppm.featurize]]: normalized mean, RMS, min and max
    * amplitude, then an amplitude histogram over the remaining buckets.
    * All from exact integer accumulators (n ≤ 2^25 samples of ≤ 2^15
    * magnitude keeps the square sum inside 2^56), normalized by the
    * format's full scale. */
  def featurize(a: Audio, dim: Int): Array[Float] = {
    val n = a.numSamples
    val out = new Array[Float](dim)
    if (n == 0 || dim == 0) return out
    val fs = a.fullScale
    var sum = 0L; var sumSq = 0L
    var mn = Int.MaxValue; var mx = Int.MinValue
    val histBuckets = math.max(0, dim - 4)
    val hist = new Array[Long](math.max(1, histBuckets))
    var i = 0
    while (i < n) {
      val s = a.sample(i)
      sum += s; sumSq += s.toLong * s
      if (s < mn) mn = s
      if (s > mx) mx = s
      if (histBuckets > 0) {
        // amplitude in [-fs, fs) -> bucket 0..histBuckets-1
        val b = (s + fs).toLong * histBuckets / (2L * fs)
        hist(math.min(b.toInt, histBuckets - 1)) += 1
      }
      i += 1
    }
    val stats = Array(
      sum.toDouble / (fs.toDouble * n),            // mean amplitude
      math.sqrt(sumSq.toDouble / n) / fs,          // RMS
      mn.toDouble / fs,                            // min
      mx.toDouble / fs)                            // max
    i = 0
    while (i < math.min(4, dim)) { out(i) = stats(i).toFloat; i += 1 }
    var b0 = 0
    while (b0 < histBuckets) {
      out(4 + b0) = (hist(b0).toDouble / n).toFloat
      b0 += 1
    }
    out
  }
}

package graft.multimodal

/** Honest, dependency-free binary-PPM (P6) codec: the one image format
  * simple enough to implement completely in-container, so the multimodal
  * operators run end-to-end on GENUINELY decoded pixel grids instead of
  * truncated payload bytes. The parser follows the netpbm spec: magic
  * `P6`, then width / height / maxval as ASCII decimals separated by
  * whitespace, `#` comments allowed anywhere in the header, a single
  * whitespace byte after maxval, then `width*height*3` raw RGB bytes
  * (one byte per channel for maxval <= 255 — the only variant emitted
  * or accepted here).
  *
  * Formats that need external codecs (JPEG, audio, video containers)
  * stay behind the declared stub in [[Multimodal]]; anything that
  * fails to parse as P6 falls back to that path.
  */
object Ppm {

  /** A decoded image: row-major RGB triplets, one byte per channel. */
  final case class Image(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  /** Largest accepted edge — keeps `width*height*3` well inside Int and
    * bounds per-row decode memory (a hostile header can't OOM a task). */
  private val MaxEdge = 1 << 14

  def encode(img: Image): Array[Byte] = {
    val header =
      s"P6\n${img.width} ${img.height}\n${img.maxVal}\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Strict parse: None on any malformed header, short payload, or
    * out-of-range dimension (never throws — the decode boundary must
    * degrade, not kill the task, on arbitrary bytes). */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def peek: Int = if (pos < bytes.length) bytes(pos) & 0xFF else -1
    def isWs(c: Int): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B
    def skipWsAndComments(): Unit = {
      var go = true
      while (go) {
        while (isWs(peek)) pos += 1
        if (peek == '#') while (peek != '\n' && peek != -1) pos += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      var v = -1
      var ok = true
      while (ok && peek >= '0' && peek <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (peek - '0')
        pos += 1
        if (v > MaxEdge * 16) ok = false // runaway decimal: reject early
      }
      if (ok) v else Int.MaxValue
    }
    val w = readInt(); val h = readInt(); val m = readInt()
    if (w <= 0 || h <= 0 || w > MaxEdge || h > MaxEdge || m <= 0 || m > 255)
      return None
    if (!isWs(peek)) return None // exactly ONE whitespace byte before pixels
    pos += 1
    val need = w * h * 3
    if (bytes.length - pos < need) return None
    Some(Image(w, h, m,
      java.util.Arrays.copyOfRange(bytes, pos, pos + need)))
  }

  /** Nearest-neighbour resize: target pixel (x,y) reads source pixel
    * (floor(x*w/tw), floor(y*h/th)) — pure integer math, so the result
    * is engine-reproducible (the DuckDB oracle mirrors the same map). */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    require(tw > 0 && th > 0, s"resize target must be positive, got ${tw}x$th")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * tw + x) * 3
        out(d) = img.pixels(s)
        out(d + 1) = img.pixels(s + 1)
        out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    Image(tw, th, img.maxVal, out)
  }

  /** Average-hash (aHash) perceptual fingerprint over the REAL pixel
    * grid: nearest-neighbour resize to 8x8, integer Rec.709 luminance
    * per cell, bit = luminance STRICTLY ABOVE the floor-mean — returned
    * as 16 uppercase hex chars (row-major, MSB-first per row byte).
    * Pure integer arithmetic end to end, so the fingerprint is
    * engine-reproducible; near-identical images differ in few bits
    * (Hamming distance), the standard image near-dup primitive. */
  def aHash(img: Image): String = {
    val small = resizeNearest(img, 8, 8)
    val luma = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val r = small.pixels(i * 3) & 0xFF
      val g = small.pixels(i * 3 + 1) & 0xFF
      val b = small.pixels(i * 3 + 2) & 0xFF
      luma(i) = (2126 * r + 7152 * g + 722 * b) / 10000
      sum += luma(i)
      i += 1
    }
    val mean = sum / 64 // floor-mean: exact integer, tie = bit 0
    val out = new StringBuilder(16)
    var row = 0
    while (row < 8) {
      var byte = 0
      var c = 0
      while (c < 8) {
        if (luma(row * 8 + c) > mean) byte |= 1 << (7 - c)
        c += 1
      }
      out.append(f"$byte%02X")
      row += 1
    }
    out.toString
  }

  /** Real pixel statistics as a fixed-width feature vector: channel
    * means, mean luminance (Rec.709 integer weights), then a luminance
    * histogram over the remaining buckets — all from exact integer
    * accumulators, normalized to [0, 1]. */
  def featurize(img: Image, dim: Int): Array[Float] = {
    val n = img.width * img.height
    val out = new Array[Float](dim)
    if (n == 0 || dim == 0) return out
    // normalize by the image's declared dynamic range, not a hardwired
    // 255: decode accepts maxVal 1..255, and features from a
    // maxVal<255 image would otherwise be mis-scaled relative to it
    val range = math.max(1, img.maxVal)
    var rSum = 0L; var gSum = 0L; var bSum = 0L; var lSum = 0L
    val histBuckets = math.max(0, dim - 4)
    val hist = new Array[Long](math.max(1, histBuckets))
    var i = 0
    while (i < n) {
      val r = img.pixels(i * 3) & 0xFF
      val g = img.pixels(i * 3 + 1) & 0xFF
      val b = img.pixels(i * 3 + 2) & 0xFF
      rSum += r; gSum += g; bSum += b
      val luma = (2126 * r + 7152 * g + 722 * b) / 10000 // 0..255 raw
      lSum += luma
      // clamp: netpbm tolerates samples ABOVE the declared maxval (a
      // mis-declared header must not index past the last bucket —
      // found by CodecFuzzSpec)
      if (histBuckets > 0)
        hist(math.min(histBuckets - 1, luma * histBuckets / (range + 1))) += 1
      i += 1
    }
    val denom = range.toDouble * n
    val means = Array(rSum / denom, gSum / denom, bSum / denom, lSum / denom)
    i = 0
    while (i < math.min(4, dim)) { out(i) = means(i).toFloat; i += 1 }
    var b0 = 0
    while (b0 < histBuckets) {
      out(4 + b0) = (hist(b0).toDouble / n).toFloat
      b0 += 1
    }
    out
  }
}

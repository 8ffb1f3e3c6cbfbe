package graft.multimodal

/** Honest, dependency-free YUV4MPEG2 (.y4m) codec: the one VIDEO
  * container simple enough to implement completely in-container, so the
  * multimodal operators run end-to-end on GENUINELY decoded frame grids
  * instead of truncated payload bytes — the video mirror of [[Ppm]]
  * (images) and [[Wav]] (audio). The parser follows the mjpegtools
  * yuv4mpeg spec: an ASCII stream header `YUV4MPEG2` with
  * space-separated tagged parameters (`W`idth, `H`eight, `F`rame-rate
  * num:den, `I`nterlacing, `A`spect, `C`olorspace, `X`-extensions)
  * terminated by LF, then per frame an ASCII `FRAME` marker line
  * (optional parameters ignored) followed by the raw planar
  * Y/Cb/Cr payload whose size is fixed by geometry + colorspace.
  *
  * Compressed video (H.264, VP9, ... — ffmpeg territory) stays behind
  * the declared stub in [[Multimodal]]; anything that fails to parse as
  * y4m falls back to that path.
  */
object Y4m {

  /** Decoded video: per-frame planar payloads (Y plane row-major, then
    * Cb then Cr at the colorspace's subsampling). `colorspace` is the
    * normalized family: "420", "422", "444", or "mono". */
  final case class Video(
      width: Int,
      height: Int,
      fpsNum: Int,
      fpsDen: Int,
      colorspace: String,
      frames: Array[Array[Byte]]) {
    def numFrames: Int = frames.length
    def ySize: Int = width * height
    def frameSize: Int = Y4m.frameSize(width, height, colorspace)
  }

  /** Largest accepted edge — keeps plane sizes well inside Int and
    * bounds per-frame decode memory (a hostile header can't OOM a
    * task); mirrors Ppm.MaxEdge / Wav.MaxDataBytes. */
  private val MaxEdge = 1 << 14

  /** Largest accepted total frame payload (64 MiB, as [[Wav]]). */
  private val MaxTotalBytes = 1 << 26

  /** Chroma plane size for a normalized colorspace family; ceil halves
    * so odd geometries stay well-defined (the mjpegtools convention). */
  def chromaSize(w: Int, h: Int, cs: String): Int = cs match {
    case "420"  => ((w + 1) / 2) * ((h + 1) / 2)
    case "422"  => ((w + 1) / 2) * h
    case "444"  => w * h
    case "mono" => 0
    case other  => throw new IllegalArgumentException(s"colorspace $other")
  }

  /** Bytes per frame: one full-res Y plane + two chroma planes. */
  def frameSize(w: Int, h: Int, cs: String): Int =
    w * h + 2 * chromaSize(w, h, cs)

  /** C-tag value -> normalized family; None = unsupported. The 4:2:0
    * siting variants (jpeg/mpeg2/paldv) differ only in chroma sample
    * POSITION, not plane geometry, so they decode identically. */
  private def normalizeColorspace(c: String): Option[String] = c match {
    case "420" | "420jpeg" | "420mpeg2" | "420paldv" => Some("420")
    case "422"  => Some("422")
    case "444"  => Some("444")
    case "mono" => Some("mono")
    case _      => None // 444alpha, 411, ... — not emitted or accepted
  }

  /** Strict parse: None on any malformed header, unsupported
    * colorspace, out-of-range geometry, truncated frame payload, or
    * structural garbage between frames (never throws — the decode
    * boundary must degrade, not kill the task, on arbitrary bytes).
    * Requires at least one complete frame. */
  def decode(bytes: Array[Byte]): Option[Video] = {
    val magic = "YUV4MPEG2".getBytes("US-ASCII")
    if (bytes.length < magic.length) return None
    var i = 0
    while (i < magic.length) {
      if (bytes(i) != magic(i)) return None
      i += 1
    }
    // the magic is the FULL first token: next byte is a separator
    if (bytes.length > magic.length && bytes(magic.length) != ' ' &&
      bytes(magic.length) != '\n') return None
    // the stream header line: bytes up to the first LF
    val hEnd = bytes.indexOf('\n'.toByte)
    if (hEnd < 0) return None
    val header = new String(bytes, 0, hEnd, "US-ASCII")
    var w = -1; var h = -1
    var fn = 25; var fd = 1 // frame rate defaults if F is absent
    var cs = "420"          // spec default colorspace
    for (tok <- header.split(' ').drop(1) if tok.nonEmpty) {
      val v = tok.drop(1)
      def int(s: String): Int =
        if (s.nonEmpty && s.length <= 9 && s.forall(c => c >= '0' && c <= '9'))
          s.toInt
        else -1
      tok.charAt(0) match {
        case 'W' => w = int(v)
        case 'H' => h = int(v)
        case 'F' => v.split(':') match {
          case Array(n, d) => fn = int(n); fd = int(d)
          case _           => return None
        }
        case 'C' => normalizeColorspace(v) match {
          case Some(n) => cs = n
          case None    => return None
        }
        case 'I' | 'A' | 'X' => // interlacing / aspect / extensions: inert
        case _               => return None // unknown tag: malformed
      }
    }
    if (w <= 0 || h <= 0 || w > MaxEdge || h > MaxEdge) return None
    if (fn <= 0 || fd <= 0) return None
    val fsz = frameSize(w, h, cs)
    if (fsz <= 0 || fsz > MaxTotalBytes) return None
    // frame loop: FRAME marker line (params ignored), then raw payload
    val marker = "FRAME".getBytes("US-ASCII")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = hEnd + 1
    var total = 0L
    while (pos < bytes.length) {
      if (pos + marker.length > bytes.length) return None
      var j = 0
      while (j < marker.length) {
        if (bytes(pos + j) != marker(j)) return None
        j += 1
      }
      var p = pos + marker.length
      while (p < bytes.length && bytes(p) != '\n') p += 1
      if (p >= bytes.length) return None // marker line never terminated
      val dataOff = p + 1
      if (dataOff + fsz > bytes.length) return None // truncated payload
      frames += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + fsz)
      total += fsz
      if (total > MaxTotalBytes) return None
      pos = dataOff + fsz
    }
    if (frames.isEmpty) return None
    Some(Video(w, h, fn, fd, cs, frames.toArray))
  }

  /** Canonical encoding: normalized header tags, bare `FRAME` lines. */
  def encode(v: Video): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C${v.colorspace}\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val fsz = v.frameSize
    val out = new Array[Byte](header.length + v.numFrames * (marker.length + fsz))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    for (f <- v.frames) {
      System.arraycopy(marker, 0, out, pos, marker.length)
      System.arraycopy(f, 0, out, pos + marker.length, fsz)
      pos += marker.length + fsz
    }
    out
  }

  /** Per-plane nearest-neighbour resize of every frame: target sample
    * (x,y) reads source sample (floor(x*sw/tw), floor(y*sh/th)) within
    * its own plane — the [[Ppm.resizeNearest]] map applied to Y and to
    * each chroma plane at its subsampled geometry. Pure integer math,
    * engine-reproducible. */
  def resizeNearest(v: Video, tw: Int, th: Int): Video = {
    require(tw > 0 && th > 0, s"resize target must be positive, got ${tw}x$th")
    def plane(src: Array[Byte], off: Int, sw: Int, sh: Int,
        dst: Array[Byte], doff: Int, dw: Int, dh: Int): Unit = {
      var y = 0
      while (y < dh) {
        val sy = (y.toLong * sh / dh).toInt
        var x = 0
        while (x < dw) {
          dst(doff + y * dw + x) = src(off + sy * sw + (x.toLong * sw / dw).toInt)
          x += 1
        }
        y += 1
      }
    }
    def cw(w: Int): Int = v.colorspace match {
      case "444" => w
      case "mono" => 0
      case _ => (w + 1) / 2
    }
    def ch(h: Int): Int = v.colorspace match {
      case "420" => (h + 1) / 2
      case "mono" => 0
      case _ => h
    }
    val (scw, sch) = (cw(v.width), ch(v.height))
    val (tcw, tch) = (cw(tw), ch(th))
    val outFrames = v.frames.map { f =>
      val out = new Array[Byte](frameSize(tw, th, v.colorspace))
      plane(f, 0, v.width, v.height, out, 0, tw, th)
      if (v.colorspace != "mono") {
        plane(f, v.ySize, scw, sch, out, tw * th, tcw, tch)
        plane(f, v.ySize + scw * sch, scw, sch, out, tw * th + tcw * tch, tcw, tch)
      }
      out
    }
    Video(tw, th, v.fpsNum, v.fpsDen, v.colorspace, outFrames)
  }

  /** aHash of one frame's LUMA plane — the video analogue of
    * [[Ppm.aHash]]: 8x8 nearest-neighbour resample of the Y plane,
    * bit = sample STRICTLY above the floor-mean, 16 uppercase hex
    * chars (MSB-first row bytes). Pure integer arithmetic. */
  def frameHash(v: Video, frameIdx: Int): String = {
    require(frameIdx >= 0 && frameIdx < v.numFrames,
      s"frame $frameIdx out of range [0, ${v.numFrames})")
    val f = v.frames(frameIdx)
    val luma = new Array[Int](64)
    var sum = 0L
    var y = 0
    while (y < 8) {
      val sy = (y.toLong * v.height / 8).toInt
      var x = 0
      while (x < 8) {
        val sx = (x.toLong * v.width / 8).toInt
        val l = f(sy * v.width + sx) & 0xFF
        luma(y * 8 + x) = l
        sum += l
        x += 1
      }
      y += 1
    }
    val mean = sum / 64
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

  /** Temporal downsample: keep every `step`-th frame (0, step, 2·step,
    * ...) and divide the frame rate accordingly (fpsDen multiplies, so
    * the rational rate stays exact). The temporal analogue of
    * [[resizeNearest]]. */
  def decimate(v: Video, step: Int): Video = {
    require(step >= 1, s"decimation step must be >= 1, got $step")
    if (step == 1) v
    else Video(v.width, v.height, v.fpsNum, v.fpsDen * step, v.colorspace,
      v.frames.indices.collect { case i if i % step == 0 => v.frames(i) }.toArray)
  }

  /** Real frame statistics as a fixed-width feature vector — the video
    * mirror of [[Ppm.featurize]] / [[Wav.featurize]]: mean luma, mean
    * Cb, mean Cr (0 for mono), a temporal-motion proxy (mean absolute
    * luma difference between consecutive frames), then a luma histogram
    * over the remaining buckets — all from exact integer accumulators,
    * normalized to [0, 1]. */
  def featurize(v: Video, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (dim == 0 || v.numFrames == 0 || v.ySize == 0) return out
    val ySz = v.ySize
    val cSz = chromaSize(v.width, v.height, v.colorspace)
    var lSum = 0L; var uSum = 0L; var vSum = 0L; var diffSum = 0L
    val histBuckets = math.max(0, dim - 4)
    val hist = new Array[Long](math.max(1, histBuckets))
    var fi = 0
    while (fi < v.numFrames) {
      val f = v.frames(fi)
      var i = 0
      while (i < ySz) {
        val luma = f(i) & 0xFF
        lSum += luma
        if (histBuckets > 0) hist(luma * histBuckets / 256) += 1
        if (fi > 0) diffSum += math.abs(luma - (v.frames(fi - 1)(i) & 0xFF))
        i += 1
      }
      var c = 0
      while (c < cSz) {
        uSum += f(ySz + c) & 0xFF
        vSum += f(ySz + cSz + c) & 0xFF
        c += 1
      }
      fi += 1
    }
    val nY = ySz.toLong * v.numFrames
    val nC = cSz.toLong * v.numFrames
    val stats = Array(
      lSum.toDouble / (255.0 * nY),
      if (nC > 0) uSum.toDouble / (255.0 * nC) else 0.0,
      if (nC > 0) vSum.toDouble / (255.0 * nC) else 0.0,
      if (v.numFrames > 1)
        diffSum.toDouble / (255.0 * ySz.toLong * (v.numFrames - 1))
      else 0.0)
    var i = 0
    while (i < math.min(4, dim)) { out(i) = stats(i).toFloat; i += 1 }
    var b = 0
    while (b < histBuckets) {
      out(4 + b) = (hist(b).toDouble / nY).toFloat
      b += 1
    }
    out
  }
}

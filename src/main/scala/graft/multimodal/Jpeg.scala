package graft.multimodal

/** Baseline-sequential JPEG (JFIF) decoder, pure JVM — the dominant
  * crawl image format's decode boundary, previously the declared
  * `decoded = false` stub path (reference-adjacent: the alphalens
  * reference has no media handling; this extends the §2.12 multimodal
  * family like [[Ppm]]/[[Wav]]/[[Y4m]] did for their formats).
  *
  * Scope (ITU-T T.81 baseline): SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI
  * markers, 8-bit samples, 1 or 3 components, interleaved scan,
  * canonical Huffman tables, byte unstuffing (FF 00) and restart
  * markers, 8- or 16-bit quantization entries, arbitrary sampling
  * factors with nearest-neighbour chroma upsampling, double-precision
  * separable-order IDCT with a fixed operation order (deterministic on
  * the JVM), ITU-R BT.601 YCbCr -> RGB.
  *
  * PROGRESSIVE (SOF2, round 15) is decoded too: multi-scan coefficient
  * accumulation with spectral selection (Ss/Se bands, EOB-run coding,
  * T.81 G.1.2.2) and successive approximation (DC/AC first + refine
  * scans, point transforms, correction bits, G.1.2.3), interleaved and
  * single-component DC scans, restart markers per scan, then ONE
  * dequant + IDCT + upsample pass over the accumulated blocks — the
  * identical reconstruction tail as baseline, so a spectrally-selected
  * re-encode of a baseline stream decodes bit-identically (JpegSpec
  * pins that parity on fuzzed images). Arithmetic-coded, hierarchical,
  * and 12-bit streams stay the declared stub path: `decode` returns
  * None and callers fall back to the exact-dup fingerprint, flagged
  * `decoded = false`.
  *
  * Production note: the per-block direct IDCT is O(64*64) multiplies —
  * fine for the corpus scale this library tests at; a throughput build
  * swaps in AAN/fixed-point without touching the layer above.
  */
object Jpeg {

  /** Decode-boundary pixel cap (~33 MP): frames declaring more take
    * the stub path instead of allocating executor-killing planes. */
  val MaxPixels: Long = 1L << 25

  private final class Bits(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var sawMarker = 0 // last marker encountered mid-entropy (0 = none)

    /** Next entropy-coded bit, honoring FF00 stuffing; at a marker
      * (RSTn/EOI) returns 0s until `reset()` (T.81 F.2.2.5). */
    def bit(): Int = {
      if (nbits == 0) {
        if (sawMarker != 0) return 0
        if (pos >= data.length) { sawMarker = 0xD9; return 0 }
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          val m = if (pos < data.length) data(pos) & 0xFF else 0xD9
          if (m == 0x00) { pos += 1 } // stuffed FF data byte
          else { sawMarker = m; return 0 }
        }
        cur = b; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Drop pad bits and align past the restart marker, whether the
      * Huffman reader already ran into it (sawMarker) or stopped at the
      * byte boundary just before the FF. */
    def restart(): Unit = {
      nbits = 0
      if (sawMarker >= 0xD0 && sawMarker <= 0xD7) { pos += 1; sawMarker = 0 }
      else if (sawMarker == 0 && pos + 1 < data.length &&
        (data(pos) & 0xFF) == 0xFF) {
        val m = data(pos + 1) & 0xFF
        if (m >= 0xD0 && m <= 0xD7) pos += 2
      }
    }
  }

  /** Canonical Huffman table: decode bit-by-bit over the length-ordered
    * code space (T.81 C.2). */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // mincode/maxcode/valptr per length 1..16
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
    def decode(in: Bits): Int = {
      var code = in.bit(); var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        code = (code << 1) | in.bit(); l += 1
      }
      -1 // corrupt stream
    }
  }

  /** DC/AC magnitude extension (T.81 F.2.2.1): `v` in `s` bits. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1) u pi / 16) premultiplied by C(u): the fixed IDCT basis
  private val idctBasis: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Direct separable IDCT, fixed operation order: rows then columns. */
  private def idct(coef: Array[Double], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // 1-D over rows (u over x)
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += coef(y * 8 + u) * idctBasis(u * 8 + x); u += 1 }
        tmp(y * 8 + x) = s * 0.5
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // 1-D over columns (v over y)
      var yy = 0
      while (yy < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * idctBasis(v * 8 + yy); v += 1 }
        val p = math.round(s * 0.5).toInt + 128
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  private def clamp8(v: Double): Int = {
    val r = math.round(v).toInt
    if (r < 0) 0 else if (r > 255) 255 else r
  }

  /** Decode baseline JFIF bytes to an RGB [[Ppm.Image]]; None when the
    * bytes are not a decodable baseline JPEG (the stub boundary). */
  def decode(bytes: Array[Byte]): Option[Ppm.Image] = {
    try decodeOrThrow(bytes)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeOrThrow(bytes: Array[Byte]): Option[Ppm.Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF ||
      (bytes(1) & 0xFF) != 0xD8) return None
    var pos = 2
    def u8 = { val v = bytes(pos) & 0xFF; pos += 1; v }
    def u16 = { val v = ((bytes(pos) & 0xFF) << 8) | (bytes(pos + 1) & 0xFF); pos += 2; v }

    val qt = Array.ofDim[Int](4, 64)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var progressive = false
    // progressive coefficient store: per component, padded-MCU-grid
    // blocks x 64 quantized coefficients accumulated across scans
    var coefStore: Array[Array[Int]] = null

    while (pos < bytes.length) {
      if (u8 != 0xFF) return None
      var marker = u8
      while (marker == 0xFF) marker = u8 // fill bytes
      marker match {
        case 0xD9 => // EOI: reconstruct an accumulated progressive frame
          if (progressive && coefStore != null)
            return reconstructProgressive(comps, coefStore, qt, width, height)
          return None // EOI before any scan
        case 0xDB => // DQT
          // NB: read the length FIRST — `pos + u16` would capture pos
          // before u16's side effect advances it past the length field.
          val dqtLen = u16
          val end = pos + dqtLen - 2
          while (pos < end) {
            val pq = u8; val tq = pq & 0x0F
            var i = 0
            while (i < 64) {
              qt(tq)(zigzag(i)) = if ((pq >> 4) == 0) u8 else u16
              i += 1
            }
          }
        case 0xC4 => // DHT
          val dhtLen = u16
          val end = pos + dhtLen - 2
          while (pos < end) {
            val tc = u8
            val counts = Array.fill(16)(u8)
            val n = counts.sum
            val syms = Array.fill(n)(u8)
            val h = new Huff(counts, syms)
            if ((tc >> 4) == 0) dcT(tc & 0x0F) = h else acT(tc & 0x0F) = h
          }
        case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
          progressive = marker == 0xC2
          u16
          if (u8 != 8) return None // 8-bit samples only
          height = u16; width = u16
          // decode-boundary allocation guard: a hostile SOF declaring
          // 65535 x 65535 would OOM the executor (fatal, uncatchable)
          // before any entropy byte is read; 2^25 pixels (~33 MP,
          // past 8K stills) bounds every plane/coefficient array
          if (width.toLong * height.toLong > MaxPixels) return None
          val nc = u8
          if (nc != 1 && nc != 3) return None
          comps = Array.fill(nc) {
            val id = u8; val hv = u8; val tq = u8
            Component(id, hv >> 4, hv & 0x0F, tq)
          }
        case 0xDD => // DRI
          u16; restartInterval = u16
        case 0xDA => // SOS -> entropy-coded segment
          if (comps == null) return None
          u16
          val ns = u8
          val scanComps = new Array[Component](ns)
          var i = 0
          while (i < ns) {
            val cs = u8; val t = u8
            val cOpt = comps.find(_.id == cs)
            if (cOpt.isEmpty) return None
            cOpt.get.td = t >> 4; cOpt.get.ta = t & 0x0F
            scanComps(i) = cOpt.get
            i += 1
          }
          if (!progressive) {
            pos += 3 // Ss, Se, Ah/Al (fixed for baseline)
            return decodeScan(bytes, pos, comps, qt, dcT, acT,
              width, height, restartInterval)
          } else {
            val ss = u8; val se = u8
            val ahal = u8; val ah = ahal >> 4; val al = ahal & 0x0F
            if (coefStore == null) {
              if (width <= 0 || height <= 0) return None
              val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
              val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
              val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
              coefStore = comps.map(c =>
                new Array[Int](mcusX * c.h * mcusY * c.v * 64))
            }
            pos = decodeProgressiveScan(bytes, pos, comps, scanComps,
              coefStore, dcT, acT, width, height, restartInterval,
              ss, se, ah, al)
            if (pos < 0) return None
          }
        case m if m >= 0xC1 && m <= 0xCF && m != 0xC2 && m != 0xC4 && m != 0xC8 =>
          return None // arithmetic/hierarchical/12-bit: stub path
        case _ => // APPn / COM / anything skippable
          val skipLen = u16
          pos += skipLen - 2
      }
    }
    None
  }

  private def decodeScan(
      bytes: Array[Byte], scanPos: Int, comps: Array[Component],
      qt: Array[Array[Int]], dcT: Array[Huff], acT: Array[Huff],
      width: Int, height: Int, restartInterval: Int): Option[Ppm.Image] = {
    if (width <= 0 || height <= 0) return None
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component sample planes at the component's own resolution
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i => new Array[Int](planeW(i) * planeH(i))).toArray

    val in = new Bits(bytes, scanPos)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val px = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        in.restart()
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0.0)
            val s = dcT(c.td).decode(in)
            if (s < 0) return None
            val diff = extend(in.bits(s), s)
            pred(ci) += diff
            coef(0) = pred(ci).toDouble * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acT(c.ta).decode(in)
              if (rs < 0) return None
              val r = rs >> 4; val sz = rs & 0x0F
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += r
                if (k > 63) return None
                coef(zigzag(k)) = extend(in.bits(sz), sz).toDouble * q(zigzag(k))
                k += 1
              }
            }
            idct(coef, px)
            val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((oy + yy) * planeW(ci) + ox + xx) = px(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    assemble(comps, planes, planeW, width, height, hMax, vMax)
  }

  /** Shared reconstruction tail: RGB at full resolution from the
    * per-component sample planes; chroma nearest-neighbour upsample. */
  private def assemble(comps: Array[Component], planes: Array[Array[Int]],
      planeW: Array[Int], width: Int, height: Int,
      hMax: Int, vMax: Int): Option[Ppm.Image] = {
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (comps.length == 1) {
          val v = planes(0)(y * planeW(0) + x).toByte
          out(o) = v; out(o + 1) = v; out(o + 2) = v
        } else {
          def samp(ci: Int): Int = {
            val c = comps(ci)
            val sy = y * c.v / vMax; val sx = x * c.h / hMax
            planes(ci)(sy * planeW(ci) + sx)
          }
          val yv = samp(0).toDouble
          val cb = samp(1).toDouble - 128.0
          val cr = samp(2).toDouble - 128.0
          out(o) = clamp8(yv + 1.402 * cr).toByte
          out(o + 1) = clamp8(yv - 0.344136 * cb - 0.714136 * cr).toByte
          out(o + 2) = clamp8(yv + 1.772 * cb).toByte
        }
        x += 1
      }
      y += 1
    }
    Some(Ppm.Image(width, height, 255, out))
  }

  // ---- progressive (SOF2) scan decode --------------------------------

  /** Position of the next true marker (FF + non-stuffing, non-fill,
    * non-RST byte) at or after `from` — where the outer marker loop
    * resumes once a progressive scan's entropy bits end. */
  private def nextMarkerPos(bytes: Array[Byte], from: Int): Int = {
    var p = math.max(from, 0)
    while (p + 1 < bytes.length) {
      if ((bytes(p) & 0xFF) == 0xFF) {
        val m = bytes(p + 1) & 0xFF
        if (m != 0x00 && m != 0xFF && !(m >= 0xD0 && m <= 0xD7)) return p
      }
      p += 1
    }
    bytes.length
  }

  /** Decode ONE progressive scan into the coefficient store, returning
    * the byte position of the next marker (or −1 on a corrupt scan).
    *
    * T.81 Annex G: DC scans (Ss=0) may be interleaved (MCU walk over
    * the padded grid) or single-component; AC scans are always
    * single-component and walk the component's OWN block grid
    * (ceil(compW/8) x ceil(compH/8) — smaller than the padded MCU grid
    * when sampling factors differ). First scans (Ah=0) decode point-
    * transformed values shifted by Al; refinement scans (Ah>0) add one
    * magnitude bit per coefficient. AC band coding carries EOB runs
    * across blocks; restarts reset DC predictors AND the EOB run. */
  private def decodeProgressiveScan(
      bytes: Array[Byte], scanPos: Int,
      comps: Array[Component], scanComps: Array[Component],
      coefStore: Array[Array[Int]], dcT: Array[Huff], acT: Array[Huff],
      width: Int, height: Int, restartInterval: Int,
      ss: Int, se: Int, ah: Int, al: Int): Int = {
    if (ss < 0 || se > 63 || se < ss) return -1
    if (ss == 0 && se != 0) return -1 // DC scan is exactly the 0 band
    if (ss > 0 && scanComps.length != 1) return -1 // AC: single component
    val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val in = new Bits(bytes, scanPos)
    val pred = new Array[Int](scanComps.length)
    var eobrun = 0

    // one coefficient block refined/filled in place
    def dcFirst(c: Component, si: Int, coef: Array[Int], off: Int): Boolean = {
      val s = dcT(c.td).decode(in)
      if (s < 0 || s > 15) return false
      pred(si) += extend(in.bits(s), s)
      coef(off) = pred(si) << al
      true
    }
    def dcRefine(coef: Array[Int], off: Int): Unit =
      if (in.bit() == 1) coef(off) |= (1 << al)

    def acFirst(c: Component, coef: Array[Int], off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = acT(c.ta).decode(in)
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += in.bits(r)
            k = 64 // end of band
          }
        } else {
          k += r
          if (k > se) return false
          coef(off + zigzag(k)) = extend(in.bits(s), s) << al
          k += 1
        }
      }
      true
    }

    // successive-approximation AC refinement (T.81 G.1.2.3): one
    // correction bit per already-nonzero coefficient crossed, newly
    // significant coefficients arrive as +-1 << Al
    val p1 = 1 << al
    val m1 = -1 << al
    def refineNonzero(coef: Array[Int], idx: Int): Unit =
      if (in.bit() == 1 && (coef(idx) & p1) == 0) {
        if (coef(idx) >= 0) coef(idx) += p1 else coef(idx) += m1
      }
    def acRefine(c: Component, coef: Array[Int], off: Int): Boolean = {
      var k = ss
      if (eobrun == 0) {
        var inBand = true
        while (inBand && k <= se) {
          val rs = acT(c.ta).decode(in)
          if (rs < 0) return false
          var r = rs >> 4; val s = rs & 0x0F
          var newVal = 0
          if (s == 0) {
            if (r < 15) { // EOB run: stop coding new coefficients here
              eobrun = (1 << r)
              if (r > 0) eobrun += in.bits(r)
              inBand = false
            }
            // r == 15: ZRL — skip 16 zero-history coefficients
          } else {
            if (s != 1) return false // refinement emits only +-1
            newVal = if (in.bit() == 1) p1 else m1
          }
          if (inBand) {
            var advancing = true
            while (advancing && k <= se) {
              val idx = off + zigzag(k)
              if (coef(idx) != 0) refineNonzero(coef, idx)
              else {
                if (r == 0) {
                  if (newVal != 0) coef(idx) = newVal
                  advancing = false
                } else r -= 1
              }
              k += 1
            }
            if (advancing && newVal != 0) return false // ran off the band
          }
        }
      }
      if (eobrun > 0) { // correction bits for the rest of the band
        while (k <= se) {
          val idx = off + zigzag(k)
          if (coef(idx) != 0) refineNonzero(coef, idx)
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    def restartNow(): Unit = {
      in.restart()
      java.util.Arrays.fill(pred, 0)
      eobrun = 0
    }

    if (scanComps.length > 1) {
      // interleaved DC scan: MCU walk over the padded grid
      if (ss != 0) return -1
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0)
          restartNow()
        val my = mcu / mcusX; val mx = mcu % mcusX
        var si = 0
        while (si < scanComps.length) {
          val c = scanComps(si)
          val ci = comps.indexWhere(_.id == c.id)
          val bw = mcusX * c.h
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val bi = (my * c.v + by) * bw + (mx * c.h + bx)
              if (ah == 0) {
                if (!dcFirst(c, si, coefStore(ci), bi * 64)) return -1
              } else dcRefine(coefStore(ci), bi * 64)
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        mcu += 1
      }
    } else {
      // single-component scan over the component's own block grid,
      // stored at the padded grid's row stride
      val c = scanComps(0)
      val ci = comps.indexWhere(_.id == c.id)
      val compW = (width * c.h + hMax - 1) / hMax
      val compH = (height * c.v + vMax - 1) / vMax
      val cbw = (compW + 7) / 8; val cbh = (compH + 7) / 8
      val stride = mcusX * c.h
      var bi = 0
      val nBlocks = cbw * cbh
      while (bi < nBlocks) {
        if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0)
          restartNow()
        val off = ((bi / cbw) * stride + (bi % cbw)) * 64
        val ok =
          if (ss == 0) {
            if (ah == 0) dcFirst(c, 0, coefStore(ci), off)
            else { dcRefine(coefStore(ci), off); true }
          } else {
            if (ah == 0) acFirst(c, coefStore(ci), off)
            else acRefine(c, coefStore(ci), off)
          }
        if (!ok) return -1
        bi += 1
      }
    }
    nextMarkerPos(bytes, math.max(scanPos, in.pos - 2))
  }

  /** Dequantize + IDCT every accumulated block, then the shared
    * assembly tail — the single reconstruction pass after all
    * progressive scans. */
  private def reconstructProgressive(
      comps: Array[Component], coefStore: Array[Array[Int]],
      qt: Array[Array[Int]], width: Int, height: Int): Option[Ppm.Image] = {
    if (width <= 0 || height <= 0) return None
    val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i =>
      new Array[Int](planeW(i) * planeH(i))).toArray
    val coef = new Array[Double](64)
    val px = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = qt(c.tq)
      val bw = mcusX * c.h; val bh = mcusY * c.v
      val store = coefStore(ci)
      var bi = 0
      while (bi < bw * bh) {
        var i = 0
        while (i < 64) { coef(i) = store(bi * 64 + i).toDouble * q(i); i += 1 }
        idct(coef, px)
        val ox = (bi % bw) * 8; val oy = (bi / bw) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            planes(ci)((oy + yy) * planeW(ci) + ox + xx) = px(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        bi += 1
      }
      ci += 1
    }
    assemble(comps, planes, planeW, width, height, hMax, vMax)
  }

  // ---- baseline encoder ----------------------------------------------

  /** Annex K.1 example luminance quantization table, natural order. */
  val AnnexKLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Flat unit table: near-lossless (the only loss is coefficient
    * rounding), for codec round-trip tests. */
  val FlatQ: Array[Int] = Array.fill(64)(1)

  private def fdct(px: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // 1-D over rows: x -> u
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += px(v * 8 + x) * idctBasis(u * 8 + x); x += 1 }
        tmp(v * 8 + u) = s * 0.5
        u += 1
      }
      v += 1
    }
    var u = 0
    while (u < 8) { // 1-D over columns: y -> v
      var vv = 0
      while (vv < 8) {
        var s = 0.0; var y = 0
        while (y < 8) { s += tmp(y * 8 + u) * idctBasis(vv * 8 + y); y += 1 }
        out(vv * 8 + u) = s * 0.5
        vv += 1
      }
      u += 1
    }
  }

  /** Encode an RGB [[Ppm.Image]] as a baseline-sequential 4:4:4 JFIF
    * stream: BT.601 RGB -> YCbCr, edge-replicated padding to 8-pixel
    * tiles, double-precision forward DCT (the [[decode]] basis, fixed
    * operation order — bitwise-deterministic), half-away quantization
    * against `quant` (one table for all components; [[AnnexKLumaQ]] by
    * default, [[FlatQ]] for near-lossless round trips), and the
    * Annex K luminance Huffman tables for every component. */
  def encode(img: Ppm.Image, quant: Array[Int] = AnnexKLumaQ): Array[Byte] = {
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant must be 64 entries in [1, 255]")
    val w = img.width; val h = img.height
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    // planar YCbCr at full resolution, edge-replicated to the block grid
    val pw = bw * 8; val ph = bh * 8
    val planes = Array.ofDim[Double](3, pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        val sx = math.min(x, w - 1)
        val o = (sy * w + sx) * 3
        val r = img.pixels(o) & 0xFF
        val g = img.pixels(o + 1) & 0xFF
        val b = img.pixels(o + 2) & 0xFF
        planes(0)(y * pw + x) = 0.299 * r + 0.587 * g + 0.114 * b
        planes(1)(y * pw + x) =
          -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        planes(2)(y * pw + x) =
          0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8) // SOI
    b(0xFF); b(0xDB); b16(2 + 1 + 64); b(0x00) // DQT in zigzag order
    (0 until 64).foreach(i => b(quant(zigzag(i))))
    b(0xFF); b(0xC0); b16(2 + 6 + 9) // SOF0, 3 components 1x1
    b(8); b16(h); b16(w); b(3)
    Seq(1, 2, 3).foreach { id => b(id); b(0x11); b(0) }
    b(0xFF); b(0xC4) // DHT: the Annex K luminance pair for everything
    b16(2 + (1 + 16 + dcSyms.length) + (1 + 16 + acSyms.length))
    b(0x00); dcCounts.foreach(b); dcSyms.foreach(b)
    b(0x10); acCounts.foreach(b); acSyms.foreach(b)
    b(0xFF); b(0xDA); b16(2 + 1 + 6 + 3) // SOS
    b(3); Seq(1, 2, 3).foreach { id => b(id); b(0x00) }
    b(0); b(63); b(0)
    val dcCodes = canonicalCodes(dcCounts, dcSyms)
    val acCodes = canonicalCodes(acCounts, acSyms)
    val bwri = new BitWriter(out)
    def putMag(v: Int, s: Int): Unit =
      if (s > 0) bwri.putBits(if (v >= 0) v else v + (1 << s) - 1, s)
    def cat(v: Int): Int = {
      val m = math.abs(v); var s = 0
      while ((m >> s) != 0) s += 1
      s
    }
    val blockPx = new Array[Double](64)
    val coefs = new Array[Double](64)
    val qd = new Array[Int](64)
    val pred = new Array[Int](3)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var ci = 0
        while (ci < 3) { // interleaved MCU: one block per component
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              blockPx(yy * 8 + xx) =
                planes(ci)((by * 8 + yy) * pw + bx * 8 + xx) - 128.0
              xx += 1
            }
            yy += 1
          }
          fdct(blockPx, coefs)
          var i = 0
          while (i < 64) {
            qd(i) = math.round(coefs(i) / quant(i)).toInt
            i += 1
          }
          val diff = qd(0) - pred(ci); pred(ci) = qd(0)
          val s = cat(diff)
          val (dc, dl) = dcCodes(s)
          bwri.putBits(dc, dl); putMag(diff, s)
          var k = 1; var run = 0
          while (k < 64) {
            // the baseline AC envelope is 10 bits; a +-128 checkerboard
            // under unit quantization can reach exactly 1024, so clamp
            // (what production encoders do) rather than emit an
            // unencodable category
            val v0 = qd(zigzag(k))
            val v = if (v0 > 1023) 1023 else if (v0 < -1023) -1023 else v0
            if (v == 0) run += 1
            else {
              while (run >= 16) {
                val (zc, zl) = acCodes(0xF0); bwri.putBits(zc, zl) // ZRL
                run -= 16
              }
              val sz = cat(v)
              val (ac, al) = acCodes((run << 4) | sz)
              bwri.putBits(ac, al); putMag(v, sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) {
            val (ec, el) = acCodes(0x00); bwri.putBits(ec, el) // EOB
          }
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    bwri.pad()
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }

  // ---- progressive (SOF2) encoder -------------------------------------

  // flat tables for progressive scans: the Annex K luminance AC table
  // has no EOBn symbols beyond EOB0 (baseline never needs them), so
  // progressive EOB-run coding uses a complete flat code space instead
  // — DC categories 0..11 at 4 bits, all 256 AC symbols split 128 at
  // 8 bits + 128 at 9 bits (DHT counts are single bytes, so one
  // length cannot hold 256; the split leaves the all-ones code unused,
  // as T.81 C.2 requires)
  private val dcCountsFlat =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val dcSymsFlat = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acCountsFlat =
    Array(0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0)
  private val acSymsFlat = Array.tabulate(256)(identity)

  /** Encode an RGB [[Ppm.Image]] as a PROGRESSIVE (SOF2) 4:4:4 JFIF
    * stream carrying the exact same quantized coefficients as
    * [[encode]] with the same `quant` — decoded output is therefore
    * bit-identical to the baseline stream's decode (JpegSpec pins it).
    * Scan script exercises the full progressive machinery: interleaved
    * DC first (Al=1) + DC refine, then per component AC first
    * (1..63, Al=1, EOB-run coded) + AC refine (Ah=1, correction
    * bits). */
  def encodeProgressive(img: Ppm.Image,
      quant: Array[Int] = AnnexKLumaQ): Array[Byte] = {
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant must be 64 entries in [1, 255]")
    val w = img.width; val h = img.height
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val pw = bw * 8; val ph = bh * 8
    // planar YCbCr, edge-replicated — identical to [[encode]]
    val planes = Array.ofDim[Double](3, pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        val sx = math.min(x, w - 1)
        val o = (sy * w + sx) * 3
        val r = img.pixels(o) & 0xFF
        val g = img.pixels(o + 1) & 0xFF
        val b = img.pixels(o + 2) & 0xFF
        planes(0)(y * pw + x) = 0.299 * r + 0.587 * g + 0.114 * b
        planes(1)(y * pw + x) =
          -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        planes(2)(y * pw + x) =
          0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        x += 1
      }
      y += 1
    }
    // all quantized coefficient blocks up front (natural order),
    // sharing the baseline clamp so coefficients match bit-for-bit
    val nBlocks = bw * bh
    val coefs = Array.ofDim[Int](3, nBlocks, 64)
    val blockPx = new Array[Double](64)
    val dct = new Array[Double](64)
    var bi = 0
    while (bi < nBlocks) {
      val bx = bi % bw; val by = bi / bw
      var ci = 0
      while (ci < 3) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            blockPx(yy * 8 + xx) =
              planes(ci)((by * 8 + yy) * pw + bx * 8 + xx) - 128.0
            xx += 1
          }
          yy += 1
        }
        fdct(blockPx, dct)
        var i = 0
        while (i < 64) {
          val q0 = math.round(dct(i) / quant(i)).toInt
          coefs(ci)(bi)(i) =
            if (i == 0) q0
            else if (q0 > 1023) 1023 else if (q0 < -1023) -1023 else q0
          i += 1
        }
        ci += 1
      }
      bi += 1
    }

    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8) // SOI
    b(0xFF); b(0xDB); b16(2 + 1 + 64); b(0x00)
    (0 until 64).foreach(i => b(quant(zigzag(i))))
    b(0xFF); b(0xC2); b16(2 + 6 + 9) // SOF2, 3 components 1x1
    b(8); b16(h); b16(w); b(3)
    Seq(1, 2, 3).foreach { id => b(id); b(0x11); b(0) }
    b(0xFF); b(0xC4) // DHT: the flat progressive pair on slot 0
    b16(2 + (1 + 16 + dcSymsFlat.length) + (1 + 16 + acSymsFlat.length))
    b(0x00); dcCountsFlat.foreach(b); dcSymsFlat.foreach(b)
    b(0x10); acCountsFlat.foreach(b); acSymsFlat.foreach(b)
    val dcCodes = canonicalCodes(dcCountsFlat, dcSymsFlat)
    val acCodes = canonicalCodes(acCountsFlat, acSymsFlat)
    def cat(v: Int): Int = {
      val m = math.abs(v); var s = 0
      while ((m >> s) != 0) s += 1
      s
    }
    def sos(ids: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      b(0xFF); b(0xDA); b16(2 + 1 + 2 * ids.length + 3)
      b(ids.length); ids.foreach { id => b(id); b(0x00) }
      b(ss); b(se); b((ah << 4) | al)
    }

    // scan 1: DC first, interleaved, Al=1 (arithmetic >> on DC)
    sos(Seq(1, 2, 3), 0, 0, 0, 1)
    locally {
      val bwr = new BitWriter(out)
      val pred = new Array[Int](3)
      var m = 0
      while (m < nBlocks) {
        var ci = 0
        while (ci < 3) {
          val v = coefs(ci)(m)(0) >> 1
          val diff = v - pred(ci); pred(ci) = v
          val s = cat(diff)
          val (c, l) = dcCodes(s)
          bwr.putBits(c, l)
          if (s > 0)
            bwr.putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
          ci += 1
        }
        m += 1
      }
      bwr.pad()
    }
    // scan 2: DC refine, interleaved, Ah=1 Al=0 (one LSB per block)
    sos(Seq(1, 2, 3), 0, 0, 1, 0)
    locally {
      val bwr = new BitWriter(out)
      var m = 0
      while (m < nBlocks) {
        var ci = 0
        while (ci < 3) {
          bwr.putBits(coefs(ci)(m)(0) & 1, 1)
          ci += 1
        }
        m += 1
      }
      bwr.pad()
    }
    // scans 3-5: AC first per component, band 1..63, Al=1
    var ci = 0
    while (ci < 3) {
      sos(Seq(ci + 1), 1, 63, 0, 1)
      val bwr = new BitWriter(out)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var r = 0
        while ((eobrun >> (r + 1)) != 0) r += 1
        val (c, l) = acCodes(r << 4)
        bwr.putBits(c, l)
        if (r > 0) bwr.putBits(eobrun - (1 << r), r)
        eobrun = 0
      }
      var m = 0
      while (m < nBlocks) {
        val blk = coefs(ci)(m)
        // point-transformed band values (toward zero, T.81 G.1.2.2)
        var lastNz = 0
        var k = 1
        while (k <= 63) {
          if (blk(zigzag(k)) / 2 != 0) lastNz = k
          k += 1
        }
        if (lastNz == 0) {
          eobrun += 1
          if (eobrun == 0x7FFF) flushEob()
        } else {
          flushEob()
          var run = 0
          k = 1
          while (k <= lastNz) {
            val v = blk(zigzag(k)) / 2
            if (v == 0) run += 1
            else {
              while (run >= 16) {
                val (zc, zl) = acCodes(0xF0); bwr.putBits(zc, zl)
                run -= 16
              }
              val s = cat(v)
              val (ac, al2) = acCodes((run << 4) | s)
              bwr.putBits(ac, al2)
              bwr.putBits(if (v >= 0) v else v + (1 << s) - 1, s)
              run = 0
            }
            k += 1
          }
          if (lastNz < 63) eobrun += 1 // trailing zeros end this block
        }
        m += 1
      }
      flushEob()
      bwr.pad()
      ci += 1
    }
    // scans 6-8: AC refine per component, band 1..63, Ah=1 Al=0
    ci = 0
    while (ci < 3) {
      sos(Seq(ci + 1), 1, 63, 1, 0)
      val bwr = new BitWriter(out)
      var eobrun = 0
      val be = new scala.collection.mutable.ArrayBuffer[Int] // EOB-run bits
      def flushEob(): Unit = {
        if (eobrun > 0) {
          var r = 0
          while ((eobrun >> (r + 1)) != 0) r += 1
          val (c, l) = acCodes(r << 4)
          bwr.putBits(c, l)
          if (r > 0) bwr.putBits(eobrun - (1 << r), r)
          eobrun = 0
        }
        be.foreach(bit => bwr.putBits(bit, 1))
        be.clear()
      }
      var m = 0
      while (m < nBlocks) {
        val blk = coefs(ci)(m)
        var r = 0
        val br = new scala.collection.mutable.ArrayBuffer[Int]
        def flushBr(): Unit = { br.foreach(bit => bwr.putBits(bit, 1)); br.clear() }
        var k = 1
        while (k <= 63) {
          val v = blk(zigzag(k))
          val tAbs = math.abs(v) // >> Al with Al = 0
          if (tAbs == 0) r += 1
          else if (tAbs > 1) br += (tAbs & 1)
          else { // newly significant at this precision
            flushEob()
            while (r > 15) {
              val (zc, zl) = acCodes(0xF0); bwr.putBits(zc, zl)
              flushBr()
              r -= 16
            }
            val (c, l) = acCodes((r << 4) | 1)
            bwr.putBits(c, l)
            bwr.putBits(if (v > 0) 1 else 0, 1)
            flushBr()
            r = 0
          }
          k += 1
        }
        if (r > 0 || br.nonEmpty) {
          eobrun += 1
          be ++= br
          if (eobrun == 0x7FFF) flushEob()
        }
        m += 1
      }
      flushEob()
      bwr.pad()
      ci += 1
    }
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }

  // ---- deterministic DC-only test-vector builder ----------------------

  /** Annex K.3.1 luminance DC Huffman spec (counts per length, then
    * symbols = categories 0..11). */
  private val dcCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcSyms = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.2 luminance AC Huffman spec — only EOB (0x00, code
    * '1010') is emitted by the builder, but the full table ships so the
    * decoder exercises a realistic DHT. */
  private val acCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val acSyms = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  private def canonicalCodes(counts: Array[Int], syms: Array[Int])
      : Map[Int, (Int, Int)] = { // symbol -> (code, length)
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) {
        out += syms(k) -> (code, l); code += 1; k += 1; i += 1
      }
      code <<= 1; l += 1
    }
    out.result()
  }

  /** A deterministic baseline grayscale JPEG of flat 8x8 tiles: tile
    * t's (raster order) decoded pixel value is exactly
    * `clamp(dcs(t) + 128)` — DC-only blocks under a flat q0 = 8 table
    * dequantize to DC*8 and the IDCT of a DC-only block is DC_deq/8
    * uniformly, so the whole decode chain (markers, canonical Huffman,
    * DC prediction, dequant, IDCT, level shift) is hand-checkable and
    * SQL-replayable per tile. `dcs.length` must equal
    * (w/8) * (h/8); values in [-128, 127]. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nb = 0
    def putBits(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nb += 1
        if (nb == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nb = 0
        }
        i -= 1
      }
    }
    def pad(): Unit = if (nb > 0) putBits((1 << (8 - nb)) - 1, 8 - nb)
  }

  private def writeDcBlock(bw: BitWriter, diff: Int,
      dcCodes: Map[Int, (Int, Int)], eob: (Int, Int)): Unit = {
    val mag = math.abs(diff)
    var s = 0
    while ((mag >> s) != 0) s += 1 // category = bit length of |diff|
    val (c, l) = dcCodes(s)
    bw.putBits(c, l)
    if (s > 0)
      bw.putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    bw.putBits(eob._1, eob._2)
  }

  /** Shared headers up to (not including) the entropy bits: DQT with a
    * flat table (q0 = 8, rest 16), SOF0, the Annex K luminance DC+AC
    * tables, SOS (all components on tables 0/0). `comps` =
    * (id, hSamp, vSamp, quantTable). */
  private def writeHeaders(out: java.io.ByteArrayOutputStream,
      w: Int, h: Int, comps: Seq[(Int, Int, Int)],
      restartInterval: Int): Unit = {
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8) // SOI
    b(0xFF); b(0xDB); b16(2 + 1 + 64); b(0x00) // DQT, Pq=0/Tq=0
    (0 until 64).foreach(i => b(if (i == 0) 8 else 16))
    if (restartInterval > 0) { b(0xFF); b(0xDD); b16(4); b16(restartInterval) }
    b(0xFF); b(0xC0); b16(2 + 6 + 3 * comps.length) // SOF0
    b(8); b16(h); b16(w); b(comps.length)
    comps.foreach { case (id, hs, vs) => b(id); b((hs << 4) | vs); b(0) }
    b(0xFF); b(0xC4) // DHT: DC 0 + AC 0 (Annex K luminance)
    b16(2 + (1 + 16 + dcSyms.length) + (1 + 16 + acSyms.length))
    b(0x00); dcCounts.foreach(b); dcSyms.foreach(b)
    b(0x10); acCounts.foreach(b); acSyms.foreach(b)
    b(0xFF); b(0xDA); b16(2 + 1 + 2 * comps.length + 3) // SOS
    b(comps.length)
    comps.foreach { case (id, _, _) => b(id); b(0x00) }
    b(0); b(63); b(0)
  }

  def dcOnlyGray(w: Int, h: Int, dcs: Array[Int],
      restartEvery: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dcOnlyGray needs multiple-of-8 dims")
    require(dcs.length == (w / 8) * (h / 8), "one DC per 8x8 tile")
    require(dcs.forall(d => d >= -128 && d <= 127), "DC in [-128, 127]")
    val dcCodes = canonicalCodes(dcCounts, dcSyms)
    val eob = canonicalCodes(acCounts, acSyms)(0x00)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 1, 1)), restartEvery)
    var bw = new BitWriter(out)
    var prev = 0
    var i = 0
    while (i < dcs.length) {
      if (restartEvery > 0 && i > 0 && i % restartEvery == 0) {
        bw.pad()
        out.write(0xFF); out.write(0xD0 + ((i / restartEvery - 1) % 8))
        bw = new BitWriter(out)
        prev = 0 // restart resets the DC predictor
      }
      writeDcBlock(bw, dcs(i) - prev, dcCodes, eob)
      prev = dcs(i)
      i += 1
    }
    bw.pad()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** The PROGRESSIVE twin of [[dcOnlyColor420]], and the pin for the
    * one scan geometry no 4:4:4 stream exercises: single-component AC
    * scans walk the COMPONENT block grid (ceil(compW/8) x
    * ceil(compH/8)), which for a subsampled frame with w % 16 != 0 is
    * SMALLER than the padded MCU grid the coefficients are stored on
    * (e.g. w = 24: Y component 3 blocks wide, storage stride 4). The
    * scan script sandwiches per-component all-EOB AC scans between the
    * DC first and DC refine scans, so a decoder walking the wrong
    * grid over-consumes entropy bits and garbles the refinement —
    * decoded output must equal the baseline twin exactly. */
  def dcOnlyColor420Progressive(w: Int, h: Int, yDcs: Array[Int],
      cbDcs: Array[Int], crDcs: Array[Int]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "blocks are 8x8")
    val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
    val nMcu = mcusX * mcusY
    require(yDcs.length == 4 * nMcu && cbDcs.length == nMcu &&
      crDcs.length == nMcu, "4 Y + 1 Cb + 1 Cr DCs per (padded) MCU")
    require((yDcs ++ cbDcs ++ crDcs).forall(d => d >= -128 && d <= 127),
      "DC in [-128, 127]")
    val dcCodes = canonicalCodes(dcCounts, dcSyms)
    val eob = canonicalCodes(acCounts, acSyms)(0x00)
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8) // SOI
    b(0xFF); b(0xDB); b16(2 + 1 + 64); b(0x00) // DQT, q0 = 8 rest 16
    (0 until 64).foreach(i => b(if (i == 0) 8 else 16))
    b(0xFF); b(0xC2); b16(2 + 6 + 9) // SOF2, 4:2:0
    b(8); b16(h); b16(w); b(3)
    b(1); b(0x22); b(0); b(2); b(0x11); b(0); b(3); b(0x11); b(0)
    b(0xFF); b(0xC4) // DHT: Annex K luminance DC + AC on slot 0
    b16(2 + (1 + 16 + dcSyms.length) + (1 + 16 + acSyms.length))
    b(0x00); dcCounts.foreach(b); dcSyms.foreach(b)
    b(0x10); acCounts.foreach(b); acSyms.foreach(b)
    def sos(ids: Seq[Int], ss: Int, se: Int, ahal: Int): Unit = {
      b(0xFF); b(0xDA); b16(2 + 1 + 2 * ids.length + 3)
      b(ids.length); ids.foreach { id => b(id); b(0x00) }
      b(ss); b(se); b(ahal)
    }
    def putDcFirst(bw: BitWriter, v: Int, prev: Int): Unit = {
      val diff = v - prev
      val mag = math.abs(diff)
      var s = 0
      while ((mag >> s) != 0) s += 1
      val (c, l) = dcCodes(s)
      bw.putBits(c, l)
      if (s > 0) bw.putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    // scan 1: DC first, interleaved MCU walk over the PADDED grid
    sos(Seq(1, 2, 3), 0, 0, 0x01)
    locally {
      val bw = new BitWriter(out)
      var py = 0; var pcb = 0; var pcr = 0
      var m = 0
      while (m < nMcu) {
        var k = 0
        while (k < 4) {
          putDcFirst(bw, yDcs(4 * m + k) >> 1, py)
          py = yDcs(4 * m + k) >> 1; k += 1
        }
        putDcFirst(bw, cbDcs(m) >> 1, pcb); pcb = cbDcs(m) >> 1
        putDcFirst(bw, crDcs(m) >> 1, pcr); pcr = crDcs(m) >> 1
        m += 1
      }
      bw.pad()
    }
    // scans 2-4: all-EOB AC scans over each COMPONENT's own grid —
    // one EOB0 per component-grid block, never the padded stride
    val compBlocks = Seq(
      (1, ((w + 7) / 8) * ((h + 7) / 8)), // Y at full res
      (2, ((w / 2 + 7) / 8) * ((h / 2 + 7) / 8)),
      (3, ((w / 2 + 7) / 8) * ((h / 2 + 7) / 8)))
    compBlocks.foreach { case (id, n) =>
      sos(Seq(id), 1, 63, 0x00)
      val bw = new BitWriter(out)
      var i = 0
      while (i < n) { bw.putBits(eob._1, eob._2); i += 1 }
      bw.pad()
    }
    // scan 5: DC refine, interleaved — garbled if scans 2-4 miswalked
    sos(Seq(1, 2, 3), 0, 0, 0x10)
    locally {
      val bw = new BitWriter(out)
      var m = 0
      while (m < nMcu) {
        var k = 0
        while (k < 4) { bw.putBits(yDcs(4 * m + k) & 1, 1); k += 1 }
        bw.putBits(cbDcs(m) & 1, 1)
        bw.putBits(crDcs(m) & 1, 1)
        m += 1
      }
      bw.pad()
    }
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }

  /** The PROGRESSIVE (SOF2) twin of [[dcOnlyGray]]: the same flat
    * 8x8-tile semantics — tile t decodes to exactly
    * `clamp(dcs(t) + 128)` — delivered as two successive-approximation
    * DC scans (first at Al=1 with the arithmetic-shifted predictor
    * chain, then the LSB refinement scan), so the whole progressive DC
    * path is hand-checkable and SQL-replayable per tile. */
  def dcOnlyGrayProgressive(w: Int, h: Int, dcs: Array[Int],
      restartEvery: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dcOnlyGrayProgressive needs multiple-of-8 dims")
    require(dcs.length == (w / 8) * (h / 8), "one DC per 8x8 tile")
    require(dcs.forall(d => d >= -128 && d <= 127), "DC in [-128, 127]")
    val dcCodes = canonicalCodes(dcCounts, dcSyms)
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8) // SOI
    b(0xFF); b(0xDB); b16(2 + 1 + 64); b(0x00) // DQT, q0 = 8 rest 16
    (0 until 64).foreach(i => b(if (i == 0) 8 else 16))
    if (restartEvery > 0) { b(0xFF); b(0xDD); b16(4); b16(restartEvery) }
    b(0xFF); b(0xC2); b16(2 + 6 + 3) // SOF2, one component
    b(8); b16(h); b16(w); b(1)
    b(1); b(0x11); b(0)
    b(0xFF); b(0xC4) // DHT: Annex K luminance DC + AC on slot 0
    b16(2 + (1 + 16 + dcSyms.length) + (1 + 16 + acSyms.length))
    b(0x00); dcCounts.foreach(b); dcSyms.foreach(b)
    b(0x10); acCounts.foreach(b); acSyms.foreach(b)
    // scan 1: DC first, Al=1 — predictor chain over dc >> 1, reset at
    // every restart marker (T.81: intervals apply per scan)
    b(0xFF); b(0xDA); b16(2 + 1 + 2 + 3)
    b(1); b(1); b(0x00); b(0); b(0); b(0x01)
    var bw = new BitWriter(out)
    var prev = 0
    var i = 0
    while (i < dcs.length) {
      if (restartEvery > 0 && i > 0 && i % restartEvery == 0) {
        bw.pad()
        out.write(0xFF); out.write(0xD0 + ((i / restartEvery - 1) % 8))
        bw = new BitWriter(out)
        prev = 0
      }
      val v = dcs(i) >> 1
      val diff = v - prev; prev = v
      val mag = math.abs(diff)
      var s = 0
      while ((mag >> s) != 0) s += 1
      val (c, l) = dcCodes(s)
      bw.putBits(c, l)
      if (s > 0) bw.putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      i += 1
    }
    bw.pad()
    // scan 2: DC refine, Ah=1 Al=0 — one LSB per tile; restarts only
    // re-align the bit stream (no predictor in a refinement scan)
    b(0xFF); b(0xDA); b16(2 + 1 + 2 + 3)
    b(1); b(1); b(0x00); b(0); b(0); b(0x10)
    bw = new BitWriter(out)
    i = 0
    while (i < dcs.length) {
      if (restartEvery > 0 && i > 0 && i % restartEvery == 0) {
        bw.pad()
        out.write(0xFF); out.write(0xD0 + ((i / restartEvery - 1) % 8))
        bw = new BitWriter(out)
      }
      bw.putBits(dcs(i) & 1, 1)
      i += 1
    }
    bw.pad()
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }

  /** Progressive grayscale test vector for the ONE entropy-state
    * interaction no other golden drives: EOB-RUN accumulation in an
    * AC-first scan CROSSED with restart intervals. Each 8x8 block
    * carries `dcs(i)` and one optional AC coefficient `acs(i)` at
    * zigzag index 1; zero-AC blocks pool into EOBn runs (the flat
    * tables carry every EOBn symbol, unlike Annex K) and every run is
    * flushed at restart boundaries, where the decoder must reset the
    * run and re-align. Two scans: DC first at Al=0, then the AC band.
    * With every `acs` zero the decode equals [[dcOnlyGray]] exactly
    * (same flat-tile argument); with restarts it must equal its own
    * restart-free twin bit-for-bit. */
  def progressiveAcRestartGray(w: Int, h: Int, dcs: Array[Int],
      acs: Array[Int], restartEvery: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "multiple-of-8 dims")
    val nb = (w / 8) * (h / 8)
    require(dcs.length == nb && acs.length == nb, "one DC + one AC per tile")
    require(dcs.forall(d => d >= -128 && d <= 127), "DC in [-128, 127]")
    require(acs.forall(a => a > -512 && a < 512), "AC in (-512, 512)")
    val dcCodes = canonicalCodes(dcCountsFlat, dcSymsFlat)
    val acCodes = canonicalCodes(acCountsFlat, acSymsFlat)
    def cat(v: Int): Int = {
      val m = math.abs(v); var s = 0
      while ((m >> s) != 0) s += 1
      s
    }
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8)
    b(0xFF); b(0xDB); b16(2 + 1 + 64); b(0x00)
    (0 until 64).foreach(i => b(if (i == 0) 8 else 16))
    if (restartEvery > 0) { b(0xFF); b(0xDD); b16(4); b16(restartEvery) }
    b(0xFF); b(0xC2); b16(2 + 6 + 3)
    b(8); b16(h); b16(w); b(1)
    b(1); b(0x11); b(0)
    b(0xFF); b(0xC4) // DHT: the flat progressive pair on slot 0
    b16(2 + (1 + 16 + dcSymsFlat.length) + (1 + 16 + acSymsFlat.length))
    b(0x00); dcCountsFlat.foreach(b); dcSymsFlat.foreach(b)
    b(0x10); acCountsFlat.foreach(b); acSymsFlat.foreach(b)
    // scan 1: DC first, Al=0 (no refinement scan needed)
    b(0xFF); b(0xDA); b16(2 + 1 + 2 + 3)
    b(1); b(1); b(0x00); b(0); b(0); b(0x00)
    var bw = new BitWriter(out)
    var prev = 0
    var i = 0
    while (i < nb) {
      if (restartEvery > 0 && i > 0 && i % restartEvery == 0) {
        bw.pad()
        out.write(0xFF); out.write(0xD0 + ((i / restartEvery - 1) % 8))
        bw = new BitWriter(out)
        prev = 0
      }
      val diff = dcs(i) - prev; prev = dcs(i)
      val s = cat(diff)
      val (c, l) = dcCodes(s)
      bw.putBits(c, l)
      if (s > 0) bw.putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      i += 1
    }
    bw.pad()
    // scan 2: AC first 1..63, Al=0 — EOB runs pooled across zero
    // blocks, FLUSHED at every restart boundary
    b(0xFF); b(0xDA); b16(2 + 1 + 2 + 3)
    b(1); b(1); b(0x00); b(1); b(63); b(0x00)
    bw = new BitWriter(out)
    var eobrun = 0
    def flushEob(): Unit = if (eobrun > 0) {
      var r = 0
      while ((eobrun >> (r + 1)) != 0) r += 1
      val (c, l) = acCodes(r << 4)
      bw.putBits(c, l)
      if (r > 0) bw.putBits(eobrun - (1 << r), r)
      eobrun = 0
    }
    i = 0
    while (i < nb) {
      if (restartEvery > 0 && i > 0 && i % restartEvery == 0) {
        flushEob()
        bw.pad()
        out.write(0xFF); out.write(0xD0 + ((i / restartEvery - 1) % 8))
        bw = new BitWriter(out)
      }
      if (acs(i) == 0) eobrun += 1
      else {
        flushEob()
        val s = cat(acs(i))
        val (c, l) = acCodes(s) // run 0, size s at k = 1
        bw.putBits(c, l)
        bw.putBits(if (acs(i) >= 0) acs(i) else acs(i) + (1 << s) - 1, s)
        eobrun += 1 // zigzag 2..63 of this block end via an EOB run
      }
      i += 1
    }
    flushEob()
    bw.pad()
    b(0xFF); b(0xD9)
    out.toByteArray
  }

  /** A deterministic baseline 4:2:0 color JPEG of flat 16x16 MCU
    * tiles: per MCU m (raster order) the four Y blocks carry
    * `yDcs(4m .. 4m+3)` and chroma `cbDcs(m)` / `crDcs(m)` — decoded
    * YCbCr values are dc + 128 per the same flat-tile argument as
    * [[dcOnlyGray]], then BT.601 converts to RGB. Non-multiple-of-16
    * dims are allowed (round 15): the interleaved MCU walk always
    * covers the PADDED grid, so callers supply DCs for padding blocks
    * too and the decode crops to the true size. */
  def dcOnlyColor420(w: Int, h: Int, yDcs: Array[Int],
      cbDcs: Array[Int], crDcs: Array[Int]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "blocks are 8x8")
    val nMcu = ((w + 15) / 16) * ((h + 15) / 16)
    require(yDcs.length == 4 * nMcu && cbDcs.length == nMcu &&
      crDcs.length == nMcu, "4 Y + 1 Cb + 1 Cr DCs per MCU")
    val dcCodes = canonicalCodes(dcCounts, dcSyms)
    val eob = canonicalCodes(acCounts, acSyms)(0x00)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 2, 2), (2, 1, 1), (3, 1, 1)), 0)
    val bw = new BitWriter(out)
    var py = 0; var pcb = 0; var pcr = 0
    var m = 0
    while (m < nMcu) {
      var k = 0
      while (k < 4) {
        writeDcBlock(bw, yDcs(4 * m + k) - py, dcCodes, eob)
        py = yDcs(4 * m + k); k += 1
      }
      writeDcBlock(bw, cbDcs(m) - pcb, dcCodes, eob); pcb = cbDcs(m)
      writeDcBlock(bw, crDcs(m) - pcr, dcCodes, eob); pcr = crDcs(m)
      m += 1
    }
    bw.pad()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }
}

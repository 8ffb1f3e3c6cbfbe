package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Jpeg, Multimodal, Ppm}

/** Baseline JPEG decode goldens (the Ppm/Wav/Y4m hand-built
  * byte-stream pattern): DC-only streams decode to hand-computable
  * flat tiles (pixel = dc + 128 under the flat q0=8 table), a
  * hand-assembled AC coefficient reproduces the hand-evaluated cosine
  * row, 4:2:0 color converts through hand-computed BT.601 values,
  * restart markers reset the DC predictor, and non-baseline/garbage
  * bytes take the declared stub path (None). */
class JpegSpec extends AnyFunSuite {

  test("DC-only grayscale: flat tiles at clamp(dc + 128), DC prediction chain") {
    val dcs = Array(-80, 0, 64, 127) // diffs -80, +80, +64, +63
    val img = Jpeg.decode(Jpeg.dcOnlyGray(16, 16, dcs)).get
    assert(img.width == 16 && img.height == 16)
    val want = Array(48, 128, 192, 255) // tile raster order
    for (y <- 0 until 16; x <- 0 until 16) {
      val t = (y / 8) * 2 + (x / 8)
      val o = (y * 16 + x) * 3
      assert((img.pixels(o) & 0xFF) == want(t), s"($x,$y)")
      assert(img.pixels(o) == img.pixels(o + 1) &&
        img.pixels(o) == img.pixels(o + 2)) // grayscale -> R=G=B
    }
  }

  test("hand-assembled AC coefficient: one horizontal cosine, hand-computed row") {
    // header identical to dcOnlyGray(8, 8, [0]); entropy bits replaced:
    //   DC cat 0            -> '00'
    //   AC (run 0, size 1)  -> symbol 0x01 = '00', value bit '1' (+1)
    //   EOB                 -> '1010'
    // bits 00 00 1 1010 + pad 1111111 -> bytes 0x0D 0x7F
    val base = Jpeg.dcOnlyGray(8, 8, Array(0))
    // dcOnlyGray's entropy for dc=0 is '00'+'1010' padded -> one byte
    // (0x0A << 2 | 3 = 0b00101011) followed by EOI; splice our bytes in
    val bytes = base.dropRight(3) ++ Array[Byte](0x0D, 0x7F, 0xFF.toByte, 0xD9.toByte)
    val img = Jpeg.decode(bytes).get
    // coef(v=0, u=1) = +1 * q(1) = 16;
    // pixel(x) = round((1/4)*C(0)*C(1)*16*cos((2x+1)pi/16)) + 128
    //          = round(2*sqrt(2)*cos((2x+1)pi/16)) + 128
    // cos values .9808 .8315 .5556 .1951 (then negated, mirrored):
    // 2.774 2.352 1.571 0.552 -> 3 2 2 1 (and -1 -2 -2 -3)
    val want = Array(131, 130, 130, 129, 127, 126, 126, 125)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((img.pixels((y * 8 + x) * 3) & 0xFF) == want(x), s"($x,$y)")
  }

  test("4:2:0 color: flat YCbCr tiles through hand-computed BT.601") {
    // Y = 128, Cb = 80, Cr = 160:
    //   R = round(128 + 1.402*32)                    = 173
    //   G = round(128 - 0.344136*(-48) - 0.714136*32) = 122
    //   B = round(128 + 1.772*(-48))                  = 43
    val img = Jpeg.decode(Jpeg.dcOnlyColor420(16, 16,
      yDcs = Array(0, 0, 0, 0), cbDcs = Array(-48), crDcs = Array(32))).get
    assert(img.width == 16 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val o = (y * 16 + x) * 3
      assert((img.pixels(o) & 0xFF) == 173, s"R($x,$y)")
      assert((img.pixels(o + 1) & 0xFF) == 122, s"G($x,$y)")
      assert((img.pixels(o + 2) & 0xFF) == 43, s"B($x,$y)")
    }
  }

  test("restart markers reset the DC predictor") {
    // DRI = 1: each MCU is its own restart segment, so each block's DC
    // diff is vs 0, not the previous block
    val dcs = Array(100, -100, 50, -50)
    val img = Jpeg.decode(Jpeg.dcOnlyGray(32, 8, dcs, restartEvery = 1)).get
    val want = Array(228, 28, 178, 78)
    for (t <- 0 until 4; x <- 0 until 8)
      assert((img.pixels((3 * 32 + t * 8 + x) * 3) & 0xFF) == want(t), s"t$t x$x")
  }

  test("byte unstuffing: a hand-crafted FF 00 entropy byte decodes through") {
    // hand-crafted entropy with a stuffed FF: DC category 11's
    // canonical code is '111111110' (its first 8 bits are an FF byte,
    // which the encoder must stuff and the decoder must unstuff), then
    // 11 value bits 10000000000 (+1024) and EOB:
    //   FF 00 | 0 10000000 000 1010 0 -> bytes FF 00 40 0A
    // decoded DC = 1024 -> pixel 1024 + 128 clamps to 255
    val base = Jpeg.dcOnlyGray(8, 8, Array(0))
    val bytes = base.dropRight(3) ++ Array[Byte](0xFF.toByte, 0x00,
      0x40, 0x0A, 0xFF.toByte, 0xD9.toByte)
    val img = Jpeg.decode(bytes).get
    for (i <- 0 until 64)
      assert((img.pixels(i * 3) & 0xFF) == 255, s"pixel $i")
  }

  test("APP0/JFIF and COM segments are skipped by their full length") {
    // Real-world JFIF files always start with an APP0 marker segment;
    // the skip must advance length-2 bytes PAST the length field (a
    // `pos += u16 - 2` reads pos before u16's side effect and lands 2
    // bytes inside the payload, making every standard file undecodable).
    val base = Jpeg.dcOnlyGray(16, 16, Array(-80, 0, 64, 127))
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte, 0x00, 0x10,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val com = {
      val msg = "a comment".getBytes("US-ASCII")
      Array[Byte](0xFF.toByte, 0xFE.toByte, 0, (msg.length + 2).toByte) ++ msg
    }
    val withSegs = base.take(2) ++ app0 ++ com ++ base.drop(2)
    val img = Jpeg.decode(withSegs).get
    val plain = Jpeg.decode(base).get
    assert(img.width == 16 && img.height == 16)
    assert(java.util.Arrays.equals(img.pixels, plain.pixels))
  }

  test("non-baseline and malformed bytes take the stub path (None)") {
    val ok = Jpeg.dcOnlyGray(8, 8, Array(10))
    // flipping SOF0 to SOF2 leaves a CORRUPT progressive stream (a
    // baseline SOS declares band 0..63, illegal for a DC scan): still
    // None, now via the progressive scan validator
    val prog = ok.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xFF) == 0xFF &&
      i + 1 < prog.length && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(Jpeg.decode(prog).isEmpty)
    // arithmetic-coded (SOF9) stays the declared stub path
    val arith = ok.clone()
    arith(sof + 1) = 0xC9.toByte
    assert(Jpeg.decode(arith).isEmpty)
    assert(Jpeg.decode(ok.take(20)).isEmpty) // truncated mid-header
    assert(Jpeg.decode("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decode(Array[Byte]()).isEmpty)
    // P6 bytes are not a JPEG (and vice versa — the dispatch can't
    // cross wires)
    val p6 = Ppm.encode(Ppm.Image(2, 2, 255, new Array[Byte](12)))
    assert(Jpeg.decode(p6).isEmpty)
    assert(Ppm.decode(Jpeg.dcOnlyGray(8, 8, Array(0))).isEmpty)
  }

  test("encoder round trip: near-lossless at unit quantization") {
    // smooth two-axis gradient: quantization error is only coefficient
    // rounding, so every channel comes back within a few levels
    val w = 24; val h = 16
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = (40 + 6 * x).toByte
      px(o + 1) = (200 - 5 * y).toByte
      px(o + 2) = (60 + 3 * x + 4 * y).toByte
    }
    val img = Ppm.Image(w, h, 255, px)
    val back = Jpeg.decode(Jpeg.encode(img, Jpeg.FlatQ)).get
    assert(back.width == w && back.height == h)
    val maxErr = (0 until w * h * 3)
      .map(i => math.abs((back.pixels(i) & 0xFF) - (px(i) & 0xFF))).max
    assert(maxErr <= 3, s"maxErr $maxErr")
  }

  test("encoder round trip: Annex K table stays visually faithful and deterministic") {
    val w = 16; val h = 16
    val px = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val y = p / w; val x = p % w
      (x * 7 + y * 7 + 16).toByte // smooth ramp, max 226 — no wraparound
    }
    val img = Ppm.Image(w, h, 255, px)
    val e1 = Jpeg.encode(img)
    val e2 = Jpeg.encode(img)
    assert(java.util.Arrays.equals(e1, e2)) // bitwise-deterministic
    val back = Jpeg.decode(e1).get
    val maxErr = (0 until w * h * 3)
      .map(i => math.abs((back.pixels(i) & 0xFF) - (px(i) & 0xFF))).max
    assert(maxErr <= 20, s"maxErr $maxErr") // lossy but bounded on a gradient
    // decode is deterministic too
    val b2 = Jpeg.decode(e1).get
    assert(java.util.Arrays.equals(back.pixels, b2.pixels))
  }

  test("encoder pads non-multiple-of-8 dims; decode crops to true size") {
    val w = 10; val h = 6
    val px = Array.tabulate(w * h * 3)(i => ((i * 7) % 200 + 20).toByte)
    val back = Jpeg.decode(Jpeg.encode(Ppm.Image(w, h, 255, px), Jpeg.FlatQ)).get
    assert(back.width == w && back.height == h)
    assert(back.pixels.length == w * h * 3)
  }

  test("progressive DC-only: two successive-approximation scans, same tiles") {
    // identical tile semantics to dcOnlyGray — the DC first scan
    // carries dc >> 1 through the predictor chain, the refinement scan
    // restores each LSB; odd and even, positive and negative DCs all
    // reassemble exactly
    val dcs = Array(-81, -80, 0, 1, 63, 64, 126, 127, -128)
    val img = Jpeg.decode(Jpeg.dcOnlyGrayProgressive(24, 24, dcs)).get
    assert(img.width == 24 && img.height == 24)
    val want = dcs.map(d => math.max(0, math.min(255, d + 128)))
    for (y <- 0 until 24; x <- 0 until 24) {
      val t = (y / 8) * 3 + (x / 8)
      assert((img.pixels((y * 24 + x) * 3) & 0xFF) == want(t), s"($x,$y)")
    }
    // and the baseline twin of the same DCs decodes identically
    val base = Jpeg.decode(Jpeg.dcOnlyGray(24, 24, dcs)).get
    assert(java.util.Arrays.equals(img.pixels, base.pixels))
    // restart markers inside BOTH progressive scans: the DC-first
    // predictor resets per interval, the refinement scan re-aligns —
    // same tiles as the restart-bearing baseline twin
    val withRst = Jpeg.decode(
      Jpeg.dcOnlyGrayProgressive(24, 24, dcs, restartEvery = 4)).get
    val baseRst = Jpeg.decode(
      Jpeg.dcOnlyGray(24, 24, dcs, restartEvery = 4)).get
    assert(java.util.Arrays.equals(withRst.pixels, base.pixels))
    assert(java.util.Arrays.equals(baseRst.pixels, base.pixels))
  }

  test("progressive re-encode decodes bit-identically to baseline (fuzz)") {
    // encodeProgressive carries the same quantized coefficients as
    // encode, delivered through DC first/refine + AC first/refine
    // scans — after accumulation the reconstruction must match the
    // baseline decode BIT FOR BIT (same coefficients, same IDCT)
    val rnd = new scala.util.Random(7)
    val shapes = Seq((8, 8), (24, 16), (10, 6), (17, 9), (32, 32))
    for (((w, h), si) <- shapes.zipWithIndex; q <- Seq(Jpeg.FlatQ, Jpeg.AnnexKLumaQ)) {
      val px = new Array[Byte](w * h * 3)
      si match {
        case 0 => // flat image: every AC band empty -> one long EOB run
          java.util.Arrays.fill(px, 77.toByte)
        case 1 => // smooth gradient: sparse ACs, ZRL-heavy
          for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
            px((y * w + x) * 3 + c) = (30 + 5 * x + 7 * y + 20 * c).toByte
        case _ => rnd.nextBytes(px) // dense ACs, refinement-heavy
      }
      val img = Ppm.Image(w, h, 255, px)
      val fromBase = Jpeg.decode(Jpeg.encode(img, q)).get
      val prog = Jpeg.encodeProgressive(img, q)
      val fromProg = Jpeg.decode(prog).get
      assert(fromProg.width == w && fromProg.height == h, s"shape $w x $h")
      assert(java.util.Arrays.equals(fromProg.pixels, fromBase.pixels),
        s"pixel mismatch at $w x $h q=${q(0)}")
      // the stream really is SOF2 (and deterministic)
      assert(prog.indices.exists(i => (prog(i) & 0xFF) == 0xFF &&
        i + 1 < prog.length && (prog(i + 1) & 0xFF) == 0xC2))
      assert(java.util.Arrays.equals(prog, Jpeg.encodeProgressive(img, q)))
    }
  }

  test("progressive AC scan: EOB runs pooled across blocks, flushed at restarts") {
    // 8 blocks in a row: AC-bearing blocks interleaved with zero runs
    // so EOBn codes (run > 1) genuinely appear, and a restart interval
    // that lands inside a pooled run forces the flush + reset path
    val w = 64; val h = 8
    val dcs = Array(-80, 0, 64, 10, -5, 99, -128, 127)
    val acs = Array(40, 0, 0, -7, 0, 0, 0, 300)
    val plain = Jpeg.decode(
      Jpeg.progressiveAcRestartGray(w, h, dcs, acs)).get
    val rst = Jpeg.decode(
      Jpeg.progressiveAcRestartGray(w, h, dcs, acs, restartEvery = 3)).get
    assert(java.util.Arrays.equals(rst.pixels, plain.pixels),
      "restart boundaries changed the decoded pixels")
    // all-zero AC band == the baseline DC-only stream (flat tables and
    // the pooled-EOB path included)
    val z = Jpeg.decode(Jpeg.progressiveAcRestartGray(
      w, h, dcs, Array.fill(8)(0), restartEvery = 2)).get
    val base = Jpeg.decode(Jpeg.dcOnlyGray(w, h, dcs)).get
    assert(java.util.Arrays.equals(z.pixels, base.pixels))
    // the AC coefficients genuinely reached the pixels
    assert(!java.util.Arrays.equals(plain.pixels, base.pixels))
    // and only the AC-bearing blocks differ from their flat tiles
    for (blk <- 0 until 8; x <- 0 until 8) {
      val same = plain.pixels((blk * 8 + x) * 3) == base.pixels((blk * 8 + x) * 3)
      if (acs(blk) == 0) assert(same, s"zero-AC block $blk drifted at x=$x")
    }
  }

  test("progressive 4:2:0: component-grid AC scans, baseline parity at w%16!=0") {
    // w = 24 under 4:2:0: the Y component grid is 3x3 blocks while the
    // padded MCU storage stride is 4 — the geometry every real odd-size
    // progressive photo hits. The builder sandwiches per-component
    // all-EOB AC scans between DC first and DC refine, so a decoder
    // walking the padded grid in a single-component scan over-consumes
    // entropy bits and garbles the refinement.
    val w = 24; val h = 24
    val y = Array.tabulate(16)(i => (i * 13 % 200) - 100) // odd+even DCs
    val cb = Array.tabulate(4)(i => i * 21 - 30)
    val cr = Array.tabulate(4)(i => 41 - i * 15)
    val base = Jpeg.decode(Jpeg.dcOnlyColor420(w, h, y, cb, cr)).get
    val prog = Jpeg.decode(Jpeg.dcOnlyColor420Progressive(w, h, y, cb, cr)).get
    assert(prog.width == w && prog.height == h)
    assert(java.util.Arrays.equals(prog.pixels, base.pixels))
    // and the multiple-of-16 case agrees too (comp grid == padded grid)
    val y2 = Array.tabulate(4)(i => i * 31 - 60)
    val base2 = Jpeg.decode(Jpeg.dcOnlyColor420(16, 16, y2,
      Array(7), Array(-9))).get
    val prog2 = Jpeg.decode(Jpeg.dcOnlyColor420Progressive(16, 16, y2,
      Array(7), Array(-9))).get
    assert(java.util.Arrays.equals(prog2.pixels, base2.pixels))
  }

  test("aHash over a decoded JPEG matches the flat-tile integer math") {
    // 16x16 flat quadrants -> the 8x8 resize samples tiles by quadrant;
    // gray luma == pixel value; mean = sum // 64
    val dcs = Array(-80, 0, 64, 127)
    val img = Jpeg.decode(Jpeg.dcOnlyGray(16, 16, dcs)).get
    val v = Array(48, 128, 192, 255)
    val mean = (16 * v(0) + 16 * v(1) + 16 * v(2) + 16 * v(3)) / 64
    def row(left: Int, right: Int): Int =
      (if (left > mean) 0xF0 else 0) | (if (right > mean) 0x0F else 0)
    val top = f"${row(v(0), v(1))}%02X" * 4
    val bot = f"${row(v(2), v(3))}%02X" * 4
    assert(Ppm.aHash(img) == top + bot)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Y4m

/** Codec-level tests on hand-built YUV4MPEG2 byte streams — no Spark
  * involved (the [[PpmSpec]] / [[WavSpec]] pattern for the video
  * boundary). */
class Y4mSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Hand-assembled 4:2:0 stream around per-frame planar payloads. */
  private def y4m420(w: Int, h: Int, frames: Array[Byte]*): Array[Byte] =
    ascii(s"YUV4MPEG2 W$w H$h F30:1 Ip A1:1 C420\n") ++
      frames.flatMap(f => ascii("FRAME\n") ++ f)

  test("decodes a hand-built 4:2:0 stream") {
    // 4x2: Y=8 bytes, Cb=Cr=2x1=2 bytes each -> 12 bytes/frame
    val f0 = Array.tabulate[Byte](12)(i => i.toByte)
    val f1 = Array.tabulate[Byte](12)(i => (100 + i).toByte)
    val v = Y4m.decode(y4m420(4, 2, f0, f1)).get
    assert((v.width, v.height, v.fpsNum, v.fpsDen, v.colorspace) ===
      ((4, 2, 30, 1, "420")))
    assert(v.numFrames === 2 && v.frameSize === 12)
    assert(v.frames(0).toSeq === f0.toSeq && v.frames(1).toSeq === f1.toSeq)
  }

  test("colorspace variants: siting aliases, 422/444 geometry, mono") {
    def one(cs: String, fsz: Int): Y4m.Video =
      Y4m.decode(ascii(s"YUV4MPEG2 W4 H2 C$cs\n" + "FRAME\n") ++
        new Array[Byte](fsz)).get
    assert(one("420jpeg", 12).colorspace === "420")
    assert(one("420mpeg2", 12).colorspace === "420")
    assert(one("422", 16).frameSize === 16) // Y 8 + 2x(2x2)
    assert(one("444", 24).frameSize === 24) // three full planes
    assert(one("mono", 8).frameSize === 8)  // Y only
    // F absent -> the documented 25:1 default; C absent -> 420
    val d = Y4m.decode(ascii("YUV4MPEG2 W2 H2\nFRAME\n") ++
      new Array[Byte](6)).get
    assert((d.fpsNum, d.fpsDen, d.colorspace) === ((25, 1, "420")))
  }

  test("frame parameters and X extensions are inert") {
    val f = Array.tabulate[Byte](6)(i => (i * 3).toByte)
    val bytes = ascii("YUV4MPEG2 W2 H2 F24:1 XCOLORRANGE=FULL C420\n" +
      "FRAME Ip X=1\n") ++ f
    val v = Y4m.decode(bytes).get
    assert(v.numFrames === 1 && v.frames(0).toSeq === f.toSeq)
  }

  test("rejects malformed input without throwing") {
    val good = y4m420(4, 2, new Array[Byte](12))
    assert(Y4m.decode(ascii("YUV4MPEG3 W4 H2\nFRAME\n") ++
      new Array[Byte](12)) === None)                       // magic
    assert(Y4m.decode(ascii("YUV4MPEG2junk W4 H2\nFRAME\n") ++
      new Array[Byte](12)) === None)                       // magic not a full token
    assert(Y4m.decode(ascii("YUV4MPEG2 W4 H2 C420")) === None) // no header LF
    assert(Y4m.decode(ascii("YUV4MPEG2 H2 C420\nFRAME\n")) === None) // no width
    assert(Y4m.decode(ascii("YUV4MPEG2 W0 H2\nFRAME\n")) === None)   // zero dim
    assert(Y4m.decode(ascii(s"YUV4MPEG2 W99999999 H2\nFRAME\n")) === None) // huge
    assert(Y4m.decode(ascii("YUV4MPEG2 W4 H2 C411\nFRAME\n") ++
      new Array[Byte](12)) === None)                       // unsupported colorspace
    assert(Y4m.decode(ascii("YUV4MPEG2 W4 H2 Fx:1\nFRAME\n") ++
      new Array[Byte](12)) === None)                       // non-numeric rate
    assert(Y4m.decode(good.take(good.length - 1)) === None) // truncated payload
    assert(Y4m.decode(good ++ ascii("JUNK")) === None)      // garbage after frame
    assert(Y4m.decode(ascii("YUV4MPEG2 W4 H2\n")) === None) // zero frames
    // the sibling codecs' content is not video
    assert(Y4m.decode(ascii("P6\n2 2\n255\n") ++ new Array[Byte](12)) === None)
    assert(Y4m.decode(ascii("RIFF....WAVE") ++ new Array[Byte](32)) === None)
  }

  test("encode-decode round trip is the identity") {
    val v = Y4m.Video(6, 4, 24, 1, "422",
      Array.tabulate(3)(fi => Array.tabulate[Byte](6 * 4 + 2 * 3 * 4)(i =>
        (fi * 41 + i * 7).toByte)))
    val back = Y4m.decode(Y4m.encode(v)).get
    assert((back.width, back.height, back.fpsNum, back.fpsDen,
      back.colorspace) === ((6, 4, 24, 1, "422")))
    assert(back.frames.map(_.toSeq).toSeq === v.frames.map(_.toSeq).toSeq)
  }

  test("featurize computes real plane statistics and temporal motion") {
    // 2x2 mono, two frames: all-black then all-white
    val black = new Array[Byte](4)
    val white = Array.fill[Byte](4)(255.toByte)
    val v = Y4m.Video(2, 2, 30, 1, "mono", Array(black, white))
    val f = Y4m.featurize(v, 8)
    assert(math.abs(f(0) - 0.5) < 1e-6)  // mean luma
    assert(f(1) === 0f && f(2) === 0f)   // mono: no chroma
    assert(math.abs(f(3) - 1.0) < 1e-6)  // full-scale motion
    // histogram over 4 buckets: half the mass at each extreme
    assert(f(4) === 0.5f && f(7) === 0.5f && f(5) === 0f && f(6) === 0f)
    // 420 chroma means come from the actual chroma planes
    val frame = Array[Byte](0, 0, 0, 0, 64, 192.toByte) // Y=0s, Cb=64, Cr=192
    val c = Y4m.featurize(Y4m.Video(2, 2, 30, 1, "420", Array(frame)), 4)
    assert(math.abs(c(1) - 64.0 / 255) < 1e-6)
    assert(math.abs(c(2) - 192.0 / 255) < 1e-6)
    assert(c(3) === 0f) // single frame: no motion
  }

  test("frameHash fingerprints a frame's luma plane") {
    // 16x16 mono: top half black, bottom half white -> 00000000FFFFFFFF
    val f0 = new Array[Byte](256)
    java.util.Arrays.fill(f0, 128, 256, 0xFF.toByte)
    val v = Y4m.Video(16, 16, 30, 1, "mono", Array(f0, new Array[Byte](256)))
    assert(Y4m.frameHash(v, 0) === "00000000FFFFFFFF")
    assert(Y4m.frameHash(v, 1) === "0000000000000000") // uniform frame
    intercept[IllegalArgumentException] { Y4m.frameHash(v, 2) }
  }

  test("decimate keeps every step-th frame and scales the rate exactly") {
    val v = Y4m.Video(2, 1, 30, 1, "mono",
      Array.tabulate(5)(fi => Array.fill[Byte](2)(fi.toByte)))
    val d = Y4m.decimate(v, 2)
    assert(d.numFrames === 3)
    assert(d.frames.map(_(0).toInt).toSeq === Seq(0, 2, 4))
    assert((d.fpsNum, d.fpsDen) === ((30, 2))) // 15 fps as an exact rational
    assert(Y4m.decimate(v, 1) eq v)            // step 1 is the identity
    val rt = Y4m.decode(Y4m.encode(d)).get
    assert(rt.numFrames === 3 && rt.fpsDen === 2)
  }

  test("nearest-neighbour resize maps each plane at its own geometry") {
    // 2x2 420: Y quadrants 10/20/30/40, Cb=100, Cr=200
    val frame = Array[Byte](10, 20, 30, 40, 100, 200.toByte)
    val v = Y4m.Video(2, 2, 30, 1, "420", Array(frame))
    val up = Y4m.resizeNearest(v, 4, 4)
    assert(up.frameSize === 4 * 4 + 2 * 4)
    val f = up.frames(0)
    // Y: each source pixel becomes a 2x2 block
    assert(f.take(16).toSeq === Seq[Byte](
      10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40))
    // chroma planes upsample 1x1 -> 2x2 constant
    assert(f.slice(16, 20).forall(_ === 100.toByte))
    assert(f.slice(20, 24).forall(_ === 200.toByte))
    // downsize back picks the expected source samples
    val down = Y4m.resizeNearest(up, 2, 2)
    assert(down.frames(0).toSeq === frame.toSeq)
    // resized streams re-encode and re-decode
    val rt = Y4m.decode(Y4m.encode(up)).get
    assert(rt.width === 4 && rt.frames(0).toSeq === f.toSeq)
  }
}

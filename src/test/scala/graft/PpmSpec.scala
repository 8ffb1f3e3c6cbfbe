package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Ppm

/** Codec-level tests on hand-built byte images — no Spark involved. */
class PpmSpec extends AnyFunSuite {

  // 2x2 image: red, green / blue, white
  private val px2x2 = Array[Byte](
    255.toByte, 0, 0,   0, 255.toByte, 0,
    0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)

  private def img2x2 = Ppm.Image(2, 2, 255, px2x2)

  test("decodes a hand-built P6 byte stream") {
    val bytes = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px2x2
    val img = Ppm.decode(bytes)
    assert(img.isDefined)
    assert(img.get.width === 2 && img.get.height === 2 && img.get.maxVal === 255)
    assert(img.get.pixels.toSeq === px2x2.toSeq)
  }

  test("parses header whitespace variants and comments") {
    val ws = "P6 2\t2\r255\n".getBytes("US-ASCII") ++ px2x2
    assert(Ppm.decode(ws).map(_.pixels.toSeq) === Some(px2x2.toSeq))
    val comment = "P6\n# a comment line\n2 2\n# another\n255\n"
      .getBytes("US-ASCII") ++ px2x2
    assert(Ppm.decode(comment).map(_.pixels.toSeq) === Some(px2x2.toSeq))
  }

  test("rejects malformed input without throwing") {
    assert(Ppm.decode(Array[Byte]()) === None)
    assert(Ppm.decode("P5\n2 2\n255\n".getBytes ++ px2x2) === None) // wrong magic
    assert(Ppm.decode("P6\n2 2\n255\n".getBytes ++ px2x2.take(11)) === None) // short
    assert(Ppm.decode("P6\n0 2\n255\n".getBytes ++ px2x2) === None) // zero dim
    assert(Ppm.decode("P6\n2 2\n65535\n".getBytes ++ px2x2) === None) // 2-byte maxval
    assert(Ppm.decode("P6\n999999999 2\n255\n".getBytes ++ px2x2) === None) // huge
    assert(Ppm.decode((0 until 64).map(_.toByte).toArray) === None) // arbitrary
  }

  test("encode-decode round trip is the identity") {
    val back = Ppm.decode(Ppm.encode(img2x2))
    assert(back.map(i => (i.width, i.height, i.maxVal, i.pixels.toSeq)) ===
      Some((2, 2, 255, px2x2.toSeq)))
  }

  test("aHash fingerprints the real pixel grid deterministically") {
    // top half black, bottom half white (16x16): rows 0-3 of the 8x8
    // luma grid sit below the mean, rows 4-7 above -> 00000000FFFFFFFF
    val px = new Array[Byte](16 * 16 * 3)
    java.util.Arrays.fill(px, 16 * 8 * 3, px.length, 0xFF.toByte)
    val img = graft.multimodal.Ppm.Image(16, 16, 255, px)
    assert(graft.multimodal.Ppm.aHash(img) === "00000000FFFFFFFF")
    // uniform image: no luma strictly above the mean -> all-zero hash
    val flat = graft.multimodal.Ppm.Image(4, 4, 255,
      Array.fill[Byte](48)(100.toByte))
    assert(graft.multimodal.Ppm.aHash(flat) === "0000000000000000")
    // a small perturbation flips few bits (Hamming-near, not equal)
    val px2 = px.clone(); px2(0) = 0x40
    val h1 = graft.multimodal.Ppm.aHash(img)
    val h2 = graft.multimodal.Ppm.aHash(
      graft.multimodal.Ppm.Image(16, 16, 255, px2))
    def bits(h: String): Long =
      java.lang.Long.parseUnsignedLong(h, 16)
    assert(java.lang.Long.bitCount(bits(h1) ^ bits(h2)) <= 2)
  }

  test("nearest-neighbour resize maps the expected source pixels") {
    // 2x2 -> 4x4: quadrant replication (sx = floor(x*2/4) etc.)
    val up = Ppm.resizeNearest(img2x2, 4, 4)
    assert(up.width === 4 && up.height === 4)
    def pix(img: Ppm.Image, x: Int, y: Int): Seq[Byte] = {
      val o = (y * img.width + x) * 3
      img.pixels.slice(o, o + 3).toSeq
    }
    assert(pix(up, 0, 0) === pix(img2x2, 0, 0)) // red quadrant
    assert(pix(up, 1, 1) === pix(img2x2, 0, 0))
    assert(pix(up, 3, 0) === pix(img2x2, 1, 0)) // green quadrant
    assert(pix(up, 0, 3) === pix(img2x2, 0, 1)) // blue quadrant
    assert(pix(up, 3, 3) === pix(img2x2, 1, 1)) // white quadrant
    // 2x2 -> 1x1 keeps the top-left source pixel
    val down = Ppm.resizeNearest(img2x2, 1, 1)
    assert(pix(down, 0, 0) === pix(img2x2, 0, 0))
  }

  test("featurize computes real channel means and a full histogram") {
    val f = Ppm.featurize(img2x2, 8)
    // channel sums over {red, green, blue, white}: R=510, G=510, B=510
    assert(math.abs(f(0) - 510.0 / (255 * 4)) < 1e-6)
    assert(f(0) === f(1) && f(1) === f(2))
    // histogram over dim-4 = 4 buckets sums to 1
    assert(math.abs(f.drop(4).map(_.toDouble).sum - 1.0) < 1e-6)
    // solid-black image: zero means, all mass in bucket 0
    val black = Ppm.Image(2, 2, 255, new Array[Byte](12))
    val fb = Ppm.featurize(black, 8)
    assert(fb(0) === 0f && fb(3) === 0f && fb(4) === 1f)
  }

  test("featurize normalizes by the image's declared maxVal") {
    // all-channels-at-maxVal: means must be exactly 1 whatever the
    // declared range (a hardwired /255 would give 3/255 here)
    val solid3 = Ppm.Image(2, 2, 3, Array.fill[Byte](12)(3))
    val f3 = Ppm.featurize(solid3, 8)
    assert(f3(0) === 1f && f3(1) === 1f && f3(2) === 1f && f3(3) === 1f)
    // full-range luminance lands in the TOP histogram bucket for
    // maxVal=3 exactly as it does for maxVal=255
    assert(f3(7) === 1f && f3(4) === 0f)
    // half-range pixels on a maxVal=2 image: means exactly 0.5
    val half2 = Ppm.Image(2, 2, 2, Array.fill[Byte](12)(1))
    assert(Ppm.featurize(half2, 8)(0) === 0.5f)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Jpeg, Ppm, Wav, Y4m}

/** Hostile-input fuzz for the three in-container codecs: the decode
  * boundary's contract is DEGRADE (return None), never throw — a task
  * must survive arbitrary bytes in a 100 TB lake. Seeded, so failures
  * reproduce. */
class CodecFuzzSpec extends AnyFunSuite {

  private def decodeAll(bytes: Array[Byte]): Unit = {
    Ppm.decode(bytes).foreach { img =>
      val back = Ppm.decode(Ppm.encode(img)).get
      assert(back.pixels.toSeq === img.pixels.toSeq)
      Ppm.featurize(img, 8).foreach(f => assert(!f.isNaN && !f.isInfinite))
    }
    Wav.decode(bytes).foreach { a =>
      val back = Wav.decode(Wav.encode(a)).get
      assert(back.data.toSeq === a.data.toSeq)
      Wav.featurize(a, 8).foreach(f => assert(!f.isNaN && !f.isInfinite))
    }
    Y4m.decode(bytes).foreach { v =>
      val back = Y4m.decode(Y4m.encode(v)).get
      assert(back.frames.map(_.toSeq).toSeq === v.frames.map(_.toSeq).toSeq)
      Y4m.featurize(v, 8).foreach(f => assert(!f.isNaN && !f.isInfinite))
    }
    // JPEG is lossy — survivors just need sane dims and pixel buffers
    Jpeg.decode(bytes).foreach { img =>
      assert(img.width > 0 && img.height > 0 &&
        img.width.toLong * img.height <= Jpeg.MaxPixels)
      assert(img.pixels.length == img.width * img.height * 3)
    }
  }

  test("random bytes never throw; accidental decodes round-trip") {
    val rnd = new scala.util.Random(0xC0DEC5L)
    for (_ <- 0 until 20000) {
      val bytes = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(bytes)
      decodeAll(bytes)
    }
  }

  test("mutated valid streams never throw; survivors still round-trip") {
    val rnd = new scala.util.Random(0xFADEDL)
    val seeds: Seq[Array[Byte]] = Seq(
      Ppm.encode(Ppm.Image(4, 3, 255, Array.tabulate[Byte](36)(_.toByte))),
      Wav.encode(Wav.Audio(8000, 1, 16, Array.tabulate[Byte](24)(i => (i * 9).toByte))),
      Y4m.encode(Y4m.Video(4, 2, 30, 1, "420",
        Array.tabulate(2)(fi => Array.tabulate[Byte](12)(i => (fi * 31 + i).toByte)))),
      Jpeg.dcOnlyGray(16, 16, Array(-80, 0, 64, 127)),
      Jpeg.dcOnlyGrayProgressive(16, 16, Array(-80, 0, 64, 127)),
      Jpeg.encodeProgressive(Ppm.Image(8, 8, 255,
        Array.tabulate[Byte](192)(i => (i * 5).toByte))))
    for (_ <- 0 until 20000) {
      val base = seeds(rnd.nextInt(seeds.length))
      val mutated = base.clone()
      rnd.nextInt(3) match {
        case 0 => // flip 1-4 random bytes (headers included)
          for (_ <- 0 to rnd.nextInt(4))
            mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
          decodeAll(mutated)
        case 1 => // truncate anywhere
          decodeAll(java.util.Arrays.copyOf(mutated, rnd.nextInt(mutated.length + 1)))
        case 2 => // append garbage
          val tail = new Array[Byte](rnd.nextInt(32))
          rnd.nextBytes(tail)
          decodeAll(mutated ++ tail)
      }
    }
  }

  test("headers declaring huge payloads are rejected, not allocated") {
    // a 16383x16383 P6 header with no payload must parse-fail cheaply
    assert(Ppm.decode("P6\n16383 16383\n255\n".getBytes("US-ASCII")) === None)
    // a WAV data chunk larger than the buffer must be rejected
    val w = Wav.encode(Wav.Audio(8000, 1, 16, new Array[Byte](4)))
    w(40) = 0xFF.toByte; w(41) = 0xFF.toByte; w(42) = 0xFF.toByte; w(43) = 0x7F
    assert(Wav.decode(w) === None)
    // a JPEG SOF declaring 65504x65504 must hit the pixel cap before
    // any plane/coefficient allocation (baseline AND progressive)
    for (sof <- Seq(0xC0, 0xC2)) {
      val j = Jpeg.dcOnlyGray(16, 16, Array(0, 0, 0, 0))
      val at = j.indices.find(i => (j(i) & 0xFF) == 0xFF &&
        i + 1 < j.length && (j(i + 1) & 0xFF) == 0xC0).get
      j(at + 1) = sof.toByte
      // height/width fields sit at SOF + 5
      j(at + 5) = 0xFF.toByte; j(at + 6) = 0xE0.toByte
      j(at + 7) = 0xFF.toByte; j(at + 8) = 0xE0.toByte
      assert(Jpeg.decode(j) === None)
    }
    // a y4m geometry above MaxEdge must be rejected before any frame work
    assert(Y4m.decode("YUV4MPEG2 W16385 H2\nFRAME\n".getBytes("US-ASCII") ++
      new Array[Byte](1 << 16)) === None)
  }
}

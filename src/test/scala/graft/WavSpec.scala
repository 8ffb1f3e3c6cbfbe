package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Wav

/** Codec-level tests on hand-built WAV byte streams — no Spark
  * involved (the [[PpmSpec]] pattern for the audio boundary). */
class WavSpec extends AnyFunSuite {

  /** Hand-assembled canonical 16-bit mono WAV around `samples`. */
  private def wav16(samples: Seq[Int], rate: Int = 16000): Array[Byte] = {
    val data = samples.flatMap(s =>
      Seq((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)).toArray
    Wav.encode(Wav.Audio(rate, 1, 16, data))
  }

  test("decodes a hand-built 16-bit PCM byte stream") {
    val a = Wav.decode(wav16(Seq(0, 1000, -1000, 32767, -32768))).get
    assert(a.sampleRate === 16000 && a.channels === 1 && a.bitsPerSample === 16)
    assert(a.numSamples === 5)
    assert((0 until 5).map(a.sample) === Seq(0, 1000, -1000, 32767, -32768))
  }

  test("decodes 8-bit PCM as excess-128 centered samples") {
    val bytes = Wav.encode(Wav.Audio(8000, 1, 8,
      Array[Byte](128.toByte, 0, 255.toByte, 192.toByte)))
    val a = Wav.decode(bytes).get
    assert((0 until 4).map(a.sample) === Seq(0, -128, 127, 64))
  }

  test("walks unknown chunks and even padding to find fmt/data") {
    // RIFF( LIST(odd size -> pad byte) fmt data )
    val inner = wav16(Seq(7, -7))
    val fmtAndData = inner.drop(12) // the canonical fmt+data chunks
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val total = 4 + list.length + fmtAndData.length
    val riff = "RIFF".getBytes("US-ASCII") ++ Array[Byte](
      (total & 0xFF).toByte, ((total >> 8) & 0xFF).toByte, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ list ++ fmtAndData
    val a = Wav.decode(riff).get
    assert(a.numSamples === 2 && a.sample(0) === 7 && a.sample(1) === -7)
  }

  test("rejects malformed input without throwing") {
    val good = wav16(Seq(1, 2, 3))
    assert(Wav.decode("RIFX".getBytes ++ good.drop(4)) === None) // magic
    assert(Wav.decode(good.take(20)) === None)                   // truncated
    val floatFmt = good.clone(); floatFmt(20) = 3 // IEEE float format
    assert(Wav.decode(floatFmt) === None)
    val badBits = good.clone(); badBits(34) = 12 // unsupported width
    assert(Wav.decode(badBits) === None)
    val hugeData = good.clone(); hugeData(43) = 0x7F // data size > buffer
    assert(Wav.decode(hugeData) === None)
    assert(Wav.decode(Array[Byte](1, 2, 3)) === None)            // garbage
    // and a P6 image is not audio
    assert(Wav.decode("P6\n2 2\n255\n".getBytes ++ new Array[Byte](12)) === None)
  }

  test("encode-decode round trip is the identity") {
    val a = Wav.Audio(44100, 2, 16, Array.tabulate[Byte](24)(i => (i * 7).toByte))
    val back = Wav.decode(Wav.encode(a)).get
    assert((back.sampleRate, back.channels, back.bitsPerSample,
      back.data.toSeq) === ((44100, 2, 16, a.data.toSeq)))
  }

  test("encode pads an odd-length data chunk to an even RIFF boundary") {
    // 8-bit mono, 5 samples -> 5 data bytes (odd). RIFF requires the
    // chunk padded to even: container is 44 + 5 + 1 bytes, data size
    // field stays 5, RIFF size field includes the pad.
    val a = Wav.Audio(8000, 1, 8, Array[Byte](1, 2, 3, 4, 5))
    val enc = Wav.encode(a)
    assert(enc.length === 50)
    def u32(p: Int): Long =
      (enc(p) & 0xFFL) | ((enc(p + 1) & 0xFFL) << 8) |
        ((enc(p + 2) & 0xFFL) << 16) | ((enc(p + 3) & 0xFFL) << 24)
    assert(u32(4) === 36 + 5 + 1) // RIFF size includes the pad byte
    assert(u32(40) === 5)         // data chunk size excludes it
    assert(enc(49) === 0)         // the pad byte itself
    val back = Wav.decode(enc).get
    assert(back.data.toSeq === a.data.toSeq)
    // even-length data stays pad-free
    assert(Wav.encode(Wav.Audio(8000, 1, 8, Array[Byte](1, 2))).length === 46)
  }

  test("resampleLinear interpolates exactly on the integer grid") {
    // upsample 3 -> 6 frames: positions j*(2)/5, two-tap round-half-away
    val up = Wav.resampleLinear(
      Wav.decode(wav16(Seq(0, 100, 200))).get, 32000)
    assert(up.sampleRate === 32000 && up.numSamples === 6)
    assert((0 until 6).map(up.sample) === Seq(0, 40, 80, 120, 160, 200))
    // downsample by 2: every other exact source frame (frac = 0 path)
    val down = Wav.resampleLinear(
      Wav.decode(wav16(Seq(10, 20, 30, 40, 50))).get, 8000)
    assert(down.numSamples === 2)
    assert((0 until 2).map(down.sample) === Seq(10, 50))
    // same rate: identity
    val same = Wav.resampleLinear(Wav.decode(wav16(Seq(7, -7))).get, 16000)
    assert((0 until 2).map(same.sample) === Seq(7, -7))
    // negative samples round half AWAY from zero
    val neg = Wav.resampleLinear(
      Wav.decode(wav16(Seq(0, -5))).get, 32000)
    // positions 0, 1/3, 2/3, 1 -> 0, round(-5/3)=-2, round(-10/3)=-3, -5
    assert((0 until 4).map(neg.sample) === Seq(0, -2, -3, -5))
    // stereo channels resample independently
    val st = Wav.Audio(8000, 2, 16, Seq(0, 1000, 100, 900, 200, 800)
      .flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)).toArray)
    val st2 = Wav.resampleLinear(st, 16000) // 3 -> 6 frames per channel
    assert(st2.numSamples === 12)
    assert((0 until 6).map(f => st2.sample(2 * f)) ===
      Seq(0, 40, 80, 120, 160, 200))
    assert((0 until 6).map(f => st2.sample(2 * f + 1)) ===
      Seq(1000, 960, 920, 880, 840, 800))
    // re-encoded stream still decodes with the new rate
    val rt = Wav.decode(Wav.encode(up)).get
    assert(rt.sampleRate === 32000 && rt.numSamples === 6)
  }

  test("energyHash sets exactly the above-uniform-energy windows") {
    // 128 samples: the second half loud, the first silent -> windows
    // 32..63 carry all the energy -> hash 00000000FFFFFFFF
    val loudTail = Wav.decode(wav16(
      Seq.fill(64)(0) ++ Seq.fill(64)(1000))).get
    assert(Wav.energyHash(loudTail) === "00000000FFFFFFFF")
    // uniform energy: no window STRICTLY above the mean -> all zeros
    val flat = Wav.decode(wav16(Seq.fill(128)(500))).get
    assert(Wav.energyHash(flat) === "0000000000000000")
    // deterministic and length-robust (n < 64 leaves trailing windows 0)
    val short = Wav.decode(wav16(Seq(0, 0, 900, 0))).get
    val h = Wav.energyHash(short)
    assert(h === Wav.energyHash(short))
    // sample 2 of 4 -> window index 2*64/4 = 32 -> row 4, bit 0 -> "80"
    assert(h === "0000000080000000")
  }

  test("featurize computes real sample statistics and a full histogram") {
    // full-scale square wave: mean ~0 (one-sided -32768 excess), RMS ~1
    val sq = Wav.decode(wav16(Seq(32767, -32768, 32767, -32768))).get
    val f = Wav.featurize(sq, 8)
    assert(math.abs(f(0)) < 1e-4)        // mean ≈ 0
    assert(math.abs(f(1) - 1.0) < 1e-4)  // RMS ≈ full scale
    assert(math.abs(f(2) - (-1.0)) < 1e-6 && math.abs(f(3) - 32767.0 / 32768) < 1e-6)
    // histogram over dim-4 buckets sums to 1; mass at the two extremes
    assert(math.abs(f.drop(4).map(_.toDouble).sum - 1.0) < 1e-6)
    assert(f(4) === 0.5f && f(7) === 0.5f)
    // silence: all-zero stats, all mass in the center bucket
    val silent = Wav.decode(wav16(Seq(0, 0, 0, 0))).get
    val fs = Wav.featurize(silent, 8)
    assert(fs(0) === 0f && fs(1) === 0f && fs(2) === 0f && fs(3) === 0f)
    assert(fs(6) === 1f) // bucket of amplitude 0 in [-fs, fs) quarters
  }
}

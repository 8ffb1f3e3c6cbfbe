package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Cdc

/** Byte-level Gear CDC (functions/GearChunks.scala): boundary rule
  * trace against a scalar reference, the edit-locality property on a
  * BINARY (non-text) payload, chunk reassembly, degenerate shapes,
  * and the window property that keeps every cut offset-independent. */
class GearChunksSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def chunksOf(payload: Array[Byte], maskBits: Int = 6)
      : Seq[(Int, Int, Int, Long)] =
    Cdc.byteChunks(Seq((1L, payload)).toDF("doc_id", "bin"),
        binCol = "bin", maskBits = maskBits)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start", "len", "chunk_hash")
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))

  /** Scalar reference: the documented recurrence, straight off the
    * scaladoc, with GEAR and the chunk hash regenerated from md5. */
  private def refChunks(bytes: Array[Byte], maskBits: Int)
      : Seq[(Int, Int, Int, Long)] = {
    def md5p56(b: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(b)
      java.lang.Long.parseLong(d.take(7).map("%02x".format(_)).mkString, 16)
    }
    val gear = (0 until 256).map(b => md5p56(s"gear:$b".getBytes("US-ASCII")))
    val mask = (1L << maskBits) - 1
    var h = 0L
    var start = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    for (i <- bytes.indices) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      if ((h & mask) == 0L || i == bytes.length - 1) {
        out += ((out.length, start, i - start + 1,
          md5p56(bytes.slice(start, i + 1))))
        start = i + 1
      }
    }
    out.toSeq
  }

  test("boundary positions and chunk hashes follow the Gear rule") {
    val rnd = new scala.util.Random(42)
    // a genuinely binary payload: all 256 byte values in play
    val payload = Array.fill(4096)(rnd.nextInt(256).toByte)
    val got = chunksOf(payload)
    val want = refChunks(payload, 6)
    assert(got == want)
    assert(got.map(_._3).sum == payload.length, "chunks partition the bytes")
    assert(got.head._2 == 0 && got.map(t => t._2 + t._3) ==
      got.tail.map(_._2) :+ payload.length, "chunks are contiguous")
    // ~64-byte expected chunks on 4096 random bytes
    assert(got.length > 20 && got.length < 200, s"got ${got.length} chunks")
  }

  test("an edit stays local: far-away chunks keep their identity") {
    val rnd = new scala.util.Random(9)
    val orig = Array.fill(8192)(rnd.nextInt(256).toByte)
    // splice 5 bytes into the middle — every byte after the edit moves
    val edited = orig.take(4096) ++ Array.fill(5)(rnd.nextInt(256).toByte) ++
      orig.drop(4096)
    val a = chunksOf(orig).map(_._4)
    val b = chunksOf(edited).map(_._4)
    val shared = a.toSet.intersect(b.toSet).size
    // a fixed grid would lose every chunk after the splice (~half);
    // content-defined boundaries keep all but the edit neighbourhood
    assert(shared >= a.size - 4,
      s"edit was not local: ${a.size} chunks, only $shared survived")
    assert(a.toSet != b.toSet, "the edited neighbourhood must change")
  }

  test("degenerate shapes: empty, single byte, all-identical bytes") {
    assert(chunksOf(Array.empty[Byte]).isEmpty)
    val one = chunksOf(Array[Byte](7))
    assert(one.map(t => (t._1, t._2, t._3)) == Seq((0, 0, 1)))
    // a constant run still terminates with the implicit final cut and
    // matches the scalar reference (cuts may or may not fire inside)
    val const = Array.fill(1000)(65.toByte)
    assert(chunksOf(const) == refChunks(const, 6))
  }

  test("maskBits drives expected chunk length; bad arguments reject") {
    val rnd = new scala.util.Random(5)
    val payload = Array.fill(4096)(rnd.nextInt(256).toByte)
    val fine = chunksOf(payload, maskBits = 4).length   // ~16-byte chunks
    val coarse = chunksOf(payload, maskBits = 8).length // ~256-byte chunks
    assert(fine > coarse, s"fine=$fine coarse=$coarse")
    assert(chunksOf(payload, maskBits = 4) == refChunks(payload, 4))
    assert(chunksOf(payload, maskBits = 8) == refChunks(payload, 8))
    intercept[IllegalArgumentException] {
      Cdc.byteChunks(Seq((1L, Array[Byte](1))).toDF("doc_id", "bin"),
        "bin", maskBits = 0)
    }
    intercept[Exception] { // non-foldable maskBits rejected at analysis
      Seq((1L, Array[Byte](1), 3)).toDF("doc_id", "bin", "m")
        .selectExpr("graft_gear_chunks(bin, m)").collect()
    }
  }

  test("RIFF/WAVE container layout chunks by the Gear rule and stays oracle-safe") {
    // the q_cdc_media_wav corpus shape: 8-bit mono PCM through the
    // real encoder — the binary LE header fields ride along as bytes
    import graft.multimodal.Wav
    for (id <- Seq(3L, 17L, 40L)) {
      val base = ("some document text for the wav body.").getBytes("UTF-8")
      val n = (id % 40 + 20).toInt
      val data = Array.tabulate[Byte](n)(i => base(i % base.length))
      val payload = Wav.encode(Wav.Audio(8000, 1, 8, data))
      // the oracle-validity invariant: every container byte ≤ 0x7F,
      // so the VARCHAR rebuild hashes the identical byte stream
      assert(payload.forall(b => (b & 0xFF) <= 0x7F), s"id=$id non-ASCII byte")
      assert(payload.length == 44 + n + (n & 1))
      val got = chunksOf(payload)
      assert(got == refChunks(payload, 6), s"id=$id")
      assert(got.map(_._3).sum == payload.length)
    }
  }

  test("YUV4MPEG2 container layout chunks by the Gear rule and stays oracle-safe") {
    import graft.multimodal.Y4m
    for (id <- Seq(2L, 11L, 35L)) {
      val base = ("plane bytes come from the doc text.").getBytes("UTF-8")
      val w = (id % 13 + 4).toInt; val h = (id % 11 + 4).toInt
      val nf = (id % 4 + 2).toInt
      val frames = Array.tabulate(nf)(fi =>
        Array.tabulate[Byte](w * h)(i => base((fi * w * h + i) % base.length)))
      val payload = Y4m.encode(Y4m.Video(w, h, 30, 1, "mono", frames))
      assert(payload.forall(b => (b & 0xFF) <= 0x7F), s"id=$id non-ASCII byte")
      val got = chunksOf(payload)
      assert(got == refChunks(payload, 6), s"id=$id")
      assert(got.map(_._3).sum == payload.length)
    }
  }

  test("text payloads chunk as their UTF-8 bytes (the q_cdc_bytes path)") {
    val text = "the quick brown fox " * 40
    val viaText = Cdc.byteChunks(
        Seq((1L, text)).toDF("doc_id", "text"), binCol = "text")
      .select("chunk_idx", "start", "len", "chunk_hash")
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(viaText == refChunks(text.getBytes("UTF-8"), 6))
  }
}

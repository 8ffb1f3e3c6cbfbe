package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Cdc, Rewrite}

/** Content-defined chunking: boundary rule trace, the edit-locality
  * property that motivates CDC over a fixed grid, degenerate shapes,
  * and partitioning independence. */
class CdcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = Seq((id, text)).toDF("doc_id", "text")

  private def chunksOf(text: String, w: Int = 8, divisor: Int = 16): Seq[(Long, Long, String)] =
    Cdc.cdcChunks(doc(1L, text), w = w, divisor = divisor)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens", "chunk")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("chunks partition the token stream in order") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val cs = chunksOf(text)
    assert(cs.map(_._1) == cs.indices.map(_.toLong))
    assert(cs.map(_._2).sum == 200L)
    assert(cs.map(_._3).mkString(" ") == text)
  }

  test("boundary positions follow the window-hash divisor rule") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val toks = text.split(" ")
    // reference trace: md5-based 56-bit hash of each 8-token window
    def h56(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(7).map("%02x".format(_)).mkString, 16)
    }
    val cuts = (0 to toks.length - 8).filter { s =>
      h56("cdcw:" + toks.slice(s, s + 8).mkString(" ")) % 16 == 0
    }.map(_ + 7).toSet
    val expectedStarts = (0L +: cuts.toSeq.sorted.filter(_ < toks.length - 1)
      .map(_ + 1L)).map(_.toLong)
    val got = Cdc.cdcChunks(doc(1L, text)).orderBy("chunk_idx")
      .select("start_pos").as[Long].collect().toSeq
    assert(got == expectedStarts)
  }

  test("an edit stays local: far-away chunks keep their identity") {
    val rnd = new scala.util.Random(7)
    val words = (1 to 400).map(_ => s"x${rnd.nextInt(5000)}")
    val orig = words.mkString(" ")
    // insert one token mid-document
    val edited = (words.take(200) ++ Seq("INSERTED") ++ words.drop(200)).mkString(" ")
    val a = Cdc.cdcChunks(doc(1L, orig)).select("chunk").as[String].collect().toSet
    val b = Cdc.cdcChunks(doc(1L, edited)).select("chunk").as[String].collect().toSet
    // CDC: only the chunk(s) containing the edit neighbourhood change —
    // the boundary test depends on an 8-token window, so chunks whose
    // span is >7 tokens away resynchronize exactly
    val changed = (a diff b).size max (b diff a).size
    assert(changed <= 3, s"CDC edit blast radius too large: $changed chunks")
    // the fixed k-token grid shifts EVERY chunk after the edit: the
    // same edit invalidates most of the document's chunk identities
    val ga = Rewrite.chunkOccurrences(doc(1L, orig), k = 16)
      .select("chunk").as[String].collect().toSet
    val gb = Rewrite.chunkOccurrences(doc(1L, edited), k = 16)
      .select("chunk").as[String].collect().toSet
    val gridChanged = (ga diff gb).size
    assert(gridChanged > changed * 2,
      s"grid chunking should lose far more chunks (grid $gridChanged vs cdc $changed)")
  }

  test("short and empty documents degenerate cleanly") {
    // shorter than the window: one chunk, no boundary test possible
    val one = chunksOf("a b c")
    assert(one == Seq((0L, 3L, "a b c")))
    // token-less: no rows
    assert(Cdc.cdcChunks(doc(1L, "   ")).count() == 0L)
  }

  test("dedup stats find the planted cross-document chunk reuse") {
    val rnd = new scala.util.Random(11)
    val shared = (1 to 120).map(_ => s"s${rnd.nextInt(4000)}").mkString(" ")
    val uniqueA = (1 to 60).map(_ => s"a${rnd.nextInt(4000)}").mkString(" ")
    val uniqueB = (1 to 60).map(_ => s"b${rnd.nextInt(4000)}").mkString(" ")
    // doc 2 embeds doc 1's shared span at a DIFFERENT token offset —
    // the alignment CDC is built for
    val docs = Seq(
      (1L, s"$shared $uniqueA"),
      (2L, s"$uniqueB $shared")).toDF("doc_id", "text")
    val stats = Cdc.cdcDedupStats(docs).orderBy("doc_id").collect()
    val d1 = stats(0); val d2 = stats(1)
    assert(d1.getAs[Long]("dup_chunks") == 0L, "keeper doc holds every first occurrence")
    assert(d2.getAs[Long]("dup_tokens") >= 80L,
      s"shifted shared span should dedup most of its tokens, got ${d2.getAs[Long]("dup_tokens")}")
  }

  test("sync plan re-ships only the edit neighbourhood of a re-fetch") {
    val rnd = new scala.util.Random(23)
    val words = (1 to 400).map(_ => s"y${rnd.nextInt(6000)}")
    val held = doc(1L, words.mkString(" "))
    val edited = (words.take(150) ++ Seq("patch", "v2") ++ words.drop(150))
      .mkString(" ")
    val fresh = (1 to 100).map(_ => s"z${rnd.nextInt(6000)}").mkString(" ")
    val incoming = Seq((1L, edited), (2L, fresh)).toDF("doc_id", "text")
    val plan = Cdc.cdcSyncPlan(incoming, held).orderBy("doc_id").collect()
    val refetch = plan(0); val newDoc = plan(1)
    // the re-fetch reuses everything outside the edit's window
    assert(refetch.getAs[Long]("ship_tokens") <= 60L,
      s"re-fetch shipped ${refetch.getAs[Long]("ship_tokens")} of 402 tokens")
    assert(refetch.getAs[Double]("reuse_pct") > 80.0)
    // a brand-new doc ships everything
    assert(newDoc.getAs[Long]("ship_chunks") == newDoc.getAs[Long]("n_chunks"))
    assert(newDoc.getAs[Double]("reuse_pct") == 0.0)
  }

  test("results are partitioning-independent") {
    val rnd = new scala.util.Random(3)
    val docs = (1L to 40L).map { i =>
      (i, (1 to 150).map(_ => s"t${rnd.nextInt(900)}").mkString(" "))
    }.toDF("doc_id", "text")
    val a = Cdc.cdcChunks(docs.repartition(1))
      .select("doc_id", "chunk_idx", "start_pos", "n_tokens", "chunk_hash")
      .collect().toSet
    val b = Cdc.cdcChunks(docs.repartition(7, col("doc_id")))
      .select("doc_id", "chunk_idx", "start_pos", "n_tokens", "chunk_hash")
      .collect().toSet
    assert(a == b)
  }
}

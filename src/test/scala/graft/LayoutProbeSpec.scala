package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Quantiles
import graft.text.CorpusOps

/** Decade probes for the round-8 profiling/layout operators: the text
  * family probes at 50k docs and the vector family at 100k vectors
  * (SURVEY §5); this runs the quantile and epoch-shard machinery one
  * decade above sf0.1's lineitem (6M rows — sf0.1 x10, price-rotated
  * replicas so the value histogram genuinely widens), validating with
  * DISTRIBUTED invariants rather than driver-side sorts: exact
  * order-statistic bounds for every quantile cut, and the permutation/
  * balance laws for the shard assignment.
  */
class LayoutProbeSpec extends AnyFunSuite with SparkSpec {

  // 6M rows: 10 replicas of sf0.1's lineitem with cents rotated by a
  // prime per replica (the panel decade-probe recipe) — values stay
  // exact 2-decimal fixed-point but the distinct histogram shifts
  private lazy val probe = {
    val base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val reps = spark.range(0, 10).select(col("id").as("k"))
    base.crossJoin(reps)
      .select(
        (col("l_orderkey") * 10 + col("k")).as("rid"),
        (round(col("l_extendedprice") * 100)
          .cast("long").+(col("k") * lit(9973L)).cast("double") / 100.0)
          .as("v"))
  }

  test("binPack compaction: fewer files, lossless rows, pruning preserved, big files byte-copied") {
    import spark.implicits._
    import graft.operators.{Compact, Zorder}
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(20000)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong)).toDF("a", "b")
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    Zorder.clusterBy(rows, Seq("a", "b"), bits = 10, numFiles = 64)
      .write.mode("overwrite").parquet(s"$base/in")

    def filesTouched(dir: String, loA: Long, hiA: Long,
        loB: Long, hiB: Long): (Long, Long) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(org.apache.spark.sql.functions.input_file_name().as("f"))
        .agg(min("a").as("loA"), max("a").as("hiA"),
          min("b").as("loB"), max("b").as("hiB"))
        .collect()
      (perFile.count(r =>
        r.getAs[Long]("hiA") >= loA && r.getAs[Long]("loA") <= hiA &&
          r.getAs[Long]("hiB") >= loB && r.getAs[Long]("loB") <= hiB).toLong,
        perFile.length.toLong)
    }

    // target ~8 input files per bin
    val inBytes = new java.io.File(s"$base/in").listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.length()).sum
    val rep = Compact.binPack(spark, s"$base/in", s"$base/out",
      targetBytes = inBytes / 8 + 1)
    assert(rep.nFilesBefore === 64L)
    assert(rep.nFilesAfter < rep.nFilesBefore / 4,
      s"expected ~8x fewer files, got ${rep.nFilesAfter}")
    assert(rep.nBinsRewritten === rep.nFilesAfter && rep.nFilesCopied === 0L)

    // value losslessness — the compaction contract
    val before = spark.read.parquet(s"$base/in").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val after = spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after === before)

    // pruning preserved: contiguous bins merge ADJACENT z-ranges, so
    // a box query touches no MORE files than before (merging can only
    // fuse touched neighbors; +1 hull slack for a bin whose per-dim
    // bounding box grows past its members'), while the hash-mix
    // control at the same file count spreads every key range over
    // every file and prunes nothing — the failure mode contiguous
    // bin-packing exists to avoid
    val (tIn, nIn) = filesTouched(s"$base/in", 256, 383, 256, 383)
    val (tOut, nOut) = filesTouched(s"$base/out", 256, 383, 256, 383)
    assert(nIn === 64L && nOut === rep.nFilesAfter)
    assert(tOut <= tIn + 1,
      s"compaction touched more files: $tIn of $nIn -> $tOut of $nOut")
    spark.read.parquet(s"$base/in").repartition(rep.nFilesAfter.toInt)
      .write.mode("overwrite").parquet(s"$base/ctl")
    val (tCtl, nCtl) = filesTouched(s"$base/ctl", 256, 383, 256, 383)
    assert(tCtl >= nCtl - 1,
      s"hash-mix control unexpectedly pruned: $tCtl of $nCtl")
    assert(tOut.toDouble / nOut < tCtl.toDouble / nCtl,
      s"contiguous bins must out-prune the mixed control: " +
        s"$tOut/$nOut vs $tCtl/$nCtl")

    // byte-copy arm: with smallBytes below every file size nothing
    // rewrites — outputs are bit-identical copies in original order
    val rep2 = Compact.binPack(spark, s"$base/in", s"$base/out2",
      targetBytes = inBytes, smallBytes = 1L)
    assert(rep2.nFilesCopied === 64L && rep2.nBinsRewritten === 0L &&
      rep2.nFilesAfter === 64L)
    val inFiles = new java.io.File(s"$base/in").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val outFiles = new java.io.File(s"$base/out2").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(inFiles.length === outFiles.length)
    inFiles.zip(outFiles).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(a.toPath),
        java.nio.file.Files.readAllBytes(b.toPath)),
        s"${a.getName} not byte-identical to ${b.getName}")
    }

    // empty-directory edge
    val emptyDir = java.nio.file.Files
      .createTempDirectory("graft-compact-empty").toString
    val rep3 = Compact.binPack(spark, emptyDir, s"$base/out3",
      targetBytes = 1000L)
    assert(rep3 === Compact.CompactReport(0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("binPack waves: past MaxBinsPerJob the jobs split but global order holds") {
    import spark.implicits._
    import graft.operators.Compact
    val base = java.nio.file.Files.createTempDirectory("graft-waves").toString
    // 1100 range-ordered tiny files -> ~550 two-file bins: two waves
    (0 until 44000).map(i => (i.toLong, i.toLong)).toDF("a", "b")
      .repartitionByRange(1100, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$base/in")
    val files = new java.io.File(s"$base/in").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.length === 1100)
    // target ~2.5x the average file so bins hold 2 files (a singleton
    // run would byte-copy instead of rewrite)
    val avg = files.map(_.length()).sum / files.length
    val rep = Compact.binPack(spark, s"$base/in", s"$base/out",
      targetBytes = avg * 5 / 2)
    assert(rep.nBinsRewritten > Compact.MaxBinsPerJob,
      s"probe must cross the wave boundary: $rep")
    // losslessness across the wave seam
    val n = spark.read.parquet(s"$base/out").count()
    assert(n === 44000L)
    // global key order preserved: file-name order == key-range order,
    // exactly as in the input layout (min(a) nondecreasing by name)
    val mins = spark.read.parquet(s"$base/out")
      .groupBy(org.apache.spark.sql.functions.input_file_name().as("f"))
      .agg(min("a").as("lo"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    assert(mins.toSeq === mins.sorted.toSeq,
      "wave split reordered the key ranges")
  }

  test("binPackInPlace: same path keeps serving; every torn-swap state recovers") {
    import spark.implicits._
    import graft.operators.Compact
    val base = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val rows = (0 until 5000).map(i => (i.toLong, (i * 7 % 1024).toLong))
      .toDF("a", "b")
    rows.repartition(16).write.mode("overwrite").parquet(s"$base/t")
    val before = spark.read.parquet(s"$base/t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val rep = Compact.binPackInPlace(spark, s"$base/t",
      targetBytes = 1L << 26)
    assert(rep.nFilesBefore === 16L && rep.nFilesAfter < 16L)
    val after = spark.read.parquet(s"$base/t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after === before, "in-place swap must be lossless")
    // no swap residue
    assert(!new java.io.File(s"$base/t.graft-compact-next").exists)
    assert(!new java.io.File(s"$base/t.graft-compact-prev").exists)
    assert(Compact.recoverSwap(spark, s"$base/t")
      .startsWith("clean"))

    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)

    // torn state 1: crash between the renames with a COMPLETE next —
    // recover must finish the swap
    fs.rename(hp(s"$base/t"), hp(s"$base/t.graft-compact-prev"))
    fs.mkdirs(hp(s"$base/t.graft-compact-next"))
    spark.read.parquet(s"$base/t.graft-compact-prev")
      .coalesce(1).write.parquet(s"$base/tmpcopy")
    fs.listStatus(hp(s"$base/tmpcopy")).filter(_.isFile)
      .filter(_.getPath.getName.startsWith("part-")).foreach { f =>
        fs.rename(f.getPath,
          hp(s"$base/t.graft-compact-next/" + f.getPath.getName)): Unit
      }
    fs.createNewFile(
      hp(s"$base/t.graft-compact-next/_GRAFT_COMPACT_COMPLETE"))
    assert(Compact.recoverSwap(spark, s"$base/t").startsWith("finished"))
    assert(spark.read.parquet(s"$base/t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === before)
    assert(!new java.io.File(s"$base/t.graft-compact-prev").exists)

    // torn state 2: crash between the renames with an INCOMPLETE next
    // — recover must roll the pre-swap table back
    fs.rename(hp(s"$base/t"), hp(s"$base/t.graft-compact-prev"))
    fs.mkdirs(hp(s"$base/t.graft-compact-next")) // no marker, no files
    assert(Compact.recoverSwap(spark, s"$base/t").startsWith("rolled back"))
    assert(spark.read.parquet(s"$base/t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === before)
    assert(!new java.io.File(s"$base/t.graft-compact-next").exists)

    // torn state 3: crash after the swap, before cleanup — recover
    // just deletes the leftover prev
    fs.mkdirs(hp(s"$base/t.graft-compact-prev"))
    assert(Compact.recoverSwap(spark, s"$base/t").contains("deleted prev"))
    // and binPackInPlace itself refuses to start over unfinished state
    fs.mkdirs(hp(s"$base/t.graft-compact-next"))
    intercept[IllegalArgumentException] {
      Compact.binPackInPlace(spark, s"$base/t", targetBytes = 1L << 26)
    }
    fs.delete(hp(s"$base/t.graft-compact-next"), true)
  }

  test("6M-row exact quantiles satisfy the order-statistic bounds") {
    val n = probe.count()
    assert(n > 5000000L, s"probe size $n — a decade above sf0.1")
    val q = 20
    val cuts = Quantiles.exactQuantiles(probe, "v", q).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(cuts.length == q + 1)
    // distributed validation: for the value x at rank r,
    // count(v < x) < r <= count(v <= x) — the defining property of the
    // order statistic, checked against the full 6M rows in one pass
    val aggCols = cuts.flatMap { case (j, _, x) =>
      Seq(sum(when(col("v") < x, 1L).otherwise(0L)).as(s"lt_$j"),
        sum(when(col("v") <= x, 1L).otherwise(0L)).as(s"le_$j"))
    }
    val aggs = probe.agg(aggCols.head, aggCols.tail: _*).head
    cuts.foreach { case (j, r, _) =>
      val lt = aggs.getAs[Long](s"lt_$j")
      val le = aggs.getAs[Long](s"le_$j")
      assert(lt < r && r <= le,
        s"cut $j rank $r violates order-statistic bounds ($lt, $le]")
    }
    // monotone non-decreasing cut values
    assert(cuts.map(_._3).toSeq == cuts.map(_._3).sorted.toSeq)
  }

  test("6M-row epoch shard is a balanced permutation") {
    val ids = probe.select(col("rid").as("doc_id")).distinct()
    val n = ids.count()
    val sharded = CorpusOps.epochShard(ids, epoch = 3, nShards = 64)
    val stats = sharded
      .agg(countDistinct(col("pos") * 64 + col("shard")).as("nGp"),
        max(col("pos") * 64 + col("shard")).as("maxGp"),
        min(col("pos") * 64 + col("shard")).as("minGp")).head
    // global positions reconstruct 0..N-1 exactly: a permutation
    assert(stats.getAs[Long]("nGp") === n)
    assert(stats.getAs[Long]("maxGp") === n - 1)
    assert(stats.getAs[Long]("minGp") === 0L)
    // round-robin balance: shard sizes differ by at most 1
    val sizes = sharded.groupBy("shard").count()
      .agg(min("count").as("lo"), max("count").as("hi")).head
    assert(sizes.getAs[Long]("hi") - sizes.getAs[Long]("lo") <= 1L)
  }

  test("6M-row skewed top-k: heap operator ≡ window path, rewrite fires") {
    // ~30% of the 6M rows pile onto one hot key (the shape where the
    // builtin's per-group sort hurts most); the rest spread over 996
    val keyed = probe.select(col("rid"),
      when(col("rid") % 10 < 3, lit(0L)).otherwise(col("rid") % 997L)
        .as("key"),
      col("v"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (gotDf, tHeap) = timed {
      val d = graft.plans.TopKPerKey.topKPerKey(keyed, Seq("key"),
        Seq(("v", false), ("rid", true)), k = 5)
      d.write.format("noop").mode("overwrite").save(); d
    }
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    val (wantDf, tWin) = try timed {
      val d = keyed.withColumn("__rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("key").orderBy(col("v").desc, col("rid"))))
        .filter(col("__rn") <= 5).drop("__rn")
      d.write.format("noop").mode("overwrite").save(); d
    } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    info(f"6M skewed top-5: heap ${tHeap}%.2fs vs window ${tWin}%.2fs")
    // bit-identical row sets, checked distributed (outputs are ≤ 4985
    // rows; the anti-joins run over those, never the 6M base)
    assert(gotDf.exceptAll(wantDf).isEmpty && wantDf.exceptAll(gotDf).isEmpty)
    // per-key cardinality law: exactly min(5, |group|) rows per key
    val bad = gotDf.groupBy("key").count()
      .join(keyed.groupBy("key").count().withColumnRenamed("count", "n"),
        Seq("key"))
      .filter(col("count") =!= least(lit(5L), col("n"))).count()
    assert(bad == 0L)
    // the no-API-change path: the window spelling (rank dropped)
    // plans onto the operator at this scale too
    val rewritten = keyed.withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("v").desc, col("rid"))))
      .filter(col("__rn") <= 5).drop("__rn")
    assert(rewritten.queryExecution.executedPlan.toString
      .contains("TopKPerKeyFinal"))
  }

  test("6M-row KMV sketches: accuracy and partitioning independence at scale") {
    import graft.stats.Kmv
    // 7 groups of ~857k distinct ids each — the sketch build is one
    // typed-imperative pass with ≤k-value buffers map-side combined
    // across 32 partitions; no distinct, no sort
    val keyed = probe.select((col("rid") % 7).as("k"),
      col("rid").cast("string").as("v"))
    val K = 256
    val sk = Kmv.sketch(keyed, Seq("k"), col("v"), K)
      .select(col("k"),
        Kmv.distinctEstimate(col("kmv"), K).as("est"), col("kmv"))
    val exact = keyed.distinct().groupBy("k").count()
    val joined = sk.join(exact, Seq("k")).collect()
    assert(joined.length == 7)
    joined.foreach { r =>
      val (est, n) = (r.getAs[Double]("est"), r.getAs[Long]("count"))
      assert(math.abs(est - n) < 4.0 * n / math.sqrt(K - 2.0),
        s"k=${r.get(0)}: est $est vs exact $n")
    }
    // the retained arrays are a pure function of the value set
    val re = Kmv.sketch(keyed.repartition(5), Seq("k"), col("v"), K)
    assert(sk.select("k", "kmv").exceptAll(re).isEmpty)
  }

  test("50k-doc byte-CDC: replicated payloads collapse to one chunk store") {
    import graft.text.Cdc
    // 10 replicas of sf0.1's documents (50k payloads): every replica
    // shares ALL its chunks with the original, so the distinct chunk
    // store must be EXACTLY the original corpus' store — the
    // content-defined identity property at a decade above the gate
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val reps = spark.range(0, 10).select(col("id").as("r"))
    val big = docs.crossJoin(reps)
      .select((col("doc_id") * 10 + col("r")).as("doc_id"), col("text"))
    val bigChunks = Cdc.byteChunks(big, "text", maskBits = 6)
    val stats = bigChunks.agg(
      count(lit(1)).as("occ"),
      countDistinct(col("chunk_hash")).as("store")).head
    val baseStore = Cdc.byteChunks(docs, "text", maskBits = 6)
      .agg(countDistinct(col("chunk_hash")).as("s")).head.getAs[Long]("s")
    assert(stats.getAs[Long]("store") == baseStore,
      "replication leaked new chunks — boundaries moved")
    assert(stats.getAs[Long]("occ") >= 10L * baseStore,
      "occurrence count must cover every replica")
  }

  test("6M-row SKEWED broadcast overlap: hot key immune, expansion parity") {
    import graft.operators.RangeJoin
    // 6M intervals, ~30% funneled onto ONE hot key (the AQE-skew
    // shape): the broadcast path never shuffles the big side, so the
    // hot key costs exactly its row share — no straggler reducer —
    // while the expansion join shuffles (key, bucket) with the hot
    // key's replicas concentrated
    val base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate")
    val reps = spark.range(0, 10).select(col("id").as("k"))
    val lo = unix_date(col("l_shipdate").cast("date")).cast("long")
    val left = base.crossJoin(reps)
      .select(
        when(pmod(col("l_orderkey") * 10 + col("k"), lit(10L)) < 3, lit(7L))
          .otherwise(pmod(col("l_suppkey") * 7 + col("k"), lit(500L)))
          .as("key"),
        (col("l_orderkey") * 80 + col("l_linenumber") * 10 + col("k"))
          .as("lid_a"),
        lo.as("lo_a"),
        (lo + lit(1L) +
          pmod(col("l_orderkey") * 7 + col("k"), lit(21L))).as("hi_a"))
      .localCheckpoint()
    val hotShare = left.filter(col("key") === 7L).count().toDouble /
      left.count()
    assert(hotShare > 0.25, f"hot-key share $hotShare%.2f — probe mis-built")
    val wlo = lit(8036L) + pmod(col("key") * 37 + col("wid") * 797, lit(2400L))
    val right = spark.range(0, 500).select(col("id").as("key"))
      .withColumn("wid", explode(sequence(lit(0L), lit(2L))))
      .select(col("key"), col("wid"), wlo.as("lo_b"),
        (wlo + lit(33L)).as("hi_b"))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("key", "wid")
      .agg(count(lit(1)).as("n"), sum("lid_a").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val t0 = System.nanoTime()
    val bc = agg(RangeJoin.intervalOverlapBroadcast(left, right,
      "lo_a", "hi_a", "lo_b", "hi_b", equiKeys = Seq("key")))
    val bcSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val exp = agg(RangeJoin.intervalOverlap(left, right,
      "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 16,
      equiKeys = Seq("key")))
    val expSec = (System.nanoTime() - t1) / 1e9
    info(f"6M skewed overlap: broadcast $bcSec%.1f s vs expansion $expSec%.1f s")
    assert(bc === exp && bc.nonEmpty)
    // the hot key's pairs really dominate — the skew was exercised
    val hotPairs = bc.collect { case ((7L, _), (n, _)) => n }.sum
    assert(hotPairs > bc.values.map(_._1).sum / 10,
      "hot key contributed too little — skew not exercised")
  }
}

package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file COMPACTION — the OPTIMIZE face of the write path
  * (round 13, VERDICT r12 residue #4): [[Zorder]] and [[Bucketing]]
  * lay a table out well at write time, but every streaming /
  * incremental sink converges to a directory of small part files,
  * and at 100 TB the scan-planning and open() overhead of a million
  * 2 MB files dominates the read. This operator re-bin-packs an
  * EXISTING parquet directory to a target file size while preserving
  * the writer's key order — the Delta/Iceberg OPTIMIZE (without
  * ZORDER) semantics.
  *
  * Order preservation is the load-bearing design point: part-file
  * NAMES carry the writer's partition order (`part-00000`,
  * `part-00001`, … — for a `repartitionByRange`+sort layout that IS
  * the key order), so bin-packing only CONTIGUOUS runs keeps every
  * output file covering one compact key range and min/max footer
  * pruning behaves exactly as before (LayoutProbeSpec measures it).
  * A hash-repartition "compaction" would mix ranges and silently
  * destroy pruning — the trap this operator exists to avoid.
  *
  * Economy, the Delta convention: files at or above `smallBytes` are
  * NOT re-encoded — they are copied byte-for-byte (bit-exact, no
  * decode) — and only contiguous runs of small files rewrite, as ONE
  * Spark job with one task per output bin (a union of per-bin
  * single-partition reads; no shuffle anywhere). Compacting a
  * petabyte table is therefore priced by its small-file TAIL, not its
  * size; at very large bin counts run per-partition/prefix
  * invocations (the plan is a union over bins).
  *
  * Lossless by construction: the output holds exactly the input's
  * rows (row order may interleave WITHIN one bin's merged range —
  * file-level min/max, and so pruning, are unaffected; pass
  * `sortCols` to restore intra-file order for row-group-level
  * locality). */
object Compact {

  /** What a compaction did: file counts, byte volumes, and how much
    * was genuinely rewritten vs byte-copied. */
  final case class CompactReport(
      nFilesBefore: Long,
      nFilesAfter: Long,
      bytesBefore: Long,
      nBinsRewritten: Long,
      bytesRewritten: Long,
      nFilesCopied: Long)

  private sealed trait Unit0
  private final case class CopyFile(f: FileStatus) extends Unit0
  private final case class RewriteBin(fs: Vector[FileStatus]) extends Unit0

  /** Execute the rewrite bins in waves of [[MaxBinsPerJob]] (one task
    * per bin, one union per wave — see the binPack doc), returning
    * the written part files in GLOBAL bin order. */
  private def rewriteBins(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      bins: Vector[Vector[FileStatus]],
      sortCols: Seq[String],
      tmp: Path,
      fs: org.apache.hadoop.fs.FileSystem): Vector[Path] = {
    bins.grouped(MaxBinsPerJob).zipWithIndex.foreach { case (wave, w) =>
      val branches = wave.map { b =>
        val df = spark.read.schema(schema)
          .parquet(b.map(_.getPath.toString): _*).coalesce(1)
        if (sortCols.nonEmpty)
          df.sortWithinPartitions(sortCols.map(col): _*)
        else df
      }
      org.apache.spark.sql.graftbridge.ColumnBridge
        .unionKeepingPartitions(branches)
        .write.mode("overwrite").parquet(s"$tmp/wave-" + f"$w%05d")
    }
    val parts = fs.listStatus(tmp).toVector
      .filter(_.isDirectory).sortBy(_.getPath.getName)
      .flatMap { waveDir =>
        fs.listStatus(waveDir.getPath).toVector
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .sortBy(_.getPath.getName).map(_.getPath)
      }
    require(parts.length == bins.length,
      s"expected ${bins.length} rewritten files, got ${parts.length}")
    parts
  }

  /** Rewrite bins per Spark job: each bin is one union branch in the
    * job's plan, and a million-bin small-file tail would otherwise
    * build a million-child plan (driver planning blows up long before
    * the executors feel anything). 512 branches keeps planning
    * sub-second; the waves run back to back and the output naming is
    * identical either way. */
  val MaxBinsPerJob = 512

  /** Bin-pack `inPath`'s part files into `outPath` targeting
    * `targetBytes` per output file. Files >= `smallBytes` (default:
    * `targetBytes`) copy byte-for-byte; contiguous runs of smaller
    * files pack greedily up to `targetBytes` and rewrite, one output
    * file per bin, names preserving the original global order —
    * submitted in waves of [[MaxBinsPerJob]] bins so plan size stays
    * bounded at any tail size. `sortCols`, when given, re-sorts rows
    * WITHIN each rewritten bin (e.g. the clustered dimensions) for
    * row-group locality. */
  def binPack(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long,
      smallBytes: Long = 0L,
      sortCols: Seq[String] = Nil): CompactReport = {
    require(targetBytes > 0L, s"targetBytes must be > 0, got $targetBytes")
    require(new Path(inPath) != new Path(outPath),
      "in and out paths must differ — use binPackInPlace for " +
        "same-path compaction (it handles the atomic swap)")
    val small = if (smallBytes > 0L) smallBytes else targetBytes
    val conf = spark.sessionState.newHadoopConf()
    val in = new Path(inPath)
    val fs = in.getFileSystem(conf)
    val files = fs.listStatus(in).toVector
      .filter(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .sortBy(_.getPath.getName)

    val out = new Path(outPath)
    if (!fs.exists(out)) require(fs.mkdirs(out), s"cannot create $out")

    if (files.isEmpty)
      return CompactReport(0L, 0L, 0L, 0L, 0L, 0L)

    // contiguous greedy bin-packing: large files flush the open run
    // and pass through; small files pack until the target
    val units = Vector.newBuilder[Unit0]
    var run = Vector.empty[FileStatus]
    var runBytes = 0L
    def flush(): Unit = if (run.nonEmpty) {
      if (run.length == 1) units += CopyFile(run.head)
      else units += RewriteBin(run)
      run = Vector.empty
      runBytes = 0L
    }
    files.foreach { f =>
      if (f.getLen >= small) { flush(); units += CopyFile(f) }
      else {
        if (run.nonEmpty && runBytes + f.getLen > targetBytes) flush()
        run :+= f
        runBytes += f.getLen
      }
    }
    flush()
    val ordered = units.result()

    // one task per rewritten bin: a union of single-partition per-bin
    // reads, task i writing bin i's file. NOT a Catalyst union — the
    // optimizer collapses per-branch coalesce hints back to one
    // partition (measured); unionKeepingPartitions concatenates the
    // executed branches at the RDD level, keeping one partition per
    // bin in bin order. Submitted in waves of MaxBinsPerJob so the
    // per-job plan stays bounded regardless of tail size.
    val bins = ordered.collect { case RewriteBin(fsv) => fsv }
    val tmp = new Path(outPath + ".graft-compact-tmp")
    val tmpParts =
      if (bins.isEmpty) Vector.empty[Path]
      else rewriteBins(spark, spark.read.parquet(inPath).schema, bins,
        sortCols, tmp, fs)

    // lay the outputs down in global order: zero-padded index names
    // keep lexicographic order == key order for downstream listings
    var binIdx = 0
    var copied = 0L
    ordered.zipWithIndex.foreach {
      case (CopyFile(f), i) =>
        val dst = new Path(out, f"part-$i%05d-copy.parquet")
        require(FileUtil.copy(fs, f.getPath, fs, dst, false, conf),
          s"copy failed: ${f.getPath} -> $dst")
        copied += 1L
      case (RewriteBin(_), i) =>
        val dst = new Path(out, f"part-$i%05d-packed.parquet")
        require(fs.rename(tmpParts(binIdx), dst),
          s"rename failed: ${tmpParts(binIdx)} -> $dst")
        binIdx += 1
    }
    if (bins.nonEmpty) fs.delete(tmp, true)

    CompactReport(
      nFilesBefore = files.length.toLong,
      nFilesAfter = ordered.length.toLong,
      bytesBefore = files.map(_.getLen).sum,
      nBinsRewritten = bins.length.toLong,
      bytesRewritten = bins.map(_.map(_.getLen).sum).sum,
      nFilesCopied = copied)
  }

  /** The compacted table, for reading back. */
  def read(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)

  private def nextDir(path: String) = new Path(path + ".graft-compact-next")
  private def prevDir(path: String) = new Path(path + ".graft-compact-prev")
  private val CompleteMarker = "_GRAFT_COMPACT_COMPLETE"

  /** [[binPack]] SWAPPED IN PLACE (round 18 continuity item #2 —
    * binPack writes a NEW directory, but the operational loop wants
    * the same path to keep serving): compacts into a sibling
    * `.graft-compact-next` directory, marks it COMPLETE, then swaps
    * with two atomic renames (path → `.graft-compact-prev`, next →
    * path) and deletes the prev copy. Crash-safety protocol — a torn
    * swap must never serve half a table, so every window leaves a
    * state [[recoverSwap]] resolves unambiguously:
    *
    *  - crash while writing next (no COMPLETE marker): path still
    *    serves; recover deletes the partial next;
    *  - crash after next completes, before the first rename: path
    *    still serves; recover deletes next (the compaction simply
    *    re-runs — next is a pure derivation of path);
    *  - crash between the renames (the only no-table window —
    *    readers momentarily see a missing path, never a partial one):
    *    recover finishes the swap iff next carries the COMPLETE
    *    marker, else rolls prev back;
    *  - crash after the second rename, before cleanup: path serves
    *    the compacted table; recover deletes the leftover prev.
    *
    * Renames are atomic on HDFS-like filesystems and POSIX
    * directories; on object stores without atomic directory rename,
    * use [[binPackBucketed]]'s catalog-re-point pattern instead (the
    * catalog swap is the atomic step there). */
  def binPackInPlace(
      spark: SparkSession,
      path: String,
      targetBytes: Long,
      smallBytes: Long = 0L,
      sortCols: Seq[String] = Nil): CompactReport = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val next = nextDir(path)
    val prev = prevDir(path)
    require(!fs.exists(next) && !fs.exists(prev),
      s"unfinished swap state at $next / $prev — run recoverSwap first")
    val rep = binPack(spark, path, next.toString, targetBytes, smallBytes,
      sortCols)
    require(fs.createNewFile(new Path(next, CompleteMarker)),
      s"cannot mark $next complete")
    require(fs.rename(p, prev), s"rename $p -> $prev failed")
    require(fs.rename(next, p), s"rename $next -> $p failed")
    fs.delete(prev, true)
    rep
  }

  /** Resolve any crash state a [[binPackInPlace]] left behind — see
    * its protocol table. Returns a short description of the action
    * taken. Idempotent; safe to run when no swap was in flight. Also
    * sweeps the rewrite-stage scratch directory (`binPack`'s
    * `<next>.graft-compact-tmp` sibling) a crash mid-write leaves. */
  def recoverSwap(spark: SparkSession, path: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val next = nextDir(path)
    val prev = prevDir(path)
    val nextTmp = new Path(next.toString + ".graft-compact-tmp")
    if (fs.exists(nextTmp)) fs.delete(nextTmp, true)
    val nextComplete =
      fs.exists(next) && fs.exists(new Path(next, CompleteMarker))
    if (fs.exists(p)) {
      var acted = List.empty[String]
      if (fs.exists(next)) { fs.delete(next, true); acted ::= "deleted next" }
      if (fs.exists(prev)) { fs.delete(prev, true); acted ::= "deleted prev" }
      if (acted.isEmpty) "clean — no swap in flight"
      else s"table intact; ${acted.mkString(", ")}"
    } else if (nextComplete) {
      require(fs.rename(next, p), s"recovery rename $next -> $p failed")
      if (fs.exists(prev)) fs.delete(prev, true)
      "finished the interrupted swap (next was complete)"
    } else if (fs.exists(prev)) {
      require(fs.rename(prev, p), s"rollback rename $prev -> $p failed")
      if (fs.exists(next)) fs.delete(next, true)
      "rolled back to the pre-swap table (next was incomplete)"
    } else
      throw new IllegalStateException(
        s"no table at $path and no recoverable swap state — nothing to do")
  }

  /** [[binPack]] for a BUCKETED catalog table ([[Bucketing]]'s
    * layout): compaction must never merge ACROSS buckets — the hash
    * layout (bucket id = pmod(hash(key), n), encoded in every part
    * file's `_NNNNN` name suffix) is what makes joins/aggs on the
    * bucket key exchange-free, and a cross-bucket merge would silently
    * re-introduce the 100 TB shuffle the table was bucketed to delete.
    * So: files group by their bucket id first, contiguous runs pack
    * WITHIN each bucket (same one-job union as [[binPack]]), every
    * output file carries its bucket's suffix (Spark's own parser
    * accepts the names), rewritten bins re-sort by the table's
    * declared sort columns (the sorted-bucket metadata must stay
    * honest), and the result registers as `outTable` with the
    * identical bucket spec — BucketingSpec pins that the co-located
    * join over the compacted table still plans NO Exchange. */
  def binPackBucketed(
      spark: SparkSession,
      table: String,
      outTable: String,
      outPath: String,
      targetBytes: Long,
      smallBytes: Long = 0L): CompactReport = {
    require(targetBytes > 0L, s"targetBytes must be > 0, got $targetBytes")
    val small = if (smallBytes > 0L) smallBytes else targetBytes
    val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(id)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table is not bucketed — use binPack for plain layouts"))
    val bridge = org.apache.spark.sql.graftbridge.ColumnBridge
    val conf = spark.sessionState.newHadoopConf()
    val in = new Path(meta.location)
    val fs = in.getFileSystem(conf)
    val files = fs.listStatus(in).toVector
      .filter(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .sortBy(_.getPath.getName)
    val byBucket = files.groupBy { f =>
      bridge.bucketIdOfFile(f.getPath.getName).getOrElse(
        throw new IllegalStateException(
          s"bucketed table $table has a part file without a bucket " +
            s"suffix: ${f.getPath.getName}"))
    }

    val out = new Path(outPath)
    if (!fs.exists(out)) require(fs.mkdirs(out), s"cannot create $out")

    // per bucket: the same contiguous greedy packing as binPack
    val units = Vector.newBuilder[(Int, Unit0)]
    byBucket.keys.toSeq.sorted.foreach { b =>
      var run = Vector.empty[FileStatus]
      var runBytes = 0L
      def flush(): scala.Unit = if (run.nonEmpty) {
        if (run.length == 1) units += ((b, CopyFile(run.head)))
        else units += ((b, RewriteBin(run)))
        run = Vector.empty
        runBytes = 0L
      }
      byBucket(b).foreach { f =>
        if (f.getLen >= small) { flush(); units += ((b, CopyFile(f))) }
        else {
          if (run.nonEmpty && runBytes + f.getLen > targetBytes) flush()
          run :+= f
          runBytes += f.getLen
        }
      }
      flush()
    }
    val ordered = units.result()

    val bins = ordered.collect { case (_, RewriteBin(fsv)) => fsv }
    val tmp = new Path(outPath + ".graft-compact-tmp")
    val tmpParts =
      if (bins.isEmpty) Vector.empty[Path]
      else rewriteBins(spark, meta.schema, bins, spec.sortColumnNames,
        tmp, fs)

    var binIdx = 0
    var copied = 0L
    ordered.zipWithIndex.foreach {
      case ((b, CopyFile(f)), i) =>
        val dst = new Path(out,
          f"part-$i%05d-graftc${bridge.bucketIdSuffix(b)}.parquet")
        require(FileUtil.copy(fs, f.getPath, fs, dst, false, conf),
          s"copy failed: ${f.getPath} -> $dst")
        copied += 1L
      case ((b, RewriteBin(_)), i) =>
        val dst = new Path(out,
          f"part-$i%05d-graftc${bridge.bucketIdSuffix(b)}.parquet")
        require(fs.rename(tmpParts(binIdx), dst),
          s"rename failed: ${tmpParts(binIdx)} -> $dst")
        binIdx += 1
    }
    if (bins.nonEmpty) fs.delete(tmp, true)

    // register the compacted layout under the IDENTICAL bucket spec
    spark.sql(s"DROP TABLE IF EXISTS `$outTable`")
    val sorted =
      if (spec.sortColumnNames.nonEmpty)
        s"SORTED BY (${spec.sortColumnNames.map(c => s"`$c`").mkString(", ")}) "
      else ""
    spark.sql(
      s"""CREATE TABLE `$outTable` (${meta.schema.toDDL})
         |USING PARQUET
         |CLUSTERED BY (${spec.bucketColumnNames.map(c => s"`$c`").mkString(", ")})
         |${sorted}INTO ${spec.numBuckets} BUCKETS
         |LOCATION '$outPath'""".stripMargin)

    CompactReport(
      nFilesBefore = files.length.toLong,
      nFilesAfter = ordered.length.toLong,
      bytesBefore = files.map(_.getLen).sum,
      nBinsRewritten = bins.length.toLong,
      bytesRewritten = bins.map(_.map(_.getLen).sum).sum,
      nFilesCopied = copied)
  }
}

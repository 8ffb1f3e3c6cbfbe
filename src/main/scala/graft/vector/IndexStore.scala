package graft.vector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistence for the ANN index artifacts — the "index survives the
  * cluster" story: a 100 TB corpus trains its coarse quantizer and PQ
  * codebooks ONCE, ships them as tables, and every later session (or a
  * different cluster) searches with bit-identical results. The
  * mergeable-artifact precedent is [[graft.stats.Profile]]'s register
  * snapshots; here the artifacts are the driver-side matrices the
  * search entry points take.
  *
  * Matrices store as long (i, j, bits) rows — `doubleToRawLongBits` —
  * so the round trip is BITWISE by construction, independent of any
  * writer's float formatting; parquet doubles are IEEE-lossless too,
  * but raw bits also pin NaN payloads and make the equality check
  * trivially exact. Codebook stacks (m × k × subDim) flatten the
  * leading pair into the row key.
  *
  * Loads collect bounded artifacts (a quantizer is nCells × dim; PQ
  * books are m × 256 × subDim — megabytes, corpus-size-independent).
  */
object IndexStore {

  def saveMatrix(spark: SparkSession, path: String,
      m: Array[Array[Double]]): Unit = {
    import spark.implicits._
    m.zipWithIndex.flatMap { case (row, i) =>
      row.zipWithIndex.map { case (v, j) =>
        (i, j, java.lang.Double.doubleToRawLongBits(v))
      }
    }.toSeq.toDF("i", "j", "bits")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadMatrix(spark: SparkSession, path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path)
      .select(col("i").cast("int"), col("j").cast("int"), col("bits"))
      .collect() // bounded: artifact-sized
    val nI = rows.map(_.getInt(0)).max + 1
    val nJ = rows.map(_.getInt(1)).max + 1
    val out = Array.ofDim[Double](nI, nJ)
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) =
      java.lang.Double.longBitsToDouble(r.getLong(2)))
    out
  }

  def saveBooks(spark: SparkSession, path: String,
      books: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, m) =>
      book.zipWithIndex.flatMap { case (row, c) =>
        row.zipWithIndex.map { case (v, j) =>
          (m, c, j, java.lang.Double.doubleToRawLongBits(v))
        }
      }
    }.toSeq.toDF("m", "c", "j", "bits")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadBooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path)
      .select(col("m").cast("int"), col("c").cast("int"),
        col("j").cast("int"), col("bits"))
      .collect() // bounded: artifact-sized
    val nM = rows.map(_.getInt(0)).max + 1
    val nC = rows.map(_.getInt(1)).max + 1
    val nJ = rows.map(_.getInt(2)).max + 1
    val out = Array.ofDim[Double](nM, nC, nJ)
    rows.foreach(r => out(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
      java.lang.Double.longBitsToDouble(r.getLong(3)))
    out
  }
}

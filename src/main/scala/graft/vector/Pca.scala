package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PCA / whitening for embedding pipelines — the standard preprocessing
  * ahead of cosine-based curation (SemDeDup-style clustering behaves
  * badly on anisotropic embeddings; whitening fixes the geometry) and
  * the standard 4-64x dimensionality reduction before ANN indexing.
  *
  * Split exactly along the scale boundary:
  *  - the DISTRIBUTED part is the second-moment aggregate: one in-row
  *    upper-triangle pair expansion + one hash aggregate keyed on
  *    (i, j) — fully map-side combinable, output is d*(d+1)/2 rows
  *    regardless of corpus size, no join against the corpus;
  *  - the DRIVER part is the d x d symmetric eigendecomposition
  *    (cyclic Jacobi) — O(d^3) on a matrix whose size is fixed by the
  *    embedding width, never by the corpus. The only driver transfer
  *    is the d*(d+1)/2 covariance rows.
  *
  * Determinism: covariance sums are exact integer arithmetic on the
  * repo's 1e6 fixed-point grid (see [[Embeddings.centroidsLong]]) with
  * one final double division — bitwise reproducible across runs,
  * partitionings, and engines (q_pca_gram's DuckDB oracle replays the
  * identical integer math). The Jacobi sweep order is fixed, so the
  * eigenbasis is run-reproducible too.
  */
object Pca {

  /** Exact sample covariance, upper triangle in long form:
    * (i, j, cov, n) for 0 <= i <= j < dim, where
    * cov = (n*S_ij - S_i*S_j) / (n*(n-1)) over the 1e6-scaled integer
    * grid (one double division at the end, rounded 1e-9).
    *
    * The second moments come from ONE buffering aggregate
    * ([[graft.functions.CovarMoments]]): each task accumulates the
    * upper-triangle product sums + per-dimension sums + count in a
    * flat 128-bit-per-cell long buffer, so per-row cost is fused
    * multiply-adds into task-local memory — no d*(d+1)/2-per-row pair
    * materialization (the old `inline` form exploded 295k-8.4M rows
    * per vector at real embedding widths d=768-4096), and the only
    * shuffle is one buffer per partition. The covariance combine below
    * is token-identical decimal/double arithmetic to the exploded
    * form, so results are bitwise unchanged. */
  def covarianceLong(
      emb: DataFrame,
      vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    require(dim >= 1, s"dim must be positive, got $dim")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val momentsCol = column(graft.functions.CovarMoments(
      expression(col(vecCol)), dim).toAggregateExpression())
    emb.agg(momentsCol.as("__m"))
      .select(col("__m.n").as("n"), col("__m.dims").as("__ds"),
        inline(col("__m.pairs")))
      .select(col("i"), col("j"),
        round(
          (col("n") * col("spp") -
            element_at(col("__ds"), col("i") + lit(1)) *
              element_at(col("__ds"), col("j") + lit(1))).cast("double") /
            (col("n").cast("double") * (col("n") - 1).cast("double") * lit(1e12)),
          9).as("cov"),
        col("n"))
  }

  /** The fitted model: per-dimension mean, eigenvalues (descending),
    * and the top-k eigenvectors as rows. */
  final case class PcaModel(
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Cyclic-Jacobi eigendecomposition of a symmetric matrix — fixed
    * sweep order, so the result is deterministic. Returns (eigenvalues,
    * eigenvectors-as-columns), unsorted. Driver-side O(d^3); `a` is
    * d x d where d is the embedding width. */
  private[graft] def eigenSym(
      a0: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit on the exact covariance: collects d*(d+1)/2 covariance rows +
    * d mean rows (bounded by embedding width, corpus-independent),
    * eigendecomposes on the driver, keeps the top `k` components by
    * eigenvalue (descending; deterministic sign convention: each
    * eigenvector's largest-|.|1 component is made positive). */
  def fit(
      emb: DataFrame,
      vecCol: String = "embedding",
      dim: Int = 64,
      k: Int = 16): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val covRows = covarianceLong(emb, vecCol, dim)
      .select("i", "j", "cov", "n").collect()
    val cov = Array.ofDim[Double](dim, dim)
    var n = 0L
    covRows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      cov(i)(j) = c; cov(j)(i) = c
      n = r.getLong(3)
    }
    val meanRows = emb
      .select(posexplode(transform(col(vecCol),
        x => round(x.cast("double") * lit(1e6), 0).cast("long")))
        .as(Seq("d", "__x")))
      .groupBy("d")
      .agg((sum(col("__x").cast(DecimalType(38, 0))).cast("double") /
        (count(lit(1)).cast("double") * lit(1e6))).as("m"))
      .collect()
    val mean = Array.ofDim[Double](dim)
    meanRows.foreach(r => mean(r.getInt(0)) = r.getDouble(1))
    val (evals, evecs) = eigenSym(cov)
    val order = (0 until dim).sortBy(i => (-evals(i), i)).take(k)
    val components = order.map { ci =>
      val w = Array.tabulate(dim)(r => evecs(r)(ci))
      val pivot = w.indices.maxBy(i => (math.abs(w(i)), -i))
      if (w(pivot) < 0) w.map(-_) else w
    }.toArray
    PcaModel(mean, order.map(evals(_)).toArray, components)
  }

  /** Project (and optionally whiten) every vector onto the model's
    * components: y_c = sum_i (x_i - mean_i) * w_ci [/ sqrt(lambda_c)].
    * Pure column HOFs over plan-literal k x d matrices (k*d doubles —
    * the PCA basis is small by construction; contrast
    * [[Ivf.cellDists]]'s broadcast escape hatch for genuinely large
    * matrices). No shuffle: a per-row map over the scan. */
  def project(
      emb: DataFrame,
      model: PcaModel,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      whiten: Boolean = false): DataFrame = {
    val comps = typedlit(model.components.map(_.toSeq).toSeq)
    val meanLit = typedlit(model.mean.toSeq)
    val scales = typedlit(model.eigenvalues.map(ev =>
      if (whiten) 1.0 / math.sqrt(math.max(ev, 1e-12)) else 1.0).toSeq)
    val centered = zip_with(
      transform(col(vecCol), x => x.cast("double")), meanLit,
      (x, m) => x - m)
    val proj = zip_with(comps, scales, (w, sc) =>
      aggregate(zip_with(centered, w, (a, b) => a * b),
        lit(0.0), (acc, p) => acc + p) * sc)
    emb.select(col(idCol), proj.as("projection"))
  }
}

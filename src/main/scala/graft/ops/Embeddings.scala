package graft.ops

import graft.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-matrix operators: distributed PCA fit + projection /
  * whitening — the standard dimensionality-reduction stage in front of
  * semantic dedup and ANN clustering (SemDeDup projects to a PCA basis
  * before k-means; IVF recall improves on decorrelated axes).
  *
  * Scale shape (the part that matters at 100 TB): the FIT is one narrow
  * pass — a `gr_comoments` tree aggregate reduces the corpus to a single
  * `1 + d + d(d+1)/2`-double buffer (d=64 → ~17 KB), so the corpus never
  * shuffles and the driver does O(d^3) work once. The PROJECTION is a
  * per-row map against plan-literal components (broadcast by value in the
  * serialized plan), again shuffle-free and composable with any downstream
  * operator. No reference analog (dask-geopandas has no embedding surface);
  * the aggregation shape mirrors its ApplyConcatApply tree reduction
  * (`dask_geopandas/expr.py:33-72`).
  */
object Embeddings {

  /** Fitted PCA basis. `components(i)` is the i-th principal axis (unit
    * length, rows sorted by eigenvalue descending, sign-normalized so the
    * largest-magnitude coefficient is positive); `eigenvalues(i)` is the
    * population variance along it; `mean` is the column mean.
    */
  final case class PcaModel(
      dim: Int,
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def trace: Double = eigenvalues.sum
  }

  /** One-pass distributed PCA fit over `vecCol` (array<float|double> of
    * length `dim`). Population covariance; rows with null/ragged vectors
    * are skipped.
    */
  /* Numerical caveat: covariance derives from RAW co-moments
   * (E[xy] - mean_i * mean_j in one tree-aggregated pass). For
   * embedding coordinates whose |mean| dwarfs their standard deviation
   * (offset >> 1e4 x std) the subtraction cancels catastrophically —
   * pre-center such inputs (subtract the column means first) before
   * fitting; typical normalized embeddings are nowhere near the regime.
   */
  def fitPca(df: DataFrame, vecCol: String, dim: Int): PcaModel = {
    val buf = df.select(gr_comoments(col(vecCol), dim).as("m"))
      .head().getSeq[Double](0).toArray
    val n = buf(0).toLong
    require(n > 0, s"fitPca: no rows with a $dim-length vector in '$vecCol'")
    val mean = new Array[Double](dim)
    var i = 0
    while (i < dim) { mean(i) = buf(1 + i) / n; i += 1 }
    // population covariance from the raw co-moments
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = buf(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (evals, evecs) = symmetricEigen(cov)
    PcaModel(dim, n, mean, evals, evecs)
  }

  /** Project `vecCol` onto the top `k` principal axes; `whiten = true`
    * additionally scales each coordinate by 1/sqrt(eigenvalue) (unit
    * variance per axis; axes with eigenvalue <= 1e-12 map to 0). Adds
    * `outCol` as array<double> of length k. Pure per-row map over plan
    * literals — no shuffle, codegen-compatible built-ins only.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel, k: Int,
      outCol: String = "pc", whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.dim, s"k=$k out of range 1..${model.dim}")
    val scale =
      if (whiten)
        model.eigenvalues.take(k).map(l => if (l > 1e-12) 1.0 / math.sqrt(l) else 0.0)
      else Array.fill(k)(1.0)
    val meanLit = typedLit(model.mean.toSeq)
    val compLit = typedLit(model.components.take(k).map(_.toSeq).toSeq)
    val scaleLit = typedLit(scale.toSeq)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanLit,
      (x: Column, m: Column) => x - m)
    df.withColumn("_gr_centered", centered)
      .withColumn(outCol, zip_with(compLit, scaleLit,
        (cv: Column, s: Column) => s * aggregate(
          zip_with(cv, col("_gr_centered"), (a: Column, b: Column) => a * b),
          lit(0.0), (acc: Column, x: Column) => acc + x)))
      .drop("_gr_centered")
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi rotations
    * (deterministic, O(d^3) per sweep — trivia at d<=1024 driver-side).
    * Returns (eigenvalues desc, eigenvectors as ROWS aligned with them,
    * each sign-normalized so its largest-|.| coefficient is positive).
    */
  def symmetricEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // classic 2x2 symmetric Schur rotation annihilating a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort by eigenvalue desc; eigenvectors are V's COLUMNS -> emit rows
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val row = Array.tabulate(d)(j => v(j)(i))
      // deterministic sign: largest-|.| coefficient positive (first wins ties)
      var best = 0
      var j = 1
      while (j < d) { if (math.abs(row(j)) > math.abs(row(best))) best = j; j += 1 }
      if (row(best) < 0) { j = 0; while (j < d) { row(j) = -row(j); j += 1 } }
      row
    }.toArray
    (evals, evecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}

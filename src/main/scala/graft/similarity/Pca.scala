package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GramAggregator, VectorFunctions}

/** Distributed PCA over an `array<float>` embedding column.
  *
  * Split of labor mirrors the IVF/k-means fits in this package: the
  * CLUSTER does the one data-sized pass (a [[GramAggregator]] reduction
  * to the d×d second-moment matrix — constant-size, mergeable, partial-
  * aggregated), the DRIVER does the d×d eigen work (power iteration with
  * deflation on a 64×64 matrix — microseconds, no linear-algebra library
  * needed), and projection is another data-sized map using the codegen'd
  * [[graft.functions.VectorFunctions.dot_product]]: (x−μ)·v is computed
  * as x·v − μ·v so the plan never materializes centered copies of the
  * embedding column.
  *
  * Sign convention: each component's largest-|coordinate| is made
  * positive, so the learned basis is a pure function of the data (power
  * iteration starts from a fixed seed vector, not a random one).
  */
object Pca {

  final case class Model(mu: Array[Double], components: Array[Array[Double]])

  /** Fit top-`k` principal components. One Spark job; O(k · d²) driver math. */
  def fit(embeddings: DataFrame, embCol: String, dim: Int, k: Int): Model = {
    val agg = new GramAggregator(dim).toColumn
    import embeddings.sparkSession.implicits._
    val (m, s, n) = embeddings
      .select(col(embCol).as[Seq[Float]])
      .select(agg.name("g")).as[(Seq[Double], Seq[Double], Long)]
      .head()
    val nn = n.toDouble
    val mu = s.map(_ / nn).toArray
    // covariance C = M/n − μ μᵀ
    val cov = Array.tabulate(dim, dim)((i, j) => m(i * dim + j) / nn - mu(i) * mu(j))
    val comps = Array.ofDim[Array[Double]](k)
    var c = 0
    while (c < k) {
      comps(c) = topEigenvector(cov, dim)
      // deflate: C ← C − λ v vᵀ  (λ = vᵀ C v for the found unit v)
      val v = comps(c)
      val lambda = rayleigh(cov, v, dim)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { cov(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    Model(mu, comps)
  }

  /** Append projection columns `names(i)` = (x − μ)·vᵢ. */
  def project(df: DataFrame, embCol: String, model: Model, names: Seq[String]): DataFrame =
    names.zipWithIndex.foldLeft(df) { case (d, (name, i)) =>
      val v = model.components(i)
      val vLit: Column = typedLit(v.map(_.toFloat).toSeq)
      val muDotV = model.mu.zip(v).map { case (a, b) => a * b }.sum
      d.withColumn(name,
        VectorFunctions.dot_product(col(embCol), vLit) - lit(muDotV))
    }

  private def rayleigh(a: Array[Array[Double]], v: Array[Double], dim: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < dim) {
      var row = 0.0
      var j = 0
      while (j < dim) { row += a(i)(j) * v(j); j += 1 }
      acc += v(i) * row
      i += 1
    }
    acc
  }

  /** Power iteration from a fixed deterministic start, sign-normalized. */
  private def topEigenvector(a: Array[Array[Double]], dim: Int): Array[Double] = {
    var v = Array.tabulate(dim)(i => 1.0 / math.sqrt(dim.toDouble) * (if (i % 2 == 0) 1 else -1) + 1e-3 * (i + 1))
    var it = 0
    while (it < 200) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += a(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm < 1e-300) return v // zero matrix: any unit vector
      v = w.map(_ / norm)
      it += 1
    }
    // canonical sign: largest-|coordinate| positive
    val arg = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(arg) < 0) v.map(x => -x) else v
  }
}

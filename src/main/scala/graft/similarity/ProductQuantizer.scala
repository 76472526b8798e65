package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the standard compression for
  * billion-vector ANN: split each dim-`d` vector into `m` subspaces of
  * `d/m` dims, k-means each subspace to `ksub` centroids, and store each
  * vector as `m` small codes (4 bytes/vector at m=8, ksub=16 vs 256 bytes
  * raw — a 64× scan-size cut). Query-time ASYMMETRIC DISTANCE (ADC) never
  * reconstructs: the probe precomputes an m×ksub lookup table of
  * subspace distances, and each candidate's estimated distance is m table
  * lookups summed.
  *
  * Scale shape:
  *  - FIT explodes the corpus once into (id, sub, subvec) — same total
  *    bytes as the corpus, skinnier rows — and runs Lloyd rounds where
  *    ASSIGN is a pure literal-codebook projection (zero shuffle,
  *    codegen'd) and UPDATE is one per-(sub, code) mean aggregation with
  *    map-side combine; only the m·ksub codebook ever reaches the driver.
  *  - ENCODE is a narrow projection against the literal codebook: a
  *    100 TB corpus encodes with zero shuffle.
  *  - ADC is a narrow projection (m `element_at` lookups into literal
  *    arrays + a sum) + TakeOrdered top-k: no shuffle, no join, and the
  *    scan reads ONLY the m-byte codes column — at 100 TB the 64×
  *    smaller parquet column is the entire point.
  *
  * Determinism: init = subvectors of the `ksub` smallest-id rows;
  * assignment ties break toward the smaller code; empty cells keep their
  * previous centroid — identical inputs give identical codebooks/codes.
  *
  * The FIT is not SQL-mirrorable (chained Lloyd rounds), but the fitted
  * codebook is plain numbers: the queries over this are oracled by
  * GENERATED DuckDB SQL that embeds the codebook/LUT as literal CTEs and
  * replays encode + ADC + rerank with identical op order (see
  * `VectorQueries.PqOracle`); ProductQuantizerSpec pins the fit's
  * determinism, code ranges, and ADC recall against exact brute force.
  */
object ProductQuantizer {

  /** Learned codebook: `centroids(sub)(code)` is the dim-`dsub` centroid
    * of cell `code` in subspace `sub`.
    */
  case class Codebook(m: Int, ksub: Int, dsub: Int,
      centroids: Array[Array[Array[Float]]])

  /** (id, sub, subvec) exploded view — one row per vector per subspace. */
  private def subvectors(embs: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int): DataFrame =
    embs.select(col(idCol).as("id"),
      posexplode(array((0 until m).map(s =>
        slice(col(vecCol), s * dsub + 1, dsub)): _*)).as(Seq("sub", "subvec")))

  /** Squared L2 between a subvec column and a literal centroid,
    * accumulated in double (deterministic: fixed left-to-right array
    * order, one expression tree).
    */
  private def sqDist(v: Column, centroid: Seq[Float]): Column =
    aggregate(zip_with(v, typedLit(centroid),
        (x, c) => (x.cast("double") - c.cast("double")) *
          (x.cast("double") - c.cast("double"))),
      lit(0.0d), (acc, x) => acc + x)

  /** Argmin code for a subvec against one subspace's literal centroids:
    * array_min over (dist, code) structs — lexicographic struct order
    * gives smallest distance, ties to the smaller code.
    */
  private def argminCode(v: Column, cents: Array[Array[Float]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, j) =>
      struct(sqDist(v, c.toSeq).as("d"), lit(j).as("j"))
    }: _*)).getField("j")

  /** Fit `m`×`ksub` codebooks with `iters` Lloyd rounds. */
  def fit(embs: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int): Codebook = {
    require(dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    val dsub = dim / m
    val subs = subvectors(embs, idCol, vecCol, m, dsub)
    // deterministic HASH-SPREAD init: the ksub smallest md5(id) rows — a
    // fixed pseudo-random sample of the corpus (adjacent ids often share
    // a cluster, which would seed near-duplicate centroids)
    val seedIds = embs
      .select(col(idCol).as("id"),
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .orderBy(col("h"), col("id"))
      .limit(ksub)
      .collect().map(_.getLong(0))
    var cents: Array[Array[Array[Float]]] =
      subs.filter(col("id").isin(seedIds: _*))
        .orderBy("sub", "id")
        .collect()
        .grouped(ksub)
        .map(_.map(_.getSeq[Float](2).toArray).toArray)
        .toArray
    require(cents.length == m && cents.forall(_.length == ksub),
      s"corpus has fewer than ksub=$ksub rows")
    for (_ <- 0 until iters) {
      // ASSIGN: per-subspace literal-codebook argmin (CASE over sub) —
      // narrow projection; UPDATE: one mean agg per (sub, code) cell
      val code = (0 until m).map(s =>
        when(col("sub") === s, argminCode(col("subvec"), cents(s))))
        .reduce((a, b) => coalesce(a, b))
      val updated = subs
        .withColumn("code", code)
        .select(col("sub"), col("code"),
          posexplode(col("subvec")).as(Seq("d", "x")))
        .groupBy("sub", "code", "d")
        .agg(avg(col("x").cast("double")).as("mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case ((s, c), rows) =>
          (s, c) -> rows.sortBy(_.getInt(2)).map(_.getDouble(3).toFloat).toArray
        }
      cents = Array.tabulate(m, ksub) { (s, c) =>
        updated.getOrElse((s, c), cents(s)(c))
      }
    }
    Codebook(m, ksub, dsub, cents)
  }

  /** Encode every vector as its `m` argmin codes — a pure projection
    * against the literal codebook (zero shuffle, codegen'd).
    */
  def encode(embs: DataFrame, idCol: String, vecCol: String,
      cb: Codebook, keepCols: Seq[String] = Nil): DataFrame =
    embs.select(col(idCol).as("id") +:
      array((0 until cb.m).map(s =>
        argminCode(slice(col(vecCol), s * cb.dsub + 1, cb.dsub),
          cb.centroids(s)).cast("int")): _*).as("codes") +:
      keepCols.map(col): _*)

  /** ADC top-`k`: estimated distance = Σ_sub lut(sub)(code(sub)) where
    * the lookup table holds exact probe-to-centroid subspace distances.
    * Narrow projection over the codes + TakeOrdered — the corpus scan
    * reads only the codes column.
    */
  def adcTopK(codes: DataFrame, cb: Codebook, probe: Array[Float],
      k: Int): DataFrame = {
    val lut: Array[Array[Double]] = Array.tabulate(cb.m, cb.ksub) { (s, j) =>
      var d = 0.0
      var i = 0
      while (i < cb.dsub) {
        val diff = probe(s * cb.dsub + i).toDouble - cb.centroids(s)(j)(i).toDouble
        d += diff * diff
        i += 1
      }
      d
    }
    val est = (0 until cb.m).map(s =>
      element_at(typedLit(lut(s).toSeq), col("codes").getItem(s) + 1))
      .reduce(_ + _)
    codes.select(col("id"), round(est, 6).as("est_dist"))
      .orderBy(col("est_dist"), col("id"))
      .limit(k)
  }

  /** The full PQ search composition: ADC SHORTLIST over the compressed
    * codes (reads only the m-byte codes column), then EXACT rerank of
    * the `shortlist` survivors against their raw vectors — the standard
    * two-stage ANN: quantization error decides which ~shortlist/n of the
    * corpus pays full-precision I/O, never the ranking itself. The
    * shortlist is k-sized, so it broadcasts; the raw corpus is touched
    * once, via the broadcast semi-join.
    */
  def adcRerank(codes: DataFrame, embs: DataFrame, idCol: String,
      vecCol: String, cb: Codebook, probe: Array[Float],
      shortlist: Int, k: Int): DataFrame = {
    val short = adcTopK(codes, cb, probe, shortlist).select("id")
    val pv = typedLit(probe.toSeq)
    embs.join(broadcast(short), col(idCol) === col("id"))
      .select(col("id"),
        round(aggregate(zip_with(col(vecCol), pv,
            (x, c) => (x.cast("double") - c.cast("double")) *
              (x.cast("double") - c.cast("double"))),
          lit(0.0d), (acc, x) => acc + x), 6).as("dist"))
      .orderBy(col("dist"), col("id"))
      .limit(k)
  }
}

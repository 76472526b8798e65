package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV / theta-style bottom-k distinct sketch (Bar-Yossef et al. 2002;
  * the estimator family behind Apache DataSketches' theta sketch), the
  * engine's DETERMINISTIC approximate-distinct primitive.
  *
  * Why this exists next to HLL (`hll_sketch_agg`, kept spec-pinned in
  * SketchSpec): an HLL estimate is partition-order-independent but
  * register-layout-dependent — two ENGINES (or two library versions)
  * disagree on the exact integer, so an HLL query can only ever get a
  * rows-only correctness check. The KMV sketch is a pure function of
  * the distinct md5-hash SET: `bottomK(distinct hashes)` — identical
  * under any partitioning, any reduce/merge tree, any task retry, and
  * reproducible in ANSI SQL, so the sketch queries get the same
  * rows+schema+hash oracle certification as every exact query, and a
  * 1000-executor run with speculative retries is bit-stable. The trade
  * is state size: k × 8 bytes vs HLL's ~0.7 kB for similar error —
  * both constant per group; RSE ≈ 1/√(k−2) ≈ 3.1% at k = 1024.
  *
  * Estimator (both regimes one definition, mirrored verbatim by the
  * DuckDB oracle SQL):
  *  - the aggregator retains the k+1 smallest distinct hashes, so
  *    `size ≤ k` ⟺ every distinct hash is retained ⟹ the sketch is
  *    EXACT: estimate = size;
  *  - else estimate = ⌊(k−1) · 2⁶⁰ / h₍ₖ₎⌋ with h₍ₖ₎ the k-th smallest
  *    (the classic unbiased KMV estimate on 60-bit hashes).
  *
  * Mergeability is LOSSLESS: bottomK(bottomK(A) ∪ bottomK(B)) =
  * bottomK(A ∪ B), so per-day partials union to exactly the global
  * sketch (KmvSpec proves equality, and the `agg_sketch_reuse` oracle
  * re-proves it cross-engine: Spark merges partials, DuckDB computes
  * the global sketch directly, and the hashes must agree).
  *
  * Unlike HLL, theta/KMV sketches also support set INTERSECTION
  * estimates (`agg_sketch_intersect`): with θ = min of the two
  * sketches' k-th hashes, |A∩B| ≈ |{h ∈ SA∩SB : h < θ}| · 2⁶⁰ / θ.
  */
object Kmv {
  /** Estimator parameter: estimates use the k-th smallest hash. */
  val K = 1024
  /** Retained hashes = k+1; the (k+1)-th marks saturation. */
  val Capacity: Int = K + 1
  /** Hash domain: 15 hex digits of md5 = 60 bits (fits BIGINT in both
    * engines; `conv` here ↔ `('0x' || substr(md5(x), 1, 15))::BIGINT`
    * in DuckDB — the [[Hashing.md5Bucket]] convention at full width).
    */
  val TwoPow60: Long = 1152921504606846976L

  /** 60-bit engine-independent uniform hash of any key column. */
  def hash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[hash64]]. */
  def hash64Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Distinct-count estimate from a finished sketch array (in-row,
    * codegen'd): exact below saturation, KMV estimate above.
    */
  def estimate(sk: Column): Column =
    when(size(sk) <= K, size(sk).cast("long"))
      .otherwise(floor(
        lit((K - 1).toDouble * TwoPow60.toDouble) /
          element_at(sk, K).cast("double")))

  /** DuckDB twin of [[estimate]] over a sorted hash list `u` (same
    * constant folding, same IEEE ops, same floor→BIGINT).
    */
  def estimateSql(u: String): String =
    s"""CASE WHEN len($u) <= $K THEN CAST(len($u) AS BIGINT)
             ELSE CAST(floor((${K - 1}.0 * $TwoPow60.0)
                             / CAST($u[$K] AS DOUBLE)) AS BIGINT) END"""

  /** In-row union of sketch arrays (e.g. collected over a sliding
    * window): bottom-(k+1) of the distinct union — the lossless KMV
    * merge as a pure array expression, constant work per row.
    */
  def unionArrays(sks: Column): Column =
    slice(array_sort(array_distinct(flatten(sks))), 1, Capacity)

  /** The aggregator: bounded mergeable bottom-`capacity` distinct-hash
    * buffer. Partial aggregation reduces every map partition to ≤
    * capacity longs per group before the shuffle — constant state at
    * any corpus size, the same shape as [[TopKAggregator]]. After the
    * buffer saturates, the common case is the O(1) reject
    * (`h ≥ last`), so per-row cost is flat; inserts are O(capacity)
    * copies but only ~capacity·ln(n/capacity) of them happen per
    * partition.
    */
  def sketchUdaf(): Column => Column = {
    val agg = udaf(new KmvAggregator(Capacity), ExpressionEncoder[Long]())
    (c: Column) => agg(c)
  }

  /** The bottom-m sample aggregator ([[KmvSampleAggregator]]) as a
    * ready-to-apply aggregate column — the ONE construction site for
    * its encoder, like [[sketchUdaf]] for the sketch.
    */
  def sampleUdaf(m: Int): (Column, Column) => Column = {
    val agg = udaf(new KmvSampleAggregator(m), ExpressionEncoder[HashedVal]())
    (h: Column, v: Column) => agg(h, v)
  }
}

/** Bottom-`capacity` DISTINCT hashes, ascending. See [[Kmv]]. */
class KmvAggregator(capacity: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(capacity > 0)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    if (x.isEmpty) y else if (y.isEmpty) x
    else (x ++ y).distinct.sorted.take(capacity)

  override def finish(b: Seq[Long]): Seq[Long] = b

  private def insert(b: Seq[Long], h: Long): Seq[Long] = {
    val n = b.size
    if (n >= capacity && h >= b(n - 1)) b
    else {
      // binary search for h in the ascending buffer
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid) < h) lo = mid + 1 else hi = mid
      }
      if (lo < n && b(lo) == h) b // already present: distinct set
      else {
        val nb = (b.take(lo) :+ h) ++ b.drop(lo)
        if (nb.size > capacity) nb.take(capacity) else nb
      }
    }
  }

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** One (hash, value) sample candidate for [[KmvSampleAggregator]]. */
case class HashedVal(h: Long, v: Double)

/** Bottom-`m`-by-hash uniform row sample as a mergeable aggregation —
  * the deterministic quantile-sketch primitive behind
  * `agg_approx_quantile`: keep the `m` rows whose (md5-of-row-key,
  * value) sort lowest, then read exact rank-selection quantiles off
  * the sample. A pure function of the row set (order- and
  * engine-independent, mirrored by a `row_number() OVER (ORDER BY
  * hash, value)` oracle), mergeable by the same bottom-k argument as
  * [[KmvAggregator]], constant state per group. Rank error ≈
  * √(p(1−p)/m) — ~1.6% at the median with m = 1000.
  *
  * The buffer is a MULTISET ordered by (h, v): duplicate (h, v) pairs
  * (only possible via a 60-bit hash collision with equal values) are
  * all retained, exactly as the SQL row_number mirror counts them.
  */
class KmvSampleAggregator(m: Int)
    extends Aggregator[HashedVal, Seq[HashedVal], Seq[HashedVal]] {
  require(m > 0)

  private def lt(a: HashedVal, b: HashedVal): Boolean =
    a.h < b.h || (a.h == b.h && a.v < b.v)

  override def zero: Seq[HashedVal] = Vector.empty

  override def reduce(b: Seq[HashedVal], x: HashedVal): Seq[HashedVal] =
    insert(b, x)

  override def merge(x: Seq[HashedVal], y: Seq[HashedVal]): Seq[HashedVal] =
    y.foldLeft(x)(insert)

  override def finish(b: Seq[HashedVal]): Seq[HashedVal] = b

  private def insert(b: Seq[HashedVal], x: HashedVal): Seq[HashedVal] =
    if (b.size >= m && !lt(x, b.last)) b
    else {
      val (front, back) = b.span(lt(_, x))
      ((front :+ x) ++ back).take(m)
    }

  override def bufferEncoder: Encoder[Seq[HashedVal]] =
    ExpressionEncoder[Seq[HashedVal]]()
  override def outputEncoder: Encoder[Seq[HashedVal]] =
    ExpressionEncoder[Seq[HashedVal]]()
}

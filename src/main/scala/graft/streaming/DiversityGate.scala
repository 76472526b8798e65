package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Streaming ℓ-diversity release gate — the live twin of the batch
  * `gov_l_diversity` audit: per closed event-time window, the per-type
  * event counts are RELEASED only when the window carries at least `l`
  * distinct sensitive values; a window whose rows are all one type
  * (everyone in that hour did the same thing) re-identifies behavior
  * and collapses to a single `__suppressed__` rollup row instead. Runs
  * on the admitted side of the governance path — after the tombstone
  * guard, before any count release — the same suppress-before-release
  * ordering GovernancePipeline pins for the DP path.
  *
  * Scale design (the DriftMonitor contract):
  *  - ONE stateful aggregation whose state per open window is a
  *    type→count map bounded by [[MaxTracked]] entries
  *    ([[TypeCountsAggregator]] — mergeable, partials combine map-side;
  *    a hostile high-cardinality sensitive column folds into the
  *    `__other__` entry rather than growing state, and the release
  *    decision stays EXACT as long as MaxTracked ≥ l: a map at the cap
  *    proves distinct ≥ MaxTracked ≥ l);
  *  - the gate arithmetic (distinct count, suppression, rollup) is a
  *    projection on the emitted (window, counts) rows — ≤ MaxTracked
  *    entries each, never the corpus;
  *  - append mode + watermark: each window releases exactly once on
  *    close and its map drops — the emit-once contract a release gate
  *    REQUIRES (re-releasing a window after more rows arrived could
  *    flip a suppressed window to released with different counts).
  */
object DiversityGate {

  /** State-bound on distinct sensitive values tracked per window. Far
    * above any real sensitive domain (event types, countries, age
    * bands); the release decision is exact whenever l ≤ MaxTracked.
    */
  val MaxTracked = 64

  val OtherKey = "__other__"

  /** The suppressed-rollup sentinel, shared with [[KAnonGate]]. */
  val SuppressedKey = "__suppressed__"

  /** Reserved-namespace guard, applied by both gates at the entrance:
    * an input key that is literally [[SuppressedKey]] would, on
    * reaching the release bar, emit as a normal row COLLIDING with the
    * always-present rollup row — (w_start, key) stops being unique and
    * the rollup total turns ambiguous — and a key literally
    * [[OtherKey]] silently merges into the overflow fold and can never
    * be released. Neither corruption is detectable downstream, so the
    * gate REJECTS the row loudly (the stream fails, the checkpoint
    * replays) instead of releasing a corrupted window; a deployment
    * whose domain legitimately contains these strings must escape them
    * upstream.
    */
  def rejectReserved(key: Column): Column =
    when(key.isin(SuppressedKey, OtherKey),
      raise_error(concat(
        lit("reserved gate sentinel in input key: "), key)))
      .otherwise(key)

  /** THE ℓ default, shared by the batch audit (`gov_l_diversity`) and
    * the streaming pipeline ([[GovernancePipeline.run]]) — one constant
    * consumed by both surfaces, so a deployment cannot silently audit
    * its corpus at one ℓ while gating live releases at another (the two
    * previously disagreed: batch 3, stream 2). Distinct ℓ = 3 is the
    * batch audit's long-standing release bar.
    */
  val DefaultL = 3

  /** Mergeable bounded type→count map: the CentroidAggregator shape
    * with a cardinality cap — and a DETERMINISTIC one: the tracked set
    * is always the [[MaxTracked]] lexicographically-smallest distinct
    * keys seen so far, each with its EXACT count; everything else folds
    * into [[OtherKey]] (totals are never dropped). A new key past the
    * cap EVICTS the largest tracked key into [[OtherKey]] when it sorts
    * below it, so the finished map is a pure function of the input
    * MULTISET — independent of row order, partitioning, and merge-tree
    * shape (replay-stable emitted counts, the repo's oracle
    * convention). Why the invariant holds under any order: a key can
    * only fold into [[OtherKey]] at a moment when [[MaxTracked]]
    * strictly-smaller keys have already been seen — and those keys are
    * in the final union too, so a folded key is never among the final
    * MaxTracked-smallest, and a final tracked key never lost counts.
    */
  class TypeCountsAggregator
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    private def add(b: Map[String, Long], k: String, n: Long): Map[String, Long] = {
      if (k == OtherKey || b.contains(k)) b.updated(k, b.getOrElse(k, 0L) + n)
      else {
        val tracked = b.size - (if (b.contains(OtherKey)) 1 else 0)
        if (tracked < MaxTracked) b.updated(k, n)
        else {
          val maxK = b.keysIterator.filter(_ != OtherKey).max
          if (k > maxK) b.updated(OtherKey, b.getOrElse(OtherKey, 0L) + n)
          else (b - maxK).updated(k, n)
            .updated(OtherKey, b.getOrElse(OtherKey, 0L) + b(maxK))
        }
      }
    }
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      add(b, if (v == null) OtherKey else v, 1L)
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val (big, small) = if (x.size >= y.size) (x, y) else (y, x)
      small.foldLeft(big) { case (acc, (k, n)) => add(acc, k, n) }
    }
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** The gate: events stream (`ts` timestamp, `event_type` string) →
    * per closed window, either the per-type counts (window is
    * ℓ-diverse) or one `__suppressed__` rollup row. Output columns:
    * (w_start, w_end, event_type, n, l_div) — `l_div` is the window's
    * distinct-sensitive count on every emitted row (0 on the rollup,
    * the batch twin's convention).
    *
    * ROLLUP DISCLOSURE — an intentional relaxation of the batch twin:
    * `gov_l_diversity` rolls ALL suppressed cells into one (-1,-1)
    * aggregate, while this gate emits one rollup PER suppressed window
    * — an exact, timestamped event total for each window known to be
    * near-uniform in one sensitive value, which is strictly more than
    * the batch release discloses. A deployment that cares should
    * coarsen it: `suppressedGranularity = g` rounds each rollup total
    * UP to the next multiple of g (exact longs, still deterministic),
    * or route the rollup through [[DpRelease.releasedMicro]] before
    * publishing. The default g = 1 keeps bit-parity with the batch
    * rule per window (and with the specs' replays).
    */
  def releasePerWindow(
      events: DataFrame,
      l: Int,
      windowDuration: String,
      watermarkDelay: String,
      suppressedGranularity: Long = 1L): DataFrame = {
    require(l >= 1 && l <= MaxTracked, s"l must be in [1, $MaxTracked]")
    require(suppressedGranularity >= 1L,
      s"suppressedGranularity must be >= 1, got $suppressedGranularity")
    val counts = udaf(new TypeCountsAggregator)
    val gated = events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration))
      .agg(counts(rejectReserved(col("event_type"))).as("counts"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("counts"),
        size(map_keys(col("counts"))).cast("long").as("l_div"),
        aggregate(map_values(col("counts")), lit(0L), (a, x) => a + x)
          .as("total"))
    // exact ceil to the granularity in longs: ((t + g - 1) div g) * g
    val coarse = expr(
      s"((total + ${suppressedGranularity - 1L}) div $suppressedGranularity)" +
        s" * $suppressedGranularity")
    gated.select(col("w_start"), col("w_end"),
        when(col("l_div") >= l, map_entries(col("counts")))
          .otherwise(array(struct(lit(OtherKey).as("key"),
            coarse.as("value")))).as("entries"),
        when(col("l_div") >= l, col("l_div")).otherwise(0L).as("l_div"))
      .select(col("w_start"), col("w_end"),
        explode(col("entries")).as("e"), col("l_div"))
      .select(col("w_start"), col("w_end"),
        when(col("l_div") === 0L, SuppressedKey)
          .otherwise(col("e.key")).as("event_type"),
        col("e.value").as("n"),
        col("l_div"))
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming k-anonymity release gate — the live twin of the batch
  * `gov_k_anon` audit, completing the governance family's streaming
  * surface (forget / DP / drift / ℓ-diversity / k-anon): per closed
  * event-time window, each quasi-identifier cell's count is RELEASED
  * only when the cell carries at least `k` rows; sub-k cells roll up
  * into one `__suppressed__` row per window (always emitted, 0 when
  * nothing suppressed — the batch twin's exhaustive-release
  * convention: released rows + rollup account for every input row).
  * In the windowed stream the window IS the batch audit's "when" cell
  * (hour, day), so the per-window QI reduces to the `cell` column.
  *
  * Runs on the admitted side of [[GovernancePipeline]] — after the
  * tombstone guard, before anything is published — the same
  * suppress-before-release ordering the DP and diversity paths pin.
  *
  * Scale/state (the [[DiversityGate]] contract, sharing its
  * aggregator): ONE stateful windowed aggregation whose per-open-window
  * state is the bounded cell→count map ([[DiversityGate.MaxTracked]]
  * entries, mergeable, partials combine map-side, deterministic fold);
  * the gate arithmetic is a projection on the emitted ≤MaxTracked-entry
  * rows, never the corpus. Append mode + watermark: each window
  * releases exactly once on close and its map drops.
  *
  * Past the cap the gate is EXACT for the MaxTracked
  * lexicographically-smallest cells and CONSERVATIVE for the rest:
  * counts folded into `__other__` cannot be attributed to a single
  * cell, so they join the suppressed rollup even if some folded cell
  * individually reached k — a hostile high-cardinality QI can only
  * cause over-suppression, never an unverified release. The fold is
  * deterministic, so the released rows are replay-stable either way.
  */
object KAnonGate {

  /** THE k default, shared with the batch `gov_k_anon` audit (which
    * consumes this constant) — one value for both surfaces, the
    * [[DiversityGate.DefaultL]] convention. k = 5 is the batch audit's
    * long-standing release bar; its oracle SQL hardcodes the value, so
    * KAnonGateSpec pins DefaultK == 5.
    */
  val DefaultK = 5L

  /** The rollup sentinel — shared with [[DiversityGate]], whose
    * [[DiversityGate.rejectReserved]] guard both gates apply at the
    * entrance so an input cell literally equal to a sentinel can never
    * alias the rollup row or vanish into the overflow fold.
    */
  val SuppressedKey: String = DiversityGate.SuppressedKey

  /** The gate: events stream (`ts` timestamp, `cell` string — the
    * quasi-identifier) → per closed window, the released per-cell
    * counts plus the always-present suppressed rollup. Output columns:
    * (w_start, w_end, cell, n).
    */
  def releasePerWindow(
      events: DataFrame,
      k: Long,
      windowDuration: String,
      watermarkDelay: String): DataFrame = {
    require(k >= 1L, s"k must be >= 1, got $k")
    val counts = udaf(new DiversityGate.TypeCountsAggregator)
    def released(e: Column): Column =
      e.getField("value") >= k &&
        e.getField("key") =!= DiversityGate.OtherKey
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration))
      .agg(counts(DiversityGate.rejectReserved(col("cell"))).as("counts"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        map_entries(col("counts")).as("entries"))
      .select(col("w_start"), col("w_end"),
        filter(col("entries"), e => released(e)).as("rel"),
        aggregate(filter(col("entries"), e => !released(e)),
          lit(0L), (a, e) => a + e.getField("value")).as("supp"))
      .select(col("w_start"), col("w_end"),
        explode(concat(col("rel"), array(struct(
          lit(SuppressedKey).as("key"), col("supp").as("value"))))).as("e"))
      .select(col("w_start"), col("w_end"),
        col("e.key").as("cell"), col("e.value").as("n"))
  }
}

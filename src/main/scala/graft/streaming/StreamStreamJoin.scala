package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream watermarked interval join — the one stateful Structured
  * Streaming family a CDC user hits that nothing else in the engine
  * covers: enriching one live change stream with ANOTHER live stream
  * (the reference's R1 change-stream source composed with itself,
  * `main.go:95` — e.g. order changes joined to the same account's
  * payment changes as both streams flow).
  *
  * Semantics and scale shape:
  *  - Both sides carry an event-time watermark; the join condition is an
  *    equi-key match plus a bounded time interval (`rightTime` within
  *    `[leftTime - lookback, leftTime]`). The TWO bounds are what make
  *    unbounded state finite: Spark derives a state watermark per side
  *    and evicts buffered rows that can no longer match — without the
  *    interval, both sides would buffer forever.
  *  - Late rows (older than the global watermark) are dropped at the
  *    input, never joined — the streaming analog of the relay's
  *    at-least-once redelivery horizon.
  *  - Execution is a symmetric hash join: each side shuffles ONCE on the
  *    key into co-located state stores, so per-micro-batch cost is
  *    bounded by the batch plus the interval-bounded state, independent
  *    of stream history — the only shape that survives an unbounded
  *    stream on a 1000-executor cluster.
  */
object StreamStreamJoin {

  /** Generic watermarked interval equi-join: `left` rows pick up every
    * `right` row with the same key whose `rightTime` falls in
    * `[leftTime - lookback, leftTime]`. Column names must be disjoint
    * (the CDC wrappers below prefix them).
    *
    * Works identically on BATCH frames — Catalyst's
    * `EliminateEventTimeWatermark` removes the watermark nodes over
    * non-streaming children — which is how the oracled batch twin
    * (`cdc_stream_enrich`) runs this exact code path against DuckDB.
    */
  /** `joinType` additionally supports the streaming OUTER flavors
    * (`left_outer`/`right_outer`/`full_outer`): an unmatched row is
    * emitted null-padded only once the watermark proves no match can
    * still arrive — the streaming analog of "enrich if present".
    */
  def intervalEnrich(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      lookback: String, delay: String = "10 seconds",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTime, delay)
    val r = right.withWatermark(rightTime, delay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime).between(
          col(leftTime) - expr(s"INTERVAL $lookback"), col(leftTime)),
      joinType)
  }

  /** CDC flavor: enrich a parsed change-stream envelope with a second
    * parsed change stream on `documentKey`, each change joined to the
    * other stream's changes from its trailing `lookback` window. Columns
    * are prefixed `l_`/`r_` so the two envelopes can't collide.
    */
  def enrichChangeStream(changes: DataFrame, enrich: DataFrame,
      lookback: String, delay: String = "10 seconds"): DataFrame = {
    def shape(env: DataFrame, p: String): DataFrame = env.select(
      col("documentKey").as(s"${p}_key"),
      timestamp_millis(StatefulOps.eventTimeMillis(col("clusterTime")))
        .as(s"${p}_ts"),
      col("operationType").as(s"${p}_op"),
      col("fullDocument").as(s"${p}_doc"))
    intervalEnrich(
      shape(changes, "l"), "l_key", "l_ts",
      shape(enrich, "r"), "r_key", "r_ts",
      lookback, delay)
  }
}

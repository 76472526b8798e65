package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Streaming ingest-drift monitor — the live twin of the batch
  * `doc_drift_psi` query: per event-time window, the population
  * stability index of the incoming documents' length distribution
  * against a STANDING reference histogram (last week's corpus, the
  * training mix's design distribution, …). An ingest feed whose PSI
  * creeps up is sourcing different content than the corpus the quality
  * thresholds and mixture weights were tuned on — this is the alarm
  * that fires before those knobs silently mis-calibrate.
  *
  * Scale design:
  *  - ONE stateful aggregation whose state per open window is a fixed
  *    `nBuckets`-long histogram buffer ([[HistogramAggregator]] —
  *    mergeable, so partials combine map-side and the shuffle carries
  *    one buffer per (partition × window), never per document);
  *  - the reference histogram rides along as a BROADCAST LITERAL array
  *    (10 longs) — no join, no state;
  *  - the PSI arithmetic is a projection on the emitted (window, hist)
  *    rows: add-1 smoothing, per-bucket (p−q)·ln(p/q) quantized to 1e-6
  *    micro-longs, summed as exact longs — bit-identical to the batch
  *    query's arithmetic at any parallelism (GovernanceQueries scale
  *    notes; DriftMonitorSpec pins stream ≡ batch on a replay);
  *  - append mode + watermark: each window's PSI emits exactly once on
  *    close and its 10-long state drops; late rows past the watermark
  *    are dropped, matching the batch twin's snapshot semantics.
  */
object DriftMonitor {

  /** Fixed-edge histogram buckets shared with `doc_drift_psi`: 10 ×
    * 50-char buckets, capped — fixed edges keep the stream's histogram
    * comparable to any reference snapshot (learned edges would couple
    * the two distributions).
    */
  val NumBuckets = 10

  /** Total on any input: nulls count as length 0 and negatives clamp to
    * bucket 0 (the HistogramAggregator edge-fold), so a hostile fixture
    * can never emit an out-of-spine bucket row.
    */
  def lengthBucket(nChars: Column): Column =
    greatest(lit(0L), least(lit(NumBuckets - 1L),
      floor(coalesce(nChars, lit(0L)) / lit(50)).cast("long")))

  /** Mergeable fixed-size histogram: buffer = nBuckets longs, constant
    * per group regardless of row count (the CentroidAggregator shape).
    * Out-of-range bucket indices are counted into the edge buckets so
    * the total is never silently dropped.
    */
  class HistogramAggregator(nBuckets: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](nBuckets)
    override def reduce(b: Array[Long], v: Long): Array[Long] = {
      val i = math.min(math.max(v, 0L), (nBuckets - 1).toLong).toInt
      b(i) += 1L
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nBuckets) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Reference histogram of a standing corpus — one aggregation pass,
    * `NumBuckets` longs to the driver (model-sized by construction).
    */
  def referenceHistogram(docs: DataFrame): Array[Long] = {
    val hist = udaf(new HistogramAggregator(NumBuckets))
    docs.select(lengthBucket(col("n_chars")).as("b"))
      .agg(hist(col("b")).as("hist"))
      .collect()(0).getSeq[Long](0).toArray
  }

  /** PSI of `hist` (the "cur" side) against `ref` (the "ref" side) in
    * 1e-6 micro-units — the exact arithmetic of the batch twin: add-1
    * smoothing, per-bucket micro-long terms, exact long sum.
    */
  def psiMicro(hist: Column, ref: Array[Long]): Column = {
    require(ref.length == NumBuckets, s"reference must have $NumBuckets buckets")
    val nr = lit((ref.sum + NumBuckets).toDouble)
    val nc = (aggregate(hist, lit(0L), (a, x) => a + x) +
      lit(NumBuckets.toLong)).cast("double")
    val terms = zip_with(hist, typedLit(ref.toSeq), (c, r) => {
      val p = (r + lit(1L)).cast("double") / nr
      val q = (c + lit(1L)).cast("double") / nc
      round((p - q) * log(p / q) * lit(1e6), 0).cast("long")
    })
    aggregate(terms, lit(0L), (a, x) => a + x)
  }

  /** The monitor: documents stream (`ts` timestamp, `n_chars` long) →
    * one row per closed event-time window with the window's histogram
    * and its PSI against `ref`. Append mode; rows later than
    * `watermarkDelay` drop.
    */
  def psiPerWindow(
      docs: DataFrame,
      ref: Array[Long],
      windowDuration: String,
      watermarkDelay: String): DataFrame = {
    val hist = udaf(new HistogramAggregator(NumBuckets))
    docs
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration))
      .agg(hist(lengthBucket(col("n_chars"))).as("hist"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("hist"),
        psiMicro(col("hist"), ref).as("psi_micro"))
  }
}

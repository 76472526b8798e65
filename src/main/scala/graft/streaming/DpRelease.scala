package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private WINDOWED count release — the live third of the
  * governance streaming surface (with [[ForgetFilter]] and
  * [[DriftMonitor]]): per event-time window and group key, the count
  * plus seeded Laplace(1/ε) noise, released in micro-units — the
  * telemetry-dashboard shape (windowed usage counts published under a
  * privacy budget) running directly on the relay's event stream.
  *
  * The mechanism is the batch `gov_dp_counts` one, single-sourced here
  * ([[laplaceMicro]]) so the batch query and the stream can never
  * diverge: md5 bucket of the seed → u ∈ (−0.5, 0.5) → inverse CDF
  * −(1/ε)·sign(u)·ln(1−2|u|), quantized to micro-longs before it meets
  * the count. On the stream the seed is (window start, key), so each
  * window's release draws fresh — but deterministic, replay-stable —
  * noise per group; a real deployment would swap the seed for a
  * per-release CSPRNG draw and account the ε budget per window.
  *
  * Scale/state: ONE windowed streaming aggregation (count — partials
  * combine map-side, state per open (window, key) is a single long);
  * the noise is a stateless projection on the emitted rows. Append mode
  * + watermark: each window's release emits exactly once on close —
  * re-releasing a window would double-spend its ε, so the
  * emit-once-then-drop-state contract IS the privacy accounting.
  */
object DpRelease {

  /** Seeded Laplace(1/eps) noise in 1e-6 micro-units: deterministic in
    * the seed column, bit-identical at any parallelism (the
    * gov_dp_counts arithmetic, verbatim).
    *
    * PRIVACY CAVEAT (applies to every entry point below): with the
    * default empty `salt`, the noise is a deterministic function of
    * PUBLIC values (the group key / window start), so anyone can
    * recompute and subtract it — the released counts are exactly
    * recoverable and the ε-DP guarantee is NOMINAL, fit only for
    * tests and the DuckDB oracle. A production release MUST pass a
    * `salt` the adversary cannot know (a secret deployment seed, or a
    * column carrying per-release CSPRNG draws); the key-derived seed
    * stays the default only so the batch query, the stream, and the
    * oracle can share one replayable mechanism.
    */
  def laplaceMicro(seed: Column, eps: Double,
      salt: Column = lit("")): Column = {
    val bkt = graft.functions.Hashing.md5Bucket(concat(salt, seed))
    val u = (bkt.cast("double") + lit(0.5)) / lit(1e6) - lit(0.5)
    round(lit(-1.0 / eps) * signum(u) *
      log(lit(1.0) - lit(2.0) * abs(u)) * lit(1e6), 0).cast("long")
  }

  /** Released count in micro-units, clamped at zero. `salt` defaults to
    * the recomputable test/oracle seed — see the caveat on
    * [[laplaceMicro]] before releasing real data.
    */
  def releasedMicro(n: Column, seed: Column, eps: Double,
      salt: Column = lit("")): Column =
    greatest(lit(0L), n * lit(1000000L) + laplaceMicro(seed, eps, salt))

  /** The monitor: an event stream (`ts` timestamp, `key` string) → one
    * row per closed (window, key) with the ε-DP released count.
    * `noiseSalt` defaults to the recomputable test/oracle seed — see
    * the caveat on [[laplaceMicro]] before releasing real data.
    */
  def noisyCountsPerWindow(
      events: DataFrame,
      eps: Double,
      windowDuration: String,
      watermarkDelay: String,
      noiseSalt: Column = lit("")): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("key"),
        releasedMicro(col("n"),
          concat(col("window.start").cast("long").cast("string"),
            lit("|"), col("key")), eps, noiseSalt).as("released_micro"))
}

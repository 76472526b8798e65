package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DpRelease

/** The windowed DP release's contract: each (window, key) releases its
  * seeded-Laplace count exactly once in append mode (re-release would
  * double-spend ε), the noise matches a driver-side replay of the
  * mechanism, late rows drop, and the shared helper keeps the batch
  * gov_dp_counts query and the stream bit-consistent.
  */
class DpReleaseSpec extends SparkSpec {

  private val T0 = 1700000000L

  private def ts(offsetSec: Long) = new Timestamp((T0 + offsetSec) * 1000L)

  /** Driver replay of the seeded mechanism (micro-units). */
  private def noiseMicro(seed: String, eps: Double): Long = {
    val bkt = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(seed).take(8),
      16) % 1000000L
    val u = (bkt + 0.5) / 1e6 - 0.5
    math.round(-1.0 / eps * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u)) * 1e6)
  }

  private def runRelease(name: String,
      batches: Seq[Seq[(Timestamp, String)]]): Seq[(Long, String, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = DpRelease.noisyCountsPerWindow(
      input.toDS().toDF("ts", "key"), eps = 0.5,
      windowDuration = "1 hour", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select(unix_timestamp(col("w_start")), col("key"), col("released_micro"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  private def flush: Seq[Seq[(Timestamp, String)]] =
    Seq(Seq((ts(10000000), "_flush")), Seq((ts(10000001), "_flush")))

  test("each closed (window, key) releases once, with the seeded draw exactly") {
    val out = runRelease("dp_basic", Seq(
      Seq((ts(60), "click"), (ts(70), "click"), (ts(80), "view"),
        (ts(3660), "click"))) ++ flush)
    val real = out.filter(_._1 < T0 + 100000)
    // windows are epoch-hour aligned; recompute the expected release for
    // each emitted row from its own window start
    assert(real.map(r => (r._2, r._1)).distinct.length == real.length,
      "exactly one release per (window, key)")
    val counts = Map(("click", 0) -> 2L, ("view", 0) -> 1L, ("click", 1) -> 1L)
    assert(real.length == 3, s"three (window, key) groups: $real")
    real.foreach { case (wStart, key, released) =>
      val idx = if (wStart <= T0) 0 else 1
      val n = counts((key, idx))
      val expected = math.max(0L,
        n * 1000000L + noiseMicro(s"$wStart|$key", 0.5))
      assert(released == expected, s"$key@$wStart: $released != $expected")
    }
  }

  test("late rows drop: a closed window's release is never amended") {
    val out = runRelease("dp_late", Seq(
      Seq((ts(60), "click")),
      Seq((ts(7300), "click")),      // advances watermark past window 0
      Seq((ts(90), "click"))) ++ flush) // late into closed window 0
    val w0 = out.filter(t => t._1 <= T0 && t._2 == "click")
    assert(w0.length == 1, s"window 0 released once: $w0")
    val expected = math.max(0L,
      1000000L + noiseMicro(s"${w0.head._1}|click", 0.5))
    assert(w0.head._3 == expected, "the late row must not raise the count")
  }

  test("the batch gov_dp_counts query rides the same helper verbatim") {
    // seed = event_type (no window component) — recompute the registered
    // query's release from the helper's driver replay
    val rows = SparkEntry.queries("gov_dp_counts")(spark, sfDir).collect()
    val trueN = Tables.table(spark, sfDir, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val expected = math.max(0L,
        trueN(r.getString(0)) * 1000000L + noiseMicro(r.getString(0), 0.5))
      assert(r.getLong(1) == expected)
    }
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SessionWindows

/** Streaming sessionization contract: gap-merge vs the exact-gap split
  * boundary, exactly-once append emission on watermark close, late-row
  * drop, and per-user batch parity with the registered `ts_session`
  * query on a replayed fixture.
  */
class SessionWindowSpec extends SparkSpec {

  private val T0 = 1700000000L // epoch seconds, arbitrary fixed origin

  private def ts(offsetSec: Long) = new Timestamp((T0 + offsetSec) * 1000L)

  /** Run (user_id, ts) batches through sessionize(gap=1800s, wm=0s) and
    * return the closed sessions as (user_id, startSec, endSec, n).
    * Callers append far-future sentinel batches (user −1) to flush.
    */
  private def runSessions(name: String, batches: Seq[Seq[(Long, Timestamp)]])
      : Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val q = SessionWindows.sessionize(
      input.toDS().toDF("user_id", "ts"), gapSeconds = 1800,
      watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select(col("user_id"), unix_timestamp(col("start")),
        unix_timestamp(col("end")), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.filter(_._1 >= 0) // sentinels flush, never assert
  }

  private def flush: Seq[Seq[(Long, Timestamp)]] =
    // two sentinel batches: the first advances the watermark past every
    // real session's close, the second triggers the emitting micro-batch
    Seq(Seq((-1L, ts(1000000))), Seq((-1L, ts(1000001))))

  test("the gap boundary pins to the batch rule: ≤gap merges, >gap splits") {
    // one micro-batch: a second batch would sit past the first's
    // watermark (delay 0s) and its older rows would drop as late
    val out = runSessions("sw_merge", Seq(
      Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(1809)), // 1799s gap: merges
        (2L, ts(0)), (2L, ts(1800)),                 // EXACTLY gap: merges
        (3L, ts(0)), (3L, ts(1801)))                 // gap+1: splits
    ) ++ flush)
    val u1 = out.filter(_._1 == 1L)
    assert(u1 == Seq((1L, T0, T0 + 1809 + 1800, 3L)),
      s"gap-merge sessions: $u1")
    // session_window's overlap check is end-INCLUSIVE: an event landing
    // exactly gap seconds after its predecessor extends the session —
    // the same boundary the batch ts_session twin draws (new session
    // only on Δts > gap), so the two operators agree everywhere
    val u2 = out.filter(_._1 == 2L)
    assert(u2 == Seq((2L, T0, T0 + 1800 + 1800, 2L)),
      s"exact-gap sessions: $u2")
    val u3 = out.filter(_._1 == 3L).sortBy(_._2)
    assert(u3 == Seq((3L, T0, T0 + 1800, 1L),
      (3L, T0 + 1801, T0 + 3601, 1L)), s"gap+1 sessions: $u3")
  }

  test("a session emits exactly once, only after the watermark closes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val q = SessionWindows.sessionize(
      input.toDS().toDF("user_id", "ts"), 1800, "0 seconds")
      .writeStream.format("memory").queryName("sw_once")
      .outputMode("append").start()
    input.addData((1L, ts(0)))
    q.processAllAvailable()
    // watermark is still at t0: the open session must NOT have emitted
    assert(spark.table("sw_once").count() == 0L)
    input.addData((-1L, ts(900000))); q.processAllAvailable()
    input.addData((-1L, ts(900001))); q.processAllAvailable()
    q.stop()
    val rows = spark.table("sw_once").filter(col("user_id") === 1L).collect()
    assert(rows.length == 1, s"expected exactly one emission, got ${rows.length}")
  }

  test("rows later than the watermark drop (the state-bounding price)") {
    val out = runSessions("sw_late", Seq(
      Seq((1L, ts(0))),
      Seq((1L, ts(5000))), // advances the watermark to t0+5000
      Seq((2L, ts(10)))    // 4990s late: dropped, user 2 never sessionizes
    ) ++ flush)
    assert(out.exists(_._1 == 1L))
    assert(!out.exists(_._1 == 2L), s"late row leaked into a session: $out")
  }

  test("replayed fixture ≡ batch ts_session per-user session/event counts") {
    val events = Tables.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
      .sortBy(_._2.getTime) // event-time order: nothing is ever late
    val maxSec = events.map(_._2.getTime / 1000).max - T0
    val chunks = events.grouped(math.max(1, events.length / 3 + 1))
      .map(_.toSeq).toSeq
    val out = runSessions("sw_parity",
      chunks ++ Seq(Seq((-1L, ts(maxSec + 1000000))),
        Seq((-1L, ts(maxSec + 1000001)))))
    val streamed = out.groupBy(_._1).map { case (u, ss) =>
      u -> ((ss.length.toLong, ss.map(_._4).sum))
    }
    val batch = SparkEntry.queries("ts_session")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(streamed == batch,
      s"diverging users: ${(streamed.toSet diff batch.toSet).take(3)}")
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.KAnonGate

/** Streaming k-anonymity gate contract: cells at or over k release
  * their exact counts, sub-k cells fold into the always-present
  * per-window suppressed rollup (exhaustive accounting), windows emit
  * exactly once, and the gate decision matches the batch gov_k_anon
  * rule replayed on the same rows.
  */
class KAnonGateSpec extends SparkSpec {

  private val T0 = 1700000000L
  // hour-window starts align to the epoch hour grid, not to T0
  private val W0 = T0 - (T0 % 3600)
  private def ts(offsetSec: Long) = new Timestamp((T0 + offsetSec) * 1000L)

  private def runGate(name: String, k: Long,
      batches: Seq[Seq[(Timestamp, String)]])
      : Seq[(Long, String, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = KAnonGate.releasePerWindow(
      input.toDS().toDF("ts", "cell"), k,
      windowDuration = "1 hour", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select(unix_timestamp(col("w_start")), col("cell"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  private def flush: Seq[Seq[(Timestamp, String)]] =
    Seq(Seq((ts(10000000), "x")), Seq((ts(10000001), "x")))

  test("cells >= k release exact counts; sub-k cells roll up exhaustively") {
    // window 0: click x5 (released at k=5), view x3 + signup x1 (rolled)
    // window 1: purchase x6 only (released; rollup present with 0)
    val w0 = Seq.fill(5)("click") ++ Seq.fill(3)("view") ++ Seq("signup")
    val w1 = Seq.fill(6)("purchase")
    val out = runGate("ka_basic", 5,
      Seq(w0.map(c => (ts(60), c)) ++ w1.map(c => (ts(3660), c))) ++ flush)
    val real = out.filter(_._1 <= W0 + 3600)
    assert(real.filter(_._1 == W0).toSet === Set(
      (W0, "click", 5L), (W0, "__suppressed__", 4L)),
      s"window 0: ${real.filter(_._1 == W0)}")
    assert(real.filter(_._1 == W0 + 3600).toSet === Set(
      (W0 + 3600, "purchase", 6L), (W0 + 3600, "__suppressed__", 0L)),
      s"window 1: ${real.filter(_._1 == W0 + 3600)}")
    // exhaustive accounting: released + rollup = every input row
    assert(real.map(_._3).sum === (w0.size + w1.size).toLong)
  }

  test("emit-once on watermark close; late rows drop") {
    val out = runGate("ka_once", 2, Seq(
      Seq((ts(60), "a"), (ts(70), "a"), (ts(120), "b")),
      // advances the watermark past window 0 (watermark lags one batch)
      Seq((ts(7260), "a")),
      // genuinely late: the watermark already passed W0
      Seq((ts(30), "a")),
      Seq((ts(10000000), "x")), Seq((ts(10000001), "x"))))
    val w0 = out.filter(_._1 == W0)
    assert(w0.toSet === Set((W0, "a", 2L), (W0, "__suppressed__", 1L)),
      s"window 0: $w0")
    assert(out.count(_._1 == W0) === 2, "window 0 emitted exactly once")
  }

  test("batch parity: the gate decision is gov_k_anon's rule on the same rows") {
    import spark.implicits._
    // a mixed replay across two windows, cells straddling the k bar
    val rows = (Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(5)("c"))
      .map(c => (ts(100), c)) ++
      (Seq.fill(2)("a") ++ Seq.fill(9)("d")).map(c => (ts(3700), c))
    val k = KAnonGate.DefaultK
    val streamed = runGate("ka_parity", k, Seq(rows) ++ flush)
      .filter(t => t._1 <= W0 + 3600).toSet
    // the batch twin: same windowing, same k-cut, same exhaustive rollup
    val batch = rows.toDF("ts", "cell")
      .groupBy(window(col("ts"), "1 hour"), col("cell"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("w"),
        when(col("n") >= k, col("cell")).otherwise("__suppressed__")
          .as("cell"),
        col("n"))
      .groupBy("w", "cell").agg(sum("n").as("n"))
      // the always-present rollup the stream emits even at 0
      .unionByName(Seq((W0, "__suppressed__", 0L), (W0 + 3600, "__suppressed__", 0L))
        .toDF("w", "cell", "n"))
      .groupBy("w", "cell").agg(sum("n").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch, s"stream $streamed vs batch $batch")
  }

  test("a sentinel-valued input cell fails the stream loudly") {
    // a hostile QI cell literally named "__suppressed__" must not reach
    // the release path (where it would collide with the rollup row) —
    // the gate's entrance guard fails the batch instead
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = KAnonGate.releasePerWindow(
      input.toDS().toDF("ts", "cell"), 5,
      windowDuration = "1 hour", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("ka_reserved")
      .outputMode("append").start()
    try {
      input.addData((ts(60), "click"), (ts(61), KAnonGate.SuppressedKey))
      val e = intercept[Exception] { q.processAllAvailable() }
      val msgs = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
      assert(msgs.contains("reserved gate sentinel"), msgs)
    } finally q.stop()
  }

  test("the batch audit and the live gate share ONE k default") {
    // gov_k_anon's oracle SQL hardcodes 5 — a constant change must
    // break HERE, not as a silent oracle mismatch
    assert(KAnonGate.DefaultK === 5L)
    // GovernancePipeline.run's kAnon default (8th parameter)
    val dflt = graft.streaming.GovernancePipeline.getClass
      .getMethod("run$default$8").invoke(graft.streaming.GovernancePipeline)
    assert(dflt === KAnonGate.DefaultK)
  }
}

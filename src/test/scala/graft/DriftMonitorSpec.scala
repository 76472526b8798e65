package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DriftMonitor

/** Streaming drift-monitor contract: the per-window PSI matches a
  * driver-side recomputation of the batch arithmetic (stream ≡ batch on
  * a replay), the histogram state is mergeable (partitioning-blind),
  * windows emit exactly once in append mode, late rows drop, and a
  * planted distribution shift raises PSI above the no-drift floor.
  */
class DriftMonitorSpec extends SparkSpec {

  private val T0 = 1700000000L

  private def ts(offsetSec: Long) = new Timestamp((T0 + offsetSec) * 1000L)

  /** Driver-side PSI in micro-units — the batch doc_drift_psi formula. */
  private def psiRef(cur: Array[Long], ref: Array[Long]): Long = {
    val nr = (ref.sum + ref.length).toDouble
    val nc = (cur.sum + cur.length).toDouble
    ref.zip(cur).map { case (r, c) =>
      val p = (r + 1).toDouble / nr
      val q = (c + 1).toDouble / nc
      math.round((p - q) * math.log(p / q) * 1e6)
    }.sum
  }

  private def histOf(lens: Seq[Long]): Array[Long] = {
    val h = new Array[Long](DriftMonitor.NumBuckets)
    lens.foreach(l => h(math.min(9L, l / 50).toInt) += 1)
    h
  }

  private def runMonitor(name: String, ref: Array[Long],
      batches: Seq[Seq[(Timestamp, Long)]]): Seq[(Long, Seq[Long], Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = DriftMonitor.psiPerWindow(
      input.toDS().toDF("ts", "n_chars"), ref,
      windowDuration = "1 hour", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select(unix_timestamp(col("w_start")), col("hist"), col("psi_micro"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .toSeq.sortBy(_._1)
  }

  // two sentinel batches far in the future: advance the watermark past
  // every real window, then trigger the emitting micro-batch
  private def flush: Seq[Seq[(Timestamp, Long)]] =
    Seq(Seq((ts(10000000), 0L)), Seq((ts(10000001), 0L)))

  test("per-window PSI matches the batch arithmetic exactly") {
    val refLens = Seq.tabulate(100)(i => (i % 10) * 50L + 10L) // uniform 0..9
    val ref = histOf(refLens)
    val w0 = Seq(30L, 80L, 130L, 470L, 520L, 520L) // window [T0, T0+1h)
    val w1 = Seq(10L, 10L, 10L, 10L)               // window [T0+1h, T0+2h)
    val out = runMonitor("dm_parity", ref,
      Seq(w0.map(l => (ts(60), l)) ++ w1.map(l => (ts(3660), l))) ++ flush)
    val real = out.filter(_._1 < T0 + 7200 + 1)
    assert(real.length == 2, s"two closed windows: $real")
    assert(real(0)._2 == histOf(w0).toSeq, "window-0 histogram")
    assert(real(1)._2 == histOf(w1).toSeq, "window-1 histogram")
    assert(real(0)._3 == psiRef(histOf(w0), ref), "window-0 PSI")
    assert(real(1)._3 == psiRef(histOf(w1), ref), "window-1 PSI")
    // the concentrated window drifts harder than the spread one
    assert(real(1)._3 > real(0)._3, "concentration raises PSI")
  }

  test("histogram aggregation is mergeable: partitioning cannot change the histogram") {
    import spark.implicits._
    val lens = Seq.tabulate(500)(i => (i * 37 % 600).toLong)
    val hist = udaf(new DriftMonitor.HistogramAggregator(DriftMonitor.NumBuckets))
    def run(parts: Int) = lens.toDF("n_chars").repartition(parts)
      .select(DriftMonitor.lengthBucket(col("n_chars")).as("b"))
      .agg(hist(col("b"))).collect()(0).getSeq[Long](0)
    assert(run(1) == run(8), "1-partition and 8-partition histograms differ")
    assert(run(8) == histOf(lens).toSeq, "histogram matches driver recount")
  }

  test("late rows past the watermark drop; closed windows emit exactly once") {
    val ref = histOf(Seq.tabulate(50)(i => (i % 10) * 50L))
    val out = runMonitor("dm_late", ref, Seq(
      Seq((ts(60), 100L), (ts(120), 100L)),
      // advance the watermark past window 0's close
      Seq((ts(7300), 100L)),
      // this row targets the CLOSED window 0 — must drop, not re-emit
      Seq((ts(90), 400L))) ++ flush)
    val real = out.filter(_._1 < T0 + 10000)
    assert(real.count(_._2.sum == 2L) == 1, s"window 0 emitted once with 2 rows: $real")
    assert(!real.exists(_._2.sum == 3L), "the late row must not re-open window 0")
  }

  test("the batch doc_drift_psi twin and psiMicro agree bit-for-bit on the same histograms") {
    import spark.implicits._
    // reconstruct both snapshot histograms from the registered batch
    // query's own per-bucket rows, then push them through the STREAMING
    // monitor's psiMicro expression — the 'same arithmetic' twin claim,
    // checked end to end rather than via a hand-copied formula
    val batch = SparkEntry.queries("doc_drift_psi")(spark, sfDir).collect()
    val buckets = batch.filter(_.getLong(0) >= 0L).sortBy(_.getLong(0))
    val refHist = buckets.map(_.getLong(1))
    val curHist = buckets.map(_.getLong(2))
    val headline = batch.find(_.getLong(0) == -1L).get.getLong(3)
    val viaMonitor = Seq(Tuple1(curHist.toSeq)).toDF("hist")
      .select(DriftMonitor.psiMicro(col("hist"), refHist).as("psi"))
      .collect()(0).getLong(0)
    assert(viaMonitor == headline,
      s"stream/batch PSI arithmetic diverged: $viaMonitor != $headline")
  }

  test("planted drift raises PSI well above the matched-distribution floor") {
    import spark.implicits._
    // reference drawn from the fixture corpus itself
    val docs = Tables.table(spark, sfDir, "documents")
    val ref = DriftMonitor.referenceHistogram(docs)
    val fixtureLens = docs.select(col("n_chars")).collect().map(_.getLong(0)).toSeq
    // matched window: replay the same corpus → PSI ≈ 0 (smoothing only)
    val matched = psiRef(histOf(fixtureLens), ref)
    // drifted window: every doc 300 chars longer (a new source slipped in)
    val drifted = psiRef(histOf(fixtureLens.map(_ + 300L)), ref)
    assert(matched < 1000L, s"matched replay PSI should be ~0, got $matched")
    assert(drifted > 100000L, s"planted shift must alarm, got $drifted")
    assert(drifted > 100L * math.max(matched, 1L), "drift separates from floor")
  }
}

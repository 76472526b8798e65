package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DiversityGate

/** Streaming ℓ-diversity gate contract: a diverse window releases its
  * exact per-type counts, a uniform window collapses to one suppressed
  * rollup (never leaking its type), every window emits exactly once,
  * late rows drop, the bounded map state is mergeable and
  * cardinality-capped, and the gate decision matches the batch
  * gov_l_diversity rule replayed on the same rows.
  */
class DiversityGateSpec extends SparkSpec {

  private val T0 = 1700000000L
  // hour-window starts are aligned to the epoch hour grid, not to T0
  private val W0 = T0 - (T0 % 3600)
  private def ts(offsetSec: Long) = new Timestamp((T0 + offsetSec) * 1000L)

  private def runGate(name: String, l: Int,
      batches: Seq[Seq[(Timestamp, String)]],
      suppressedGranularity: Long = 1L)
      : Seq[(Long, String, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = DiversityGate.releasePerWindow(
      input.toDS().toDF("ts", "event_type"), l,
      windowDuration = "1 hour", watermarkDelay = "0 seconds",
      suppressedGranularity = suppressedGranularity)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select(unix_timestamp(col("w_start")), col("event_type"),
        col("n"), col("l_div"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  private def flush: Seq[Seq[(Timestamp, String)]] =
    Seq(Seq((ts(10000000), "x")), Seq((ts(10000001), "x")))

  test("diverse windows release exact counts; uniform windows suppress") {
    // window 0: 3 types (diverse at l=3); window 1: 1 type × 5 rows
    val w0 = Seq("signup", "signup", "purchase", "click")
    val w1 = Seq.fill(5)("purchase")
    val out = runGate("dg_basic", 3,
      Seq(w0.map(t => (ts(60), t)) ++ w1.map(t => (ts(3660), t))) ++ flush)
    val real = out.filter(_._1 <= W0 + 3600)
    val released = real.filter(_._1 == W0)
    assert(released.toSet === Set(
      (W0, "click", 1L, 3L), (W0, "purchase", 1L, 3L),
      (W0, "signup", 2L, 3L)), s"window-0 release: $released")
    val suppressed = real.filter(_._1 == W0 + 3600)
    // the rollup must not leak WHICH type dominated the window
    assert(suppressed === Seq((W0 + 3600, "__suppressed__", 5L, 0L)),
      s"window-1 rollup: $suppressed")
    // batch gov_l_diversity rule replayed on the same rows: released
    // iff distinct >= l, counts exhaustive either way
    assert(w0.distinct.size >= 3 && w1.distinct.size < 3)
    assert(released.map(_._3).sum == w0.size && suppressed.head._3 == w1.size)
  }

  test("emit-once on watermark close; late rows drop") {
    val out = runGate("dg_once", 2, Seq(
      Seq((ts(60), "a"), (ts(120), "b")),
      // this batch ADVANCES the watermark past window 0's end (the
      // watermark lags one batch: it updates after the batch commits)
      Seq((ts(7260), "a")),
      // now genuinely LATE: the current watermark already passed W0
      Seq((ts(30), "c")),
      Seq((ts(10000000), "x")), Seq((ts(10000001), "x"))))
    val w0 = out.filter(_._1 == W0)
    // the late "c" did not re-open or mutate the released window
    assert(w0.toSet === Set((W0, "a", 1L, 2L), (W0, "b", 1L, 2L)),
      s"window-0: $w0")
    assert(out.count(_._1 == W0) == 2, "window 0 emitted exactly once")
    assert(!out.exists(_._2 == "c"), "the late row must not surface anywhere")
  }

  test("the bounded map is mergeable and caps hostile cardinality") {
    val agg = new DiversityGate.TypeCountsAggregator
    // reduce 100 distinct keys: 64 tracked + the rest folded into
    // __other__, totals preserved
    val b = (0 until 100).foldLeft(agg.zero)((acc, i) => agg.reduce(acc, s"t$i"))
    assert(b.size <= DiversityGate.MaxTracked + 1)
    assert(b.values.sum == 100L, "totals survive the fold")
    assert(b.contains(DiversityGate.OtherKey))
    // merge is order-insensitive on disjoint under-cap halves
    val x = (0 until 10).foldLeft(agg.zero)((acc, i) => agg.reduce(acc, s"a$i"))
    val y = (0 until 10).foldLeft(agg.zero)((acc, i) => agg.reduce(acc, s"b$i"))
    val m1 = agg.merge(x, y)
    val m2 = agg.merge(y, x)
    assert(m1 === m2 && m1.size == 20 && m1.values.sum == 20L)
    // a capped state still proves distinct >= MaxTracked >= l: the gate
    // releases (l_div counts the map keys, >= 64 > any sane l)
    assert(b.size.toLong >= DiversityGate.MaxTracked.toLong)
    // null sensitive values fold into __other__, never NPE
    val n = agg.reduce(agg.zero, null)
    assert(n === Map(DiversityGate.OtherKey -> 1L))
  }

  test("past the cap, the fold is DETERMINISTIC: any order, any merge tree, same map") {
    val agg = new DiversityGate.TypeCountsAggregator
    // 200 distinct keys (> MaxTracked), with repeats so counts matter
    val keys = (0 until 200).map(i => f"k$i%03d")
    val multiset = keys ++ keys.take(80) ++ keys.drop(150)
    val o1 = multiset.foldLeft(agg.zero)(agg.reduce)
    val o2 = multiset.reverse.foldLeft(agg.zero)(agg.reduce)
    val o3 = new scala.util.Random(42).shuffle(multiset)
      .foldLeft(agg.zero)(agg.reduce)
    // arbitrary merge trees over arbitrary partials
    val parts = multiset.grouped(37)
      .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val o4 = parts.reduce(agg.merge)
    val o5 = parts.reverse.reduce(agg.merge)
    assert(o1 === o2 && o1 === o3 && o1 === o4 && o1 === o5,
      "emitted counts must be a pure function of the input multiset")
    // the tracked set is exactly the MaxTracked lexicographically-
    // smallest keys, each with its EXACT count; the rest fold to other
    val tracked = o1 - DiversityGate.OtherKey
    assert(tracked.keySet ===
      keys.sorted.take(DiversityGate.MaxTracked).toSet)
    tracked.foreach { case (k, c) =>
      assert(c == multiset.count(_ == k), s"count of $k") }
    assert(o1.values.sum == multiset.size.toLong, "totals preserved")
  }

  test("property: the fold is multiset-pure for ARBITRARY multisets and merge trees") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val agg = new DiversityGate.TypeCountsAggregator
    // keys drawn from a 100-symbol alphabet (> MaxTracked so eviction
    // fires), multisets up to 400 draws, random partition cut points
    val keyGen = Gen.choose(0, 99).map(i => f"k$i%03d")
    val msGen = Gen.choose(1, 400)
      .flatMap(n => Gen.listOfN(n, keyGen))
    val cutsGen = Gen.choose(1, 12)
    val prop = Prop.forAll(msGen, cutsGen, Gen.long) { (ms, nCuts, seed) =>
      val direct = ms.foldLeft(agg.zero)(agg.reduce)
      val shuffledMs = new scala.util.Random(seed).shuffle(ms)
      val shuffled = shuffledMs.foldLeft(agg.zero)(agg.reduce)
      val parts = shuffledMs.grouped(math.max(1, ms.size / nCuts))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = parts.reduce(agg.merge)
      val mergedRev = parts.reverse.reduce(agg.merge)
      // exactness of the tracked set: the MaxTracked smallest distinct
      // keys carry their exact multiplicities, totals always preserved
      val distinct = ms.distinct.sorted
      val tracked = direct - DiversityGate.OtherKey
      direct == shuffled && direct == merged && direct == mergedRev &&
        direct.values.sum == ms.size.toLong &&
        tracked.keySet == distinct.take(DiversityGate.MaxTracked).toSet &&
        tracked.forall { case (k, n) => n == ms.count(_ == k).toLong }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }

  test("suppressedGranularity coarsens the rollup total (exact ceil)") {
    // one uniform window of 5 rows, granularity 100 → rollup reads 100
    val out = runGate("dg_coarse", 2,
      Seq(Seq.fill(5)((ts(60), "purchase"))) ++ flush,
      suppressedGranularity = 100L)
    val roll = out.filter(t => t._1 == W0 && t._2 == "__suppressed__")
    assert(roll === Seq((W0, "__suppressed__", 100L, 0L)),
      s"coarsened rollup: $roll")
  }

  test("reserved sentinel input keys are rejected, not aliased") {
    import spark.implicits._
    // the guard is a plain column expression, so the contract is
    // provable in batch: normal keys pass through untouched…
    val ok = Seq("click", "view", "_other_", "__suppressed").toDF("k")
      .select(DiversityGate.rejectReserved(col("k")))
      .collect().map(_.getString(0)).toSeq
    assert(ok === Seq("click", "view", "_other_", "__suppressed"))
    // …and an input key colliding with the reserved namespace fails the
    // job loudly instead of (a) releasing a row that aliases the rollup
    // sentinel or (b) silently merging into the overflow fold
    Seq(DiversityGate.SuppressedKey, DiversityGate.OtherKey).foreach { bad =>
      val e = intercept[Exception] {
        Seq("click", bad).toDF("k")
          .select(DiversityGate.rejectReserved(col("k"))).collect()
      }
      val msgs = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
      assert(msgs.contains("reserved gate sentinel"), s"$bad → $msgs")
    }
  }

  test("the batch audit and the live pipeline share ONE ℓ default") {
    // gov_l_diversity's oracle SQL hardcodes 3 — a constant change must
    // break HERE, not as a silent oracle mismatch
    assert(DiversityGate.DefaultL === 3)
    // GovernancePipeline.run's lDiversity default (7th parameter) is
    // the same constant — the config-drift trap the r11 verdict flagged
    val dflt = graft.streaming.GovernancePipeline.getClass
      .getMethod("run$default$7").invoke(graft.streaming.GovernancePipeline)
    assert(dflt === DiversityGate.DefaultL)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalOverlap

/** [[graft.operators.IntervalOverlap]] — pair emission correctness vs a
  * brute-force all-pairs reference, the reporting-bucket dedup, and the
  * r15 occupancy guard (verdict-r14 #6: the emitter's d²/2-per-hot-key
  * bound made LOUD, the banded-pairs-family convention).
  */
class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._

  // 3 types × staggered starts, spans 0–200 min → intervals cross hour
  // buckets and overlap within type; deterministic
  private lazy val iv = (1L to 90L)
    .map { i =>
      val typ = s"t${i % 3}"
      val start = java.sql.Timestamp.valueOf(
        f"2024-03-01 ${(i % 7) + 2}%02d:${(i * 11 % 60)}%02d:00")
      val te = new java.sql.Timestamp(
        start.getTime + (i * 37 % 200) * 60000L)
      (i, typ, start, te)
    }
    .toDF("event_id", "event_type", "ts", "te")

  test("overlapPairs matches brute-force all-pairs with the minute floor") {
    val rows = iv.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3)))
    val ref = (for {
      (a, ta, as_, ae) <- rows; (b, tb, bs, be) <- rows
      if a < b && ta == tb && !as_.after(be) && !bs.after(ae)
      ov = (math.min(ae.getTime, be.getTime) -
        math.max(as_.getTime, bs.getTime)) / 60000L
      if ov >= 30L
    } yield (ta, a, b, ov)).toSet
    assert(ref.nonEmpty, "fixture should contain overlapping pairs")
    val got = IntervalOverlap.overlapPairs(iv, "event_type", "event_id",
        "ts", "te", minOverlapMinutes = 30L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reporting-bucket dedup: every pair exactly ONCE, no distinct needed
    assert(got.length === got.toSet.size, "pair emitted more than once")
    assert(got.toSet === ref)
  }

  test("overlapPairs refuses a hot bucket past maxBucketOccupancy") {
    // 50 same-type intervals all inside ONE hour bucket: occupancy 50 >
    // the bound of 20 — the counted probe must throw with the
    // remediation dials, never run the d²/2 emission
    val hot = (1L to 50L)
      .map(i => (i, "hot",
        java.sql.Timestamp.valueOf(f"2024-03-01 05:${i % 59}%02d:00"),
        java.sql.Timestamp.valueOf(f"2024-03-01 05:${(i % 59) + 1}%02d:00")))
      .toDF("event_id", "event_type", "ts", "te")
    val e = intercept[IllegalStateException] {
      IntervalOverlap.overlapPairs(hot, "event_type", "event_id",
        "ts", "te", minOverlapMinutes = 0L, maxBucketOccupancy = 20L).count()
    }
    assert(e.getMessage.contains("maxBucketOccupancy"))
    assert(e.getMessage.contains("minOverlapMinutes"))
    // the same corpus within the bound runs fine
    assert(IntervalOverlap.overlapPairs(hot, "event_type", "event_id",
      "ts", "te", minOverlapMinutes = 0L, maxBucketOccupancy = 50L)
      .count() > 0L)
  }
}

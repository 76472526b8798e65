package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalOverlap

/** [[graft.operators.IntervalOverlap]] — pair emission correctness vs a
  * brute-force all-pairs reference, the reporting-bucket dedup, the r17
  * automatic hot-bucket triangle sharding (verdict-r16 #2: a planted
  * occupancy breach must now SUCCEED through sharding with a pair set
  * provably identical to the unsharded form), and the output-size
  * refusal past maxShardFactor.
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

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private lazy val bruteForce: Set[(String, Long, Long, Long)] = {
    val rows = iv.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3)))
    (for {
      (a, ta, as_, ae) <- rows; (b, tb, bs, be) <- rows
      if a < b && ta == tb && !as_.after(be) && !bs.after(ae)
      ov = (math.min(ae.getTime, be.getTime) -
        math.max(as_.getTime, bs.getTime)) / 60000L
      if ov >= 30L
    } yield (ta, a, b, ov)).toSet
  }

  test("overlapPairs matches brute-force all-pairs with the minute floor") {
    assert(bruteForce.nonEmpty, "fixture should contain overlapping pairs")
    val got = collectPairs(IntervalOverlap.overlapPairs(iv, "event_type",
      "event_id", "ts", "te", minOverlapMinutes = 30L))
    // reporting-bucket dedup: every pair exactly ONCE, no distinct needed
    assert(got.length === got.toSet.size, "pair emitted more than once")
    assert(got.toSet === bruteForce)
  }

  test("hot-bucket shard path emits the identical pair set") {
    // maxBucketOccupancy=3 forces EVERY populated (type, bucket) key
    // through triangle sharding (fixture occupancies run well past 3,
    // s up to ~ceil(d/3)); the pair set must be bit-identical to both
    // the unsharded plan and the brute-force reference — sharding
    // re-partitions the comparison space, it must never change it
    val sharded = collectPairs(IntervalOverlap.overlapPairs(iv, "event_type",
      "event_id", "ts", "te", minOverlapMinutes = 30L,
      maxBucketOccupancy = 3L))
    assert(sharded.length === sharded.toSet.size,
      "shard path emitted a pair more than once")
    assert(sharded.toSet === bruteForce)
  }

  test("planted occupancy breach succeeds through sharding (r17)") {
    // 50 same-type intervals all inside ONE hour bucket: occupancy 50 >
    // the bound of 20 — pre-r17 this REFUSED; now it shards (s = 3)
    // and the emission must match the generously-bounded unsharded run
    val hot = (1L to 50L)
      .map(i => (i, "hot",
        java.sql.Timestamp.valueOf(f"2024-03-01 05:${i % 59}%02d:00"),
        java.sql.Timestamp.valueOf(f"2024-03-01 05:${(i % 59) + 1}%02d:00")))
      .toDF("event_id", "event_type", "ts", "te")
    val unsharded = collectPairs(IntervalOverlap.overlapPairs(hot,
      "event_type", "event_id", "ts", "te", minOverlapMinutes = 0L,
      maxBucketOccupancy = 50L))
    assert(unsharded.nonEmpty)
    val sharded = collectPairs(IntervalOverlap.overlapPairs(hot,
      "event_type", "event_id", "ts", "te", minOverlapMinutes = 0L,
      maxBucketOccupancy = 20L))
    assert(sharded.length === sharded.toSet.size)
    assert(sharded.toSet === unsharded.toSet)
  }

  test("refuses past maxBucketOccupancy x maxShardFactor — output-size bound") {
    // occupancy 50 > 2 x 3: at this density (relative to the declared
    // bounds) the d²/2 OUTPUT is the problem — sharding must not mask it
    val hot = (1L to 50L)
      .map(i => (i, "hot",
        java.sql.Timestamp.valueOf(f"2024-03-01 05:${i % 59}%02d:00"),
        java.sql.Timestamp.valueOf(f"2024-03-01 05:${(i % 59) + 1}%02d:00")))
      .toDF("event_id", "event_type", "ts", "te")
    val e = intercept[IllegalStateException] {
      IntervalOverlap.overlapPairs(hot, "event_type", "event_id",
        "ts", "te", minOverlapMinutes = 0L, maxBucketOccupancy = 2L,
        maxShardFactor = 3).count()
    }
    assert(e.getMessage.contains("maxBucketOccupancy"))
    assert(e.getMessage.contains("minOverlapMinutes"))
  }
}

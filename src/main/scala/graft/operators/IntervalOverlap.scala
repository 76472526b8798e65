package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap PAIR EMISSION via time-bucket blocking — the temporal
  * analog of the dedup postings index: when the pairs themselves ARE the
  * output (session stitching, co-occurrence edges), enumeration is the job
  * and output-linear cost is the floor. Every interval EXPLODES into the
  * hour buckets it spans and pairs equi-join on (event_type, bucket) — a
  * plain hash shuffle, no theta join. Multi-bucket double-counting is
  * eliminated WITHOUT a pair-level distinct (a second full shuffle of the
  * pair set): a pair is emitted only from its REPORTING bucket — the one
  * holding the later of the two starts, which both intervals provably
  * span.
  *
  * The counting twin (`join_interval`) is sweep-line — O(n log n), no
  * pair ever materialized — and is the instrument to SIZE an emission
  * with before running it; this operator always ships with the
  * `minOverlapMinutes` selectivity dial for the same reason.
  *
  * Hot-bucket handling (r15 guard → r17 automatic remediation): a hot
  * (event_type, bucket) key holding d interval incidences emits ~d²/2
  * candidate comparisons on one reducer — quadratic in LOCAL density even
  * when the corpus is fine globally. The per-key occupancy is COUNTED
  * before the join (one narrow aggregation over the lazily checkpointed
  * bucket frame, which the two join sides then reuse):
  *
  *  - every key within `maxBucketOccupancy` → the plain (type, bucket)
  *    equi-join, zero overhead (the common path, unchanged since r14);
  *  - a key past the bound → TRIANGLE SHARDING (the salted-join pattern
  *    of [[Skew]], adapted to self-pairing): items in a hot key hash into
  *    s = ceil(d / maxBucketOccupancy) sub-shards, and the pair space
  *    tiles into the s(s+1)/2 unordered shard CELLS (i ≤ j). The a-side
  *    replicates each item with shard g to cells (g, j) for j ≥ g, the
  *    b-side to cells (i, g) for i ≤ g, and the join runs on (type,
  *    bucket, cell_i, cell_j) — so a cross-shard pair meets in exactly
  *    one cell (min-shard item on the a-side), a same-shard pair meets
  *    in its diagonal cell both ways (deduped by id order), and NO pair
  *    is ever compared twice or missed. Per-reducer comparisons drop to
  *    ~(d/s)² ≤ maxBucketOccupancy² while total work stays the same —
  *    sharding parallelizes the d²/2 emission, it cannot shrink output.
  *    Cold keys ride the same plan with s = 1 (single (0,0) cell — the
  *    plain join in disguise), paying one broadcast join against the
  *    (typically tiny) hot-key frame instead of a refusal.
  *  - past `maxBucketOccupancy · maxShardFactor` incidences the job still
  *    REFUSES loudly: at that density the d²/2 OUTPUT itself (not its
  *    distribution) is the problem, and the remediation dials are in the
  *    message (raise the overlap floor and size with the sweep-line count
  *    first, shorten the bucket, or raise the bounds if the quadratic
  *    emission is genuinely the declared job).
  *
  * The default bound of 10 000 caps any one reducer at ~5·10⁷ comparisons
  * — minutes of one core — and clears every measured fixture decade
  * (occupancy 13 at sf0.01 → 76 at sf0.1, ~10×/decade on the fixed-span
  * fixture); with the default factor 64 the automatic shard path carries
  * the operator to 640 000 incidences per bucket (s ≤ 64, ≈2 080 cells)
  * before the refusal fires.
  */
object IntervalOverlap {

  /** Max interval incidences per (type, hour-bucket) key before
    * [[overlapPairs]] switches from the plain equi-join to triangle
    * sharding: ~d²/2 per-reducer comparisons at the bound ≈ 5·10⁷, the
    * same order as one AQE-split shuffle partition's work.
    */
  val MaxBucketOccupancy: Long = 10000L

  /** Max shard count per hot key (and thus max occupancy multiple the
    * automatic path accepts) before [[overlapPairs]] refuses outright:
    * past s = 64 the emission is ~2·10¹¹ pairs per key — an output-size
    * problem no re-partitioning fixes.
    */
  val MaxShardFactor: Int = 64

  /** Overlapping pairs of closed intervals `[tsCol, teCol]` within each
    * `typeCol` group, overlapping by at least `minOverlapMinutes` —
    * returns (event_type, a_id, b_id, ov_minutes) with a_id < b_id,
    * unordered. See the object scaladoc for the shape, the hot-bucket
    * shard path, and the output-size refusal.
    *
    * NOTE the occupancy probe is an EAGER aggregation at construction
    * time (the counted-probe convention): callers get a checked plan,
    * not a purely lazy one.
    */
  def overlapPairs(iv: DataFrame, typeCol: String, idCol: String,
      tsCol: String, teCol: String, minOverlapMinutes: Long,
      maxBucketOccupancy: Long = MaxBucketOccupancy,
      maxShardFactor: Int = MaxShardFactor): DataFrame = {
    require(maxBucketOccupancy >= 1, "maxBucketOccupancy must be >= 1")
    require(maxShardFactor >= 1, "maxShardFactor must be >= 1")
    val bucketed = iv
      .select(col(typeCol).as("event_type"), col(idCol).as("event_id"),
        col(tsCol).as("ts"), col(teCol).as("te"))
      .select(col("event_type"), col("event_id"), col("ts"), col("te"),
        explode(expr(
          "sequence(date_trunc('hour', ts), date_trunc('hour', te), interval 1 hour)"))
          .as("bk"))
      .localCheckpoint(eager = false)
    // occ stays LAZY: the common (no-hot-key) path reads it exactly once
    // — through the take-ordered probe below — so a checkpoint would add
    // a whole materialization job to every healthy run; the rare shard
    // path re-derives the hot frame from the checkpointed bucket frame,
    // one cheap re-aggregation
    val occ = bucketed.groupBy("event_type", "bk")
      .agg(count(lit(1)).as("d"))
      .filter(col("d") > maxBucketOccupancy)
    val worst = occ.orderBy(col("d").desc).limit(1).collect()
    if (worst.nonEmpty &&
        worst.head.getLong(2) > maxBucketOccupancy * maxShardFactor.toLong) {
      val r = worst.head
      throw new IllegalStateException(
        s"overlapPairs: bucket (${r.get(0)}, ${r.get(1)}) holds ${r.getLong(2)} " +
          s"intervals > maxBucketOccupancy=$maxBucketOccupancy x " +
          s"maxShardFactor=$maxShardFactor — the ~d²/2 pair OUTPUT itself is " +
          "the problem at this density, not its distribution; sharding " +
          "cannot shrink it. Raise minOverlapMinutes (and size with the " +
          "sweep-line count first), use a finer bucket, or raise the bounds " +
          "if the quadratic emission is genuinely the declared job.")
    }
    val (a, b) =
      if (worst.isEmpty) {
        // common path: every key within the bound — the plain equi-join,
        // no shard columns, no extra join (identical to the pre-r17 plan)
        (bucketed.select(col("event_type"), col("bk"),
            col("event_id").as("a_id"), col("ts").as("a_ts"), col("te").as("a_te"))
            .withColumn("ci", lit(0)).withColumn("cj", lit(0)),
          bucketed.select(col("event_type"), col("bk"),
            col("event_id").as("b_id"), col("ts").as("b_ts"), col("te").as("b_te"))
            .withColumn("ci", lit(0)).withColumn("cj", lit(0)))
      } else {
        // shard path: broadcast the (small) hot-key frame, give every row
        // its key's shard count s (1 for cold keys) and a deterministic
        // shard g = hash(id) mod s, then tile the pair space into the
        // unordered shard cells (ci <= cj)
        val hot = occ.select(col("event_type"), col("bk"),
          ceil(col("d").cast("double") / maxBucketOccupancy)
            .cast("int").as("s"))
        val framed = bucketed
          .join(broadcast(hot), Seq("event_type", "bk"), "left")
          .withColumn("s", coalesce(col("s"), lit(1)))
          .withColumn("g", pmod(xxhash64(col("event_id")), col("s").cast("long"))
            .cast("int"))
        (framed.select(col("event_type"), col("bk"),
            col("event_id").as("a_id"), col("ts").as("a_ts"), col("te").as("a_te"),
            col("g").as("ci"),
            explode(sequence(col("g"), col("s") - 1)).as("cj")),
          framed.select(col("event_type"), col("bk"),
            col("event_id").as("b_id"), col("ts").as("b_ts"), col("te").as("b_te"),
            explode(sequence(lit(0), col("g"))).as("ci"),
            col("g").as("cj")))
      }
    a.join(b, Seq("event_type", "bk", "ci", "cj"))
      // diagonal cells hold a pair in both orders — id order dedups, as in
      // the unsharded join; an off-diagonal cell holds each pair exactly
      // once (min-shard item on the a-side), in arbitrary id order
      .filter((col("ci") === col("cj") && col("a_id") < col("b_id")) ||
        col("ci") =!= col("cj"))
      .filter(col("a_ts") <= col("b_te") && col("b_ts") <= col("a_te") &&
        date_trunc("hour", greatest(col("a_ts"), col("b_ts"))) === col("bk"))
      .select(col("event_type"),
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        (unix_timestamp(least(col("a_te"), col("b_te"))) -
          unix_timestamp(greatest(col("a_ts"), col("b_ts"))))
          .divide(lit(60L)).cast("long").as("ov_minutes"))
      .filter(col("ov_minutes") >= minOverlapMinutes)
  }
}

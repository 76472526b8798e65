package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-leg instrument for [[graft.operators.IntervalOverlap]]
  * (verdict-r15 #5): measures, for a fixture directory,
  *
  *  - the per-(event_type, hour-bucket) OCCUPANCY distribution (max +
  *    key count + Σ d·(d−1)/2 — the exact number of candidate
  *    comparisons the bucketed equi-join will do, i.e. the cost model
  *    the `maxBucketOccupancy` guard bounds per-reducer), and
  *  - the actual emission wall time + emitted pair count of
  *    `overlapPairs` at the declared `join_interval_pairs` config
  *    (minOverlapMinutes = 60, forced through a noop sink so the full
  *    plan executes — the Bench convention),
  *
  * printed as one JSON line (the BASELINE.md record shape). The probe
  * exists because the guard's default (10 000) was derived from two
  * measured fixture decades (occupancy 13 → 76); real sf1/sf10 legs
  * either confirm the ~10×/decade growth model that predicts a trip
  * near sf100, or re-derive it. Knobs: SPARK_GRAFT_IV_EMIT=false skips
  * the emission leg (occupancy stats alone are cheap at any scale),
  * SPARK_GRAFT_IV_MINOV / SPARK_GRAFT_IV_MAXOCC override the dials.
  */
object IntervalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runEmit = sys.env.getOrElse("SPARK_GRAFT_IV_EMIT", "true").toBoolean
    val minOv = sys.env.getOrElse("SPARK_GRAFT_IV_MINOV", "60").toLong
    val maxOcc = sys.env.getOrElse("SPARK_GRAFT_IV_MAXOCC",
      graft.operators.IntervalOverlap.MaxBucketOccupancy.toString).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the declared join_interval_pairs interval frame, verbatim
    // (queries/ExtendedQueries.scala): te = ts + floor(value) minutes
    val iv = Tables.table(spark, sfDir, "events").select(
      col("event_id"), col("event_type"), col("ts"),
      expr("timestampadd(MINUTE, CAST(floor(value) AS INT), ts)").as("te"))

    val occ = iv.select(col("event_type"),
        explode(expr(
          "sequence(date_trunc('hour', ts), date_trunc('hour', te), interval 1 hour)"))
          .as("bk"))
      .groupBy("event_type", "bk").agg(count(lit(1)).as("d"))
    val st = occ.agg(
      max("d").as("max_occ"),
      count(lit(1)).as("n_keys"),
      sum(col("d") * (col("d") - 1) / 2).as("comparisons"),
      sum("d").as("incidences")).head()
    val (maxOccMeasured, nKeys, cmp, inc) =
      (st.getLong(0), st.getLong(1), st.getDouble(2).toLong, st.getLong(3))

    val (emitSec, nPairs) = if (runEmit) {
      val t0 = System.nanoTime()
      val pairs = graft.operators.IntervalOverlap.overlapPairs(iv,
        "event_type", "event_id", "ts", "te",
        minOverlapMinutes = minOv, maxBucketOccupancy = maxOcc)
      pairs.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // count on a SECOND pass (the emission timing above is pure)
      (sec, pairs.agg(count(lit(1))).head().getLong(0))
    } else (-1.0, -1L)

    println(s"""{"metric":"interval_overlap_probe","sf":"$sfDir","max_occupancy":$maxOccMeasured,"bucket_keys":$nKeys,"incidences":$inc,"candidate_comparisons":$cmp,"min_overlap_minutes":$minOv,"emit_sec":$emitSec,"pairs":$nPairs,"guard":$maxOcc}""")
    spark.stop()
  }
}

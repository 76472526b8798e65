package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact weighted quantiles at cluster scale.
  *
  * The textbook formulation (one cumulative-weight window per group, as the
  * declared `agg_weighted_median` query runs) sorts EVERY group in full — fine
  * when group cardinality ≥ cores, but a 3-group × 100 TB corpus funnels the
  * whole table through 3 sort tasks. This operator is the scalable exact
  * variant for that regime:
  *
  *   pass A  per-group (min, max, total weight) — one partial agg;
  *   pass B  per-group weight HISTOGRAM over `buckets` value buckets — a
  *           second partial agg whose shuffle carries ≤ groups×buckets rows;
  *           the quantile's cut bucket and the weight prefix before it come
  *           from a window over that compact histogram;
  *   pass C  sort ONLY the cut bucket's rows (expected n/buckets of the
  *           group) and take the first row whose prefixed running weight
  *           reaches q·total.
  *
  * Three scans instead of one, but no full sort anywhere — scans parallelize,
  * group-local sorts don't. Equal values always land in the same bucket
  * (bucketization is a deterministic monotone function of the value and the
  * group bounds), so the result is tiebreak-free: the first qualifying row's
  * value is the unique lower weighted quantile regardless of how equal values
  * order within the cut bucket. WeightedQuantileSpec proves bit-equality with
  * the windowed formulation.
  *
  * All small frames (bounds, cut buckets, prefixes — one row per group)
  * broadcast; designed for group cardinality ≪ corpus, the exact regime where
  * the windowed form breaks down.
  */
object WeightedQuantile {

  /** Lower weighted q-quantile of `valueCol` under `weightCol` per
    * `groupCol`: the smallest value v with cumWeight(≤ v) ≥ q·totalWeight.
    * Output: (groupCol, w_quantile, total_weight).
    */
  def weightedQuantile(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      q: Double = 0.5,
      buckets: Int = 1024): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val w = col(weightCol)

    // pass A: group bounds + totals (tiny: one row per group)
    val bounds = df.groupBy(g).agg(
      min(v).as("mn"), max(v).as("mx"), sum(w).as("totw"))

    // deterministic monotone bucketization; mx row clamps into the last
    // bucket, a degenerate (single-value) group collapses into bucket 0
    def bucketOf(value: Column): Column = least(
      lit(buckets - 1),
      floor((value - col("mn")) * buckets /
        when(col("mx") > col("mn"), col("mx") - col("mn")).otherwise(lit(1)))
        .cast("int"))

    val bucketed = df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("bkt", bucketOf(v))

    // pass B: the compact histogram; cut bucket + prefix from ≤ buckets rows
    val hist = bucketed.groupBy(g, col("bkt")).agg(sum(w).as("hw"))
    val byBkt = Window.partitionBy(g).orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = hist
      .join(broadcast(bounds.select(g, col("totw"))), Seq(groupCol))
      .withColumn("cum", sum("hw").over(byBkt))
    val cut = scanned.filter(col("cum") >= col("totw") * q)
      .groupBy(g).agg(min("bkt").as("cutbkt"))
    val prefix = scanned.join(broadcast(cut), Seq(groupCol))
      .filter(col("bkt") < col("cutbkt"))
      .groupBy(g).agg(sum("hw").as("prew"))

    // pass C: sort only the cut bucket; value order suffices (see Scaladoc)
    val run = Window.partitionBy(g).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(cut), Seq(groupCol))
      .filter(col("bkt") === col("cutbkt"))
      .join(broadcast(prefix), Seq(groupCol), "left")
      .withColumn("cum", sum(w).over(run) + coalesce(col("prew"), lit(0d)))
      .filter(col("cum") >= col("totw") * q)
      .groupBy(g).agg(
        min(v).as("w_quantile"),
        max(col("totw")).as("total_weight"))
  }

  /** The textbook one-window formulation — the ≥-cores-groups regime's
    * shape and the spec's equality reference.
    */
  def weightedQuantileWindowed(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      q: Double = 0.5,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val g = col(groupCol)
    val order = col(valueCol) +: tieBreak.map(col)
    val run = Window.partitionBy(g).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(weightCol).over(run))
      .withColumn("totw", sum(weightCol).over(Window.partitionBy(g)))
      .filter(col("cum") >= col("totw") * q)
      .groupBy(g).agg(
        min(valueCol).as("w_quantile"),
        max(col("totw")).as("total_weight"))
  }
}

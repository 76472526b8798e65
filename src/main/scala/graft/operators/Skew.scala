package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities — the manual counterpart to AQE's runtime
  * skew-join splitting, for when a hot grouping key would overload one
  * reducer at 100 TB (one celebrity user, one dominant topic).
  *
  * Two-stage salted aggregation: rows get a deterministic salt from a
  * *secondary* column's hash, the first aggregation fans the hot key out
  * over `buckets` reducers, the second collapses the partials. Only
  * algebraic aggregates (sum/count/min/max — things with a merge step)
  * can be salted this way; the API takes the partial and final exprs
  * separately to make that contract explicit.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from `saltSource` (NOT the
    * group key — salting by the key itself would change nothing).
    */
  def salt(saltSource: Column, buckets: Int): Column =
    pmod(xxhash64(saltSource), lit(buckets.toLong)).cast("int")

  /** Two-stage salted aggregation:
    * stage 1 groups by (key, salt) — the hot key spreads over `buckets`
    * reducers; stage 2 groups by key and merges the partials.
    *
    * `partials`: aggregates for stage 1 (must be algebraic);
    * `finals`: how to merge each partial column in stage 2, by name.
    */
  def saltedAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      saltSource: Column,
      buckets: Int,
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", salt(saltSource, buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    stage1
      .groupBy(keyCols.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}

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

  /** Skew-mitigated equi-join: fact rows salt into `buckets` sub-keys
    * (derived from `saltSource`, a column unique-ish per row), the dim
    * side REPLICATES once per salt value, and the join runs on
    * (key, salt) — a hot fact key spreads over `buckets` reducers
    * instead of melting one. Semantically identical to
    * `fact.join(dim, factKey === dimKey)` (proven by the oracled query);
    * cost = `buckets`× replication of the dim side, so reserve it for
    * genuinely hot keys — or use AQE's runtime skew split when sizes are
    * only discovered at execution. Both input key columns survive in the
    * output, like the plain join they replace.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltSource: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(saltSource, buckets))
    val repDim = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedFact
      .join(repDim, saltedFact(factKey) === repDim(dimKey)
        && saltedFact("__salt") === repDim("__salt"))
      .drop("__salt")
  }
}

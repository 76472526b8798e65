package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the standard shuffle-reduction for a
  * selective dim⋈fact join at scale: build a Bloom filter over the dim
  * side's keys (one aggregation over the SMALL side), broadcast it, and
  * drop fact rows that cannot match BEFORE the join shuffle. No false
  * negatives ⇒ the join result is bit-identical to the plain join (the
  * oracled query proves it); false positives only cost shuffled rows
  * that the join then discards — at fpp=1% a 100 TB fact side sheds
  * ~99% of its non-matching bytes before the exchange.
  *
  * This is the manual, explicit form of Spark's runtime bloom-filter
  * injection (`spark.sql.optimizer.runtime.bloomFilter.enabled`); owning
  * the build lets a pipeline reuse one filter across many joins and size
  * it from known dim cardinality instead of runtime estimates.
  */
object BloomPrune {

  /** `fact ⋈ dim` with the fact side pre-filtered through a Bloom filter
    * of `dim`'s join keys. Integer-keyed (the common surrogate-key
    * case); the UDF probe is off the codegen path but runs BEFORE the
    * shuffle, which is the trade that wins at scale.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    fact
      .filter(col(factKey).isNotNull && mightContain(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}

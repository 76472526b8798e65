package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.glue
import org.apache.spark.sql.types.BinaryType

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
    * case). The probe is Spark's own native
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * — the codegen'd expression runtime row-level filtering injects — fed
    * the serialized filter as a foldable binary literal, so the hot
    * pre-shuffle filter fuses into whole-stage codegen with NO Scala-UDF
    * SerDe boundary (the round-3 UDF probe cost one boxing round trip
    * per fact row). Semantics are identical: `stat.bloomFilter` puts the
    * raw long keys, `mightContainLong` probes them.
    *
    * Size caveat: the serialized filter rides the plan as a foldable
    * binary literal. At the declared `expectedItems=10000`/fpp=1% that is
    * ~12 KB — negligible. The literal form stops being appropriate above
    * ~1 MB (≈10⁶ keys at 1%): AQE re-plans clone the plan, so a 10⁸-key
    * dim (~115 MB filter) would multiply driver memory by the number of
    * re-plans and bloat the task-broadcast. Past that threshold use the
    * form Spark's own runtime injection uses — wrap the build in a
    * `ScalarSubquery` (plan: `bloom_filter_agg(xxhash64(dimKey))` as an
    * uncorrelated subquery feeding `BloomFilterMightContain`'s first
    * argument) so the bytes live once in the subquery result, not in
    * every plan copy; or flip on
    * `spark.sql.optimizer.runtime.bloomFilter.enabled` and let the
    * optimizer inject it when join selectivity estimates warrant.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bytes = { val bos = new ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }
    val mightContain = glue.toColumn(new BloomFilterMightContain(
      Literal(bytes, BinaryType),
      glue.toExpression(col(factKey).cast("long"))))
    fact
      .filter(col(factKey).isNotNull && mightContain)
      .join(dim, col(factKey) === col(dimKey))
  }

  /** The ≥1 MB-regime form documented on [[prunedJoin]]: the Bloom
    * filter is built IN-PLAN — `bloom_filter_agg(xxhash64(dimKey))` as
    * an uncorrelated scalar subquery feeding
    * [[BloomFilterMightContain]] — exactly the shape Spark's own
    * `InjectRuntimeFilter` emits. The filter bytes are produced by
    * executors, live ONCE in the subquery result, and never appear as a
    * plan literal: AQE re-plans clone a subquery REFERENCE, not the
    * bytes, and the driver never materializes the filter at all (the
    * `stat.bloomFilter` build in [[prunedJoin]] is a driver-side
    * collect). Same no-false-negative contract, so the join result is
    * again bit-identical to the plain join.
    *
    * `numBits` defaults to ~10 bits/key (≈1% fpp); both stages hash
    * with `XxHash64`, matching what `BloomFilterAggregate` stores.
    */
  def prunedJoinSubquery(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(glue.toExpression(col(dimKey).cast("long")))),
      Literal(expectedItems), Literal(expectedItems * 10))
    val bloomDf = dim.select(
      glue.toColumn(bloomAgg.toAggregateExpression()).as("bloom"))
    val probe = new BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      new XxHash64(Seq(glue.toExpression(col(factKey).cast("long")))))
    fact
      .filter(col(factKey).isNotNull && glue.toColumn(probe))
      .join(dim, col(factKey) === col(dimKey))
  }
}

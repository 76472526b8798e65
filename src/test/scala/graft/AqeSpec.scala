package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Upgrades the "AQE handles residual skew" narrative from prose to CI:
  * on a synthetic hot-key join, Spark's adaptive OptimizeSkewedJoin must
  * actually split the melted partition at runtime — the complement to
  * [[graft.operators.Skew.saltedJoin]] (manual salting for skew KNOWN at
  * plan time; AQE for skew only DISCOVERED at execution). Thresholds are
  * scaled down so a local fixture exhibits "100 TB skew": one key owning
  * ~90% of the fact side, partition bytes far past the skew threshold.
  */
class AqeSpec extends SparkSpec {

  private val aqeConfs = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // scaled-down skew thresholds: the hot partition (~MBs) must trip
    // the same relative tests a 100 TB hot partition trips in prod
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB",
    // force a sort-merge join — a broadcast join has no skewed shuffle
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](confs: Map[String, String])(body: => A): A = {
    val saved = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a runtime-skewed sort-merge join (OptimizeSkewedJoin fires)") {
    withConfs(aqeConfs) {
      import spark.implicits._
      // 90% of fact rows carry key 0 — the one-celebrity-user shape
      val fact = spark.range(0, 300000)
        .select(when(col("id") < 270000, 0L).otherwise(pmod(col("id"), lit(100L)))
          .as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("k2"),
        (col("id") * 7).as("dim_val"))
      val joined = fact.join(dim, col("k") === col("k2"))
      // execute THIS dataframe's own query execution: AQE finalizes the
      // adaptive plan per-execution, and a separate action (`.count()`
      // compiles a different plan) would leave `joined.queryExecution`
      // un-run, still showing the initial non-split plan
      val n = joined.collect().length
      // parity first: the join result is exactly the unsalted semantics
      assert(n === 300000, s"join lost/duplicated rows: $n")
      // the executed adaptive plan must mark the SMJ as a skew join —
      // proof that the hot partition was split at runtime. Structural
      // check (collect SortMergeJoinExec, assert isSkewJoin) rather than
      // string-matching "skew=true", which is a rendering detail free to
      // change across Spark versions.
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      // allNodes (SparkSpec) descends through the AQE wrappers that
      // plain collect treats as leaves
      val executed = joined.queryExecution.executedPlan
      val smjs = allNodes(executed).collect { case s: SortMergeJoinExec => s }
      assert(smjs.nonEmpty, s"no SortMergeJoin in executed plan:\n$executed")
      assert(smjs.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin did not fire — executed plan:\n$executed")
    }
  }

  test("salted join and AQE skew join agree on the skewed fixture") {
    withConfs(aqeConfs) {
      import spark.implicits._
      val fact = spark.range(0, 50000)
        .select(when(col("id") < 45000, 0L).otherwise(pmod(col("id"), lit(50L)))
          .as("k"), col("id").as("payload"))
      val dim = spark.range(0, 50).select(col("id").as("k2"),
        (col("id") * 7).as("dim_val"))
      val aqe = fact.join(dim, col("k") === col("k2"))
        .agg(count(lit(1)), sum(col("payload") + col("dim_val"))).collect()(0)
      val salted = Skew.saltedJoin(fact, dim, "k", "k2",
          saltSource = col("payload"), buckets = 8)
        .agg(count(lit(1)), sum(col("payload") + col("dim_val"))).collect()(0)
      assert(aqe === salted,
        "manual salting and AQE skew split must compute identical results")
    }
  }
}

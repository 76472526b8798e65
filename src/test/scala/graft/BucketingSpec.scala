package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, Bucketing}

/** Bucketed co-located joins: after a one-time bucketed write, equi-joins
  * on the bucket key must plan with no Exchange on either side — the
  * write-once/never-reshuffle contract.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without any shuffle") {
    val li = Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    // a previous JVM's warehouse dir survives while the in-memory catalog
    // doesn't — drop both the table and any orphaned location first
    Seq("li_bucketed", "o_bucketed").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", numBuckets = 8)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", numBuckets = 8)

    // disable broadcast so the small fixture exercises the sort-merge
    // path a 100 TB fact⋈fact join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark,
        "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)

      // and it computes the same answer as the plain join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bloom pruning drops most non-matching fact rows, result unchanged") {
    val events = Tables.table(spark, sfDir, "events")
    val dim = Tables.table(spark, sfDir, "customer")
      .filter(col("c_custkey") % 15 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    // the filter alone (what actually survives to the shuffle)
    val bloom = dim.stat.bloomFilter("c_custkey", 10000L, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val might = udf((k: Long) => bc.value.mightContainLong(k))
    val surviving = events.filter(might(col("user_id"))).count()
    val total = events.count()
    val matching = events.join(dim, col("user_id") === col("c_custkey")).count()
    // no false negatives: everything that joins survives the filter;
    // fpp=1% ⇒ the filter sheds nearly all true non-matches pre-shuffle
    assert(surviving >= matching)
    assert(surviving - matching <= math.max(10L, (total * 0.05).toLong),
      s"bloom let ${surviving - matching} of ${total - matching} non-matching rows through")
    // and the pruned join is exactly the plain join
    val pruned = BloomPrune.prunedJoin(events, dim, "user_id", "c_custkey",
      10000L, 0.01).count()
    assert(pruned === matching)
  }

  test("in-plan bloom (scalar subquery) matches the plain join; no plan literal") {
    val events = Tables.table(spark, sfDir, "events")
    val dim = Tables.table(spark, sfDir, "customer")
      .filter(col("c_custkey") % 15 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val matching = events.join(dim, col("user_id") === col("c_custkey")).count()
    val joined = BloomPrune.prunedJoinSubquery(events, dim,
      "user_id", "c_custkey", expectedItems = 1000000L)
    assert(joined.count() === matching)
    // the filter must be an in-plan subquery probe, not an embedded
    // literal: might_contain fed by a scalar subquery over
    // bloom_filter_agg, with no BinaryType literal anywhere (the ~1.2 MB
    // filter bytes never enter the plan or touch the driver)
    val p = joined.queryExecution.executedPlan.toString()
    assert(p.contains("might_contain"), p)
    assert(p.toLowerCase.contains("subquery"), p)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val binaryLits = allNodes(joined.queryExecution.executedPlan)
      .flatMap(_.expressions)
      .flatMap(_.collect { case l @ Literal(_, BinaryType) => l })
    assert(binaryLits.isEmpty,
      s"bloom bytes leaked into the plan as ${binaryLits.size} binary literal(s)")
  }
}

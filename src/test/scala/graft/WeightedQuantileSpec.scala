package graft

import org.apache.spark.sql.functions._

import graft.operators.WeightedQuantile

/** The two-pass bucketed weighted quantile must agree exactly with the
  * textbook windowed formulation (integer-valued weights keep every
  * partial sum ieee-exact, so "exactly" means bit-equality here), and
  * its pass-C sort must touch only a fraction of each group.
  */
class WeightedQuantileSpec extends SparkSpec {

  private def li = Tables.table(spark, sfDir, "lineitem")

  test("bucketed median == windowed median on lineitem groups") {
    val a = WeightedQuantile.weightedQuantile(
        li, "l_returnflag", "l_extendedprice", "l_quantity")
      .orderBy("l_returnflag").collect()
    val b = WeightedQuantile.weightedQuantileWindowed(
        li, "l_returnflag", "l_extendedprice", "l_quantity",
        tieBreak = Seq("l_orderkey", "l_linenumber"))
      .orderBy("l_returnflag").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("agreement holds across quantiles and bucket counts (incl. 1 group)") {
    val one = li.withColumn("g", lit("all"))
    for (q <- Seq(0.1, 0.5, 0.9); buckets <- Seq(8, 1024)) {
      val a = WeightedQuantile.weightedQuantile(
          one, "g", "l_extendedprice", "l_quantity", q, buckets)
        .collect()
      val b = WeightedQuantile.weightedQuantileWindowed(
          one, "g", "l_extendedprice", "l_quantity", q)
        .collect()
      assert(a.toSeq === b.toSeq, s"q=$q buckets=$buckets")
    }
  }

  test("degenerate single-value group returns that value") {
    val df = spark.range(1000).selectExpr(
      "'k' AS g", "CAST(42.0 AS DOUBLE) AS v", "CAST(id % 7 + 1 AS DOUBLE) AS w")
    val r = WeightedQuantile.weightedQuantile(df, "g", "v", "w").collect()
    assert(r.length === 1 && r.head.getDouble(1) === 42.0)
  }

  test("pass C sorts only the cut bucket — a small fraction of the group") {
    // count the rows that reach the final window: with 1024 buckets over
    // ~6k lineitem rows per flag, the cut bucket must hold ≪ the group
    val bounds = li.groupBy("l_returnflag").agg(
      min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"),
      sum("l_quantity").as("totw"))
    val bucketed = li.join(broadcast(bounds), Seq("l_returnflag"))
      .withColumn("bkt", least(lit(1023),
        floor((col("l_extendedprice") - col("mn")) * 1024 /
          (col("mx") - col("mn"))).cast("int")))
    val largestBucket = bucketed.groupBy("l_returnflag", "bkt").count()
      .agg(max("count")).collect().head.getLong(0)
    val groupSize = li.groupBy("l_returnflag").count()
      .agg(min("count")).collect().head.getLong(0)
    assert(largestBucket * 20 < groupSize,
      s"largest bucket $largestBucket vs smallest group $groupSize")
  }

  // ---- exactPercentiles: the interpolated (percentile/quantile_cont)
  // rank-selection variant must be BIT-equal to the buffering built-in

  private def ev = Tables.table(spark, sfDir, "events")

  test("exactPercentiles == percentile() bit-for-bit on events") {
    val qs = Seq(0.1, 0.5, 0.9, 0.25)
    val got = WeightedQuantile
      .exactPercentiles(ev, "event_type", "value", qs, bufferedCap = 0)
      .groupBy("event_type")
      .pivot("q", qs).agg(first("pctl"))
      .orderBy("event_type").collect()
    val want = ev.groupBy("event_type")
      .agg(qs.map(q => expr(s"percentile(value, $q)").as(q.toString)).head,
        qs.map(q => expr(s"percentile(value, $q)").as(q.toString)).tail: _*)
      .orderBy("event_type").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("exactPercentiles handles ties, nulls, and 1-row groups like the built-in") {
    val df = spark.range(2000).selectExpr(
      "concat('g', id % 7) AS g",
      // heavy ties (11 distinct values), plus nulls, plus one singleton group
      "CASE WHEN id % 13 = 0 THEN NULL ELSE CAST(id % 11 AS DOUBLE) END AS v")
      .union(spark.range(1).selectExpr("'solo' AS g", "CAST(3.5 AS DOUBLE) AS v"))
    for (q <- Seq(0.0, 0.5, 0.77, 1.0)) {
      val got = WeightedQuantile.exactPercentiles(df, "g", "v", Seq(q), buckets = 16, bufferedCap = 0)
        .select("g", "pctl").orderBy("g").collect()
      val want = df.groupBy("g").agg(expr(s"percentile(v, $q)").as("pctl"))
        .orderBy("g").collect()
      assert(got.toSeq === want.toSeq, s"q=$q")
    }
  }

  test("an all-null group emits one NULL-pctl row per q, like percentile()") {
    val df = spark.range(60).selectExpr(
      "concat('g', id % 3) AS g",
      // group g2 is ALL null; g0/g1 carry values
      "CASE WHEN id % 3 = 2 THEN NULL ELSE CAST(id AS DOUBLE) END AS v")
    val got = WeightedQuantile
      .exactPercentiles(df, "g", "v", Seq(0.25, 0.75), buckets = 8, bufferedCap = 0)
      .orderBy("g", "q").collect()
    val want = df.groupBy("g").agg(
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.75)").as("p75"))
      .orderBy("g").collect()
    // 3 groups × 2 qs, g2's pctls NULL with n=0 — the group never vanishes
    assert(got.length === 6)
    val byG = got.groupBy(_.getString(0))
    assert(byG("g2").forall(r => r.isNullAt(r.fieldIndex("pctl"))))
    assert(byG("g2").forall(r => r.getLong(r.fieldIndex("n")) === 0L))
    assert(want.filter(_.getString(0) == "g2")
      .forall(r => r.isNullAt(1) && r.isNullAt(2))) // built-in agrees
    // and the non-null groups still match the built-in bit-for-bit
    for (r <- want.filter(_.getString(0) != "g2")) {
      val g = r.getString(0)
      val Seq(q25, q75) = byG(g).sortBy(_.getDouble(1)).toSeq
      assert(q25.getDouble(q25.fieldIndex("pctl")) === r.getDouble(1))
      assert(q75.getDouble(q75.fieldIndex("pctl")) === r.getDouble(2))
    }
  }

  // The counted small-input shortcut (one buffered percentile aggregation
  // within MaxBufferedValues total rows — the r17 stage-count fix) must be
  // BIT-equal to the bucketed rank selection it bypasses, on every edge the
  // bucketed tests above pin: ties, nulls, singleton groups, all-null
  // groups, multiple qs. The default-cap call takes the shortcut (inputs
  // here are ≪ 2M rows); bufferedCap = 0 forces the bucketed machinery.
  test("buffered shortcut == bucketed rank selection bit-for-bit") {
    val df = spark.range(2000).selectExpr(
      "concat('g', id % 5) AS g",
      // ties + nulls + one all-null group (g4) + spread values
      "CASE WHEN id % 5 = 4 THEN NULL " +
        "WHEN id % 13 = 0 THEN NULL ELSE CAST(id % 17 AS DOUBLE) END AS v")
      .union(spark.range(1).selectExpr("'solo' AS g", "CAST(2.25 AS DOUBLE) AS v"))
    val qs = Seq(0.0, 1.0 / 3, 0.5, 0.9, 1.0)
    val fast = WeightedQuantile.exactPercentiles(df, "g", "v", qs)
      .orderBy("g", "q").collect()
    val slow = WeightedQuantile
      .exactPercentiles(df, "g", "v", qs, bufferedCap = 0)
      .orderBy("g", "q").collect()
    assert(fast.toSeq === slow.toSeq)
    // and on the real fixture frame both branches agree too
    val fastEv = WeightedQuantile
      .exactPercentiles(ev, "event_type", "value", Seq(0.5, 0.9))
      .orderBy("event_type", "q").collect()
    val slowEv = WeightedQuantile
      .exactPercentiles(ev, "event_type", "value", Seq(0.5, 0.9),
        bufferedCap = 0)
      .orderBy("event_type", "q").collect()
    assert(fastEv.toSeq === slowEv.toSeq)
  }

  test("exactPercentiles reports the non-null count as n") {
    val df = spark.range(100).selectExpr(
      "'a' AS g", "CASE WHEN id < 10 THEN NULL ELSE CAST(id AS DOUBLE) END AS v")
    val r = WeightedQuantile.exactPercentiles(df, "g", "v", Seq(0.5), bufferedCap = 0).collect()
    assert(r.length === 1 && r.head.getLong(r.head.fieldIndex("n")) === 90L)
  }
}

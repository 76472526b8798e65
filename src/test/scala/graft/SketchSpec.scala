package graft

import org.apache.spark.sql.functions._

/** Mergeable-sketch contracts. Since r17 the DECLARED sketch queries
  * (`agg_sketch_reuse` et al.) use the theta/KMV sketch — pure function
  * of the distinct-hash set, hence fully oracle-certified; see
  * [[KmvSpec]]. The DataSketches HLL path stays a first-class library
  * capability (smaller state for the same error, at the cost of
  * engine-specific register internals) and is pinned HERE: register-max
  * union must equal the single global sketch exactly, estimates must
  * track exact counts, and the in-row `hll_union` window fold must
  * match the exact sliding twin.
  */
class SketchSpec extends SparkSpec {

  test("union of partial sketches equals the single global sketch exactly") {
    val events = Tables.table(spark, sfDir, "events")
    val merged = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val global = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val g = global.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === g,
      "merging partial sketches must be lossless vs one global sketch")
  }

  test("sketch estimate tracks exact distinct within HLL error bounds") {
    val events = Tables.table(spark, sfDir, "events")
    val est = events.agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getLong(0)
    val exact = events.select("user_id").distinct().count()
    // default lgK=12 ⇒ relative standard error ~1.6%; allow 5%
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"HLL estimate $est vs exact $exact")
  }

  test("sliding-window sketch merge tracks the exact sliding distinct within 5%") {
    // since r17 the declared query merges KMV sketches (oracle-exact);
    // the accuracy contract vs the exact twin is unchanged
    val exact = SparkEntry.queries("ts_sliding_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("ts_sliding_distinct_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet) // same hourly grid
    for ((hour, est) <- approx) {
      val truth = exact(hour).toDouble
      assert(math.abs(est - truth) <= math.max(3.0, 0.05 * truth),
        s"$hour: approx $est vs exact $truth")
    }
  }

  test("in-row HLL fold (hll_union aggregate over a collected window) " +
      "tracks the exact sliding distinct within 5%") {
    // the declared sliding query switched to KMV in r17 for oracle
    // exactness; the constant-state-per-row HLL fold remains a library
    // capability — pinned here with the pre-r17 query body
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.table(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val w = Window.orderBy("hour").rowsBetween(-2, 0)
    val approx = hourly
      .withColumn("sks", collect_list(col("sk")).over(w))
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        expr("""hll_sketch_estimate(
                  aggregate(slice(sks, 2, size(sks) - 1), sks[0],
                            (acc, x) -> hll_union(acc, x)))""")
          .cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("ts_sliding_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((hour, est) <- approx) {
      val truth = exact(hour).toDouble
      assert(math.abs(est - truth) <= math.max(3.0, 0.05 * truth),
        s"$hour: approx $est vs exact $truth")
    }
  }

  test("Misra–Gries: heavy items always survive reduces+merges within the bound") {
    val k = 10
    // skewed synthetic stream: three genuinely heavy items buried in noise
    val stream = Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma") ++ (1 to 900).map(i => s"rare$i")
    val n = stream.size
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // deterministic shuffle + an arbitrary reduce/merge tree (8 chunks,
    // pairwise merges) — the guarantee must hold for ANY such tree
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(stream)
    val mg = new graft.functions.MisraGries(k)
    val partials = shuffled.grouped(math.ceil(n / 8.0).toInt)
      .map(_.foldLeft(mg.zero)(mg.reduce)).toSeq
    val summary = partials.reduce(mg.merge)
    assert(summary.size <= k)
    val bound = n / (k + 1)
    // every item above n/(k+1) is retained
    for ((t, c) <- truth if c > bound)
      assert(summary.contains(t), s"heavy item $t (count $c) evicted")
    // estimates never overcount and undercount by at most n/(k+1)
    for ((t, est) <- summary) {
      assert(est <= truth(t), s"$t overcounted: $est > ${truth(t)}")
      assert(truth(t) - est <= bound,
        s"$t undercounted past the bound: $est vs ${truth(t)}")
    }
  }
}

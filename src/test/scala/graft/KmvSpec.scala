package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.{HashedVal, Kmv, KmvAggregator, KmvSampleAggregator}

/** Contract behind the r17 theta/KMV sketch family
  * (`agg_approx_distinct` / `agg_sketch_reuse` / `agg_sketch_intersect`
  * / `ts_sliding_distinct_approx` / `agg_approx_quantile`): the sketch
  * is a PURE FUNCTION of the distinct-hash set — identical under any
  * partitioning (hence any retry/merge tree), losslessly mergeable, and
  * exact below saturation — with the estimate inside its published
  * error bound once saturated. The cross-ENGINE half of the contract
  * (DuckDB replays the arithmetic bit-for-bit) is certified by the
  * driver's oracle on all five queries; these specs pin the algebra.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def kmv = udaf(new KmvAggregator(Kmv.Capacity), ExpressionEncoder[Long]())

  /** n synthetic keys, deterministic, > capacity when asked. */
  private def keys(n: Int) = (1 to n).map(i => s"user$i")

  test("exact regime: below k distinct keys the estimate IS the count") {
    val df = (keys(500) ++ keys(300)).toDF("k") // dups must not inflate
    val est = df.select(Kmv.hash64($"k").as("h")).agg(kmv($"h").as("sk"))
      .select(Kmv.estimate($"sk")).head().getLong(0)
    assert(est === 500L)
  }

  test("saturated regime: estimate within 5×RSE of the true cardinality") {
    val n = 100000
    val est = keys(n).toDF("k")
      .select(Kmv.hash64($"k").as("h")).agg(kmv($"h").as("sk"))
      .select(Kmv.estimate($"sk")).head().getLong(0)
    // RSE ≈ 1/√(k−2) ≈ 3.1% at k=1024; 5×RSE ≈ 15.6%
    assert(math.abs(est - n).toDouble / n <= 0.156, s"estimate $est vs $n")
  }

  test("partition-order invariance: the sketch array is bit-identical " +
      "under different partitionings (the retry-determinism property)") {
    val df = keys(50000).toDF("k").select(Kmv.hash64($"k").as("h"))
    val sks = Seq(1, 7, 32).map { p =>
      df.repartition(p).agg(kmv($"h").as("sk")).head().getSeq[Long](0)
    }
    assert(sks(0) === sks(1))
    assert(sks(1) === sks(2))
    assert(sks(0).size === Kmv.Capacity)
  }

  test("merge losslessness: bottom-k of unioned partials equals the " +
      "global sketch EXACTLY (array equality, not approximate agreement)") {
    val df = keys(30000).toDF("k")
      .select((Kmv.hash64($"k") % 97).as("part"), Kmv.hash64($"k").as("h"))
    val viaPartials = df.groupBy("part").agg(kmv($"h").as("sk"))
      .select(explode($"sk").as("h")).agg(kmv($"h").as("sk"))
      .head().getSeq[Long](0)
    val global = df.agg(kmv($"h").as("sk")).head().getSeq[Long](0)
    assert(viaPartials === global)
  }

  test("in-row unionArrays is the same lossless merge (the sliding-window path)") {
    val a = keys(20000)
    val b = keys(30000).drop(15000) // overlap [15001, 20000]
    val skOf = (xs: Seq[String]) =>
      xs.toDF("k").select(Kmv.hash64($"k").as("h")).agg(kmv($"h").as("sk"))
        .head().getSeq[Long](0)
    val merged = Seq((skOf(a), skOf(b))).toDF("ska", "skb")
      .select(Kmv.unionArrays(array($"ska", $"skb")).as("u"))
      .head().getSeq[Long](0)
    assert(merged === skOf(a ++ b))
  }

  test("theta intersection: exact when both sketches are exact, within " +
      "bound when saturated, on a PARTIAL overlap (fixture overlap is total)") {
    def interEst(na: Int, nb: Int, shared: Int): (Long, Int) = {
      // A = [1, na]; B = [na-shared+1, na-shared+nb] → |A∩B| = shared
      val a = (1 to na).map(i => s"u$i")
      val b = (na - shared + 1 to na - shared + nb).map(i => s"u$i")
      val df = a.map(("A", _)).union(b.map(("B", _))).toDF("t", "k")
        .select($"t", Kmv.hash64($"k").as("h"))
      val sk = df.groupBy("t").agg(kmv($"h").as("sk"))
      val row = sk.groupBy().pivot("t").agg(first("sk"))
        .select($"A".as("ska"), $"B".as("skb"))
      val withTheta = row
        .withColumn("tha", when(size($"ska") <= Kmv.K, lit(Kmv.TwoPow60))
          .otherwise(element_at($"ska", Kmv.K)))
        .withColumn("thb", when(size($"skb") <= Kmv.K, lit(Kmv.TwoPow60))
          .otherwise(element_at($"skb", Kmv.K)))
        .withColumn("th", least($"tha", $"thb"))
      val est = withTheta.select(
        floor(size(array_intersect(
          filter($"ska", x => x < $"th"),
          filter($"skb", x => x < $"th"))).cast("double") *
          lit(Kmv.TwoPow60.toDouble) / $"th".cast("double")).as("est"))
        .head().getLong(0)
      (est, shared)
    }
    val (exactEst, s1) = interEst(800, 600, 200)
    assert(exactEst === s1.toLong) // both below k ⇒ exact set intersection
    val (satEst, s2) = interEst(50000, 40000, 20000)
    // intersection RSE is driven by the ~k·|A∩B|/|A∪B| retained common
    // hashes; at these sizes ≈ 293 samples ⇒ RSE ≈ 5.8%; allow 5×
    assert(math.abs(satEst - s2).toDouble / s2 <= 0.3, s"est $satEst vs $s2")
  }

  test("bottom-m sample: below m the quantiles are EXACT; buffer is " +
      "order-invariant under partitioning") {
    val m = 1000
    val smp = udaf(new KmvSampleAggregator(m), ExpressionEncoder[HashedVal]())
    val df = (1 to 700).map(i => (s"e$i", i.toDouble)).toDF("k", "v")
      .select(Kmv.hash64($"k").as("h"), $"v")
    val sample = df.agg(smp($"h", $"v").as("s"))
      .select(array_sort(transform($"s", _.getField("v"))).as("vs"))
    val vs = sample.head().getSeq[Double](0)
    assert(vs.size === 700)
    assert(vs(349) === 350.0) // ceil(0.5·700) = 350 → exact median rank
    val again = df.repartition(13).agg(smp($"h", $"v").as("s"))
      .select(array_sort(transform($"s", _.getField("v")))).head().getSeq[Double](0)
    assert(again === vs)
  }

  test("agg_sketch_banked answers from the bank ALONE: every file scan " +
      "in the executed plan reads the sketch bank, never events") {
    val df = SparkEntry.queries("agg_sketch_banked")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val locs = allNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(locs.nonEmpty, "expected file scans of the bank")
    assert(locs.forall(_.contains("graft_kmvbank_")),
      s"plan scans outside the bank: $locs")
    // exact regime at this fixture (≤ k users/type): the banked
    // estimate must EQUAL the true 7-day reach
    val events = Tables.table(spark, sfDir, "events")
      .select(col("event_type"), col("user_id"),
        date_trunc("day", col("ts")).as("day"))
    val maxd = events.agg(max("day")).head().getTimestamp(0)
    val exact = events
      .filter(col("day") >= lit(maxd) - expr("INTERVAL 6 DAYS"))
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("saturated sample: rank error of the selected quantile stays " +
      "within 5×√(p(1−p)/m) of the requested rank") {
    val m = 1000
    val n = 50000
    val smp = udaf(new KmvSampleAggregator(m), ExpressionEncoder[HashedVal]())
    val df = (1 to n).map(i => (s"e$i", i.toDouble)).toDF("k", "v")
      .select(Kmv.hash64($"k").as("h"), $"v")
    val vs = df.agg(smp($"h", $"v").as("s"))
      .select(array_sort(transform($"s", _.getField("v")))).head().getSeq[Double](0)
    assert(vs.size === m)
    for (p <- Seq(0.5, 0.9)) {
      val sel = vs(math.max(1, math.ceil(p * m).toInt) - 1)
      val trueRank = sel / n // values are 1..n ⇒ rank fraction = v/n
      val tol = 5 * math.sqrt(p * (1 - p) / m)
      assert(math.abs(trueRank - p) <= tol, s"p=$p sel=$sel rank=$trueRank")
    }
  }
}

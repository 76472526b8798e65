package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Semantic properties of the governance family that the value-hash
  * oracle cannot express: the k-anonymity release is exhaustive and
  * actually k-anonymous, the DP noise respects the seeded-Laplace bound
  * and the clamp, the forget audit accounts for every row and the purge
  * predicate really empties the request set, and PSI is non-negative
  * with an exact total. Expectations derive from the fixture itself, so
  * every test holds at any scale factor.
  */
class GovernanceSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def events = Tables.table(spark, sfDir, "events")

  private def mdBucket(c: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(c), 1, 8), 16, 10).cast("long"), lit(1000000L))

  test("gov_k_anon: released groups are k-anonymous and the release is exhaustive") {
    val rows = run("gov_k_anon").collect()
    val (supp, released) = rows.partition(_.getString(0) == "__suppressed__")
    assert(supp.length == 1, "exactly one suppressed rollup row")
    assert(released.forall(_.getLong(3) >= 5), "every released group has n >= k")
    val accounted = released.map(_.getLong(3)).sum + supp.head.getLong(3)
    assert(accounted == events.count(), "released + suppressed covers every row")
    // at sf0.001 every group is below k (1000 rows / 3720 QI cells), so
    // this run certifies the empty-released edge; the opposite edge (all
    // released, rollup row still present with n = 0) is certified by the
    // sf0.1 oracle run, where no group is below k
  }

  test("gov_dp_counts: noise is the seeded Laplace draw, clamped at zero") {
    val got = run("gov_dp_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueN = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == trueN.keySet)
    val eps = 0.5
    got.foreach { case (tpe, released) =>
      assert(released >= 0L, s"$tpe: clamp violated")
      // recompute the seeded inverse-CDF draw on the driver
      val bkt = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(tpe).take(8), 16) % 1000000L
      val u = (bkt + 0.5) / 1e6 - 0.5
      val noiseMicro = math.round(-1.0 / eps * math.signum(u) *
        math.log(1.0 - 2.0 * math.abs(u)) * 1e6)
      val expected = math.max(0L, trueN(tpe) * 1000000L + noiseMicro)
      assert(released == expected, s"$tpe: $released != $expected")
      // sanity: |noise| is bounded by the inverse CDF at the bucket grid's
      // edge, (1/eps)·ln(1e6) ≈ 27.6e6 micro-units
      assert(math.abs(released - trueN(tpe) * 1000000L) <= 28000000L)
    }
  }

  test("gov_forget_audit: accounts for every row and the purge empties the request set") {
    val rows = run("gov_forget_audit").collect()
    val perType = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perType(r.getString(0)),
        s"${r.getString(0)}: kept + purged != total")
    }
    val del = mdBucket(col("user_id").cast("string")) < 100000L
    // applying the purge as a filter leaves zero requested users behind
    assert(events.filter(del).count() == rows.map(_.getLong(2)).sum)
    assert(events.filter(!del).filter(del).count() == 0L)
    // purged_users matches a driver-side recount
    val purgedUsers = events.filter(del).select("event_type", "user_id")
      .distinct().groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(3) == purgedUsers.getOrElse(r.getString(0), 0L))
    }
  }

  test("doc_drift_psi: terms are non-negative, total is the exact term sum, counts cover the corpus") {
    val rows = run("doc_drift_psi").collect()
    val (tot, buckets) = rows.partition(_.getLong(0) == -1L)
    assert(tot.length == 1 && buckets.length == 10)
    // (p−q) and ln(p/q) always share sign, so every PSI term is ≥ 0
    buckets.foreach(r => assert(r.getLong(3) >= 0L, s"bucket ${r.getLong(0)}"))
    assert(tot.head.getLong(3) == buckets.map(_.getLong(3)).sum,
      "headline PSI is the exact long sum of the bucket terms")
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(tot.head.getLong(1) + tot.head.getLong(2) == nDocs,
      "ref + cur snapshots partition the corpus")
  }

  test("governance plans: no sort-merge join, aggregation-shaped") {
    // per-query exchange ceilings: every exchange past the first carries a
    // group frame (QI groups / 5 types / ≤20 histogram rows), so the
    // ceiling is the number of post-aggregation stages, not a corpus
    // re-shuffle. gov_k_anon = 4 (QI agg re-planned per union branch,
    // 1-row suppressed rollup, output sort); doc_drift_psi = 5 (corpus
    // agg, spine union re-agg, smoothing window, rollup, sort)
    for ((name, ceiling) <- Seq("gov_k_anon" -> 4, "gov_dp_counts" -> 3,
        "gov_forget_audit" -> 4, "doc_drift_psi" -> 5)) {
      val df = run(name)
      df.write.format("noop").mode("overwrite").save()
      val nodes = allNodes(df.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"$name: release logic must run on the compact group frame, not a shuffle join")
      val exchanges = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(exchanges <= ceiling,
        s"$name: $exchanges exchanges (ceiling $ceiling) — corpus re-shuffled?")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.queries.VectorQueries

/** The composed IVF-PQ search (`vec_knn_ivf_pq`): the two-stage pruned
  * shape must be real in the PLAN (both the codes scan and the raw
  * rerank scan statically pruned to nprobe partition directories, no
  * shuffle anywhere), deterministic across invocations, and carry
  * ranking signal against exact brute force.
  */
class IvfPqSpec extends SparkSpec {

  test("IVF-PQ is deterministic and the probe partition survives") {
    val a = VectorQueries.ivfPqKnn(spark, sfDir, k = 10, nprobe = 2,
      shortlist = 50).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = VectorQueries.ivfPqKnn(spark, sfDir, k = 10, nprobe = 2,
      shortlist = 50).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq === b.toSeq)
    // the probe vector itself (distance 0) must route to its own
    // partition and survive ADC + rerank
    assert(a.map(_._1).contains(42L))
  }

  test("both IVF-PQ scans prune statically; no shuffle in the plan") {
    val res = VectorQueries.ivfPqKnn(spark, sfDir, k = 10, nprobe = 2,
      shortlist = 50)
    res.collect()
    val executed = res.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = allNodes(executed)
      .collect { case f: FileSourceScanExec => f }
    // codes scan + raw-corpus rerank scan (the broadcast side of the
    // semi-join is the k-row shortlist, not a file scan)
    assert(scans.size === 2, executed.toString)
    scans.foreach { sc =>
      assert(sc.toString.contains("PartitionFilters: [centroid_id"),
        sc.toString)
      assert(sc.selectedPartitions.partitionCount === 2,
        s"expected 2 pruned partitions, scanned ${sc.selectedPartitions.partitionCount}")
    }
    val p = executed.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      p)
  }

  test("batched IVF at nprobe=2: one pruned pass, broadcast probes, probe_id-only shuffle") {
    val res = VectorQueries.ivfBatchKnn(spark, sfDir, k = 5, nprobe = 2)
    res.collect()
    val executed = res.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = allNodes(executed)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.size === 1, s"batched IVF must make ONE corpus pass:\n$executed")
    assert(scans.head.toString.contains("PartitionFilters: [centroid_id"),
      scans.head.toString)
    // 3 probes × nprobe=2, deduped: strictly fewer than all 8 partitions
    val touched = scans.head.selectedPartitions.partitionCount
    assert(touched <= 6 && touched < 8,
      s"expected ≤6 pruned partitions for 3 probes × nprobe=2, scanned $touched")
    val p = executed.toString
    assert(p.contains("BroadcastHashJoin"), p)
    val exchanges = "Exchange hashpartitioning\\(([a-z_#0-9]+)"
      .r.findAllMatchIn(p).map(_.group(1)).toSeq
    exchanges.foreach(k =>
      assert(k.startsWith("probe_id"), s"batched IVF shuffles on $k:\n$p"))
  }

  test("at nprobe=all with an uncapped shortlist, IVF-PQ equals brute force") {
    // degenerate config = exact search with extra steps: routing keeps
    // every partition, ADC keeps every candidate, and the exact rerank
    // is then a full brute-force L2 top-k — bit-parity proves the
    // composition loses nothing outside the declared approximations
    val res = VectorQueries.ivfPqKnn(spark, sfDir, k = 10, nprobe = 8,
      shortlist = Int.MaxValue).collect().map(_.getLong(0)).toSet
    val embs = Tables.table(spark, sfDir, "embeddings")
    val probe = embs.filter(col("vec_id") === 42)
      .select(col("embedding")).head().getSeq[Float](0)
    val pv = typedLit(probe)
    val exact = embs.select(col("vec_id"),
        aggregate(zip_with(col("embedding"), pv,
            (x, c) => (x.cast("double") - c.cast("double")) *
              (x.cast("double") - c.cast("double"))),
          lit(0.0d), (a, x) => a + x).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    assert(res === exact)
  }

  test("at nprobe=2 the pruned search still tracks exact top-10") {
    val res = VectorQueries.ivfPqKnn(spark, sfDir, k = 10, nprobe = 2,
      shortlist = 50).collect().map(_.getLong(0)).toSet
    val embs = Tables.table(spark, sfDir, "embeddings")
    val probe = embs.filter(col("vec_id") === 42)
      .select(col("embedding")).head().getSeq[Float](0)
    val pv = typedLit(probe)
    val exact = embs.select(col("vec_id"),
        aggregate(zip_with(col("embedding"), pv,
            (x, c) => (x.cast("double") - c.cast("double")) *
              (x.cast("double") - c.cast("double"))),
          lit(0.0d), (a, x) => a + x).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (res & exact).size / 10.0
    // compounded floor: IVF routing keeps 2/8 partitions and PQ is the
    // ProductQuantizerSpec-documented 0.4@10 on this adversarial
    // synthetic corpus; a random top-10 would score E ≈ 0.003
    assert(recall >= 0.3,
      s"IVF-PQ recall@10 = $recall — pruned search carries no signal")
  }
}

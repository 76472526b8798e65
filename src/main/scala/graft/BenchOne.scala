package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries N times each (steady-state vs first-run
  * cost): `runMain graft.BenchOne q1 q2 ...` with SPARK_GRAFT_SF_DIR.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_RUNS trims the repeat count for expensive decade-probe
    // legs; SPARK_GRAFT_ROWS=1 additionally reports the result row count
    // AFTER the timed runs (the pair-count denominator for output-linear
    // adjudication) — counted separately so timing stays the noop write.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val wantRows = sys.env.get("SPARK_GRAFT_ROWS").contains("1")
    args.foreach { name =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[benchone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (wantRows)
        println(s"[benchone] $name rows=${SparkEntry.queries(name)(spark, sfDir).count()}")
    }
    spark.stop()
  }
}

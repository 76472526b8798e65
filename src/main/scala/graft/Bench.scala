package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is forced through a
  * `noop` sink so the FULL plan executes — `count()` would let Catalyst
  * prune projections/sorts and flatter the numbers.
  */
object Bench {
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
    def runAll(timed: Boolean): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          if (timed) System.err.println(s"[bench] $name failed: ${e.getMessage}")
          // -1 marks a FAILED query so the 2x gate can't mistake broken
          // for fast
          name -> -1.0
        }
      }
    // one untimed warm-up pass (JIT + codegen + page cache), then the
    // timed pass: reports steady-state engine throughput, the number that
    // scales to a long-lived cluster, not single-JVM warm-up.
    runAll(timed = false)
    val results = runAll(timed = true)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // any failed query poisons the total: broken must never read as fast
    val total = if (results.exists(_._2 < 0)) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

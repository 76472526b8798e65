package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Kmv

/** Measurement main: the KMV aggregator at decade scale — the datum
  * behind the "constant state, O(1) common-case reject" claim in
  * [[graft.functions.Kmv]]. Each leg aggregates N distinct keys
  * (spark.range → the same md5 hash path the declared queries use)
  * into one sketch and reports wall time, throughput, and the
  * estimate's relative error vs the known true cardinality. The
  * expected shape at 100×: per-row cost FLAT (after the first ~k·ln n
  * inserts per partition the hot path is a single compare against the
  * buffer tail), accuracy inside the 1/√(k−2) RSE band at every
  * decade. Legs via SPARK_GRAFT_KMV_LEGS (default "1e6,1e7,1e8").
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val legs = sys.env.getOrElse("SPARK_GRAFT_KMV_LEGS", "1e6,1e7,1e8")
      .split(",").map(_.trim.toDouble.toLong)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // heap comes from the launching java -Xmx: spark.driver.memory
      // set here would be a no-op once the local JVM is already up
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val kmv = Kmv.sketchUdaf()
    for (n <- legs) {
      // warm-up pass (plan + codegen), then the timed pass
      def run(): Long = spark.range(n)
        .select(Kmv.hash64(col("id")).as("h"))
        .agg(kmv(col("h")).as("sk"))
        .select(Kmv.estimate(col("sk")))
        .head().getLong(0)
      run()
      val t0 = System.nanoTime()
      val est = run()
      val sec = (System.nanoTime() - t0) / 1e9
      val relErr = math.abs(est - n).toDouble / n
      println(f"""{"leg":"kmv_distinct","n":$n,"sec":$sec%.2f,"rows_per_sec":${(n / sec).toLong},"estimate":$est,"rel_err":$relErr%.4f}""")
    }
    spark.stop()
  }
}

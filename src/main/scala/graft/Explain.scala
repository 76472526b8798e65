package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the optimized physical plan of named queries against
  * SPARK_GRAFT_SF_DIR (`runMain graft.Explain q1 q2 ...`) — for diffing
  * plan shapes across scale factors (a plan that changes shape with data
  * size is a scale bug; only AQE's runtime join/partition choices may
  * differ legitimately).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"==== $name @ $sfDir")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}

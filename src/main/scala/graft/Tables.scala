package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (TESTDATA.md): one parquet file per table under
  * an sf directory. Kept trivial on purpose — the scan is the plan leaf
  * Catalyst pushes filters/projections into.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    // default (PARQUET_TYPE_ILLEGAL). Read it as a long and floor-divide to
    // micros — the same truncation DuckDB applies when it reads ns into its
    // µs TIMESTAMP, so oracle comparisons stay exact. `div` (integer
    // division) rather than `/`: epoch-ns ≈ 1.7e18 exceeds a double's 2^53
    // integer range, a float division would corrupt low digits.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Phase-timing probe for the contamination/curation shingle path
  * (r17): pipeline_curate and doc_contamination read ~60× their sf1
  * cost at sf10u where the shingle count grows only ~13× — this main
  * splits the pipeline into cumulative phases so the super-linear
  * phase is measured, not guessed: (a) corpus scan+repartition, (b)
  * + tokenize/shingle explode, (c) + broadcast-join probe against the
  * eval side, (d) + pair aggregation (= the full query). Each phase is
  * timed as its own noop-sunk action (warm after a throwaway pass).
  */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10u")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.table(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    def sh(df: org.apache.spark.sql.DataFrame, idAs: String) =
      df.select(col("doc_id").as(idAs), explode(TextFunctions.shingles(
        TextFunctions.tokens(TextFunctions.normalize(col("text"))), 5)).as("shingle"))
    val evalSh = sh(docs.filter(col("doc_id") < 20), "eval_id")
    val corpusSh = sh(docs.filter(col("doc_id") >= 20), "corpus_id")
    val joined = corpusSh.join(broadcast(evalSh), "shingle")
    val full = joined.groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[contamprobe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm-up: page cache + codegen for the full plan
    full.write.format("noop").mode("overwrite").save()
    time("a_scan_repartition")(docs)
    time("b_shingle_explode")(corpusSh)
    time("c_broadcast_probe")(joined)
    time("d_full_query")(full)
    spark.stop()
  }
}

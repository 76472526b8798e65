package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One declared engine capability: a Spark implementation plus (usually)
    * a DuckDB oracle SQL string over the same parquet tables. `oracle=None`
    * ⇒ the driver records a weaker rows-only check (reserved for ops whose
    * semantics plain SQL can't mirror, e.g. approx sketches).
    *
    * `oracleGen` is the oracle for queries over LEARNED constants (PQ
    * codebooks, k-means centroids): the SQL cannot be a static string
    * because the constants come out of the fit, but once the fit is done
    * they are plain numbers — the generator runs at Verify-dump time
    * with the same (session, fixture) the queries saw, materializes the
    * learned values into literal CTEs (the r12 `vec_lsh_candidates` /
    * r11 `mm_phash` move), and DuckDB replays the SEARCH arithmetic
    * bit-for-bit. Only the fit itself stays outside the oracle (pinned
    * by its dedicated determinism specs).
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      oracleGen: Option[(SparkSession, String) => String] = None)

  trait QueryPack {
    def queries: Seq[Q]
    /** Loader shorthand. */
    protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
      Tables.table(spark, dir, name)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One declared engine capability: a Spark implementation plus (usually)
    * a DuckDB oracle SQL string over the same parquet tables. `oracle=None`
    * ⇒ the driver records a weaker rows-only check (reserved for ops whose
    * semantics plain SQL can't mirror, e.g. approx sketches).
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  trait QueryPack {
    def queries: Seq[Q]
    /** Loader shorthand. */
    protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
      Tables.table(spark, dir, name)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The repo-wide deterministic-uniform device, defined ONCE: the first
  * 8 hex digits of md5, mod `mod` — reproducible in any engine (DuckDB
  * twin: `('0x' || substr(md5(x), 1, 8))::BIGINT % mod`), no RNG state
  * to coordinate across executors. Used for sampling predicates,
  * mixture keep decisions, snapshot splits, deletion-request lists, and
  * DP noise seeds; every consumer delegating here means a change to the
  * hash convention cannot silently desynchronize them.
  */
object Hashing {
  def md5Bucket(key: Column, mod: Long = 1000000L): Column =
    md5Bucket(key, lit(mod))

  /** Column-mod form — the SQL surface's `md5_bucket(key, mod)` builder
    * routes here so both arities share the one definition.
    */
  def md5Bucket(key: Column, mod: Column): Column =
    pmod(conv(substring(md5(key), 1, 8), 16, 10).cast("long"), mod)
}

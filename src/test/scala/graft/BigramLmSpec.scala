package graft

import org.apache.spark.sql.functions._

import graft.text.{BigramLm, TextFunctions}

/** Pins [[BigramLm]]'s two contracts: (1) the distributed scores at
  * minCount=1 match a driver-side reference computation of the published
  * formula bit-for-bit (the oracled `text_bigram_lm` path), and (2) the
  * df-capped dictionary + unigram backoff — the 100 TB broadcast-size
  * lever — preserves coverage, shrinks the dict, and lower-bounds the
  * uncapped scores (ln is monotone and the backoff prob is strictly
  * inside the interpolated prob).
  */
class BigramLmSpec extends SparkSpec {

  private lazy val base = Tables.table(spark, sfDir, "documents")
    .select(col("doc_id"),
      TextFunctions.tokens(TextFunctions.normalize(col("text"))).as("tk"))

  test("minCount=1 scores match the driver-side reference bit-for-bit") {
    val docs = base.collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    // reference counts on the driver
    val cb = scala.collection.mutable.Map[(String, String), Long]()
    val cu = scala.collection.mutable.Map[String, Long]()
    val cw = scala.collection.mutable.Map[String, Long]()
    var n = 0L
    for ((_, tk) <- docs) {
      tk.foreach { t => cw(t) = cw.getOrElse(t, 0L) + 1; n += 1 }
      tk.sliding(2).filter(_.length == 2).foreach { p =>
        cb((p(0), p(1))) = cb.getOrElse((p(0), p(1)), 0L) + 1
        cu(p(0)) = cu.getOrElse(p(0), 0L) + 1
      }
    }
    def lp(u: String, v: String): Long = {
      val p = 0.75 * cb((u, v)).toDouble / cu(u) + 0.25 * cw(v).toDouble / n
      // mirror Spark's round(x*1e6, 0) HALF_UP exactly
      BigDecimal(math.log(p) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = docs.collect { case (id, tk) if tk.length >= 2 =>
      val pairs = tk.sliding(2).filter(_.length == 2).toSeq
      id -> (pairs.size.toLong, pairs.map(p => lp(p(0), p(1))).sum)
    }
    val got = BigramLm.scores(base).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, e) <- expected) assert(got(id) == e, s"doc $id: ${got(id)} != $e")
  }

  test("df-capped dict + backoff: full coverage, smaller dict, lower-bound scores") {
    val full = BigramLm.scores(base, minCount = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val capped = BigramLm.scores(base, minCount = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every scored doc is still scored, with the same bigram count
    assert(capped.keySet == full.keySet)
    for ((id, (nb, lpC)) <- capped) {
      val (nbF, lpF) = full(id)
      assert(nb == nbF, s"doc $id bigram count changed under the cap")
      assert(lpC <= lpF, s"doc $id: capped score $lpC above uncapped $lpF")
    }
    // the cap actually bit (the fixture's vocab is mostly singletons):
    // at least one doc scored strictly lower through the backoff
    assert(capped.exists { case (id, (_, lpC)) => lpC < full(id)._2 })
  }
}

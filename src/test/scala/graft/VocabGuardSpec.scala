package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.queries.{AssemblyQueries, TextQueries, VocabGuard}

/** The counted vocabulary-broadcast guard contract (r12 verdict #1):
  * corpus-derived dimension frames broadcast only while their measured
  * row count is within the cap, fall back to an identical shuffled join
  * beyond it, and — the part that must never rot unexercised — the two
  * branches are BIT-EQUAL on every query that rides the guard.
  */
class VocabGuardSpec extends SparkSpec {

  /** Run `body` with planner+AQE auto-broadcast disabled, so the
    * over-cap branch provably exercises the SHUFFLED join (with the
    * defaults on, AQE would re-broadcast the tiny fixture dim at
    * runtime — correct in production, but then the spec would never
    * see the fallback plan).
    */
  private def withNoAutoBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def hasBroadcastJoin(df: DataFrame): Boolean =
    allNodes(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastHashJoinExec])

  test("under the cap the dim broadcasts; past it the SAME rows come " +
      "from a shuffled join") {
    import spark.implicits._
    withNoAutoBroadcast {
      val fact = (1 to 100).map(i => (i.toLong, s"k${i % 7}")).toDF("id", "k")
      val dim = (0 until 7).map(i => (s"k$i", i * 10L)).toDF("k", "v")
      val under = VocabGuard.guardedJoin(fact, dim, Seq("k"))
      val over = VocabGuard.guardedJoin(fact, dim, Seq("k"), cap = 0L)
      val a = under.orderBy("id", "k", "v").collect().map(_.toSeq).toSeq
      val b = over.orderBy("id", "k", "v").collect().map(_.toSeq).toSeq
      assert(a === b)
      assert(a.length === 100)
      assert(hasBroadcastJoin(under), "under-cap branch must broadcast")
      assert(!hasBroadcastJoin(over),
        s"over-cap branch must not broadcast:\n${over.queryExecution.executedPlan}")
    }
  }

  test("every guarded query is bit-equal across the two branches on the " +
      "fixture") {
    // cap = 0 forces the web-scale branch: shuffled vocab join for the
    // three text queries, posexplode + positional re-collect for
    // doc_pack_emit_ids (whose ids_md5 column certifies the full id
    // stream, so equality here proves the emitted token ids themselves)
    val cases: Seq[(String, Long => DataFrame)] = Seq(
      ("text_tfidf", cap => TextQueries.tfidfTop5(spark, sfDir, cap)),
      ("text_ngram_lm", cap => TextQueries.ngramLm(spark, sfDir, cap)),
      ("text_bpe_encode", cap => TextQueries.bpeEncodeStats(spark, sfDir, cap)),
      ("doc_pack_emit_ids", cap => AssemblyQueries.packEmitIds(spark, sfDir, cap)))
    withNoAutoBroadcast {
      cases.foreach { case (name, f) =>
        val broadcastBranch =
          f(VocabGuard.MaxBroadcastEntries).collect().map(_.toSeq).toSeq
        val shuffledBranch = f(0L).collect().map(_.toSeq).toSeq
        assert(broadcastBranch === shuffledBranch, name)
        assert(broadcastBranch.nonEmpty, s"$name returned no rows")
      }
    }
  }

  test("jaccard/containment size enrichment is bit-equal across the two " +
      "branches (the per-doc sizes frame is corpus-derived)") {
    // the r14 audit found these two still force-broadcasting the per-DOC
    // sizes frame — corpus-sized at web scale, the exact class VocabGuard
    // exists for; cap = 0 forces the shuffled enrichment
    val docs = Tables.table(spark, sfDir, "documents")
    val idx = graft.dedup.Dedup.shingleIndex(docs, "doc_id", "text", n = 3)
      .localCheckpoint(eager = false)
    withNoAutoBroadcast {
      def rows(df: DataFrame) =
        df.orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
      val jb = rows(graft.dedup.Dedup.jaccardPairsFromIndex(idx, 0.8))
      val js = rows(graft.dedup.Dedup.jaccardPairsFromIndex(idx, 0.8,
        sizesCap = 0L))
      assert(jb === js, "jaccardPairsFromIndex branches diverge")
      assert(jb.nonEmpty, "jaccard fixture pairs expected")
      val cb = rows(graft.dedup.Dedup.containmentPairsFromIndex(idx, 0.9))
      val cs = rows(graft.dedup.Dedup.containmentPairsFromIndex(idx, 0.9,
        sizesCap = 0L))
      assert(cb === cs, "containmentPairsFromIndex branches diverge")
      assert(cb.nonEmpty, "containment fixture pairs expected")
    }
  }
}

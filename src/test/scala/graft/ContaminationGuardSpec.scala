package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.ContaminationGuard
import graft.text.Winnow

/** The streaming contamination guard's contracts: the scalar winnow
  * twin is set-identical to the batch column pipeline, hits/misses
  * classify correctly against a standing index, late rows are still
  * classified (stateless — no watermark drop), and the threshold dial
  * behaves.
  */
class ContaminationGuardSpec extends SparkSpec {

  import spark.implicits._

  test("scalar winnow == batch column pipeline on every fixture doc") {
    val docs = Tables.table(spark, sfDir, "documents").limit(100)
    val batch = Winnow.fingerprintsDf(docs)
      .groupBy("doc_id").agg(collect_set("fp").as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val texts = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, text) =>
      assert(Winnow.fingerprints(text).toSet === batch.getOrElse(id, Set.empty),
        s"doc $id")
    }
  }

  private val standingDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))

  private lazy val standing =
    ContaminationGuard.standingIndex(standingDocs.toDF("doc_id", "text"))

  test("stream rows classify as hit or miss against the standing index") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val guarded = ContaminationGuard.guard(
      input.toDF().toDF("doc_id", "text"), standing, minHits = 1)
    val q = guarded.writeStream.format("memory").queryName("guard_out").start()
    try {
      input.addData(
        // verbatim copy of a standing doc → contaminated
        (10L, standingDocs.head._2),
        // fresh content → clean
        (11L, "completely novel sentence mentioning spark partitions and shuffle behavior nine ten"),
        // contains a verbatim 12-token span of standing doc 2 inside new text → contaminated
        (12L, "intro words here alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu trailing remark"))
      q.processAllAvailable()
      val out = spark.table("guard_out")
        .select("doc_id", "contaminated", "n_hits")
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2)))).toMap
      assert(out(10L)._1, out.toString)
      assert(out(10L)._2 > 0)
      assert(!out(11L)._1, out.toString)
      assert(out(11L)._2 == 0)
      assert(out(12L)._1, out.toString)
    } finally q.stop()
  }

  test("late rows are still classified, never dropped (stateless guard)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val guarded = ContaminationGuard.guard(
      input.toDF().toDF("doc_id", "text"), standing)
    val q = guarded.writeStream.format("memory").queryName("guard_late").start()
    try {
      input.addData((20L, "some clean filler text that matches nothing in the standing index at all"))
      q.processAllAvailable()
      // a "late" re-arrival from long before anything processed so far:
      // a watermarked operator would drop it; the guard classifies it
      input.addData((21L, standingDocs(1)._2))
      q.processAllAvailable()
      val out = spark.table("guard_late").select("doc_id", "contaminated")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(out.keySet === Set(20L, 21L))
      assert(out(21L))
    } finally q.stop()
  }

  test("threshold dial: minHits above the overlap count flips the verdict") {
    val df = Seq((30L, standingDocs.head._2)).toDF("doc_id", "text")
    val one = ContaminationGuard.guard(df, standing, minHits = 1)
      .select("n_hits").head().getInt(0)
    assert(one >= 1)
    val strict = ContaminationGuard.guard(df, standing, minHits = one + 1)
    assert(!strict.select("contaminated").head().getBoolean(0))
  }

  test("quality-model scoring runs on a stream (online quality filter)") {
    import graft.text.{QualityModel, TextFunctions}
    // train on the batch fixture, score a live stream with the broadcast
    // literal weights — the zero-shuffle projection is stream-legal in
    // append mode with no state store
    val fixture = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("label", QualityModel.weakLabel(col("toks")))
      .withColumn("ftoks", QualityModel.featureTokens(col("toks")))
    val m = QualityModel.fit(fixture, "ftoks", "label", d = 64)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val scored = input.toDF().toDF("doc_id", "text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("ftoks", QualityModel.featureTokens(col("toks")))
      .select(col("doc_id"),
        QualityModel.score("ftoks", m).as("score_micro"))
    val q = scored.writeStream.format("memory").queryName("q_scored").start()
    try {
      // replay real fixture docs through the stream: online scores must
      // be BIT-IDENTICAL to the batch projection (exact-long arithmetic
      // has no online/offline gap)
      val batch = fixture
        .select(col("doc_id"), QualityModel.score("ftoks", m).as("s"))
        .filter(col("doc_id") < 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val texts = Tables.table(spark, sfDir, "documents")
        .filter(col("doc_id") < 10).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      input.addData(texts.toIndexedSeq: _*)
      q.processAllAvailable()
      val out = spark.table("q_scored").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === batch)
    } finally q.stop()
  }

  test("split routes clean and quarantined like the relay dead-letter") {
    val df = Seq(
      (40L, standingDocs.head._2),
      (41L, "nothing shared with the standing corpus in this entirely fresh sentence okay"))
      .toDF("doc_id", "text")
    val (clean, dirty) = ContaminationGuard.split(
      ContaminationGuard.guard(df, standing))
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(41L))
    assert(dirty.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(40L))
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.OnlineTrainer
import graft.text.{QualityModel, TextFunctions}

/** Online NB training contract: the streaming sufficient-statistics
  * aggregation maintains exact long counts whose derived model is
  * BIT-EQUAL to `QualityModel.fit` over the same rows — mid-stream
  * (prefix parity) and at end-of-stream (full parity) — because long
  * addition is associative/commutative and the weight formula is
  * replicated digit-for-digit (Spark's HALF_UP decimal rounding
  * included).
  */
case class LabeledDoc(ftoks: Seq[String], label: Boolean)

class StreamingTrainSpec extends SparkSpec {

  import spark.implicits._

  /** The doc_quality_model featurization over the sf0.001 documents
    * fixture, collected driver-side (fixture-sized — a test-only move).
    */
  private lazy val fixtureDocs: Seq[LabeledDoc] = {
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("label", QualityModel.weakLabel(col("toks")))
      .select(QualityModel.featureTokens(col("toks")).as("ftoks"),
        col("label"), col("doc_id"))
      .orderBy("doc_id")
    docs.collect().map(r =>
      LabeledDoc(r.getSeq[String](0), r.getBoolean(1))).toSeq
  }

  private def batchModel(rows: Seq[LabeledDoc]): QualityModel.Model =
    QualityModel.fit(rows.toDF(), "ftoks", "label", d = 128)

  private def snapshot(table: String): Seq[(Long, Long, Long)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("streamed statistics reproduce the batch fit bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val all = fixtureDocs
    assert(all.count(_.label) > 0 && all.count(!_.label) > 0)
    val batches = all.grouped(math.max(1, all.size / 3 + 1)).toSeq
    assert(batches.size >= 2, "need multiple micro-batches")

    val input = MemoryStream[LabeledDoc]
    val q = OnlineTrainer.stats(input.toDF(), "ftoks", "label", d = 128)
      .writeStream.format("memory").queryName("ot_stats")
      .outputMode("complete").start()
    try {
      // mid-stream: after batch 1 the snapshot IS the batch fit of the
      // first prefix — the model is current at every micro-batch
      input.addData(batches.head: _*); q.processAllAvailable()
      val mid = OnlineTrainer.modelFrom(snapshot("ot_stats"), d = 128)
      val midBatch = batchModel(batches.head)
      assert(mid.weightsMicro.sameElements(midBatch.weightsMicro))
      assert(mid.priorMicro == midBatch.priorMicro)

      batches.tail.foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      val fin = OnlineTrainer.modelFrom(snapshot("ot_stats"), d = 128)
      val finBatch = batchModel(all)
      assert(fin.weightsMicro.sameElements(finBatch.weightsMicro))
      assert(fin.priorMicro == finBatch.priorMicro)

      // the maintained state is model-sized: ≤ d+1 statistic rows no
      // matter how many docs streamed
      assert(spark.table("ot_stats").count() <= 129L)
    } finally q.stop()
  }

  test("modelFrom rejects a single-class snapshot") {
    val ex = intercept[IllegalArgumentException] {
      OnlineTrainer.modelFrom(Seq((OnlineTrainer.DocBucket, 5L, 0L)), d = 4)
    }
    assert(ex.getMessage.contains("both classes"))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.streaming.VectorServe

/** Streaming ANN serving contract: update-mode answers are bit-equal to
  * the batch IVF search per probe (and to brute force at nprobe=ALL),
  * probes answered in one micro-batch don't disturb later ones, and the
  * bounded append-mode shape emits exactly once per query on watermark
  * close and drops late probes — the state-lifecycle half of the serving
  * story.
  */
class VectorServeSpec extends SparkSpec {

  import spark.implicits._

  case class Probe(query_id: Long, qvec: Seq[Float])
  case class TimedProbe(query_id: Long, qvec: Seq[Float], ts: Timestamp)

  private val centSeq: Seq[(Int, Seq[Float])] = Seq(
    0 -> Seq(1f, 0f, 0f, 0f), 1 -> Seq(0f, 1f, 0f, 0f),
    2 -> Seq(0f, 0f, 1f, 0f), 3 -> Seq(0f, 0f, 0f, 1f))

  private def centDf = centSeq.toDF("cid", "cvec")

  /** 48 vectors leaning toward axis (i % 4) with deterministic jitter. */
  private def corpusRaw = (0 until 48).map { i =>
    val axis = i % 4
    val v = (0 until 4).map(d =>
      (if (d == axis) 1f else 0f) + 0.07f * ((i * 31 + d * 17) % 5))
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  private lazy val assigned = Similarity.assignToCentroids(
    corpusRaw, "vec_id", "embedding", centDf, "cid", "cvec").cache()

  private def batchTopk(qvec: Seq[Float], k: Int, nprobe: Int)
      : Seq[(Double, Long)] =
    Similarity.ivfKnn(assigned, "vec_id", "embedding", centDf, "cid",
        "cvec", typedLit(qvec), k, nprobe)
      .collect().map(r => (r.getDouble(1), r.getLong(0))).toSeq

  private def servedHits(table: String): Map[Long, Seq[(Double, Long)]] =
    spark.table(table).collect().map { r =>
      r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(h => (h.getDouble(0), h.getLong(1))).toSeq
    }.toMap

  test("update-mode serving equals the batch IVF search per probe") {
    implicit val sqlCtx = spark.sqlContext
    val probes = Seq(
      Probe(100L, Seq(0.9f, 0.2f, 0f, 0f)),
      Probe(101L, Seq(0f, 0.1f, 1f, 0.2f)))
    val probes2 = Seq(Probe(102L, Seq(0.1f, 1f, 0f, 0.1f)))
    val input = MemoryStream[Probe]
    val q = VectorServe.serve(input.toDF(), "query_id", "qvec", centSeq,
        assigned, "vec_id", "embedding", k = 5, nprobe = 2)
      .writeStream.format("memory").queryName("vs_upd")
      .outputMode("update").start()
    input.addData(probes: _*); q.processAllAvailable()
    input.addData(probes2: _*); q.processAllAvailable()
    q.stop()

    val hits = servedHits("vs_upd")
    // one update row per query: each probe is fully answered in its own
    // micro-batch (stream-static join), never touched again
    assert(spark.table("vs_upd").count() == 3)
    (probes ++ probes2).foreach { p =>
      assert(hits(p.query_id) == batchTopk(p.qvec, 5, 2),
        s"query ${p.query_id}")
    }
  }

  test("nprobe = all centroids reproduces brute force exactly") {
    implicit val sqlCtx = spark.sqlContext
    val p = Probe(7L, Seq(0.3f, 0.3f, 0.9f, 0.1f))
    val input = MemoryStream[Probe]
    val q = VectorServe.serve(input.toDF(), "query_id", "qvec", centSeq,
        assigned, "vec_id", "embedding", k = 4, nprobe = centSeq.size)
      .writeStream.format("memory").queryName("vs_all")
      .outputMode("update").start()
    input.addData(p); q.processAllAvailable(); q.stop()

    val brute = Similarity.bruteForceKnn(assigned, "vec_id", "embedding",
        typedLit(p.qvec), 4)
      .collect().map(r => (r.getDouble(1), r.getLong(0))).toSeq
    assert(servedHits("vs_all")(7L) == brute)
  }

  test("bounded serving emits once on watermark close and drops late probes") {
    implicit val sqlCtx = spark.sqlContext
    def at(s: Int) = new Timestamp(s * 1000L)
    val input = MemoryStream[TimedProbe]
    val q = VectorServe.serveBounded(input.toDF(), "query_id", "qvec",
        "ts", watermark = "10 seconds", windowLen = "10 seconds",
        centSeq, assigned, "vec_id", "embedding", k = 3, nprobe = 2)
      .writeStream.format("memory").queryName("vs_app")
      .outputMode("append").start()

    val p1 = TimedProbe(1L, Seq(1f, 0f, 0.1f, 0f), at(12))
    input.addData(p1); q.processAllAvailable()
    // window [10,20) not closed yet — nothing emitted, state in flight
    assert(spark.table("vs_app").count() == 0)

    // watermark advances past 20s → p1's window closes, emits exactly once
    input.addData(TimedProbe(2L, Seq(0f, 1f, 0f, 0f), at(45)))
    q.processAllAvailable()
    val emitted = spark.table("vs_app")
      .select("query_id", "hits").collect()
    assert(emitted.map(_.getLong(0)).toSeq == Seq(1L))
    val h1 = emitted.head.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(h1 == batchTopk(p1.qvec, 3, 2))

    // a probe behind the watermark (45s − 10s = 35s) is dropped — its
    // window [0,10) would never emit
    input.addData(TimedProbe(3L, Seq(0f, 0f, 1f, 0f), at(5)))
    q.processAllAvailable()
    assert(spark.table("vs_app").count() == 1)
    q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_similarity
import graft.functions.{ScoredId, TopKAggregator}

/** Streaming ANN serving: a stream of probe embeddings answered against a
  * standing IVF index — the serving-path twin of the batch
  * `vec_knn_ivf_batch` query, for the deployment where queries ARRIVE
  * (a retrieval endpoint, an online semdedup admission check) instead of
  * being batched up front.
  *
  * Reference scope: the relay streams *documents* (`main.go:90-99`); this
  * is the same readStream→transform→writeStream discipline applied to the
  * retrieval side of the LLM-data pipeline the engine extends it with.
  *
  * Dataflow per micro-batch, and why each stage scales:
  *
  *  1. '''Route''' — each probe row picks its `nprobe` nearest centroids
  *     from a LITERAL centroid array (the index's model-size contract:
  *     centroids are k rows, the same object `assignToCentroids`
  *     broadcasts). Per-row narrow compute, zero shuffle, zero state:
  *     `array_sort` over k `(−sim, cid)` structs then `slice(…, nprobe)`.
  *     The struct comparator orders by (−sim asc, cid asc) = sim desc with
  *     deterministic ties — bit-identical to [[graft.similarity.Similarity.routeProbe]].
  *  2. '''Candidate join''' — stream-static equi-join on `centroid_id`
  *     against the routed corpus layout. The static side is the
  *     centroid-partitioned parquet the batch index built; a probe's
  *     candidates are its `nprobe` buckets, so per-probe work is
  *     `nprobe/k` of the corpus regardless of corpus size — the IVF
  *     promise, unchanged on the stream.
  *  3. '''Top-k''' — `groupBy(query_id)` with the mergeable bounded
  *     [[TopKAggregator]]: partial aggregation reduces every map
  *     partition to ≤k rows per probe before the shuffle (the exchange
  *     carries probes×partitions×k rows, corpus-size-independent), and
  *     the ≤k buffer is the entire per-query state.
  *
  * State contract: update mode keeps one ≤k buffer per DISTINCT query_id
  * — fine for a bounded query log, but a forever-stream of fresh
  * query_ids grows the store without bound. [[serveBounded]] is the
  * production form: probes carry an event-time column, the aggregation
  * is keyed on `(window(eventTime), query_id)` under a watermark, and
  * append mode emits each query's FINAL top-k exactly once when its
  * window expires — after which the engine drops the state. Latency is
  * the watermark delay; the update-mode [[serve]] answers in the same
  * micro-batch and suits a session-length query log.
  *
  * Determinism: routing ties and hit ties both break on id, so a replayed
  * micro-batch (at-least-once upstream) recomputes byte-identical
  * verdicts — VectorServeSpec pins batch parity (update-mode results ≡
  * `ivfKnn` per probe; nprobe=ALL ≡ brute force) and the append-mode
  * exactly-once/late-drop behavior.
  */
object VectorServe {

  /** `(−sim, cid)` routing structs against the literal centroid table —
    * shared by both serve shapes. Sorting ascending gives sim-desc,
    * cid-asc: the `routeProbe` order.
    */
  private def routedCids(qvec: Column, centroids: Seq[(Int, Seq[Float])],
      nprobe: Int): Column = {
    val scored = array(centroids.map { case (cid, cvec) =>
      struct(
        (-cosine_similarity(qvec, typedLit(cvec))).as("negsim"),
        lit(cid).as("cid"))
    }: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("cid"))
  }

  private def candidates(probes: DataFrame, qidCol: String, qvecCol: String,
      centroids: Seq[(Int, Seq[Float])], corpus: DataFrame, idCol: String,
      vecCol: String, nprobe: Int, carryCols: Seq[String]): DataFrame =
    probes
      .withColumn("centroid_id",
        explode(routedCids(col(qvecCol), centroids, nprobe)))
      .join(corpus.select(col(idCol), col(vecCol), col("centroid_id")),
        "centroid_id")
      .select(Seq(col(qidCol), col(qvecCol), col(idCol), col(vecCol)) ++
        carryCols.map(col): _*)

  /** Low-latency serving: update-mode streaming aggregation, answers in
    * the arriving micro-batch. Output: `(query_id, hits)` where `hits`
    * is the ranked `array<struct<sim double, id long>>` (size ≤ k).
    */
  def serve(probes: DataFrame, qidCol: String, qvecCol: String,
      centroids: Seq[(Int, Seq[Float])], corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[ScoredId])
    candidates(probes, qidCol, qvecCol, centroids, corpus, idCol, vecCol,
        nprobe, Nil)
      .groupBy(col(qidCol).as("query_id"))
      .agg(topk(
        cosine_similarity(col(vecCol), col(qvecCol)).as("sim"),
        col(idCol).cast("long").as("id")).as("hits"))
  }

  /** Bounded-state serving: event-time window + watermark, append mode.
    * Each query's final top-k emits exactly once when the watermark
    * passes its window end, then the engine DROPS the per-query state —
    * the store holds only in-flight windows, not the full query history.
    * Probes later than the watermark are dropped by the engine (the
    * standard late-data contract; route them to a batch rescan if they
    * matter). Output: `(window, query_id, hits)`.
    */
  def serveBounded(probes: DataFrame, qidCol: String, qvecCol: String,
      timeCol: String, watermark: String, windowLen: String,
      centroids: Seq[(Int, Seq[Float])], corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[ScoredId])
    candidates(
        probes.withWatermark(timeCol, watermark),
        qidCol, qvecCol, centroids, corpus, idCol, vecCol, nprobe,
        Seq(timeCol))
      .groupBy(window(col(timeCol), windowLen), col(qidCol).as("query_id"))
      .agg(topk(
        cosine_similarity(col(vecCol), col(qvecCol)).as("sim"),
        col(idCol).cast("long").as("id")).as("hits"))
  }
}

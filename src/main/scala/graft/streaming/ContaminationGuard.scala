package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Winnow

/** Streaming contamination guard — the incremental twin of the batch
  * `text_winnow_matches` matcher: INCOMING documents (a structured
  * stream) are fingerprinted in-flight and checked against a STANDING
  * benchmark/eval fingerprint index, the `doc_dedup_incremental`
  * broadcast-increment shape with the roles reversed (here the standing
  * index is the small side: eval suites are model-sized, the stream is
  * the corpus).
  *
  * The guard is deliberately STATELESS: one narrow projection per row —
  * no watermark, no state store, no aggregation — so it composes into
  * any ingest pipeline in append mode and a LATE row is still
  * classified, never dropped (contamination is a property of content,
  * not arrival time; ContaminationGuardSpec pins exactly that against
  * the watermarking dedup operators, which do drop). Routing follows
  * the relay's dead-letter pattern: [[split]] returns the clean stream
  * and the quarantined hits as two filters over one guarded stream.
  *
  * The standing index rides into the tasks as a closure-captured hash
  * set (model-size, like the IVF centroid and BPE dictionaries). For an
  * index too big to ship per-task, the same semantics run as a
  * stream-static broadcast join on the exploded fingerprints — the
  * batch matcher's shape — at the cost of a per-microbatch aggregation;
  * the in-row set is the right call while the index is eval-sized.
  */
object ContaminationGuard {

  /** Hard ceiling on the standing index: ~10⁷ longs ≈ 80 MB raw — past
    * that, per-task closure shipping stops being the right plan shape.
    * The contract used to live only in the scaladoc; a caller pointing
    * the guard at a corpus-sized frame now fails fast instead of OOMing
    * the driver.
    */
  val MaxIndexSize: Long = 10L * 1000 * 1000

  /** Distinct winnowed fingerprints of the standing corpus, collected
    * driver-side — the model-size contract (an eval suite, not a
    * corpus). Throws when the distinct-fingerprint count exceeds
    * [[MaxIndexSize]]: ONE pass — the collect is capped at
    * MaxIndexSize+1 rows and lands as a PRIMITIVE Array[Long]
    * (`as[Long]`, not Row objects — a boxed-Row collect of 10M+1
    * entries costs several hundred MB of object headers before the
    * bound could fire; the primitive array is the ~80 MB it claims),
    * so the driver holds at most ~80 MB past the bound before failing
    * (a separate count() would run the whole shingle+winnow+distinct
    * pipeline twice per index build).
    */
  def standingIndex(docs: DataFrame): Set[Long] = {
    import docs.sparkSession.implicits._
    val fps = Winnow.fingerprintsDf(docs).select("fp").distinct()
      .limit(MaxIndexSize.toInt + 1).as[Long].collect()
    require(fps.length <= MaxIndexSize,
      s"standing contamination index exceeds $MaxIndexSize fingerprints: " +
        "this side must be the EVAL suite, not a corpus — for a corpus-" +
        "sized index, run the stream-static broadcast-join form over the " +
        "exploded fingerprints (the text_winnow_matches shape) instead")
    fps.toSet
  }

  /** Annotate a (doc_id, text) stream (or batch frame — the projection
    * is engine-agnostic) with fingerprint/hit counts and the
    * contamination verdict: `n_hits ≥ minHits` shared fingerprints with
    * the standing index. Winnowing guarantees any shared token run of
    * ≥ n+w−1 tokens yields a shared fingerprint, so `minHits = 1`
    * catches verbatim spans; higher thresholds demand repeated overlap.
    */
  def guard(stream: DataFrame, standing: Set[Long], minHits: Int = 1)
      : DataFrame = {
    val fpsUdf = udf((text: String) =>
      if (text == null) Array.empty[Long] else Winnow.fingerprints(text))
    val hitsUdf = udf((fps: Seq[Long]) => fps.count(standing.contains))
    stream
      .withColumn("fps", fpsUdf(col("text")))
      .withColumn("n_fp", size(col("fps")))
      .withColumn("n_hits", hitsUdf(col("fps")))
      .withColumn("contaminated", col("n_hits") >= minHits)
      .drop("fps")
  }

  /** Dead-letter routing over a guarded stream: (clean, quarantined). */
  def split(guarded: DataFrame): (DataFrame, DataFrame) =
    (guarded.filter(!col("contaminated")),
      guarded.filter(col("contaminated")))
}

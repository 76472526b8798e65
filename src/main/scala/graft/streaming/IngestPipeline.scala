package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{QualityModel, TextFunctions}

/** The whole ingest path as ONE streaming DAG — quality scoring, eval
  * decontamination, and first-seen dedup composed end-to-end over a
  * `(doc_id, text)` document stream, the streaming twin of the batch
  * `pipeline_curate` fusion. This is what a live crawl feeds: every
  * arriving document leaves exactly once, either into the corpus or
  * into a reason-labeled dead letter (the relay's dead-letter
  * discipline, `main.go:106-108`, applied stage by stage).
  *
  * Stage order is by cost and state:
  *
  *  1. '''Quality''' (stateless) — tokenize + the zero-shuffle
  *     micro-long NB scoring projection ([[QualityModel.score]]).
  *     Cheapest and first: most rejects die before anything heavier
  *     runs.
  *  2. '''Contamination''' (stateless) — winnow fingerprints vs the
  *     broadcast eval index ([[ContaminationGuard]]). Checked on
  *     quality survivors only.
  *  3. '''Dedup''' (stateful, LAST) — [[StreamingDedup]]'s
  *     `transformWithState` first-seen-wins. Running it last means the
  *     RocksDB store holds fingerprints only for documents the corpus
  *     could actually admit — rejects never claim state, so the store
  *     is bounded by ADMITTED-content cardinality, not crawl volume.
  *
  * Precedence when a document fails several stages: contaminated >
  * low-quality > duplicate (a contaminated doc must quarantine even if
  * it is also short; it must NOT claim the dedup fingerprint, or a
  * later clean copy of the same content would be refused as its
  * duplicate). The two stateless verdict branches and the dedup branch
  * reunite with `unionByName` over one shared verdict schema — a
  * self-union of the same source stream, which Structured Streaming
  * plans as one scan feeding both branches.
  *
  * Output schema: `(doc_id, keep, reason, first_id)` — `reason` is
  * null for admitted rows, one of `contaminated`/`quality`/`duplicate`
  * for dead letters; `first_id` carries the winning copy for
  * duplicates (and the row's own id for uniques, the StreamingDedup
  * convention). IngestPipelineSpec pins stage routing, precedence,
  * cross-batch dedup state, and replay parity.
  */
object IngestPipeline {

  /** Curate a streaming `(doc_id, text)` frame. `model` is the trained
    * quality classifier (maintain it with [[OnlineTrainer]]);
    * `standing` the eval fingerprint index
    * ([[ContaminationGuard.standingIndex]]); `ttl` bounds dedup state.
    */
  def curate(docs: DataFrame, model: QualityModel.Model,
      standing: Set[Long], minHits: Int = 1,
      ttl: Option[java.time.Duration] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val annotated = ContaminationGuard.guard(docs, standing, minHits)
      .withColumn("ftoks",
        QualityModel.featureTokens(TextFunctions.tokens(col("text"))))
      .withColumn("quality_keep",
        QualityModel.score("ftoks", model) > 0)

    val rejects = annotated
      .filter(col("contaminated") || !col("quality_keep"))
      .select(col("doc_id"), lit(false).as("keep"),
        when(col("contaminated"), "contaminated").otherwise("quality")
          .as("reason"),
        lit(null).cast("long").as("first_id"))

    val survivors = annotated
      .filter(!col("contaminated") && col("quality_keep"))
      .select(col("doc_id"), col("text"))

    val deduped = StreamingDedup
      .dedup(StreamingDedup.fingerprinted(survivors)
        .as[StreamingDedup.Doc], ttl)
      .toDF()
      .select(col("doc_id"), col("unique").as("keep"),
        when(col("unique"), lit(null)).otherwise("duplicate").as("reason"),
        col("first_id"))

    rejects.unionByName(deduped)
  }

  /** Dead-letter routing: (admitted, dead-lettered). */
  def split(curated: DataFrame): (DataFrame, DataFrame) =
    (curated.filter(col("keep")), curated.filter(!col("keep")))
}

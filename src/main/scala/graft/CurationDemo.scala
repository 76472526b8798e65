package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end curation walkthrough — the LLM-data counterpart of
  * [[Demo]]: drive the declared operators as one pipeline over the
  * documents fixture and print what each stage decides.
  *
  *   profile → quality filter → trained classifier → perplexity mix →
  *   one-pass verdict → fuzzy dedup → stratified sample → pack
  *
  * Every stage is the SAME registered query the driver verifies against
  * DuckDB (`SparkEntry.queries`), so what this demo prints is what the
  * correctness gate certifies.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[*]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def q(name: String) = SparkEntry.queries(name)(spark, dir)

    println("== 1. corpus profile (text_lang_stats) ==")
    q("text_lang_stats").show(10, truncate = false)

    println("== 2. quality filter (doc_quality_filter) — drop reasons ==")
    q("doc_quality_filter").groupBy("reason").count().orderBy("reason")
      .show(10, truncate = false)

    println("== 3. fuzzy dedup (doc_dedup_fuzzy_keep) ==")
    val total = Tables.table(spark, dir, "documents").count()
    val kept = q("doc_dedup_fuzzy_keep").count()
    println(s"   corpus $total docs -> $kept representatives " +
      f"(${100.0 * (total - kept) / total}%.1f%% removed as near-dups)\n")

    println("== 3b. trained quality classifier (doc_quality_model) ==")
    q("doc_quality_model").groupBy("pred_keep", "label").count()
      .orderBy("pred_keep", "label").show(truncate = false)

    println("== 3c. perplexity buckets (doc_ppl_buckets) — CCNet mix ==")
    q("doc_ppl_buckets").groupBy("lang", "bucket").count()
      .orderBy("lang", "bucket").show(12, truncate = false)

    println("== 3d. one-pass verdict (pipeline_curate) — fused stages ==")
    q("pipeline_curate").groupBy("reason").count().orderBy("reason")
      .show(truncate = false)

    println("== 4. stratified sample (doc_sample_stratified) — kept per lang ==")
    q("doc_sample_stratified").groupBy("lang").count().orderBy("lang")
      .show(10, truncate = false)

    println("== 5. sequence packing (doc_pack) — bin fill ==")
    q("doc_pack").groupBy("source", "shard", "bin")
      .agg(sum("n_tok").as("bin_tokens"), count(lit(1)).as("docs"))
      .agg(count(lit(1)).as("n_bins"),
        round(avg("bin_tokens"), 1).as("avg_tokens_per_bin"),
        round(avg("docs"), 1).as("avg_docs_per_bin"))
      .show(truncate = false)

    println("== 5b. packing audit (doc_pack_eval) — shard-tail waste ==")
    q("doc_pack_eval").show(truncate = false)

    println("== 6. token-budget mixture (doc_mix_tokens) — kept tokens per lang ==")
    q("doc_mix_tokens").groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("n_tok").as("kept_tokens"))
      .orderBy("lang").show(10, truncate = false)

    println("== 6b. temperature recipe (doc_mix_temperature) — α=0.3 reweighting ==")
    q("doc_mix_temperature").show(truncate = false)

    println("== 7. fractional-epoch upsampling (doc_upsample) — mean epochs ==")
    q("doc_upsample").groupBy("lang")
      .agg(countDistinct("doc_id").as("docs"),
        round(count(lit(1)).cast("double") / countDistinct("doc_id"), 3)
          .as("mean_epochs"))
      .orderBy("lang").show(10, truncate = false)

    println("== 8. leakage-safe split (doc_split) ==")
    q("doc_split").groupBy("split").count().orderBy("split")
      .show(truncate = false)

    println("== 8b. length curriculum (doc_curriculum) — phase boundaries ==")
    q("doc_curriculum").groupBy("phase")
      .agg(count(lit(1)).as("docs"), min("pos").as("first_pos"),
        max("pos").as("last_pos"))
      .orderBy("phase").show(truncate = false)

    println("== 9. shard plan (doc_shard_plan) — files per source ==")
    q("doc_shard_plan").groupBy("source").agg(max("n_files").as("n_files"),
      count(lit(1)).as("docs")).orderBy("source").show(10, truncate = false)

    println("== 10. LSH banding eval + s-curve sweep ==")
    q("doc_dedup_eval").show(truncate = false)
    q("doc_dedup_eval_sweep").show(truncate = false)

    println("== 11. classifier calibration (doc_quality_calibration) ==")
    q("doc_quality_calibration").show(truncate = false)

    println("== 12. governance gate before release ==")
    println("   k-anonymity audit (gov_k_anon) — suppressed rollup:")
    q("gov_k_anon").filter(col("event_type") === "__suppressed__")
      .show(truncate = false)
    println("   generalization-hierarchy release (gov_k_generalize) — rows per level:")
    q("gov_k_generalize").groupBy("level").agg(
      count(lit(1)).as("groups"), sum("n").as("rows_released"))
      .orderBy("level").show(truncate = false)
    println("   PII release audit (gov_pii_audit) — totals:")
    q("gov_pii_audit").agg(sum("n_docs").as("docs"),
      sum("n_emails").as("emails"), sum("n_phones").as("phones"),
      sum("residual_after_mask").as("residual")).show(truncate = false)
    println("   DP count release (gov_dp_counts):")
    q("gov_dp_counts").show(truncate = false)
    println("   forget audit (gov_forget_audit):")
    q("gov_forget_audit").show(truncate = false)
    println("   snapshot drift (doc_drift_psi) — headline row:")
    q("doc_drift_psi").filter(col("b") === -1L).show(truncate = false)

    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for the r16 BPE trainer contract: the verdict-r15
  * bound was that a real 32k–100k-merge vocabulary under the per-step
  * distributed loop is that many SEQUENTIAL Spark jobs. The fix
  * ([[graft.text.Bpe.learnScalable]]) pays one distributed dict pass and
  * runs the merge loop in memory — this probe MEASURES that at a real
  * merge count: dict-build wall time (the only Spark work), in-memory
  * train wall time for SPARK_GRAFT_BPE_STEPS merges (default 32768), and
  * the Spark job count before/after the train loop proving the loop ran
  * zero jobs. Printed as one JSON line (the BASELINE.md record shape).
  *
  * The fixture vocabulary saturates below 32k merges (merges stop when
  * no pair repeats); the probe reports the merges actually learned —
  * the loop still demonstrates the per-step cost at vocab scale.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val steps = sys.env.getOrElse("SPARK_GRAFT_BPE_STEPS", "32768").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val words = Tables.table(spark, sfDir, "documents")
      .select(explode(graft.text.TextFunctions.tokens(
        graft.text.TextFunctions.normalize(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // materialize the guarded collect exactly as learnScalable does, but
    // split the timing: dict pass (Spark) vs merge loop (memory)
    val dict = words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dictSec = (System.nanoTime() - t0) / 1e9

    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val t1 = System.nanoTime()
    val merges = graft.text.Bpe.learnLocalIndexed(dict, steps)
    val trainSec = (System.nanoTime() - t1) / 1e9
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length

    println(s"""{"metric":"bpe_train_probe","sf":"$sfDir","dict_words":${dict.size},"steps_requested":$steps,"merges_learned":${merges.size},"dict_pass_sec":$dictSec,"train_sec":$trainSec,"train_spark_jobs":${jobsAfter - jobsBefore},"per_merge_us":${if (merges.nonEmpty) (trainSec * 1e6 / merges.size).round else -1L}}""")

    // ---- vocab-scale leg: the fixture vocabulary saturates at ~31
    // distinct words, so the 32k-merge claim needs a REAL dict. A
    // deterministic synthetic vocabulary (md5-hex words, Zipf-ish
    // freqs — hex alphabet gives genuine shared pair structure) of
    // SPARK_GRAFT_BPE_WORDS entries (default 200k) trains the full
    // requested merge count in memory: the number that shows what a
    // production-size vocab costs per merge with zero Spark jobs.
    val nWords = sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "200000").toInt
    val syn: Map[String, Long] = (0 until nWords).map { i =>
      val w = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"bpeprobe|$i").take(8 + i % 17)
      w -> (1L + nWords.toLong / (i + 1))   // Zipf-ish by rank
    }.toMap
    val t2 = System.nanoTime()
    val synMerges = graft.text.Bpe.learnLocalIndexed(syn, steps)
    val synSec = (System.nanoTime() - t2) / 1e9
    println(s"""{"metric":"bpe_train_probe_synth","dict_words":${syn.size},"steps_requested":$steps,"merges_learned":${synMerges.size},"train_sec":$synSec,"per_merge_us":${if (synMerges.nonEmpty) (synSec * 1e6 / synMerges.size).round else -1L}}""")

    // ---- full-path corpus leg (r17, verdict-r16 #4): the two legs above
    // measure the dict pass and the in-memory loop SEPARATELY; nothing
    // yet drives learnScalable's whole composition — corpus scan →
    // tokenize → dict shuffle → counted collect → 32k in-memory merges —
    // on a corpus whose VOCABULARY is production-shaped. A deterministic
    // synthetic corpus (SPARK_GRAFT_BPE_CORPUS_DOCS documents, default
    // 200k, ~50 words each, drawn cube-skewed from a ~50k-word md5-hex
    // vocabulary) is WRITTEN TO PARQUET and read back, so the timed call
    // includes the real scan the contract promises is the only
    // corpus-height work.
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BPE_CORPUS_DOCS", "200000").toLong
    val corpusDir = java.nio.file.Files
      .createTempDirectory("bpeprobe_corpus").toString
    val vocabSize = 50000
    spark.range(nDocs).select(col("id").as("doc_id"),
        expr(s"""array_join(transform(sequence(1, 50), j ->
             substring(md5(cast(cast(pow(pmod(xxhash64(id, j), 1000000) / 1000000.0, 3)
                 * $vocabSize AS INT) as string)),
               1, 4 + cast(pow(pmod(xxhash64(id, j), 1000000) / 1000000.0, 3)
                 * $vocabSize AS INT) % 12)), ' ')""").as("text"))
      .write.mode("overwrite").parquet(corpusDir)
    val t3 = System.nanoTime()
    val corpusWords = spark.read.parquet(corpusDir)
      .select(explode(graft.text.TextFunctions.tokens(
        graft.text.TextFunctions.normalize(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val jb = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val fullMerges = graft.text.Bpe.learnScalable(spark, corpusWords, steps)
    val fullSec = (System.nanoTime() - t3) / 1e9
    val ja = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val dictWords = corpusWords.count()
    println(s"""{"metric":"bpe_train_full_path","corpus_docs":$nDocs,"corpus_tokens":${nDocs * 50},"dict_words":$dictWords,"steps_requested":$steps,"merges_learned":${fullMerges.size},"total_sec":$fullSec,"spark_jobs":${ja - jb},"per_merge_us":${if (fullMerges.nonEmpty) (fullSec * 1e6 / fullMerges.size).round else -1L}}""")
    graft.operators.Artifacts.deleteRecursively(
      java.nio.file.Paths.get(corpusDir))
    spark.stop()
  }
}

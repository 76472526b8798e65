package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.VectorQueries
import graft.streaming.{ContaminationGuard, IngestPipeline, VectorServe}
import graft.text.{QualityModel, TextFunctions}

/** Throughput measurement for the round-10 streaming surface — the
  * RelayBench discipline applied to the two new online paths:
  *
  *  1. '''Ingest''': documents/second through the FULL curation DAG
  *     ([[IngestPipeline]]: quality scoring → eval decontamination →
  *     RocksDB first-seen dedup → reason-labeled verdicts), file
  *     source → checkpointed parquet sink, `Trigger.AvailableNow`.
  *     The standing index is a planted slice of the corpus itself, so
  *     the run exercises every dead-letter branch (reported per
  *     reason).
  *  2. '''Serving''': probes/second through [[VectorServe.serve]]
  *     against the standing fixture IVF index — literal-centroid
  *     routing, stream-static candidate join on the partitioned
  *     layout, bounded top-k aggregation, update mode.
  *
  * One JSON line per leg (the BASELINE.md convention): measured
  * events/s including streaming-engine startup, never asserted.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- leg 1: ingest pipeline docs/s --------------------------------
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n = docs.count()

    // eval suite = a planted 200-doc slice → the contamination branch
    // fires on real data; model = the batch NB fit (what OnlineTrainer
    // maintains incrementally in production)
    val standing = ContaminationGuard.standingIndex(
      docs.orderBy("doc_id").limit(200))
    val labeled = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("label", QualityModel.weakLabel(col("toks")))
      .withColumn("ftoks", QualityModel.featureTokens(col("toks")))
    val model = QualityModel.fit(labeled, "ftoks", "label", d = 128)

    val src = Files.createTempDirectory("ingestbench_src").toString
    val out = Files.createTempDirectory("ingestbench_out").toString
    val chk = Files.createTempDirectory("ingestbench_chk").toString
    // replicate the corpus with offset ids so PER-DOC work dominates the
    // ~1 s fixed micro-batch floor (the RelayBench sweep lesson); the
    // replicas' identical text makes every copy beyond the first a
    // DUPLICATE — the re-crawl pattern, driving the dedup branch at
    // realistic volume
    val replicas = sys.env.getOrElse("SPARK_GRAFT_INGEST_REPLICAS", "10").toInt
    val ReplicaOffset = 10000000L
    // fail fast on id aliasing (the twin-builder guard discipline): a
    // fixture whose ids reach the offset would silently merge replicas
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    require(maxId >= 0 && maxId < ReplicaOffset,
      s"doc_id range [0, $maxId] must sit below the replica offset $ReplicaOffset")
    val big = Range(0, replicas).map(i =>
        docs.select((col("doc_id") + lit(i * ReplicaOffset)).as("doc_id"),
          col("text")))
      .reduce(_ unionByName _)
    val nBig = n * replicas
    big.write.mode("overwrite").parquet(src)

    val t0 = System.nanoTime()
    val q = IngestPipeline.curate(
        spark.readStream.schema(big.schema).parquet(src), model, standing)
      .writeStream
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
      }.start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val verdicts = spark.read.parquet(out)
    val byReason = verdicts
      .groupBy(coalesce(col("reason"), lit("admitted")).as("reason"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reasonJson = byReason.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"ingest_docs_per_sec","value":${(nBig / sec).round},"unit":"docs/s","docs":$nBig,"sec":$sec,"verdicts":{$reasonJson},"sf":"$sfDir"}""")

    // ---- leg 2: ANN serving probes/s ----------------------------------
    val ix = VectorQueries.SharedIvfIndex(spark, sfDir)
    val corpus = spark.read.parquet(ix.path)
    val probes = Tables.table(spark, sfDir, "embeddings")
      .orderBy("vec_id")
      .limit(sys.env.getOrElse("SPARK_GRAFT_SERVE_PROBES", "2048").toInt)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val nProbes = probes.count()
    val psrc = Files.createTempDirectory("servebench_src").toString
    val pout = Files.createTempDirectory("servebench_out").toString
    val pchk = Files.createTempDirectory("servebench_chk").toString
    probes.write.mode("overwrite").parquet(psrc)

    val t1 = System.nanoTime()
    val qs = VectorServe.serve(
        spark.readStream.schema(probes.schema).parquet(psrc),
        "query_id", "qvec", ix.centroids, corpus, "vec_id", "embedding",
        k = 10, nprobe = 2)
      .writeStream.outputMode("update")
      .option("checkpointLocation", pchk)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$pout/batch=$batchId")
      }.start()
    qs.awaitTermination()
    val secP = (System.nanoTime() - t1) / 1e9
    val answered = spark.read.parquet(pout)
      .select("query_id").distinct().count()
    println(s"""{"metric":"vecserve_probes_per_sec","value":${(nProbes / secP).round},"unit":"probes/s","probes":$nProbes,"answered":$answered,"k":10,"nprobe":2,"sec":$secP,"sf":"$sfDir"}""")

    spark.stop()
    Seq(src, out, chk, psrc, pout, pchk).foreach(d =>
      graft.operators.Artifacts.deleteRecursively(java.nio.file.Paths.get(d)))
  }
}

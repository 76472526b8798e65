package graft

import graft.streaming.RelayApp.RelayConfig

/** Integration-readiness for the REAL source/sink formats the reference
  * uses: `readStream.format("mongodb")` (MongoDB Spark connector v10) and
  * `writeStream.format("kafka")` (spark-sql-kafka). Neither jar ships in
  * this container, so the end-to-end wiring test is IGNORED by default —
  * but it compiles against the exact option maps `RelayConfig` produces,
  * which keeps the "drop-in relay" claim falsifiable: put the jars on the
  * classpath, flip `ignore` to `test`, point the env at live services,
  * and the identical relay transforms run against real Mongo→Kafka.
  *
  * The non-ignored tests below pin the option-map KEY SHAPES the
  * connectors expect, so a refactor that silently breaks the wiring
  * (e.g. re-prefixing the Mongo keys) fails CI even without the jars.
  */
class ConnectorReadinessSpec extends SparkSpec {

  private val cfg = RelayConfig.fromEnv(Map(
    "KAFKA_BOOTSTRAP_SERVERS" -> "broker:9092",
    "KAFKA_ACKS" -> "all",
    "MONGO_URI" -> "mongodb://mongo:27017",
    "MONGO_DB" -> "app",
    "MONGO_COLLECTION" -> "users"))

  test("mongo source options use the connector's unprefixed key shape") {
    val opts = cfg.sourceOptions
    assert(opts("connection.uri") === "mongodb://mongo:27017")
    assert(opts("database") === "app")
    assert(opts("collection") === "users")
    // UpdateLookup post-images, as the reference requests (main.go:92)
    assert(opts("change.stream.lookup.full.document") === "updateLookup")
    assert(!opts.keys.exists(_.startsWith("spark.mongodb")),
      "options() form must be unprefixed; the spark.mongodb.* prefix is SparkConf-only")
  }

  test("kafka sink options carry the kafka.-prefixed producer configs") {
    val opts = cfg.kafkaSinkOptions
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    // acks parity with the reference's producer config (main.go:33-41)
    assert(opts("kafka.acks") === "all")
    assert(opts.keys.forall(_.startsWith("kafka.")),
      "Spark's Kafka sink only forwards options prefixed with 'kafka.' to the producer")
  }

  // The real end-to-end wiring: requires mongo-spark-connector +
  // spark-sql-kafka jars and live endpoints. Kept compiling so the claim
  // stays honest; enable by flipping `ignore` -> `test`.
  ignore("relay runs against live Mongo change stream and Kafka (jars + services required)") {
    import graft.cdc.ChangeEvents
    val envelope = spark.readStream
      .format("mongodb")
      .options(cfg.sourceOptions)
      .load()
      // the connector surfaces the raw change-stream document; normalize
      // to the engine's envelope columns (ExtJSON strings for payloads)
      .selectExpr(
        "CAST(_id AS STRING) AS _id",
        "operationType",
        "CAST(clusterTime AS STRING) AS clusterTime",
        "ns",
        "to_json(documentKey) AS documentKey",
        "to_json(fullDocument) AS fullDocument",
        "to_json(updateDescription) AS updateDescription")
    val q = ChangeEvents.relay(envelope)
      .writeStream
      .format("kafka")
      .options(cfg.kafkaSinkOptions)
      .option("checkpointLocation", "/tmp/graft-relay/it-checkpoint")
      .start()
    q.processAllAvailable()
    q.stop()
  }
}

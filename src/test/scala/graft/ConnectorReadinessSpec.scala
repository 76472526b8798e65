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

  test("connector envelope normalization emits valid JSON relay values") {
    import org.apache.spark.sql.functions._
    import graft.cdc.ChangeEvents
    // a batch frame with the TYPES the mongodb connector surfaces: _id =
    // resume-token struct, clusterTime = timestamp, payloads = structs
    val typed = spark.range(1).select(
      struct(lit("82648A7B").as("_data")).as("_id"),
      lit("insert").as("operationType"),
      lit("2024-01-01 00:00:00").cast("timestamp").as("clusterTime"),
      struct(lit("app").as("db"), lit("users").as("coll")).as("ns"),
      struct(lit(12L).as("_id")).as("documentKey"),
      struct(lit(12L).as("_id"), lit("ada").as("name")).as("fullDocument"),
      lit(null).cast("string").as("updateDescription"))
    val value = ChangeEvents.relay(
        ChangeEvents.normalizeConnectorEnvelope(typed), idIsExtJson = true)
      .head().getAs[String]("value")
    // the whole value must be REAL JSON — the r2 recipe's CAST AS STRING
    // spliced unquoted timestamp text here and corrupted it
    val parsed = spark.range(1).select(
        get_json_object(lit(value), "$.clusterTime.$timestamp.t").as("t"),
        get_json_object(lit(value), "$._id._data").as("rt"),
        get_json_object(lit(value), "$.fullDocument.name").as("nm"))
      .head()
    assert(parsed.getString(0) === "1704067200")
    assert(parsed.getString(1) === "82648A7B",
      "resume token must ride as a nested document, not struct text")
    assert(parsed.getString(2) === "ada")
    assert(value.contains(""""clusterTime":{"$timestamp":{"t":1704067200,"i":0}}"""),
      value)
  }

  // The real end-to-end wiring: requires mongo-spark-connector +
  // spark-sql-kafka jars and live endpoints. Kept compiling so the claim
  // stays honest; enable by flipping `ignore` -> `test`.
  ignore("relay runs against live Mongo change stream and Kafka (jars + services required)") {
    import graft.cdc.ChangeEvents
    val envelope = ChangeEvents.normalizeConnectorEnvelope(
      spark.readStream
        .format("mongodb")
        .options(cfg.sourceOptions)
        .load())
    val q = ChangeEvents.relay(envelope, idIsExtJson = true)
      .writeStream
      .format("kafka")
      .options(cfg.kafkaSinkOptions)
      .option("checkpointLocation", "/tmp/graft-relay/it-checkpoint")
      .start()
    q.processAllAvailable()
    q.stop()
  }
}

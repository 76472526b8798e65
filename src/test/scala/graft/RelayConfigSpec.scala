package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RelayApp.RelayConfig

/** Config-surface parity with the reference's env handling
  * (main.go:28-79): same variable names, same defaults.
  */
class RelayConfigSpec extends AnyFunSuite {

  test("defaults match the reference (main.go:28-79)") {
    val c = RelayConfig.fromEnv(Map.empty)
    assert(c.kafkaBootstrapServers === "localhost:9092")
    assert(c.kafkaAcks === "all")
    assert(c.mongoUri === "mongodb://localhost:27017")
    assert(c.mongoDb === "test")
    assert(c.mongoCollection === "test_new")
  }

  test("env overrides win and flow into connector option maps") {
    val c = RelayConfig.fromEnv(Map(
      "KAFKA_BOOTSTRAP_SERVERS" -> "broker:9092",
      "KAFKA_ACKS" -> "1",
      "MONGO_URI" -> "mongodb://replica:27017",
      "MONGO_DB" -> "prod",
      "MONGO_COLLECTION" -> "events"))
    assert(c.kafkaSinkOptions === Map(
      "kafka.bootstrap.servers" -> "broker:9092", "kafka.acks" -> "1"))
    assert(c.sourceOptions("database") === "prod")
    assert(c.sourceOptions("collection") === "events")
    // UpdateLookup post-image parity (main.go:92)
    assert(c.sourceOptions("change.stream.lookup.full.document")
      === "updateLookup")
  }
}

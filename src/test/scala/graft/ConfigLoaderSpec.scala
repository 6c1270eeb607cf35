package graft

import graft.config.ConfigLoader
import org.scalatest.funsuite.AnyFunSuite

class ConfigLoaderSpec extends AnyFunSuite {

  private val good =
    """{
      |  "source": {"type": "postgres"},
      |  "sink": {"type": "kafka"},
      |  "format": "json",
      |  "streams": [
      |    {"name": "users", "resource": "users",
      |     "operations": ["INSERT", "update"],
      |     "destination": "cdc.users"},
      |    {"name": "orders", "resource": "sales.orders",
      |     "operations": ["insert", "read"],
      |     "destination": "cdc.orders", "routing_key": "order_id"}
      |  ]
      |}""".stripMargin

  test("loads, normalizes and validates the reference config shape") {
    val cfg = ConfigLoader.fromJsonText(good)
    assert(cfg.streams.map(_.resource) == Seq("public.users", "sales.orders"))
    assert(cfg.streams.head.operations == Seq("insert", "update"))
    assert(cfg.streams.head.routingKey == "id") // default (config.zig:110)
    assert(cfg.streams(1).routingKey == "order_id")
    assert(cfg.streams(1).needsInitialSnapshot)
  }

  test("defaults: source postgres, sink kafka, format json") {
    val cfg = ConfigLoader.fromJsonText(
      """{"streams":[{"name":"t","resource":"t","operations":["insert"],"destination":"d"}]}""")
    assert(cfg.sourceType == "postgres" && cfg.sinkType == "kafka" && cfg.format == "json")
  }

  test("invalid configs raise with every violation collected") {
    val ex = intercept[ConfigLoader.ConfigError](ConfigLoader.fromJsonText(
      """{"source":{"type":"mysql"},"streams":[
        |{"name":"a","resource":"t","operations":["upsert"],"destination":"d"},
        |{"name":"a","resource":"t2","operations":["insert"],"destination":"d"}]}""".stripMargin))
    assert(ex.errors.exists(_.contains("mysql")))
    assert(ex.errors.exists(_.contains("upsert")))
    assert(ex.errors.exists(_.contains("duplicate")))
  }

  test("missing required field raises") {
    intercept[ConfigLoader.ConfigError](ConfigLoader.fromJsonText(
      """{"streams":[{"resource":"t","operations":["insert"],"destination":"d"}]}"""))
  }

  test("postgres source block: connection via env var, identifier hardening") {
    val cfg = ConfigLoader.fromJsonText(
      """{"source":{"type":"postgres","postgres":{
        |  "connection_env":"GRAFT_PG_URL","slot_name":"graft_slot",
        |  "publication_name":"graft_pub"}},
        |"streams":[{"name":"t","resource":"t","operations":["insert"],"destination":"d"}]}""".stripMargin)
    val pg = cfg.postgres.get
    assert(pg.slotName == "graft_slot" && pg.publicationName == "graft_pub")
    // connection string lives in the environment, never in the file
    // (reference: config.zig:36-44 connection_env contract)
    assert(pg.connectionEnv == "GRAFT_PG_URL")
    // absent block stays None — walDir-fed deployments need no connection
    assert(ConfigLoader.fromJsonText(
      """{"streams":[{"name":"t","resource":"t","operations":["insert"],"destination":"d"}]}""")
      .postgres.isEmpty)
    // identifier hardening: a quoted/hostile slot name is a config error
    val ex = intercept[ConfigLoader.ConfigError](ConfigLoader.fromJsonText(
      """{"source":{"postgres":{"connection_env":"E","slot_name":"Bad-Name; DROP",
        |  "publication_name":"ok_pub"}},
        |"streams":[{"name":"t","resource":"t","operations":["insert"],"destination":"d"}]}""".stripMargin))
    assert(ex.errors.exists(_.contains("slot_name")))
  }
}

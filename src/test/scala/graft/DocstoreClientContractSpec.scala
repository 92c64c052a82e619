package graft

import graft.sources._

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Runs [[DocstoreClientContractKit]] against the shipped
  * [[FileDocstoreClient]], and proves the kit FAILS LOUDLY against
  * deliberately broken client doubles (a kit that passes everything
  * verifies nothing). */
class DocstoreClientContractSpec extends AnyFunSuite {

  private def mkStore(): String = {
    val root = Files.createTempDirectory("dscontract").toString
    Files.createDirectories(Paths.get(s"$root/shop"))
    Files.writeString(Paths.get(s"$root/shop/users.jsonl"),
      """{"_id": 1, "name": "ada", "age": 36}
        |{"_id": 2, "name": "lin", "age": 29}
        |""".stripMargin)
    Files.writeString(Paths.get(s"$root/shop/orders.jsonl"),
      """{"_id": 10, "user_id": 1, "total": 9.5}
        |""".stripMargin)
    root
  }

  private def env(root: String,
      extra: Map[String, String] = Map.empty): DocstoreClientContractKit.Env =
    DocstoreClientContractKit.Env(
      options = Map("root" -> root) ++ extra,
      badEndpointOptions =
        Map("root" -> s"$root/graft_contract_no_such_dir") ++ extra,
      fixture = Map("shop" -> Map("users" -> 2, "orders" -> 1)),
      appendDocWithNewField = (ns, coll, field) =>
        Files.writeString(Paths.get(s"$root/$ns/$coll.jsonl"),
          s"""{"_id": 999, "$field": 1}\n""",
          StandardOpenOption.APPEND))

  test("FileDocstoreClient passes the full adapter contract kit") {
    DocstoreClientContractKit.run(env(mkStore()))
  }

  test("the kit fails loudly against a ping-less client double") {
    val e = intercept[AssertionError] {
      DocstoreClientContractKit.run(env(mkStore(),
        Map("client" -> classOf[NoPingDocstoreClient].getName)))
    }
    assert(e.getMessage.contains("§2") || e.getMessage.contains("§3"),
      e.getMessage)
  }

  test("the kit fails loudly against a stale-cache client double") {
    val e = intercept[AssertionError] {
      DocstoreClientContractKit.run(env(mkStore(),
        Map("client" -> classOf[StaleCacheDocstoreClient].getName)))
    }
    assert(e.getMessage.contains("§8"), e.getMessage)
  }
}

/** Broken double: accepts ANY endpoint and option set — the adapter
  * that defers validation to first query, which the reference's attach
  * tests forbid. */
class NoPingDocstoreClient(root: String, options: Map[String, String])
    extends FileDocstoreClient(
      root, options - "client" - "graft_contract_bogus_option") {
  override def ping(): Unit = ()
}

/** Broken double: invalidate/clearCache are no-ops — schemas go stale
  * forever. */
class StaleCacheDocstoreClient(root: String, options: Map[String, String])
    extends FileDocstoreClient(root, options - "client") {
  override def invalidate(namespace: String, coll: String): Unit = ()
  override def clearCache(): Unit = ()
}

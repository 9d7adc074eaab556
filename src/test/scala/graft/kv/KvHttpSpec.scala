package graft.kv

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec

/** Integration test for the HTTP shim (A1–A4): real sockets, all four
  * routes, and error-envelope parity with the engine's reference-derived
  * error taxonomy (the same strings KvEngineSpec pins).
  */
class KvHttpSpec extends SparkSpec {

  private def get(port: Int, path: String): HttpResponse[String] = {
    val client = HttpClient.newHttpClient()
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  }

  private def withServer(autoCreate: Boolean)(f: (KvHttpServer, Int) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("kvhttp").toString
    val engine = new KvEngine(spark, dir, autoCreate)
    val server = new KvHttpServer(engine, port = 0)
    server.start()
    try f(server, server.boundPort)
    finally server.stop(flush = false)
  }

  test("A1 /ready answers 200 with no body") {
    withServer(autoCreate = true) { (_, port) =>
      val r = get(port, "/ready")
      assert(r.statusCode() == 200 && r.body().isEmpty)
    }
  }

  test("A2 /collections lists collections; empty engine encodes as null (Go nil slice)") {
    withServer(autoCreate = true) { (_, port) =>
      assert(get(port, "/collections").body() == "null\n")
      get(port, "/collections/metrics/k1/v1")
      get(port, "/collections/audit/k1/v1")
      assert(get(port, "/collections").body() == "[\"audit\",\"metrics\"]\n")
    }
  }

  test("A3/A4 write then read round-trips through the engine") {
    withServer(autoCreate = true) { (_, port) =>
      val w = get(port, "/collections/metrics/cpu/0.93")
      assert(w.statusCode() == 200 && w.body().isEmpty)
      val r = get(port, "/collections/metrics/cpu")
      assert(r.statusCode() == 200 && r.body() == "{\"data\":\"0.93\"}\n")
      // last-write-wins through the same route
      get(port, "/collections/metrics/cpu/0.95")
      assert(get(port, "/collections/metrics/cpu").body() == "{\"data\":\"0.95\"}\n")
    }
  }

  test("error envelope carries the reference's exact message strings with code 500") {
    withServer(autoCreate = true) { (_, port) =>
      get(port, "/collections/metrics/cpu/1.0")
      val missingKey = get(port, "/collections/metrics/nope")
      assert(missingKey.statusCode() == 500)
      assert(missingKey.body() ==
        "{\"code\":500,\"message\":\"no value found for key [nope] in collection [metrics]\"}\n")
    }
    withServer(autoCreate = false) { (_, port) =>
      val missingCol = get(port, "/collections/ghost/k")
      assert(missingCol.statusCode() == 500)
      assert(missingCol.body() ==
        "{\"code\":500,\"message\":\"no collection found for id [ghost]\"}\n")
      // writes to a missing collection also fail without autoCreate
      val badWrite = get(port, "/collections/ghost/k/v")
      assert(badWrite.statusCode() == 500)
      assert(badWrite.body().contains("no collection found for id [ghost]"))
    }
  }

  test("unknown routes 404; URL-encoded segments decode before reaching the engine") {
    withServer(autoCreate = true) { (_, port) =>
      assert(get(port, "/nope").statusCode() == 404)
      assert(get(port, "/collections/a/b/c/d").statusCode() == 404)
      get(port, "/collections/metrics/hello%20world/a%2Fb")
      assert(get(port, "/collections/metrics/hello%20world").body() == "{\"data\":\"a/b\"}\n")
      // a literal '+' in a path segment stays '+' (no query-string semantics)
      get(port, "/collections/metrics/a+b/c+d")
      assert(get(port, "/collections/metrics/a+b").body() == "{\"data\":\"c+d\"}\n")
    }
  }

  test("shutdown flush moves hot collections to cold storage (A5 semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("kvhttp").toString
    val engine = new KvEngine(spark, dir, autoCreate = true)
    val server = new KvHttpServer(engine, port = 0)
    server.start()
    get(server.boundPort, "/collections/metrics/cpu/0.5")
    val errs = server.stop(flush = true)
    assert(errs.isEmpty)
    assert(!engine.isHotTier("metrics") && engine.collectionExists("metrics"))
    assert(engine.readKey("metrics", "cpu") == "0.5")
  }
}

package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** S1/S9/S11 against a loopback HTTP server — the REST edges run for
  * real (sockets, headers, status branching), no external network.
  */
class HttpSpec extends SparkSpec {

  private def withServer(routes: Map[String, (Int, String)])(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, (status, resp)) =>
      server.createContext(path, (ex: HttpExchange) => {
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    // default 404
    server.createContext("/", (ex: HttpExchange) => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("S11: token fetched once, cached until near expiry, then refreshed") {
    var clock = 1000L
    var calls = 0
    val src = new Http.TokenSource(
      fetchToken = () => { calls += 1; (s"tok-$calls", 100L) },
      now = () => clock)
    assert(src.token() === "tok-1")
    clock += 50 // expiry 1100, safety 30 -> still valid until 1070
    assert(src.token() === "tok-1")
    clock += 25 // 1075 >= 1070 -> refresh
    assert(src.token() === "tok-2")
    assert(calls === 2)
  }

  test("S11: oauth client-credentials parses token endpoint response") {
    withServer(Map("/oauth/token" ->
      (200, """{"access_token": "abc123", "token_type": "bearer", "expires_in": 86399}"""))) { base =>
      val (tok, exp) = Http.oauthClientCredentials(s"$base/oauth/token", "id", "secret")()
      assert(tok === "abc123")
      assert(exp === 86399L)
    }
  }

  test("S1: bulk auctions dump GET, raise on error status") {
    withServer(Map("/data/wow/connected-realm/3209/auctions" ->
      (200, """{"auctions": [{"id": 1}]}"""))) { base =>
      val body = Http.fetchAuctionsDump(base, 3209L, "tok")
      assert(body.contains("\"auctions\""))
      intercept[Http.HttpError] {
        Http.fetchAuctionsDump(base, 9999L, "tok") // unrouted -> 404
      }
    }
  }

  test("S9: item lookup — 200 parses, 404 skips, 500 backs off to None") {
    val payload =
      """{"id": 190320, "name": "Ethereal Blade",
        |"quality": {"name": "Epic"}, "item_class": {"name": "Weapon"},
        |"item_subclass": {"name": "Sword"}}""".stripMargin
    withServer(Map(
      "/data/wow/item/190320" -> (200, payload),
      "/data/wow/item/666" -> (500, "boom"))) { base =>
      val tokens = new Http.TokenSource(() => ("t", 3600L))
      val src = Http.restItemSource(base, tokens)
      val got = src.fetch(190320L)
      assert(got.isDefined)
      assert(got.get.name === Some("Ethereal Blade"))
      assert(got.get.quality === Some("Epic"))
      assert(src.fetch(12345L) === None) // 404
      assert(Http.fetchItem(base, 666L, "t", backoffMs = 1) === None) // 500
    }
  }
}

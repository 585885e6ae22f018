package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Driver-side REST edges (SURVEY §2.1 S1/S9/S11). These are NOT Spark
  * operators — the reference issues one bulk request and <=100 point
  * lookups per run (`data_pipeline/assets/bronze/ingestion.py:14-31`,
  * `assets/silver/dimensions.py:29-66`), so they stay on the driver and
  * the cluster never blocks on a rate-limited HTTP client.
  *
  * Endpoints are injectable (base URLs as parameters) so the whole
  * stack is testable against a loopback server in this zero-egress
  * environment; nothing here hardcodes an external service.
  */
object Http {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  final case class HttpError(status: Int, body: String)
      extends RuntimeException(s"HTTP $status: ${body.take(200)}")

  private def get(url: String, timeout: Duration,
      headers: Seq[(String, String)] = Nil): Either[Int, String] = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 200) Right(resp.body()) else Left(resp.statusCode())
  }

  /** S11 — OAuth client-credentials token source with expiry cache:
    * a token is reused until 30 s before it expires, then refreshed
    * (reference `data_pipeline/utils/blizzard_auth.py:8-47`). The
    * fetch and clock are injectable for tests.
    */
  final class TokenSource(
      fetchToken: () => (String, Long), // (token, expires_in seconds)
      now: () => Long = () => System.currentTimeMillis() / 1000,
      safetyWindowSec: Long = 30) {
    @volatile private var cached: Option[(String, Long)] = None // (token, expiry epoch-sec)
    var fetchCount: Int = 0 // observable for tests

    def token(): String = synchronized {
      cached match {
        case Some((t, exp)) if now() < exp - safetyWindowSec => t
        case _ =>
          val (t, expiresIn) = fetchToken()
          fetchCount += 1
          cached = Some((t, now() + expiresIn))
          t
      }
    }
  }

  /** POST client-credentials grant against an OAuth token endpoint;
    * returns the raw fetch function a [[TokenSource]] wraps.
    */
  def oauthClientCredentials(
      tokenUrl: String, clientId: String, clientSecret: String): () => (String, Long) =
    () => {
      val basic = java.util.Base64.getEncoder.encodeToString(
        s"$clientId:$clientSecret".getBytes("UTF-8"))
      val req = HttpRequest.newBuilder(URI.create(tokenUrl))
        .timeout(Duration.ofSeconds(10))
        .header("Authorization", s"Basic $basic")
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString("grant_type=client_credentials"))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) throw HttpError(resp.statusCode(), resp.body())
      // minimal JSON field extraction (access_token + expires_in)
      val body = resp.body()
      val token = """"access_token"\s*:\s*"([^"]+)"""".r
        .findFirstMatchIn(body).map(_.group(1))
        .getOrElse(throw HttpError(200, s"no access_token in $body"))
      val expires = """"expires_in"\s*:\s*(\d+)""".r
        .findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(3600L)
      (token, expires)
    }

  /** S1 — bulk auctions dump: one GET, 60 s timeout, raise on error
    * (reference `ingestion.py:14-31`). Returns the raw JSON document.
    */
  def fetchAuctionsDump(baseUrl: String, realmId: Long, token: String,
      timeout: Duration = Duration.ofSeconds(60)): String =
    get(s"$baseUrl/data/wow/connected-realm/$realmId/auctions?namespace=dynamic-us",
      timeout, Seq("Authorization" -> s"Bearer $token")) match {
      case Right(body) => body
      case Left(status) => throw HttpError(status, "auctions dump failed")
    }

  /** S9 — per-item point lookup: 10 s timeout, 404 -> None (skip),
    * other non-200 -> None after a backoff pause
    * (reference `dimensions.py:29-66`).
    */
  def fetchItem(baseUrl: String, itemId: Long, token: String,
      timeout: Duration = Duration.ofSeconds(10),
      backoffMs: Long = 1000): Option[String] =
    get(s"$baseUrl/data/wow/item/$itemId?namespace=static-us&locale=pt_BR",
      timeout, Seq("Authorization" -> s"Bearer $token")) match {
      case Right(body) => Some(body)
      case Left(404) => None
      case Left(_) => Thread.sleep(backoffMs); None
    }

  /** [[graft.silver.Dimensions.ItemMetadataSource]] backed by the REST
    * point lookup — parses the reference payload shape
    * (`dimensions.py:43-52`) with nested-name defaults left to
    * `Dimensions.enrich`.
    */
  def restItemSource(baseUrl: String, tokens: TokenSource):
      graft.silver.Dimensions.ItemMetadataSource =
    new graft.silver.Dimensions.ItemMetadataSource {
      // Jackson ships with Spark — proper JSON traversal, not regex.
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      private def nestedName(node: com.fasterxml.jackson.databind.JsonNode,
          outer: String): Option[String] =
        Option(node.get(outer)).flatMap(o => Option(o.get("name")))
          .filter(_.isTextual).map(_.asText)
      override def fetch(itemId: Long): Option[graft.silver.Dimensions.ItemPayload] =
        fetchItem(baseUrl, itemId, tokens.token()).map { body =>
          val node = mapper.readTree(body)
          graft.silver.Dimensions.ItemPayload(
            name = Option(node.get("name")).filter(_.isTextual).map(_.asText),
            quality = nestedName(node, "quality"),
            itemClass = nestedName(node, "item_class"),
            itemSubclass = nestedName(node, "item_subclass"))
        }
    }
}

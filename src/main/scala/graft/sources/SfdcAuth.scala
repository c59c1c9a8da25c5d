package graft.sources

import java.io.ByteArrayInputStream
import java.net.URL

import javax.xml.parsers.DocumentBuilderFactory

/** S6/S7 protocol logic for the reference's SOAP login and auth-failure
  * recovery — envelope build, response parse, endpoint derivation, the
  * 401/403 classification, and (r16) the LIVE login POST + the
  * bearer-token-provider binding that feeds [[BayeuxTransport]], so the
  * whole connector chain (login → long-poll → bus → micro-batch) runs
  * over real HTTP (loopback-gated in the sandbox; no SFDC reachable).
  *
  * S7 (`subscriber/.../LoginHelper.java:91-159`): build the partner-API
  * SOAP login envelope, parse the response for sessionId / serverUrl /
  * faultstring, and derive the CometD replay endpoint from the returned
  * server URL + API version (pre-37 versions used the `/cometd/replay/`
  * path — `LoginHelper.java:80-81,143-146`).
  *
  * S6 (`EmpConnector.java:334-368`): classify a failed Bayeux meta-channel
  * message — reauthenticate iff the error field OR ext.sfdc.failureReason
  * starts with 401 or 403.
  *
  * Divergence from the reference (documented like quirk Q1): credentials
  * are XML-escaped when building the envelope; the reference concatenates
  * them raw (`LoginHelper.java:165-168`), so a password containing `<` or
  * `&` produced a malformed login request.
  */
object SfdcAuth {

  val LoginEndpoint = "https://login.salesforce.com"

  /** Partner SOAP login path (`LoginHelper.java:89`). */
  val SoapUri = "/services/Soap/u/44.0/"

  /** Default API version (`BayeuxParameters.java:100-102`). */
  val DefaultVersion = "43.0"

  final case class LoginResult(sessionId: String, serverUrl: String, replayEndpoint: String)
  final case class LoginFault(faultstring: String)

  private def escapeXml(s: String): String = s.flatMap {
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '&' => "&amp;"
    case '\'' => "&apos;"
    case '"' => "&quot;"
    case c => c.toString
  }

  /** The SOAP login request body (`LoginHelper.java:83-89,165-168`). */
  def loginEnvelope(username: String, password: String): String =
    "<soapenv:Envelope xmlns:soapenv='http://schemas.xmlsoap.org/soap/envelope/' " +
      "xmlns:xsi='http://www.w3.org/2001/XMLSchema-instance' " +
      "xmlns:urn='urn:partner.soap.sforce.com'><soapenv:Body>" +
      "  <urn:login>" +
      s"    <urn:username>${escapeXml(username)}</urn:username>" +
      s"    <urn:password>${escapeXml(password)}</urn:password>" +
      "  </urn:login>" +
      "</soapenv:Body></soapenv:Envelope>"

  /** CometD path by API version (`LoginHelper.java:80-81,143`). */
  def cometdPath(version: String): String =
    if (version.toFloat < 37) "/cometd/replay/" else "/cometd/"

  /** Replay endpoint from the login response's server URL
    * (`LoginHelper.java:142-146`): protocol/host/port of serverUrl with
    * the version-dependent CometD path. */
  def replayEndpoint(serverUrl: String, version: String = DefaultVersion): String = {
    val u = new URL(serverUrl)
    new URL(u.getProtocol, u.getHost, u.getPort, cometdPath(version) + version).toString
  }

  /** Parse a SOAP login response (`LoginHelper.java:31-79,127-141`):
    * Right(result) when sessionId AND serverUrl are present, otherwise
    * Left(faultstring) — exactly the reference's null check + fault
    * message. The parser is hardened the same way (no doctype, no
    * external entities). */
  def parseLoginResponse(
      xml: String, version: String = DefaultVersion): Either[LoginFault, LoginResult] = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))
    def text(local: String): Option[String] = {
      val ns = doc.getElementsByTagNameNS("*", local)
      if (ns.getLength > 0) Option(ns.item(0).getTextContent) else None
    }
    (text("sessionId"), text("serverUrl")) match {
      case (Some(sid), Some(url)) =>
        Right(LoginResult(sid, url, replayEndpoint(url, version)))
      case _ =>
        Left(LoginFault(text("faultstring").getOrElse("Unable to login")))
    }
  }

  /** S7 live wire (r16 — closes the last "deployment config" note): POST
    * the SOAP login envelope and parse the response, the reference's
    * `LoginHelper.login(url, user, pass)` over JDK `java.net.http` (the
    * same no-dependency posture as [[BayeuxTransport]]). Wire shape per
    * `LoginHelper.java:114-125`: POST to `<host>/services/Soap/u/44.0/`,
    * `Content-Type: text/xml`, `SOAPAction: ''`, `PrettyPrint: Yes`.
    * Returns Right(sessionId + serverUrl + derived replay endpoint) or
    * Left(faultstring) — the parse and endpoint derivation are the
    * already-gated [[parseLoginResponse]]. */
  def login(loginHost: java.net.URI, username: String, password: String,
            version: String = DefaultVersion): Either[LoginFault, LoginResult] = {
    val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    val req = java.net.http.HttpRequest
      .newBuilder(loginHost.resolve(SoapUri))
      .header("Content-Type", "text/xml")
      .header("SOAPAction", "''")
      .header("PrettyPrint", "Yes")
      .POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(loginEnvelope(username, password)))
      .build()
    val resp = http.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    parseLoginResponse(resp.body(), version)
  }

  /** The reference's bearer-token provider contract
    * (`EmpConnector.java:165-173`, `example/BearerTokenProvider.java`):
    * a `Boolean => String` that returns the cached session id and
    * RE-LOGINS when called with `force = true` — exactly what
    * [[BayeuxTransport]] takes. Throws the fault on a failed login (the
    * transport's next cycle retries through its error path). */
  def tokenProvider(loginHost: java.net.URI, username: String,
                    password: String,
                    version: String = DefaultVersion): Boolean => String = {
    val cached = new java.util.concurrent.atomic.AtomicReference[String](null)
    force => {
      if (force || cached.get() == null)
        login(loginHost, username, password, version) match {
          case Right(r) => cached.set(r.sessionId)
          case Left(f) => throw new IllegalStateException(
            s"Unable to login: ${f.faultstring}")
        }
      cached.get()
    }
  }

  /** S6 classification (`EmpConnector.java:341-355`): a FAILED message
    * triggers re-authentication iff its error field or
    * ext.sfdc.failureReason starts with 401 or 403. */
  def shouldReauthenticate(
      successful: Boolean,
      error: Option[String],
      failureReason: Option[String]): Boolean =
    !successful && Seq("401", "403").exists(code =>
      error.exists(_.startsWith(code)) || failureReason.exists(_.startsWith(code)))

  /** JSON-message form of [[shouldReauthenticate]]: reads the Bayeux
    * fields the reference reads — `successful`, `error`, and
    * `ext.sfdc.failureReason` (`EmpConnector.java:349-367`). */
  /** Shared, thread-safe (Jackson mappers are built once by design; the
    * classifier runs per failed meta message). */
  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def shouldReauthenticate(bayeuxMessageJson: String): Boolean = {
    val m = mapper.readTree(bayeuxMessageJson)
    def str(n: com.fasterxml.jackson.databind.JsonNode): Option[String] =
      if (n != null && n.isTextual) Some(n.asText) else None
    val successful = m.path("successful").asBoolean(false)
    val error = str(m.get("error"))
    val failureReason = str(m.path("ext").path("sfdc").get("failureReason"))
    shouldReauthenticate(successful, error, failureReason)
  }
}

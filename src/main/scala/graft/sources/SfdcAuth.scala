package graft.sources

import java.io.ByteArrayInputStream
import java.net.URL

import javax.xml.parsers.DocumentBuilderFactory

/** S6/S7 protocol logic — the network-free core of the reference's SOAP
  * login and auth-failure recovery, implemented so the custom source's
  * connector seam is complete; only the HTTP transport itself remains
  * deployment config (no Salesforce reachable from the sandbox).
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

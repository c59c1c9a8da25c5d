package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SfdcAuth

/** S6/S7 protocol logic against canned wire shapes (the transport needs a
  * live org; everything up to and after the HTTP call is under test). */
class SfdcAuthSpec extends AnyFunSuite {

  private val successXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/"
      |    xmlns="urn:partner.soap.sforce.com">
      |  <soapenv:Body>
      |    <loginResponse><result>
      |      <metadataServerUrl>https://na1.salesforce.com/services/Soap/m/44.0/00D</metadataServerUrl>
      |      <serverUrl>https://na1.salesforce.com/services/Soap/u/44.0/00Dx0</serverUrl>
      |      <sessionId>00Dx0!AQcAQH0dMHZfz972Szmpkb58urFRkgeBGsxL</sessionId>
      |    </result></loginResponse>
      |  </soapenv:Body>
      |</soapenv:Envelope>""".stripMargin

  private val faultXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/"
      |    xmlns:sf="urn:fault.partner.soap.sforce.com">
      |  <soapenv:Body>
      |    <soapenv:Fault>
      |      <faultcode>sf:INVALID_LOGIN</faultcode>
      |      <faultstring>INVALID_LOGIN: Invalid username, password, security token; or user locked out.</faultstring>
      |    </soapenv:Fault>
      |  </soapenv:Body>
      |</soapenv:Envelope>""".stripMargin

  test("S7: success response yields sessionId, serverUrl, and the replay endpoint") {
    val r = SfdcAuth.parseLoginResponse(successXml)
    assert(r.isRight)
    val ok = r.toOption.get
    assert(ok.sessionId.startsWith("00Dx0!"))
    assert(ok.serverUrl.startsWith("https://na1.salesforce.com/"))
    // protocol/host of serverUrl + version-dependent CometD path
    assert(ok.replayEndpoint == "https://na1.salesforce.com/cometd/43.0")
  }

  test("S7: fault response surfaces the faultstring; old API versions use /cometd/replay/") {
    val r = SfdcAuth.parseLoginResponse(faultXml)
    assert(r.isLeft)
    assert(r.swap.toOption.get.faultstring.startsWith("INVALID_LOGIN"))
    assert(SfdcAuth.replayEndpoint("https://na1.salesforce.com/x", "36.0") ==
      "https://na1.salesforce.com/cometd/replay/36.0")
  }

  test("S7: login envelope carries the partner-API shape and escapes credentials") {
    val env = SfdcAuth.loginEnvelope("user@example.com", "p<&>'\"w")
    assert(env.contains("urn:partner.soap.sforce.com"))
    assert(env.contains("<urn:username>user@example.com</urn:username>"))
    // reference concatenated raw (LoginHelper.java:165-168) — we escape
    assert(env.contains("p&lt;&amp;&gt;&apos;&quot;w"))
    assert(!env.contains("p<&>"))
  }

  test("S7: doctype/external entities are rejected (hardened like the reference parser)") {
    val evil = """<?xml version="1.0"?><!DOCTYPE x [<!ENTITY e SYSTEM "file:///etc/passwd">]>
                 |<r>&e;</r>""".stripMargin
    intercept[Exception](SfdcAuth.parseLoginResponse(evil))
  }

  test("S6: 401/403 on error field or ext.sfdc.failureReason trigger reauth; others don't") {
    assert(SfdcAuth.shouldReauthenticate(successful = false,
      error = Some("401::Authentication invalid"), failureReason = None))
    assert(SfdcAuth.shouldReauthenticate(successful = false,
      error = None, failureReason = Some("403::Handshake denied")))
    // a successful message never triggers, whatever the fields say
    assert(!SfdcAuth.shouldReauthenticate(successful = true,
      error = Some("401::x"), failureReason = None))
    // non-auth errors (e.g. 503) are not reauth events
    assert(!SfdcAuth.shouldReauthenticate(successful = false,
      error = Some("503::Server too busy"), failureReason = None))
  }

  test("S6: Bayeux JSON form reads successful/error/ext.sfdc.failureReason") {
    assert(SfdcAuth.shouldReauthenticate(
      """{"channel":"/meta/connect","successful":false,
        |"error":"401::Authentication invalid"}""".stripMargin))
    assert(SfdcAuth.shouldReauthenticate(
      """{"channel":"/meta/handshake","successful":false,
        |"ext":{"sfdc":{"failureReason":"403::Handshake denied"}}}""".stripMargin))
    assert(!SfdcAuth.shouldReauthenticate(
      """{"channel":"/meta/connect","successful":true}"""))
    assert(!SfdcAuth.shouldReauthenticate(
      """{"channel":"/meta/connect","successful":false,"error":"402::other"}"""))
  }
}

package graft

import java.net.{InetSocketAddress, URI}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{BayeuxTransport, ReplayBus}

/** Live Bayeux long-poll transport (r15 verdict missing #1) against an
  * in-process HTTP fixture speaking the server side of the protocol:
  * handshake/subscribe/connect, replay-extension resume, session loss +
  * re-handshake, and the 401/403 reauthentication matrix in both shapes
  * the reference classifies (error field, ext.sfdc.failureReason —
  * `EmpConnector.java:334-368`). The fixture binds 127.0.0.1 only. */
class BayeuxTransportSpec extends SparkSpec {

  private val om = new ObjectMapper()

  /** Minimal Bayeux server: per-client delivery cursors seeded from the
    * subscribe replay ext (-2 earliest / -1 tip / explicit), one-shot
    * advice injection, revocable sessions and tokens. */
  private class FakeBayeuxServer {
    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var validToken = "tok-1"
    /** "error" -> `error:"401::.."`; "sfdc" -> ext.sfdc.failureReason. */
    @volatile var authErrorStyle = "error"
    @volatile var oneShotAdvice: String = null
    /** One-shot response delay (ms) — exercises the maxNetworkDelay knob. */
    @volatile var oneShotDelayMs: Long = 0L
    private val clientSeq = new AtomicInteger()
    val liveSessions: mutable.Set[String] = mutable.Set.empty[String]
    private val events = mutable.Map.empty[String, mutable.ArrayBuffer[(Long, String)]]
    private val cursors = mutable.Map.empty[(String, String), Long]
    /** (clientId, topic, replay-ext map) per subscribe — for assertions. */
    val subscribes: mutable.ArrayBuffer[(String, String, Map[String, Long])] =
      mutable.ArrayBuffer.empty

    def publish(topic: String, payload: String): Long = synchronized {
      val b = events.getOrElseUpdate(topic, mutable.ArrayBuffer.empty)
      val id = b.lastOption.map(_._1 + 1).getOrElse(1L)
      b += ((id, payload)); id
    }
    private def tip(topic: String): Long =
      events.get(topic).flatMap(_.lastOption).map(_._1).getOrElse(0L)

    private def authFail(channel: String): String = authErrorStyle match {
      case "sfdc" =>
        s"""[{"channel":"$channel","successful":false,
           |"ext":{"sfdc":{"failureReason":"403::Handshake denied"}}}]""".stripMargin
      case _ =>
        s"""[{"channel":"$channel","successful":false,"error":"401::Authentication invalid"}]"""
    }

    server.createContext("/cometd/43.0", (x: HttpExchange) => {
      if (oneShotDelayMs > 0) {
        val d = oneShotDelayMs; oneShotDelayMs = 0L; Thread.sleep(d)
      }
      val req = om.readTree(x.getRequestBody).asInstanceOf[ArrayNode].get(0)
      val channel = req.path("channel").asText()
      val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      val body: String =
        if (auth != validToken) authFail(channel)
        else channel match {
          case "/meta/handshake" =>
            val cid = s"client-${clientSeq.incrementAndGet()}"
            synchronized { liveSessions += cid }
            s"""[{"channel":"/meta/handshake","successful":true,
               |"clientId":"$cid","ext":{"replay":true}}]""".stripMargin
          case "/meta/subscribe" =>
            val cid = req.path("clientId").asText()
            val topic = req.path("subscription").asText()
            val replayExt = req.path("ext").path("replay")
            val m = replayExt.properties().asScala
              .map(e => e.getKey -> e.getValue.asLong()).toMap
            synchronized {
              if (!liveSessions.contains(cid))
                s"""[{"channel":"/meta/subscribe","successful":false,
                   |"error":"402::Unknown client","advice":{"reconnect":"handshake"}}]""".stripMargin
              else {
                subscribes += ((cid, topic, m))
                val from = m.getOrElse(topic, -2L) match {
                  case -2L => 0L
                  case -1L => tip(topic)
                  case n => n
                }
                cursors((cid, topic)) = from
                s"""[{"channel":"/meta/subscribe","successful":true,"subscription":"$topic"}]"""
              }
            }
          case "/meta/connect" =>
            val cid = req.path("clientId").asText()
            synchronized {
              if (!liveSessions.contains(cid))
                s"""[{"channel":"/meta/connect","successful":false,
                   |"error":"402::Unknown client session",
                   |"advice":{"reconnect":"handshake"}}]""".stripMargin
              else if (oneShotAdvice != null) {
                val adv = oneShotAdvice; oneShotAdvice = null
                s"""[{"channel":"/meta/connect","successful":true,
                   |"advice":{"reconnect":"$adv"}}]""".stripMargin
              } else {
                val msgs = cursors.toSeq.collect { case ((c, t), from) if c == cid =>
                  val pend = events.getOrElse(t, mutable.ArrayBuffer.empty)
                    .filter(_._1 > from)
                  if (pend.nonEmpty) cursors((c, t)) = pend.last._1
                  pend.map { case (id, payload) =>
                    s"""{"channel":"$t","data":{"event":{"replayId":$id},"payload":$payload}}"""
                  }
                }.flatten
                (msgs :+ s"""{"channel":"/meta/connect","successful":true}""")
                  .mkString("[", ",", "]")
              }
            }
          case other =>
            s"""[{"channel":"$other","successful":false,"error":"404::unknown channel"}]"""
        }
      val bytes = body.getBytes("UTF-8")
      x.getResponseHeaders.set("Content-Type", "application/json")
      x.sendResponseHeaders(200, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    })
    // ---- S7 live wire: the SOAP login endpoint on the same host, so the
    // serverUrl in the response derives the replay endpoint back onto
    // this fixture's /cometd/43.0 context (the reference's own flow)
    @volatile var soapPassword = "pw-1"
    @volatile var soapSessionId = "tok-1"
    val loginCount = new AtomicInteger()
    server.createContext("/services/Soap/u/44.0/", (x: HttpExchange) => {
      val req = new String(x.getRequestBody.readAllBytes(), "UTF-8")
      loginCount.incrementAndGet()
      val serverUrl =
        s"http://127.0.0.1:${server.getAddress.getPort}/services/Soap/u/44.0/00D"
      val body =
        if (req.contains(s"<urn:password>$soapPassword</urn:password>"))
          s"""<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/">
             |<soapenv:Body><loginResponse xmlns="urn:partner.soap.sforce.com"><result>
             |<sessionId>$soapSessionId</sessionId>
             |<serverUrl>$serverUrl</serverUrl>
             |</result></loginResponse></soapenv:Body></soapenv:Envelope>""".stripMargin
        else
          """<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/">
            |<soapenv:Body><soapenv:Fault><faultcode>INVALID_LOGIN</faultcode>
            |<faultstring>INVALID_LOGIN: Invalid username, password.</faultstring>
            |</soapenv:Fault></soapenv:Body></soapenv:Envelope>""".stripMargin
      val bytes = body.getBytes("UTF-8")
      x.getResponseHeaders.set("Content-Type", "text/xml")
      x.sendResponseHeaders(200, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    def endpoint: URI =
      URI.create(s"http://127.0.0.1:${server.getAddress.getPort}/cometd/43.0")
    def host: URI = URI.create(s"http://127.0.0.1:${server.getAddress.getPort}")
    def stop(): Unit = server.stop(0)
  }

  private def quoted(s: String) = "\"" + s + "\""

  test("earliest subscribe long-polls the backlog in order, tracks " +
      "replay ids, and a second poll delivers nothing new") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/AccountChangeEvent"
      (1 to 3).foreach(i => srv.publish(topic, quoted(s"e$i")))
      val got = mutable.ArrayBuffer.empty[(String, String)]
      val t = new BayeuxTransport(srv.endpoint, _ => "tok-1",
        (tp, data) => got += ((tp, data)))
      t.subscribeEarliest(topic)
      assert(t.pollOnce() == 3)
      assert(got.map(_._1).distinct == Seq(topic))
      assert(got.map(g => om.readTree(g._2).path("payload").asText()) ==
        Seq("e1", "e2", "e3"))
      assert(t.lastReplayId(topic) == 3L)
      assert(t.pollOnce() == 0, "no duplicates on an idle poll")
    } finally srv.stop()
  }

  test("tip subscribe skips the backlog and sees only post-subscribe events") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/Tip"
      (1 to 2).foreach(i => srv.publish(topic, quoted(s"old$i")))
      val got = mutable.ArrayBuffer.empty[String]
      val t = new BayeuxTransport(srv.endpoint, _ => "tok-1",
        (_, data) => got += om.readTree(data).path("payload").asText())
      t.subscribeTip(topic)
      assert(t.pollOnce() == 0)
      (3 to 4).foreach(i => srv.publish(topic, quoted(s"new$i")))
      assert(t.pollOnce() == 2)
      assert(got.toSeq == Seq("new3", "new4"))
      assert(t.lastReplayId(topic) == 4L)
    } finally srv.stop()
  }

  test("session loss: 402 + advice=handshake recycles the session; the " +
      "re-subscribe carries the LAST-SEEN replay id, so nothing is lost " +
      "or duplicated (S5 resubscribe-on-reconnect)") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/Reconnect"
      (1 to 3).foreach(i => srv.publish(topic, quoted(s"e$i")))
      val got = mutable.ArrayBuffer.empty[String]
      val t = new BayeuxTransport(srv.endpoint, _ => "tok-1",
        (_, data) => got += om.readTree(data).path("payload").asText())
      t.subscribeEarliest(topic)
      assert(t.pollOnce() == 3)
      // the server drops every session (restart); new events arrive
      srv.liveSessions.clear()
      (4 to 5).foreach(i => srv.publish(topic, quoted(s"e$i")))
      assert(t.pollOnce() == 0, "the 402 poll only recycles")
      assert(!t.isHandshook)
      assert(t.pollOnce() == 2, "re-handshake + resubscribe + delivery")
      assert(got.toSeq == (1 to 5).map(i => s"e$i"))
      val (_, _, replayExt) = srv.subscribes.last
      assert(replayExt(topic) == 3L,
        s"resubscribe must resume from the stored replay id, got $replayExt")
    } finally srv.stop()
  }

  test("advice reconnect=handshake from a healthy connect also recycles") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/Advice"
      val t = new BayeuxTransport(srv.endpoint, _ => "tok-1", (_, _) => ())
      t.subscribeEarliest(topic)
      assert(t.pollOnce() == 0)
      srv.oneShotAdvice = "handshake"
      t.pollOnce()
      assert(!t.isHandshook)
      srv.publish(topic, quoted("after"))
      assert(t.pollOnce() == 1)
    } finally srv.stop()
  }

  test("401 on connect forces reauthentication: tokenProvider(force=true) " +
      "exactly once, fresh token on the wire, stream resumes with no loss " +
      "or duplication (S6)") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/Reauth"
      (1 to 2).foreach(i => srv.publish(topic, quoted(s"e$i")))
      val forced = new AtomicInteger()
      val provider: Boolean => String = force => {
        if (force) { forced.incrementAndGet(); "tok-2" } else "tok-1"
      }
      val got = mutable.ArrayBuffer.empty[String]
      val t = new BayeuxTransport(srv.endpoint, provider,
        (_, data) => got += om.readTree(data).path("payload").asText())
      t.subscribeEarliest(topic)
      assert(t.pollOnce() == 2)
      // the session id expires server-side: old token refused everywhere
      srv.validToken = "tok-2"
      srv.publish(topic, quoted("e3"))
      assert(t.pollOnce() == 0, "401 poll classifies + recycles")
      assert(forced.get() == 0, "refresh happens on the NEXT cycle's post")
      assert(t.pollOnce() == 1, "re-handshake with the fresh token resumes")
      assert(forced.get() == 1, "exactly one forced refresh")
      assert(got.toSeq == Seq("e1", "e2", "e3"))
      val (_, _, replayExt) = srv.subscribes.last
      assert(replayExt(topic) == 2L)
    } finally srv.stop()
  }

  test("403 via ext.sfdc.failureReason on the handshake classifies the " +
      "same way (the reference's second error shape)") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/Sfdc403"
      srv.authErrorStyle = "sfdc"
      srv.validToken = "tok-2" // first handshake fails with the sfdc shape
      val forced = new AtomicInteger()
      val provider: Boolean => String = force => {
        if (force) { forced.incrementAndGet(); "tok-2" } else "tok-1"
      }
      val t = new BayeuxTransport(srv.endpoint, provider, (_, _) => ())
      t.subscribeEarliest(topic)
      assert(t.pollOnce() == 0)
      assert(forced.get() == 0)
      srv.publish(topic, quoted("e1"))
      assert(t.pollOnce() == 1)
      assert(forced.get() == 1)
    } finally srv.stop()
  }

  test("S7 live wire: the SOAP login POST round-trips (success → " +
      "sessionId + derived replay endpoint; bad credentials → the fault)") {
    val srv = new FakeBayeuxServer
    try {
      val ok = graft.sources.SfdcAuth.login(srv.host, "u@example.com", "pw-1")
      assert(ok.isRight)
      val r = ok.toOption.get
      assert(r.sessionId == "tok-1")
      assert(r.replayEndpoint == srv.endpoint.toString,
        "the replay endpoint derived from serverUrl must land on /cometd/43.0")
      val bad = graft.sources.SfdcAuth.login(srv.host, "u@example.com", "wrong")
      assert(bad.isLeft)
      assert(bad.swap.toOption.get.faultstring.startsWith("INVALID_LOGIN"))
    } finally srv.stop()
  }

  test("full connector chain, live: login → tokenProvider → transport at " +
      "the DERIVED endpoint → events; session expiry re-logins exactly " +
      "once and the stream resumes (the whole reference loop over HTTP)") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/FullChain"
      (1 to 2).foreach(i => srv.publish(topic, quoted(s"e$i")))
      val login = graft.sources.SfdcAuth.login(srv.host, "u@example.com", "pw-1")
        .toOption.get
      val provider = graft.sources.SfdcAuth.tokenProvider(
        srv.host, "u@example.com", "pw-1")
      val got = mutable.ArrayBuffer.empty[String]
      val t = new BayeuxTransport(URI.create(login.replayEndpoint), provider,
        (_, data) => got += om.readTree(data).path("payload").asText())
      t.subscribeEarliest(topic)
      assert(t.pollOnce() == 2)
      val loginsBefore = srv.loginCount.get()
      // the session expires server-side; the next login must mint sid-2
      srv.validToken = "tok-2"
      srv.soapSessionId = "tok-2"
      srv.publish(topic, quoted("e3"))
      assert(t.pollOnce() == 0, "the 401 poll classifies + recycles")
      assert(t.pollOnce() == 1, "forced re-login mints the fresh session id")
      assert(srv.loginCount.get() == loginsBefore + 1, "exactly one re-login")
      assert(got.toSeq == Seq("e1", "e2", "e3"))
    } finally srv.stop()
  }

  test("end to end: transport → ReplayBus → cdc-replay micro-batches — " +
      "the production wiring of the live source") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/LiveWire"
      ReplayBus.clear(topic)
      (1 to 4).foreach(i => srv.publish(topic, s"""{"n":$i}"""))
      val t = new BayeuxTransport(srv.endpoint, _ => "tok-1",
        BayeuxTransport.busConsumer)
      t.subscribeEarliest(topic)
      assert(t.pollOnce() == 4)
      val q = spark.readStream.format("cdc-replay")
        .option("topic", topic).option("replayFrom", "-2").load()
        .writeStream.format("memory").queryName("live_wire")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import spark.implicits._
      val rows = spark.table("live_wire").as[(Long, String)].collect().sortBy(_._1)
      assert(rows.map(_._2).toSeq == (1 to 4).map(i => s"""{"n":$i}"""))
    } finally srv.stop()
  }

  test("tuning knobs: a non-default maxNetworkDelay bounds the long-poll " +
      "request — a server slower than the knob fails the request " +
      "(BayeuxParameters.java:79-81's contract)") {
    val srv = new FakeBayeuxServer
    try {
      val t = new BayeuxTransport(srv.endpoint, _ => "tok-1", (_, _) => (),
        BayeuxTransport.Parameters(
          maxNetworkDelay = java.time.Duration.ofMillis(100)))
      t.subscribeEarliest("/data/SlowWire")
      // 100 ms knob vs a 3 s server stall: a CI-load hiccup cannot close
      // a 30x margin in either direction (r17 ADVICE — the old 250 ms vs
      // 1 s pair could flake both ways)
      srv.oneShotDelayMs = 3000L
      intercept[java.net.http.HttpTimeoutException](t.pollOnce())
      // the knob only bounds the request: once the server responds in
      // time again, the same transport completes the cycle. The fixture
      // server is single-threaded, so retries queue behind the delayed
      // handler until its sleep drains — poll for recovery instead of
      // guessing the drain time with a fixed sleep.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var recovered = false
      while (!recovered && System.nanoTime() < deadline)
        try { assert(t.pollOnce() == 0); recovered = true }
        catch { case _: java.net.http.HttpTimeoutException => Thread.sleep(100L) }
      assert(recovered, "transport never recovered after the server sped up")
      assert(t.isHandshook)
    } finally srv.stop()
  }

  test("tuning knobs: maxBufferBytes rejects an oversize response before " +
      "parsing (BayeuxParameters.java:71-73's maxBufferSize)") {
    val srv = new FakeBayeuxServer
    try {
      val topic = "/data/FatWire"
      srv.publish(topic, s"""{"pad":"${"x" * 2048}"}""")
      val t = new BayeuxTransport(srv.endpoint, _ => "tok-1", (_, _) => (),
        BayeuxTransport.Parameters(maxBufferBytes = 1024))
      t.subscribeEarliest(topic)
      val e = intercept[graft.sources.BayeuxProtocolException](t.pollOnce())
      assert(e.getMessage.contains("exceeds maxBufferBytes 1024"))
    } finally srv.stop()
  }
}

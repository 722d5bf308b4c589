package graft

import java.io.{InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fx.Sync
import graft.gql.WsServer

/** The WebSocket push surface (reference `fx/websocket.py` StartServer /
  * zefhub's update push): a raw-socket RFC 6455 client — handshake accept
  * verified, masked subscribe frames, events arriving as server frames —
  * asserted against the writer's receipts. */
class GqlWsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // minimal client-side RFC 6455: fixed nonce, zero mask (valid: the mask
  // bit is set and the key is 0,0,0,0 so payload xor is identity)
  private val nonce = "dGhlIHNhbXBsZSBub25jZQ=="

  private def wsHandshake(sock: Socket): Unit = {
    val out = sock.getOutputStream
    out.write(("GET / HTTP/1.1\r\nHost: 127.0.0.1\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $nonce\r\nSec-WebSocket-Version: 13\r\n\r\n")
      .getBytes(UTF_8))
    out.flush()
    val in = sock.getInputStream
    val resp = new StringBuilder
    var prev = 0; var done = false
    while (!done) {
      val b = in.read(); require(b >= 0, "closed during handshake")
      resp.append(b.toChar)
      if (b == '\n' && prev == '\n') done = true
      if (b != '\r') prev = b
    }
    assert(resp.toString.startsWith("HTTP/1.1 101"), resp.toString)
    val expected = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1")
        .digest((nonce + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
    assert(resp.toString.contains(s"Sec-WebSocket-Accept: $expected"),
      "handshake accept mismatch")
  }

  private def sendText(out: OutputStream, s: String): Unit = {
    val p = s.getBytes(UTF_8)
    out.write(0x81) // FIN + text
    require(p.length < 126, "spec frames are short")
    out.write(0x80 | p.length) // masked
    out.write(Array[Byte](0, 0, 0, 0)) // zero mask key
    out.write(p); out.flush()
  }

  /** The same text message split over FIN=0 text + FIN=1 continuation —
    * the fragmentation stock client libraries may apply. A masked ping
    * rides BETWEEN the fragments (RFC 6455 §5.4 allows control frames to
    * interleave mid-message): the server must pong it AND keep the
    * accumulated fragments — answering the ping used to abandon the
    * partial message and silently drop the subscribe. */
  private def sendTextFragmented(out: OutputStream, s: String): Unit = {
    val p = s.getBytes(UTF_8)
    val half = p.length / 2
    out.write(0x01) // text, FIN=0
    out.write(0x80 | half)
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(p, 0, half)
    out.write(0x89); out.write(0x80); out.write(Array[Byte](0, 0, 0, 0)) // ping, masked, empty
    out.write(0x80) // continuation, FIN=1
    out.write(0x80 | (p.length - half))
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(p, half, p.length - half)
    out.flush()
  }

  private def readText(in: InputStream): String = {
    val b0 = in.read(); require(b0 >= 0, "eof")
    assert((b0 & 0x0F) == 0x1, s"expected text frame, got opcode ${b0 & 0x0F}")
    val b1 = in.read()
    var len = b1 & 0x7F
    if (len == 126) len = in.read() << 8 | in.read()
    val p = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val n = in.read(p, off, len - off); require(n >= 0, "eof in frame"); off += n
    }
    new String(p, UTF_8)
  }

  test("WS subscriptions: assigned + terminated graph events stream to a raw client") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ws").toString
    var w = Sync.publish(Graph.empty(spark), dir)
    val server = new WsServer(spark, dir)
    val port = server.start()
    val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(120000)
    try {
      wsHandshake(sock)
      val out = sock.getOutputStream
      // the FIRST subscribe rides fragmented (FIN=0 + continuation): a
      // client library that fragments must not get its partial JSON
      // parsed and the connection torn down
      sendTextFragmented(out, """{"on":"assigned","atype":"Temp"}""")
      sendText(out, """{"on":"terminated","atype":"Sensor","kind":"e"}""")
      // terminated over the AE type itself: must fire for INSTANCED ids
      // (ae:Temp#h/...) too — the closure feed's atype derivation strips
      // the #instance suffix (the r8 regression this pins at the WS
      // layer). kind:"ae" narrows past the flagged CASCADE rows the feed
      // now carries (the field relations rel:Temp/... share the atype).
      sendText(out, """{"on":"terminated","atype":"Temp","kind":"ae"}""")
      val deadline = System.currentTimeMillis() + 60000
      while (server.activeSubscriptions < 3 &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      // == 3 includes the FRAGMENTED subscribe whose fragments straddled a
      // ping — lost entirely before the in-reassembly pong fix
      assert(server.activeSubscriptions == 3, "subscriptions did not start")

      // the mid-fragment ping's pong is the first server frame on the wire
      val inEarly = sock.getInputStream
      val pongB0 = inEarly.read()
      assert((pongB0 & 0x0F) == 0xA,
        s"expected pong for mid-fragment ping, got opcode ${pongB0 & 0x0F}")
      inEarly.read() // pong length 0

      // subscribe-THEN-transact: the events land after the queries are live
      w = w.transact(Seq(
        PutEntity("Sensor", "s1"), PutField("s1", "Temp", 1.5),
        PutField("s1", "Temp", 9.9, instanceKey = "h")))._1
      w = w.transact(Seq(
        PutEntity("Sensor", "s2"), PutField("s2", "Temp", 3.0)))._1
      w = w.transact(Seq(TerminateAtom("e:Sensor/s2"),
        TerminateAtom("ae:Temp#h/e:Sensor/s1")))._1
      server.drain()

      val in = sock.getInputStream
      val frames = (1 to 5).map(_ => readText(in)).toSet
      assert(frames.exists(f => f.contains("\"event\":\"assigned\"") &&
        f.contains("ae:Temp/e:Sensor/s1") && f.contains("\"v_double\":1.5") &&
        f.contains("\"tx_slice\":1")), frames.toString)
      assert(frames.exists(f => f.contains("\"event\":\"assigned\"") &&
        f.contains("ae:Temp/e:Sensor/s2") && f.contains("\"v_double\":3.0")),
        frames.toString)
      assert(frames.exists(f => f.contains("\"event\":\"assigned\"") &&
        f.contains("ae:Temp#h/e:Sensor/s1") && f.contains("\"v_double\":9.9")),
        frames.toString)
      assert(frames.exists(f => f.contains("\"event\":\"terminated\"") &&
        f.contains("\"atom_id\":\"e:Sensor/s2\"") &&
        f.contains("\"tx_slice\":3")), frames.toString)
      assert(frames.exists(f => f.contains("\"event\":\"terminated\"") &&
        f.contains("\"atom_id\":\"ae:Temp#h/e:Sensor/s1\"") &&
        f.contains("\"tx_slice\":3")), frames.toString)

      // ping → pong keeps the connection protocol-complete
      out.write(0x89); out.write(0x80); out.write(Array[Byte](0, 0, 0, 0)); out.flush()
      val pong = in.read()
      assert((pong & 0x0F) == 0xA, s"expected pong, got opcode ${pong & 0x0F}")
      in.read() // pong length 0
    } finally {
      try sock.close() catch { case _: Throwable => () }
      server.stop()
    }
  }

  test("WS: a bad subscribe answers an error frame and keeps the connection alive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ws_err").toString
    var w = Sync.publish(Graph.empty(spark), dir)
    val server = new WsServer(spark, dir)
    val port = server.start()
    val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(120000)
    try {
      wsHandshake(sock)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      // malformed JSON, then an unknown kind, then a missing atype — each
      // used to tear the WHOLE connection down silently (review pass 21)
      sendText(out, """{"on":"assigned","atype":""") // truncated JSON
      assert(readText(in).contains("\"error\""))
      sendText(out, """{"on":"resurrected","atype":"X"}""")
      assert(readText(in).contains("unknown subscription"))
      sendText(out, """{"on":"assigned"}""")
      assert(readText(in).contains("atype"))
      assert(server.activeSubscriptions == 0)
      // the SAME connection still subscribes and receives events
      sendText(out, """{"on":"assigned","atype":"Temp"}""")
      val deadline = System.currentTimeMillis() + 60000
      while (server.activeSubscriptions < 1 &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(server.activeSubscriptions == 1, "good subscribe after errors did not start")
      w = w.transact(Seq(
        PutEntity("Sensor", "s1"), PutField("s1", "Temp", 4.25)))._1
      server.drain()
      val frame = readText(in)
      assert(frame.contains("\"event\":\"assigned\"") &&
        frame.contains("\"v_double\":4.25"), frame)
    } finally {
      try sock.close() catch { case _: Throwable => () }
      server.stop()
    }
  }
}

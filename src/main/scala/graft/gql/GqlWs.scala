package graft.gql

import java.io.{InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.fx.Sync
import graft.streaming.GraphSubscriptions

/** Live graph subscriptions over WebSocket — the push half of the
  * reference's service surface (`python/zef/core/fx/websocket.py`:
  * FX.Websocket.StartServer / SendMessage; zefhub itself pushes graph
  * updates to subscribed clients over the same transport,
  * `fx/zefhub.py`). Spark-first restatement: the server owns no state
  * machine — each client subscription IS a Structured Streaming query
  * tailing the graph's sync store ([[Sync.atomFeed]]/[[Sync.valueFeed]]/
  * [[Sync.closureFeed]], one micro-batch per published transaction)
  * through the same [[GraphSubscriptions]] builders the in-process API
  * uses, with `foreachBatch` serializing each event row to a text frame.
  * Subscribe-then-transact therefore delivers exactly the rows the batch
  * replay of the same feed produces — the spec asserts frame parity
  * against the receipts.
  *
  * Transport is RFC 6455 over a plain ServerSocket (zero dependencies —
  * the JDK HTTP server cannot hijack its exchange socket): handshake
  * (Sec-WebSocket-Accept = b64(sha1(key + GUID))), unfragmented text
  * frames, client-mask decoding, ping→pong, close. One reader thread per
  * connection; event pushes come from the streaming queries' batch
  * threads, serialized per-socket.
  *
  * Protocol: the client sends one JSON text frame per subscription,
  * `{"on": "assigned" | "instantiated" | "terminated", "atype": "X"}`;
  * every matching graph event then arrives as one JSON frame (the
  * subscription row rendered by Spark's own row-JSON writer, so scalar
  * formatting matches every other engine surface).
  */
final class WsServer(spark: SparkSession, storeDir: String, port: Int = 0) {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", port))
  @volatile private var running = true
  private val queries = new CopyOnWriteArrayList[StreamingQuery]()
  private val sockets = new CopyOnWriteArrayList[Socket]()

  def start(): Int = {
    val t = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          sockets.add(s)
          val ct = new Thread(() => serve(s), "graft-ws-conn")
          ct.setDaemon(true); ct.start()
        } catch {
          case _: Throwable =>
            // a PERSISTENT accept failure (fd exhaustion, say) must not
            // become a 100%-CPU retry spin; stop() closing the server
            // flips `running` first, so the pause only ever delays
            // recovery, never shutdown
            if (running) Thread.sleep(100)
        }
      }
    }, "graft-ws-accept")
    t.setDaemon(true); t.start()
    server.getLocalPort
  }

  /** Block until every live subscription has processed all published
    * transactions — the test-determinism hook (same role as
    * `processAllAvailable` in the streaming specs). */
  def drain(): Unit = queries.forEach { q => if (q.isActive) q.processAllAvailable() }

  /** Subscriptions currently running (clients' subscribe frames are
    * processed asynchronously on connection threads). */
  def activeSubscriptions: Int = queries.size

  def stop(): Unit = {
    running = false
    // close sockets FIRST: a batch thread blocked writing to a stalled
    // client holds its streaming query mid-batch, and q.stop() waits for
    // the batch — closing the socket unblocks the write so the stop can
    // proceed. Each step is try-guarded so one failure cannot skip
    // server.close() and leak the listener port.
    sockets.forEach(s => try s.close() catch { case _: Throwable => () })
    queries.forEach(q =>
      try { if (q.isActive) q.stop() } catch { case _: Throwable => () })
    try server.close() catch { case _: Throwable => () }
  }

  // ----------------------------------------------------------------- wire

  private def serve(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out = sock.getOutputStream
    var mine = List.empty[StreamingQuery]
    try {
      handshake(in, out)
      val writeLock = new Object
      var open = true
      while (open && running) {
        readFrame(in, out, writeLock) match {
          case None => open = false
          case Some((0x8, _)) => // close
            writeFrame(out, 0x8, Array.emptyByteArray, writeLock); open = false
          case Some((0x1, payload)) =>
            // a BAD subscribe frame (malformed JSON, unknown kind, missing
            // atype) answers with an error frame and keeps the connection
            // open — propagating tore the WHOLE connection down silently,
            // killing the client's other live subscriptions over a typo
            try {
              val q = subscribe(new String(payload, UTF_8), out, writeLock)
              queries.add(q); mine ::= q
            } catch {
              case e: Exception =>
                val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
                writeFrame(out, 0x1,
                  s"""{"error":"${jsonEsc(msg)}"}""".getBytes(UTF_8), writeLock)
            }
          case Some(_) => () // ignore pong/unknown
        }
      }
    } catch { case _: Throwable => () }
    finally {
      // connection teardown — on ANY exit path — stops this connection's
      // streaming queries and keeps the server-wide list = live
      // subscriptions (activeSubscriptions is a readiness signal)
      mine.foreach { q =>
        try { if (q.isActive) q.stop() } catch { case _: Throwable => () }
        queries.remove(q)
      }
      try sock.close() catch { case _: Throwable => () }
    }
  }

  private def handshake(in: InputStream, out: OutputStream): Unit = {
    val req = new StringBuilder
    var prev = 0
    var done = false
    while (!done) {
      val b = in.read()
      if (b < 0) throw new java.io.EOFException("closed during handshake")
      req.append(b.toChar)
      // a real upgrade request is <1 KiB of headers; a client streaming
      // endless header bytes without the blank line grew this buffer
      // without bound (the frame path caps at 1 MiB — the handshake must
      // not be the one unbounded read on the socket)
      if (req.length > (1 << 14))
        throw new IllegalArgumentException("handshake headers exceed 16 KiB")
      if (b == '\n' && prev == '\n') done = true
      if (b != '\r') prev = b
    }
    val key = req.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(throw new IllegalArgumentException("not a WebSocket upgrade"))
    val accept = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1")
        .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
  }

  /** One MESSAGE: (opcode, unmasked payload), reassembled across
    * continuation frames when the client's library fragments it (FIN=0
    * then opcode-0 continuations — treating the first fragment as the
    * whole message fed partial JSON to the parser and tore the
    * subscription down). Control frames may interleave between fragments
    * per RFC 6455: pings are answered with a pong HERE, inside the
    * reassembly loop, so a mid-message ping cannot discard the accumulated
    * fragments (returning it to the caller used to orphan the opcode-0
    * continuations into a message serve() silently dropped — the client's
    * subscribe was lost despite RFC-conformant behavior); pongs/unknown
    * controls are skipped; close aborts the partial message and is
    * forwarded (the connection is ending regardless). None on EOF
    * anywhere in a frame (a mid-header disconnect must not desync the
    * parser into a negative or garbage length). Client frames here are
    * small control/subscribe messages — anything above 1 MiB total is a
    * protocol error, not a payload to buffer. */
  private def readFrame(in: InputStream, out: OutputStream,
      lock: Object): Option[(Int, Array[Byte])] = {
    var opcode0 = -1
    val acc = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      readRawFrame(in) match {
        case None => return None
        case Some((fin, op, payload)) =>
          if (op == 0x8) return Some((op, payload)) // close: abort + forward
          else if (op == 0x9) writeFrame(out, 0xA, payload, lock) // ping → pong in place
          else if (op >= 0x8) () // pong / reserved control: skip, keep reading
          else {
            if (opcode0 < 0) opcode0 = op // first fragment carries the opcode
            acc.write(payload)
            if (acc.size > (1 << 20)) return None
            done = fin
          }
      }
    }
    Some((opcode0, acc.toByteArray))
  }

  /** One raw frame: (fin, opcode, unmasked payload). */
  private def readRawFrame(in: InputStream): Option[(Boolean, Int, Array[Byte])] = {
    def b(): Int = in.read()
    val b0 = b(); if (b0 < 0) return None
    val b1 = b(); if (b1 < 0) return None
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0F
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) {
      val h = b(); val l = b()
      if (h < 0 || l < 0) return None
      len = (h << 8 | l).toLong
    } else if (len == 127) {
      len = 0L
      for (_ <- 0 until 8) {
        val x = b(); if (x < 0) return None
        len = (len << 8) | x
      }
    }
    if (len < 0 || len > (1L << 20)) return None
    val mask = new Array[Byte](if (masked) 4 else 0)
    for (i <- mask.indices) {
      val x = b(); if (x < 0) return None
      mask(i) = x.toByte
    }
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val n = in.read(payload, off, len.toInt - off)
      if (n < 0) return None
      off += n
    }
    if (masked) payload.indices.foreach(i =>
      payload(i) = (payload(i) ^ mask(i % 4)).toByte)
    Some((fin, opcode, payload))
  }

  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def writeFrame(out: OutputStream, opcode: Int,
      payload: Array[Byte], lock: Object): Unit = lock.synchronized {
    out.write(0x80 | opcode)
    if (payload.length < 126) out.write(payload.length)
    else if (payload.length < 65536) {
      out.write(126); out.write(payload.length >> 8); out.write(payload.length & 0xFF)
    } else {
      out.write(127)
      (7 to 0 by -1).foreach(i => out.write(((payload.length.toLong >> (8 * i)) & 0xFF).toInt))
    }
    out.write(payload); out.flush()
  }

  // ---------------------------------------------------------- subscription

  private def subscribe(msg: String, out: OutputStream,
      lock: Object): StreamingQuery = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(msg)
    val on = (j \ "on") match { case JString(s) => s; case _ => "" }
    val atype = (j \ "atype") match { case JString(s) => s; case _ => "" }
    require(atype.nonEmpty, s"subscription needs atype: $msg")
    val events = on match {
      case "assigned" =>
        GraphSubscriptions.onAssignedScheme(
          Sync.valueFeed(spark, storeDir), atype)
      case "instantiated" =>
        GraphSubscriptions.onInstantiated(
          Sync.atomFeed(spark, storeDir), atype)
      case "terminated" =>
        // optional kind prefix (e/r/ae/rel) — closure feeds carry the
        // cascade rows, and an AE and its field relation share the atype.
        // `cascades: true` opts INTO writer-derived cascade rows; the
        // wire default stays the protocol's original direct-only feed so
        // a subscriber that predates cascades neither sees events double
        // (ae: + rel: sharing one atype) nor new unrequested row classes
        val kind = (j \ "kind") match { case JString(s) => s; case _ => "any" }
        val cascades =
          (j \ "cascades") match { case JBool(b) => b; case _ => false }
        GraphSubscriptions.onTerminatedClosures(
          Sync.closureFeed(spark, storeDir), atype, kind,
          includeCascades = cascades)
      case other => throw new IllegalArgumentException(s"unknown subscription: $other")
    }
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // appendTx lands one file per sub-table per tx, so with
        // maxFilesPerTrigger=1 a micro-batch is usually one transaction
        // (the atoms sub-feed can still split one tx across its
        // kind/atype partition dirs); events within a batch go out in
        // tx order. Cross-batch order follows the file source's
        // modification-time ordering — correct for spaced transactions,
        // but a consumer needing a strict total order should sort on the
        // tx_slice carried in every frame rather than on arrival order.
        batch.orderBy(col("tx_slice")).toJSON.collect()
          .foreach(s => writeFrame(out, 0x1, s.getBytes(UTF_8), lock))
      }
      .start()
  }
}

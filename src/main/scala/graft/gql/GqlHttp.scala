package graft.gql

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import graft.core.Graph

/** GraphQL-over-HTTP endpoint over the compiled engine — the reference's
  * SimpleGQL serving surface (`python/zef/graphql/simplegql/server2.py:21`:
  * an ariadne+starlette loop routing POST bodies into the resolver layer),
  * restated on the JDK's built-in HTTP server: zero new dependencies, JSON
  * in/out via json4s (already on Spark's classpath), result rows serialized
  * by Spark's own row-JSON writer (`df.toJSON`), so scalar formatting is
  * identical to every other engine surface.
  *
  * Semantics: POST /graphql with `{"query": "...", "variables": {...}}`.
  * Query documents run against the CURRENT graph frame; mutation documents
  * run through [[GqlApi.mutate]] (hooks, constraints, @auth and nested add
  * inputs all apply — the engine path is the same one the in-process API
  * uses) and atomically advance the server's graph reference. Mutations
  * serialize through one lock — the reference's single-transactor-per-graph
  * discipline (`fx_types.py:122`), not a scaling limit on reads, which hit
  * the immutable current frame lock-free.
  *
  * The response collect is bounded by the query itself (pagination /
  * aggregate shape), exactly like any GraphQL server returning rows.
  */
final class GqlServer(schema: GqlParser.SchemaDef, g0: Graph, port: Int = 0) {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  @volatile private var current: Graph = g0
  private val writeLock = new Object

  /** The server's live frame (tests assert engine-direct parity on it). */
  def graph: Graph = current

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/graphql", new Handler)
  server.setExecutor(null) // request thread = accept thread: fine for a shim

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  private def jToScala(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) =>
      // BigInt.toLong WRAPS out-of-range values (2^63 became Long.MinValue
      // and a ge-filter silently matched everything) — reject loudly
      if (!i.isValidLong)
        throw new IllegalArgumentException(s"integer out of 64-bit range: $i")
      i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case JNull => null
    case JArray(xs) => xs.map(jToScala)
    case JObject(fs) => fs.map { case (k, x) => k -> jToScala(x) }.toMap
    case other => throw new IllegalArgumentException(s"unsupported JSON: $other")
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def handle(body: String): String = {
    val parsed = JsonMethods.parse(body)
    val text = parsed \ "query" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("body needs a \"query\" string")
    }
    val vars: Map[String, Any] = parsed \ "variables" match {
      case JObject(fs) => fs.map { case (k, v) => k -> jToScala(v) }.toMap
      case JNothing | JNull => Map.empty
      case other => throw new IllegalArgumentException(s"variables must be an object, got $other")
    }
    // auth claims ride in the body's "claims" object (the JSON analogue of
    // the reference's token-derived claim map): without a transport for
    // them, every @auth-bearing schema was simply UNUSABLE over HTTP —
    // each request died on "requires auth claims"
    val claims: Option[Map[String, Any]] = parsed \ "claims" match {
      case JObject(fs) => Some(fs.map { case (k, v) => k -> jToScala(v) }.toMap)
      case JNothing | JNull => None
      case other => throw new IllegalArgumentException(s"claims must be an object, got $other")
    }
    val op = GqlParser.parseOperation(text, vars)
    def keyOf(r: GqlParser.Sel): String =
      if (r.alias != null && r.alias.nonEmpty) r.alias else r.name
    op.kind match {
      case "query" =>
        val root = op.roots.head
        // the already-parsed op rides through (no second lex+parse)
        val rows = GqlApi.query(current.now, schema, op, claims)
          .toJSON.collect()
        s"""{"data":{"${esc(keyOf(root))}":[${rows.mkString(",")}]}}"""
      case "mutation" =>
        val receipt = writeLock.synchronized {
          val (g2, r) = GqlApi.mutate(current, schema, op, None, claims)
          current = g2
          r
        }
        val ids = receipt.ids.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
          .mkString("{", ",", "}")
        // the document commits as ONE transaction (merged receipt), so the
        // same payload answers under EVERY root's (alias-aware) key — a
        // multi-root mutation used to answer only the first root, leaving
        // clients of the second believing their mutation never ran.
        // Distinct keys only: two unaliased roots with the same field name
        // merge into one response key (GraphQL's field-merge rule) instead
        // of emitting duplicate keys — invalid JSON for most clients.
        val payload = s"""{"ids":$ids,"slice":${receipt.slice}}"""
        val entries = op.roots.map(keyOf).distinct
          .map(k => s""""${esc(k)}":$payload""")
          .mkString(",")
        s"""{"data":{$entries}}"""
      case other =>
        throw new IllegalArgumentException(s"unsupported operation kind '$other'")
    }
  }

  private final class Handler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (status, payload) =
        try {
          if (ex.getRequestMethod != "POST")
            (405, """{"errors":[{"message":"POST only"}]}""")
          else {
            // bounded read — the same discipline as GqlWs (16 KiB
            // handshake / 1 MiB frame caps): readAllBytes on an
            // attacker-sized body was the one unbounded socket read left
            // on the service surface. 8 MiB comfortably holds any real
            // query document + variables.
            val cap = 8 << 20
            val in = ex.getRequestBody
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](8192)
            var n = in.read(chunk)
            while (n >= 0 && buf.size <= cap) {
              buf.write(chunk, 0, n); n = in.read(chunk)
            }
            if (buf.size > cap)
              (400, s"""{"errors":[{"message":"request body exceeds ${cap} bytes"}]}""")
            else
              (200, GqlServer.this.handle(
                new String(buf.toByteArray, StandardCharsets.UTF_8)))
          }
        } catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
            (400, s"""{"errors":[{"message":"${esc(msg)}"}]}""")
        }
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    }
  }
}

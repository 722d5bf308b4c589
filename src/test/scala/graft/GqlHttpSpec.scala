package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Graph
import graft.gql.{GqlApi, GqlHooks, GqlLite, GqlParser, GqlServer}

/** The HTTP serving surface (reference `simplegql/server2.py:21`): a real
  * socket round-trip — parsed query documents, a HOOKED mutation advancing
  * the server's graph, variables, and the error path — each asserted
  * against the engine-direct result on the same frame.
  */
class GqlHttpSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def post(port: Int, body: String): (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:$port/graphql"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  test("HTTP: hooked mutation + parsed query round-trip matches engine-direct") {
    val schema = GqlParser.parseSchema(
      """type Account @hook(onCreate: "stampTierHttp") {
        |  name: String!
        |  acctbal: Float
        |  tier: String
        |}""".stripMargin)
    val g0 = GqlHooks.registerBatchHook(Graph.empty(spark), "stampTierHttp",
      "affected | fields[RT.Acctbal] | set_field[RT.Tier][b >= 5000 ? GOLD : STD] (in-tx)",
      ctx => ctx.affected(("Acctbal", "v_double", "b")).collect().toSeq
        .map { r =>
          val bal = Option(r.getAs[Any]("b"))
            .map(_.asInstanceOf[Double]).getOrElse(0.0)
          GqlLite.UpdateEntity(r.getAs[String]("atom_id"),
            Map("Tier" -> (if (bal >= 5000.0) "GOLD" else "STD")))
        })._1

    val server = new GqlServer(schema, g0)
    val port = server.start()
    try {
      // 1. hooked mutation over the wire: hook fires INSIDE the tx
      val mutation =
        """mutation { addAccount(input: [
          |  {id: "a1", name: "Ann", acctbal: 9000.0},
          |  {id: "a2", name: "Bob", acctbal: 100.0}
          |]) }""".stripMargin
      val (ms, mbody) = post(port,
        s"""{"query": "${esc(mutation)}"}""")
      assert(ms == 200, mbody)
      assert(mbody.contains(""""addAccount""""))
      assert(mbody.contains(""""slice":"""))
      // the server frame advanced exactly one slice and holds the hook's
      // derived field
      assert(server.graph.maxSlice == g0.maxSlice + 1,
        "hook writes must land in the SAME transaction")

      // 2. parsed query over the wire == engine-direct on the same frame
      val queryText =
        "{ queryAccount(order: {asc: name}) { id name acctbal tier } }"
      val (qs, qbody) = post(port, s"""{"query": "${esc(queryText)}"}""")
      assert(qs == 200, qbody)
      val direct = GqlApi.query(server.graph.now, schema, queryText)
        .toJSON.collect()
      val expected = s"""{"data":{"queryAccount":[${direct.mkString(",")}]}}"""
      assert(qbody == expected)
      assert(qbody.contains(""""tier":"GOLD"""") &&
        qbody.contains(""""tier":"STD""""))

      // 3. variables flow through the wire exactly like the in-process API
      val varQuery =
        """query Q($min: Float) {
          |  queryAccount(filter: {acctbal: {ge: $min}}) { name }
          |}""".stripMargin
      val (vs, vbody) = post(port,
        s"""{"query": "${esc(varQuery)}", "variables": {"min": 5000.0}}""")
      assert(vs == 200, vbody)
      assert(vbody.contains("Ann") && !vbody.contains("Bob"))

      // 4. malformed document → 400 with a structured error, server alive
      val (es, ebody) = post(port, """{"query": "query { nope }"}""")
      assert(es == 400 && ebody.contains("\"errors\""))
      val (es2, _) = post(port, s"""{"query": "${esc(queryText)}"}""")
      assert(es2 == 200, "server must survive a failed request")

      // 5. a multi-root mutation answers under EVERY root's key (it used
      // to answer only the first, so clients of the second root believed
      // their mutation never ran)
      val multi =
        """mutation {
          |  first: addAccount(input: [{id: "m1", name: "Cid"}])
          |  second: addAccount(input: [{id: "m2", name: "Dee"}])
          |}""".stripMargin
      val (mms, mmbody) = post(port, s"""{"query": "${esc(multi)}"}""")
      assert(mms == 200, mmbody)
      assert(mmbody.contains("\"first\"") && mmbody.contains("\"second\""),
        mmbody)

      // 5b. two UNALIASED roots with the same name merge to ONE response
      // key (GraphQL field-merge) — emitting the key twice is invalid
      // JSON for most clients
      val dup =
        """mutation {
          |  addAccount(input: [{id: "m3", name: "Eve"}])
          |  addAccount(input: [{id: "m4", name: "Fay"}])
          |}""".stripMargin
      val (ds, dbody) = post(port, s"""{"query": "${esc(dup)}"}""")
      assert(ds == 200, dbody)
      assert("\"addAccount\"".r.findAllIn(dbody).size == 1,
        s"duplicate response keys: $dbody")
      assert(dbody.contains("\"m3\"") && dbody.contains("\"m4\""), dbody)

      // 6. trailing garbage after the operation rejects loudly (was
      // silently ignored — a pasted second operation "ran" as a no-op)
      val (ts2, tbody) = post(port,
        s"""{"query": "${esc(queryText + " mutation { deleteAccount(filter: {id: {eq: \"a1\"}}) }")}"}""")
      assert(ts2 == 400 && tbody.contains("trailing"), tbody)

      // 7. out-of-Long-range integers reject instead of silently wrapping
      val (bs, bbody) = post(port,
        s"""{"query": "${esc(varQuery)}", "variables": {"min": 9223372036854775808}}""")
      assert(bs == 400 && bbody.contains("64-bit"), bbody)
    } finally server.stop()
  }

  test("HTTP: @auth schemas work via body claims; claimless requests reject") {
    val schema = GqlParser.parseSchema(
      """type Doc @auth(query: "{owner: {eq: $user}}") {
        |  owner: String!
        |  body: String
        |}""".stripMargin)
    // add-vetting falls back to AllowQuery when add: is absent, so each
    // doc seeds under its own owner's claims
    val (g1, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation { addDoc(input: [{id: "d1", owner: "ann", body: "annsdoc"}]) }""",
      authClaims = Some(Map("user" -> "ann")))
    val (g0, _) = GqlApi.mutate(g1, schema,
      """mutation { addDoc(input: [{id: "d2", owner: "bob", body: "bobsdoc"}]) }""",
      authClaims = Some(Map("user" -> "bob")))
    val server = new GqlServer(schema, g0)
    val port = server.start()
    try {
      val q = "{ queryDoc { id owner body } }"
      // claims ride in the body: each caller sees only their own rows
      val (s1, b1) = post(port,
        s"""{"query": "${esc(q)}", "claims": {"user": "ann"}}""")
      assert(s1 == 200, b1)
      assert(b1.contains("annsdoc") && !b1.contains("bobsdoc"))
      // no claims against an @auth type = loud reject (was the ONLY
      // behavior — @auth schemas were entirely unusable over HTTP)
      val (s2, b2) = post(port, s"""{"query": "${esc(q)}"}""")
      assert(s2 == 400 && b2.contains("errors"), b2)
    } finally server.stop()
  }

  test("HTTP: oversized request bodies reject bounded, never buffer unbounded") {
    val schema = GqlParser.parseSchema(
      """type Person { name: String! @relation(rt: "Name") }""")
    val server = new GqlServer(schema, Graph.empty(spark))
    val port = server.start()
    try {
      // 9 MiB of padding blows the 8 MiB cap — a bounded 400, not an OOM
      val big = "x" * (9 << 20)
      val (s, b) = post(port, s"""{"query": "{ queryPerson { name } }", "pad": "$big"}""")
      assert(s == 400 && b.contains("exceeds"), b.take(200))
    } finally server.stop()
  }
}

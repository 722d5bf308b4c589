package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.gql.{GqlApi, GqlLite, GqlParser}

/** The GraphQL TEXT surface: schema SDL parsing (schema_file_parser.py
  * semantics), operation parsing, and parsed mutations through the staged
  * write path with auth + declared constraints.
  */
class GqlParserSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  val sdl: String =
    """# Zef.SchemaVersion: v1
      |type User {
      |  email: String! @unique @upfetch
      |  givenName: String
      |  score: Float @search
      |  active: Boolean
      |  birthday: DateTime
      |  serial: Int @unique @relation(rt: "SerialNo")
      |  transactions: [Transaction] @incoming @relation(rt: "User")
      |}
      |enum TransactionType { EXPENSE INCOME }
      |type Transaction {
      |  amount: Float! @search
      |  type: TransactionType!
      |  user: User
      |}""".stripMargin

  test("schema SDL: fields, directives, rt defaulting, enums, auth") {
    val s = GqlParser.parseSchema(sdl)
    assert(s.types.keySet == Set("User", "Transaction"))
    assert(s.enums("TransactionType") == Seq("EXPENSE", "INCOME"))
    val u = s.tpe("User")
    // simple_capitalize default: givenName -> GivenName (not Givenname)
    assert(u.field("givenName").rt == "GivenName")
    // @relation(rt:) override
    assert(u.field("serial").rt == "SerialNo")
    assert(u.field("email").required && u.field("email").unique)
    assert(u.field("email").upfetch && !u.field("serial").upfetch)
    // @upfetch demands @unique + required (resolve_upfetch's precondition)
    intercept[IllegalArgumentException] {
      GqlParser.parseSchema("type T { name: String @upfetch }")
    }
    assert(u.field("score").search && !u.field("score").required)
    val tx = u.field("transactions")
    assert(tx.list && tx.incoming && tx.tpe == "Transaction" && tx.rt == "User")
    // @auth metadata parses (enforcement is covered by its own test below)
    val authed = GqlParser.parseSchema(
      """type D @auth(query: "{owner: {eq: $email}}") { owner: String }""")
    assert(authed.tpe("D").auth("query").contains("owner"))
    // declared constraints land keyed by relation type
    val c = s.constraints
    assert(c.unique("User").toSet == Set("Email", "SerialNo"))
    assert(c.required("User") == Seq("Email"))
    // relation-typed required fields are not value constraints; enum and
    // scalar required fields are
    assert(c.required("Transaction").toSet == Set("Amount", "Type"))
  }

  test("operation parsing: aliases, variables, nested args, block strings") {
    val op = GqlParser.parseOperation(
      """query Q($lim: Int) {
        |  me: queryUser(filter: {score: {ge: 1.5}}, first: $lim) {
        |    id
        |    n: givenName
        |  }
        |}""".stripMargin, vars = Map("lim" -> 7))
    assert(op.kind == "query" && op.roots.size == 1)
    val r = op.roots.head
    assert(r.alias == "me" && r.name == "queryUser")
    assert(r.args.get("first").contains(GqlParser.VInt(7)))
    assert(r.sels.map(_.alias) == Seq("id", "n"))
    assert(r.sels(1).name == "givenName")
  }

  def seeded: Graph = {
    val schema = GqlParser.parseSchema(sdl)
    val (g, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation {
        |  addUser(input: [
        |    {id: "u1", email: "ann@x.com", givenName: "Ann", score: 9.5,
        |     active: true, serial: 100},
        |    {id: "u2", email: "bob@x.com", givenName: "Bob", score: 4.0,
        |     active: false, serial: 200}
        |  ])
        |}""".stripMargin)
    g
  }

  test("parsed query end-to-end: filter + sort + projection over mutations") {
    val schema = GqlParser.parseSchema(sdl)
    val rows = GqlApi.query(seeded.now, schema,
      """query {
        |  queryUser(filter: {score: {ge: 5.0}}, order: {desc: score}) {
        |    id
        |    givenName
        |    active
        |  }
        |}""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("id") == "e:User/u1")
    assert(rows(0).getAs[String]("givenName") == "Ann")
    assert(rows(0).getAs[Boolean]("active"))
  }

  test("between filter: inclusive bounds; a missing bound rejects with a message") {
    val schema = GqlParser.parseSchema(sdl)
    val rows = GqlApi.query(seeded.now, schema,
      """{ queryUser(filter: {score: {between: {min: 5.0, max: 9.5}}}) { id } }"""
    ).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("e:User/u1"))
    // a missing max: used to die as a bare None.get NoSuchElementException
    val e = intercept[IllegalArgumentException] {
      GqlApi.query(seeded.now, schema,
        """{ queryUser(filter: {score: {between: {min: 5.0}}}) { id } }""")
    }
    assert(e.getMessage.contains("missing 'max'"), e.getMessage)
  }

  test("parsed getUser(id:) and boolean short-form filter") {
    val schema = GqlParser.parseSchema(sdl)
    val g = seeded
    val one = GqlApi.query(g.now, schema,
      """{ getUser(id: "e:User/u2") { id email } }""").collect()
    assert(one.length == 1 && one(0).getAs[String]("email") == "bob@x.com")
    val actives = GqlApi.query(g.now, schema,
      """{ queryUser(filter: {active: true}) { id } }""").collect()
    assert(actives.map(_.getString(0)).toSeq == Seq("e:User/u1"))
  }

  test("parsed mutation: constraints from the schema are enforced") {
    val schema = GqlParser.parseSchema(sdl)
    val g = seeded
    // @unique email collision (string-typed)
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g, schema,
        """mutation { addUser(input: [{id: "u3", email: "ann@x.com"}]) }""")
    }
    // @unique serial collision (long-typed — the typed-column store check)
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g, schema,
        """mutation { addUser(input: [{id: "u3", email: "c@x.com", serial: 100}]) }""")
    }
    // required email missing
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g, schema,
        """mutation { addUser(input: [{id: "u3", givenName: "Cat"}]) }""")
    }
    // distinct values pass
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation { addUser(input: [{id: "u3", email: "c@x.com", serial: 300}]) }""")
    assert(g2.now.all("User").count() == 3)
  }

  test("parsed upfetch mutation: update-or-add keyed on the @upfetch field") {
    val schema = GqlParser.parseSchema(sdl)
    val g = seeded
    val annId = GqlApi.query(g.now, schema,
      """{ queryUser(filter: {email: {eq: "ann@x.com"}}) { id } }""")
      .collect()(0).getString(0)
    // one batch, both branches: ann exists (update in place), dora doesn't
    // (fresh entity) — resolved in a single In-probe plan
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation {
        |  upfetchUser(input: [
        |    {email: "ann@x.com", givenName: "Annette", score: 10.0},
        |    {email: "dora@x.com", givenName: "Dora", serial: 400}
        |  ])
        |}""".stripMargin)
    assert(g2.now.all("User").count() == 3) // ann reused, not duplicated
    val ann2 = GqlApi.query(g2.now, schema,
      """{ queryUser(filter: {email: {eq: "ann@x.com"}}) { id givenName score } }""")
      .collect()(0)
    assert(ann2.getString(0) == annId) // same atom — updated, not re-added
    assert(ann2.getAs[String]("givenName") == "Annette")
    assert(ann2.getAs[Double]("score") == 10.0)
    val dora = GqlApi.query(g2.now, schema,
      """{ queryUser(filter: {email: {eq: "dora@x.com"}}) { givenName } }""")
      .collect()
    assert(dora.length == 1 && dora(0).getString(0) == "Dora")
    // create-branch still trips OTHER @unique constraints (serial 100 = u1's)
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g2, schema,
        """mutation { upfetchUser(input: [{email: "new@x.com", serial: 100}]) }""")
    }
    // replaying the same upfetch is idempotent on entity count
    val (g3, _) = GqlApi.mutate(g2, schema,
      """mutation { upfetchUser(input: [{email: "dora@x.com", givenName: "Dora"}]) }""")
    assert(g3.now.all("User").count() == 3)
    // an input without the @upfetch field is rejected
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g2, schema,
        """mutation { upfetchUser(input: [{givenName: "X"}]) }""")
    }
  }

  test("update remove: drops fields, keeps history, guards required") {
    val schema = GqlParser.parseSchema(sdl)
    val g = seeded
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation { updateUser(input: {filter: {id: "e:User/u1"},
        |  set: {score: 1.5}, remove: {givenName: null}}) }""".stripMargin)
    val row = GqlApi.query(g2.now, schema,
      """{ getUser(id: "e:User/u1") { givenName score } }""").collect()(0)
    assert(row.isNullAt(row.fieldIndex("givenName"))) // removed
    assert(row.getAs[Double]("score") == 1.5) // set applied in the same tx
    // history: the pre-remove frame still reads the old value
    val old = GqlApi.query(g2.at(g.maxSlice), schema,
      """{ getUser(id: "e:User/u1") { givenName } }""").collect()(0)
    assert(old.getAs[String]("givenName") == "Ann")
    // remove-only updates work (no set:)
    val (g3, _) = GqlApi.mutate(g2, schema,
      """mutation { updateUser(input: {filter: {id: "e:User/u2"},
        |  remove: {givenName: null}}) }""".stripMargin)
    assert(GqlApi.query(g3.now, schema,
      """{ getUser(id: "e:User/u2") { givenName } }""").collect()(0).isNullAt(0))
    // required fields cannot be removed
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g3, schema,
        """mutation { updateUser(input: {filter: {id: "e:User/u1"},
          |  remove: {email: null}}) }""".stripMargin)
    }
  }

  test("nested add inputs: create-or-link through the Ref shape") {
    import org.apache.spark.sql.Row
    val schema = GqlParser.parseSchema(sdl)
    val g0 = seeded // u1 Ann, u2 Bob; no transactions
    // nested single-entity input CREATES the child and links it
    val (g1, _) = GqlApi.mutate(g0, schema,
      """mutation { addTransaction(input: [
        |  {id: "t9", amount: 9.5, type: EXPENSE,
        |   user: {id: "u9", email: "zed@x.com", givenName: "Zed", serial: 900}}
        |]) }""".stripMargin)
    assert(g1.now.all("User").count() == 3)
    assert(g1.now.all("Transaction").count() == 1)
    val u = GqlApi.query(g1.now, schema,
      """{ queryTransaction { amount user { givenName } } }""").collect()
    assert(u.length == 1 &&
      u(0).getAs[Row]("user").getAs[String]("givenName") == "Zed")
    // a nested object carrying ONLY id LINKS the existing atom
    val (g2, _) = GqlApi.mutate(g1, schema,
      """mutation { addTransaction(input: [
        |  {id: "t10", amount: 1.0, type: INCOME, user: {id: "e:User/u1"}}
        |]) }""".stripMargin)
    assert(g2.now.all("User").count() == 3) // linked, not created
    val annTx = GqlApi.query(g2.now, schema,
      """{ queryUser(filter: {givenName: {eq: "Ann"}}) { transactions { count } } }""")
      .collect()(0).getLong(0)
    assert(annTx == 1)
    // nested creates still pass through declared constraints
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g2, schema,
        """mutation { addTransaction(input: [
          |  {id: "t11", amount: 2.0, type: INCOME,
          |   user: {email: "ann@x.com"}}]) }""".stripMargin)
    }
    // list-shaped nested inputs on the @incoming side
    val (g3, _) = GqlApi.mutate(g2, schema,
      """mutation { addUser(input: [
        |  {id: "u10", email: "kay@x.com",
        |   transactions: [{id: "t12", amount: 3.0, type: EXPENSE},
        |                  {id: "t13", amount: 4.0, type: INCOME}]}]) }""".stripMargin)
    val kay = GqlApi.query(g3.now, schema,
      """{ queryUser(filter: {email: {eq: "kay@x.com"}}) { transactions { count } } }""")
      .collect()(0).getLong(0)
    assert(kay == 2)
    // replaying the same add trips the @unique store check (add is NOT the
    // idempotent path — upfetch is)
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g3, schema,
        """mutation { addUser(input: [
          |  {id: "u10", email: "kay@x.com",
          |   transactions: [{id: "t12", amount: 3.0, type: EXPENSE}]}]) }""".stripMargin)
    }
  }

  test("parsed update/delete resolve their filter; auth hook enforced") {
    val schema = GqlParser.parseSchema(sdl)
    val g = seeded
    // update by field filter (not id): Bob gets a new score
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation {
        |  updateUser(input: {filter: {email: {eq: "bob@x.com"}},
        |                     set: {score: 6.5}})
        |}""".stripMargin)
    val bob = GqlApi.query(g2.now, schema,
      """{ getUser(id: "e:User/u2") { score } }""").collect()
    assert(bob(0).getAs[Double]("score") == 6.5)
    // auth vet: only ann's row may be mutated → delete of bob rejected.
    // The vet is SET-based (authorized ids as one DataFrame) — a single
    // semi-join plan per transaction, never a per-target driver loop.
    val annOnly: GqlLite.AuthVet =
      slice => slice.aliveAtoms.filter(col("atom_id") === "e:User/u1")
        .select(col("atom_id"))
    intercept[SecurityException] {
      GqlApi.mutate(g2, schema,
        """mutation { deleteUser(filter: {id: "e:User/u2"}) }""",
        auth = Some(annOnly))
    }
    // allowed delete goes through and closes the interval
    val (g3, _) = GqlApi.mutate(g2, schema,
      """mutation { deleteUser(filter: {id: "e:User/u1"}) }""",
      auth = Some(annOnly))
    assert(g3.now.all("User").count() == 1)
    assert(g3.at(g3.maxSlice - 1).all("User").count() == 2) // time travel
  }

  test("@auth(query:) filters the query path per claims, still one plan") {
    val authSdl =
      """type Doc @auth(query: "{owner: {eq: $email}}",
        |               delete: "{owner: {eq: $email}}") {
        |  owner: String!
        |  title: String!
        |}""".stripMargin
    val schema = GqlParser.parseSchema(authSdl)
    // add auth falls back to the query rule (pass_add_auth) — each owner
    // seeds their own docs under their own claims
    val (gAnn, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation {
        |  addDoc(input: [
        |    {id: "d1", owner: "ann@x", title: "A1"},
        |    {id: "d2", owner: "ann@x", title: "A2"}
        |  ])
        |}""".stripMargin,
      authClaims = Some(Map("email" -> "ann@x")))
    val (g, _) = GqlApi.mutate(gAnn, schema,
      """mutation { addDoc(input: [{id: "d3", owner: "bob@x", title: "B1"}]) }""",
      authClaims = Some(Map("email" -> "bob@x")))
    def titles(claims: Map[String, Any]) =
      GqlApi.query(g.now, schema,
        """{ queryDoc(order: {asc: title}) { title } }""",
        authClaims = Some(claims))
        .collect().map(_.getString(0)).toSeq
    // each caller sees exactly their own subset
    assert(titles(Map("email" -> "ann@x")) == Seq("A1", "A2"))
    assert(titles(Map("email" -> "bob@x")) == Seq("B1"))
    assert(titles(Map("email" -> "eve@x")) == Seq())
    // declared auth + no claims = denial, not a full-table answer
    intercept[SecurityException] {
      GqlApi.query(g.now, schema, """{ queryDoc { title } }""")
    }
    // aggregate root is auth-filtered the same way
    val agg = GqlApi.query(g.now, schema,
      """{ aggregateDoc { count } }""",
      authClaims = Some(Map("email" -> "ann@x"))).collect()(0)
    assert(agg.getAs[Long]("count") == 2)
    // delete auth: bob's claims can't delete ann's docs even by id
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation { deleteDoc(filter: {id: "e:Doc/d1"}) }""",
      authClaims = Some(Map("email" -> "bob@x")))
    assert(g2.now.all("Doc").count() == 3) // no-op: auth filter vetoed the id
    val (g3, _) = GqlApi.mutate(g, schema,
      """mutation { deleteDoc(filter: {id: "e:Doc/d1"}) }""",
      authClaims = Some(Map("email" -> "ann@x")))
    assert(g3.now.all("Doc").count() == 2)
  }

  test("@auth(update:) vets upfetch in-place updates; wrong-type fast-path " +
      "ids reject") {
    val authSdl =
      """type Doc @auth(update: "{owner: {eq: $email}}") {
        |  sku: String! @unique @upfetch
        |  owner: String!
        |  title: String!
        |}""".stripMargin
    val schema = GqlParser.parseSchema(authSdl)
    val (g, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation { addDoc(input: [{sku: "A", owner: "ann@x", title: "A1"}]) }""")
    // bob's claims cannot overwrite ann's doc through the upsert side door
    // (this was a full @auth bypass: upfetch updated without any vetting);
    // an unauthorized existing key is a LOUD reject, not a silent
    // duplicate create
    val e = intercept[IllegalArgumentException] {
      GqlApi.mutate(g, schema,
        """mutation { upfetchDoc(input: [{sku: "A", title: "stolen"}]) }""",
        authClaims = Some(Map("email" -> "bob@x")))
    }
    assert(e.getMessage.contains("not authorized"))
    // ann's claims update in place as before
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation { upfetchDoc(input: [{sku: "A", title: "A2"}]) }""",
      authClaims = Some(Map("email" -> "ann@x")))
    assert(g2.now.all("Doc").count() == 1)
    assert(GqlApi.query(g2.now, schema,
        """{ queryDoc { title } }""").collect()(0).getString(0) == "A2")
    // no-auth fast path: a pure-id mutation filter must carry THIS
    // type's prefix (deleteDoc on a User id used to terminate the User)
    val plain = GqlParser.parseSchema(
      "type Doc { sku: String! @unique\n title: String! }")
    val (gp, _) = GqlApi.mutate(Graph.empty(spark), plain,
      """mutation { addDoc(input: [{id: "d1", sku: "A", title: "T"}]) }""")
    val e2 = intercept[IllegalArgumentException] {
      GqlApi.mutate(gp, plain,
        """mutation { deleteDoc(filter: {id: "e:User/u9"}) }""")
    }
    assert(e2.getMessage.contains("not a Doc id"))
  }

  test("DateTime literals: ISO-8601 zones honored, zoneless means UTC") {
    import java.time.Instant
    def p(s: String): Instant = GqlApi.parseDateTime("f", s).toInstant
    val want = Instant.parse("2024-03-05T10:00:00Z")
    // explicit zulu, explicit offset, zoneless 'T', zoneless space —
    // all the SAME instant; never the JVM default zone
    assert(p("2024-03-05T10:00:00Z") == want)
    assert(p("2024-03-05T12:00:00+02:00") == want)
    assert(p("2024-03-05T07:30:00-02:30") == want)
    assert(p("2024-03-05T10:00:00") == want)
    assert(p("2024-03-05 10:00:00") == want)
    assert(p("2024-03-05T10:00:00.250Z") ==
      Instant.parse("2024-03-05T10:00:00.250Z"))
    assert(p("2024-03-05") == Instant.parse("2024-03-05T00:00:00Z"))
    intercept[IllegalArgumentException] { p("not-a-date") }
    intercept[IllegalArgumentException] { p("2024-13-40T99:00:00") }
    // end-to-end: a zoned literal round-trips through mutate + filter
    val schema = GqlParser.parseSchema(
      "type Ev { name: String!\n at: DateTime }")
    val (g, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation { addEv(input: [
        |  {id: "e1", name: "early", at: "2024-03-05T10:00:00Z"},
        |  {id: "e2", name: "late", at: "2024-03-05T13:00:00+02:00"}]) }"""
        .stripMargin)
    val rows = GqlApi.query(g.now, schema,
      """{ queryEv(filter: {at: {gt: "2024-03-05T10:30:00Z"}}) { name } }""")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("late")) // 13:00+02:00 = 11:00Z > 10:30Z
  }

  test("upfetch create honors an explicit id: (parity with add)") {
    val schema = GqlParser.parseSchema(
      "type Doc { sku: String! @unique @upfetch\n title: String! }")
    // upfetch-then-add and add-then-upfetch converge on the SAME atom
    val (gU, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation { upfetchDoc(input: [{id: "d1", sku: "A", title: "T1"}]) }""")
    assert(GqlApi.query(gU.now, schema,
      """{ getDoc(id: "e:Doc/d1") { title } }""").collect()(0)
      .getString(0) == "T1")
    val (gA, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation { addDoc(input: [{id: "d1", sku: "A", title: "T1"}]) }""")
    val (gA2, _) = GqlApi.mutate(gA, schema,
      """mutation { upfetchDoc(input: [{sku: "A", title: "T2"}]) }""")
    assert(gA2.now.all("Doc").count() == 1) // updated in place, no dup
    assert(GqlApi.query(gA2.now, schema,
      """{ getDoc(id: "e:Doc/d1") { title } }""").collect()(0)
      .getString(0) == "T2")
    // explicit id naming a DIFFERENT atom than the key resolves to: loud
    val e = intercept[IllegalArgumentException] {
      GqlApi.mutate(gA, schema,
        """mutation { upfetchDoc(input: [{id: "other", sku: "A", title: "X"}]) }""")
    }
    assert(e.getMessage.contains("conflicts"))
    // matching explicit id on the update arm is the idempotent no-op case
    val (gA3, _) = GqlApi.mutate(gA, schema,
      """mutation { upfetchDoc(input: [{id: "d1", sku: "A", title: "T3"}]) }""")
    assert(gA3.now.all("Doc").count() == 1)
  }

  test("@auth(add:) vets every create path post-commit " +
      "(pass_add_auth, generate_api2.py:1235-1236,1330-1333)") {
    val schema = GqlParser.parseSchema(
      """type Doc @auth(add: "{owner: {eq: $email}}") {
        |  owner: String!
        |  title: String!
        |}""".stripMargin)
    val ann = Some(Map[String, Any]("email" -> "ann@x"))
    // authorized add: created object satisfies the add rule
    val (g1, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation { addDoc(input: [{owner: "ann@x", title: "A"}]) }""",
      authClaims = ann)
    assert(g1.now.all("Doc").count() == 1)
    // denied: created object lands OUTSIDE the caller's authorized subset
    // — the whole mutation aborts, nothing is created
    intercept[SecurityException] {
      GqlApi.mutate(g1, schema,
        """mutation { addDoc(input: [{owner: "bob@x", title: "B"}]) }""",
        authClaims = ann)
    }
    // declared add auth + no claims = denial (tokenless reject)
    intercept[SecurityException] {
      GqlApi.mutate(g1, schema,
        """mutation { addDoc(input: [{owner: "ann@x", title: "C"}]) }""")
    }
    // one bad row poisons the whole batch atomically
    intercept[SecurityException] {
      GqlApi.mutate(g1, schema,
        """mutation { addDoc(input: [
          |  {owner: "ann@x", title: "ok"},
          |  {owner: "bob@x", title: "bad"}]) }""".stripMargin,
        authClaims = ann)
    }
    assert(g1.now.all("Doc").count() == 1)

    // add: SHADOWS query: in the fallback chain (first-present rule wins)
    val shadow = GqlParser.parseSchema(
      """type Pub @auth(query: "{owner: {eq: $email}}",
        |              add: "{owner: {contains: \"@\"}}") {
        |  owner: String!
        |}""".stripMargin)
    val (gp, _) = GqlApi.mutate(Graph.empty(spark), shadow,
      """mutation { addPub(input: [{owner: "bob@x"}]) }""",
      authClaims = ann) // query rule would deny bob's row; add rule allows
    assert(gp.now.all("Pub").count() == 1)

    // upfetch's CREATE branch is add-vetted too
    val upSchema = GqlParser.parseSchema(
      """type Item @auth(add: "{owner: {eq: $email}}") {
        |  sku: String! @unique @upfetch
        |  owner: String!
        |}""".stripMargin)
    val (gi, _) = GqlApi.mutate(Graph.empty(spark), upSchema,
      """mutation { upfetchItem(input: [{sku: "s1", owner: "ann@x"}]) }""",
      authClaims = ann)
    assert(gi.now.all("Item").count() == 1)
    intercept[SecurityException] {
      GqlApi.mutate(gi, upSchema,
        """mutation { upfetchItem(input: [{sku: "s2", owner: "bob@x"}]) }""",
        authClaims = ann)
    }

    // nested {T}Ref create inside an un-authed parent is vetted as well
    val nested = GqlParser.parseSchema(
      """type Folder {
        |  name: String!
        |  docs: [Doc]
        |}
        |type Doc @auth(add: "{owner: {eq: $email}}") {
        |  owner: String!
        |  title: String!
        |}""".stripMargin)
    val (gf, _) = GqlApi.mutate(Graph.empty(spark), nested,
      """mutation { addFolder(input: [
        |  {name: "f", docs: [{owner: "ann@x", title: "A"}]}]) }""".stripMargin,
      authClaims = ann)
    assert(gf.now.all("Doc").count() == 1)
    intercept[SecurityException] {
      GqlApi.mutate(gf, nested,
        """mutation { addFolder(input: [
          |  {name: "g", docs: [{owner: "bob@x", title: "B"}]}]) }""".stripMargin,
        authClaims = ann)
    }
    assert(gf.now.all("Folder").count() == 1)
  }

  test("post-update auth re-vets the NEW state " +
      "(pass_post_update_auth, generate_api2.py:1242-1244,1333-1336)") {
    val schema = GqlParser.parseSchema(
      """type Acct @auth(update: "{owner: {eq: $email}}") {
        |  owner: String!
        |  score: Float
        |}""".stripMargin)
    val ann = Some(Map[String, Any]("email" -> "ann@x"))
    // no add/query rule → unvetted seed
    val (g, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation { addAcct(input: [{id: "a1", owner: "ann@x", score: 1.0}]) }""")
    // in-subset update: pre- and post-state both owned by the caller
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation { updateAcct(input: {filter: {id: "e:Acct/a1"},
        |  set: {score: 2.0}}) }""".stripMargin, authClaims = ann)
    assert(GqlApi.query(g2.now, schema,
      """{ getAcct(id: "e:Acct/a1") { score } }""",
      authClaims = ann).collect()(0).getAs[Double]("score") == 2.0)
    // giving the object away: pre-check passes (ann owns it NOW) but the
    // post-state fails the update rule → atomic abort
    intercept[SecurityException] {
      GqlApi.mutate(g2, schema,
        """mutation { updateAcct(input: {filter: {id: "e:Acct/a1"},
          |  set: {owner: "bob@x"}}) }""".stripMargin, authClaims = ann)
    }
    assert(GqlApi.query(g2.now, schema,
      """{ getAcct(id: "e:Acct/a1") { owner } }""",
      authClaims = ann).collect()(0).getAs[String]("owner") == "ann@x")

    // a distinct updatePost: rule governs INSTEAD of update: for the
    // post-check (first-present chain: updatePost, update, query)
    val postSchema = GqlParser.parseSchema(
      """type Gauge @auth(updatePost: "{level: {ge: 0.0}}") {
        |  name: String! @unique
        |  level: Float
        |}""".stripMargin)
    val claims = Some(Map[String, Any]())
    val (h, _) = GqlApi.mutate(Graph.empty(spark), postSchema,
      """mutation { addGauge(input: [{id: "g1", name: "t", level: 1.0}]) }""")
    val (h2, _) = GqlApi.mutate(h, postSchema,
      """mutation { updateGauge(input: {filter: {id: "e:Gauge/g1"},
        |  set: {level: 3.0}}) }""".stripMargin, authClaims = claims)
    assert(GqlApi.query(h2.now, postSchema,
      """{ getGauge(id: "e:Gauge/g1") { level } }""").collect()(0)
      .getAs[Double]("level") == 3.0)
    intercept[SecurityException] {
      GqlApi.mutate(h2, postSchema,
        """mutation { updateGauge(input: {filter: {id: "e:Gauge/g1"},
          |  set: {level: -1.0}}) }""".stripMargin, authClaims = claims)
    }
  }

  /** seeded users + transactions linked through rt "User"
    * (Transaction --User--> User; User.transactions is @incoming). */
  def linked: (Graph, GqlParser.SchemaDef) = {
    val schema = GqlParser.parseSchema(sdl)
    val (g2, _) = GqlApi.mutate(seeded, schema,
      """mutation {
        |  addTransaction(input: [
        |    {id: "t1", amount: 10.0, type: EXPENSE},
        |    {id: "t2", amount: 30.0, type: INCOME},
        |    {id: "t3", amount: 5.0, type: EXPENSE}
        |  ])
        |}""".stripMargin)
    val (g3, _) = Transactor.transact(g2, Seq(
      PutRelation("User", "e:Transaction/t1", "e:User/u1"),
      PutRelation("User", "e:Transaction/t2", "e:User/u1"),
      PutRelation("User", "e:Transaction/t3", "e:User/u2")))
    (g3, schema)
  }

  test("nested entity sub-selection: one aggregated join per level") {
    val (g, schema) = linked
    import org.apache.spark.sql.Row
    val rows = GqlApi.query(g.now, schema,
      """{ queryUser(order: {asc: givenName}) {
        |    givenName
        |    transactions(filter: {amount: {ge: 6.0}}) { amount type }
        |} }""".stripMargin).collect()
    assert(rows.length == 2)
    val annTx = rows(0).getAs[scala.collection.Seq[Row]]("transactions")
    assert(annTx.map(r => (r.getAs[Double]("amount"), r.getAs[String]("type")))
      == Seq((10.0, "EXPENSE"), (30.0, "INCOME")))
    // Bob's only transaction (5.0) fails the nested filter → empty array
    assert(rows(1).getAs[scala.collection.Seq[Row]]("transactions").isEmpty)
    // single (non-list) relation field: a struct, null when absent
    val tx = GqlApi.query(g.now, schema,
      """{ queryTransaction(order: {asc: amount}) {
        |    amount
        |    user { email }
        |} }""".stripMargin).collect()
    assert(tx.map(_.getAs[Row]("user")).map(u =>
      if (u == null) null else u.getAs[String]("email")).toSeq
      == Seq("bob@x.com", "ann@x.com", "ann@x.com"))
    // count sub-selection still works alongside
    val counts = GqlApi.query(g.now, schema,
      """{ queryUser(order: {asc: givenName}) { transactions { count } } }""")
      .collect().map(_.getLong(0)).toSeq
    assert(counts == Seq(2L, 1L))
  }

  test("nested list-params: order/first/offset inside the sub-selection") {
    val (g, schema) = linked
    import org.apache.spark.sql.Row
    def annTx(listArgs: String): Seq[Double] = GqlApi.query(g.now, schema,
      s"""{ queryUser(filter: {givenName: {eq: "Ann"}}) {
         |    transactions($listArgs) { amount }
         |} }""".stripMargin).collect()(0)
      .getAs[scala.collection.Seq[Row]]("transactions")
      .map(_.getAs[Double]("amount")).toSeq
    // Ann's amounts: 10.0, 30.0
    assert(annTx("order: {desc: amount}") == Seq(30.0, 10.0))
    assert(annTx("order: {asc: amount}") == Seq(10.0, 30.0))
    assert(annTx("order: {desc: amount}, first: 1") == Seq(30.0))
    assert(annTx("order: {asc: amount}, offset: 1") == Seq(30.0))
    assert(annTx("order: {asc: amount}, offset: 5") == Seq())
    // sort key needn't be selected: order by type (enum/string), emit amount
    assert(annTx("order: {asc: type}") == Seq(10.0, 30.0)) // EXPENSE < INCOME
    // nested filter composes with nested ordering
    assert(annTx("filter: {amount: {ge: 6.0}}, order: {desc: amount}, first: 1")
      == Seq(30.0))
    // list-params on a single-entity field are rejected
    intercept[IllegalArgumentException] {
      GqlApi.query(g.now, schema,
        """{ queryTransaction { amount user(first: 1) { email } } }""")
        .collect()
    }
  }

  test("list-quantifier filters any/all/size compile to count joins") {
    val (g, schema) = linked
    def users(f: String): Seq[String] = GqlApi.query(g.now, schema,
      s"""{ queryUser(filter: $f, order: {asc: givenName}) { givenName } }""")
      .collect().map(_.getString(0)).toSeq
    assert(users("{transactions: {any: {amount: {gt: 20.0}}}}") == Seq("Ann"))
    assert(users("{transactions: {all: {amount: {le: 10.0}}}}") == Seq("Bob"))
    assert(users("{transactions: {size: {eq: 2}}}") == Seq("Ann"))
    assert(users("{not: {transactions: {any: {type: {eq: INCOME}}}}}") == Seq("Bob"))
    assert(users("{transactions: {any: {amount: {gt: 4.0}}}, active: false}")
      == Seq("Bob"))
    // single-entity relation filter: related atom exists and satisfies
    val amts = GqlApi.query(g.now, schema,
      """{ queryTransaction(filter: {user: {givenName: {eq: "Ann"}}},
        |                   order: {asc: amount}) { amount } }""".stripMargin)
      .collect().map(_.getDouble(0)).toSeq
    assert(amts == Seq(10.0, 30.0))
    // aggregate root takes quantified filters too
    val agg = GqlApi.query(g.now, schema,
      """{ aggregateUser(filter: {transactions: {any: {amount: {ge: 6.0}}}}) {
        |    count } }""".stripMargin).collect()(0)
    assert(agg.getAs[Long]("count") == 1)
  }

  test("relation {count} folds filter: and child @auth into the count join") {
    val (g, schema) = linked
    // filtered count: only transactions >= 6.0 are counted per user
    val rows = GqlApi.query(g.now, schema,
      """{ queryUser(order: {asc: givenName}) {
        |    givenName
        |    big: transactions(filter: {amount: {ge: 6.0}}) { count }
        |} }""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getAs[Long]("big"))).toSeq ==
      Seq(("Ann", 2L), ("Bob", 0L))) // ann: 10.0+30.0; bob's 5.0 filtered
    // non-filter argument still rejects loudly
    intercept[IllegalArgumentException] {
      GqlApi.query(g.now, schema,
        """{ queryUser { transactions(first: 1) { count } } }""")
    }
    // child @auth(query:) scopes the count to the caller's readable
    // subset — no information leak through counting
    val authed = GqlParser.parseSchema(
      """type Folder {
        |  name: String!
        |  docs: [Doc] @incoming @relation(rt: "In")
        |}
        |type Doc @auth(query: "{owner: {eq: $email}}") {
        |  owner: String!
        |  title: String!
        |}""".stripMargin)
    val (g1, _) = GqlApi.mutate(Graph.empty(spark), authed,
      """mutation { addFolder(input: [{id: "f1", name: "shared"}]) }""")
    val (g2, _) = GqlApi.mutate(g1, authed,
      """mutation { addDoc(input: [
        |  {id: "d1", owner: "ann@x", title: "A1"},
        |  {id: "d2", owner: "ann@x", title: "A2"}]) }""".stripMargin,
      authClaims = Some(Map("email" -> "ann@x")))
    val (g3, _) = GqlApi.mutate(g2, authed,
      """mutation { addDoc(input: [{id: "d3", owner: "bob@x", title: "B1"}]) }""",
      authClaims = Some(Map("email" -> "bob@x")))
    val (gf, _) = Transactor.transact(g3, Seq(
      PutRelation("In", "e:Doc/d1", "e:Folder/f1"),
      PutRelation("In", "e:Doc/d2", "e:Folder/f1"),
      PutRelation("In", "e:Doc/d3", "e:Folder/f1")))
    def countFor(claims: Map[String, Any]): Long =
      GqlApi.query(gf.now, authed,
        """{ queryFolder { name n: docs { count } } }""",
        authClaims = Some(claims)).collect()(0).getAs[Long]("n")
    assert(countFor(Map("email" -> "ann@x")) == 2L)
    assert(countFor(Map("email" -> "bob@x")) == 1L)
    assert(countFor(Map("email" -> "eve@x")) == 0L)
    // declared child auth + no claims is still a denial
    intercept[SecurityException] {
      GqlApi.query(gf.now, authed, """{ queryFolder { n: docs { count } } }""")
    }
    // auth AND filter compose in one count join
    assert(GqlApi.query(gf.now, authed,
      """{ queryFolder { n: docs(filter: {title: {contains: "2"}}) { count } } }""",
      authClaims = Some(Map("email" -> "ann@x"))).collect()(0)
      .getAs[Long]("n") == 1L)
  }

  test("nested sub-selection under @auth filters every level") {
    val sdl2 =
      """type Folder {
        |  name: String!
        |  docs: [Doc] @incoming @relation(rt: "In")
        |}
        |type Doc @auth(query: "{owner: {eq: $email}}") {
        |  owner: String!
        |  title: String!
        |}""".stripMargin
    val schema = GqlParser.parseSchema(sdl2)
    val (g1, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation { addFolder(input: [{id: "f1", name: "shared"}]) }""")
    // Doc's add auth falls back to its query rule — seed per owner
    val (g1b, _) = GqlApi.mutate(g1, schema,
      """mutation { addDoc(input: [{id: "d1", owner: "ann@x", title: "A1"}]) }""",
      authClaims = Some(Map("email" -> "ann@x")))
    val (g2, _) = GqlApi.mutate(g1b, schema,
      """mutation { addDoc(input: [{id: "d2", owner: "bob@x", title: "B1"}]) }""",
      authClaims = Some(Map("email" -> "bob@x")))
    val (g, _) = Transactor.transact(g2, Seq(
      PutRelation("In", "e:Doc/d1", "e:Folder/f1"),
      PutRelation("In", "e:Doc/d2", "e:Folder/f1")))
    import org.apache.spark.sql.Row
    def docTitles(claims: Map[String, Any]): Seq[String] =
      GqlApi.query(g.now, schema,
        """{ queryFolder { name docs { title } } }""",
        authClaims = Some(claims)).collect()(0)
        .getAs[scala.collection.Seq[Row]]("docs")
        .map(_.getAs[String]("title")).toSeq
    // the child level re-applies Doc's @auth: each caller sees only theirs
    assert(docTitles(Map("email" -> "ann@x")) == Seq("A1"))
    assert(docTitles(Map("email" -> "bob@x")) == Seq("B1"))
    assert(docTitles(Map("email" -> "eve@x")) == Seq())
    // no claims at all → the authed child level denies the whole query
    intercept[SecurityException] {
      GqlApi.query(g.now, schema, """{ queryFolder { name docs { title } } }""")
    }
  }

  // ---- @hook mutation hooks (commit_with_post_checks,
  // generate_api2.py:1310-1380) ----

  val hookSdl: String =
    """type Account @hook(onCreate: "stampCreated",
      |                   onUpdate: "vetUpdate",
      |                   onRemove: "logRemove") {
      |  email: String! @unique
      |  balance: Float
      |  stamped: Boolean
      |  audited: Boolean
      |}""".stripMargin

  test("schema SDL: @hook and @dynamic directives parse with validation") {
    val s = GqlParser.parseSchema(hookSdl)
    assert(s.tpe("Account").hooks == Map("onCreate" -> "stampCreated",
      "onUpdate" -> "vetUpdate", "onRemove" -> "logRemove"))
    // unknown hook key rejected (schema_file_parser.py:133)
    intercept[IllegalArgumentException] {
      GqlParser.parseSchema("""type T @hook(onTouch: "f") { x: String }""")
    }
    // @dynamic(hook:) lands on the field; requires the hook arg
    val d = GqlParser.parseSchema(
      """type T { x: String, shout: String @dynamic(hook: "shouter") }""")
    assert(d.tpe("T").field("shout").dynamic.contains("shouter"))
    intercept[IllegalArgumentException] {
      GqlParser.parseSchema("""type T { x: String @dynamic }""")
    }
    // @dynamic + @relation is contradictory (schema_file_parser.py:345)
    intercept[IllegalArgumentException] {
      GqlParser.parseSchema(
        """type T { x: String @dynamic(hook: "f") @relation(rt: "X") }""")
    }
    // entity-typed dynamic fields can't compile to a Column
    intercept[IllegalArgumentException] {
      GqlParser.parseSchema(
        """type U { name: String }
          |type T { u: U @dynamic(hook: "f") }""".stripMargin)
    }
    // dynamic fields carry no storage constraints even when marked required
    val c = GqlParser.parseSchema(
      """type T { x: String!, d: String! @unique @dynamic(hook: "f") }""")
      .constraints
    assert(c.required("T") == Seq("X") && !c.unique.contains("T"))
  }

  test("@hook onCreate: fires inside the SAME tx, writes land atomically") {
    import graft.gql.GqlHooks
    val schema = GqlParser.parseSchema(hookSdl)
    var g = Graph.empty(spark)
    g = GqlHooks.registerHook(g, "stampCreated",
      "ctx => Seq(UpdateEntity(ctx.atomId, Map(\"Stamped\" -> true)))",
      ctx => Seq(GqlLite.UpdateEntity(ctx.atomId,
        Map("Stamped" -> true))))._1
    g = GqlHooks.registerHook(g, "vetUpdate", "reject balance < 0",
      ctx => Nil)._1
    g = GqlHooks.registerHook(g, "logRemove", "noop", ctx => Nil)._1
    val before = g.maxSlice
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation { addAccount(input: [
        |  {id: "a1", email: "a@x.com", balance: 10.0},
        |  {id: "a2", email: "b@x.com", balance: 20.0}]) }""".stripMargin)
    // hook writes visible; ONE committed transaction, not two
    assert(g2.maxSlice == before + 1)
    val rows = GqlApi.query(g2.now, schema,
      """{ queryAccount(order: {asc: email}) { email stamped } }""").collect()
    assert(rows.length == 2 && rows.forall(_.getAs[Boolean]("stamped")))
    // the hook write is part of the tx's history like any field
    assert(g2.at(before).all("Account").count() == 0)
  }

  test("@hook reject: exception is an atomic abort; ordering vs constraints") {
    import graft.gql.GqlHooks
    val schema = GqlParser.parseSchema(hookSdl)
    var fired = 0
    var g = Graph.empty(spark)
    g = GqlHooks.registerHook(g, "stampCreated", "count + reject negatives",
      ctx => {
        fired += 1
        val bal = ctx.after.all("Account")
          .fields(("Balance", "v_double", "balance"))
          .filter(col("atom_id") === ctx.atomId)
          .collect().headOption.flatMap(r => Option(r.getAs[Any]("balance")))
        if (bal.exists(_.asInstanceOf[Double] < 0))
          throw new IllegalStateException("negative opening balance")
        Nil
      })._1
    g = GqlHooks.registerHook(g, "vetUpdate", "reject balance >= 100",
      ctx => {
        fired += 1
        val bal = ctx.after.all("Account")
          .fields(("Balance", "v_double", "balance"))
          .filter(col("atom_id") === ctx.atomId)
          .collect().headOption.flatMap(r => Option(r.getAs[Any]("balance")))
        if (bal.exists(_.asInstanceOf[Double] >= 100))
          throw new IllegalStateException("balance cap exceeded")
        Nil
      })._1
    g = GqlHooks.registerHook(g, "logRemove", "observe tombstone",
      ctx => {
        fired += 1
        // onRemove: gone in `after`, final state readable in `before`
        assert(ctx.after.all("Account").df
          .filter(col("atom_id") === ctx.atomId).count() == 0)
        assert(ctx.before.all("Account").df
          .filter(col("atom_id") === ctx.atomId).count() == 1)
        Nil
      })._1
    val (g1, _) = GqlApi.mutate(g, schema,
      """mutation { addAccount(input: [{id: "a1", email: "a@x.com", balance: 5.0}]) }""")
    assert(fired == 1)
    // onCreate rejects → atomic abort (no partial writes, no new tx)
    intercept[IllegalStateException] {
      GqlApi.mutate(g1, schema,
        """mutation { addAccount(input: [
          |  {id: "a2", email: "b@x.com", balance: 1.0},
          |  {id: "a3", email: "c@x.com", balance: -1.0}]) }""".stripMargin)
    }
    assert(g1.now.all("Account").count() == 1)
    // constraint violations abort BEFORE hooks fire (pre-write check)
    val firedBefore = fired
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g1, schema,
        """mutation { addAccount(input: [{id: "a4", email: "a@x.com"}]) }""")
    }
    assert(fired == firedBefore)
    // onUpdate fires on update mutations; reject rolls back
    val (g2, _) = GqlApi.mutate(g1, schema,
      """mutation { updateAccount(input: {filter: {id: "e:Account/a1"},
        |  set: {balance: 50.0}}) }""".stripMargin)
    intercept[IllegalStateException] {
      GqlApi.mutate(g2, schema,
        """mutation { updateAccount(input: {filter: {id: "e:Account/a1"},
          |  set: {balance: 500.0}}) }""".stripMargin)
    }
    assert(GqlApi.query(g2.now, schema,
      """{ getAccount(id: "e:Account/a1") { balance } }""")
      .collect()(0).getDouble(0) == 50.0)
    // onRemove fires with the tombstone view
    val removeFiredBefore = fired
    val (g3, _) = GqlApi.mutate(g2, schema,
      """mutation { deleteAccount(filter: {id: "e:Account/a1"}) }""")
    assert(fired == removeFiredBefore + 1)
    assert(g3.now.all("Account").count() == 0)
  }

  test("@hook writes compose with hook-free mutations in one document") {
    import graft.gql.GqlHooks
    // a hook writing a DERIVED field from the tentative frame — the
    // reference's set_field-inside-tx pattern (test_simplegql.py:83)
    val sdl2 =
      """type Doc @hook(onCreate: "grade") {
        |  title: String!
        |  words: Int
        |  sizeClass: String
        |}""".stripMargin
    val schema = GqlParser.parseSchema(sdl2)
    var g = Graph.empty(spark)
    g = GqlHooks.registerHook(g, "grade", "sizeClass from words",
      ctx => {
        val w = ctx.after.all("Doc")
          .fields(("Words", "v_long", "w"))
          .filter(col("atom_id") === ctx.atomId)
          .collect().headOption.flatMap(r => Option(r.getAs[Any]("w")))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        Seq(GqlLite.UpdateEntity(ctx.atomId,
          Map("SizeClass" -> (if (w >= 100) "LONG" else "SHORT"))))
      })._1
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation { addDoc(input: [
        |  {id: "d1", title: "A", words: 500},
        |  {id: "d2", title: "B", words: 30}]) }""".stripMargin)
    val rows = GqlApi.query(g2.now, schema,
      """{ queryDoc(order: {asc: title}) { title sizeClass } }""").collect()
    assert(rows.map(_.getAs[String]("sizeClass")).toSeq == Seq("LONG", "SHORT"))
  }

  test("@hook batch dispatch: 5k-object bulk add = one tx, O(1) Spark jobs") {
    import graft.gql.GqlHooks
    val sdl3 =
      """type Item @hook(onCreate: "tierAll") {
        |  sku: String!
        |  price: Float
        |  tier: String
        |}""".stripMargin
    val schema = GqlParser.parseSchema(sdl3)
    var g = Graph.empty(spark)
    var calls = 0
    g = GqlHooks.registerBatchHook(g, "tierAll",
      "affected | fields[Price] | set_field[Tier] (one plan for the set)",
      ctx => {
        calls += 1
        ctx.affected(("Price", "v_double", "p")).collect().toSeq.map { r =>
          val p = Option(r.getAs[Any]("p"))
            .map(_.asInstanceOf[Double]).getOrElse(0.0)
          GqlLite.UpdateEntity(r.getAs[String]("atom_id"),
            Map("Tier" -> (if (p >= 50.0) "HI" else "LO")))
        }
      })._1
    val n = 5000
    val inputs = (1 to n).map(i =>
      s"""{id: "i$i", sku: "s$i", price: ${i % 100}.0}""").mkString(", ")
    val before = g.maxSlice
    val sc = spark.sparkContext
    sc.setJobGroup("hook-batch-5k", "bulk add with onCreate batch hook")
    val (g2, _) = try {
      GqlApi.mutate(g, schema, s"mutation { addItem(input: [$inputs]) }")
    } finally sc.clearJobGroup()
    // status store is fed asynchronously — poll until the count settles
    def groupJobs(): Int =
      sc.statusTracker.getJobIdsForGroup("hook-batch-5k").length
    var jobs = groupJobs(); var stable = 0
    while (stable < 5) {
      Thread.sleep(100)
      val j = groupJobs()
      if (j == jobs) stable += 1 else { jobs = j; stable = 0 }
    }
    assert(calls == 1, "batch hook must be invoked exactly once for the set")
    assert(jobs <= 30,
      s"bulk add with a batch hook must stay O(1) Spark jobs, ran $jobs")
    // one committed tx; hook writes landed for every object
    assert(g2.maxSlice == before + 1)
    val tiers = GqlApi.query(g2.now, schema,
      "{ queryItem { sku price tier } }").collect()
    assert(tiers.length == n)
    assert(tiers.forall { r =>
      val want = if (r.getAs[Double]("price") >= 50.0) "HI" else "LO"
      r.getAs[String]("tier") == want
    })
  }

  test("@hook batch onRemove reads the tombstone set from the before-frame") {
    import graft.gql.GqlHooks
    val sdl =
      """type Acct @hook(onRemove: "auditAll") {
        |  name: String!
        |}""".stripMargin
    val schema = GqlParser.parseSchema(sdl)
    var g = Graph.empty(spark)
    var calls = 0
    var seenNames = Set.empty[String]
    g = GqlHooks.registerBatchHook(g, "auditAll", "audit removed set",
      ctx => {
        calls += 1
        assert(ctx.kind == "onRemove")
        // the whole removed set is gone in `after`...
        assert(ctx.after.all("Acct").df
          .join(ctx.idsDf, "atom_id").count() == 0)
        // ...and readable as ONE plan in `frame` (= before for onRemove)
        seenNames = ctx.affected(("Name", "v_str", "nm")).collect()
          .map(_.getAs[String]("nm")).toSet
        Nil
      })._1
    val (g1, _) = GqlApi.mutate(g, schema,
      """mutation { addAcct(input: [
        |  {id: "x", name: "nx"}, {id: "y", name: "ny"},
        |  {id: "z", name: "nz"}]) }""".stripMargin)
    assert(calls == 0) // no onCreate hook declared
    val (g2, _) = GqlApi.mutate(g1, schema,
      """mutation {
        |  deleteAcct(filter: {id: "e:Acct/x"})
        |  deleteAcct(filter: {id: "e:Acct/y"})
        |}""".stripMargin)
    assert(calls == 1, "one batch call for the whole removed set")
    assert(seenNames == Set("nx", "ny"))
    assert(g2.now.all("Acct").count() == 1)
  }

  test("@hook dedup key includes the type: shared tx-local id fires both hooks") {
    import graft.gql.GqlHooks
    // addA(id:"x") + addB(id:"x") in ONE document: the tx-local input ids
    // collide, but the hooks are per-type — both must fire (a dedup key
    // without the type silently skipped B's, bypassing its validation)
    val sdl4 =
      """type Alpha @hook(onCreate: "hookAlpha") { a: String }
        |type Beta @hook(onCreate: "hookBeta") { b: String }""".stripMargin
    val schema = GqlParser.parseSchema(sdl4)
    var fired = Set.empty[String]
    var g = Graph.empty(spark)
    g = GqlHooks.registerHook(g, "hookAlpha", "record Alpha firing", ctx => {
      fired += s"Alpha:${ctx.atomId}"; Nil })._1
    g = GqlHooks.registerHook(g, "hookBeta", "record Beta firing", ctx => {
      fired += s"Beta:${ctx.atomId}"; Nil })._1
    GqlApi.mutate(g, schema,
      """mutation {
        |  addAlpha(input: {id: "x", a: "1"})
        |  addBeta(input: {id: "x", b: "2"})
        |}""".stripMargin)
    assert(fired == Set("Alpha:e:Alpha/x", "Beta:e:Beta/x"))
  }

  test("@dynamic fields reject writes, short-form filters, @search indexing") {
    val sdl5 =
      """type P {
        |  name: String!
        |  score: Float
        |  flagged: Boolean @dynamic(hook: "flagOf")
        |  tier: String @search @dynamic(hook: "tierOf")
        |}""".stripMargin
    val schema = GqlParser.parseSchema(sdl5)
    // @search on a @dynamic field is never stored → contributes no index rt
    assert(!schema.searchRts.contains("Tier"))
    val g = Graph.empty(spark)
    // add with a value for a computed field: rejected, not silently stored
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g, schema,
        """mutation { addP(input: {id: "p1", name: "n", tier: "GOLD"}) }""")
    }
    // update set / remove on a computed field: rejected
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g, schema,
        """mutation { updateP(input: {filter: {id: "e:P/p1"},
          |  set: {tier: "GOLD"}}) }""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g, schema,
        """mutation { updateP(input: {filter: {id: "e:P/p1"},
          |  set: {name: "m"}, remove: {tier: true}}) }""".stripMargin)
    }
    // boolean SHORT-FORM filter on a @dynamic field: the same intended
    // UnsupportedOperationException as the long form, not a late
    // unresolved-column failure
    intercept[UnsupportedOperationException] {
      GqlApi.query(g.now, schema,
        """{ queryP(filter: {flagged: true}) { name } }""")
    }
  }

  // ---- @dynamic computed fields (GQL_FunctionResolver,
  // generate_api2.py:938-947) ----

  test("@dynamic field: computed Column in the one plan; select + sort") {
    import graft.gql.GqlHooks
    val sdl2 =
      """type P {
        |  name: String!
        |  score: Float
        |  shout: String @dynamic(hook: "shouter")
        |  band: String @dynamic(hook: "bander")
        |}""".stripMargin
    val schema = GqlParser.parseSchema(sdl2)
    var g = Graph.empty(spark)
    g = GqlHooks.registerDynamic(g, "shouter", "upper(name) || '!'",
      Seq("name"), df => concat(upper(col("name")), lit("!")))._1
    g = GqlHooks.registerDynamic(g, "bander", "score band",
      Seq("score"), df => when(col("score") >= 5.0, "HIGH").otherwise("LOW"))._1
    val (g2, _) = GqlApi.mutate(g, schema,
      """mutation { addP(input: [
        |  {id: "p1", name: "ann", score: 9.0},
        |  {id: "p2", name: "bob", score: 2.0}]) }""".stripMargin)
    // select: computed from `needs` even when those fields aren't selected
    val rows = GqlApi.query(g2.now, schema,
      """{ queryP(order: {asc: name}) { shout band } }""").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("ANN!", "HIGH"), ("BOB!", "LOW")))
    // sort on a dynamic field that is not selected
    val sorted = GqlApi.query(g2.now, schema,
      """{ queryP(order: {asc: band}) { name } }""").collect()
    assert(sorted.map(_.getString(0)).toSeq == Seq("ann", "bob")) // HIGH < LOW
    // alias works; scalar + dynamic mix
    val mixed = GqlApi.query(g2.now, schema,
      """{ queryP(filter: {score: {ge: 5.0}}) { name s: shout } }""").collect()
    assert(mixed.length == 1 && mixed(0).getAs[String]("s") == "ANN!")
    // filtering on a dynamic field is declared unsupported
    intercept[UnsupportedOperationException] {
      GqlApi.query(g2.now, schema,
        """{ queryP(filter: {shout: {eq: "ANN!"}}) { name } }""")
    }
    // aggregating over a dynamic field is declared unsupported
    intercept[IllegalArgumentException] {
      GqlApi.query(g2.now, schema, """{ aggregateP { shoutMin } }""")
    }
    // unregistered resolver fails loudly at plan time
    val schemaBad = GqlParser.parseSchema(
      """type P { name: String!, x: String @dynamic(hook: "nope") }""")
    intercept[NoSuchElementException] {
      GqlApi.query(g2.now, schemaBad, """{ queryP { x } }""")
    }
  }

  test("@dynamic inside nested sub-selections") {
    import graft.gql.GqlHooks
    val sdl2 =
      """type Team {
        |  tname: String!
        |  members: [M] @incoming @relation(rt: "MemberOf")
        |}
        |type M {
        |  name: String!
        |  loud: String @dynamic(hook: "loudName")
        |}""".stripMargin
    val schema = GqlParser.parseSchema(sdl2)
    var g = Graph.empty(spark)
    g = GqlHooks.registerDynamic(g, "loudName", "upper(name)",
      Seq("name"), df => upper(col("name")))._1
    val (g1, _) = GqlApi.mutate(g, schema,
      """mutation { addTeam(input: [{id: "t1", tname: "alpha",
        |  members: [{id: "m1", name: "ann"}, {id: "m2", name: "bob"}]}]) }""".stripMargin)
    import org.apache.spark.sql.Row
    val row = GqlApi.query(g1.now, schema,
      """{ queryTeam { tname members { loud } } }""").collect()(0)
    assert(row.getAs[scala.collection.Seq[Row]]("members")
      .map(_.getString(0)).sorted == Seq("ANN", "BOB"))
  }

  test("parsed aggregate root with enum filter over mutations") {
    val schema = GqlParser.parseSchema(sdl)
    val (g, _) = GqlApi.mutate(Graph.empty(spark), schema,
      """mutation {
        |  addTransaction(input: [
        |    {id: "t1", amount: 10.0, type: EXPENSE},
        |    {id: "t2", amount: 30.0, type: EXPENSE},
        |    {id: "t3", amount: 5.0, type: INCOME}
        |  ])
        |}""".stripMargin)
    val agg = GqlApi.query(g.now, schema,
      """query {
        |  aggregateTransaction(filter: {type: {eq: EXPENSE}}) {
        |    count
        |    amountSum
        |    amountMax
        |  }
        |}""".stripMargin).collect()(0)
    assert(agg.getAs[Long]("count") == 2)
    assert(agg.getAs[Double]("amountSum") == 40.0)
    assert(agg.getAs[Double]("amountMax") == 30.0)
  }

  test("lexer escapes, anonymous-op variables, trailing-input rejection") {
    import graft.gql.GqlParser
    // full escape set incl. \uXXXX (the old lexer kept the 'u' literally:
    // "café" silently became the 9-char "cafu00e9")
    val doc = "{ queryUser(filter: {name: {eq: " +
      "\"caf\\u00e9 a\\rb\\t\\\"q\\\" \\\\ \\/\"}}) { id } }"
    val op = GqlParser.parseOperation(doc)
    val filterStr = op.roots.head.args.toString
    assert(filterStr.contains("café a\rb\t\"q\" \\ /"), filterStr)
    // unknown escapes reject loudly instead of corrupting the value
    intercept[IllegalArgumentException] {
      GqlParser.parseOperation("""{ q(filter: {x: {eq: "a\zb"}}) { id } }""")
    }
    // anonymous operation WITH variable declarations is valid GraphQL
    // that stock clients emit (name is optional before the declarations)
    val anon = GqlParser.parseOperation(
      "query ($min: Float!) { queryUser(filter: {bal: {ge: $min}}) { id } }",
      Map("min" -> 5.0))
    assert(anon.kind == "query" && anon.roots.head.name == "queryUser")
    // trailing input after the operation rejects loudly (a pasted second
    // operation was silently ignored — clients believed it executed)
    val ex = intercept[IllegalArgumentException] {
      GqlParser.parseOperation(
        "{ queryUser { id } } mutation { deleteUser(filter: {id: {eq: \"u\"}}) }")
    }
    assert(ex.getMessage.contains("trailing"))
  }

  test("review pass 15: loud args, count shadow, ref vetting, empty sels") {
    import org.apache.spark.sql.Row
    val schema = GqlParser.parseSchema(sdl)
    val g = seeded
    // (1) unknown root-field arguments reject LOUDLY on every root — a
    // typo'd filter: used to return the FULL unfiltered set (and a typo'd
    // mutation arg mutated everything the filterless path allowed)
    val e1 = intercept[IllegalArgumentException] {
      GqlApi.query(g.now, schema,
        """{ queryUser(fliter: {givenName: {eq: "Ann"}}) { givenName } }""")
    }
    assert(e1.getMessage.contains("unknown argument 'fliter'"))
    intercept[IllegalArgumentException] { // get takes only id:
      GqlApi.query(g.now, schema, """{ getUser(id: "e:User/u1", first: 1) { id } }""")
    }
    intercept[IllegalArgumentException] { // aggregate takes only filter:
      GqlApi.query(g.now, schema, """{ aggregateUser(order: {asc: score}) { count } }""")
    }
    intercept[IllegalArgumentException] { // mutations too
      GqlApi.mutate(g, schema,
        """mutation { deleteUser(fitler: {id: "e:User/u1"}) }""")
    }
    intercept[IllegalArgumentException] {
      GqlApi.mutate(g, schema,
        """mutation { addUser(input: [{id: "u7", email: "g@x.com"}], upsert: true) }""")
    }
    // known args still pass through untouched
    assert(GqlApi.query(g.now, schema,
      """{ queryUser(filter: {givenName: {eq: "Ann"}}, first: 1) { givenName } }""")
      .collect().map(_.getString(0)).toSeq == Seq("Ann"))

    // (2) a child type DECLARING a field named `count` wins over the
    // relation-count form (the aggregate used to shadow the stored values)
    val sdl2 =
      """type Shelf { label: String
        |  books: [Book] @incoming @relation(rt: "On") }
        |type Book { title: String
        |  count: Int
        |  on: Shelf @relation(rt: "On") }""".stripMargin
    val schema2 = GqlParser.parseSchema(sdl2)
    val (g2, _) = GqlApi.mutate(Graph.empty(spark), schema2,
      """mutation { addShelf(input: [
        |  {id: "s1", label: "A",
        |   books: [{id: "b1", title: "X", count: 7},
        |           {id: "b2", title: "Y", count: 9}]}]) }""".stripMargin)
    val shelves = GqlApi.query(g2.now, schema2,
      """{ queryShelf { label books(order: {asc: count}) { count } } }""").collect()
    // declared Book.count values, sorted — NOT the relation count 2
    assert(shelves.length == 1)
    val counts = shelves(0).getSeq[Row](1).map(_.getAs[Long]("count"))
    assert(counts == Seq(7L, 9L), s"got $counts")

    // (3) a pure-ref nested input carrying a WRONG-TYPE scheme id rejects
    // at compile time (it used to silently link a Book where a Shelf
    // belongs), and (4) a ref to a NONEXISTENT atom rejects at the
    // batch-wide alive probe instead of creating a dangling relation
    val e3 = intercept[IllegalArgumentException] {
      GqlApi.mutate(g2, schema2,
        """mutation { addBook(input: [
          |  {id: "b9", title: "Z", on: {id: "e:Book/b1"}}]) }""".stripMargin)
    }
    assert(e3.getMessage.contains("not a Shelf id"))
    val e4 = intercept[IllegalArgumentException] {
      GqlApi.mutate(g2, schema2,
        """mutation { addBook(input: [
          |  {id: "b9", title: "Z", on: {id: "e:Shelf/ghost"}}]) }""".stripMargin)
    }
    assert(e4.getMessage.contains("not alive"), e4.getMessage)
    // a ref to an atom CREATED IN THE SAME DOCUMENT still links fine
    // (in-batch ids are recognized by their deterministic scheme ids)
    val (g3, _) = GqlApi.mutate(g2, schema2,
      """mutation {
        |  addShelf(input: [{id: "s2", label: "B"}])
        |  addBook(input: [{id: "b9", title: "Z", on: {id: "e:Shelf/s2"}}])
        |}""".stripMargin)
    assert(GqlApi.query(g3.now, schema2,
      """{ queryShelf(filter: {label: {eq: "B"}}) { books { title } } }""")
      .collect()(0).getSeq[Row](0).map(_.getString(0)) == Seq("Z"))

    // (5) empty selection sets reject at PARSE time (GraphQL grammar)
    val e5 = intercept[IllegalArgumentException] {
      GqlParser.parseOperation("{ queryUser { } }")
    }
    assert(e5.getMessage.contains("empty selection set"))
    intercept[IllegalArgumentException] {
      GqlParser.parseOperation("{ }")
    }
  }

  test("review pass 19: nested selections vet their args like roots") {
    import org.apache.spark.sql.Row
    val sdl3 =
      """type Shelf { label: String
        |  books: [Book] @incoming @relation(rt: "On") }
        |type Book { title: String
        |  on: Shelf @relation(rt: "On") }""".stripMargin
    val schema3 = GqlParser.parseSchema(sdl3)
    val (g, _) = GqlApi.mutate(Graph.empty(spark), schema3,
      """mutation { addShelf(input: [
        |  {id: "s1", label: "A",
        |   books: [{id: "b1", title: "X"}, {id: "b2", title: "Y"}]}]) }""".stripMargin)
    // a typo'd NESTED filter: used to silently return the FULL child list
    // — the failure class requireArgs killed at the root, one level down
    val e = intercept[IllegalArgumentException] {
      GqlApi.query(g.now, schema3,
        """{ queryShelf { label books(fliter: {title: {eq: "X"}}) { title } } }""")
    }
    assert(e.getMessage.contains("unknown argument 'fliter'"), e.getMessage)
    // single-entity nested fields take filter: only
    intercept[IllegalArgumentException] {
      GqlApi.query(g.now, schema3,
        """{ queryBook { title on(first: 1) { label } } }""")
    }
    // scalar fields and id take no arguments at all
    intercept[IllegalArgumentException] {
      GqlApi.query(g.now, schema3, """{ queryBook { title(first: 1) } }""")
    }
    intercept[IllegalArgumentException] {
      GqlApi.query(g.now, schema3, """{ queryBook { id(first: 1) } }""")
    }
    // the relation-count form keeps its filter-only vetting
    intercept[IllegalArgumentException] {
      GqlApi.query(g.now, schema3,
        """{ queryShelf { books(order: {asc: title}) { count } } }""")
    }
    // the KNOWN nested list-params still pass through untouched
    val rows = GqlApi.query(g.now, schema3,
      """{ queryShelf { label
        |  books(filter: {title: {in: ["X", "Y"]}}, order: {desc: title}, first: 1)
        |  { title } } }""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows(0).getSeq[Row](1).map(_.getString(0)) == Seq("Y"))
    // and a nested single-entity filter: still works
    val one = GqlApi.query(g.now, schema3,
      """{ queryBook(filter: {title: {eq: "X"}}) { title on(filter: {label: {eq: "A"}}) { label } } }""")
      .collect()
    assert(one.length == 1 && one(0).getStruct(1).getString(0) == "A")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.gql.GqlLite

class ZefListGqlMutationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("ZefList: ordered elements with index on meta-relation") {
    val (g0, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Song", "s1"), PutEntity("Song", "s2"), PutEntity("Song", "s3")))
    val (g, _) = ZefList.create(g0, "playlist",
      Seq("e:Song/s2", "e:Song/s3", "e:Song/s1"))
    val els = ZefList.elements(g.now, "playlist").collect()
    assert(els.map(_.getAs[Long]("idx")).toSeq == Seq(0L, 1L, 2L))
    assert(els.map(_.getAs[String]("element_id")).toSeq ==
      Seq("e:Song/s2", "e:Song/s3", "e:Song/s1"))
    assert(g.now.all("ZEF_List").count() == 1)
  }

  test("GqlLite mutations: add/update/delete through the write path") {
    import GqlLite._
    val (g1, r1) = mutate(Graph.empty(spark), Seq(
      AddEntity("User", "u1", Map("Name" -> "Ann", "Score" -> 10.0)),
      AddEntity("User", "u2", Map("Name" -> "Bob"))))
    assert(g1.now.all("User").count() == 2)
    assert(r1.ids("u1") == "e:User/u1")

    val (g2, _) = mutate(g1, Seq(
      UpdateEntity("e:User/u1", Map("Score" -> 99.0))))
    val score = g2.now.all("User")
      .fieldValue("Score", "v_double", "s").collect()
    assert(score.map(_.getAs[Double]("s")).toSet == Set(99.0))
    // history preserved: old frame still sees 10.0
    assert(g2.at(1).all("User").fieldValue("Score", "v_double", "s")
      .collect()(0).getAs[Double]("s") == 10.0)

    val (g3, _) = mutate(g2, Seq(DeleteEntity("e:User/u2")))
    assert(g3.now.all("User").count() == 1)
    assert(g3.at(2).all("User").count() == 2) // time travel sees it alive
  }

  test("GqlLite constraints: @unique and required enforced pre-write") {
    import GqlLite._
    val cons = Constraints(
      unique = Map("User" -> Seq("Email")),
      required = Map("User" -> Seq("Email")))
    val (g, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("User", "u1", Map("Email" -> "a@x.com"))), constraints = cons)
    // duplicate vs store
    intercept[IllegalArgumentException] {
      mutate(g, Seq(AddEntity("User", "u2", Map("Email" -> "a@x.com"))),
        constraints = cons)
    }
    // duplicate within batch
    intercept[IllegalArgumentException] {
      mutate(g, Seq(
        AddEntity("User", "u3", Map("Email" -> "b@x.com")),
        AddEntity("User", "u4", Map("Email" -> "b@x.com"))), constraints = cons)
    }
    // missing required
    intercept[IllegalArgumentException] {
      mutate(g, Seq(AddEntity("User", "u5", Map("Name" -> "NoMail"))),
        constraints = cons)
    }
    // rejected txs wrote nothing
    assert(g.now.all("User").count() == 1)
    // distinct value passes
    val (g2, _) = mutate(g, Seq(
      AddEntity("User", "u6", Map("Email" -> "c@x.com"))), constraints = cons)
    assert(g2.now.all("User").count() == 2)
  }

  test("GqlLite @unique checks typed (non-string) values against the store") {
    import GqlLite._
    val cons = Constraints(unique = Map("Device" -> Seq("Serial")))
    // long-valued unique field: v_str is null for these rows, so a
    // string-column-only check would silently pass the collision
    val (g, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("Device", "d1", Map("Serial" -> 12345L))), constraints = cons)
    intercept[IllegalArgumentException] {
      mutate(g, Seq(AddEntity("Device", "d2", Map("Serial" -> 12345L))),
        constraints = cons)
    }
    // Int vs stored Long collides too (both live in v_long)
    intercept[IllegalArgumentException] {
      mutate(g, Seq(AddEntity("Device", "d3", Map("Serial" -> 12345))),
        constraints = cons)
    }
    val (g2, _) = mutate(g, Seq(
      AddEntity("Device", "d4", Map("Serial" -> 99999L))), constraints = cons)
    assert(g2.now.all("Device").count() == 2)
    // double-valued unique field
    val consD = Constraints(unique = Map("Probe" -> Seq("Calib")))
    val (h, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("Probe", "p1", Map("Calib" -> 2.5))), constraints = consD)
    intercept[IllegalArgumentException] {
      mutate(h, Seq(AddEntity("Probe", "p2", Map("Calib" -> 2.5))),
        constraints = consD)
    }
    // MIXED-WIDTH in-batch duplicate: boxed Int 777 != boxed Long 777
    // under equals, so the batch-dup check used to pass the pair and the
    // store probe (which only sees store rows) committed two entities
    // holding the same stored v_long value in ONE transaction
    intercept[IllegalArgumentException] {
      mutate(Graph.empty(spark), Seq(
        AddEntity("Device", "m1", Map("Serial" -> 777)),
        AddEntity("Device", "m2", Map("Serial" -> 777L))), constraints = cons)
    }
  }

  test("GqlLite @unique binds UPDATES too; own-value re-set passes") {
    import GqlLite._
    val cons = Constraints(unique = Map("User" -> Seq("Email")),
      required = Map("User" -> Seq("Email")))
    val (g, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("User", "a", Map("Email" -> "a@x.com")),
      AddEntity("User", "b", Map("Email" -> "b@x.com"))), constraints = cons)
    // an update stealing another entity's unique value used to commit
    // silently — only adds were checked
    intercept[IllegalArgumentException] {
      mutate(g, Seq(UpdateEntity("e:User/b", Map("Email" -> "a@x.com"))),
        constraints = cons)
    }
    // add + update colliding within one batch
    intercept[IllegalArgumentException] {
      mutate(g, Seq(
        AddEntity("User", "c", Map("Email" -> "c@x.com")),
        UpdateEntity("e:User/b", Map("Email" -> "c@x.com"))),
        constraints = cons)
    }
    // re-setting the entity's OWN current value is not a collision
    val (g2, _) = mutate(g,
      Seq(UpdateEntity("e:User/b", Map("Email" -> "b@x.com"))),
      constraints = cons)
    // and a genuinely new value passes
    val (g3, _) = mutate(g2,
      Seq(UpdateEntity("e:User/b", Map("Email" -> "b2@x.com"))),
      constraints = cons)
    assert(g3.now.all("User")
      .fieldValue("Email", "v_str", "e").collect()
      .map(_.getAs[String]("e")).toSet == Set("a@x.com", "b2@x.com"))
    // removing a required field rejects (the entity would go schema-invalid)
    intercept[IllegalArgumentException] {
      mutate(g3, Seq(RemoveField("e:User/b", "Email")), constraints = cons)
    }
  }

  test("GqlLite hops: relation counts in one aggregated join") {
    import GqlLite._
    val g = GraphEncoder.encodeTpch(spark, "/root/testdata/sf0.001")
    val rows = GqlLite.run(g.now, Query("Customer",
      fields = Seq(("c_name", "v_str", "name")),
      hops = Seq(Hop("Placed", incoming = false, as = "n_orders")),
      sort = Seq(SortKey("n_orders", asc = false)),
      first = Some(5))).collect()
    assert(rows.length == 5)
    val counts = rows.map(_.getAs[Long]("n_orders"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(counts.head > 0)
  }

  test("GqlLite auth hook rejects unauthorized mutations atomically") {
    import GqlLite._
    val (g, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("Doc", "d1", Map("Owner" -> "ann")),
      AddEntity("Doc", "d2", Map("Owner" -> "bob"))))
    // auth: only ann's docs may be mutated — the vet builds the
    // authorized id set as ONE field-value plan over the frame (the old
    // opaque per-id hook collected the owner once per target: O(targets)
    // driver round-trips)
    val annOnly: AuthVet = slice =>
      slice.all("Doc").fieldValue("Owner", "v_str", "o")
        .filter(col("o").startsWith("ann")).select(col("atom_id"))
    val (g2, _) = mutate(g,
      Seq(UpdateEntity("e:Doc/d1", Map("Owner" -> "ann2"))), Some(annOnly))
    assert(g2.maxSlice == 2)
    intercept[SecurityException] {
      mutate(g2, Seq(DeleteEntity("e:Doc/d2")), Some(annOnly))
    }
    // nothing written by the rejected tx
    assert(g2.now.all("Doc").count() == 2)
    // multi-target tx: one vet pass covers the whole batch and names
    // exactly the unauthorized targets; the authorized one is not blamed
    // and the WHOLE tx still aborts (atomicity)
    val e = intercept[SecurityException] {
      mutate(g2, Seq(
        UpdateEntity("e:Doc/d1", Map("Owner" -> "ann3")),
        DeleteEntity("e:Doc/d2")), Some(annOnly))
    }
    assert(e.getMessage.contains("e:Doc/d2"), e.getMessage)
    assert(!e.getMessage.contains("e:Doc/d1"), e.getMessage)
    assert(g2.now.all("Doc").count() == 2)

    // an ADD landing on an EXISTING key is an update in disguise
    // (PutEntity is idempotent, PutField overwrites) — it must pass the
    // same vet, or auth is bypassed by re-"adding" the victim's id
    val e2 = intercept[SecurityException] {
      mutate(g2, Seq(AddEntity("Doc", "d2", Map("Owner" -> "mallory"))),
        Some(annOnly))
    }
    assert(e2.getMessage.contains("e:Doc/d2"), e2.getMessage)
    // a genuinely NEW key needs no pre-existing authorization
    val (g3, _) = mutate(g2,
      Seq(AddEntity("Doc", "d9", Map("Owner" -> "ann"))), Some(annOnly))
    assert(g3.now.all("Doc").count() == 3)
    // linking two EXISTING atoms mutates them — vetted too (d2 not ann's)
    intercept[SecurityException] {
      mutate(g3, Seq(LinkEntities("Cites", "e:Doc/d1", "e:Doc/d2")),
        Some(annOnly))
    }
  }

  test("large-batch probes: semi-join path above the In cutoff matches the literal path") {
    import GqlLite._
    // 1,200 entities — past InProbeCutoff (1000), so the alive probe, the
    // auth vet probe, the unique-value probe and run()'s In filter all
    // take the broadcast local-relation join instead of building a
    // 1,200-literal Catalyst tree (the shape where a 100k bulk mutation
    // spends its time in ANALYSIS, not data)
    val n = 1200
    assert(n > GqlLite.InProbeCutoff)
    val (g, _) = mutate(Graph.empty(spark),
      (0 until n).map(i => AddEntity("Doc", s"d$i",
        Map("Owner" -> s"ann$i", "Tag" -> s"t$i"))))
    val ids = (0 until n).map(i => s"e:Doc/d$i")
    // run() with a big In(atom_id): same result set as the frame itself
    val hit = GqlLite.run(g.now, Query("Doc", Seq(("Tag", "v_str", "Tag")),
      Some(In("atom_id", ids))))
    assert(hit.count() == n)
    // the plan carries NO giant literal In/InSet — the probe is a join
    import org.apache.spark.sql.catalyst.expressions.{In => CatIn, InSet}
    val bigLiterals = hit.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case i: CatIn if i.list.size > GqlLite.InProbeCutoff => i: Any
        case s: InSet if s.hset.size > GqlLite.InProbeCutoff => s: Any
      })
    }.flatten
    assert(bigLiterals.isEmpty,
      "big In compiled to a literal list, not a local-relation join")
    // And(big In, other predicate): the conjunct still applies
    assert(GqlLite.run(g.now, Query("Doc", Seq(("Tag", "v_str", "Tag")),
      Some(And(In("atom_id", ids), Eq("Tag", "t7"))))).count() == 1)
    // bulk mutate across the whole batch: alive + vet probes at n ids
    val allVet: AuthVet = slice => slice.all("Doc").df.select(col("atom_id"))
    val (g2, _) = mutate(g,
      (0 until n).map(i => UpdateEntity(s"e:Doc/d$i", Map("Owner" -> "x"))),
      Some(allVet))
    assert(g2.maxSlice == 2)
    // a vet that misses ONE id still rejects loudly on the join path
    val allButLast: AuthVet = slice =>
      slice.all("Doc").df.select(col("atom_id"))
        .filter(col("atom_id") =!= s"e:Doc/d${n - 1}")
    val e = intercept[SecurityException] {
      mutate(g2, (0 until n).map(i =>
        UpdateEntity(s"e:Doc/d$i", Map("Owner" -> "y"))), Some(allButLast))
    }
    assert(e.getMessage.contains(s"e:Doc/d${n - 1}"), e.getMessage)
    // a large-batch @unique ADD probes the store via the join path too:
    // one colliding value among 1,200 still trips the constraint
    val c = Constraints(unique = Map("Doc" -> Seq("Tag")))
    val e2 = intercept[IllegalArgumentException] {
      mutate(g2, (0 until n).map(i => AddEntity("Doc", s"x$i",
        Map("Tag" -> (if (i == n - 1) "t7" else s"fresh$i")))),
        constraints = c)
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // the non-colliding large batch passes
    val (g3, _) = mutate(g2, (0 until n).map(i =>
      AddEntity("Doc", s"y$i", Map("Tag" -> s"new$i"))), constraints = c)
    assert(g3.now.all("Doc").count() == 2L * n)
    // negate parity across the cutoff: NOT IN drops null field values on
    // BOTH paths (a bare anti-join would keep them — cutoff-dependent
    // row sets); the null row survives neither probe size
    import spark.implicits._
    val withNull = Seq(Some("keep"), None, Some("v0"))
      .toDF("f").union((1 until n).map(i => Some(s"v$i")).toDF("f"))
    def negKeep(k: Int) = GqlLite.inFilter(withNull, "f",
      (0 until k).map(i => s"v$i"), negate = true)
      .collect().map(_.getString(0)).toSet
    assert(negKeep(n) == Set("keep"), s"got ${negKeep(n)}")     // join path
    val literal = negKeep(GqlLite.InProbeCutoff - 1)            // literal path
    assert(literal == Set("keep") ++
      (GqlLite.InProbeCutoff - 1 until n).map(i => s"v$i"),
      "null semantics diverged across the In cutoff")
  }

  test("GqlLite update/delete of a missing or terminated id rejects loudly") {
    import GqlLite._
    val (g, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("Doc", "d1", Map("Owner" -> "ann"))))
    // nonexistent target: PutField would append AE/value rows anchored to
    // no entity — a "successful" write no read ever sees
    val e = intercept[IllegalArgumentException] {
      mutate(g, Seq(UpdateEntity("e:Doc/TYPO", Map("Owner" -> "x"))))
    }
    assert(e.getMessage.contains("e:Doc/TYPO"), e.getMessage)
    // terminated target: same ghost-row class
    val (g2, _) = mutate(g, Seq(DeleteEntity("e:Doc/d1")))
    intercept[IllegalArgumentException] {
      mutate(g2, Seq(UpdateEntity("e:Doc/d1", Map("Owner" -> "x"))))
    }
    // but an update of an id CREATED in the same batch is legal — the
    // hook flow re-transacts adds + follow-up updates in one tx
    val (g3, _) = mutate(g2, Seq(
      AddEntity("Doc", "d5", Map("Owner" -> "ann")),
      UpdateEntity("e:Doc/d5", Map("Owner" -> "ann2"))))
    assert(AtomSet(g3.now, g3.now.all("Doc").df)
      .fieldValue("Owner", "v_str", "o")
      .collect().map(_.getString(1)).toSeq == Seq("ann2"))
  }

  test("unique constraint: value moves within one tx are legal; true collisions still reject") {
    import GqlLite._
    val uniq = Constraints(unique = Map("User" -> Seq("Email")))
    val (g, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("User", "a", Map("Email" -> "x@z")),
      AddEntity("User", "b", Map("Email" -> "y@z"))), constraints = uniq)
    // move: a releases "x@z" and a new user takes it — one tx, legal
    val (g2, _) = mutate(g, Seq(
      UpdateEntity("e:User/a", Map("Email" -> "a2@z")),
      AddEntity("User", "c", Map("Email" -> "x@z"))), constraints = uniq)
    assert(g2.now.all("User").count() == 3)
    // swap: a and b exchange values — legal
    val (g3, _) = mutate(g2, Seq(
      UpdateEntity("e:User/a", Map("Email" -> "y@z")),
      UpdateEntity("e:User/b", Map("Email" -> "a2@z")))
      , constraints = uniq)
    assert(g3.now.all("User").count() == 3)
    // delete-and-reuse in one tx — legal
    val (g4, _) = mutate(g3, Seq(
      DeleteEntity("e:User/c"),
      AddEntity("User", "d", Map("Email" -> "x@z"))), constraints = uniq)
    assert(g4.now.all("User").count() == 3)
    // true collision: an UNTOUCHED holder's value is taken — rejects
    intercept[IllegalArgumentException] {
      mutate(g4, Seq(UpdateEntity("e:User/d", Map("Email" -> "y@z"))),
        constraints = uniq)
    }
    // a null field value cannot ride a value row: the uniqueness probe
    // skips it (nulls are not unique-constrained) and the compile step
    // rejects with a pointer to RemoveField instead of NPE-ing in
    // ValueRow.of
    val e = intercept[IllegalArgumentException] {
      mutate(g4, Seq(UpdateEntity("e:User/a", Map("Email" -> null))),
        constraints = uniq)
    }
    assert(e.getMessage.contains("RemoveField"), e.getMessage)
  }

  test("compileFilter: empty And()/Or() are identities, not crashes") {
    import GqlLite._
    val (g, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("Doc", "d1", Map("Score" -> 1.0)),
      AddEntity("Doc", "d2", Map("Score" -> 2.0))))
    val base = g.now.all("Doc").fieldValue("Score", "v_double", "s")
    // {and: []} parses to And() in GqlApi — identity true
    assert(base.filter(compileFilter(And())).count() == 2)
    // empty Or matches nothing
    assert(base.filter(compileFilter(Or())).count() == 0)
    assert(base.filter(compileFilter(
      And(Or(), Eq("s", 1.0)))).count() == 0)
  }

  test("meta-link endpoint given as the batch's tx-local relation key is in-batch, not a ref") {
    import GqlLite._
    // Transactor.ref resolves "a>b:Cites" via relationIds BEFORE the ':'
    // passthrough, so a meta-link endpoint in that (documented) form names
    // the batch's OWN relation — the liveness probe must not treat it as a
    // full-atom-id ref and reject it as "not alive" (it can't be alive:
    // the batch is creating it)
    val (g, _) = mutate(Graph.empty(spark), Seq(
      AddEntity("Doc", "a", Map("Title" -> "A")),
      AddEntity("Doc", "b", Map("Title" -> "B")),
      AddEntity("Topic", "t", Map("Name" -> "T")),
      LinkEntities("Cites", "a", "b"),
      LinkEntities("About", "a>b:Cites", "t")))
    val citesId = Transactor.atomId(Kind.Relation, "Cites", "a>b:Cites")
    val topicId = Transactor.atomId(Kind.Entity, "Topic", "t")
    val metas = g.now.aliveAtoms.filter(col("atype") === "About")
      .select("src_id", "dst_id").collect()
    assert(metas.length == 1)
    assert(metas(0).getString(0) == citesId,
      s"meta-link src should be the in-batch Cites relation, got ${metas(0)}")
    assert(metas(0).getString(1) == topicId)
    // an endpoint in the same shape NOT created by this batch still
    // rejects loudly at the liveness probe (typo'd/stale ref)
    val e = intercept[IllegalArgumentException] {
      mutate(g, Seq(LinkEntities("About", "x>y:Cites", topicId)))
    }
    assert(e.getMessage.contains("unknown key") ||
      e.getMessage.contains("not alive"), e.getMessage)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Person/Pet fixture from FIXTURES.md §1 (reference
  * test_graph_delta.py:21-66): write path, multi-valued fields,
  * meta-relations, assign/terminate, per-slice temporal assertions.
  */
class GraphCoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def fixture: Graph = {
    val g0 = Graph.empty(spark)
    // tx 1: joe + fields + pet + named relation + meta-relation on it
    val (g1, r1) = Transactor.transact(g0, Seq(
      PutEntity("Person", "joe"),
      PutEntity("Pet", "spot"),
      PutField("joe", "FirstName", "Joe"),
      PutField("joe", "LastName", "Bloggs"),
      PutField("joe", "NickName", "Guy", instanceKey = "1"),
      PutField("joe", "NickName", "Joey", instanceKey = "2"),
      PutField("spot", "Name", "Spot"),
      PutRelation("HasPet", "joe", "spot", "joe-spot"),
      // meta-relation: the HasPet relation is itself the source
      PutField("joe-spot", "Date", java.sql.Timestamp.valueOf("2020-05-01 12:34:00"))))
    // tx 2: third nickname + LastName reassigned
    val (g2, _) = Transactor.transact(g1, Seq(
      PutField("e:Person/joe", "NickName", "J-man", instanceKey = "3"),
      AssignField("e:Person/joe", "LastName", "Smith")))
    // tx 3: terminate all nicknames (terminate the AEs; field relations
    // cascade)
    val joe = "e:Person/joe"
    val (g3, _) = Transactor.transact(g2, Seq(
      TerminateAtom(Transactor.aeId(joe, "NickName", "1")),
      TerminateAtom(Transactor.aeId(joe, "NickName", "2")),
      TerminateAtom(Transactor.aeId(joe, "NickName", "3"))))
    g3
  }

  test("write path: receipts and slice counting") {
    val g0 = Graph.empty(spark)
    val (g1, r) = Transactor.transact(g0, Seq(
      PutEntity("Person", "joe"), PutField("joe", "FirstName", "Joe")))
    assert(r.ids("joe") == "e:Person/joe")
    assert(r.slice == 1)
    assert(g1.maxSlice == 1)
    assert(g1.now.all("Person").count() == 1)
  }

  test("assign-after-assign in one tx: ONE durable row, cold load agrees " +
      "with the writer's cache") {
    val (g1, r) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "a"),
      PutField("a", "F", "x"),
      AssignField("a", "F", "y")))
    // last wish wins — and only ONE value row lands for the AE: a second
    // same-slice row would leave max_by with a tx_slice tie, so a cold
    // load or a replica could silently read "x" while the writer's seeded
    // cache read "y"
    val ae = Transactor.aeId("e:Person/a", "F", "")
    assert(g1.values.filter(col("ae_id") === ae).count() == 1)
    assert(r.newValues.count(_.ae_id == ae) == 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_aa").toString
    GraphStore.save(g1, dir)
    val cold = GraphStore.load(spark, dir)
    def read(g: Graph) = g.now.all("Person")
      .fieldValue("F", "v_str", "v").collect().map(_.getString(1)).toSeq
    assert(read(g1) == Seq("y") && read(cold) == Seq("y"))
  }

  test("meta-relation endpoints resolve tx-local relation keys; ambiguous " +
      "keys reject loudly") {
    val (g1, r) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "a"), PutEntity("Pet", "b"),
      PutRelation("Knows", "a", "b", "k1"),
      // the documented meta-relation case: a relation AS an endpoint,
      // referenced by its tx key (previously threw "unknown key 'k1'")
      PutRelation("Annotates", "k1", "a")))
    assert(r.ids("k1") == "r:Knows/k1")
    val ann = g1.atoms.filter(col("atype") === "Annotates")
      .select(col("src_id")).collect()
    assert(ann.length == 1 && ann(0).getString(0) == "r:Knows/k1")
    // one key naming both an entity and a relation: the alive-check and
    // the write phase would resolve different atoms — rejected
    val e = intercept[IllegalArgumentException] {
      Transactor.transact(Graph.empty(spark), Seq(
        PutEntity("P", "x"), PutEntity("P", "y"),
        PutRelation("R", "x", "y", "x")))
    }
    assert(e.getMessage.contains("both an entity and a relation"))
    // SAME-KIND ambiguity: creating two types under one key is legal
    // (type-scoped ids never collide), but a BARE-KEY reference to the
    // ambiguous key must reject — it silently resolved to the LAST wish
    val e2 = intercept[IllegalArgumentException] {
      Transactor.transact(Graph.empty(spark), Seq(
        PutEntity("Person", "joe"), PutEntity("Company", "joe"),
        PutField("joe", "Name", "J")))
    }
    assert(e2.getMessage.contains("DIFFERENT types"))
    val e3 = intercept[IllegalArgumentException] {
      Transactor.transact(Graph.empty(spark), Seq(
        PutEntity("P", "a"), PutEntity("P", "b"),
        PutRelation("Likes", "a", "b"), PutRelation("Knows", "a", "b"),
        TagAtom("a-b", "t"))) // bare reference to the colliding default key
    }
    assert(e3.getMessage.contains("DIFFERENT types"))
    // unreferenced collisions and full-id references stay legal
    val (gOk, rOk) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "joe"), PutEntity("Company", "joe"),
      PutField("e:Person/joe", "Name", "J")))
    assert(rOk.ids.values.toSet.contains("e:Company/joe"))
    assert(gOk.now.all("Person").fieldValue("Name", "v_str", "n")
      .collect()(0).getAs[String]("n") == "J")
    // idempotent duplicates of ONE atom stay legal
    val (_, rDup) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutEntity("P", "a")))
    assert(rDup.ids("a") == "e:P/a")
  }

  test("assign targets an EXISTING field AE or rejects loudly") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"),
      PutField("a", "Nick", "JJ", instanceKey = "primary")))
    // wrong instanceKey resolves to an AE that doesn't exist — the value
    // row would anchor to no atom and every field() read would silently
    // keep the old value
    val e = intercept[IllegalArgumentException] {
      Transactor.transact(g, Seq(AssignField("e:P/a", "Nick", "XX")))
    }
    assert(e.getMessage.contains("does not exist"))
    // the right instanceKey assigns; create-then-assign in ONE tx works
    val (g2, _) = Transactor.transact(g, Seq(
      AssignField("e:P/a", "Nick", "X2", instanceKey = "primary")))
    assert(g2.now.all("P").fieldValue("Nick", "v_str", "n")
      .collect()(0).getAs[String]("n") == "X2")
    val (g3, _) = Transactor.transact(g2, Seq(
      PutEntity("P", "b"), PutField("b", "Age", 1L),
      AssignField("b", "Age", 2L)))
    assert(g3.now.all("P").df.count() == 2)
    // FlatGraph mirrors the contract
    val fg = graft.core.FlatGraph(Vector.empty, Vector.empty)
      .insert(Seq(PutEntity("P", "a"), PutField("a", "Nick", "n1", "k")))
    intercept[IllegalArgumentException] {
      fg.insert(Seq(AssignField("e:P/a", "Nick", "n2")))
    }
  }

  test("select_by_field returns an entity ONCE when several instances match") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("User", "u1"),
      PutField("u1", "Score", 5.0, instanceKey = "a"),
      PutField("u1", "Score", 5.0, instanceKey = "b"),
      PutEntity("User", "u2"),
      PutField("u2", "Score", 5.0)))
    // u1 owns TWO matching instanced AEs — one output row, not a fan-out
    // into every downstream join
    val hit = g.now.selectByField("User", "Score", "v_double", 5.0)
    assert(hit.df.count() == 2)
    assert(hit.df.select("atom_id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("e:User/u1", "e:User/u2"))
  }

  test("atypeOfId (driver) and atypeFromId (column) are one contract") {
    import spark.implicits._
    val ids = Seq("ae:Score/e:U/1", "ae:Score#w1/e:U/1", "ae:tags[0]/1:$",
      "e:Person/joe", "r:Knows/k1", "rel:Score#w1/e:U/1")
    val fromCol = ids.toDF("id")
      .select(graft.fx.Sync.atypeFromId(col("id"))).collect().map(_.getString(0))
    val fromStr = ids.map(Transactor.atypeOfId)
    assert(fromCol.toSeq == fromStr)
    assert(fromStr == Seq("Score", "Score", "tags", "Person", "Knows", "Score"))
  }

  test("latestValues cache: LRU-bounded, evicted slices unpersist") {
    import org.apache.spark.storage.StorageLevel
    val g = fixture // 3 slices
    val lv1 = g.latestValues(1)
    val lv2 = g.latestValues(2)
    lv1.count(); lv2.count()
    assert(lv1.storageLevel != StorageLevel.NONE)
    assert(lv2.storageLevel != StorageLevel.NONE)
    // touching slice 1 makes slice 2 the LRU entry; the 3rd slice then
    // evicts (and unpersists) slice 2, not slice 1
    g.latestValues(1)
    val lv3 = g.latestValues(3)
    lv3.count()
    assert(lv2.storageLevel == StorageLevel.NONE, "LRU slice unpersisted")
    assert(lv1.storageLevel != StorageLevel.NONE, "recently-used slice kept")
    assert(lv3.storageLevel != StorageLevel.NONE)
    // evicted slices rebuild on demand with identical content
    assert(g.latestValues(2).count() == lv2.count())
  }

  test("multi-valued fields per slice: 2 at s1, 3 at s2, 0 at s3") {
    val g = fixture
    def nicknames(s: Int) =
      g.at(s).all("Person").outs("NickName").count()
    assert(nicknames(1) == 2)
    assert(nicknames(2) == 3)
    assert(nicknames(3) == 0)
    // hasOut flips to empty at slice 3 (zef has_out == false)
    assert(g.at(2).all("Person").hasOut("NickName").count() == 1)
    assert(g.at(3).all("Person").hasOut("NickName").count() == 0)
  }

  test("assign creates a new visible value per frame (LastName)") {
    val g = fixture
    def lastName(s: Int): String =
      g.at(s).all("Person").fieldValue("LastName", "v_str", "v")
        .collect()(0).getAs[String]("v")
    assert(lastName(1) == "Bloggs")
    assert(lastName(2) == "Smith")
    assert(lastName(3) == "Smith") // unchanged by tx3
  }

  test("traversal: out to pet, meta-relation on the relation atom") {
    val g = fixture
    val pets = g.now.all("Person").outs("HasPet")
    assert(pets.count() == 1)
    assert(pets.df.collect()(0).getAs[String]("atype") == "Pet")
    // the HasPet relation atom itself has a Date field (meta-relation)
    val rel = g.now.all("Person").outRels("HasPet")
    val dates = rel.fieldValue("Date", "v_ts", "date").collect()
    assert(dates.length == 1)
    assert(dates(0).getAs[java.sql.Timestamp]("date") ==
      java.sql.Timestamp.valueOf("2020-05-01 12:34:00"))
  }

  test("out() asserts cardinality 1; outs() does not") {
    val g = fixture
    // FirstName is unique: out OK
    assert(g.at(1).all("Person").out("FirstName").count() == 1)
    // NickName has 2 at slice 1: out must throw
    assertThrows[IllegalArgumentException] {
      g.at(1).all("Person").out("NickName").count()
    }
  }

  test("ins and sources mirror outs and targets") {
    val g = fixture
    val owner = g.now.all("Pet").ins("HasPet")
    assert(owner.count() == 1)
    assert(owner.df.collect()(0).getAs[String]("atom_id") == "e:Person/joe")
    val viaRel = g.now.all("Pet").inRels("HasPet").sources
    assert(viaRel.df.collect()(0).getAs[String]("atom_id") == "e:Person/joe")
  }

  test("zascii: drawn fixture parses to the same graph as explicit wishes") {
    // the Person/Pet fixture, AUTHORED AS A FIGURE (reference
    // zascii_to_flatgraph, implementation_typing_functions.py:7978)
    val fig =
      """             RT.FirstName                    RT.HasPet                RT.Name
        |  "Joe" ◄──────────────── ET.Person[joe] ─────────────► ET.Pet[spot] ──────► "Spot"
        |
        |                  RT.NickName
        |  ET.Person[joe] ──────────► "Guy"
        |
        |                  RT.NickName
        |  ET.Person[joe] ──────────► "Joey"
        |
        |                  RT.Age
        |  ET.Person[joe] ──────────► 42
        |""".stripMargin
    val wishes = Zascii.parse(fig)
    // one entity decl per unique key, despite three joe occurrences
    assert(wishes.count { case PutEntity(_, "joe") => true; case _ => false } == 1)
    val (g, _) = Transactor.transact(Graph.empty(spark), wishes)
    assert(g.now.all("Person").count() == 1)
    assert(g.now.all("Pet").count() == 1)
    // drawn relation traverses; drawn left-arrow lands the field on joe
    val pets = g.now.all("Person").outs("HasPet")
    assert(pets.count() == 1)
    assert(pets.df.collect()(0).getAs[String]("atype") == "Pet")
    assert(g.now.all("Person").fieldValue("FirstName", "v_str", "v")
      .collect()(0).getAs[String]("v") == "Joe")
    assert(g.now.all("Pet").fieldValue("Name", "v_str", "v")
      .collect()(0).getAs[String]("v") == "Spot")
    // repeated (joe, NickName) arrows became a multi-valued field
    assert(g.now.all("Person").outs("NickName").count() == 2)
    // numeric literal landed typed
    assert(g.now.all("Person").fieldValue("Age", "v_long", "v")
      .collect()(0).getAs[Long]("v") == 42L)
    // ASCII variant draws the same edge as box-drawing
    val ascii = Zascii.parse(
      """       RT.Likes
        |ET.A[a] --------> ET.B[b]
        |""".stripMargin)
    assert(ascii.contains(PutRelation("Likes", "a", "b", "a>b:Likes")))
    // HYPHENATED keys: EtPat's key class allows '-', but the tokenizer
    // treated it as shaft art and split "ET.User[bob-1]" into junk —
    // bracket-aware scanning keeps the key whole
    val hyph = Zascii.parse(
      """            RT.Likes
        |ET.A[bob-1] --------> ET.B[x-2]
        |""".stripMargin)
    assert(hyph.contains(PutRelation("Likes", "bob-1", "x-2", "bob-1>x-2:Likes")),
      hyph.toString)
    // malformed figures fail loudly, not silently
    assertThrows[IllegalArgumentException] {
      Zascii.parse("ET.A[a] ────► ET.B[b]") // no label
    }
    assertThrows[IllegalArgumentException] {
      Zascii.parse(
        """  RT.X
          |────► ET.B[b]
          |""".stripMargin) // no tail element
    }
    // zascii_to_flatgraph: figure -> local FlatGraph, no cluster
    val fgr = Zascii.toFlatGraph(
      """       RT.Likes          RT.Name
        |ET.A[a] --------> ET.B[b] ------> "Bee"
        |""".stripMargin)
    assert(fgr.atoms.count(_.kind == Kind.Entity) == 2)
    assert(fgr.atoms.count(_.kind == Kind.Relation) == 2) // Likes + Name field rel
    assert(fgr.values.exists(_.v_str.contains("Bee")))
    // NEGATIVE literal: the '-' sign is not arrow shaft (it used to be
    // swallowed, transacting 42 instead of -42 with no error)
    val neg = Zascii.toFlatGraph(
      """          RT.Delta
        |ET.A[a] ──────────► -42
        |""".stripMargin)
    assert(neg.values.exists(_.v_long.contains(-42L)),
      s"got ${neg.values}")
    // an arrow-looking sequence INSIDE a quoted literal is not an edge
    val quoted = Zascii.toFlatGraph(
      """          RT.Note
        |ET.A[a] ──────────► "x-->y"
        |""".stripMargin)
    assert(quoted.values.exists(_.v_str.contains("x-->y")))
    assert(quoted.atoms.count(_.kind == Kind.Relation) == 1)
  }

  test("events between slices") {
    val g = fixture
    val ev = g.events(2, 3).groupBy(col("event")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tx2: 1 AE + 1 rel instantiated (NickName#3) + 2 assigned
    // (NickName#3 value + LastName re-assign);
    // tx3: 3 AEs + 3 rels terminated
    assert(ev("instantiated") == 2)
    assert(ev("assigned") == 2)
    assert(ev("terminated") == 6)
  }

  test("time resolution: at(timestamp) resolves the right slice") {
    val g0 = Graph.empty(spark)
    val (g1, _) = Transactor.transact(g0,
      Seq(PutEntity("Person", "a")), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val (g2, _) = Transactor.transact(g1,
      Seq(PutEntity("Person", "b")), java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(g2.at(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")).slice == 1)
    assert(g2.at(java.sql.Timestamp.valueOf("2024-07-01 00:00:00")).slice == 2)
    assert(g2.at(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
      .all("Person").count() == 1)
  }

  test("blueprint summarizes observed schema with endpoint types") {
    val g = fixture
    val bp = g.blueprint.collect()
    val hasPet = bp.find(r => r.getAs[String]("atype") == "HasPet").get
    assert(hasPet.getAs[String]("src_type") == "Person")
    assert(hasPet.getAs[String]("dst_type") == "Pet")
  }

  test("terminate then re-instantiate opens a new validity interval") {
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "x"), PutField("x", "Name", "first-life")))
    val (g2, _) = Transactor.transact(g1, Seq(TerminateAtom("e:Person/x")))
    assert(g2.now.all("Person").count() == 0)
    val (g3, _) = Transactor.transact(g2, Seq(
      PutEntity("Person", "x"), PutField("x", "Name", "second-life")))
    // alive again in the new frame, dead in the old one
    assert(g3.now.all("Person").count() == 1)
    assert(g3.at(2).all("Person").count() == 0)
    assert(g3.at(1).all("Person").count() == 1)
    // each frame resolves its own interval's field value
    assert(g3.now.all("Person").fieldValue("Name", "v_str", "n")
      .collect()(0).getAs[String]("n") == "second-life")
    assert(g3.at(1).all("Person").fieldValue("Name", "v_str", "n")
      .collect()(0).getAs[String]("n") == "first-life")
  }

  test("selectByField: indexed lookup equals filter-after-resolve") {
    val g = GraphEncoder.encodeTpch(spark, "/root/testdata/sf0.001")
    val fast = g.now.selectByField("Customer", "c_mktsegment", "v_str", "BUILDING")
      .df.select("atom_id").collect().map(_.getString(0)).toSet
    val naive = g.now.all("Customer")
      .fieldValue("c_mktsegment", "v_str", "seg")
      .filter(col("seg") === "BUILDING")
      .select("atom_id").collect().map(_.getString(0)).toSet
    assert(fast == naive && fast.nonEmpty)
    // as-of correctness: a re-assigned field must not match its OLD value
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "Status", "active")))
    val (g2, _) = Transactor.transact(g1, Seq(
      AssignField("e:P/a", "Status", "retired")))
    assert(g2.now.selectByField("P", "Status", "v_str", "active").count() == 0)
    assert(g2.now.selectByField("P", "Status", "v_str", "retired").count() == 1)
    assert(g2.at(1).selectByField("P", "Status", "v_str", "active").count() == 1)
  }

  test("schemaRegistry infers cardinality and field-ness") {
    val g = fixture
    val reg = g.schemaRegistry.collect()
      .map(r => (r.getAs[String]("atype"), r.getAs[String]("src_type")) -> r).toMap
    // FirstName: one per Person, field (AE target), unique
    val fn = reg(("FirstName", "Person"))
    assert(fn.getAs[Boolean]("unique_out") && fn.getAs[Boolean]("is_field"))
    // NickName: 3 instances from 1 person → NOT unique
    val nn = reg(("NickName", "Person"))
    assert(!nn.getAs[Boolean]("unique_out"))
    // HasPet: entity-entity relation, not a field
    val hp = reg(("HasPet", "Person"))
    assert(!hp.getAs[Boolean]("is_field"))
    assert(hp.getAs[String]("dst_type") == "Pet")
  }

  test("same-tx tag churn: last wish wins durably; reads tie-break canonically") {
    // tag-then-untag in ONE tx used to append BOTH rows at the same
    // tx_slice — byTag's max_by tied and the binding was
    // partition-order-dependent on every cold read
    val (g0, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "a"), PutEntity("Person", "b")))
    val (g1, r1) = Transactor.transact(g0, Seq(
      TagAtom("e:Person/a", "boss"), UntagAtom("boss")))
    assert(r1.newTags.size == 1 && r1.newTags.head.atom_id.isEmpty,
      "tag wishes not deduped last-wish-wins")
    assert(g1.now.byTag("boss").count() == 0)
    // untag-then-retag: the re-tag wins
    val (g2, r2) = Transactor.transact(g1, Seq(
      UntagAtom("boss"), TagAtom("e:Person/b", "boss")))
    assert(r2.newTags.size == 1)
    assert(g2.now.byTag("boss").df.select("atom_id").collect()
      .map(_.getString(0)).toSeq == Seq("e:Person/b"))
    // legacy same-slice duplicates (merged/hand-built graphs): the read
    // is deterministic — tombstone outranks a binding
    import spark.implicits._
    val dupTags = Seq(("boss", Some("e:Person/a"), 9), ("boss", None, 9))
      .toDF("tag", "atom_id", "tx_slice")
    val gDup = g2.copy(tags = g2.tags.unionByName(dupTags).repartition(7))
    assert(gDup.at(9).byTag("boss").count() == 0,
      "same-slice tag tie did not resolve to the tombstone")
  }

  test("merge picks a deterministic survivor for payload-divergent atom rows") {
    import spark.implicits._
    val (base, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "x"), PutEntity("Person", "y"), PutEntity("Person", "z")))
    // two graphs claim the SAME open interval with DIFFERENT payloads
    // (fabricated divergent histories): the survivor must be the same on
    // every run and both merge orders — the bare closure-rank min_by tied
    def withRel(dst: String) = base.copy(atoms = base.atoms.unionByName(
      Seq(("r:Knows/k", Kind.Relation, "Knows", "e:Person/x", dst, 1,
        None: Option[Int], None: Option[String]))
        .toDF("atom_id", "kind", "atype", "src_id", "dst_id", "inst_slice",
          "term_slice", "origin_uid"))
        .repartition(5))
    val ab = Graph.merge(withRel("e:Person/y"), withRel("e:Person/z"))
    val ba = Graph.merge(withRel("e:Person/z"), withRel("e:Person/y"))
    def rel(g: Graph) = g.atoms.filter(col("atom_id") === "r:Knows/k")
      .select("dst_id").collect().map(_.getString(0)).toSeq
    assert(rel(ab) == rel(ba) && rel(ab).size == 1)
    assert(rel(ab) == Seq("e:Person/y")) // min full-row payload, pinned
  }

  test("unique_out spans target types: one source, one rt, two dst types is NOT unique") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "p1"), PutEntity("Person", "p2"),
      PutEntity("Company", "c1"),
      PutRelation("Knows", "p1", "p2", "k1"),
      PutRelation("Knows", "p1", "c1", "k2")))
    val reg = g.schemaRegistry.filter(col("atype") === "Knows").collect()
      .map(r => r.getAs[String]("dst_type") -> r.getAs[Boolean]("unique_out")).toMap
    // each per-target group reads one-edge-per-source, but Out[Knows]
    // from Person has degree 2 — the flag must say so on BOTH rows
    assert(reg == Map("Person" -> false, "Company" -> false), s"got $reg")
  }

  test("schemaRegistry keeps relation groups with a dangling source endpoint") {
    import spark.implicits._
    val (base, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "p1"), PutEntity("Person", "p2"),
      PutRelation("Knows", "p1", "p2", "k1")))
    // hand-built row whose src endpoint is absent from atoms: src_type is
    // null after the endpoint left-join; the per-src unique_out join must
    // be null-safe or the whole group vanishes from the report
    val g = base.copy(atoms = base.atoms.unionByName(
      Seq(("r:Likes/l1", Kind.Relation, "Likes", "e:Person/ghost",
        "e:Person/p2", 1, None: Option[Int], None: Option[String]))
        .toDF("atom_id", "kind", "atype", "src_id", "dst_id", "inst_slice",
          "term_slice", "origin_uid")))
    val rows = g.schemaRegistry.filter(col("atype") === "Likes").collect()
    assert(rows.length == 1, "dangling-src relation group dropped from the registry")
    assert(rows.head.getAs[String]("src_type") == null)
    assert(rows.head.getAs[Boolean]("unique_out"))
  }

  test("merge unions graphs idempotently on atom_id") {
    val g = fixture
    val merged = Graph.merge(g, g)
    assert(merged.atoms.count() == g.atoms.count())
    assert(merged.txs.count() == g.txs.count())
    // values/tags dedup symmetrically: no double-counted assignment events
    assert(merged.values.count() == g.values.count())
    assert(merged.events(0, g.maxSlice).count() ==
      g.events(0, g.maxSlice).count())
  }

  test("merge preserves re-instantiation history (interval-row granular)") {
    // x lives, dies, lives again → two interval rows under one atom_id
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "x")))
    val (g2, _) = Transactor.transact(g1, Seq(TerminateAtom("e:Person/x")))
    val (g3, _) = Transactor.transact(g2, Seq(PutEntity("Person", "x")))
    val merged = Graph.merge(g3, g3)
    assert(merged.atoms.filter(col("atom_id") === "e:Person/x").count() == 2)
    // temporal history intact across the merge
    assert(merged.at(1).all("Person").count() == 1)
    assert(merged.at(2).all("Person").count() == 0)
    assert(merged.now.all("Person").count() == 1)
    // closure knowledge wins: merging an open-interval copy (g1) with the
    // later-terminated copy (g2) keeps the terminated row
    val m2 = Graph.merge(g1, g2)
    assert(m2.at(2).all("Person").count() == 0)
  }

  test("mergeByOrigin folds same-origin atoms under different local ids") {
    // two graphs encode the same person under different local keys but a
    // shared origin_uid; b also hangs a pet + relation off its local id
    val (a, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "joe-a"), PutField("joe-a", "Name", "Joe")))
    val (b0, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "joe-b"), PutEntity("Pet", "rex"),
      PutRelation("HasPet", "joe-b", "rex"),
      PutField("joe-b", "Age", 33L)))
    val shared = "origin-joe"
    def withOrigin(g: Graph, localId: String): Graph = g.copy(atoms =
      g.atoms.withColumn("origin_uid",
        when(col("atom_id") === localId, lit(shared))
          .otherwise(col("origin_uid"))))
    val aO = withOrigin(a, "e:Person/joe-a")
    val bO = withOrigin(b0, "e:Person/joe-b")
    val m = Graph.mergeByOrigin(aO, bO)
    // one surviving identity: a's local id; b's id is gone
    assert(m.atoms.filter(col("atom_id") === "e:Person/joe-a").count() == 1)
    assert(m.atoms.filter(col("atom_id") === "e:Person/joe-b").count() == 0)
    // b's relation re-pointed at the surviving id
    val hasPet = m.atoms.filter(col("atype") === "HasPet").collect()
    assert(hasPet.length == 1)
    assert(hasPet(0).getAs[String]("src_id") == "e:Person/joe-a")
    // b's field (Age) now resolves from the surviving id
    val joe = m.now.all("Person")
    assert(joe.count() == 1)
    assert(joe.fieldValue("Age", "v_long", "age")
      .collect()(0).getAs[Long]("age") == 33L)
    assert(joe.fieldValue("Name", "v_str", "n")
      .collect()(0).getAs[String]("n") == "Joe")
  }

  test("replaying a tx with a PutField on a relation key is idempotent") {
    // regression: candidateIds used to resolve the PutField owner with a
    // weaker map than the write phase, so a replay appended a duplicate
    // open interval for the same ae/rel atom_id
    val wishes = Seq(
      PutEntity("Person", "joe"), PutEntity("Pet", "spot"),
      PutRelation("HasPet", "joe", "spot", "joe-spot"),
      PutField("joe-spot", "Date",
        java.sql.Timestamp.valueOf("2020-05-01 12:34:00")))
    val (g1, _) = Transactor.transact(Graph.empty(spark), wishes)
    val (g2, _) = Transactor.transact(g1, wishes) // replay
    val dates = g2.atoms.filter(col("atype") === "Date")
    // exactly one AE + one field relation, not duplicated open intervals
    assert(dates.filter(col("kind") === Kind.AttributeEntity).count() == 1)
    assert(dates.filter(col("kind") === Kind.Relation).count() == 1)
    // traversal sees ONE value row per frame, not duplicates
    val rel = g2.now.allRelations("HasPet")
    assert(rel.fieldValue("Date", "v_ts", "d").count() == 1)
  }

  test("GraphVerify: healthy graphs pass, each corruption class is flagged") {
    import spark.implicits._
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "a"), PutField("a", "Name", "Ann"),
      PutEntity("Person", "b"), PutRelation("Knows", "a", "b")))
    val (g2, _) = Transactor.transact(g, Seq(TerminateAtom("e:Person/b")))
    assert(GraphVerify.isHealthy(g2))

    // dangling endpoint: relation to a nonexistent atom
    val dangling = g2.copy(atoms = g2.atoms.unionByName(Seq(
      ("r:Bad/x", "relation", "Bad", "e:Person/a", "e:Person/GONE", 1,
        None: Option[Int], "r:Bad/x"))
      .toDF(g2.atoms.columns: _*)))
    val checks1 = GraphVerify.verify(dangling)
      .select("check").distinct().collect().map(_.getString(0)).toSet
    assert(checks1.contains("dangling_dst"))

    // inverted interval + duplicate open rows
    val corrupt = g2.copy(atoms = g2.atoms.unionByName(Seq(
      ("e:Person/a", "entity", "Person", None: Option[String],
        None: Option[String], 2, Some(1), "e:Person/a"),
      ("e:Person/a", "entity", "Person", None: Option[String],
        None: Option[String], 2, None: Option[Int], "e:Person/a"))
      .toDF(g2.atoms.columns: _*)))
    val checks2 = GraphVerify.verify(corrupt)
      .select("check").distinct().collect().map(_.getString(0)).toSet
    assert(checks2.contains("inverted_interval"))
    assert(checks2.contains("duplicate_open_interval"))

    // orphan value row
    val orphan = g2.copy(values = g2.values.unionByName(
      spark.createDataset(Seq(ValueRow("ae:GONE", 1, "str",
        Some("x"), None, None, None, None))).toDF()))
    assert(GraphVerify.verify(orphan).select("check").distinct()
      .collect().map(_.getString(0)).toSet.contains("orphan_value"))

    // relation opening while an endpoint is dead
    val deadEnd = g2.copy(atoms = g2.atoms.unionByName(Seq(
      ("r:Knows/late", "relation", "Knows", "e:Person/a", "e:Person/b", 2,
        None: Option[Int], "r:Knows/late"))
      .toDF(g2.atoms.columns: _*)))
    assert(GraphVerify.verify(deadEnd).select("check").distinct()
      .collect().map(_.getString(0)).toSet.contains("relation_endpoint_dead"))
  }

  test("danglingEndpointRelations: audits the one-level cascade residual") {
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "a"), PutEntity("Person", "b"),
      PutEntity("Topic", "c"),
      PutRelation("Likes", "a", "b", "ab"),
      // meta-relation one level out: its src IS the Likes relation
      PutRelation("About", "ab", "c", "abc")))
    assert(GraphVerify.danglingEndpointRelations(g1).isEmpty)
    // terminating `a` cascades ONE level (closes Likes) — the
    // meta-relation survives with a terminated endpoint, per the
    // reference's own single-pass cull
    val (g2, _) = Transactor.transact(g1, Seq(TerminateAtom("e:Person/a")))
    // accepted contract: the graph is still HEALTHY...
    assert(GraphVerify.isHealthy(g2))
    // ...but the residual is now AUDITABLE instead of invisible
    val aboutId = Transactor.atomId(Kind.Relation, "About", "abc")
    val hits = GraphVerify.danglingEndpointRelations(g2).collect()
    assert(hits.map(_.getString(0)).toSeq == Seq(aboutId), hits.mkString(", "))
    assert(hits(0).getInt(1) == 2) // open relation, dead endpoint NOW
    // the report is HISTORICAL: terminating About later (slice 3) leaves
    // frame 2 — where About was alive over a dead endpoint — in history,
    // so the lint still reports it (time travel to slice 2 shows it)
    val (g3, _) = Transactor.transact(g2, Seq(TerminateAtom(aboutId)))
    assert(GraphVerify.danglingEndpointRelations(g3).count() == 1)
    // whereas closing the meta-relation IN the cascading tx leaves no
    // frame with a dangling window — the lint stays empty
    val (clean, _) = Transactor.transact(g1, Seq(
      TerminateAtom("e:Person/a"), TerminateAtom(aboutId)))
    assert(GraphVerify.danglingEndpointRelations(clean).isEmpty)
  }

  test("transact seeds the next frame's latestValues from the prior cache") {
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "X", 1.0),
      PutEntity("P", "b"), PutField("b", "X", 2.0)))
    // seeding is unconditional (the merged table is a LAZY map-only plan on
    // the prior frame's table — nothing materializes until first read)
    val (g2, _) = Transactor.transact(g1, Seq(
      AssignField("e:P/a", "X", 5.0)))
    assert(g2.hasCachedLatestValues(g2.maxSlice))
    val d1 = g1.latestValuesDepth(g1.maxSlice)
    assert(g2.latestValuesDepth(g2.maxSlice) == d1 + 1)
    // and the seeded table answers correctly: delta wins, untouched stays
    val vals = g2.now.all("P").fieldValue("X", "v_double", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(vals == Map("e:P/a" -> 5.0, "e:P/b" -> 2.0))
    // assign-after-assign in one tx: the LAST wish per AE wins in the seed
    val (g3, _) = Transactor.transact(g2, Seq(
      AssignField("e:P/b", "X", 7.0), AssignField("e:P/b", "X", 9.0)))
    assert(g3.latestValuesDepth(g3.maxSlice) == d1 + 2)
    val v3 = g3.now.all("P").fieldValue("X", "v_double", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(v3 == Map("e:P/a" -> 5.0, "e:P/b" -> 9.0))
    // depth cap: a long transact chain must at some point STOP seeding
    // (bounding lineage; the following frame re-seeds off the fresh base)
    var g = g3
    var sawFallback = false
    var i = 0
    while (i <= Graph.MaxSeedDepth) {
      g = Transactor.transact(g, Seq(AssignField("e:P/a", "X", i.toDouble)))._1
      if (!g.hasCachedLatestValues(g.maxSlice)) sawFallback = true
      i += 1
    }
    assert(sawFallback,
      "a chain longer than MaxSeedDepth must hit the fresh-aggregation fallback")
    val deep = g.now.all("P").fieldValue("X", "v_double", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(deep == Map("e:P/a" -> Graph.MaxSeedDepth.toDouble, "e:P/b" -> 9.0))
  }

  test("delete-only tx borrows the prior cache; releasing the child keeps the parent persisted") {
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "X", 1.0),
      PutEntity("P", "b"), PutField("b", "X", 2.0)))
    val base = g1.latestValues(g1.maxSlice)
    base.count() // materialize the parent's live cache
    assert(base.storageLevel.useMemory)
    // delete-only tx (no new value rows): the child frame serves the
    // parent's table BY REFERENCE instead of stacking a merge layer
    val (g2, _) = Transactor.transact(g1, Seq(TerminateAtom("e:P/b")))
    assert(g2.latestValues(g2.maxSlice) eq base)
    // the hooked-mutation shape (GqlApi.commitWithHooks): the tentative
    // frame is discarded and released — the borrowed seed must survive,
    // or every later read on the live graph recomputes cold
    g2.releaseDerived()
    assert(base.storageLevel.useMemory,
      "releasing a discarded child frame unpersisted the parent's live cache")
    val vals = g1.now.all("P").fieldValue("X", "v_double", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(vals == Map("e:P/a" -> 1.0, "e:P/b" -> 2.0))
  }

  test("Dot: bounded subgraph DOT + blueprint DOT (graphviz op surface)") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "joe"), PutEntity("Pet", "spot"),
      PutRelation("HasPet", "joe", "spot"),
      PutField("joe", "Name", "Jo\"e"))) // quote must escape
    val dot = Dot.toDot(g.now.all("Person").gather(Seq("HasPet"), 1))
    assert(dot.startsWith("digraph g {") && dot.endsWith("}"))
    assert(dot.contains(""""e:Person/joe" [label="Person\ne:Person/joe"];"""))
    assert(dot.contains(""""e:Person/joe" -> "e:Pet/spot" [label="HasPet"];"""))
    // deterministic: two renders are byte-identical
    assert(dot == Dot.toDot(g.now.all("Person").gather(Seq("HasPet"), 1)))
    // the bound fails loudly, never truncates silently
    assertThrows[IllegalArgumentException] {
      Dot.toDot(g.now.all("Person"), maxAtoms = 0)
    }
    val bp = Dot.blueprintDot(g)
    assert(bp.contains(""""Person" [label="Person (1)"];"""))
    assert(bp.contains(""""Person" -> "Pet" [label="HasPet (1)"];"""))
    // the escaped quote in the field VALUE never leaks into type-level dot;
    // the field relation type does appear as an edge to the AE type node
    assert(bp.contains("""label="Name (1)""""))
  }

  test("assignFieldBulk: new field, reassign, before/after frames") {
    import spark.implicits._
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Doc", "a"), PutField("a", "Text", "aaaa"),
      PutEntity("Doc", "b"), PutField("b", "Text", "bb")))
    // bulk-assign a NEW field: AE + field relation discovered missing by
    // the anti-join and opened at slice 2
    val scores = Seq(("e:Doc/a", 4.0), ("e:Doc/b", 2.0))
      .toDF("owner_id", "value")
    val g2 = Transactor.assignFieldBulk(g1, scores, "Score", "double")
    assert(g2.maxSlice == g1.maxSlice + 1)
    val after = g2.now.all("Doc").fieldValue("Score", "v_double", "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after == Map("e:Doc/a" -> 4.0, "e:Doc/b" -> 2.0))
    // prior frame unaffected (as-of isolation of the bulk write)
    assert(g2.at(g1.maxSlice).all("Doc").fieldValue("Score", "v_double", "s")
      .count() == 0)
    // seeded-cache parity: the incrementally-seeded table answers exactly
    // like a fresh aggregation on an unseeded twin
    assert(g2.hasCachedLatestValues(g2.maxSlice))
    val twin = Graph(g2.atoms, g2.values, g2.txs, g2.tags)
    val fresh = twin.now.all("Doc").fieldValue("Score", "v_double", "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fresh == after)

    // bulk REASSIGN of an existing field: no new atoms, values move
    val atomsBefore = g2.atoms.count()
    val g3 = Transactor.assignFieldBulk(g2,
      Seq(("e:Doc/a", 40.0), ("e:Doc/b", 20.0)).toDF("owner_id", "value"),
      "Score", "double")
    assert(g3.atoms.count() == atomsBefore)
    val v3 = g3.now.all("Doc").fieldValue("Score", "v_double", "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(v3 == Map("e:Doc/a" -> 40.0, "e:Doc/b" -> 20.0))

    // duplicate owners are rejected, not silently coin-flipped
    assertThrows[IllegalArgumentException] {
      Transactor.assignFieldBulk(g3,
        Seq(("e:Doc/a", 1.0), ("e:Doc/a", 2.0)).toDF("owner_id", "value"),
        "Score", "double")
    }

    // null owners are rejected LOUDLY by name (pass 31): previously the
    // untrusted path tripped the duplicate-count check only by accident
    // (count_distinct ignores nulls) with a misleading message, and a
    // null ae_id would anchor the value row to nothing
    val eNull = intercept[IllegalArgumentException] {
      Transactor.assignFieldBulk(g3,
        Seq((null.asInstanceOf[String], 1.0), ("e:Doc/b", 2.0))
          .toDF("owner_id", "value"),
        "Score", "double")
    }
    assert(eNull.getMessage.contains("null owner_id"))

    // the TRUSTED path (uniqueness by construction, no count job) must
    // still reject nulls — the guard rides the id expressions, so it
    // fires inside the delta job instead of silently minting null-id rows
    val eTrusted = intercept[Exception] {
      Transactor.assignFieldsBulkDelta(g3,
        Seq((null.asInstanceOf[String], 1.0)).toDF("owner_id", "Score"),
        Seq(Transactor.BulkField("Score", "double")),
        materializeDelta = true, trustedUniqueOwners = true)
    }
    val messages = Iterator.iterate(eTrusted: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("null owner_id")),
      s"expected the null-owner guard in the failure chain, got: $messages")
  }

  test("assignFieldBulk: re-instantiated owner gets its field relation re-opened") {
    import spark.implicits._
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Doc", "a"), PutField("a", "Score", 1.0)))
    // terminate the owner: cascade closes the field RELATION but the AE
    // atom itself stays alive (it is not a relation of the dead owner)
    val (g2, _) = Transactor.transact(g1, Seq(TerminateAtom("e:Doc/a")))
    // re-instantiate the owner only
    val (g3, _) = Transactor.transact(g2, Seq(PutEntity("Doc", "a")))
    assert(g3.now.all("Doc").count() == 1)
    // bulk assign must re-open the field relation (AE alive, rel dead) or
    // the value lands unreachable
    val g4 = Transactor.assignFieldBulk(g3,
      Seq(("e:Doc/a", 9.0)).toDF("owner_id", "value"), "Score", "double")
    val read = g4.now.all("Doc").fieldValue("Score", "v_double", "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(read == Map("e:Doc/a" -> 9.0),
      "value must be reachable via field() after owner re-instantiation")
    // and exactly ONE alive relation interval for the field (no duplicate)
    val aliveRels = g4.atoms.filter(
      col("atom_id") === "rel:Score/e:Doc/a" && col("term_slice").isNull)
    assert(aliveRels.count() == 1)
    // the still-alive AE was NOT duplicated
    val aliveAes = g4.atoms.filter(
      col("atom_id") === "ae:Score/e:Doc/a" && col("term_slice").isNull)
    assert(aliveAes.count() == 1)
  }

  test("yo: per-atom report rows across every section") {
    val g = fixture
    val joe = "e:Person/joe"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(1), r.getString(2),
        Option(r.getString(3)).orNull, r.getLong(4), r.isNullAt(5))).toSet

    // entity at now (slice 3): nicknames are terminated, so no field rows
    // for them; LastName shows the REASSIGNED value with n=2 assignments
    val yoNow = rows(AtomSet(g.now,
      g.now.aliveAtoms.filter(col("atom_id") === joe)).yo)
    assert(yoNow.contains(("identity", "entity", "Person", 1L, true)))
    assert(yoNow.contains(("field", "FirstName", "Joe", 1L, false)))
    assert(yoNow.contains(("field", "LastName", "Smith", 2L, false)))
    assert(yoNow.contains(("relation_out", "HasPet", "Pet", 1L, true)))
    assert(!yoNow.exists(_._2 == "NickName"))
    assert(yoNow.exists(t => t._1 == "history" && t._2 == "instantiated"))
    assert(!yoNow.exists(t => t._1 == "relation_in"))

    // same entity one frame back: all three nickname AEs report, each as
    // its own field row (multi-valued fields stay per-instance)
    val yoS2 = rows(AtomSet(g.at(2),
      g.at(2).aliveAtoms.filter(col("atom_id") === joe)).yo)
    assert(yoS2.count(_._2 == "NickName") == 3)
    assert(yoS2.map(t => (t._2, t._3)).contains(("NickName", "J-man")))

    // relation atom: endpoint rows + its own meta-field, rendered at
    // second precision; the pet sees the relation incoming
    val rel = g.now.aliveAtoms.filter(col("kind") === Kind.Relation &&
      col("atype") === "HasPet")
    val yoRel = rows(AtomSet(g.now, rel).yo)
    assert(yoRel.contains(("identity", "relation", "HasPet", 1L, true)))
    assert(yoRel.contains(("endpoint", "source", joe, 1L, true)))
    assert(yoRel.contains(("endpoint", "target", "e:Pet/spot", 1L, true)))
    assert(yoRel.contains(("field", "Date", "2020-05-01 12:34:00", 1L, false)))
    val yoPet = rows(AtomSet(g.now,
      g.now.aliveAtoms.filter(col("atom_id") === "e:Pet/spot")).yo)
    assert(yoPet.contains(("relation_in", "HasPet", "Person", 1L, true)))

    // terminated AE through an aware-of set: the terminated history row
    // appears (alive atoms never carry one)
    val nick1 = Transactor.aeId(joe, "NickName", "1")
    val yoDead = rows(AtomSet(g.now,
      g.atoms.filter(col("atom_id") === nick1)).yo)
    assert(yoDead.contains(("identity", "attribute_entity", "NickName", 1L, true)))
    assert(yoDead.exists(t => t._1 == "history" && t._2 == "terminated" && !t._5))
  }

  test("yo counts are interval-invariant: a re-opened counterpart does not double") {
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "p1"), PutEntity("Person", "p2"),
      PutRelation("Knows", "p1", "p2")))
    val (g2, _) = Transactor.transact(g1, Seq(TerminateAtom("e:Person/p2")))
    val (g3, _) = Transactor.transact(g2, Seq(
      PutEntity("Person", "p2"),
      PutRelation("Knows2", "e:Person/p1", "p2")))
    // p2 now has TWO validity-interval rows; the alive Knows2 relation's
    // counterpart lookup must still count it once
    val rows = g3.now.all("Person").yo
      .filter(col("atom_id") === "e:Person/p1" && col("section") === "relation_out")
      .collect().map(r => (r.getString(2), r.getLong(4)))
    assert(rows.toSeq == Seq(("Knows2", 1L)), rows.toSeq.toString)
  }

  test("single-assignment fast path: latestValues == aggregated path, before and after transact") {
    val g = GraphEncoder.encodeTpch(spark, "/root/testdata/sf0.001")
    assert(g.uniqueValuesThrough == 1)
    val fast = g.latestValues(1)
    val agg = g.copy(uniqueValuesThrough = -1).latestValues(1)
    assert(fast.columns.toSeq == agg.columns.toSeq)
    assert(fast.exceptAll(agg).isEmpty && agg.exceptAll(fast).isEmpty)
    // the fast path must be free of Aggregate/Exchange — that's the point
    val plan = fast.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"), s"fast path still aggregates:\n$plan")

    // a re-assignment transact: the guarantee survives (delta lands at a
    // LATER slice), the seeded now-frame sees the new value, and the
    // historical frame — served by the fast path — still sees the old one
    val ae = "ae:c_acctbal/e:Customer/1"
    val before = g.latestValues(1).filter(col("ae_id") === ae)
      .collect()(0).getAs[Double]("v_double")
    val (g2, _) = Transactor.transact(g,
      Seq(AssignField("e:Customer/1", "c_acctbal", before + 1000.0)))
    assert(g2.uniqueValuesThrough == 1)
    assert(g2.latestValues(2).filter(col("ae_id") === ae)
      .collect()(0).getAs[Double]("v_double") == before + 1000.0)
    assert(g2.latestValues(1).filter(col("ae_id") === ae)
      .collect()(0).getAs[Double]("v_double") == before)
    // and a frame that is neither cached nor seeded on g2 (forces a fresh
    // build at the re-assigned slice through the NON-fast path, since
    // 2 > uniqueValuesThrough) agrees with the seeded answer
    assert(g2.copy(uniqueValuesThrough = 1).latestValues(2)
      .filter(col("ae_id") === ae)
      .collect()(0).getAs[Double]("v_double") == before + 1000.0)
  }

  test("diagnostics tolerate dangling endpoints: verify disjoint, dot renders") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val atoms = Seq(
      AtomRow("e:P/a", Kind.Entity, "P", None, None, 1, None, "e:P/a"),
      AtomRow("e:P/b", Kind.Entity, "P", None, None, 1, None, "e:P/b"),
      AtomRow("r:X/ok", Kind.Relation, "X", Some("e:P/a"), Some("e:P/b"),
        1, None, "r:X/ok"),
      // unresolvable dst: the dangling_dst corruption class
      AtomRow("r:X/bad", Kind.Relation, "X", Some("e:P/a"), Some("e:P/GONE"),
        1, None, "r:X/bad")).toDF()
    val g = Graph(atoms, Seq.empty[ValueRow].toDF(), Seq(TxRow(1, ts)).toDF())
    val v = GraphVerify.verify(g).collect()
    // reported ONCE (dangling_dst), not again as relation_endpoint_dead
    assert(v.count(r => r.getString(0) == "dangling_dst" &&
      r.getString(1) == "r:X/bad") == 1)
    assert(!v.exists(r => r.getString(0) == "relation_endpoint_dead"),
      s"double-reported: ${v.mkString(",")}")
    // blueprintDot renders the missing side as '?' instead of NPEing —
    // corrupt graphs are exactly what one wants to visualize
    val bp = Dot.blueprintDot(g)
    assert(bp.contains("\"P\" -> \"?\""), bp)
    assert(bp.contains("\"P\" -> \"P\""))
  }

  test("releaseAll spares tables a shared graph serves via borrowed seeds") {
    val (g0, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "Name", "Ann")))
    // touch latest values so g0's cache holds an owned persisted table
    g0.now.all("P").fieldValue("Name", "v_str", "n").collect()
    // a no-new-values tx hands g0's table to g1 BY REFERENCE (borrowed)
    val (g1, _) = Transactor.transact(g0, Seq(TerminateAtom("e:P/a")))
    TransientCaches.markShared(g1)
    val served = g1.cachedTables
    assert(served.nonEmpty)
    TransientCaches.releaseAll()
    // the owning (non-shared) parent's release must not have unpersisted
    // the table the shared graph still serves
    served.foreach(t => assert(
      t.storageLevel.useMemory || t.storageLevel.useDisk,
      "shared graph's borrowed cache table was unpersisted by releaseAll"))
  }

  test("releaseAll does not deadlock against a shared graph's concurrent latestValues") {
    // ABBA regression: releaseAll used to hold the TransientCaches monitor
    // while calling sharedGraph.cachedTables (takes the graph monitor),
    // while latestValues holds the graph monitor and calls trackGraph
    // (takes the TransientCaches monitor). A shared server graph answering
    // a query during a harness releaseAll deadlocked both threads.
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "Name", "Ann")))
    TransientCaches.markShared(g)
    val slice = g.maxSlice
    val boom = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val qThread = new Thread(() => try {
      (1 to 200).foreach { _ =>
        g.releaseDerived() // force the next call onto the miss path
        g.latestValues(slice) // graph monitor -> trackGraph (TC monitor)
      }
    } catch { case t: Throwable => boom.set(t) })
    val rThread = new Thread(() => try {
      (1 to 200).foreach(_ => TransientCaches.releaseAll())
    } catch { case t: Throwable => boom.set(t) })
    qThread.start(); rThread.start()
    qThread.join(120000); rThread.join(120000)
    val stuck = qThread.isAlive || rThread.isAlive
    if (stuck) { qThread.interrupt(); rThread.interrupt() }
    assert(!stuck, "releaseAll vs latestValues deadlocked (ABBA)")
    assert(boom.get() == null, s"concurrent path threw: ${boom.get()}")
    g.latestValues(slice) // leave a valid cache entry behind
  }

  test("bulk encode: null field = no field, null FK = no relation, null key = loud") {
    import spark.implicits._
    import graft.core.GraphEncoder
    // null field value: the OLTP write path rejects null values ("omit the
    // field instead") — the bulk encoder must agree: no AE, no field
    // relation, no value row (it used to land a vtype'd all-null value row
    // plus a born-empty AE no transact could produce)
    val src = Seq((1L, Some("a"), Some(2.5)), (2L, None, Some(1.0)),
      (3L, Some("c"), None)).toDF("k", "name", "score")
    val (atoms, values) = GraphEncoder.encodeEntities(
      src, "T", "k", Seq("name", "score"))
    assert(atoms.filter(col("kind") === graft.core.Kind.Entity).count() == 3)
    assert(atoms.filter(col("atom_id") === "ae:name/e:T/2").count() == 0)
    assert(atoms.filter(col("atom_id") === "rel:name/e:T/2").count() == 0)
    assert(atoms.filter(col("atom_id") === "ae:score/e:T/3").count() == 0)
    assert(values.filter(col("ae_id") === "ae:name/e:T/2").count() == 0)
    assert(values.filter(col("ae_id") === "ae:score/e:T/3").count() == 0)
    assert(values.count() == 4) // 2 names + 2 scores actually present
    // null FK on either side: no relation row (optional-FK semantics) —
    // it used to encode a relation atom with a null endpoint, the exact
    // missing-endpoint shape schemaRegistry defends against downstream
    val fks = Seq((Some(1L), Some(10L)), (None, Some(11L)),
      (Some(3L), None)).toDF("a", "b")
    val rels = GraphEncoder.encodeRelations(fks, "Link", "A", "a", "B", "b")
    assert(rels.count() == 1)
    assert(rels.filter(col("src_id").isNull || col("dst_id").isNull).count() == 0)
    // null business key: loud abort riding the encode job itself, never a
    // null atom_id whose value rows anchor to nothing
    val badKeys = Seq((Some(1L), "x"), (None, "y")).toDF("k", "name")
    val (badAtoms, _) = GraphEncoder.encodeEntities(
      badKeys, "T", "k", Seq("name"))
    val e = intercept[Exception] { badAtoms.count() }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("null business key"), rootMsg(e))
  }
}

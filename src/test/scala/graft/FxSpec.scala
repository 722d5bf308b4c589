package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fx._

class FxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("FX: effects are data; interpreter executes them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fx").toString
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    // description only — nothing happened yet
    val write = FX.LocalFileWrite(df, s"$dir/t", "parquet")
    assert(!new java.io.File(s"$dir/t").exists())
    FxRuntime.run(spark, write)
    val back = FxRuntime.run(spark, FX.LocalFileRead(s"$dir/t"))
      .asInstanceOf[org.apache.spark.sql.DataFrame]
    assert(back.count() == 2)
    // GraphTransact effect
    val (g, r) = FxRuntime.run(spark,
      FX.GraphTransact(Graph.empty(spark), Seq(PutEntity("X", "x1"))))
      .asInstanceOf[(Graph, Receipt)]
    assert(g.now.all("X").count() == 1 && r.ids("x1") == "e:X/x1")
  }

  test("FnRegistry: persist on graph, as-of lookup, hash-addressed invoke") {
    import spark.implicits._
    val src = "df => df.filter(col(\"x\") > 1)"
    val (g, h) = FnRegistry.register(Graph.empty(spark), "only_big", src,
      df => df.filter(col("x") > 1))
    val fn = FnRegistry.lookup(g.now, "only_big").get
    assert(fn.hash == h && fn.source == src)
    val out = FnRegistry.invoke(g.now, "only_big", Seq(1, 2, 3).toDF("x"))
    assert(out.count() == 2)
    assertThrows[NoSuchElementException] {
      FnRegistry.invoke(g.now, "nope", Seq(1).toDF("x"))
    }
    // the function entity is a real graph atom with history
    assert(g.now.all("ZefFunction").count() == 1)
    // a TERMINATED function must stop resolving even though its tag row
    // still points at it (aliveness is part of the lookup contract) —
    // while the pre-termination frame still resolves it (as-of)
    val (g2, _) = Transactor.transact(g,
      Seq(TerminateAtom("e:ZefFunction/only_big")))
    assert(FnRegistry.lookup(g2.now, "only_big").isEmpty)
    assert(FnRegistry.lookup(g2.at(g.maxSlice), "only_big").nonEmpty)
    // re-registering after termination re-opens the entity and the new
    // binding resolves (while the dead frame still resolves nothing)
    val src2 = "df => df.limit(1)"
    val (g3, h3) = FnRegistry.register(g2, "only_big", src2, df => df.limit(1))
    val fn3 = FnRegistry.lookup(g3.now, "only_big").get
    assert(fn3.source == src2 && fn3.hash == h3)
    assert(FnRegistry.lookup(g3.at(g2.maxSlice), "only_big").isEmpty)
    assert(FnRegistry.invoke(g3.now, "only_big",
      Seq(1, 2, 3).toDF("x")).count() == 1)
  }

  test("FlatGraph: collected subgraph preserves traversal + field semantics") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutEntity("P", "b"), PutEntity("Q", "c"),
      PutRelation("Knows", "a", "b"), PutRelation("Owns", "b", "c"),
      PutField("a", "Name", "Alice"), PutField("b", "Name", "Bob")))
    val seed = AtomSet(g.now, g.atoms.filter(col("atom_id") === "e:P/a"))
    val sub = seed.gather(Seq("Knows", "Owns"), 3)
    val flat = FlatGraph.fromAtomSet(sub)
    assert(flat.all("P").map(_.atom_id).toSet == Set("e:P/a", "e:P/b"))
    assert(flat.outs("e:P/a", "Knows").map(_.atom_id) == Vector("e:P/b"))
    assert(flat.ins("e:P/b", "Knows").map(_.atom_id) == Vector("e:P/a"))
    assert(flat.field("e:P/b", "Name").get.v_str.contains("Bob"))
    assert(flat.field("e:Q/c", "Name").isEmpty)
  }

  test("FlatGraph snapshot of a HISTORICAL frame reads future-terminated atoms as alive") {
    // fixture data deliberately DISTINCT from every other suite's (same
    // wish list => same LocalRelation => canonically EQUAL plans => ONE
    // CacheManager entry shared across concurrent suites, and a release
    // in either suite drops the other's cache — the test-collision class
    // NestedInfer's AE-collision guard documents)
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("FgSnap", "fgs1"), PutField("fgs1", "FgName", "SnapAnn")))
    val (g2, _) = Transactor.transact(g1, Seq(TerminateAtom("e:FgSnap/fgs1")))
    // snapshot AT slice 1, where the atom is alive — its term_slice=2 is
    // in the frame's FUTURE and used to leak into the flat rows, where
    // every alive-view filters term_slice.isEmpty: all(...) read empty
    val flat = FlatGraph.fromAtomSet(
      AtomSet(g2.at(1), g2.at(1).all("FgSnap").df))
    assert(flat.all("FgSnap").map(_.atom_id) == Vector("e:FgSnap/fgs1"))
    assert(flat.field("e:FgSnap/fgs1", "FgName").exists(_.v_str.contains("SnapAnn")))
    // and insert() applies Transactor's parity rejections: a key naming
    // both an entity and a relation resolved entity-first locally while
    // the cluster path rejects the same list loudly
    intercept[IllegalArgumentException] {
      FlatGraph(Vector.empty, Vector.empty).insert(Seq(
        PutEntity("P", "x"), PutRelation("R", "a", "b", "x"),
        PutField("x", "Name", "v")))
    }
  }

  test("GraphVerify accepts born-dead relations the write path creates") {
    // one tx terminates an endpoint AND PutFields it: the cascade closes
    // the new field relation in the same slice (inst == term — visible in
    // no frame). Check 6 used to flag it and fail isHealthy on a graph
    // the Transactor itself produced.
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("GvBd", "gvb1"), PutField("gvb1", "GvName", "BdAnn")))
    val (g2, _) = Transactor.transact(g1, Seq(
      TerminateAtom("e:GvBd/gvb1"), PutField("e:GvBd/gvb1", "GvAge", 7L)))
    assert(GraphVerify.isHealthy(g2),
      GraphVerify.verify(g2).collect().mkString("; "))
  }

  test("FlatGraph insert/extend: local Wish mutation, then transact the delta — frames agree") {
    val (g0, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "Name", "Ann"),
      PutEntity("P", "b"), PutField("b", "Name", "Bob"),
      PutRelation("Knows", "a", "b")))
    val flat0 = FlatGraph.fromAtomSet(
      AtomSet(g0.now, g0.now.all("P").df))

    // local mutation: new entity + relation + field, a reassignment, and a
    // termination with cascade — all offline, no Spark involved
    val delta = Seq(
      PutEntity("P", "c"), PutField("c", "Name", "Cid"),
      PutRelation("Knows", "e:P/b", "c"),
      AssignField("e:P/a", "Name", "Ann2"),
      TerminateAtom("e:P/b"))
    val flat1 = flat0.insert(delta)

    // local semantics: c exists and is reachable...
    assert(flat1.all("P").map(_.atom_id).toSet ==
      Set("e:P/a", "e:P/c")) // b terminated
    assert(flat1.field("e:P/c", "Name").get.v_str.contains("Cid"))
    // ...reassignment is latest-wins...
    assert(flat1.field("e:P/a", "Name").get.v_str.contains("Ann2"))
    // ...termination cascaded to b's relations (both directions)
    assert(flat1.outs("e:P/a", "Knows").isEmpty)
    assert(flat1.ins("e:P/c", "Knows").isEmpty)

    // publish: the SAME wish list transacts onto the cluster graph and the
    // resulting frame agrees with the local one
    val (g1, _) = Transactor.transact(g0, delta)
    val now = g1.now
    assert(now.all("P").df.select("atom_id").collect().map(_.getString(0))
      .toSet == flat1.all("P").map(_.atom_id).toSet)
    val names = now.all("P").fieldValue("Name", "v_str", "n")
      .collect().map(_.getAs[String]("n")).toSet
    assert(names == Set("Ann2", "Cid"))
    assert(now.all("P").hasOut("Knows").count() == 0)
  }

  test("FlatGraph insert: Transactor parity on same-tx overwrite and terminate order") {
    // assign-after-assign in ONE insert keeps only the LAST wish (the
    // Transactor's same-tx dedup); appending both made field() return the
    // overwritten value
    val fg0 = FlatGraph(Vector.empty, Vector.empty)
      .insert(Seq(PutEntity("P", "a"),
        PutField("a", "Name", "x"), AssignField("e:P/a", "Name", "y")))
    assert(fg0.field("e:P/a", "Name").get.v_str.contains("y"))
    assert(fg0.values.count(_.ae_id.contains("Name")) == 1)
    // terminate-before-PutField: terminations apply AFTER appends (the
    // Transactor order), so the new field relation is born cascaded-dead
    val fg1 = FlatGraph(Vector.empty, Vector.empty)
      .insert(Seq(PutEntity("P", "a")))
    val fg2 = fg1.insert(Seq(
      TerminateAtom("e:P/a"), PutField("e:P/a", "Age", 7)))
    assert(fg2.field("e:P/a", "Age").isEmpty,
      "field relation must be cascade-terminated like the cluster path")
    // a terminate-only insert consumes its slice: the next insert must not
    // reuse it
    val t1 = fg1.insert(Seq(TerminateAtom("e:P/a")))
    assert(t1.nextSlice == 3, s"got ${t1.nextSlice}")
    // parity check on the cluster side for the same two wish lists
    val (g0, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "Name", "x"),
      AssignField("a", "Name", "y")))
    assert(g0.now.all("P").fieldValue("Name", "v_str", "n")
      .collect().map(_.getAs[String]("n")).toSeq == Seq("y"))
  }
}

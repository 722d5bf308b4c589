package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fx.{Sync, SyncedGraph}
import graft.streaming.GraphSubscriptions

/** `sync` (reference `fx/zefhub.py`): storage-mediated replication — one
  * writer appends durably, readers in other sessions open/refresh/tail. */
class SyncSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("born-synced: empty publish, growth via transact, cross-session open parity") {
    val dir = tmp("graft_sync")
    val w0 = Sync.publish(Graph.empty(spark), dir)
    val (w1, _) = w0.transact(Seq(
      PutEntity("Person", "ada"), PutField("ada", "Score", 1.0),
      PutEntity("Person", "bob"), PutField("bob", "Score", 2.0)))
    val (w2, _) = w1.transact(Seq(AssignField("e:Person/ada", "Score", 7.5)))

    // a DIFFERENT session (fresh SQL state, shared cluster) opens the dir
    val reader = spark.newSession()
    val r = Sync.open(reader, dir)
    assert(r.graph.maxSlice == 2)
    def scores(s: GraphSlice) = s.all("Person")
      .fieldValue("Score", "v_double", "x")
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(scores(r.now) == Map("e:Person/ada" -> 7.5, "e:Person/bob" -> 2.0))
    // time travel on the replica: slice 1 predates ada's re-assignment
    assert(scores(r.at(1)) == Map("e:Person/ada" -> 1.0, "e:Person/bob" -> 2.0))
    // and the writer's in-memory graph agrees with its own published state
    assert(scores(w2.now) == scores(r.now))
  }

  test("feeds are CHANGE logs: a non-empty publish's snapshot is not replayed") {
    // the documented contract: tails replay transactions appended AFTER
    // publish(), not the published snapshot. atomFeed gets this from the
    // atoms_log mirror (starts empty); valueFeed shares the values
    // directory with the snapshot and filters by the publish-time slice
    // boundary — without it every fresh subscription received the whole
    // value history as "assigned" events.
    val (g0, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Sensor", "old"), PutField("old", "Temp", 1.0)))
    val dir = tmp("graft_sync_snap")
    var w = Sync.publish(g0, dir)
    w = w.transact(Seq(
      PutEntity("Sensor", "new"), PutField("new", "Temp", 2.0)))._1
    def drain(df: org.apache.spark.sql.DataFrame, qn: String) = {
      val q = df.writeStream.outputMode("append")
        .format("memory").queryName(qn).start()
      q.processAllAvailable(); q.stop()
      spark.table(qn)
    }
    val vals = drain(Sync.valueFeed(spark, dir), "t_snap_vals")
      .select(col("ae_id")).collect().map(_.getString(0)).toSet
    assert(vals == Set("ae:Temp/e:Sensor/new"),
      s"snapshot values replayed into the live tail: $vals")
    val atoms = drain(Sync.atomFeed(spark, dir), "t_snap_atoms")
      .select(col("atom_id")).collect().map(_.getString(0)).toSet
    assert(!atoms.exists(_.contains("old")),
      s"snapshot atoms replayed into the live tail: $atoms")
    assert(atoms.contains("e:Sensor/new"))
    // batch reads still see everything, snapshot included
    assert(Sync.open(spark, dir).now.all("Sensor").count() == 2)
  }

  test("atomFeed delivers a multi-atom tx all-or-nothing (per-tx-atomic)") {
    val dir = tmp("graft_sync_txa")
    var w = Sync.publish(Graph.empty(spark), dir)
    // each tx instantiates atoms of THREE kinds (entity + 2 AEs + 2 field
    // relations): in the partitioned atoms tree those land as one file per
    // (kind, atype) combo, which the old per-event tail surfaced across
    // several micro-batches — a racing feed reader observed the tx
    // PARTIALLY. The reference fires subscriptions against complete graph
    // slices (core/src/observable.cpp), so the feed must too.
    for (i <- 1 to 3)
      w = w.transact(Seq(
        PutEntity("Sensor", s"s$i"), PutField(s"s$i", "Temp", i * 1.5),
        PutField(s"s$i", "Label", s"L$i")))._1
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[(String, Int)]]()
    val q = Sync.atomFeed(spark, dir).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(b.select(col("atom_id"), col("inst_slice"))
          .collect().map(r => (r.getString(0), r.getInt(1))).toSeq)
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    val nonEmpty = batches.asScala.toSeq.filter(_.nonEmpty)
    val bySlice = GraphStore.load(spark, dir).atoms
      .select(col("atom_id"), col("inst_slice"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._2).map { case (s, rows) => s -> rows.toSet }
    nonEmpty.foreach { rows =>
      val slices = rows.map(_._2).distinct
      assert(slices.size == 1, s"micro-batch mixes transactions: $slices")
      assert(rows.toSet == bySlice(slices.head),
        s"micro-batch delivered a PARTIAL tx: ${rows.size} of " +
          s"${bySlice(slices.head).size} atoms of slice ${slices.head}")
    }
    // nothing lost either: all three transactions arrive, exactly once
    assert(nonEmpty.map(_.head._2).sorted == Seq(1, 2, 3))
  }

  test("atomFeed on a store without the CDC mirror fails loudly, not as an empty tail") {
    // a store saved directly (never published as a live feed) — or one
    // published before atoms_log existed — has no mirror; a silent empty
    // tail would skip the store's whole history, so the guard names the fix
    val dir = tmp("graft_nofeed")
    val (g, _) = Transactor.transact(Graph.empty(spark),
      Seq(PutEntity("Person", "a")))
    GraphStore.save(g, dir)
    val ex = intercept[IllegalStateException](Sync.atomFeed(spark, dir))
    assert(ex.getMessage.contains("Sync.publish"), ex.getMessage)
  }

  test("terminations replicate: closures reconcile on open, cascade included") {
    val dir = tmp("graft_sync_t")
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "p1"), PutEntity("Person", "p2"),
      PutField("p2", "Score", 5.0),
      PutRelation("Knows", "p1", "p2")))
    val w1 = Sync.publish(g1, dir)
    // reader opens BEFORE the termination lands
    val early = Sync.open(spark.newSession(), dir)
    assert(early.now.all("Person").df.count() == 2)

    val (w2, _) = w1.transact(Seq(TerminateAtom("e:Person/p2")))
    val late = early.refresh()
    assert(late.graph.maxSlice == 2)
    assert(late.now.all("Person").df.collect()
      .map(_.getAs[String]("atom_id")).toSeq == Seq("e:Person/p1"))
    // cascade: the Knows relation closed with its endpoint — on the
    // replica exactly as in the writer's memory
    def aliveRels(g: Graph) = g.atoms
      .filter(col("kind") === Kind.Relation && col("atype") === "Knows" &&
        Graph.aliveAt(g.maxSlice))
      .count()
    assert(aliveRels(late.graph) == 0 && aliveRels(w2.graph) == 0)
    // the pre-termination frame still sees p2 alive with its field
    val before = late.at(1).all("Person")
      .fieldValue("Score", "v_double", "x").collect()
    assert(before.map(r => r.getString(0) -> r.getDouble(1)).toMap ==
      Map("e:Person/p2" -> 5.0))
  }

  test("writer recovery: reopen the dir and keep transacting") {
    val dir = tmp("graft_sync_r")
    val w0 = Sync.publish(Graph.empty(spark), dir)
    val (w1, _) = w0.transact(Seq(PutEntity("Doc", "a"), PutField("a", "N", 1L)))
    // writer process "dies"; a new one recovers from storage alone
    val recovered = Sync.open(spark, dir)
    assert(recovered.graph.maxSlice == w1.graph.maxSlice)
    val (w2, _) = recovered.transact(Seq(
      PutEntity("Doc", "b"), PutField("b", "N", 2L)))
    assert(w2.graph.maxSlice == 2)
    // a reader sees both generations' writes
    val r = Sync.open(spark.newSession(), dir)
    val ns = r.now.all("Doc").fieldValue("N", "v_long", "n")
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(ns == Map("e:Doc/a" -> 1L, "e:Doc/b" -> 2L))
  }

  test("writer fencing: a stale handle cannot fork the log") {
    val dir = tmp("graft_sync_f")
    val w0 = Sync.publish(Graph.empty(spark), dir)
    val (w1, _) = w0.transact(Seq(PutEntity("Doc", "a")))
    // a second writer generation appends from the same state...
    val (_, _) = Sync.open(spark, dir).transact(Seq(PutEntity("Doc", "b")))
    // ...so the FIRST handle is now stale: its append must refuse rather
    // than silently fork slice 2
    val e = intercept[IllegalStateException] {
      w1.transact(Seq(PutEntity("Doc", "c")))
    }
    assert(e.getMessage.contains("stale sync writer"))
    // recovery path: refresh then re-apply
    val (w3, _) = w1.refresh().transact(Seq(PutEntity("Doc", "c")))
    assert(w3.graph.maxSlice == 3)
    assert(Sync.open(spark.newSession(), dir).now.all("Doc").df.count() == 3)
  }

  test("re-publish into a used directory inherits none of the old store's side state") {
    val dir = tmp("graft_sync_rp")
    var w = Sync.publish(Graph.empty(spark), dir)
    w = w.transact(Seq(PutEntity("Sensor", "s1"), PutEntity("Sensor", "s2")))._1
    w = w.transact(Seq(TerminateAtom("e:Sensor/s2")))._1 // closure row on disk
    // re-init: a FRESH graph with the same deterministic ids lands in the
    // same directory (the recovery / re-bootstrap flow)
    val (gNew, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Sensor", "s1"), PutEntity("Sensor", "s2")))
    val w2 = Sync.publish(gNew, dir)
    // the OLD store's closure rows must not terminate the new store's s2
    assert(Sync.open(spark, dir).now.all("Sensor").df.count() == 2)
    // and the OLD store's writer-fence claims must not block the new log
    val (w3, _) = w2.transact(Seq(PutEntity("Sensor", "s3")))
    assert(w3.graph.maxSlice == 2)
    assert(Sync.open(spark.newSession(), dir).now.all("Sensor").df.count() == 3)
  }

  test("overwrite with an unflagged graph clears stale single-assignment provenance") {
    val dir = tmp("graft_meta_rp")
    GraphStore.save(GraphEncoder.encodeTpch(spark, "/root/testdata/sf0.001"), dir)
    assert(GraphStore.load(spark, dir).uniqueValuesThrough == 1)
    // a multi-assignment graph overwrites the same path: the stale flag
    // would silently put its duplicate-ae history on the filter-only
    // fast path, so save must clear it
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "X", 1.0)))
    val (g2, _) = Transactor.transact(g1, Seq(AssignField("e:P/a", "X", 2.0)))
    GraphStore.save(g2, dir)
    val loaded = GraphStore.load(spark, dir)
    assert(loaded.uniqueValuesThrough == -1)
    val rows = loaded.latestValues(2).filter(col("ae_id") === "ae:X/e:P/a")
    assert(rows.count() == 1 && rows.collect()(0).getAs[Double]("v_double") == 2.0)
  }

  test("live tail: subscriptions over the synced store equal the receipts") {
    val dir = tmp("graft_sync_s")
    var w = Sync.publish(Graph.empty(spark), dir)
    for (i <- 1 to 3) {
      val (w2, _) = w.transact(Seq(
        PutEntity("Sensor", s"s$i"), PutField(s"s$i", "Temp", i * 1.5)))
      w = w2
    }
    val (w4, _) = w.transact(Seq(TerminateAtom("e:Sensor/s2")))

    val qa = GraphSubscriptions.onAssigned(
        Sync.valueFeed(spark, dir), w4.graph.atoms, "Temp")
      .writeStream.outputMode("append")
      .format("memory").queryName("t_sync_assigned").start()
    qa.processAllAvailable(); qa.stop()
    val assigned = spark.table("t_sync_assigned")
      .select(col("atom_id"), col("tx_slice").cast("int"), col("v_double"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(assigned == Set(
      ("ae:Temp/e:Sensor/s1", 1, 1.5),
      ("ae:Temp/e:Sensor/s2", 2, 3.0),
      ("ae:Temp/e:Sensor/s3", 3, 4.5)))

    // closures carry no atype on disk; the feed re-derives it from the id
    // scheme so the same atype-filtered subscription builder applies
    val qt = GraphSubscriptions.onTerminatedClosures(
        Sync.closureFeed(spark, dir), "Sensor")
      .writeStream.outputMode("append")
      .format("memory").queryName("t_sync_term").start()
    qt.processAllAvailable(); qt.stop()
    val terms = spark.table("t_sync_term")
      .select(col("atom_id"), col("tx_slice").cast("int"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(terms == Set(("e:Sensor/s2", 4)))
  }

  test("terminated subscriptions fire for plain, instanced AND array-element AE ids") {
    import spark.implicits._
    val dir = tmp("graft_sync_t3")
    // array-element AEs (ae:tags[0]/...) come from the nested-document
    // encoder; instanced AEs (ae:Score#w1/...) from the wish path
    val flat = graft.wrangling.NestedInfer.flatten(
      Seq((1, """{"name":"n1","tags":["a","b"]}""")).toDF("doc_id", "doc"),
      "doc_id", "doc")
    var w = Sync.publish(graft.wrangling.NestedInfer.toGraph(flat), dir)
    w = w.transact(Seq(
      PutEntity("User", "u1"),
      PutField("u1", "Score", 1.0),
      PutField("u1", "Score", 2.0, instanceKey = "w1")))._1
    w = w.transact(Seq(
      TerminateAtom("ae:Score/e:User/u1"),
      TerminateAtom("ae:Score#w1/e:User/u1"),
      TerminateAtom("ae:tags[0]/1:$")))._1

    // one atype-filtered subscription per type, over the LIVE closure tail:
    // the type derived from the id must ignore the #instance / [pos]
    // suffixes (the regression: ae:Score#w1/... derived atype "Score#w1"
    // and the Score subscription silently never fired)
    def fired(atype: String, kind: String, qn: String): Set[(String, Int)] = {
      val q = GraphSubscriptions.onTerminatedClosures(
          Sync.closureFeed(spark, dir), atype, kind)
        .writeStream.outputMode("append")
        .format("memory").queryName(qn).start()
      q.processAllAvailable(); q.stop()
      spark.table(qn)
        .select(col("atom_id"), col("tx_slice").cast("int"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    }
    assert(fired("Score", "ae", "t_term_score") == Set(
      ("ae:Score/e:User/u1", 3), ("ae:Score#w1/e:User/u1", 3)))
    assert(fired("tags", "ae", "t_term_tags") == Set(("ae:tags[0]/1:$", 3)))
    // the CASCADE rows ride the same feed: the AEs' field relations closed
    // with them, and a rel-kind subscription sees those terminations live
    // (the pre-cascade feed silently never fired here)
    assert(fired("Score", "rel", "t_term_score_rel") == Set(
      ("rel:Score/e:User/u1", 3), ("rel:Score#w1/e:User/u1", 3)))
    // the batch twin sees the same events through the same derivation
    val batch = GraphSubscriptions.onTerminatedClosures(
        Sync.closureTable(spark, dir), "Score", "ae")
      .select(col("atom_id")).collect().map(_.getString(0)).toSet
    assert(batch == Set("ae:Score/e:User/u1", "ae:Score#w1/e:User/u1"))
    // includeCascades=false = the feed's pre-cascade content (the WS
    // wire default): DIRECT terminations only, so an atype-wide
    // subscriber is not double-fired by the rel: cascade sharing the
    // atype — the ae: rows stay, the writer-derived rel: rows drop
    val direct = GraphSubscriptions.onTerminatedClosures(
        Sync.closureTable(spark, dir), "Score", "any",
        includeCascades = false)
      .select(col("atom_id")).collect().map(_.getString(0)).toSet
    assert(direct == Set("ae:Score/e:User/u1", "ae:Score#w1/e:User/u1"))
    val withCascades = GraphSubscriptions.onTerminatedClosures(
        Sync.closureTable(spark, dir), "Score", "any")
      .select(col("atom_id")).collect().map(_.getString(0)).toSet
    assert(withCascades == direct ++
      Set("rel:Score/e:User/u1", "rel:Score#w1/e:User/u1"))
  }

  test("crashed-writer recovery: an orphan slice claim is adopted, not a wedge") {
    val dir = tmp("graft_sync")
    val w0 = Sync.publish(Graph.empty(spark), dir)
    val (w1, _) = w0.transact(Seq(
      PutEntity("Person", "ada"), PutField("ada", "Score", 1.0)))
    // simulate a predecessor that claimed slice 2 and died before any
    // append: claim file exists, no tx row
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "_slices"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, "_slices", "2"))
    // the recovered writer (refresh + re-apply) must proceed, not throw
    val recovered = w1.refresh()
    val (w2, _) = recovered.transact(Seq(
      AssignField("e:Person/ada", "Score", 7.5)))
    assert(w2.graph.maxSlice == 2)
    val r = Sync.open(spark, dir)
    assert(r.now.all("Person").fieldValue("Score", "v_double", "x")
      .collect().map(_.getDouble(1)).toSeq == Seq(7.5))
    // a claim for a COMMITTED slice still throws (stale handle)
    intercept[IllegalStateException] {
      w1.transact(Seq(AssignField("e:Person/ada", "Score", 9.9)))
    }
  }

  test("partial-append recovery: purgeSlice drops uncommitted rows before re-append") {
    import org.apache.spark.sql.functions._
    val dir = tmp("graft_sync")
    val w0 = Sync.publish(Graph.empty(spark), dir)
    val (w1, _) = w0.transact(Seq(
      PutEntity("Person", "ada"), PutField("ada", "Score", 1.0)))
    // simulate a crash MID-append of slice 2: claim + some atom/value rows
    // landed, the tx marker did not
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, "_slices", "2"))
    val (gPartial, _) = Transactor.transact(w1.graph, Seq(
      PutEntity("Person", "bob"), PutField("bob", "Score", 5.0)))
    val partialAtoms = gPartial.atoms.filter(col("inst_slice") === 2)
    val partialValues = gPartial.values.filter(col("tx_slice") === 2)
    partialAtoms.write.mode("append").partitionBy("kind", "atype")
      .parquet(s"$dir/atoms")
    partialValues.write.mode("append").parquet(s"$dir/values")
    // recovery: refresh sees only slice 1 committed; re-apply (a possibly
    // DIFFERENT retry payload) must purge the partial rows, then land
    val recovered = w1.refresh()
    assert(recovered.graph.maxSlice == 1)
    val (w2, _) = recovered.transact(Seq(
      PutEntity("Person", "carl"), PutField("carl", "Score", 3.0)))
    assert(w2.graph.maxSlice == 2)
    val r = Sync.open(spark, dir).graph
    // bob's partial rows are gone; carl's committed rows are there once
    assert(r.atoms.filter(col("atom_id") === "e:Person/bob").count() == 0)
    assert(r.atoms.filter(col("atom_id") === "e:Person/carl").count() == 1)
    assert(r.now.all("Person").fieldValue("Score", "v_double", "x")
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap ==
      Map("e:Person/ada" -> 1.0, "e:Person/carl" -> 3.0))
  }
}

package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph invariant verification — the columnar restatement of the
  * reference's low-level `verify_graph` (core/include/verification.h:43-60:
  * double-linking consistency, chronological instantiation order, edge-list
  * ranges). Blob double-linking has no analogue here (joins replace edge
  * lists), so the checks verify what CAN break in the columnar store:
  * referential integrity and interval discipline. Returns a violations
  * report `(check, atom_id, detail)` — empty means healthy. Every check is
  * a distributed join/aggregate; nothing collects.
  */
object GraphVerify {

  def verify(g: Graph): DataFrame = {
    val atoms = g.atoms
    // the shared intermediates feed several checks each (ids: 2 anti-joins;
    // rels: 4 checks; endpoints: 2 sides of check 6) and Spark shares no
    // subplans across DataFrame branches — persist them while the report
    // computes or a health check scans the atom table ~10 times. They are
    // unpersisted before returning (the report materializes eagerly below),
    // so a long-running service calling verify() periodically accumulates
    // nothing: without this, each call pinned three atom-scan-sized tables
    // with no release path outside the batch harnesses' releaseAll().
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ids = atoms.select(col("atom_id")).distinct().persist(lvl)
    val maxSlice = g.maxSlice

    def report(check: String, df: DataFrame): DataFrame =
      df.select(lit(check).as("check"), col("atom_id"),
        col("detail").cast("string"))

    // 1. dangling relation endpoints (verification.h:37 — "index present in
    //    source/target's edge list" becomes "endpoint id resolves")
    val rels = atoms.filter(col("kind") === Kind.Relation).persist(lvl)
    val danglingSrc = rels
      .join(ids.withColumnRenamed("atom_id", "src_id"), Seq("src_id"), "left_anti")
      .select(col("atom_id"), concat(lit("missing src "), col("src_id")).as("detail"))
    val danglingDst = rels
      .join(ids.withColumnRenamed("atom_id", "dst_id"), Seq("dst_id"), "left_anti")
      .select(col("atom_id"), concat(lit("missing dst "), col("dst_id")).as("detail"))

    // 2. value rows must reference an existing attribute entity
    val orphanValues = g.values
      .join(atoms.filter(col("kind") === Kind.AttributeEntity)
        .select(col("atom_id").as("ae_id")), Seq("ae_id"), "left_anti")
      .select(col("ae_id").as("atom_id"), lit("value row without AE").as("detail"))

    // 3. chronological interval discipline (verification.h:44): termination
    //    never precedes instantiation; slices within [1, maxSlice]
    val badInterval = atoms.filter(
        col("term_slice").isNotNull && col("term_slice") < col("inst_slice"))
      .select(col("atom_id"),
        concat(lit("term "), col("term_slice"), lit(" < inst "),
          col("inst_slice")).as("detail"))
    val badRange = atoms.filter(
        col("inst_slice") < 1 || col("inst_slice") > maxSlice ||
          (col("term_slice").isNotNull && col("term_slice") > maxSlice))
      .select(col("atom_id"), concat(lit("slice outside [1, "),
        lit(maxSlice), lit("]")).as("detail"))

    // 4. at most one OPEN interval row per atom (the replay-duplication
    //    failure class; re-instantiation legitimately yields several CLOSED
    //    rows plus at most one open)
    val doubleOpen = atoms.filter(col("term_slice").isNull)
      .groupBy(col("atom_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("atom_id"), concat(col("n"), lit(" open intervals")).as("detail"))

    // 5. value assignments within the graph's tx range
    val badValueSlice = g.values.filter(
        col("tx_slice") < 1 || col("tx_slice") > maxSlice)
      .select(col("ae_id").as("atom_id"),
        concat(lit("value tx_slice "), col("tx_slice")).as("detail"))

    // 6. a relation must open while both endpoints are alive (the cascade
    //    invariant observed from the other side). Restricted to relations
    //    whose endpoints RESOLVE: a missing endpoint is already reported as
    //    dangling_src/dst, and double-reporting the same corruption under
    //    two check names would inflate counts and confuse triage.
    val endpoints =
      atoms.select(col("atom_id"), col("inst_slice").as("__ei"),
        coalesce(col("term_slice"), lit(Int.MaxValue)).as("__et")).persist(lvl)
    val resolvedRels = rels
      .join(ids.withColumnRenamed("atom_id", "src_id"), Seq("src_id"), "left_semi")
      .join(ids.withColumnRenamed("atom_id", "dst_id"), Seq("dst_id"), "left_semi")
    def coveredAtOpen(endCol: String): DataFrame = resolvedRels.alias("r")
      .join(endpoints.withColumnRenamed("atom_id", endCol).alias("e"), endCol)
      .filter(col(s"e.__ei") <= col("r.inst_slice") &&
        col("r.inst_slice") < col("e.__et"))
      .select(col("r.atom_id"), col("r.inst_slice")).distinct()
    // born-dead relations (term_slice == inst_slice) are EXEMPT: the
    // write path legitimately creates them when one tx both terminates an
    // endpoint and PutFields it (the cascade closes the new field relation
    // in the same slice), and such rows are visible in NO frame — flagging
    // them failed isHealthy on graphs the Transactor itself produced
    val visibleRels = resolvedRels.filter(
      col("term_slice").isNull || col("term_slice") =!= col("inst_slice"))
    val uncovered = visibleRels.select(col("atom_id"), col("inst_slice"))
      .except(coveredAtOpen("src_id").intersect(coveredAtOpen("dst_id")))
      .select(col("atom_id"),
        concat(lit("endpoint dead at open slice "), col("inst_slice")).as("detail"))

    val full = report("dangling_src", danglingSrc)
      .unionByName(report("dangling_dst", danglingDst))
      .unionByName(report("orphan_value", orphanValues))
      .unionByName(report("inverted_interval", badInterval))
      .unionByName(report("slice_out_of_range", badRange))
      .unionByName(report("duplicate_open_interval", doubleOpen))
      .unionByName(report("value_slice_out_of_range", badValueSlice))
      .unionByName(report("relation_endpoint_dead", uncovered))
    // Materialize eagerly (violations are tiny — empty on a healthy graph)
    // so the three intermediates can be unpersisted NOW instead of pinning
    // until some batch harness's releaseAll. localCheckpoint blocks are
    // freed by the ContextCleaner once the returned report is unreachable —
    // the release path a periodic service health check needs.
    try full.localCheckpoint(true)
    finally {
      ids.unpersist(false); rels.unpersist(false); endpoints.unpersist(false)
    }
  }

  /** Boolean form, `verify_graph(g)` (verification.h:60). */
  def isHealthy(g: Graph): Boolean = verify(g).isEmpty

  /** Advisory lint for the ACCEPTED one-level termination-cascade
    * residual. Transact culls a terminated atom's incident relations one
    * level deep — matching the reference's single PleaseTerminate pass
    * (graph.cpp's termination cull) — so a META-relation attached to a
    * cascaded relation survives with a terminated endpoint: alive in
    * frames where its endpoint resolves to nothing. That is contract, not
    * corruption, which is why it is NOT part of [[verify]]/[[isHealthy]]
    * (the Transactor itself produces the shape); this face makes the
    * contract AUDITABLE in data instead of invisible.
    *
    * Reports relations whose endpoint is dead in the relation's LAST
    * visible frame (`term_slice - 1`, or the current frame for open
    * relations) — the cascade-residual shape. Mid-lifetime gaps where an
    * endpoint is terminated and later re-instantiated under the same id
    * while the relation stays open are out of scope (Transact's cascade
    * closes the relation at the first termination, so that shape cannot
    * arise from the write path). Returns `(atom_id, last_visible_slice,
    * detail)`; empty means no relation outlives an endpoint. Same
    * distributed join shape as verify's check 6 — nothing collects. */
  def danglingEndpointRelations(g: Graph): DataFrame = {
    val atoms = g.atoms
    val maxSlice = g.maxSlice
    val endpoints = atoms.select(col("atom_id"),
      col("inst_slice").as("__ei"),
      coalesce(col("term_slice"), lit(Int.MaxValue)).as("__et"))
    val rels = atoms.filter(col("kind") === Kind.Relation)
      .withColumn("__last", least(
        coalesce(col("term_slice") - 1, lit(maxSlice)), lit(maxSlice)))
      // born-dead rows are visible in no frame; pre-inst rows can't dangle
      .filter(col("inst_slice") <= col("__last"))
      .select(col("atom_id"), col("src_id"), col("dst_id"), col("__last"))
    def coveredAtLast(endCol: String): DataFrame = rels.alias("r")
      .join(endpoints.withColumnRenamed("atom_id", endCol).alias("e"), endCol)
      .filter(col("e.__ei") <= col("r.__last") &&
        col("r.__last") < col("e.__et"))
      .select(col("r.atom_id"), col("r.__last")).distinct()
    rels.select(col("atom_id"), col("__last")).distinct()
      .except(coveredAtLast("src_id").intersect(coveredAtLast("dst_id")))
      .select(col("atom_id"), col("__last").as("last_visible_slice"),
        concat(lit("endpoint dead at last visible slice "),
          col("__last")).as("detail"))
  }
}

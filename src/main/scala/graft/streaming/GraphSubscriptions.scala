package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Kind

/** Graph-event subscriptions — zef `on[instantiated[ET.X]]` /
  * `on[assigned[AET.X]]` / `on[terminated[...]]`
  * (reference `impl.py:238-360`, `graph_events.py:1-89`).
  *
  * The reference pushes events through Rx subjects at write time; the Spark
  * restatement treats the graph's append tables AS the change feed: a
  * streaming read of atoms/values appends (Delta CDF or tx-log tail in
  * production) filtered by the subscription pattern. Works identically on a
  * batch DataFrame (replay) or a streaming one (live).
  */
object GraphSubscriptions {

  /** New instances of entity type `et`. */
  def onInstantiated(atomFeed: DataFrame, et: String): DataFrame =
    atomFeed
      .filter(col("kind") === Kind.Entity && col("atype") === et)
      .select(col("atom_id"), col("inst_slice").as("tx_slice"),
        lit("instantiated").as("event"))

  /** Value assignments on AEs of type `aet`. The AE-type dimension comes
    * from a static atoms snapshot — a stream-static broadcast join (tiny
    * dimension side: one row per AE of the type). */
  def onAssigned(valueFeed: DataFrame, atomsStatic: DataFrame,
      aet: String): DataFrame = {
    val dim = atomsStatic
      .filter(col("kind") === Kind.AttributeEntity && col("atype") === aet)
      .select(col("atom_id").as("ae_id"))
    valueFeed.join(broadcast(dim), "ae_id")
      .select(col("ae_id").as("atom_id"), col("tx_slice"),
        lit("assigned").as("event"),
        col("v_str"), col("v_long"), col("v_double"), col("v_bool"), col("v_ts"))
  }

  /** [[onAssigned]] without the AE-type dimension join: the AE's type is
    * re-derived from the deterministic id scheme (`ae:RT/...`,
    * `ae:RT#instance/...`, `ae:RT[pos]/...`). For feeds written by the
    * Transactor/GraphEncoder this is exact, and it removes the one
    * stream-static join — whose static side resolves its file listing at
    * analysis time and would go stale against AEs created AFTER the
    * subscription started. The long-lived-subscription path (WsServer)
    * uses this form. */
  def onAssignedScheme(valueFeed: DataFrame, aet: String): DataFrame =
    valueFeed
      .filter(col("ae_id").startsWith(s"ae:$aet/") ||
        col("ae_id").startsWith(s"ae:$aet#") ||
        col("ae_id").startsWith(s"ae:$aet["))
      .select(col("ae_id").as("atom_id"), col("tx_slice"),
        lit("assigned").as("event"),
        col("v_str"), col("v_long"), col("v_double"), col("v_bool"), col("v_ts"))

  /** Terminations: atoms whose interval closed in the feed (batch-replay
    * path, where term_slice is already reconciled into the rows). `kind`
    * narrows by the id scheme's kind prefix exactly like
    * [[onTerminatedClosures]] — an AE `ae:Spend/...` and its
    * cascade-closed field relation `rel:Spend/...` share the atype, so an
    * atype-only replay reported a "terminated Spend" for the relation row
    * while the live path (kind="ae") correctly suppressed it: the two
    * documented-equivalent paths returned different event sets. */
  /** Valid kind prefixes of the id scheme (Transactor.atomId +
    * the field-relation form). A TYPO — or the natural-but-wrong
    * Kind.Entity constant, which is "entity", not "e" — used to
    * prefix-match nothing and deliver an empty event stream forever,
    * silently. */
  private val KindPrefixes = Set("any", "e", "r", "ae", "rel")

  private def requireKind(kind: String): Unit =
    require(KindPrefixes.contains(kind),
      s"unknown kind '$kind' — expected one of ${KindPrefixes.mkString(", ")} " +
        "(the id-scheme prefixes; note Kind.Entity is the STORAGE name " +
        "'entity', not the id prefix 'e')")

  def onTerminated(atomFeed: DataFrame, atype: String,
      kind: String = "any"): DataFrame = {
    requireKind(kind)
    atomFeed
      .filter(col("atype") === atype && col("term_slice").isNotNull &&
        (if (kind == "any") lit(true)
         else col("atom_id").startsWith(s"$kind:")))
      .select(col("atom_id"), col("term_slice").as("tx_slice"),
        lit("terminated").as("event"))
  }

  /** Terminations over the DURABLE feed: transactions record closures as
    * `(atom_id, atype, term_slice)` rows in the closure sub-feed
    * (GraphFeed.closureFeed) — the atoms sub-feed only ever sees open
    * intervals, so this, not [[onTerminated]], is the live-CDC path.
    *
    * `kind` narrows by the id scheme's kind prefix (`e`/`r`/`ae`/`rel`),
    * mirroring the reference's distinct ET/RT/AET type namespaces: a
    * field AE `ae:Spend/...` and its field relation `rel:Spend/...`
    * share the atype string but are different subscription targets —
    * now that closure feeds carry cascade rows, an atype-only filter
    * would conflate them. Default `"any"` keeps the unnarrowed form.
    *
    * `includeCascades = false` restricts to DIRECT terminations (rows
    * the writer did not derive via the one-level relation cascade) —
    * the feed's original content before cascade rows were added, and
    * the wire-protocol default for WS subscribers that predate them
    * (an AE-atype subscriber would otherwise see each termination
    * twice: its own `ae:` row plus the `rel:` cascade sharing the
    * atype). */
  def onTerminatedClosures(closureFeed: DataFrame, atype: String,
      kind: String = "any", includeCascades: Boolean = true): DataFrame = {
    requireKind(kind)
    closureFeed
      .filter(col("atype") === atype &&
        (if (kind == "any") lit(true)
         else col("atom_id").startsWith(s"$kind:")) &&
        (if (includeCascades) lit(true)
         else !coalesce(col("cascaded"), lit(false))))
      .select(col("atom_id"), col("term_slice").as("tx_slice"),
        lit("terminated").as("event"))
  }
}

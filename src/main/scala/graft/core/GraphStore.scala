package graft.core

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable graph storage — the physical layout claimed in SURVEY §1.2:
  * `atoms` written partitioned by (kind, atype) so `all[ET.X]` scans prune
  * to one directory subtree (the columnar analogue of zef's per-type
  * instance lists), `values`/`txs`/`tags` as plain parquet. On a real
  * cluster the writes would additionally be bucketed by atom_id/ae_id
  * (bucketing needs a table catalog, which local parquet dirs don't have —
  * noted, not silently skipped).
  */
object GraphStore {

  def save(g: Graph, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    g.atoms.write.mode(mode)
      .partitionBy("kind", "atype")
      .parquet(s"$path/atoms")
    g.values.write.mode(mode).parquet(s"$path/values")
    g.txs.write.mode(mode).parquet(s"$path/txs")
    if (!g.tags.isEmpty)
      g.tags.write.mode(mode).parquet(s"$path/tags")
  }

  def load(spark: SparkSession, path: String): Graph = {
    // partition columns come back at the end; restore canonical order
    val atomCols = Seq("atom_id", "kind", "atype", "src_id", "dst_id",
      "inst_slice", "term_slice", "origin_uid")
    val atoms = spark.read.parquet(s"$path/atoms")
      .select(atomCols.map(col): _*)
    val values = spark.read.parquet(s"$path/values")
    val txs = spark.read.parquet(s"$path/txs")
    val tagsPath = new java.io.File(s"$path/tags")
    val tags =
      if (tagsPath.exists()) spark.read.parquet(s"$path/tags")
      else Graph.empty(spark).tags
    Graph(atoms, values, txs, tags)
  }

  // Durable incremental append (per-tx delta with termination as a
  // Delta-style MERGE on the affected partitions) is the round-2 layout
  // work item; until then save() persists full snapshots.
}

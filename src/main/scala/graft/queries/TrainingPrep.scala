package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.wrangling.Sampling

/** Training-set preparation queries (north-star superset): deterministic
  * domain mixing, sequence packing, global shuffle, shard assignment —
  * all md5-keyed so DuckDB oracles the EXACT row selection, not just
  * counts. n_chars stands in for the token count (the real pipeline feeds
  * [[graft.wrangling.TextOps]] token counts through the same columns).
  */
object TrainingPrep {

  val entries: Seq[QueryDef] = Seq(

    // Domain (language) mixing: per-domain deterministic sampling rates in
    // one map-only predicate — en halved, de 3/4, fr quartered, rest kept.
    // The oracle replays the same md5-prefix decisions row by row.
    QueryDef(
      "wr_domain_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.filter(Sampling.domainMixKeep(col("doc_id"), col("lang"),
            Map("en" -> 0.5, "de" -> 0.75, "fr" -> 0.25), seed = "mix1"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("tokens"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_kept,
             |  CAST(sum(n_chars) AS BIGINT) AS tokens
             |FROM documents
             |WHERE substring(md5('mix1' || 'v:' || CAST(doc_id AS VARCHAR)), 1, 4) <
             |  CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN 'c000'
             |            WHEN 'fr' THEN '4000' ELSE 'g' END
             |GROUP BY lang ORDER BY lang""".stripMargin),
      Seq("domain_mixing", "deterministic_sampling", "corpus_reweighting")),

    // Sequence packing manifest: concat-and-chunk docs into 2000-token
    // bins per language shard (window partitioned by shard — no global
    // sort). Emits the per-bin manifest a loader would read.
    QueryDef(
      "wr_pack_sequences",
      (s, d) => {
        Sampling.packManifest(Tables.documents(s, d),
            col("n_chars"), col("lang"), col("doc_id"), budget = 2000L)
          .orderBy(col("shard"), col("bin"))
      },
      Some("""SELECT lang AS shard,
             |  CAST(floor((cum - n_chars) / 2000) AS BIGINT) AS bin,
             |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_tokens
             |FROM (
             |  SELECT lang, n_chars,
             |    sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM documents)
             |GROUP BY shard, bin ORDER BY shard, bin""".stripMargin),
      Seq("sequence_packing", "bin_packing", "shard_manifest")),

    // Deterministic global shuffle: total order by md5(seed||id) — Spark
    // runs it as a range-partitioned distributed sort; the oracle proves
    // the exact permutation is engine-independent. First 40 positions.
    QueryDef(
      "wr_global_shuffle",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // limit-first so the plan is TakeOrderedAndProject (distributed
        // top-k), then rank WITHIN the 40 survivors — never a global
        // single-partition window over the corpus
        val top = docs.select(col("doc_id"),
            Sampling.shuffleOrder(col("doc_id"), "epoch0").as("h"))
          .orderBy(col("h"), col("doc_id")).limit(40)
        top.withColumn("pos", row_number().over(
            Window.orderBy(col("h"), col("doc_id"))).cast("long"))
          .select(col("pos"), col("doc_id"))
          .orderBy(col("pos"))
      },
      Some("""SELECT pos, doc_id FROM (
             |  SELECT doc_id, row_number() OVER (
             |    ORDER BY md5('epoch0' || 'v:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
             |  FROM documents)
             |WHERE pos <= 40 ORDER BY pos""".stripMargin),
      Seq("global_shuffle", "deterministic_ordering", "epoch_permutation")),

    // Hash shard assignment + per-shard manifest: 8 balanced shards from
    // the md5 prefix (not id % 8, which inherits key skew). Map-side
    // assignment, one aggregation shuffle.
    QueryDef(
      "wr_shard_assign",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.withColumn("shard", Sampling.shardOf(col("doc_id"), 8, "v1"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_tokens"))
          .orderBy(col("shard"))
      },
      Some("""SELECT CAST(CAST('0x' || substring(md5('v1' || 'v:' || CAST(doc_id AS VARCHAR)), 1, 4)
             |         AS INT) % 8 AS INT) AS shard,
             |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_tokens
             |FROM documents GROUP BY shard ORDER BY shard""".stripMargin),
      Seq("shard_assignment", "hash_bucketing", "shard_manifest")),

    // Per-group deterministic sample via the sample_k bottom-k-by-hash
    // aggregate: O(k) state per group through partial aggregation, where
    // the window formulation the oracle uses would shuffle every row.
    // Same selection on both engines because the sketch orders by md5.
    QueryDef(
      "wr_sample_per_group",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(graft.functions.BottomKAgg.sampleK(
            col("event_id"), 5, "s0").as("sample"))
          .select(col("event_type"), explode(col("sample")).as("event_id"))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""SELECT event_type, event_id FROM (
             |  SELECT event_type, event_id, row_number() OVER (
             |    PARTITION BY event_type
             |    ORDER BY md5('s0' || CAST(event_id AS VARCHAR)), event_id) AS rn
             |  FROM events) WHERE rn <= 5
             |ORDER BY event_type, event_id""".stripMargin),
      Seq("sample_k", "bottom_k_sketch", "per_group_sampling"))
  )
}

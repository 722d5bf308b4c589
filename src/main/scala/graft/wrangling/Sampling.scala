package graft.wrangling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data SET-PREPARATION operators (north-star superset beside
  * [[Dedup]]/[[Similarity]]/[[TextOps]]): deterministic sampling, domain
  * mixing, sequence packing, and global shuffling — the steps that turn a
  * cleaned corpus into training shards.
  *
  * Everything here is reproducible BY CONSTRUCTION: sampling/shuffle
  * decisions are pure functions of a row key via md5, never `rand()`, so a
  * re-run over 100 TB (or a backfill of one lost shard) selects the exact
  * same rows. md5 is also engine-portable, which is what lets DuckDB oracle
  * these end-to-end.
  *
  * Scale notes:
  *  - sampling/mixing are map-only column predicates — no shuffle at all;
  *  - packing windows are PARTITIONED (per shard): each bin assignment
  *    sorts only within its shard partition, never a global total order;
  *  - the global shuffle is an `ORDER BY hash` — Spark executes it as a
  *    range-partitioned distributed sort (sample → range bounds → local
  *    sort), the canonical way to materialize a shuffled 100 TB corpus.
  */
object Sampling {

  /** Deterministic hash of a key column (+ optional seed), as a lowercase
    * hex string. Changing the seed yields an independent shuffle/sample.
    * A NULL key hashes as one sentinel value, not to NULL: md5(null) made
    * every null-keyed row's keep-predicate NULL → silently dropped at any
    * rate below 1.0 but kept at exactly 1.0 (the lit(true) shortcut of
    * the old sampleKeep) — a discontinuous bias cliff. The null flag is
    * a DISCRIMINATED prefix ("n:" vs "v:" + casted value), never a
    * sentinel value in the key's own namespace: a string key equal to the
    * old "\u0000graft-null-key" sentinel collided with the null rows and
    * shared their keep decision. Oracles mirror the prefix ('v:' before
    * the casted key — their fixtures never carry null keys).
    *
    * MIGRATION (README "Migration notes"): the prefix changed the hash
    * domain for ALL keys, so every persisted decision keyed on the old
    * hash (keeps, shards, epoch permutations, domain mixes) reshuffles
    * on upgrade — rebuild derived artifacts once; never mix old and new
    * decisions in one corpus. */
  def hashKey(key: Column, seed: String = ""): Column =
    md5(concat(lit(seed),
      when(key.isNull, lit("n:"))
        .otherwise(concat(lit("v:"), key.cast("string")))))

  /** The 16-bit hex keep-threshold for a rate (granularity 1/65536).
    * ONE encoding for both samplers — they had drifted once already. */
  private def thrHex(r: Double): Column = {
    require(r >= 0.0 && r <= 1.0, s"rate $r out of [0,1]")
    // 'g' sorts above every hex digit: rate 1.0 keeps ALL rows (a 5-char
    // "10000" threshold would string-compare below "2***" and drop them)
    if (r >= 1.0) lit("g") else lit(f"${(r * 65536).toInt}%04x")
  }

  /** Keep-predicate for a deterministic sample at `rate`: the row's md5
    * prefix (16 bits ⇒ rate granularity 1/65536) falls under the
    * threshold. Engine-portable: hex-string comparison, no int parsing. */
  def sampleKeep(key: Column, rate: Double, seed: String = ""): Column =
    substring(hashKey(key, seed), 1, 4) < thrHex(rate)

  /** Domain-mixing keep-predicate: per-domain sampling rates (CASE over
    * the domain column), unknown domains get `default`. The standard
    * "up-weight books, down-weight web" corpus-mixing step, as one
    * map-only predicate. */
  def domainMixKeep(key: Column, domain: Column,
      rates: Map[String, Double], default: Double = 1.0,
      seed: String = ""): Column = {
    val hex = substring(hashKey(key, seed), 1, 4)
    val keep = rates.foldLeft(when(lit(false), lit("")): Column) {
      case (acc, (dom, r)) => acc.when(domain === dom, thrHex(r))
    }.otherwise(thrHex(default))
    hex < keep
  }

  /** Contiguous sequence packing: within each shard (ordered by `order`),
    * documents are concatenated into one token stream and each doc is
    * assigned the bin its START offset falls in —
    * `bin = floor((cumsum(tokens) - tokens) / budget)`, the
    * concat-and-chunk semantics LLM data loaders use (a doc straddling a
    * boundary stays with the bin it starts in). The window is PARTITIONED
    * by shard: no global sort at any scale. */
  def packBins(tokens: Column, shard: Column, order: Column,
      budget: Long, tieBreak: Seq[Column] = Nil): Column = {
    require(budget > 0, "budget must be positive")
    // the module contract is reproducible BY CONSTRUCTION, and a running
    // cumsum over a NON-TOTAL order is not: two docs sharing an order key
    // (crawl timestamp, say) get partitioning-dependent start offsets —
    // a backfilled shard would reassemble different bins than the
    // original run. Pass tieBreak columns whenever `order` alone is not
    // unique within a shard (a unique doc id is the natural choice).
    val w = Window.partitionBy(shard).orderBy(order +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    floor((sum(tokens).over(w) - tokens) / budget)
  }

  /** Deterministic global shuffle: total order by `hashKey(key, seed)`.
    * Use as `df.orderBy(shuffleOrder(col("id"), seed))` — distributed
    * range-partitioned sort; write the result partitioned to get
    * reproducible shuffled shards. */
  def shuffleOrder(key: Column, seed: String = ""): Column =
    hashKey(key, seed)

  /** Round-robin shard assignment by key hash prefix — 65536 buckets folded
    * into `nShards`. Deterministic, portable, and balanced for any key set
    * (unlike `key % n`, which inherits key skew). Four hex chars bound the
    * fold imbalance at ≤ 0.4% for nShards ≤ 256 and ≤ ~6% at the 4096 cap —
    * with only 256 buckets, nShards near 200 gave some shards 2× the data. */
  def shardOf(key: Column, nShards: Int, seed: String = ""): Column = {
    require(nShards > 0 && nShards <= 4096, "nShards in [1,4096]")
    pmod(conv(substring(hashKey(key, seed), 1, 4), 16, 10).cast("int"),
      lit(nShards))
  }

  /** Per-shard manifest of a packed corpus: doc/token counts per (shard,
    * bin) — the summary a training job reads to plan epochs. */
  def packManifest(df: DataFrame, tokens: Column, shard: Column,
      order: Column, budget: Long, tieBreak: Seq[Column] = Nil): DataFrame =
    df.withColumn("bin", packBins(tokens, shard, order, budget, tieBreak))
      .groupBy(shard.as("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).as("n_tokens"))
}

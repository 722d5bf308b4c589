package graft.wrangling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document SUBSTRING-level dedup — the Lee et al. "Deduplicating
  * Training Data Makes Language Models Better" capability: find long
  * duplicated token SPANS shared across documents, not just whole-document
  * near-duplicates (which [[Dedup]]'s MinHash/SimHash paths cover). A
  * boilerplate footer or a quoted paragraph duplicated across thousands of
  * pages survives doc-level dedup entirely; span dedup is what removes it
  * from a pretraining corpus.
  *
  * Scale design (the suffix-array algorithm of the paper restated as
  * DataFrame blocking): every window of `spanTokens` consecutive tokens is
  * hashed (md5 — engine-portable, so the DuckDB oracle replays the
  * pipeline bit-for-bit); windows equi-join on the hash — BANDED, never
  * all-pairs: non-duplicate windows essentially never collide, so the join
  * fan-out tracks the true duplicate mass, not corpus². Adjacent hits on
  * the same (pair, alignment) diagonal merge into maximal spans with one
  * window + groupBy — a run of n consecutive matching windows is a
  * duplicated span of n + spanTokens − 1 tokens.
  *
  * The one adversarial shape is a HOT shingle (site-wide boilerplate
  * shorter than a doc but present in millions): its bucket join is
  * quadratic in document frequency. `maxDocFreq` is the explicit valve —
  * windows seen in more than that many documents are dropped LOUDLY (the
  * spans they'd anchor are bounded-df by construction; the paper's suffix
  * automaton has the same practical cap). Default off: no silent coverage
  * loss.
  */
object SpanDedup {

  /** One row per (doc, window start): the md5 of the space-joined
    * `spanTokens`-token window. Tokens are [[TextOps.tokens]] (whitespace
    * runs, empties dropped) — space-joining is collision-free because
    * tokens contain no whitespace. Documents shorter than one window emit
    * nothing. Positions are 0-based token offsets. */
  def spanShingles(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    require(spanTokens >= 2,
      s"spanShingles: spanTokens must be >= 2, got $spanTokens")
    val w = spanTokens
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= w)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), size(col("__tk")) - w),
          i => md5(concat_ws(" ", slice(col("__tk"), i + 1, lit(w)))))))
      .select(col(idCol), col("pos").as("__pos"), col("col").as("__h"))
  }

  /** Maximal duplicated spans of at least `spanTokens` tokens across
    * document pairs: `(id_a, id_b, start_a, start_b, span_len)` with
    * `id_a < id_b`, starts 0-based in token offsets, one row per maximal
    * run. A window repeated at several positions yields one span per
    * alignment diagonal — each occurrence pair is reported, as the
    * excision stage needs every copy's coordinates. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 50, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh0 = spanShingles(docs, idCol, textCol, spanTokens)
    val sh1 = if (maxDocFreq == Long.MaxValue) sh0 else {
      require(maxDocFreq >= 2,
        s"duplicateSpans: maxDocFreq must be >= 2 (a span needs two docs), got $maxDocFreq")
      // the hot-shingle valve: document frequency per window hash, windows
      // above the cap dropped BEFORE the self-join (the join's fan-out per
      // hash is df², so the cap bounds the worst bucket explicitly). The
      // valve reads the shingle frame TWICE (the df counts and the probe
      // side), so it is frozen first — tokenize + window + md5 is the
      // dominant per-row cost and would otherwise derive twice
      val base = sh0.localCheckpoint(true)
      val ok = base.groupBy(col("__h"))
        .agg(countDistinct(col(idCol)).as("__df"))
        .filter(col("__df") <= maxDocFreq)
        .select(col("__h"))
      base.join(ok, "__h")
    }
    // materialized before the self-join: both sides reference it and Spark
    // shares no subplans across branches — left lazy, the tokenize + window
    // + md5 derivation would run twice over the corpus. At 100 TB this is
    // a persisted/bucketed shingle table (hash, doc, pos — ~45 bytes/row)
    // co-located on __h so the candidate join is shuffle-free.
    val sh = sh1.localCheckpoint(true)
    val a = sh.select(col(idCol).as("id_a"), col("__pos").as("pos_a"), col("__h"))
    val b = sh.select(col(idCol).as("id_b"), col("__pos").as("pos_b"), col("__h"))
    val hits = a.join(b, Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        (col("pos_a") - col("pos_b")).as("__diag"))
    // adjacent windows on the same alignment diagonal are one span:
    // within (pair, diag) each pos_a appears once, so pos_a − row_number
    // is constant exactly along a consecutive run (the groupConsecutive
    // islands trick; partitions are per doc-pair — no global sort)
    val win = Window.partitionBy(col("id_a"), col("id_b"), col("__diag"))
      .orderBy(col("pos_a"))
    hits.withColumn("__grp", col("pos_a") - row_number().over(win))
      .groupBy(col("id_a"), col("id_b"), col("__diag"), col("__grp"))
      .agg(min(col("pos_a")).as("start_a"), count(lit(1)).as("__n"))
      .select(col("id_a"), col("id_b"), col("start_a"),
        (col("start_a") - col("__diag")).as("start_b"),
        (col("__n") + spanTokens - 1).as("span_len"))
  }

  /** Per-document duplicated-token coverage on the HIGHER-id side of each
    * span (the prunable copy — the lower-id occurrence is the keeper, same
    * min-id-wins convention as [[Dedup.exactDedup]]): fraction of the
    * doc's tokens covered by the UNION of its incoming span intervals
    * (overlapping spans from different partners are not double-counted —
    * classic interval-union sweep as two windows + a groupBy, partitioned
    * per doc). Docs with no incoming span are absent (coverage 0). */
  def spanCoverage(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val islands = mergedIntervals(spans, idCol)
      .groupBy(col(idCol))
      .agg(sum(col("__ie") - col("__is")).as("__covered"))
    docs.select(col(idCol), size(TextOps.tokens(col(textCol))).as("__ntok"))
      .join(islands, idCol)
      .select(col(idCol), col("__covered").as("covered_tokens"),
        col("__ntok").as("doc_tokens"),
        (col("__covered") / nullif(col("__ntok").cast("double"), lit(0.0)))
          .as("covered_frac"))
  }

  /** Union of each doc's incoming span intervals on the id_b side:
    * `(idCol, __is, __ie)` — disjoint merged [start, end) token ranges.
    * The classic interval sweep as two windows + a groupBy, partitioned
    * per doc (no global sort): a row opens a new island when its start
    * clears every earlier end; the island id is the running count of
    * openers. */
  private def mergedIntervals(spans: DataFrame, idCol: String): DataFrame = {
    val iv = spans.select(col("id_b").as(idCol), col("start_b").as("__s"),
      (col("start_b") + col("span_len")).as("__e"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__s"), col("__e"))
    val prevMaxEnd = max(col("__e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    iv.withColumn("__new",
        when(prevMaxEnd.isNull || col("__s") > prevMaxEnd, 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(byDoc))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"))
      .select(col(idCol), col("__is"), col("__ie"))
  }

  /** The Lee et al. EXCISION step: rewrite each doc's text with the
    * tokens under its incoming duplicated spans REMOVED (the lower-id
    * occurrence keeps its copy — min-id-wins, as in [[spanCoverage]]).
    * Returns every doc with `textCol` rewritten (unchanged when no span
    * lands on it) plus `removed_tokens`. Whitespace is normalized to
    * single spaces by the rebuild — the token sequence, not the original
    * separators, is the preserved content (the tokenizer already treats
    * all whitespace runs as one).
    *
    * Scale shape: the cut list rides per doc as a collected array of
    * merged intervals (bounded by the doc's own token count), the
    * rewrite is a map-only higher-order filter over the token array —
    * no per-token shuffle, no driver loop. */
  def exciseSpans(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val cuts = mergedIntervals(spans, idCol)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__is"), col("__ie"))).as("__cuts"))
    val others = docs.columns.filterNot(c => c == idCol || c == textCol)
    docs.join(cuts, Seq(idCol), "left")
      .select(Seq(col(idCol)) ++ others.map(col) ++ Seq(
        when(col("__cuts").isNull, col(textCol)).otherwise(
          concat_ws(" ", filter(TextOps.tokens(col(textCol)),
            (t, i) => !exists(col("__cuts"),
              c => i >= c.getField("__is") && i < c.getField("__ie")))))
          .as(textCol),
        coalesce(aggregate(col("__cuts"), lit(0L),
          (acc, c) => acc + (c.getField("__ie") - c.getField("__is"))),
          lit(0L)).as("removed_tokens")): _*)
  }
}

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
  * windows seen in more than that many documents are dropped LOUDLY: every
  * valved run logs (and, via [[duplicateSpansReported]], RETURNS) the
  * dropped hash / window-occurrence counts, and [[hotWindows]] lists the
  * offending hashes queryably. The spans a kept window anchors are
  * bounded-df by construction; the paper's suffix automaton has the same
  * practical cap. [[duplicateSpans]]' own default is off (the oracle
  * fixtures pin exact span sets), but the PACKAGED pipeline
  * ([[Dedup.corpusDedup]]) arms the valve at [[DefaultSpanMaxDocFreq]]:
  * a site-wide footer in millions of pages is a certainty in a web
  * corpus, and one hot md5 at df = 10⁶ is 10¹² join rows.
  */
object SpanDedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Default hot-shingle cap for the PACKAGED pipeline
    * ([[Dedup.corpusDedup]]'s span stage): a window shared verbatim by
    * more than 1000 documents is boilerplate under any corpus size — its
    * spans carry no pair-level signal (the coverage stage only needs the
    * fact that boilerplate text is duplicated, which df ≤ 1000 partners
    * already witness 1000-fold), while its join fan-out (df²) is the one
    * super-linear term in the pipeline. The bound is ABSOLUTE, not
    * relative to corpus size, because the cost it caps is absolute:
    * ≤ 10⁶ hit rows per hash regardless of corpus scale. */
  val DefaultSpanMaxDocFreq: Long = 1000L

  /** What the hot-shingle valve dropped in one [[duplicateSpansReported]]
    * run: window hashes over the cap and their total window occurrences
    * (the coverage mass the cap excluded). */
  final case class ValveReport(maxDocFreq: Long, droppedHashes: Long,
      droppedWindows: Long)

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
    * excision stage needs every copy's coordinates.
    * [[duplicateSpansReported]] with the report discarded. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 50, maxDocFreq: Long = Long.MaxValue): DataFrame =
    duplicateSpansReported(docs, idCol, textCol, spanTokens, maxDocFreq)._1

  /** [[duplicateSpans]] plus the valve's [[ValveReport]] (`Some` iff the
    * valve is armed, i.e. `maxDocFreq < Long.MaxValue`): how many window
    * hashes exceeded the cap and how many window occurrences they carried —
    * the coverage mass the cap excluded, surfaced instead of silently
    * vanishing. The report is available (and logged at INFO) EAGERLY but
    * adds no pass over the corpus: the one df-grouping this function runs
    * anyway now materializes the (tiny) HOT list, and the report is a
    * 1-row aggregate over that. */
  def duplicateSpansReported(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 50, maxDocFreq: Long = Long.MaxValue)
      : (DataFrame, Option[ValveReport]) = {
    val sh0 = spanShingles(docs, idCol, textCol, spanTokens)
    val (hits, report) = if (maxDocFreq == Long.MaxValue) {
      // UNVALVED path: candidate pairs via the hash self-join. The valved
      // path below groups each hash's occurrences into one array and
      // explodes pairs in place — strictly fewer passes — but with no df
      // cap an adversarial hash would concentrate its ENTIRE occurrence
      // set in a single aggregation buffer before the (equally quadratic)
      // pair fan-out even starts; the join at least streams the build of
      // that fan-out. Unvalved = caller asked for exact parity over
      // robustness, so keep the memory-streaming shape here.
      val sh = sh0.localCheckpoint(true)
      val a = sh.select(col(idCol).as("id_a"), col("__pos").as("pos_a"),
        col("__h"))
      val b = sh.select(col(idCol).as("id_b"), col("__pos").as("pos_b"),
        col("__h"))
      val h = a.join(b, Seq("__h"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
          (col("pos_a") - col("pos_b")).as("__diag"))
      (h, None)
    } else {
      require(maxDocFreq >= 2,
        s"duplicateSpans: maxDocFreq must be >= 2 (a span needs two docs), got $maxDocFreq")
      // the hot-shingle valve: document frequency per window hash, windows
      // above the cap dropped BEFORE pair generation (fan-out per hash is
      // df², so the cap bounds the worst bucket explicitly). The shingle
      // frame is read twice (the df grouping and the pair pass), so it is
      // frozen first — tokenize + window + md5 is the dominant per-row
      // cost and would otherwise derive twice. What the grouping
      // MATERIALIZES is the HOT list — the hashes over the cap, tiny BY
      // CONSTRUCTION (the valve's whole premise) — so (a) the drop report
      // reads off it for free, and (b) the keep-side becomes a broadcast
      // ANTI-join against the tiny hot set instead of an equi-join against
      // the corpus-sized keep set (strictly better at 100 TB, where the
      // kept-hash list is as big as the corpus). One groupBy pass total,
      // same as the unreported r13 form. (A separate report aggregate
      // re-grouped the table per call — 10× exponent 0.40 → 0.78; an
      // observe() CollectMetrics rode the job for free but registering an
      // Observation instantiates the session's non-serializable
      // ObservationManager and every LATER MLlib task serialization in
      // the JVM dies on it — both measured, both rejected.)
      //
      // The df ordering is load-bearing: the valve must run BEFORE the
      // grouped pair pass below, because its whole purpose is to keep a
      // df=10⁶ boilerplate hash from ever forming a 10⁶-occurrence array
      // (countDistinct's expand-based plan carries (hash, id) ROWS, never
      // arrays — safe on any df). A single fused groupBy computing both
      // the df and the occurrence arrays was considered and rejected: one
      // shuffle cheaper, but it concentrates exactly the hot-hash mass
      // the valve exists to refuse.
      val base = sh0.localCheckpoint(true)
      val hot = base.groupBy(col("__h"))
        .agg(countDistinct(col(idCol)).as("__df"), count(lit(1)).as("__wins"))
        .filter(col("__df") > maxDocFreq)
        .localCheckpoint(true)
      val r = hot.agg(count(lit(1)), coalesce(sum(col("__wins")), lit(0L)))
        .collect()(0) // 1-row scalar over the frozen (tiny) hot list
      val rep = ValveReport(maxDocFreq, r.getLong(0), r.getLong(1))
      if (rep.droppedHashes > 0)
        log.info(s"spanDedup valve(maxDocFreq=$maxDocFreq): dropped " +
          s"${rep.droppedHashes} hot window hashes " +
          s"(${rep.droppedWindows} window occurrences) — spans anchored " +
          "only on kept windows; see SpanDedup.hotWindows for the hashes")
      // broadcast is HINTED off the exact count just measured (a
      // checkpointed frame has no size estimate, so unhinted the planner
      // falls to sort-merge): ≤ 1M hot hashes ≈ 50 MB, comfortably
      // executor-broadcastable; a pathological low cap on a shingly
      // corpus past that falls back to the shuffled anti-join
      val hotKeys = hot.select(col("__h"))
      val keep =
        if (rep.droppedHashes <= 1000000L)
          base.join(broadcast(hotKeys), Seq("__h"), "left_anti")
        else base.join(hotKeys, Seq("__h"), "left_anti")
      // candidate pairs by GROUPING, not self-joining (guide §2.4): the
      // valve-kept shingle frame groups on __h once and each bucket's
      // occurrence pairs explode IN PLACE — the exact pair set the
      // r13–r17 self-join produced (same id_a < id_b orientation, every
      // occurrence pair per alignment), with one corpus-sized shuffle
      // where the join needed two (both probe sides re-shuffle the same
      // frame at scale; locally AQE saved one by broadcast-collecting the
      // entire 235k-row shingle frame — a plan that cannot survive a
      // corpus-sized input anyway) and no second checkpoint (the join
      // read the frame twice; the groupBy reads it once). Per-bucket
      // arrays are valve-bounded: ≤ maxDocFreq docs per hash, so the
      // array is the same df-bounded mass the join's per-key build was —
      // within-doc window repetition is the shared residual of both
      // shapes and is quadratic in either.
      val h = keep.groupBy(col("__h"))
        .agg(collect_list(struct(col(idCol).as("__id"),
          col("__pos").as("__p"))).as("__occ"))
        .select(explode(flatten(transform(col("__occ"), a =>
          transform(filter(col("__occ"), b => b("__id") > a("__id")),
            b => struct(a("__id").as("id_a"), b("__id").as("id_b"),
              a("__p").as("pos_a"), b("__p").as("pos_b")))))).as("__hit"))
        .select(col("__hit.id_a").as("id_a"), col("__hit.id_b").as("id_b"),
          col("__hit.pos_a").as("pos_a"), col("__hit.pos_b").as("pos_b"),
          (col("__hit.pos_a") - col("__hit.pos_b")).as("__diag"))
      (h, Some(rep))
    }
    // adjacent windows on the same alignment diagonal are one span:
    // within (pair, diag) each pos_a appears once, so pos_a − row_number
    // is constant exactly along a consecutive run (the groupConsecutive
    // islands trick; partitions are per doc-pair — no global sort)
    val win = Window.partitionBy(col("id_a"), col("id_b"), col("__diag"))
      .orderBy(col("pos_a"))
    val spans = hits.withColumn("__grp", col("pos_a") - row_number().over(win))
      .groupBy(col("id_a"), col("id_b"), col("__diag"), col("__grp"))
      .agg(min(col("pos_a")).as("start_a"), count(lit(1)).as("__n"))
      .select(col("id_a"), col("id_b"), col("start_a"),
        (col("start_a") - col("__diag")).as("start_b"),
        (col("__n") + spanTokens - 1).as("span_len"))
    (spans, report)
  }

  /** The hot windows the valve at `maxDocFreq` drops (or would drop):
    * `(span_hash, doc_freq, window_count)`, one row per window hash whose
    * document frequency exceeds the cap — the queryable face of the
    * [[ValveReport]] counters, for auditing WHAT boilerplate a corpus run
    * excluded (the report says how much; this says which). Same
    * tokenization/window/md5 derivation as [[duplicateSpans]], so a hash
    * here is exactly a hash the valve filters there. One groupBy, no
    * self-join — safe to run unvalved on any corpus. */
  def hotWindows(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 2,
      s"hotWindows: maxDocFreq must be >= 2 (a span needs two docs), got $maxDocFreq")
    spanShingles(docs, idCol, textCol, spanTokens)
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("doc_freq"),
        count(lit(1)).as("window_count"))
      .filter(col("doc_freq") > maxDocFreq)
      .select(col("__h").as("span_hash"), col("doc_freq"), col("window_count"))
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

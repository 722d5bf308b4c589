package graft.wrangling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora (reference
  * `data_wrangling.py:220-231` generalized per the north star): exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design: every method is blocking-based — candidate pairs come from
  * equi-join buckets (hash prefix, LSH band, SimHash chunk), never a
  * cross-join. At 100 TB the bucket join is the only shuffle and it is
  * key-partitioned; exact verification runs only inside buckets.
  */
object Dedup {

  /** Exact dedup by content fingerprint: one survivor per fingerprint
    * (deterministic: min id wins). Hash-groupBy, single shuffle.
    *
    * NULL text is UNKNOWN content, not shared content: such rows bypass
    * the dedup (all kept) — grouped, every null-text doc landed in ONE
    * null-fingerprint bucket and all but the min id were silently
    * dropped, while the near-dup stages (no shingles → no signature →
    * no candidates) let the same rows survive: the pipeline
    * contradicted itself on null text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.withColumn("__fp", TextOps.fingerprint(col(textCol)))
    val survivors = keyed.filter(col("__fp").isNotNull)
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__fp")
    keyed.filter(col("__fp").isNull).drop("__fp")
      .unionByName(df.join(survivors, idCol))
  }

  /** MinHash signature: k hash permutations approximated as
    * h_i(x) = xxhash64(shingle, seed=i); signature[i] = min over shingles.
    * One explode + one groupBy — partial aggregation (min) makes the
    * shuffle tiny regardless of document size. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, shingleN: Int = 3): DataFrame = {
    val shingled = df.select(col(idCol),
      explode(TextOps.wordShingles(col(textCol), shingleN)).as("__s"))
    val mins: Seq[Column] = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("__s"))).as(s"mh_$i"))
    shingled.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** Single-pass MinHash signatures via the custom Catalyst aggregate
    * (graft.functions.MinHashAgg): 2 hash evaluations per shingle instead
    * of k, one k-long buffer instead of k aggregate columns. Returns
    * (id, sig: array<long>). */
  def minhashSignaturesFast(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, shingleN: Int = 3): DataFrame =
    df.select(col(idCol),
      explode(TextOps.wordShingles(col(textCol), shingleN)).as("__s"))
      .groupBy(col(idCol))
      .agg(graft.functions.MinHashAgg.minhash(col("__s"), numHashes).as("sig"))

  /** LSH banding over an array signature (fast-path companion). */
  def minhashCandidatesFromSig(sigs: DataFrame, idCol: String,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes,
      s"minhashCandidatesFromSig: bands ($bands) must divide numHashes " +
        s"($numHashes) — truncated banding would silently ignore the " +
        s"trailing ${numHashes - rows * bands} signature values and skew " +
        "the LSH collision S-curve away from the configured one")
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      struct(lit(b).as("band"), hash(slice(col("sig"), b * rows + 1, rows)).as("sig_h"))
    }
    val banded = sigs.select(col(idCol), explode(array(bandCols: _*)).as("__b"))
    // per-side aliases — see cosineNearDupPairs: a shared column name in a
    // self-join condition leans on the ambiguous-self-join heuristic
    val a = banded.select(col(idCol).as("id_a"), col("__b").as("__ba"))
    val b = banded.select(col(idCol).as("id_b"), col("__b").as("__bb"))
    a.join(b, col("__ba") === col("__bb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** LSH candidate pairs: signatures split into `bands`, docs sharing any
    * full band collide. Returns (id_a, id_b) with id_a < id_b, distinct.
    * The band bucket join is the classic sub-quadratic near-dup path. */
  def minhashCandidates(sigs: DataFrame, idCol: String,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes,
      s"minhashCandidates: bands ($bands) must divide numHashes ($numHashes)" +
        " — truncated banding would silently skew the LSH S-curve")
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*).as("sig"))
    }
    val banded = sigs.select(col(idCol), explode(array(bandCols: _*)).as("__b"))
    val a = banded.select(col(idCol).as("id_a"), col("__b").as("__ba"))
    val b = banded.select(col(idCol).as("id_b"), col("__b").as("__bb"))
    a.join(b, col("__ba") === col("__bb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard over word n-gram shingle sets for given pairs
    * (verification stage after LSH blocking). */
  def jaccardForPairs(df: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame = {
    val sh = df.select(col(idCol), TextOps.wordShingles(col(textCol), shingleN).as("__sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sha")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__shb")), "id_b")
      .withColumn("__inter", size(array_intersect(col("__sha"), col("__shb"))))
      // two empty shingle sets (union size 0) get jaccard null rather than
      // an ANSI DIVIDE_BY_ZERO abort; LSH candidates never produce such a
      // pair (shingle-less docs have no signature) but caller-supplied ones can
      .withColumn("jaccard",
        col("__inter").cast("double") /
          nullif((size(col("__sha")) + size(col("__shb")) - col("__inter"))
            .cast("double"), lit(0.0)))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dedup: block, verify, threshold. Uses the
    * single-pass MinHashAgg signature path (2 hashes/row vs k). */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3): DataFrame = {
    val sigs = minhashSignaturesFast(df, idCol, textCol, numHashes, shingleN)
    val cands = minhashCandidatesFromSig(sigs, idCol, numHashes, bands)
    jaccardForPairs(df, cands, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** Portable MinHash-LSH near-dedup: signatures are min-md5 hex STRINGS
    * (k salted hashes — the wr_minhash_md5_sig machinery), band buckets
    * compare the RAW concatenated band values (no engine-specific hash in
    * the path), verification is exact Jaccard. Every stage is reproducible
    * in any engine with md5, which is what lets the DuckDB oracle run the
    * identical pipeline end-to-end and hash-match the result. Same plan
    * shape as [[minhashDedupPairs]] (explode→min-agg, band equi-join,
    * verify inside blocks); that xxhash64/MinHashAgg path stays the
    * throughput variant of this algorithm. */
  /** Engine-portable LSH band keys, flat form: one (id, band, bv) row per
    * document per band, where bv is the '|'-joined md5 minhash slice —
    * the representation an INDEX can store and equi-join on (see
    * [[IncrementalDedup]]); [[minhashDedupPairsPortable]] derives its
    * self-join from the same rows, so batch and incremental paths share
    * one banding definition. */
  def portableBands(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 8, shingleN: Int = 1): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    val shingled = df.select(col(idCol),
      explode(TextOps.wordShingles(col(textCol), shingleN)).as("__s"))
    val mins: Seq[Column] = (0 until numHashes).map(i =>
      min(md5(concat(lit(s"s$i:"), col("__s")).cast("binary"))).as(s"mh_$i"))
    val sigs = shingled.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*)
          .as("bv"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("band"), col("__b.bv").as("bv"))
  }

  def minhashDedupPairsPortable(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 16, bands: Int = 8,
      shingleN: Int = 1): DataFrame = {
    val banded = portableBands(df, idCol, textCol, numHashes, bands, shingleN)
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bv"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bv"))
    val cands = a.join(b, Seq("band", "bv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    jaccardForPairs(df, cands, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** Exact all-pairs n-gram Jaccard via shingle inverted index (shingle
    * equi-join, not cross-join): correct baseline the LSH path approximates.
    * Pairs sharing zero shingles never materialize. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      explode(TextOps.wordShingles(col(textCol), shingleN)).as("__s"))
    val sizes = sh.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val inter = sh.select(col("__id").as("id_a"), col("__s"))
      .join(sh.select(col("__id").as("id_b"), col("__s")), "__s")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__i"))
    inter
      .join(sizes.select(col("__id").as("id_a"), col("__n").as("__na")), "id_a")
      .join(sizes.select(col("__id").as("id_b"), col("__n").as("__nb")), "id_b")
      .withColumn("jaccard",
        col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash-64: per word, xxhash64 → 64 bit votes weighted ±1; fingerprint
    * bit i set iff the vote sum is positive. Near-dups = small Hamming
    * distance; blocking by 16-bit chunks guarantees recall for distance ≤ 3
    * (pigeonhole over 4 chunks). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val bitVotes: Seq[Column] = (0 until 64).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b_$i")
    }
    val votes = words.groupBy(col(idCol)).agg(bitVotes.head, bitVotes.tail: _*)
    val fp = (0 until 64).map(i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    votes.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash candidate pairs with Hamming distance ≤ maxDist, blocked by
    * 8-bit chunks: 64 bits split into 8 chunks, so by pigeonhole any pair
    * within Hamming distance ≤ 7 differs in at most 7 chunks and therefore
    * SHARES at least one chunk — 100% recall guaranteed for maxDist ≤ 7.
    * Larger maxDist would silently lose pairs, so it is rejected rather
    * than approximated. (Finer chunks = stronger guarantee but more bucket
    * collisions; 8×8 is the sweet spot for near-dup distances ≤ 7.) */
  def simhashPairs(fps: DataFrame, idCol: String, maxDist: Int = 7): DataFrame = {
    require(maxDist <= 7,
      s"simhashPairs: 8-chunk blocking guarantees recall only for maxDist <= 7, got $maxDist")
    val chunks = fps.select(col(idCol), col("simhash"),
      explode(array((0 until 8).map(i =>
        struct(lit(i).as("ci"),
          shiftright(col("simhash"), i * 8).bitwiseAND(lit(0xffL)).as("cv"))): _*))
        .as("__c"))
    val a = chunks.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("__c").as("__ca"))
    val b = chunks.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("__c").as("__cb"))
    a.join(b, col("__ca") === col("__cb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Portable SimHash-64: the vote for bit i of a token comes from bit
    * (i%4) of hex digit (i/4) of md5(token) — engine-portable bit math, so
    * the DuckDB oracle recomputes identical fingerprints. The fingerprint
    * is a 64-char '0'/'1' string (bit 0 first): chunkable by substring,
    * hamming by per-char compare — no 64-bit unsigned arithmetic needed in
    * either engine. Votes are term-frequency weighted (duplicate tokens
    * vote repeatedly), matching [[simhash]]. */
  def simhashPortable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the 16 hex digits are extracted ONCE per token into an array; the 64
    // vote aggregates then read element_at — not 64 repeated md5/conv chains
    val words = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("__w"))
      .withColumn("__d", md5(col("__w").cast("binary")))
      .withColumn("__digits", transform(sequence(lit(1), lit(16)),
        p => conv(substring(col("__d"), p, lit(1)), 16, 10).cast("int")))
    // per-bit SET counts (plain arithmetic, no conditional) + one token
    // count; the ±1 vote is recovered as 2*set - n, so bit i of the
    // fingerprint is simply 2*s_i > n — a materially smaller aggregate
    // expression tree than 64 when(±1) sums (this query's cost is
    // planning/codegen of the tree, not the 16k-token execution)
    val bitCounts: Seq[Column] = (0 until 64).map { i =>
      val digit = element_at(col("__digits"), i / 4 + 1)
      sum(shiftright(digit, i % 4).bitwiseAND(lit(1))).as(s"s_$i")
    } :+ count(lit(1)).as("__n")
    val votes = words.groupBy(col(idCol)).agg(bitCounts.head, bitCounts.tail: _*)
    val fp = concat((0 until 64).map(i =>
      when(col(s"s_$i") * 2 > col("__n"), lit("1")).otherwise(lit("0"))): _*)
    votes.select(col(idCol), fp.as("simhash_bits"))
  }

  /** Candidate pairs over portable bitstring fingerprints — same 8-chunk
    * pigeonhole blocking and recall guarantee as [[simhashPairs]], with
    * chunks as substrings and hamming as a per-char compare. */
  def simhashPairsPortable(fps: DataFrame, idCol: String,
      maxDist: Int = 7): DataFrame = {
    require(maxDist <= 7,
      s"simhashPairsPortable: 8-chunk blocking guarantees recall only for maxDist <= 7, got $maxDist")
    // pack the 64-char bitstring into two 32-bit longs ONCE per fingerprint
    // (not per candidate pair): hamming then costs two xor+bit_count terms
    // per pair instead of a 64-term per-char compare — the same hamming
    // value with a ~30x smaller expression tree (the old one dominated this
    // query's cost through per-run planning/codegen, not execution). The
    // DuckDB mirror keeps the explicit per-char sum — equal values, and the
    // oracle's job is clarity, not speed.
    val packed = fps.select(col(idCol), col("simhash_bits"),
      conv(substring(col("simhash_bits"), 1, 32), 2, 10).cast("long").as("__h1"),
      conv(substring(col("simhash_bits"), 33, 32), 2, 10).cast("long").as("__h2"))
    val chunks = packed.select(col(idCol), col("__h1"), col("__h2"),
      explode(array((0 until 8).map(i =>
        struct(lit(i).as("ci"),
          substring(col("simhash_bits"), i * 8 + 1, 8).as("cv"))): _*))
        .as("__c"))
    val a = chunks.select(col(idCol).as("id_a"),
      col("__h1").as("a1"), col("__h2").as("a2"), col("__c").as("__ca"))
    val b = chunks.select(col(idCol).as("id_b"),
      col("__h1").as("b1"), col("__h2").as("b2"), col("__c").as("__cb"))
    val hamming =
      bit_count(col("a1").bitwiseXOR(col("b1"))) +
        bit_count(col("a2").bitwiseXOR(col("b2")))
    // hamming BEFORE the distinct: cheaper than shuffling two fingerprints
    // through the distinct (measured both ways at sf0.1)
    a.join(b, col("__ca") === col("__cb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** The packaged corpus-dedup pipeline — what a training-data run actually
    * executes, composed from the verified stages: (1) optional URL
    * canonicalization dedup (same canonical URL ⇒ same page), (2) exact
    * content dedup on the normalized fingerprint, (3) MinHash-LSH near-dup
    * pairs clustered by connected components, min-id survivor per cluster.
    * Returns the surviving rows of `df`. Each stage only shrinks the
    * input, so stage order is also the cost order at 100 TB: the cheap
    * exact passes cut the corpus before the LSH machinery runs.
    *
    * The optional span stage runs with the hot-shingle valve ARMED by
    * default ([[SpanDedup.DefaultSpanMaxDocFreq]] = 1000): in a web-scale
    * corpus a site-wide footer present in millions of pages is a
    * certainty, and one hot window hash at df = 10⁶ is 10¹² self-join
    * rows — the packaged pipeline must not have that cliff in its default
    * path. The drop is loud, not silent (logged + auditable via
    * [[SpanDedup.hotWindows]]); pass `spanMaxDocFreq = Long.MaxValue` to
    * disarm when exact span parity matters more than the bound.
    *
    * `portable = true` swaps the near-dup stage to the md5-based
    * [[minhashDedupPairsPortable]] (numHashes/bands/shingleN apply to it
    * unchanged) so an independent engine with md5 can replay the WHOLE
    * composition bit-for-bit — the wr_corpus_dedup oracle does; the
    * default xxhash64/MinHashAgg path stays the throughput variant. */
  def corpusDedup(df: DataFrame, idCol: String, textCol: String,
      urlCol: Option[String] = None, threshold: Double = 0.8,
      numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3,
      spanTokens: Option[Int] = None,
      spanMaxDocFreq: Long = SpanDedup.DefaultSpanMaxDocFreq,
      spanCoverageDrop: Double = 0.5, portable: Boolean = false): DataFrame = {
    // the clustering stage (GraphX CC) needs long vertex ids; a string id
    // column would hit the long cast below — an ANSI CAST_INVALID_INPUT
    // abort mid-pipeline (or, ANSI off, silent nulls and a wrong survivor
    // set). Reject up front with a usable message instead.
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"corpusDedup: id column '$idCol' is $other; the connected-components " +
          "clustering stage requires an integral id — map string ids to a " +
          "surrogate (e.g. monotonically_increasing_id or xxhash64 with a " +
          "collision check) before calling")
    }
    val byUrl = urlCol.fold(df) { u =>
      // NULL urls bypass the stage (kept): normalizeUrl(null) is null, and
      // grouping them put every url-less doc in ONE bucket — all but the
      // min id silently dropped for not having a url. A non-matching
      // (schemeless) url is NOT null — normalizeUrl passes it through raw,
      // so such docs dedup only against byte-identical urls.
      val keyed = df.withColumn("__cu", TextOps.normalizeUrl(col(u)))
      val survivors = keyed.filter(col("__cu").isNotNull)
        .groupBy(col("__cu")).agg(min(col(idCol)).as(idCol))
        .drop("__cu")
      keyed.filter(col("__cu").isNull).drop("__cu")
        .unionByName(df.join(survivors, idCol))
    }
    val exact = exactDedup(byUrl, idCol, textCol)
    val pairs = (if (portable)
        minhashDedupPairsPortable(exact, idCol, textCol, threshold,
          numHashes, bands, shingleN)
      else
        minhashDedupPairs(exact, idCol, textCol, threshold,
          numHashes, bands, shingleN))
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
    val clusters = graft.analytics.GraphAlgos.dedupClusters(pairs)
    val drop = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").cast("long").as(idCol))
    val kept = exact.join(drop, Seq(idCol), "left_anti")
    // optional SUBSTRING-level stage (Lee et al.): among the doc-level
    // survivors, drop docs whose token mass is mostly cross-document
    // duplicated spans — boilerplate-heavy pages that doc-level MinHash
    // misses because the rest of the page differs. Single pass, higher-id
    // copy is the prunable side (min-id-wins, consistent with exactDedup).
    spanTokens.fold(kept) { w =>
      // materialize the doc-level survivors ONCE for the span stage: three
      // consumers (span discovery, coverage, the final anti-join) would
      // each re-run the whole upstream pipeline — CC included — and the
      // fresh-LogicalRDD re-wrap strips the checkpoint's CLAIMED
      // partitioning, which survives self-join deduplication with
      // rewritten attribute ids and can suppress a required exchange
      // (observed as a codegen'd SMJ zipping 8- vs 4-partition inputs
      // under AQE-off planning; AQE's runtime re-plan masked it).
      // Storage regime: the materialized frame is the full text-bearing
      // survivor corpus. With a configured checkpoint dir (cluster mode)
      // use a RELIABLE checkpoint — survivor-corpus-sized data pinned in
      // non-replicated executor-local blocks would make the job
      // unrecoverable on executor loss at web scale. Without one
      // (single-box / bench) localCheckpoint is the right tradeoff:
      // executor-local blocks, no extra I/O hop, loss just fails the job
      // on a box where executor == driver anyway. Deployments that
      // configure a checkpoint dir MUST also set
      // spark.cleaner.referenceTracking.cleanCheckpoints=true
      // (GraftSession does): Spark never deletes reliable checkpoints by
      // default, so each corpusDedup call would otherwise leak one
      // survivor-corpus-sized tree in the checkpoint dir forever.
      val ck =
        if (kept.sparkSession.sparkContext.getCheckpointDir.isDefined)
          kept.checkpoint(true)
        else kept.localCheckpoint(true)
      val k = ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
      val spans = SpanDedup.duplicateSpans(k, idCol, textCol, w, spanMaxDocFreq)
      val heavy = SpanDedup.spanCoverage(k, idCol, textCol, spans)
        .filter(col("covered_frac") >= spanCoverageDrop)
        .select(col(idCol))
      k.join(heavy, Seq(idCol), "left_anti")
    }
  }
}

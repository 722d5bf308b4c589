package graft.wrangling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star superset over the reference's data_wrangling.py): token
  * counting, quality scoring, language-ID, fingerprinting.
  *
  * Everything here is pure `Column` expressions over
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs, so the whole
  * pipeline stays inside WholeStageCodegen and scales linearly with
  * executors (map-only; the only shuffles are caller-chosen aggregations).
  */
object TextOps {

  /** Whitespace tokenization: split on whitespace RUNS and drop empty
    * tokens, so leading/trailing/consecutive whitespace (tabs, newlines)
    * never yields phantom "" tokens. The DuckDB oracle mirrors this exactly
    * (Wrangling.sqlWithToks) — token-set parity holds for arbitrary
    * whitespace, not just single-spaced text. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + punctuation marks + digit
    * groups counted as separate tokens (a cheap deterministic proxy for a
    * real tokenizer's token count). */
  def tokenCountBpeIsh(text: Column): Column =
    // the GUARDED tokenizer: a raw size(split(...)) counted the phantom
    // "" token leading whitespace produces (and 1 for empty text)
    tokenCount(text) +
      length(regexp_replace(text, "[^.,;:!?()\\[\\]{}\"']", "")) +
      size(filter(split(regexp_replace(text, "[^0-9 ]", ""), " "),
        w => length(w) > lit(0)))

  /** Mean word length over the token array (whitespace-shape-independent:
    * computed from the tokens themselves, not from a chars-minus-spaces
    * identity that only holds for single-spaced text). Empty/whitespace-only
    * documents score 0.0 — the denominators are nullif-guarded because the
    * session runs ANSI mode, where a bare /0 aborts the whole corpus job on
    * the first degenerate row (and real web corpora always carry some). */
  def avgWordLen(text: Column): Column =
    coalesce(
      aggregate(tokens(text), lit(0L), (acc, w) => acc + length(w))
        .cast("double") / nullif(tokenCount(text).cast("double"), lit(0.0)),
      lit(0.0))

  /** Fraction of characters that are punctuation (0.0 for empty text). */
  def punctRatio(text: Column): Column =
    coalesce(
      length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") /
        nullif(length(text).cast("double"), lit(0.0)),
      lit(0.0))

  /** Fraction of tokens that are stopwords (caller supplies the set;
    * 0.0 for token-less text). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    coalesce(
      size(filter(tokens(text), w => w.isInCollection(stopwords)))
        .cast("double") / nullif(tokenCount(text).cast("double"), lit(0.0)),
      lit(0.0))

  /** Composite quality score in [0,1]: favors mid-length documents with low
    * punctuation density and a sane stopword ratio — the shape of heuristic
    * quality filters used for LLM corpus cleaning. Deterministic formula
    * (mirrorable in SQL for the oracle). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(text) * lit(5.0), lit(1.0))
    val stopOk = least(stopwordRatio(text, stopwords) * lit(5.0), lit(1.0))
    round((lenScore + punctOk + stopOk) / lit(3.0), 6)
  }

  /** Language-ID by n-gram/stopword heuristic: score each candidate
    * language by (a) marker-stopword hits and (b) Unicode-script hits
    * (CJK for zh), predict the argmax with a deterministic tie order.
    * Pure expression — no dictionary lookup, no UDF. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "es", "y"),
    "fr" -> Seq("le", "la", "les", "est", "et", "une"),
    "zh" -> Seq()) // zh scored by script, not stopwords

  def langScore(text: Column, lang: String): Column =
    if (lang == "zh")
      // CJK unified ideograph count; the expensive character-class replace
      // is gated behind a cheap containment test (an rlike scan bails at
      // the first hit/miss vs rewriting the whole string) — identical
      // score, big constant-factor win on non-CJK corpora
      when(text.rlike("[\\x{4e00}-\\x{9fff}]"),
        length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")))
        .otherwise(lit(0)).cast("double")
    else
      size(filter(tokens(lower(text)),
        w => w.isInCollection(langMarkers(lang)))).cast("double")

  /** Predicted language; ties resolve in fixed order en,de,es,fr,zh.
    *
    * Argmax via ONE array_max over struct(score, -index, lang): struct
    * ordering compares score first, then the negated index — so ties go to
    * the earliest language, and each langScore subexpression appears
    * exactly once. (The previous when-chain fold nested each accumulated
    * comparison inside the next, duplicating every score expression per
    * fold level — an O(langs²) expression tree that bloated codegen.) */
  def langId(text: Column): Column = {
    val order = Seq("en", "de", "es", "fr", "zh")
    val scored = order.zipWithIndex.map { case (l, i) =>
      struct(langScore(text, l).as("s"), lit(-i).as("p"), lit(l).as("l")) }
    // NULL text is NULL, not "zh": the stopword scores go null on null
    // input while zh's rlike-count branch yields 0, and struct ordering
    // ranks nulls lowest — argmax silently labeled every null row Chinese
    when(text.isNull, lit(null).cast("string"))
      .otherwise(array_max(array(scored: _*)).getField("l"))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key (content addressing, reference value_hash
    * impl.py:8808 restated with a standard hash). */
  def fingerprint(text: Column): Column =
    md5(normalize(text).cast("binary"))

  /** Corpus TF-IDF with per-document top-k terms — the classic IR /
    * feature-extraction primitive over a training corpus (tf·ln(N/df)).
    * Scale shape: one explode, two keyed aggregations (term frequency per
    * doc, then document frequency per term — both partial-aggregable), the
    * corpus size N enters as a ONE-ROW broadcast (never a driver constant
    * folded into the plan). Counting N is one extra pass over the raw
    * docs source — deliberate: deriving it from the cached tf side would
    * miss zero-token documents, and the count scan is cheap next to the
    * tokenize+shuffle the persist exists to dedup. Top-k is a per-doc
    * row_number window — keyed by doc_id, so no global sort and no skew
    * (a document's term set is bounded). tfidf is rounded BEFORE the
    * window order so cross-engine float ulps can't flip tie order; exact
    * ties break on the term itself. */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val cnt = org.apache.spark.sql.functions.count(lit(1))
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    // persisted (tracked transient): both the document-frequency branch
    // and the score join read tf — without the freeze the corpus is
    // tokenized and shuffled TWICE (the join's other side re-derives the
    // same aggregate from the scan)
    val tf = graft.core.TransientCaches.trackTable(
      toks.groupBy(col("doc_id"), col("term")).agg(cnt.as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = tf.groupBy(col("term")).agg(cnt.as("df"))
    val n = docs.agg(cnt.as("__n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("__n").cast("double") / col("df")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Rolling polynomial hash over the token stream (document
    * fingerprinting with locality: equal prefixes → equal prefix hashes).
    * aggregate() left-fold is order-preserving and codegen'd. The fold is
    * MODULAR (mod 1e9+7 each step, so acc*31 + h stays far from Long
    * range): the unguarded acc*31 overflowed after ~10 tokens, and the
    * session's ANSI mode turns long overflow into a job-aborting
    * SparkArithmeticException — every real document threw. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => pmod(acc * lit(31L) + pmod(xxhash64(w), lit(1000003L)),
        lit(1000000007L)))

  /** Word n-gram shingles (distinct) — the unit of Jaccard similarity.
    * A document with fewer than n tokens has NO n-gram shingles: the empty
    * array (matching DuckDB's range(0, len-n+1), which is empty for
    * negative stops). Unguarded, sequence(0, size-n) would produce a
    * DESCENDING [0,-1,...] whose element_at(0) throws under ANSI mode —
    * one 2-token doc would abort every minhash/Jaccard job over the corpus. */
  def wordShingles(text: Column, n: Int): Column =
    if (n == 1) array_distinct(tokens(text))
    else {
      val ws = tokens(text)
      when(size(ws) < n, array().cast("array<string>")).otherwise(
        array_distinct(transform(
          sequence(lit(0), size(ws) - lit(n)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + lit(j + 1))): _*))))
    }

  /** Character n-gram shingles (distinct). One regex pass — a zero-width
    * lookahead captures the n chars at every position — instead of a
    * higher-order `transform` of per-position `substr` calls: HOF lambdas
    * evaluate interpreted and `substr` re-scans the string from the start
    * each call (O(len²) per document), which made this the hottest
    * expression in classifier featurization by an order of magnitude. */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(regexp_extract_all(text, lit(s"(?s)(?=(.{$n}))"), lit(1)))

  // ------------------------------------------------------------------
  // Repetition filters (the Gopher/C4 quality-rule shapes)
  // ------------------------------------------------------------------
  /** Word n-gram shingles KEEPING duplicates — the unit of repetition
    * metrics (contrast [[wordShingles]], which distincts for Jaccard). */
  def wordShinglesAll(text: Column, n: Int): Column =
    if (n == 1) tokens(text)
    else {
      val ws = tokens(text)
      // same <n-token guard as wordShingles (ANSI-mode element_at throw)
      when(size(ws) < n, array().cast("array<string>")).otherwise(
        transform(
          sequence(lit(0), size(ws) - lit(n)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + lit(j + 1))): _*)))
    }

  /** Fraction of non-empty LINES that repeat an earlier line of the same
    * document (Gopher's duplicate-line-fraction rule). Per-document array
    * math — map-only, no shuffle. */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(l) > lit(0))
    when(size(lines) === 0, lit(0.0)).otherwise(
      (size(lines) - size(array_distinct(lines))).cast("double") /
        size(lines).cast("double"))
  }

  /** Fraction of the document's n-gram occurrences claimed by its single
    * most frequent n-gram (the C4/Gopher top-n-gram-fraction rule; high
    * values mean templated/repeated text). Quadratic in DISTINCT grams per
    * document — fine for documents, still map-only. */
  def topNgramFraction(text: Column, n: Int): Column = {
    val grams = wordShinglesAll(text, n)
    val top = aggregate(array_distinct(grams), lit(0),
      (acc, g) => greatest(acc, size(filter(grams, x => x === g))))
    when(size(grams) <= 0, lit(0.0))
      .otherwise(top.cast("double") / size(grams).cast("double"))
  }

  // ------------------------------------------------------------------
  // Unicode hygiene (the C4/CCNet text-normalization pass)
  // ------------------------------------------------------------------
  /** Unicode NFC normalization — UDF at the edge (java.text.Normalizer;
    * Spark has no native expression for it). Same canonical form DuckDB's
    * nfc_normalize produces, which is what lets the oracle hash-check it. */
  val normalizeNfc: Column => Column = {
    val f = udf((s: String) => if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    c => f(c)
  }

  /** NFKC — compatibility form (folds ligatures, full-width forms…);
    * the aggressive variant used before tokenization. */
  val normalizeNfkc: Column => Column = {
    val f = udf((s: String) => if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC))
    c => f(c)
  }

  /** Mojibake repair for the classic UTF-8-decoded-as-Latin-1 corruption
    * ("cafÃ©" → "café"): re-encode as Latin-1 and re-decode as strict
    * UTF-8; applied only when that decode SUCCEEDS — correctly-decoded
    * text contains byte sequences that are not valid UTF-8 after the
    * Latin-1 round-trip and stays untouched. Heuristic by nature (like
    * ftfy): a string that legitimately spells valid-UTF-8 byte pairs
    * converts; vanishingly rare in natural text. */
  val fixMojibake: Column => Column = {
    val f = udf((s: String) => if (s == null) null else {
      // ONLY losslessly Latin-1-encodable strings round-trip: getBytes
      // (ISO_8859_1) silently maps every char above U+00FF to '?', which
      // IS valid UTF-8 — the decode-succeeds guard passed and CJK /
      // Cyrillic / Greek / emoji text came back as '?' runs (silent,
      // irreversible destruction of every non-Latin document). Genuine
      // UTF-8-read-as-Latin-1 mojibake is <= U+00FF by construction.
      if (!s.forall(_ <= '\u00ff')) s
      else {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
        catch { case _: java.nio.charset.CharacterCodingException => s }
      }
    })
    c => f(c)
  }

  // ------------------------------------------------------------------
  // URL canonicalization (the web-corpus URL-dedup key)
  // ------------------------------------------------------------------
  /** Canonical URL form: scheme+host lowercased, leading `www.` dropped,
    * default port dropped (`:80` http / `:443` https), fragment dropped,
    * tracking params (`utm_*`, `fbclid`) stripped with `?`/`&` repair,
    * trailing slash and dangling `?`/`&` removed. Pure codegen'd
    * regexp/Column chain — no UDF — and every pattern is RE2-compatible so
    * a DuckDB oracle reproduces it byte-exactly. Non-URL strings (no
    * `scheme://`) pass through unchanged. */
  def normalizeUrl(u: Column): Column = {
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val hostPort = lower(regexp_extract(u, schemeRe + "([^/?#]*)", 2))
    // rest of the URL up to the fragment (fragment dropped here)
    val rest0 = regexp_extract(u, schemeRe + "[^/?#]*([^#]*)", 2)
    val host = {
      val noWww = regexp_replace(hostPort, "^www\\.", "")
      when(scheme === "http", regexp_replace(noWww, ":80$", ""))
        .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
        .otherwise(noWww)
    }
    val rest = {
      // path and query handled SEPARATELY: a blanket "promote the first &
      // to ?" repair corrupts URLs whose path legitimately contains '&'
      // before any '?' ("/a&b" is legal per RFC 3986). Trailing path slash
      // folds; tracking params strip from the query alone, a now-leading
      // '&' trims, and an emptied query drops its '?'.
      val path = regexp_replace(regexp_extract(rest0, "^([^?]*)", 1), "/$", "")
      val query = regexp_replace(
        regexp_replace(
          regexp_replace(regexp_extract(rest0, "^[^?]*\\?(.*)$", 1),
            "(^|&)(utm_[A-Za-z]*|fbclid)=[^&]*", ""),
          "^&+", ""),
        "&+$", "")
      concat(path, when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    }
    when(scheme === "", u).otherwise(concat(scheme, lit("://"), host, rest))
  }

  // ------------------------------------------------------------------
  // PII scrubbing
  // ------------------------------------------------------------------
  /** Redact emails, IPv4 addresses and phone-shaped number runs with typed
    * tags — the standard pre-training scrub pass. Patterns are kept
    * RE2-compatible (no backreferences/lookaround) so an engine using RE2
    * (e.g. the DuckDB oracle) produces byte-identical output. Order
    * matters: emails first (their digits must not half-match as phones). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipPattern = "(\\d{1,3}\\.){3}\\d{1,3}"
  /** Phone shapes: an OPTIONAL 1-3 digit lead (country/area prefix) then
    * 3-3-4 — the mandatory 2-3 digit lead of the first cut never matched
    * plain NANP numbers ("555-123-4567") or "+1 ..." (one-digit country
    * code), leaving the dominant US/Canada phone shapes unredacted. */
  val phonePattern = "(\\+?\\d{1,3}[-. ])?\\d{3}[-. ]\\d{3}[-. ]\\d{4}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipPattern, "<IP>"),
      phonePattern, "<PHONE>")
}

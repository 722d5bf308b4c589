package graft.wrangling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — north-star
  * superset op. Brute-force cosine is the exact baseline; LSH (random
  * hyperplane signs) is the sub-linear scale path.
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions in
  * DOUBLE — codegen'd, no UDFs, deterministic left-to-right accumulation
  * (which is what makes the DuckDB oracle hash-match bit-for-bit).
  */
object Similarity {

  /** Dot product of two array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; an all-zero vector (padding rows, failed encoder
    * outputs — real occurrences in web-scale embedding tables) scores 0.0
    * against everything. The denominator is nullif-guarded because the
    * session runs ANSI mode, where a bare /0 aborts the whole job on the
    * first degenerate row. */
  def cosine(a: Column, b: Column): Column =
    coalesce(dot(a, b) / nullif(norm(a) * norm(b), lit(0.0)), lit(0.0))

  /** Exact top-k by cosine against one query vector (broadcast as a
    * literal array — no join, map-only scan + single top-k reduction).
    * At 100 TB: this is the scatter-gather ANN baseline; each partition
    * computes local top-k, the driver merges (orderBy+limit does exactly
    * that via TakeOrderedAndProject). */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, excludeId: Option[Long] = None): DataFrame = {
    require(queryNorm(query) > 0.0,
      "cosineTopK: query vector has zero norm — cosine is undefined")
    val q = array(query.map(v => lit(v)): _*)
    val base = excludeId.fold(embeddings)(id => embeddings.filter(col(idCol) =!= id))
    base
      .select(col(idCol),
        coalesce(dot(col(vecCol), q) /
          nullif(norm(col(vecCol)) * lit(queryNorm(query)), lit(0.0)), lit(0.0))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** ‖q‖ for a literal query vector, computed ONCE on the driver with the
    * same left-to-right double accumulation as [[norm]] — bitwise equal to
    * the in-plan value, so swapping it in changes nothing but the per-row
    * cost (Catalyst does not constant-fold aggregate() over literals). */
  private def queryNorm(query: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < query.length) {
      s += query(i).toDouble * query(i).toDouble; i += 1
    }
    math.sqrt(s)
  }

  /** Deterministic ±1 hyperplane matrix: r_i[j] = parity of the first byte
    * of md5("p:i:j"). Data-independent, so it is computed ONCE on the
    * driver and embedded as literals (the previous xxhash64 derivation
    * re-hashed bits×dim times per ROW at runtime) — and because md5 is
    * engine-portable, an independent engine (the DuckDB oracle) reproduces
    * the identical planes, making the whole LSH pipeline exactly
    * mirrorable (wr_ann_lsh / wr_embedding_near_dups). */
  def lshPlanes(dim: Int, bits: Int): IndexedSeq[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until bits).map { i =>
      Array.tabulate(dim) { j =>
        md.reset()
        val d = md.digest(s"p:$i:$j".getBytes("UTF-8"))
        if ((d(0) & 1) == 1) 1 else -1
      }
    }
  }

  /** The [[lshPlanes]] matrix as ONE nested-array literal. The first cut
    * inlined bits × dim `lit()` nodes (one `array(lit, lit, …)` per bit);
    * at real embedding dims (768–4096) and the auto-derived widths (up to
    * 4 × 30 bits) that is a ~10⁵-node expression tree, and Catalyst
    * ANALYSIS over it costs seconds per plan — the exact defect class
    * [[ivfAssign]] measured and fixed with `typedLit` one function down.
    * One literal node rides the whole matrix; `element_at(P, i+1)` pulls
    * plane i. Values are identical doubles in identical order, so every
    * projection — and therefore every signature bit and every oracle — is
    * unchanged. */
  private def planesLit(planes: IndexedSeq[Array[Int]]): Column =
    typedLit(planes.map(_.map(_.toDouble).toSeq))

  /** Random-hyperplane LSH signature: bit i = sign(v · r_i) over the
    * [[lshPlanes]] matrix; one codegen'd aggregate pass per bit. One
    * packed long — bits is capped at 62 (shiftleft wraps its shift count
    * mod 64, so planes 64+ would silently alias onto low bits); callers
    * needing more use [[lshBandSignature]] (array-of-longs, unbounded
    * width). */
  def lshSignature(vecCol: Column, dim: Int, bits: Int): Column = {
    require(bits >= 1 && bits <= 62,
      s"lshSignature: bits must be in [1,62] (one packed long; wider " +
        s"widths go through lshBandSignature), got $bits")
    val planes = planesLit(lshPlanes(dim, bits))
    val bitCols = (0 until bits).map { i =>
      val proj = aggregate(
        zip_with(vecCol, element_at(planes, i + 1),
          (x, r) => x.cast("double") * r),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Banded LSH signature as `array<long>`: element b packs chunkBits
    * sign bits from planes b·chunkBits … (b+1)·chunkBits − 1 (bit j of
    * band b = sign(v · r_{b·chunkBits+j}) << j). Bit-for-bit the chunk
    * values [[lshSignature]]-based extraction produced —
    * `(sig >> b·cb) & mask` over one packed long — but with NO 60-bit
    * width ceiling: bands × chunkBits is bounded only by the per-row
    * projection cost (one aggregate pass per bit, linear), not by a
    * packed representation the corpus outgrows quadratically. Same
    * md5-parity planes, so an independent engine still reproduces every
    * band value exactly. */
  def lshBandSignature(vecCol: Column, dim: Int, bands: Int,
      chunkBits: Int): Column = {
    require(bands >= 1 && chunkBits >= 1 && chunkBits <= 62,
      s"lshBandSignature: need bands >= 1 and chunkBits in [1,62], " +
        s"got bands=$bands chunkBits=$chunkBits")
    val planes = planesLit(lshPlanes(dim, bands * chunkBits))
    val bandCols = (0 until bands).map { b =>
      (0 until chunkBits).map { j =>
        val i = b * chunkBits + j
        val proj = aggregate(
          zip_with(vecCol, element_at(planes, i + 1),
            (x, r) => x.cast("double") * r),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }
    array(bandCols: _*)
  }

  /** Signature of a LITERAL vector, computed once on the driver with the
    * same left-to-right double accumulation and strict `proj > 0` bit rule
    * as the in-plan [[lshSignature]] — bitwise-identical, so a driver-side
    * query signature probes exactly the buckets the in-plan one would. */
  def lshSignatureOf(query: Array[Float], dim: Int, bits: Int): Long = {
    require(bits >= 1 && bits <= 62,
      s"lshSignatureOf: bits must be in [1,62] (1L << i wraps mod 64 past " +
        s"that, silently aliasing planes onto low bits), got $bits")
    val planes = lshPlanes(dim, bits)
    (0 until bits).foldLeft(0L) { (sig, i) =>
      var proj = 0.0; var j = 0
      while (j < query.length) {
        proj += query(j).toDouble * planes(i)(j).toDouble; j += 1
      }
      if (proj > 0) sig | (1L << i) else sig
    }
  }

  /** Bucketed ANN: search only vectors whose LSH signature matches the
    * query's on at least one chunk (multi-probe). The query's signature is
    * computed ON THE DRIVER ([[lshSignatureOf]]), so the probe compiles to
    * a map-only scan + chunk-match filter + TakeOrderedAndProject — no
    * explode, no join, no distinct, ZERO shuffles (the previous lowering
    * exploded chunks and distinct'd candidate rows that carried two copies
    * of the embedding array — a shuffle of ~65× the bytes for the same
    * candidate set). Trades recall for a bucket-pruned scan. */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, dim: Int, bits: Int = 16,
      chunkBits: Int = 4): DataFrame = {
    require(queryNorm(query) > 0.0,
      "lshTopK: query vector has zero norm — cosine is undefined")
    // same loud rule as the minhash banders: a floor division would
    // silently ignore the trailing bits % chunkBits signature bits in the
    // chunk match, quietly widening recall away from the configured shape
    require(chunkBits >= 1 && bits % chunkBits == 0,
      s"lshTopK: chunkBits ($chunkBits) must divide bits ($bits)")
    val qsig = lshSignatureOf(query, dim, bits)
    val chunks = bits / chunkBits
    val mask = (1L << chunkBits) - 1
    val sig = lshSignature(col(vecCol), dim, bits)
    val anyChunkMatches = (0 until chunks).map { i =>
      shiftright(sig, i * chunkBits).bitwiseAND(lit(mask)) ===
        lit((qsig >>> (i * chunkBits)) & mask)
    }.reduce(_ || _)
    val q = array(query.map(v => lit(v)): _*)
    embeddings
      .filter(anyChunkMatches)
      .select(col(idCol),
        coalesce(dot(col(vecCol), q) /
          nullif(norm(col(vecCol)) * lit(queryNorm(query)), lit(0.0)), lit(0.0))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  // ------------------------------------------------------------------
  // IVF-Flat: the coarse-quantizer ANN scale path
  // ------------------------------------------------------------------
  /** Nearest-centroid id for a vector against a (small) centroid set —
    * a broadcast argmax over per-centroid cosine, codegen'd
    * (array_position of the max score; ties take the lowest centroid id,
    * deterministically).
    *
    * The centroid matrix rides in ONE nested-array literal
    * (`element_at` per centroid) and centroid norms are precomputed on
    * the driver with [[queryNorm]]'s accumulation order (bit-equal to
    * the in-plan aggregate) — the first cut inlined k×dim `lit()` nodes
    * plus a per-row norm aggregate per centroid, and Catalyst analysis
    * over that ~4000-node tree cost seconds PER PLAN; k-means pays this
    * expression once per iteration, ingest once per tick. */
  def ivfAssign(vecCol: Column, centroids: Seq[Array[Double]]): Column = {
    val cents = typedLit(centroids.map(_.toSeq))
    // zero-norm guard: a degenerate vector (or centroid) scores -2.0 — below
    // any real cosine — instead of throwing ANSI DIVIDE_BY_ZERO; an all-zero
    // vector thus assigns to centroid 0 deterministically
    val scores = array(centroids.zipWithIndex.map { case (c, i) =>
      coalesce(dot(vecCol, element_at(cents, i + 1)) /
        nullif(norm(vecCol) * lit(centroidNorm(c)), lit(0.0)), lit(-2.0))
    }: _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** ‖c‖ with the same left-to-right accumulation as [[norm]]. */
  private def centroidNorm(c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  /** Lloyd's k-means for the IVF coarse quantizer. Assignment is the
    * broadcast argmax above (one distributed pass per iteration); the
    * update re-averages element-wise via posexplode + groupBy(centroid,
    * position). Only k × dim aggregated doubles ever reach the driver —
    * VECTORS NEVER LEAVE THE CLUSTER. Init is deterministic without a
    * global sort: the min-id row of each of k hash buckets. Empty
    * clusters keep their previous centroid. */
  def ivfTrain(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): Seq[Array[Double]] = {
    val picks = embeddings
      .groupBy(pmod(xxhash64(col(idCol)), lit(k)).as("__b"))
      .agg(min(col(idCol)).as(idCol))
      .join(embeddings, idCol)
      .orderBy(col("__b"))
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq
    // empty corpus -> empty centroid set, and ivfAssign over ZERO
    // centroids yields a null cell id (array_max of an empty array) that
    // every later vector would silently land in — reject at the train
    // boundary instead (same loud-identity convention as the dedup twins)
    require(picks.nonEmpty,
      "ivfTrain: empty corpus — an IVF quantizer needs at least one vector")
    var cents = picks
    var it = 0
    while (it < iters) {
      val stats = embeddings
        .select(ivfAssign(col(vecCol), cents).as("__ci"),
          posexplode(col(vecCol)))
        .groupBy(col("__ci"), col("pos"))
        .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byC = stats.groupBy(_.getAs[Int]("__ci"))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byC.get(ci).fold(old) { rows =>
          rows.sortBy(_.getAs[Int]("pos"))
            .map(r => r.getAs[Double]("s") / r.getAs[Long]("n")).toArray
        }
      }
      it += 1
    }
    cents
  }

  /** Build the inverted file: every vector tagged with its posting-list id.
    * At scale, write this partitioned by `__ci` so a probe reads only the
    * matching posting-list directories (same layout trick as FieldIndex). */
  def ivfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame =
    embeddings.withColumn("__ci", ivfAssign(col(vecCol), centroids))

  /** Durable IVF layout — the at-rest form of the "write the index
    * partitioned by `__ci`" scale path: posting lists land as parquet
    * PARTITIONED BY the coarse-quantizer cell, centroids as a small side
    * table. A probe against the loaded index then reads ONLY the `nprobe`
    * matching directories (PartitionFilters prune the rest unread — the
    * FieldIndex trick applied to the vector index); at 100 TB that is the
    * difference between touching nprobe/k of the corpus and all of it. */
  def ivfSave(index: DataFrame, centroids: Seq[Array[Double]],
      path: String): Unit = {
    val spark = index.sparkSession
    import spark.implicits._
    index.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("__ci").parquet(s"$path/postings")
    centroids.zipWithIndex
      .flatMap { case (c, ci) => c.zipWithIndex.map { case (v, pos) => (ci, pos, v) } }
      .toDF("ci", "pos", "v").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/centroids")
  }

  /** Just the centroid side table — cheap (no postings-tree listing), and
    * readable even while the postings tree is mid-swap. */
  def ivfLoadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Array[Double]] =
    spark.read.parquet(s"$path/centroids").collect()
      .groupBy(_.getAs[Int]("ci")).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("v")) }

  def ivfLoad(spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, Seq[Array[Double]]) =
    (spark.read.parquet(s"$path/postings"), ivfLoadCentroids(spark, path))

  /** IVF search: rank centroids against the query ON THE DRIVER (k dot
    * products — tiny), then scan only the `nprobe` nearest posting lists
    * exactly. `nprobe == k` degrades gracefully to the exact brute-force
    * answer (the recall/latency dial of every IVF system). */
  def ivfTopK(index: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]], query: Array[Float], topK: Int,
      nprobe: Int): DataFrame = {
    def cos(a: Array[Double], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      // a zero-norm centroid ranks last instead of producing a NaN that
      // breaks sortBy's comparison contract (TimSort throws on NaN keys)
      val den = math.sqrt(na * nb)
      if (den == 0.0) -2.0 else d / den
    }
    val probes = centroids.zipWithIndex
      .sortBy { case (c, i) => (-cos(c, query), i) }
      .take(nprobe).map(_._2)
    val q = array(query.map(v => lit(v)): _*)
    require(queryNorm(query) > 0.0,
      "ivfTopK: query vector has zero norm — cosine is undefined")
    index.filter(col("__ci").isin(probes: _*))
      .select(col(idCol),
        coalesce(dot(col(vecCol), q) /
          nullif(norm(col(vecCol)) * lit(queryNorm(query)), lit(0.0)), lit(0.0))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Number of signature bands [[cosineNearDupPairs]] blocks on when it
    * sizes itself (a pair is a candidate if ANY band's chunk matches). */
  val NearDupBands = 4

  /** Corpus-size-derived band width for sign-LSH blocking: bits per band
    * such that the EXPECTED bucket population n / 2^chunkBits stays near
    * `targetBucket`. In-bucket candidate pairs grow quadratically with
    * bucket size, so a FIXED chunkBits makes the blocked self-join
    * quadratic as the corpus grows — the 2^chunkBits bucket keyspace is a
    * ceiling the data outgrows (measured: 10× probe exponent 1.11 under
    * the old fixed 16/4 default, BASELINE.md r12). Holding expected bucket
    * size constant keeps the candidate stage ~linear in n.
    *
    * Clamped to [4, 30]. The ceiling is COST-driven, not
    * representation-driven: [[cosineNearDupPairs]] signatures are
    * array-of-longs bands ([[lshBandSignature]]), so any width fits —
    * but each signature bit is one projection pass per row, so the
    * derived width is capped where the per-row cost stops being worth it.
    * 30 bits/band supports n ≈ targetBucket · 2^30 (~68 billion vectors
    * at the default target) before expected bucket size grows with n
    * again — past any single embedding table; the r13 ceiling was 15
    * (60-bit one-long packing, saturating at ~2M vectors, the same
    * fixed-ceiling defect class one decade out). Wider bands also lower
    * per-band recall for weakly similar pairs
    * (P(band match) = p^chunkBits, p = 1 − θ/π); the exact verification
    * stage keeps precision at 1 regardless, and callers chasing recall at
    * a pinned blocking shape pass explicit bits/chunkBits. */
  def chunkBitsFor(n: Long, targetBucket: Int = 64): Int = {
    require(targetBucket > 0,
      s"chunkBitsFor: targetBucket must be positive, got $targetBucket")
    // ceil(log2(ceil(n / targetBucket))) in INTEGER arithmetic (smallest k
    // with 2^k >= ceil(n/target) — equivalent because 2^k is integral):
    // an independent engine (the wr_embedding_near_dups_auto oracle)
    // replays this derivation, and float log2 could flip ceil at
    // power-of-two boundaries between implementations. Division-based
    // ceiling: the add-then-divide form overflows at n near Long.MaxValue
    val buckets = n / targetBucket + (if (n % targetBucket > 0) 1 else 0)
    val raw = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1))
    math.min(30, math.max(4, raw))
  }

  /** All-pairs near-duplicates by embedding cosine ≥ threshold, LSH-blocked
    * (bucket join on signature chunks instead of a cross-join).
    *
    * Order of operations matters at scale: candidate pairs are distinct'd
    * as BARE ID PAIRS (16 bytes/row) before the vectors are re-attached —
    * distinct-ing rows that carry two embedding arrays would shuffle ~65×
    * more bytes for the same result. Recall is governed by bits/chunkBits:
    * low thresholds (weakly similar pairs) need more probes; the exact
    * verification stage keeps precision at 1 either way.
    *
    * `bits = 0` / `chunkBits = 0` (the defaults) SIZE THE BLOCKING FROM
    * THE CORPUS: chunkBits = [[chunkBitsFor]](n) and bits =
    * [[NearDupBands]] × chunkBits — expected bucket size stays constant
    * as the corpus grows instead of the bucket keyspace being a fixed
    * 2^chunkBits ceiling the data outgrows quadratically. Pin both
    * explicitly when the blocking shape itself must be deterministic
    * across corpora (the oracle fixtures do).
    *
    * NOTE — auto-sizing is EAGER: with both knobs unset and no
    * `corpusCount`, plan CONSTRUCTION runs one count() job over
    * `embeddings` to derive n (the construction-time checkpoint below is
    * eager for the same reason). Callers that must keep plan building
    * side-effect free — plan tooling, speculative composition — pass
    * `corpusCount` (their own count, possibly stale by a few rows: the
    * derivation only needs the order of magnitude) or pin the knobs. */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bits: Int = 0, chunkBits: Int = 0,
      corpusCount: Long = -1L): DataFrame = {
    // corpus-sizing ONLY when both knobs are unset: a caller pinning
    // bits alone keeps the historical band width (4) — deriving cb from
    // the corpus under a pinned bits made `bits = 32` crash the moment
    // the corpus grew past a power-of-two boundary (32 % 5 != 0)
    val cb = if (chunkBits > 0) chunkBits
             else if (bits > 0) 4
             else chunkBitsFor(
               if (corpusCount >= 0) corpusCount else embeddings.count())
    val nBits = if (bits > 0) bits else NearDupBands * cb
    require(nBits % cb == 0 && nBits / cb >= 1,
      s"cosineNearDupPairs: bits ($nBits) must be a positive multiple of chunkBits ($cb)")
    val chunks = nBits / cb
    // array-of-longs band signature: one long PER BAND, so bands × cb is
    // not capped by a packed-long width (the r13 60-bit ceiling made
    // chunkBitsFor saturate at 15 ≈ 2M vectors and in-bucket pairs go
    // quadratic one decade out); band values are bit-identical to the
    // old single-long chunk extraction, so oracles are unchanged
    val sigd = embeddings.withColumn("__sig",
      lshBandSignature(col(vecCol), dim, chunks, cb))
    // the signature table is MATERIALIZED (eager checkpoint) before the
    // self-join: both join sides reference it, and Spark shares no
    // subplans across branches — left lazy, the bits-x-dim projection
    // expression (the dominant per-row cost) would run twice over the
    // full table. The materialized form is id + 4 chunk rows per vector,
    // a few bytes/row — the standard persisted-signature-table shape.
    val exploded = sigd.select(col(idCol), posexplode(col("__sig")))
      .select(col(idCol),
        struct(col("pos").as("ci"), col("col").as("cv")).as("__c"))
      .localCheckpoint(true)
    // per-side aliases: both sides derive from one parent, and a shared
    // column name in the join condition leans on Spark's ambiguous-self-
    // join heuristic (and warns "trivially true equals predicate")
    val a = exploded.select(col(idCol).as("id_a"), col("__c").as("__ca"))
    val b = exploded.select(col(idCol).as("id_b"), col("__c").as("__cb"))
    val pairIds = a.join(b, col("__ca") === col("__cb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // norms precomputed ONCE per vector (same accumulation order as
    // cosine(), so values are bitwise identical): each candidate pair then
    // costs one dot-product pass instead of three array aggregates
    val vecs = embeddings.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("__n"))
    pairIds
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
        col("__n").as("__na")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
        col("__n").as("__nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        coalesce(dot(col("__va"), col("__vb")) /
          nullif(col("__na") * col("__nb"), lit(0.0)), lit(0.0))
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}

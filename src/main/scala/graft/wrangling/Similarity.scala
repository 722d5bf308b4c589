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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (broadcast as a
    * literal array — no join, map-only scan + single top-k reduction).
    * At 100 TB: this is the scatter-gather ANN baseline; each partition
    * computes local top-k, the driver merges (orderBy+limit does exactly
    * that via TakeOrderedAndProject). */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val base = excludeId.fold(embeddings)(id => embeddings.filter(col(idCol) =!= id))
    base
      .select(col(idCol), cosine(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Random-hyperplane LSH signature: bit i = sign(v · r_i) where r_i is a
    * deterministic pseudo-random ±1 vector derived from xxhash64(i, dim) —
    * no RNG state, so executors generate identical planes independently. */
  def lshSignature(vecCol: Column, dim: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { i =>
      // r_i[j] = ±1 from parity of a hash; dot in one aggregate pass
      val proj = aggregate(
        zip_with(vecCol, sequence(lit(0), lit(dim - 1)),
          (x, j) => when(xxhash64(lit(i), j).bitwiseAND(lit(1L)) === 1L,
            x.cast("double")).otherwise(-x.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN: group vectors by LSH signature chunk, search only
    * buckets matching the query (multi-probe = exact chunk match on any of
    * the `probes` chunks). Trades recall for a bucket-pruned scan. */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, dim: Int, bits: Int = 16,
      chunkBits: Int = 4): DataFrame = {
    val sigd = embeddings.withColumn("__sig", lshSignature(col(vecCol), dim, bits))
    val qdf = embeddings.sparkSession.range(1).select(
      array(query.map(v => lit(v)): _*).as("__qv"))
      .withColumn("__qsig", lshSignature(col("__qv"), dim, bits))
    val chunks = bits / chunkBits
    val mask = (1L << chunkBits) - 1
    def chunkArr(sig: Column) = array((0 until chunks).map(i =>
      struct(lit(i).as("ci"),
        shiftright(sig, i * chunkBits).bitwiseAND(lit(mask)).as("cv"))): _*)
    val cand = sigd.select(col(idCol), col(vecCol),
      explode(chunkArr(col("__sig"))).as("__c"))
      .join(broadcast(qdf.select(col("__qv"), explode(chunkArr(col("__qsig"))).as("__c"))),
        "__c")
      .select(col(idCol), col(vecCol), col("__qv")).distinct()
    cand.select(col(idCol), cosine(col(vecCol), col("__qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs near-duplicates by embedding cosine ≥ threshold, LSH-blocked
    * (bucket join on signature chunks instead of a cross-join).
    *
    * Order of operations matters at scale: candidate pairs are distinct'd
    * as BARE ID PAIRS (16 bytes/row) before the vectors are re-attached —
    * distinct-ing rows that carry two embedding arrays would shuffle ~65×
    * more bytes for the same result. Recall is governed by bits/chunkBits:
    * low thresholds (weakly similar pairs) need more probes; the exact
    * verification stage keeps precision at 1 either way. */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bits: Int = 16, chunkBits: Int = 4): DataFrame = {
    val sigd = embeddings.withColumn("__sig", lshSignature(col(vecCol), dim, bits))
    val chunks = bits / chunkBits
    val mask = (1L << chunkBits) - 1
    val exploded = sigd.select(col(idCol),
      explode(array((0 until chunks).map(i =>
        struct(lit(i).as("ci"),
          shiftright(col("__sig"), i * chunkBits).bitwiseAND(lit(mask)).as("cv"))): _*))
        .as("__c"))
    val a = exploded.select(col(idCol).as("id_a"), col("__c"))
    val b = exploded.select(col(idCol).as("id_b"), col("__c"))
    val pairIds = a.join(b, a("__c") === b("__c") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val vecs = embeddings.select(col(idCol), col(vecCol))
    pairIds
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        cosine(col("__va"), col("__vb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}

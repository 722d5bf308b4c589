package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.wrangling._

class WranglingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  import Multimodal._

  test("langId discriminates real language samples") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat and the dog went to the market and it is a fine day"),
      ("de", "der hund und die katze das ist nicht gut und der tag ist schon"),
      ("es", "el perro y la casa que es de los amigos y es bueno"),
      ("fr", "le chien est une belle bete et les amis est la maison"),
      ("zh", "这是一个中文句子 语言识别 应该 能看到 汉字")).toDF("expected", "text")
    val got = samples.select(col("expected"), TextOps.langId(col("text")).as("got"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("exact dedup keeps one survivor per duplicated text") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha  Beta gamma"), // normalize-equal
      (3L, "something else entirely"), (4L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text")
    assert(out.count() == 3)
    assert(out.agg(min("doc_id")).collect()(0).getLong(0) == 1L)
    assert(!out.select("doc_id").collect().map(_.getLong(0)).contains(2L))
  }

  test("null text/url is UNKNOWN, not shared: such docs bypass dedup, all kept") {
    import spark.implicits._
    // two null-text docs used to collapse into one null-fingerprint
    // bucket (all but the min id silently dropped) while the near-dup
    // stages let the same rows survive — the pipeline contradicted itself
    val df = Seq((1L, Some("alpha beta")), (2L, Some("alpha beta")),
      (3L, Option.empty[String]), (4L, Option.empty[String]))
      .toDF("doc_id", "text")
    val kept = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L), kept.toString)
    // same rule for the packaged pipeline's URL stage: url-less docs are
    // not URL-duplicates of each other
    val withUrl = Seq(
      (1L, "page one text", Some("http://a.com/x?utm_source=z")),
      (2L, "page two text", Some("http://a.com/x")), // same canonical URL
      (3L, "page three text", Option.empty[String]),
      (4L, "page four text", Option.empty[String]))
      .toDF("doc_id", "text", "url")
    val survived = graft.wrangling.Dedup.corpusDedup(withUrl, "doc_id",
      "text", urlCol = Some("url"), threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survived == Set(1L, 3L, 4L), survived.toString)
  }

  test("minhash LSH finds constructed near-duplicates") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2" // J≈0.9
    val unrelated = (100 to 140).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashDedupPairs(df, "doc_id", "text",
      threshold = 0.7, shingleN = 1).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getAs[Double]("jaccard") > 0.85)
  }

  test("minhash LSH recall vs exact jaccard baseline on documents") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 80)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 1, 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDedupPairs(docs, "doc_id", "text",
      threshold = 0.9, numHashes = 32, bands = 16, shingleN = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification stage means no false positives; recall should be high
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.8,
        s"recall ${lsh.size}/${exact.size}")
  }

  test("corpusDedup: url -> exact -> near-dup stages each claim their dups") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2"
    val docs = Seq(
      // 1 and 2: same canonical URL (tracking params differ) -> url stage
      (1L, base, "http://a.com/p?id=1"),
      (2L, "completely different words here", "HTTP://WWW.A.com:80/p/?id=1&utm_source=m"),
      // 3: exact content dup of 1 (whitespace differs) -> exact stage
      (3L, base.replace(" ", "  "), "http://b.com/1"),
      // 4: near-dup of 1 (J≈0.9) -> LSH stage
      (4L, near, "http://c.com/1"),
      // 5: unique survivor
      (5L, (100 to 140).map(i => s"u$i").mkString(" "), "http://d.com/1"))
      .toDF("doc_id", "text", "url")
    val out = Dedup.corpusDedup(docs, "doc_id", "text",
      urlCol = Some("url"), threshold = 0.7, shingleN = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 5L), s"survivors $out")
    // without the url stage, doc 2 (unique text) survives
    val noUrl = Dedup.corpusDedup(docs, "doc_id", "text",
      urlCol = None, threshold = 0.7, shingleN = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(noUrl == Set(1L, 2L, 5L), s"survivors $noUrl")
  }

  test("corpusDedup span stage uses a RELIABLE checkpoint when a dir is configured") {
    import spark.implicits._
    // with a checkpoint dir set, the span-stage survivor materialization
    // must go through sc.checkpoint (recoverable on executor loss) rather
    // than pinning the full text-bearing corpus in executor-local blocks;
    // results are identical either way, and the dir visibly holds an rdd
    // checkpoint afterward
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_ck_regime").toString
    val docs = (1L to 30L).map(i =>
      (i, (1 to 40).map(j => s"d${i}w$j").mkString(" ") +
        " shared footer tokens one two three four five six seven eight"))
      .toDF("doc_id", "text")
    def run() = Dedup.corpusDedup(docs, "doc_id", "text",
        threshold = 0.9, shingleN = 1, spanTokens = Some(8),
        spanCoverageDrop = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = run()
    val prior = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(ckDir)
    try {
      assert(run() == plain)
      def rddCk(f: java.io.File): Boolean =
        f.isDirectory && (f.getName.startsWith("rdd-") ||
          Option(f.listFiles()).exists(_.exists(rddCk)))
      assert(rddCk(new java.io.File(ckDir)),
        "no reliable rdd checkpoint landed under the configured dir")
    } finally
      // Option(null) is None inside setCheckpointDir, so this restores
      // the unset state for the other suites sharing the session
      spark.sparkContext.setCheckpointDir(prior.orNull)
  }

  test("simhash: identical docs distance 0, near-dups close, unrelated far") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 57).map(i => s"tok$i").mkString(" ") + " zz1 zz2 zz3"
    val far = (200 to 260).map(i => s"q$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)))
    assert(ham(fp(1L), fp(3L)) <= 16)
  }

  test("simhashPairs: 100% recall vs exact-Hamming baseline at maxDist=7") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val fps = Dedup.simhash(docs, "doc_id", "text")
    // exact baseline: all-pairs Hamming (cross join — fine at test scale)
    val a = fps.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = fps.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simhashPairs(fps, "doc_id", maxDist = 7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8-chunk pigeonhole blocking: identical pair sets, both directions
    assert(blocked == exact, s"blocked=${blocked.size} exact=${exact.size}")
    // and the guarantee's edge: asking beyond it must fail loudly
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(fps, "doc_id", maxDist = 8)
    }
  }

  test("lsh ANN topk overlaps exact brute-force topk") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10,
      excludeId = Some(1L)).select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", q, 10, dim = 64)
      .filter(col("vec_id") =!= 1).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx.intersect(exact).nonEmpty, "LSH found none of the true topk")
  }

  test("lsh projections are order-deterministic: in-plan aggregate == sequential fold, bitwise") {
    // The DuckDB oracle mirrors the projection as an explicit left fold
    // (list_reduce over list_prepend(0.0, ...)). Cross-engine signature
    // equality therefore rests on one claim: Spark's aggregate() HOF
    // accumulates strictly left-to-right, so the in-plan projection is
    // bitwise equal to a sequential loop in the same order — even for
    // projections numerically near zero, where a different summation
    // order could flip the sign bit and with it the bucket.
    val emb = Tables.embeddings(spark, sf)
    val planes = Similarity.lshPlanes(64, 16)
    val projCols = (0 until 16).map { i =>
      Similarity.dot(col("embedding"),
        array(planes(i).map(r => lit(r.toDouble)): _*)).as(s"p$i")
    }
    val rows = emb.select(
      (col("vec_id") +: projCols :+
        Similarity.lshSignature(col("embedding"), 64, 16).as("sig")): _*)
      .collect()
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = vecs(r.getLong(0))
      var sig = 0L
      (0 until 16).foreach { i =>
        var acc = 0.0; var j = 0
        while (j < 64) { acc += v(j).toDouble * planes(i)(j); j += 1 }
        assert(java.lang.Double.doubleToRawLongBits(acc) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1 + i)),
          s"vec ${r.getLong(0)} plane $i: in-plan projection is not the sequential fold")
        if (acc > 0) sig |= 1L << i
      }
      assert(sig == r.getLong(17), s"vec ${r.getLong(0)}: packed signature mismatch")
      // the driver-side signature (lshTopK's query probe) is the same fold
      assert(Similarity.lshSignatureOf(v.toArray, 64, 16) == r.getLong(17),
        s"vec ${r.getLong(0)}: driver-side signature diverges from in-plan")
    }

    // banded form PAST the one-long 60-bit ceiling: 5 bands x 13 bits =
    // 65 signature bits; band b must pack sign(v . plane(b*13+j)) << j
    // over the SAME plane sequence a one-long signature would use
    val wide = Similarity.lshPlanes(64, 65)
    val bandRows = emb.limit(20).select(col("vec_id"),
      Similarity.lshBandSignature(col("embedding"), 64, 5, 13).as("bands"))
      .collect()
    assert(bandRows.nonEmpty)
    bandRows.foreach { r =>
      val v = vecs(r.getLong(0))
      val got = r.getSeq[Long](1)
      assert(got.length == 5)
      (0 until 5).foreach { b =>
        var bv = 0L
        (0 until 13).foreach { j =>
          var acc = 0.0; var k = 0
          while (k < 64) { acc += v(k).toDouble * wide(b * 13 + j)(k); k += 1 }
          if (acc > 0) bv |= 1L << j
        }
        assert(bv == got(b),
          s"vec ${r.getLong(0)} band $b: array-banded signature mismatch")
      }
    }
  }

  test("lsh plane matrix rides ONE literal: wide configs stay analyzable; >62-bit packing rejected") {
    // the packed-long forms wrap their shift count mod 64 past bit 62 —
    // planes would silently alias onto low bits, so the width is loud
    intercept[IllegalArgumentException] {
      Similarity.lshSignature(col("embedding"), 64, 63)
    }
    intercept[IllegalArgumentException] {
      Similarity.lshSignatureOf(Array.fill(64)(1.0f), 64, 63)
    }
    // plan-cost posture at a REAL shape (dim=768, auto-clamp ceiling
    // 4 bands x 30 bits): the first cut inlined bits x dim lit() nodes
    // (~92k for this config) and Catalyst analysis over that tree costs
    // seconds per plan; with the matrix in one typedLit the analyzed
    // tree must stay orders of magnitude smaller and analyze fast
    import spark.implicits._
    val wide = Seq((1L, Array.fill(768)(0.5f))).toDF("vec_id", "embedding")
    val t0 = System.nanoTime()
    val df = wide.select(col("vec_id"),
      Similarity.lshBandSignature(col("embedding"), 768, 4, 30).as("bands"))
    val analyzed = df.queryExecution.analyzed // force analysis
    val ms = (System.nanoTime() - t0) / 1e6
    var nodes = 0
    analyzed.foreach(p => p.expressions.foreach(_.foreach(_ => nodes += 1)))
    assert(nodes < 20000,
      s"wide LSH plan blew up to $nodes expression nodes — plane matrix " +
        "is being inlined per-element again")
    assert(ms < 5000.0, s"wide LSH plan analysis took ${ms}ms")
    // and it actually runs: 4 bands of 30-bit values
    val out = df.collect()(0).getSeq[Long](1)
    assert(out.length == 4 && out.forall(b => b >= 0L && b < (1L << 30)))
  }

  test("ivf ANN: nprobe=k is exact; pruned probes keep high recall") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 1)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val k = 8
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", k, iters = 2)
    assert(cents.size == k && cents.forall(_.length == 64))
    // training is deterministic — same init, same iterations, same result
    val again = Similarity.ivfTrain(emb, "vec_id", "embedding", k, iters = 2)
    assert(cents.zip(again).forall { case (a, b) => a.sameElements(b) })
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
      .persist()
    // every posting list is nonempty-ish and covers all vectors
    assert(index.count() == emb.count())
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    // nprobe == k scans every posting list => exactly brute force
    val full = Similarity.ivfTopK(index, "vec_id", "embedding", cents, q,
      10, nprobe = k).collect().map(_.getLong(0)).toSeq
    assert(full == exact)
    // pruned probe: top-10 recall ≥ 0.5 scanning half the lists
    val pruned = Similarity.ivfTopK(index, "vec_id", "embedding", cents, q,
      10, nprobe = k / 2).collect().map(_.getLong(0)).toSet
    assert(pruned.intersect(exact.toSet).size >= 5,
      s"recall too low: ${pruned.intersect(exact.toSet).size}/10")
    index.unpersist()
  }

  test("ivf persistence: partitioned postings probe-pruned, results identical") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 1)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val k = 8
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", k, iters = 2)
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.ivfSave(index, cents, dir)
    // one directory per posting list on disk
    assert(new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("__ci=")) == k)

    val (loaded, loadedCents) = Similarity.ivfLoad(spark, dir)
    assert(loadedCents.size == k)
    assert(cents.zip(loadedCents).forall { case (a, b) => a.sameElements(b) })
    // probe over the loaded index == probe over the in-memory index
    val mem = Similarity.ivfTopK(index, "vec_id", "embedding", cents, q,
      10, nprobe = 4).collect().map(_.getLong(0)).toSeq
    val disk = Similarity.ivfTopK(loaded, "vec_id", "embedding", loadedCents,
      q, 10, nprobe = 4)
    assert(disk.collect().map(_.getLong(0)).toSeq == mem)
    // and the scan is partition-PRUNED: the __ci filter reaches
    // PartitionFilters, so non-probed posting directories are never read
    val plan = disk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__ci"),
      s"probe not partition-pruned:\n$plan")
  }

  test("cosine is in [-1,1] and self-similarity is 1") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("multimodal plumbing: features deterministic, shaped, partitioned") {
    val media = Multimodal.documentsAsMedia(spark, sf)
    val feats = Multimodal.extractFeatures(media, frameSize = 64, stride = 2,
      featureDim = 16)
    val rows = feats.collect()
    assert(rows.length == media.count().toInt)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => math.abs(r.features.sum - r.features.sum) == 0.0))
    assert(rows.exists(_.n_frames > 0))
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(media, frameSize = 64, stride = 2,
      featureDim = 16).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (x, y) => x.features.sameElements(y.features) })
  }

  test("image codec: real PNG decode -> resize -> features end-to-end") {
    import Multimodal._
    // deterministic PNGs generated in-process (pure-JVM imageio)
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val red = png(8, 8)((_, _) => 0xff0000)
    val halves = png(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff)

    // decode: geometry + exact pixel round-trip
    val Some((w, h, buf)) = MediaCodec.decodeImage(red)
    assert(w == 8 && h == 8 && buf.length == 8 * 8 * 3)
    assert(buf.grouped(3).forall(p =>
      (p(0) & 0xff) == 255 && (p(1) & 0xff) == 0 && (p(2) & 0xff) == 0))
    // resize: 16x16 -> 4x4 buffer of the right shape, still half dark/light
    val Some(small) = MediaCodec.resizeImage(halves, 4, 4)
    assert(small.length == 4 * 4 * 3)
    val lum = small.grouped(3).map(p => (p(0) & 0xff)).toSeq
    assert(lum.count(_ < 64) == 8 && lum.count(_ > 192) == 8)
    // non-image payload is rejected, not mangled
    assert(MediaCodec.decodeImage("not an image".getBytes).isEmpty)

    // distributed pipeline: decode -> features; undecodable rows dropped
    val s = spark; import s.implicits._
    val media = Seq(
      MediaRow(1L, red, MediaMeta("image", 8, 8, 0, 0)),
      MediaRow(2L, halves, MediaMeta("image", 16, 16, 0, 0)),
      MediaRow(3L, "junk".getBytes, MediaMeta("image", 0, 0, 0, 0))).toDS()
    val feats = Multimodal.extractImageFeatures(media, featureDim = 8)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L)) // junk dropped
    assert(feats.forall(_.features.length == 8))
    // solid red: histogram mass sits in the 0-bin (G,B=0) and top bin (R=255)
    val redHist = feats(0).features
    assert(redHist.head > 0 && redHist.last > 0)
    assert(math.abs(redHist.sum * (32 / 8) - redHist.sum * 4) < 1e-9)
    // deterministic across runs
    val again = Multimodal.extractImageFeatures(media, featureDim = 8)
      .collect().sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.features.sameElements(b.features) })
    // resize inside the pipeline gives the canonical-geometry features
    val resized = Multimodal.extractImageFeatures(media,
      resizeTo = Some((4, 4)), featureDim = 8).collect()
    assert(resized.length == 2 && resized.forall(_.features.length == 8))
  }

  test("audio codec: real WAV decode -> windows -> features end-to-end") {
    import Multimodal._
    import javax.sound.sampled._
    // deterministic WAVs generated in-process (pure-JVM javax.sound)
    def wav(freq: Double, sr: Float = 8000f, ms: Int = 250,
        channels: Int = 1, amp: Double = 0.5): Array[Byte] = {
      val n = (sr * ms / 1000).toInt
      val data = new Array[Byte](n * 2 * channels)
      for (i <- 0 until n; c <- 0 until channels) {
        val v = (math.sin(2 * math.Pi * freq * i / sr) * amp * 32767).toShort
        val off = (i * channels + c) * 2
        data(off) = (v & 0xff).toByte
        data(off + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sr, 16,
        channels, channels * 2, sr, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    // decode: format metadata + sample count + signal shape
    val a440 = wav(440)
    val Some((sr, ch, pcm)) = MediaCodec.decodeAudio(a440)
    assert(sr == 8000f && ch == 1 && pcm.length == 2000)
    // sine at amplitude 0.5: RMS = 0.5/sqrt(2), zcr = 2*440/8000
    val d = MediaCodec.audioDescriptors(pcm)
    assert(math.abs(d(0) - 0.5 / math.sqrt(2)) < 0.01, s"rms ${d(0)}")
    assert(math.abs(d(1) - 2 * 440.0 / 8000) < 0.01, s"zcr ${d(1)}")
    assert(d(2) <= 0.5001 && d(2) > 0.45) // peak
    assert(math.abs(d(3)) < 0.01) // DC offset of a sine ~ 0
    // stereo mixes down to mono, same length in frames
    val Some((_, ch2, pcm2)) = MediaCodec.decodeAudio(wav(440, channels = 2))
    assert(ch2 == 2 && pcm2.length == 2000)
    assert(math.abs(MediaCodec.audioDescriptors(pcm2)(0) - d(0)) < 0.01)
    // non-audio payload rejected, not mangled
    assert(MediaCodec.decodeAudio("not audio".getBytes).isEmpty)

    // distributed pipeline: decode -> windows -> pooled features;
    // undecodable rows dropped; distinct frequencies separate
    val s = spark; import s.implicits._
    val media = Seq(
      MediaRow(1L, a440, MediaMeta("audio", 0, 0, 8000, 250)),
      MediaRow(2L, wav(1600), MediaMeta("audio", 0, 0, 8000, 250)),
      MediaRow(3L, "junk".getBytes, MediaMeta("audio", 0, 0, 0, 0))).toDS()
    val feats = Multimodal.extractAudioFeatures(media, windowSize = 512,
      stride = 1, featureDim = 8).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L)) // junk dropped
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(_.n_frames == (2000 - 512) / 512 + 1))
    assert(!feats(0).features.sameElements(feats(1).features))
    // deterministic across runs
    val again = Multimodal.extractAudioFeatures(media, windowSize = 512,
      stride = 1, featureDim = 8).collect().sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.features.sameElements(b.features) })
  }

  test("video codec: y4m decode -> frame sample -> descriptors end-to-end") {
    import Multimodal._
    // round trip through the Cmono encoder
    val frames = (0 until 6).map(i => Array.fill[Byte](4 * 3)((40 + 10 * i).toByte))
    val y4m = MediaCodec.encodeVideoY4M(4, 3, 30, 1, frames)
    val Some((w, h, fps, dec)) = MediaCodec.decodeVideoY4M(y4m)
    assert(w == 4 && h == 3 && fps == 30.0 && dec.size == 6)
    assert(dec.zip(frames).forall { case (a, b) => a.sameElements(b) })

    // C420 with real chroma planes: luma extracted, chroma skipped
    val hdr420 = "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val f420 = "FRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](8)(100) ++ Array.fill[Byte](4)(7) // Y then U+V (w/2*h/2 each)
    val Some((_, _, fps420, dec420)) =
      MediaCodec.decodeVideoY4M(hdr420 ++ f420 ++ f420)
    assert(fps420 == 25.0 && dec420.size == 2)
    assert(dec420.forall(f => f.length == 8 && f.forall(_ == 100.toByte)))

    // C444: two full chroma planes skipped per frame
    val hdr444 = "YUV4MPEG2 W2 H2 F1:1 C444\n".getBytes("US-ASCII")
    val f444 = "FRAME\n".getBytes("US-ASCII") ++ Array.fill[Byte](12)(50)
    val Some((_, _, _, dec444)) = MediaCodec.decodeVideoY4M(hdr444 ++ f444)
    assert(dec444.size == 1 && dec444.head.length == 4)

    // junk and truncated payloads rejected, not mangled — including the
    // ONE-byte truncation (the old bound omitted the FRAME newline's +1
    // and zero-padded a fabricated pixel instead of returning None)
    assert(MediaCodec.decodeVideoY4M("not video".getBytes).isEmpty)
    assert(MediaCodec.decodeVideoY4M(y4m.dropRight(5)).isEmpty)
    assert(MediaCodec.decodeVideoY4M(y4m.dropRight(1)).isEmpty)

    // descriptors: uniform frames stepping +10 -> mean/std/motion analytic
    val d = MediaCodec.videoDescriptors(dec)
    assert(math.abs(d(0) - 65.0) < 1e-9) // mean of 40..90
    assert(math.abs(d(2) - 10.0) < 1e-9) // |frame diff|
    assert(d(1) > 0)

    // distributed pipeline: stride-2 sampling halves n_frames; junk dropped
    val s = spark; import s.implicits._
    val media = Seq(
      MediaRow(1L, y4m, MediaMeta("video", 4, 3, 0, 200)),
      MediaRow(2L, "junk".getBytes, MediaMeta("video", 0, 0, 0, 0))).toDS()
    val vf = Multimodal.extractVideoFeatures(media, frameStride = 2,
      featureDim = 8).collect()
    assert(vf.map(_.media_id).toSeq == Seq(1L))
    assert(vf.head.n_frames == 3 && vf.head.features.length == 8)
    val again2 = Multimodal.extractVideoFeatures(media, frameStride = 2,
      featureDim = 8).collect()
    assert(vf.head.features.sameElements(again2.head.features))
  }

  test("video codec: MJPEG-in-AVI round trip (real JPEG DCT per frame)") {
    import Multimodal._
    // uniform frames reconstruct EXACTLY through JPEG (DC-only blocks) —
    // the property the wr_video_pipeline analytic oracle leans on
    val frames = (0 until 5).map(i => Array.fill[Byte](8 * 8)((40 + 8 * i).toByte))
    val avi = MediaCodec.encodeVideoAviMjpeg(8, 8, 25, 1, frames)
    // it is a real RIFF/AVI file
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF" &&
      new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val Some((w, h, fps, dec)) = MediaCodec.decodeVideoAviMjpeg(avi)
    assert(w == 8 && h == 8 && math.abs(fps - 25.0) < 0.01 && dec.size == 5)
    assert(dec.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // non-uniform content survives within JPEG tolerance (lossy, bounded)
    val tex = Array.tabulate[Byte](8 * 8)(i => (60 + (i % 8) * 4).toByte)
    val Some((_, _, _, texDec)) =
      MediaCodec.decodeVideoAviMjpeg(MediaCodec.encodeVideoAviMjpeg(8, 8, 25, 1, Seq(tex)))
    val maxErr = texDec.head.zip(tex).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 8, s"JPEG error bound blown: $maxErr")

    // a corrupt chunk with a NEGATIVE size field must decode as a drop,
    // not loop forever (the loop-advance pos = body + size - pad used to
    // re-read the same chunk for the life of the executor thread)
    val corrupt = avi.clone()
    // first chunk after the RIFF header starts at offset 12; poison its size
    corrupt(16) = -8; corrupt(17) = -1; corrupt(18) = -1; corrupt(19) = -1
    val done = new java.util.concurrent.CompletableFuture[Boolean]()
    val t = new Thread(() => {
      MediaCodec.decodeVideoAviMjpeg(corrupt); done.complete(true); ()
    })
    t.setDaemon(true); t.start()
    assert(done.get(10, java.util.concurrent.TimeUnit.SECONDS),
      "negative-size AVI chunk hung the decoder")

    // frames whose embedded JPEG geometry disagrees with avih are DROPPED
    // (mixed plane lengths crashed videoDescriptors with an AIOOBE outside
    // the decoder's catch): splice a real 4x4 JPEG as an extra 00dc chunk
    // onto the 8x8 stream — the walk reads appended chunks
    val tiny = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "jpg", baos)
    val jp = baos.toByteArray
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val spliced = avi ++ "00dc".getBytes("US-ASCII") ++ le32(jp.length) ++
      jp ++ (if (jp.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val Some((_, _, _, mixed)) = MediaCodec.decodeVideoAviMjpeg(spliced)
    assert(mixed.size == 5 && mixed.forall(_.length == 64),
      s"mismatched-geometry frame not dropped: ${mixed.map(_.length)}")
    // NON-STANDARD chunk order (movi before hdrl, so frames arrive while
    // w/h are still unset): mixed-geometry JPEGs must anchor to the first
    // accepted frame and reconcile against the late avih — never return
    // planes inconsistent with the declared geometry (pass 33: the w<=0
    // disjunct used to admit every size, and mixed plane lengths crashed
    // videoDescriptors outside the decoder's catch)
    locally {
      def chunk(id: String, body: Array[Byte]) =
        id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
          (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      def list(kind: String, body: Array[Byte]) =
        chunk("LIST", kind.getBytes("US-ASCII") ++ body)
      val jp8 = MediaCodec.encodeJpegGray(8, 8, Array.fill[Byte](64)(50))
      val movi = list("movi",
        chunk("00dc", jp) ++ chunk("00dc", jp8) ++ chunk("00dc", jp8))
      val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
        le32(3) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(8) ++ le32(8) ++
        Array.fill[Byte](16)(0)
      val hdrl = list("hdrl", chunk("avih", avih))
      val body = "AVI ".getBytes("US-ASCII") ++ movi ++ hdrl
      val weird = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
      val Some((ww, wh, _, wFrames)) = MediaCodec.decodeVideoAviMjpeg(weird)
      assert(wFrames.forall(_.length == ww.toLong * wh),
        s"geometry-inconsistent planes survived: $ww x $wh vs " +
          wFrames.map(_.length))
      MediaCodec.videoDescriptors(wFrames) // must not throw
    }

    // junk and truncation rejected; dispatching decode picks the container
    assert(MediaCodec.decodeVideoAviMjpeg("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(MediaCodec.decodeVideo(avi).map(_._4.size).contains(5))
    assert(MediaCodec.decodeVideo(
      MediaCodec.encodeVideoY4M(4, 3, 30, 1, Seq(Array.fill[Byte](12)(9))))
      .map(_._4.size).contains(1))
    // distributed pipeline over a MIXED-container corpus
    val s = spark; import s.implicits._
    val media = Seq(
      MediaRow(1L, avi, MediaMeta("video", 8, 8, 0, 200)),
      MediaRow(2L, MediaCodec.encodeVideoY4M(8, 8, 25, 1, frames),
        MediaMeta("video", 8, 8, 0, 200))).toDS()
    val vf = Multimodal.extractVideoFeatures(media, frameStride = 1,
      featureDim = 8).collect().sortBy(_.media_id)
    assert(vf.length == 2 && vf(0).n_frames == 5 && vf(1).n_frames == 5)
    // identical content ⇒ identical features regardless of container
    assert(vf(0).features.zip(vf(1).features).forall {
      case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("sampling: deterministic rates, domain mix, packing, shards, shuffle") {
    import spark.implicits._
    val n = 4000
    val df = (1 to n).map(i => (i.toLong, if (i % 2 == 0) "en" else "de",
      50L + i % 100)).toDF("id", "lang", "toks")

    // sampleKeep: observed rate within 3 points of requested; deterministic
    val kept = df.filter(Sampling.sampleKeep(col("id"), 0.3, "s1")).count()
    assert(math.abs(kept.toDouble / n - 0.3) < 0.03, s"rate ${kept.toDouble / n}")
    assert(df.filter(Sampling.sampleKeep(col("id"), 0.3, "s1")).count() == kept)
    // different seed = different (but similar-sized) selection
    val ids1 = df.filter(Sampling.sampleKeep(col("id"), 0.3, "s1"))
      .select("id").collect().map(_.getLong(0)).toSet
    val ids2 = df.filter(Sampling.sampleKeep(col("id"), 0.3, "s2"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 != ids2 && ids1.nonEmpty)
    // rate bounds: 0 keeps none, 1 keeps all
    assert(df.filter(Sampling.sampleKeep(col("id"), 0.0)).count() == 0)
    assert(df.filter(Sampling.sampleKeep(col("id"), 1.0)).count() == n)
    // null keys: no discontinuity cliff — md5(null) used to NULL the
    // predicate, silently dropping every null-key row at any rate < 1.0
    // while rate 1.0 (a lit(true) shortcut) kept them; they now hash as
    // one sentinel key and decide together, at every rate
    val withNull = Seq(Some(7L), None).toDF("id")
    assert(withNull.filter(Sampling.sampleKeep(col("id"), 1.0)).count() == 2)
    assert(withNull.filter(Sampling.sampleKeep(col("id"), 0.9999, "s"))
      .count() >= 1) // deterministic, not silently zero for the null row
    assert(withNull.filter(Sampling.domainMixKeep(col("id"), lit("en"),
      Map.empty, default = 1.0)).count() == 2) // agrees with sampleKeep(1.0)
    // discriminated null flag: a STRING key equal to the old in-namespace
    // sentinel must NOT share the null rows' hash (it collided before and
    // inherited their keep decision)
    val collide = Seq(Some("\u0000graft-null-key"), None).toDF("id")
    val hs = collide.select(Sampling.hashKey(col("id"), "s").as("h"))
      .collect().map(_.getString(0))
    assert(hs(0) != hs(1), "sentinel-valued key shares the null-key hash")

    // domainMixKeep: en halved, de kept in full (the 'g' sentinel — a
    // naive "10000" threshold would drop ~15/16 of de)
    val mixed = df.filter(Sampling.domainMixKeep(col("id"), col("lang"),
      Map("en" -> 0.5), default = 1.0, seed = "m"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixed("de") == n / 2, s"de kept ${mixed("de")}")
    assert(math.abs(mixed("en").toDouble / (n / 2) - 0.5) < 0.05)

    // packBins: concat-and-chunk — each doc lands in the bin where it
    // STARTS in the concatenated token stream
    val packed = Seq((1L, "a", 800L), (2L, "a", 800L), (3L, "a", 800L),
      (4L, "a", 2500L), (5L, "a", 100L), (1L, "b", 10L))
      .toDF("id", "shard", "toks")
      .withColumn("bin", Sampling.packBins(col("toks"), col("shard"),
        col("id"), budget = 2000L))
    val bins = packed.collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getLong(3)).toMap
    assert(bins(("a", 1L)) == 0 && bins(("a", 2L)) == 0) // start 0, 800
    assert(bins(("a", 3L)) == 0) // starts at 1600, straddles the boundary
    assert(bins(("a", 4L)) == 1) // starts at 2400; oversized spans onward
    assert(bins(("a", 5L)) == 2) // starts at 4900
    assert(bins(("b", 1L)) == 0) // shards independent

    // shardOf: all in range, roughly balanced, deterministic
    val shards = df.withColumn("s", Sampling.shardOf(col("id"), 8))
      .groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(shards.map(_._1).sorted.toSeq == (0 until 8))
    assert(shards.forall { case (_, c) => c > n / 8 * 0.7 && c < n / 8 * 1.3 })

    // shuffleOrder: a permutation, stable across runs, seed-sensitive
    val p1 = df.orderBy(Sampling.shuffleOrder(col("id"), "e0"), col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    val p2 = df.orderBy(Sampling.shuffleOrder(col("id"), "e0"), col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    val p3 = df.orderBy(Sampling.shuffleOrder(col("id"), "e1"), col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(p1 == p2 && p1 != p3 && p1.sorted == (1L to n).toSeq)
  }

  test("repetition rules and PII redaction on crafted texts") {
    import spark.implicits._
    val df = Seq(
      "a\nb\na\nb\na",                     // 5 lines, 2 distinct -> 3/5 dup
      "x\ny\nz",                           // all distinct -> 0
      "buy now buy now buy now",           // "now buy" x2? top 2-gram
      "mail me joe.doe+x@sub.example.org or 10.1.2.3 tel 55-123-456-7890 ok",
      "clean text with no pii at all").toDF("text")
    val r = df.select(col("text"),
      TextOps.dupLineFraction(col("text")).as("dl"),
      TextOps.topNgramFraction(col("text"), 2).as("tg"),
      TextOps.redactPii(col("text")).as("red")).collect()
    assert(math.abs(r(0).getAs[Double]("dl") - 0.6) < 1e-9)
    assert(r(1).getAs[Double]("dl") == 0.0)
    // "buy now buy now buy now": grams = [buy now, now buy, buy now, now buy,
    // buy now] -> top = 3/5
    assert(math.abs(r(2).getAs[Double]("tg") - 0.6) < 1e-9)
    assert(r(3).getAs[String]("red") ==
      "mail me <EMAIL> or <IP> tel <PHONE> ok")
    assert(r(4).getAs[String]("red") == "clean text with no pii at all")
    // the dominant NANP shapes: plain 3-3-4 and a one-digit country code —
    // the old mandatory 2-3 digit lead left BOTH unredacted
    val nanp = Seq("call 555-123-4567 or +1 212.555.0199 now").toDF("text")
      .select(TextOps.redactPii(col("text"))).collect()(0).getString(0)
    assert(nanp == "call <PHONE> or <PHONE> now", nanp)
  }

  test("unicode hygiene: NFC/NFKC folding, mojibake repair is conservative") {
    import spark.implicits._
    val df = Seq(
      ("combining", "cafe\u0301"),     // e + combining acute
      ("ligature", "\ufb01le"),        // fi-ligature + "le"
      ("mojibake", "caf\u00c3\u00a9"), // UTF-8 e-acute read as Latin-1
      ("clean", "caf\u00e9"),          // already correct
      ("ascii", "plain text")
    ).toDF("k", "t")
    val out = df.select(col("k"),
      graft.wrangling.TextOps.normalizeNfc(col("t")).as("nfc"),
      graft.wrangling.TextOps.normalizeNfkc(col("t")).as("nfkc"),
      graft.wrangling.TextOps.fixMojibake(col("t")).as("fixed"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out("combining")._1 == "caf\u00e9") // NFC precomposes
    assert(out("ligature")._1 == "\ufb01le")   // NFC keeps the ligature
    assert(out("ligature")._2 == "file")        // NFKC folds it
    assert(out("mojibake")._3 == "caf\u00e9")  // repaired
    assert(out("clean")._3 == "caf\u00e9")     // lone e-acute invalid UTF-8 -> kept
    assert(out("ascii")._3 == "plain text")     // ASCII round-trips untouched
    // text above U+00FF passes through UNTOUCHED: the Latin-1 re-encode is
    // lossy there ('?' for every such char, which IS valid UTF-8) — the
    // old guard passed and destroyed every CJK/Cyrillic/emoji document
    val intl = Seq(("zh", "\u65e5\u672c\u8a9e text"),
      ("ru", "\u043f\u0440\u0438\u0432\u0435\u0442"),
      ("emoji", "ok \ud83d\ude00")).toDF("k", "t")
      .select(col("k"), graft.wrangling.TextOps.fixMojibake(col("t")).as("f"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(intl("zh") == "\u65e5\u672c\u8a9e text", intl("zh"))
    assert(intl("ru") == "\u043f\u0440\u0438\u0432\u0435\u0442")
    assert(intl("emoji") == "ok \ud83d\ude00")
    // null safety
    val n = Seq((1, null: String)).toDF("k", "t")
      .select(graft.wrangling.TextOps.normalizeNfc(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("normalizeUrl: canonical dedup key across the classic variants") {
    import spark.implicits._
    val cases = Seq(
      // case + www + default port + trailing slash all fold
      ("HTTP://WWW.Example.COM:80/", "http://example.com"),
      ("https://Example.com:443/a/b/", "https://example.com/a/b"),
      // tracking params: leading, middle, trailing; ?/& repair
      ("http://x.com/p?utm_source=a&id=1", "http://x.com/p?id=1"),
      ("http://x.com/p?id=1&utm_campaign=b", "http://x.com/p?id=1"),
      ("http://x.com/p?utm_source=a", "http://x.com/p"),
      ("http://x.com/p?id=1&fbclid=zz&k=2", "http://x.com/p?id=1&k=2"),
      // trailing slash before the query collapses
      ("http://x.com/p/?id=1", "http://x.com/p?id=1"),
      ("http://x.com/p/?utm_source=m&id=1", "http://x.com/p?id=1"),
      // fragment dropped; non-default port kept; path case preserved
      ("http://x.com/Path#frag", "http://x.com/Path"),
      ("http://x.com:8080/p", "http://x.com:8080/p"),
      // '&' in the PATH is legal (RFC 3986) and must survive — the old
      // blanket &->? repair turned these into bogus query strings
      ("https://x.com/a&b", "https://x.com/a&b"),
      ("https://x.com/a&b?utm_source=m&q=1", "https://x.com/a&b?q=1"),
      ("https://x.com/a&b?q=1", "https://x.com/a&b?q=1"),
      // dangling separators from stripped params drop
      ("http://x.com/p?id=1&", "http://x.com/p?id=1"),
      ("http://x.com/p?", "http://x.com/p"),
      // not a URL -> untouched
      ("just words", "just words"))
    val out = cases.map(_._1).toDF("u")
      .select(graft.wrangling.TextOps.normalizeUrl(col("u"))).collect()
      .map(_.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
    // idempotent: normalizing a normal form is a no-op
    val again = cases.map(_._2).toDF("u")
      .select(graft.wrangling.TextOps.normalizeUrl(col("u"))).collect()
      .map(_.getString(0))
    assert(again.toSeq == cases.map(_._2))
  }

  test("text ops survive degenerate documents under ANSI mode") {
    import spark.implicits._
    // empty, whitespace-only, and shorter-than-shingle docs are inevitable
    // in a real corpus; unguarded they abort the whole job (ANSI /0 and
    // element_at over the descending sequence(0, size-n))
    val stop = Seq("a", "the")
    val docs = Seq(
      (1L, ""), (2L, "   \t\n "), (3L, "one"), (4L, "one two"),
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val scored = docs.select(col("doc_id"),
      TextOps.avgWordLen(col("text")).as("awl"),
      TextOps.punctRatio(col("text")).as("pr"),
      TextOps.stopwordRatio(col("text"), stop).as("sr"),
      TextOps.qualityScore(col("text"), stop).as("q"),
      size(TextOps.wordShingles(col("text"), 3)).as("nsh"),
      TextOps.topNgramFraction(col("text"), 2).as("topng"),
      TextOps.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(scored(1).getAs[Double]("awl") == 0.0)
    // empty doc: lenScore 0 + punctOk 1 + stopOk 0 over 3
    assert(scored(1).getAs[Double]("q") == 0.333333)
    assert(scored(2).getAs[Double]("sr") == 0.0)
    assert(scored(3).getAs[Int]("nsh") == 0)   // 1 token -> no 3-grams
    assert(scored(4).getAs[Int]("nsh") == 0)   // 2 tokens -> no 3-grams
    assert(scored(5).getAs[Int]("nsh") == 7)
    assert(scored(5).getAs[Double]("awl") > 3.0)
    // the full pipelines run end-to-end over the degenerate rows too;
    // shingle-less docs (< n tokens) simply have no signature
    assert(Dedup.minhashSignaturesFast(docs, "doc_id", "text").count() == 1)
    assert(Dedup.minhashSignaturesFast(docs, "doc_id", "text",
      shingleN = 1).count() == 3)
    val survivors = Dedup.corpusDedup(docs, "doc_id", "text", threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // empty and whitespace-only texts normalize equal -> exact stage keeps 1
    assert(survivors == Set(1L, 3L, 4L, 5L), s"survivors $survivors")
  }

  test("similarity ops survive zero-norm vectors; zero queries reject loudly") {
    import spark.implicits._
    val dim = 8
    def vec(seed: Int) = (0 until dim).map(j =>
      ((seed * 31 + j * 7) % 10 + 1).toFloat)
    val emb = (Seq((0L, vec(1)), (1L, vec(2)), (2L, vec(3)),
      (3L, (0 until dim).map(_ => 0.0f)))) // the zero row
      .toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(emb, "vec_id", "embedding",
      vec(1).toArray, 4).collect()
    assert(top.length == 4)
    val zeroSim = top.find(_.getLong(0) == 3L).get.getAs[Double]("cos_sim")
    assert(zeroSim == 0.0) // zero vector scores 0, doesn't abort the scan
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.5, dim = dim).collect()
    assert(pairs.forall(r => !r.isNullAt(2)))
    val ex = intercept[IllegalArgumentException] {
      Similarity.cosineTopK(emb, "vec_id", "embedding",
        Array.fill(dim)(0.0f), 3)
    }
    assert(ex.getMessage.contains("zero norm"))
    // ivfAssign places the zero vector deterministically (centroid 0)
    val cents = Seq(vec(1).map(_.toDouble).toArray, vec(2).map(_.toDouble).toArray)
    val assigned = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
      .select("vec_id", "__ci").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned(3L) == 0)
  }

  test("span dedup finds maximal cross-doc spans, unions coverage, drops boilerplate-heavy docs") {
    import spark.implicits._
    val a = (0 until 20).map(i => s"a$i")
    val doc1 = a.mkString(" ")                                  // a0..a19
    val doc2 = ("b0 b1 " + a.slice(4, 14).mkString(" ") + " b2 b3") // a4..a13 at pos 2..11 of 14
    val doc3 = ("c0 " + a.slice(4, 14).mkString(" ") + " c1 c2")    // a4..a13 at pos 1..10 of 13
    val doc4 = "z0 z1 z2 z3 z4 z5 z6 z7"
    val tiny = "t0 t1"                                          // shorter than one window
    val docs = Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4), (5L, tiny))
      .toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", spanTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    // the 10-token shared run merges into ONE maximal span per pair
    assert(spans == Set((1L, 2L, 4, 2, 10L), (1L, 3L, 4, 1, 10L), (2L, 3L, 2, 1, 10L)),
      s"spans $spans")
    // hot-shingle valve: the shared windows appear in 3 docs > maxDocFreq=2
    assert(SpanDedup.duplicateSpans(docs, "doc_id", "text",
      spanTokens = 5, maxDocFreq = 2).count() == 0)
    // coverage unions overlapping intervals from different partners
    val cov = SpanDedup.spanCoverage(docs, "doc_id", "text",
      SpanDedup.duplicateSpans(docs, "doc_id", "text", spanTokens = 5))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Double]("covered_frac"))).toMap
    assert(cov(2L)._1 == 10L && math.abs(cov(2L)._2 - 10.0 / 14) < 1e-12)
    assert(cov(3L)._1 == 10L && math.abs(cov(3L)._2 - 10.0 / 13) < 1e-12) // union, not 20
    assert(!cov.contains(1L)) // keeper side: no incoming spans
    // corpusDedup optional stage drops the span-heavy docs, keeps the rest
    val kept = Dedup.corpusDedup(docs, "doc_id", "text",
      spanTokens = Some(5), spanCoverageDrop = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L), s"kept $kept")
    // excision: the higher-id copies lose exactly the covered tokens
    // (overlapping spans once), the keeper and untouched docs pass
    // through byte-identical (original whitespace preserved)
    val ex = SpanDedup.exciseSpans(docs, "doc_id", "text",
      SpanDedup.duplicateSpans(docs, "doc_id", "text", spanTokens = 5))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("removed_tokens"))).toMap
    assert(ex(1L) == (doc1, 0L))
    assert(ex(5L) == (tiny, 0L))
    assert(ex(2L) == ("b0 b1 b2 b3", 10L), s"got ${ex(2L)}")
    assert(ex(3L) == ("c0 c1 c2", 10L), s"got ${ex(3L)}")
  }

  test("span-dedup hot-shingle valve bounds the join, reports drops, and is armed in corpusDedup") {
    import spark.implicits._
    // 12 docs sharing one verbatim 4-token footer (the hot shingle: one
    // window hash at df=12 -> C(12,2)=66 pair hits unvalved) + one genuine
    // low-df duplicated span between docs 100 and 101
    val footer = "alpha beta gamma delta"
    val hot = (0L until 12L).map(i => (i, s"u${i}x u${i}y u${i}z $footer"))
    val genuine = Seq(
      (100L, "p0 p1 p2 zeta eta theta iota"),
      (101L, "zeta eta theta iota q0"))
    val docs = (hot ++ genuine).toDF("doc_id", "text")
    // unvalved: the footer's 66 pair spans + 1 genuine span
    val (open, noRep) = SpanDedup.duplicateSpansReported(
      docs, "doc_id", "text", spanTokens = 4)
    assert(noRep.isEmpty) // valve off -> nothing dropped, nothing to report
    assert(open.count() == 67)
    // valved at 5: the footer window (df=12 > 5) is excluded BEFORE the
    // self-join, only the genuine pair survives — and the drop is VISIBLE
    val (valved, Some(rep)) = SpanDedup.duplicateSpansReported(
      docs, "doc_id", "text", spanTokens = 4, maxDocFreq = 5)
    val vr = valved.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(vr.toSeq == Seq((100L, 101L, 3, 0, 4L)), s"got ${vr.toSeq}")
    assert(rep == SpanDedup.ValveReport(maxDocFreq = 5, droppedHashes = 1,
      droppedWindows = 12))
    // the queryable face: WHICH hash was hot, with its df and window mass
    val hw = SpanDedup.hotWindows(docs, "doc_id", "text",
      spanTokens = 4, maxDocFreq = 5).collect()
    assert(hw.length == 1)
    assert(hw(0).getAs[Long]("doc_freq") == 12 &&
      hw(0).getAs[Long]("window_count") == 12)
    // the PACKAGED pipeline arms the valve by default (1000): a footer in
    // 1005 docs is over the cap, so its would-be 1005² hit rows never
    // materialize and no doc is dropped for footer coverage alone; the
    // genuine high-coverage copy (doc 2101, 4 of 5 tokens duplicated)
    // still goes. Unvalved, every non-min footer doc (4 of 7 tokens
    // >= 0.5) would have been dropped too.
    assert(SpanDedup.DefaultSpanMaxDocFreq == 1000L)
    val big = (0L until 1005L).map(i => (i, s"u${i}x u${i}y u${i}z $footer")) ++
      Seq((2100L, "p0 p1 p2 zeta eta theta iota"),
        (2101L, "zeta eta theta iota q0"))
    val kept = Dedup.corpusDedup(big.toDF("doc_id", "text"), "doc_id", "text",
      spanTokens = Some(4)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(2101L))
    assert(kept.size == 1006, s"kept ${kept.size}") // 1005 footer docs + 2100
  }

  test("span-dedup grouped pair pass (valved) ≡ self-join pass (unvalved) under within-doc repeats") {
    import spark.implicits._
    // r18 rewrite guard: the valved path generates candidate pairs by
    // grouping each hash's occurrences and exploding pairs in place; the
    // unvalved path keeps the r13 self-join. The two must produce the
    // same spans whenever nothing is actually over the cap — including
    // the shapes that stress the pair semantics: a window REPEATED
    // WITHIN one doc (multiple occurrences, same id) and a cross-doc
    // match at several alignments (one span per diagonal).
    val docA = "p q r s p q r"   // window [p q r] at pos 0 AND 4
    val docB = "z p q r s w"     // [p q r] at 1, [q r s] at 2
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val expect = Set(
      (1L, 2L, 0, 1, 4L),  // diag −1: windows at pos_a 0,1 merge (len 2+3−1)
      (1L, 2L, 4, 1, 3L))  // diag 3: the repeated window's second alignment
    def spanSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).toSet
    val grouped = spanSet(SpanDedup.duplicateSpans(
      docs, "doc_id", "text", spanTokens = 3, maxDocFreq = 10))
    val joined = spanSet(SpanDedup.duplicateSpans(
      docs, "doc_id", "text", spanTokens = 3))
    assert(grouped == expect, s"grouped $grouped")
    assert(joined == expect, s"joined $joined")
    // same-doc occurrence pairs must NOT leak through either path: docA
    // alone (its repeated window pairs only with itself) yields nothing
    assert(SpanDedup.duplicateSpans(Seq((1L, docA)).toDF("doc_id", "text"),
      "doc_id", "text", spanTokens = 3, maxDocFreq = 10).count() == 0)
  }

  test("chunkBitsFor holds expected bucket size; auto-sized near-dups match the pinned blocking") {
    import spark.implicits._
    import Similarity.chunkBitsFor
    // the rule: smallest width with n / 2^chunkBits <= targetBucket,
    // clamped to [4, 30] — the r13 one-long packing capped this at 15
    // (saturating at ~2M vectors); bands are array<long> now, so the
    // width keeps tracking the corpus another 15 doublings
    assert(chunkBitsFor(0) == 4)
    assert(chunkBitsFor(1024, 64) == 4) // 1024 / 2^4 = 64 exactly
    assert(chunkBitsFor(1025, 64) == 5) // one row over -> one more bit
    assert(chunkBitsFor(64L << 10, 64) == 10)
    assert(chunkBitsFor(64L << 15, 64) == 15) // the OLD clamp point...
    assert(chunkBitsFor(64L << 20, 64) == 20) // ...now passed through
    assert(chunkBitsFor(Long.MaxValue) == 30) // cost-driven ceiling
    assert((1 to 35).forall(k =>
      chunkBitsFor(64L << k) == math.min(30, math.max(4, k))))
    assert(chunkBitsFor(1L << 20, targetBucket = 1024) == 10) // dial is linear in bucket cost
    intercept[IllegalArgumentException](chunkBitsFor(100, 0))
    // auto path == explicit path with the derived values: 2000 rows ->
    // cb = ceil(log2(2000/64)) = 5, bits = 4*5 = 20
    val dim = 8
    val emb = (0L until 2000L).map(i =>
      (i, (0 until dim).map(j => (((i * 31 + j * 7) % 19) - 9).toFloat)))
      .toDF("vec_id", "embedding")
    assert(chunkBitsFor(2000) == 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = pairs(Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.9, dim = dim))
    val pinned = pairs(Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.9, dim = dim,
      bits = 20, chunkBits = 5))
    assert(auto == pinned && auto.nonEmpty, s"auto=${auto.size} pinned=${pinned.size}")
    // malformed blocking shapes reject at plan time
    intercept[IllegalArgumentException](Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", 0.9, dim, bits = 10, chunkBits = 4))
    // blocking WIDER than the old 60-bit one-long ceiling works now
    // (array-of-longs bands): 4 bands x 16 bits = 64 signature bits;
    // precision stays exact (every returned pair re-verified >= 0.9),
    // and passing corpusCount skips the plan-construction count() job
    val wide = Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", 0.9, dim, bits = 64, chunkBits = 16)
      .collect()
    assert(wide.forall(_.getAs[Double]("cos_sim") >= 0.9))
    assert(pairs(Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.9, dim = dim,
      corpusCount = 2000L)) == auto) // explicit n == derived n
    // pinning bits ALONE keeps the historical band width (cb=4), it does
    // NOT derive cb from the corpus — on this 2000-row frame a derived
    // cb=5 would make bits=32 crash corpus-dependently (32 % 5 != 0)
    assert(pairs(Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", 0.9, dim, bits = 32)) ==
      pairs(Similarity.cosineNearDupPairs(
        emb, "vec_id", "embedding", 0.9, dim, bits = 32, chunkBits = 4)))
  }

  test("LSH banding rejects non-divisible bands; corpusDedup rejects string ids") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesFast(docs, "doc_id", "text", 32, 1)
    val ex1 = intercept[IllegalArgumentException] {
      Dedup.minhashCandidatesFromSig(sigs, "doc_id", numHashes = 32, bands = 5)
    }
    assert(ex1.getMessage.contains("divide"))
    val strDocs = Seq(("doc-1", "a b c"), ("doc-2", "a b d")).toDF("doc_id", "text")
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.corpusDedup(strDocs, "doc_id", "text")
    }
    assert(ex2.getMessage.contains("integral"))
    // lshTopK holds the same rule: a floor division would silently drop
    // the trailing bits % chunkBits signature bits from the chunk match
    val emb = Seq((1L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val ex3 = intercept[IllegalArgumentException] {
      Similarity.lshTopK(emb, "vec_id", "embedding",
        Array.fill(8)(1.0f), k = 1, dim = 8, bits = 16, chunkBits = 5)
    }
    assert(ex3.getMessage.contains("divide"))
  }

  test("rollingHash: equal texts equal, different texts differ") {
    import spark.implicits._
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "a b c x"))
      .toDF("t1", "t2")
    val r = df.select(
      (TextOps.rollingHash(col("t1")) === TextOps.rollingHash(col("t2"))).as("eq"))
      .collect().map(_.getBoolean(0))
    assert(r(0) && !r(1))
    // LONG documents hash instead of aborting: the unguarded acc*31 fold
    // overflowed Long after ~10 tokens, which ANSI mode turns into a
    // job-killing SparkArithmeticException — every real doc threw
    val long1 = (1 to 200).map(i => s"w$i").mkString(" ")
    val long2 = (1 to 200).map(i => s"w$i").mkString(" ") + " tail"
    val lr = Seq((long1, long1), (long1, long2)).toDF("t1", "t2")
      .select((TextOps.rollingHash(col("t1")) ===
        TextOps.rollingHash(col("t2"))).as("eq"))
      .collect().map(_.getBoolean(0))
    assert(lr(0) && !lr(1))
    // null text labels NULL, not "zh" (struct argmax ranked null scores
    // below zh's 0-coalescing branch)
    val nullLang = Seq((1, null: String)).toDF("k", "t")
      .select(TextOps.langId(col("t"))).collect()(0)
    assert(nullLang.isNullAt(0))
  }

  test("tokens: whitespace runs / tabs / newlines yield no empty tokens") {
    import spark.implicits._
    // the oracle mirrors splice the same \s+-split-drop-empty tokenizer
    // (Wrangling.sqlWithToks), so parity must not depend on the corpus
    // being single-spaced — these are the shapes that broke the old
    // single-space split
    val got = Seq("  a\t\tb \n c ", "one", "", "\t\n", "x  y")
      .toDF("text")
      .select(TextOps.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a", "b", "c"))
    assert(got(1) == Seq("one"))
    assert(got(2).isEmpty && got(3).isEmpty)
    assert(got(4) == Seq("x", "y"))
    // tokenCount agrees with the array (not a chars-minus-spaces identity)
    val n = Seq("  a\t\tb \n c ").toDF("text")
      .select(TextOps.tokenCount(col("text"))).as[Int].collect()(0)
    assert(n == 3)
  }

  test("tfIdfTopK: rare terms outrank common ones, k bounds per-doc rows") {
    import spark.implicits._
    // 'shared' is in every doc (idf = ln(1) = 0 → never top); each doc's
    // unique term carries full idf; doc 1 repeats its unique term so tf
    // scales the score
    val docs = Seq(
      (1L, "shared unique1 unique1 shared common12"),
      (2L, "shared unique2 common12"),
      (3L, "shared unique3")).toDF("doc_id", "text")
    val got = TextOps.tfIdfTopK(docs, "doc_id", "text", 2)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.count(_._1 == 1L) == 2) // k bounds output
    // per-doc winner is the unique term; tf=2 doubles doc 1's score
    val d1 = got.filter(_._1 == 1L)
    assert(d1.head._2 == "unique1" && d1.head._3 == 2L && d1.head._4 == 1L)
    val d2 = got.filter(_._1 == 2L)
    assert(d2.head._2 == "unique2")
    assert(d1.head._5 == 2 * d2.head._5) // tf linearity at equal idf
    // the everywhere-term scores zero and never ranks above a unique term
    assert(got.filter(_._2 == "shared").forall(_._5 == 0.0))
  }
}

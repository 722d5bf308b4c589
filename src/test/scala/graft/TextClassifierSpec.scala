package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.wrangling.{TextClassifier, TextOps}

class TextClassifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Deterministic corpus: clean docs are sentences from a small English
    * pool; junk docs are consonant/punctuation noise — the separable
    * clean-vs-junk shape a bootstrapped quality classifier must nail. */
  private def corpus(n: Int): Seq[(Long, String, String)] = {
    val rng = new scala.util.Random(42)
    val pool = Vector("the", "quick", "brown", "fox", "jumps", "over", "a",
      "lazy", "dog", "and", "runs", "into", "green", "fields", "while",
      "birds", "sing", "in", "morning", "light")
    val junkChars = "zxqvkj#%@!$^&*~|\\/<>{}[]"
    (0L until n).map { i =>
      if (i % 2 == 0)
        (i, (0 until 30).map(_ => pool(rng.nextInt(pool.size))).mkString(" "),
          "clean")
      else
        (i, (0 until 8).map(_ => (0 until 12)
          .map(_ => junkChars(rng.nextInt(junkChars.length))).mkString)
          .mkString(" "), "junk")
    }
  }

  test("clean-vs-junk quality model: holdout accuracy >= 0.9") {
    import spark.implicits._
    val docs = corpus(200).toDF("id", "text", "label")
    val train = docs.filter($"id" % 5 =!= 0)
    val holdout = docs.filter($"id" % 5 === 0)
    val model = TextClassifier.train(train, "text", "label",
      numFeatures = 1 << 12, maxIter = 30)
    assert(model.labels == Seq("clean", "junk"))
    val scored = model.score(holdout, "text")
    val acc = scored.agg(
      avg(when($"predicted" === $"label", 1.0).otherwise(0.0))).first.getDouble(0)
    assert(acc >= 0.9, s"holdout accuracy $acc")
    // confidence is a probability and the model is certain on separable data
    val minConf = scored.agg(min($"confidence")).first.getDouble(0)
    assert(minConf > 0.5 && minConf <= 1.0)
  }

  test("weak-supervision bootstrap: heuristic labels train a scoring pass") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val stop = Seq("the", "a", "and", "of", "to", "in", "is")
    // weak labels from the closed-form heuristic (the CCNet shape:
    // heuristic/trusted-source split -> learned generalizer)
    val labeled = docs.withColumn("wl",
      when(TextOps.qualityScore(col("text"), stop) >= 0.55, "hi")
        .otherwise("lo"))
    val counts = labeled.groupBy("wl").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.size == 2, s"degenerate weak labels: $counts")
    val model = TextClassifier.train(labeled, "text", "wl",
      numFeatures = 1 << 12, maxIter = 30)
    val scored = model.score(labeled, "text")
    // the learned model reproduces the signal it was trained on (sanity
    // floor — proves end-to-end trainability, not generalization)
    val agree = scored.agg(
      avg(when($"predicted" === $"wl", 1.0).otherwise(0.0))).first.getDouble(0)
    assert(agree >= 0.7, s"train agreement $agree")
    // scoring is deterministic: same model, same rows, same predictions
    val again = model.score(labeled, "text")
      .select("doc_id", "predicted").except(
        scored.select("doc_id", "predicted"))
    assert(again.count() == 0)
  }

  test("null text scores without crashing; null labels reject loudly") {
    import spark.implicits._
    val train = Seq(
      (1L, "good solid prose with words", "hi"),
      (2L, "zz zz zz zz zz zz", "lo"),
      (3L, "more decent text content here", "hi"),
      (4L, "qq qq qq qq", "lo")).toDF("id", "text", "lbl")
    val model = TextClassifier.train(train, "text", "lbl",
      numFeatures = 1 << 10, maxIter = 10)
    // one null-text row must not NPE the whole scoring job
    val toScore = Seq((10L, "good words content"), (11L, null: String))
      .toDF("id", "text")
    val scored = model.score(toScore, "text").collect()
    assert(scored.length == 2)
    assert(scored.forall(_.getAs[String]("predicted") != null))
    val ex = intercept[IllegalArgumentException] {
      TextClassifier.train(
        train.withColumn("lbl",
          when(col("id") === 4L, lit(null: String)).otherwise(col("lbl"))),
        "text", "lbl", numFeatures = 1 << 10, maxIter = 5)
    }
    assert(ex.getMessage.contains("null labels"))
  }
}

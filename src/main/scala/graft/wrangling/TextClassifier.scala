package graft.wrangling

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned text classifier — the fasttext-shaped model behind production
  * corpus filters (CCNet-style quality classifiers, learned language-ID):
  * hashed bag of word tokens + char 3-grams → multinomial logistic
  * regression. Complements the closed-form heuristics in [[TextOps]]; the
  * standard bootstrap is to weak-label a corpus with those heuristics (or a
  * trusted/untrusted source split) and train this model on the labels.
  *
  * Scale shape: featurization is pure Column expressions + HashingTF (one
  * narrow map), training is mllib's lbfgs (treeAggregate per iteration —
  * the only shuffles, logarithmic in executors), and SCORING — the part
  * that runs over the full 100 TB — is map-only: coefficients broadcast,
  * no shuffle, no state.
  */
object TextClassifier {

  /** Feature units: word tokens plus char 3-grams of the lowercased text
    * (subword grams are what make the linear model robust to inflection
    * and junk — the fasttext recipe). Null text featurizes as empty (one
    * null row must not NPE HashingTF and kill a 100 TB scoring job), and
    * char grams keep their MULTIPLICITY — a distinct'd extraction would
    * binarize subword counts, making 'aaaaaa…' junk look like one
    * occurrence, exactly the signal the char grams exist to carry. */
  def featureGrams(text: Column): Column = {
    val t = lower(coalesce(text, lit("")))
    // empties dropped: split on leading whitespace (and on empty/null
    // text) emits "" — HashingTF hashed it into a real bucket, leaking
    // "starts with whitespace / is empty" as a learned class signal
    concat(filter(split(t, "\\s+"), w => w =!= ""),
      regexp_extract_all(t, lit("(?s)(?=(.{3}))"), lit(1)))
  }

  final case class TextModel(lr: LogisticRegressionModel,
      labels: Seq[String], numFeatures: Int) {

    /** Adds `predicted` (label string) and `confidence` (winning class
      * probability) to `df`. Map-only: the model rides to executors as a
      * broadcast of its coefficient matrix. */
    def score(df: DataFrame, textCol: String): DataFrame = {
      val feats = new HashingTF().setInputCol("__grams")
        .setOutputCol("__features").setNumFeatures(numFeatures)
        .transform(df.withColumn("__grams", featureGrams(col(textCol))))
      // score on a COPY: Param setters mutate the shared model in place,
      // so two threads scoring one TextModel concurrently could read
      // half-updated column names
      lr.copy(org.apache.spark.ml.param.ParamMap.empty)
        .setFeaturesCol("__features").setPredictionCol("__pred")
        .setProbabilityCol("__prob").setRawPredictionCol("__raw")
        .transform(feats)
        .withColumn("predicted",
          element_at(array(labels.map(lit): _*), col("__pred").cast("int") + 1))
        .withColumn("confidence",
          array_max(vector_to_array(col("__prob"))))
        .drop("__grams", "__features", "__pred", "__prob", "__raw")
    }
  }

  /** Train on `labelCol` (any type; distinct values become the classes,
    * sorted for a deterministic index). */
  def train(df: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 15, maxIter: Int = 60,
      regParam: Double = 1e-3): TextModel = {
    val rawLabels = df.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0))
    require(!rawLabels.contains(null),
      s"train: '$labelCol' contains null labels — drop or impute them " +
        "first (a null would sort-NPE here and could never match a class)")
    val labels = rawLabels.sorted.toSeq
    require(labels.size >= 2, "need at least two classes")
    val idx = labels.zipWithIndex.toMap
    val labelExpr = labels.tail.foldLeft(
      lit(idx(labels.head).toDouble)) { (acc, l) =>
      when(col(labelCol).cast("string") === l, lit(idx(l).toDouble))
        .otherwise(acc)
    }
    // materialize featurization once — every LBFGS iteration re-reads the
    // training set, and re-running the tokenize/shingle/hash chain per
    // iteration dwarfs the actual gradient work
    val feats = new HashingTF().setInputCol("__grams")
      .setOutputCol("features").setNumFeatures(numFeatures)
      .transform(df.withColumn("__grams", featureGrams(col(textCol))))
      .select(labelExpr.as("label"), col("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lr = new LogisticRegression()
        .setMaxIter(maxIter).setRegParam(regParam).setElasticNetParam(0.0)
        .setFamily(if (labels.size > 2) "multinomial" else "binomial")
      TextModel(lr.fit(feats), labels, numFeatures)
    } finally feats.unpersist(false)
  }
}

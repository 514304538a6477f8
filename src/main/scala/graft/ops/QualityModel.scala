package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classification — the CCNet / GPT-3 filtering
  * pattern (Wenzek et al. 2020, arXiv:1911.00359; Brown et al. 2020
  * §A): train a linear classifier to separate a TRUSTED slice of the
  * corpus from raw text, then score every document and keep the
  * high-probability tail. Complements the rule ensemble
  * ([[TextAnalysis]] quality signals): rules encode what we can name,
  * the classifier picks up lexical signal we can't.
  */
object QualityModel {

  /** Train a logistic-regression quality model on hashing-trick
    * bag-of-words features and score every document.
    *
    * Spark-first: `HashingTF` IS the hashing trick as a native
    * transformer (a map, no shuffle), and MLlib's `LogisticRegression`
    * is the distributed trainer (per-iteration gradient treeAggregate —
    * the same bounded driver collect the k-means trainer does).
    * Scoring is one narrow map over the corpus with the model
    * broadcast. Seed-pinned and deterministic up to float-sum order in
    * the gradient aggregate, so specs assert SEPARATION (every trusted
    * doc outscores every junk doc on held-out data), not exact
    * probabilities — the same verification stance as [[Similarity
    * .annIvfTrained]]'s MLlib path (not oracle-expressible; the
    * rule-based quality ops carry the CORRECTNESS entries).
    *
    * Returns (idCol, label, p_good) — `label` the training label the
    * caller supplied (1.0 trusted / 0.0 raw), `p_good` the model's
    * probability of the trusted class.
    */
  def trainQualityScores(docs: DataFrame, isTrusted: Column,
                         dims: Int = 1024, maxIter: Int = 20,
                         regParam: Double = 0.01,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.HashingTF
    import org.apache.spark.ml.functions.vector_to_array
    val base = docs.select(col(idCol),
      isTrusted.cast("double").as("label"),
      Dedup.tokens(col(textCol)).as("__tokens"))
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__features")
      .setNumFeatures(dims)
      .transform(base)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("label").setFeaturesCol("__features")
    val model = lr.fit(tf)
    model.transform(tf)
      .select(col(idCol), col("label"),
        element_at(vector_to_array(col("probability")), 2).as("p_good"))
  }
}

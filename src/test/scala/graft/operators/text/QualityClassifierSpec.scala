package graft.operators.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("trained classifier ranks the target language above its base rate") {
    val top = QualityClassifier.qQualityClassifier(spark, SfDir).collect()
    assert(top.length == 20)
    val enShare = top.count(_.getString(1) == "en").toDouble / top.length
    val corpus = graft.Tables.documents(spark, SfDir)
    val base = corpus.filter(col("lang") === "en").count().toDouble / corpus.count()
    assert(enShare > base,
      s"trained classifier top-20 en share $enShare must beat base rate $base")
    // scores are valid probabilities, descending, deterministically tied
    val ps = top.map(_.getDouble(2))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }

  test("model is memoized per dir (identical literal replay for the oracle)") {
    val w1 = QualityClassifier.model(spark, SfDir)
    val w2 = QualityClassifier.model(spark, SfDir)
    assert(w1 eq w2, "model() must return the memoized instance")
    assert(w1.length == 4 && w1.forall(v => !v.isNaN && !v.isInfinite))
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The learned quality filter: it must actually LEARN (separate a
  * planted vocabulary), deterministically (partitioning cannot move
  * the trained weights), and degrade safely (feature-less docs score
  * from the bias alone).
  */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  // planted separable corpus: positives speak "quality prose words",
  // negatives speak "spam noise words"; ids interleave so any
  // id-correlated shortcut fails
  private def corpus = (0 until 80).map { i =>
    val pos = i % 2 == 0
    val words =
      if (pos) Seq("measured", "analysis", "careful", "evidence", "method")
      else Seq("buy", "click", "free", "winner", "pills")
    val text = (0 until 12).map(j => words((i + j) % words.size)).mkString(" ")
    (i.toLong, text, if (pos) 1.0 else 0.0)
  }.toDF("doc_id", "text", "y")

  test("separates a planted vocabulary: every positive outscores every negative") {
    val model = Classifier.trainLogReg(corpus, col("y"),
      buckets = 64, iterations = 8, learningRate = 8.0)
    val scores = Classifier.scoreLogReg(corpus, model)
      .join(corpus.select("doc_id", "y"), Seq("doc_id"))
      .collect().map(r => (r.getAs[Double]("y"), r.getAs[Double]("score")))
    val minPos = scores.filter(_._1 == 1.0).map(_._2).min
    val maxNeg = scores.filter(_._1 == 0.0).map(_._2).max
    assert(minPos > maxNeg,
      s"filter failed to separate: min positive $minPos <= max negative $maxNeg")
    // and the margin is real, not epsilon luck
    assert(minPos - maxNeg > 0.05)
  }

  test("trained weights are partitioning-invariant (the float-rounded gradient contract)") {
    val m1 = Classifier.trainLogReg(corpus.repartition(1), col("y"),
      buckets = 64, iterations = 3, learningRate = 4.0)
    val m13 = Classifier.trainLogReg(corpus.repartition(13, col("doc_id")), col("y"),
      buckets = 64, iterations = 3, learningRate = 4.0)
    // the float-rounded gradients make the two trainings agree to the
    // last float bit UNLESS a gradient sum lands exactly on a float
    // rounding boundary, where summation order flips one ulp (~6e-8
    // relative — observed once in this fixture). The contract is
    // therefore "within one float ulp per step", orders of magnitude
    // inside the gate's 6-dp score rounding — not bit equality.
    assert(math.abs(m1.bias - m13.bias) < 1e-9)
    m1.weights.zip(m13.weights).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-9, s"weight $i: $a vs $b")
    }
  }

  test("scoreExpr (inline scan scorer) matches scoreLogReg to summation-order noise") {
    val model = Classifier.trainLogReg(corpus, col("y"),
      buckets = 64, iterations = 3, learningRate = 4.0)
    val withEmpty = corpus.unionByName(
      Seq((1000L, "", 0.0)).toDF("doc_id", "text", "y"))
    val viaJoin = Classifier.scoreLogReg(withEmpty, model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val inline = withEmpty.select(col("doc_id"),
      Classifier.scoreExpr(model, col("text")).as("score")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(inline.keySet === viaJoin.keySet)
    inline.foreach { case (id, s) =>
      assert(math.abs(s - viaJoin(id)) < 1e-12,
        s"doc $id: inline $s vs join ${viaJoin(id)}")
    }
    // and it is a pure projection: the plan has no exchange at all
    val plan = withEmpty.select(Classifier.scoreExpr(model, col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"inline scorer shuffles:\n$plan")
  }

  test("feature-less docs train and score through the bias alone") {
    val withEmpty = corpus.unionByName(
      Seq((1000L, "", 0.0), (1001L, "   ", 1.0)).toDF("doc_id", "text", "y"))
    val model = Classifier.trainLogReg(withEmpty, col("y"),
      buckets = 64, iterations = 2, learningRate = 4.0)
    val s = Classifier.scoreLogReg(withEmpty, model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // both empty docs get the identical bias-only score, strictly in (0, 1)
    assert(s(1000L) === s(1001L))
    assert(s(1000L) > 0.0 && s(1000L) < 1.0)
    assert(s.size === 82) // every doc scored exactly once
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Classifier
import graft.sim.WarehouseSim

/** Learned-quality-filter invariants: the trainer separates a corpus
  * with real signal, degrades gracefully on edge inputs, and the
  * calibration sweep's confusion counts are internally consistent. */
class ClassifierSpec extends TestBase {

  private val sfDir = "/root/testdata/sf0.01"
  private def docs = WarehouseSim.read(spark, sfDir, "documents")

  test("strong-signal fixture: near-perfect separation in few iterations") {
    import spark.implicits._
    // label-1 docs speak "alpha", label-0 docs speak "beta" — disjoint
    // token rates, so a working LR must drive the classes apart
    val fixture = (0 until 200).map { i =>
      val pos = i % 2 == 0
      val word = if (pos) "alpha" else "beta"
      (i.toLong, (Seq.fill(20)(word) ++ Seq("shared", "tokens")).mkString(" "),
        if (pos) "en" else "xx")
    }.toDF("doc_id", "text", "lang")
    val scored = Classifier.lrScores(fixture, dims = 64, iters = 10, lr = 0.5)
    val acc = scored.filter(col("pred") === col("label")).count() / 200.0
    assert(acc >= 0.99, s"accuracy $acc on a separable fixture")
    val gap = scored.groupBy("label").agg(avg("score").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(gap(1) > 0.9 && gap(0) < 0.1, s"score means: $gap")
  }

  test("scores are probabilities, stable under repartitioning") {
    val a = Classifier.lrScores(docs, iters = 3)
    val bounds = a.agg(min("score"), max("score")).head
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
    val b = Classifier.lrScores(docs.repartition(17), iters = 3)
    // deterministic training: partitioning must not change the model
    assert(a.orderBy("doc_id").collect().toSeq ==
      b.orderBy("doc_id").collect().toSeq,
      "scores changed under repartitioning")
  }

  test("docs with no alphanumeric tokens ride on the bias alone") {
    import spark.implicits._
    val weird = Seq(
      (1L, "valid words here", "en"),
      (2L, "!!! ??? ***", "en"),
      (3L, "", "xx")).toDF("doc_id", "text", "lang")
    val scored = Classifier.lrScores(weird, dims = 16, iters = 2, lr = 0.1)
    assert(scored.count() == 3, "empty-feature docs must not drop out")
    // both featureless docs get the same bias-only score
    val s = scored.filter(col("doc_id") >= 2).select("score")
      .collect().map(_.getDouble(0)).toSet
    assert(s.size == 1, s"bias-only scores differ: $s")
  }

  test("null text and null labels neither drop rows nor crash training") {
    import spark.implicits._
    val rows = Seq[(Long, String, String)](
      (1L, "valid words here and more", "en"),
      (2L, null, "en"),          // null text: bias-only features
      (3L, "unlabeled doc words", null), // null label: no gradient signal
      (4L, null, null))          // both
      .toDF("doc_id", "text", "lang")
    val scored = Classifier.lrScores(rows, dims = 16, iters = 3, lr = 0.1)
    assert(scored.count() == 4, "null-text/label docs must stay in the corpus")
    // null-text docs score identically (bias only), regardless of label
    val biasOnly = scored.filter(col("doc_id").isin(2L, 4L))
      .select("score").collect().map(_.getDouble(0)).toSet
    assert(biasOnly.size == 1, s"bias-only scores differ: $biasOnly")
    // model scoring keeps them too
    val model = Classifier.trainLr(rows, dims = 16, iters = 3, lr = 0.1)
    assert(Classifier.score(rows, model).count() == 4)
  }

  test("train once, score anywhere: model scoring matches the training " +
      "path and runs on a stream") {
    import spark.implicits._
    val model = Classifier.trainLr(docs, iters = 3)
    // the scan-only literal-fold scorer and the training loop's
    // join-sum logits are the same integer arithmetic — bit-equal
    val viaModel = Classifier.score(docs, model)
      .orderBy("doc_id").collect().toSeq
    val viaTrain = Classifier.lrScores(docs, iters = 3)
      .select("doc_id", "score", "pred").orderBy("doc_id").collect().toSeq
    assert(viaModel == viaTrain, "model scoring diverged from training path")

    // a pure projection is streaming-legal in append mode with no
    // watermark: train on the reference batch, score the feed live
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val sample = docs.select("doc_id", "text").as[(Long, String)]
      .orderBy("doc_id").take(5).toSeq
    val qName = s"lrscore_${System.nanoTime()}"
    val q = Classifier.score(input.toDF().toDF("doc_id", "text"), model)
      .writeStream.outputMode("append").format("memory").queryName(qName)
      .start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table(qName).orderBy("doc_id").collect().toSeq
      val batch = Classifier.score(
          sample.toDF("doc_id", "text"), model)
        .orderBy("doc_id").collect().toSeq
      assert(streamed == batch, "streamed scores diverged from batch")
      assert(streamed.size == 5)
    } finally q.stop()
  }

  test("eval sweep: confusion counts are consistent at every threshold") {
    val n = docs.count()
    val pos = Classifier.lrScores(docs, iters = 3)
      .filter(col("label") === 1).count()
    val eval = Classifier.lrEval(docs, iters = 3).collect()
    assert(eval.length == 9)
    eval.foreach { r =>
      val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn"))
      assert(tp + fp + fn + tn == n, s"counts don't cover the corpus: $r")
      assert(tp + fn == pos, s"positives drifted: $r")
    }
    // recall is monotone non-increasing in the threshold
    val recalls = eval.sortBy(_.getAs[Double]("thr")).map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      s"recall not monotone: ${recalls.toSeq}")
  }

  test("calibration buckets: cover the corpus, agree with the raw scores") {
    val scores = Classifier.lrScores(docs, iters = 3).collect()
    val cal = Classifier.lrCalibration(docs, iters = 3).collect()
    // every doc lands in exactly one bucket
    assert(cal.map(_.getAs[Long]("n")).sum == scores.length)
    assert(cal.map(_.getAs[Long]("pos")).sum ==
      scores.count(_.getAs[Int]("label") == 1))
    cal.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b <= 9)
      // bucket stats recompute exactly from the per-doc scores
      val in = scores.filter { s =>
        math.min((s.getAs[Double]("score") * 10).floor.toInt, 9) == b
      }
      assert(r.getAs[Long]("n") == in.length, s"bucket $b count")
      val meanMicro = in.map(s =>
        math.round(s.getAs[Double]("score") * 1e6)).sum
      assert(r.getAs[Double]("mean_score") ==
        BigDecimal(meanMicro / 1e6 / in.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"bucket $b mean")
      assert(r.getAs[Double]("gap") >= 0.0 && r.getAs[Double]("gap") <= 1.0)
    }
  }
}

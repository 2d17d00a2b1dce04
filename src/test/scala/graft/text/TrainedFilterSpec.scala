package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X91 in-plan perceptron: a planted linearly separable fixture must be
  * solved exactly at epoch 1 and STAY solved (empty miss set → zero
  * updates); the engine query's trajectory is sane.
  */
class TrainedFilterSpec extends SparkSpec {

  test("planted separable fixture: epoch-1 weights classify perfectly " +
    "and the model is a fixed point afterwards") {
    import spark.implicits._
    // positives concentrate on bucket 0, negatives on bucket 1; shares
    // sum to 10⁴ per doc (the engine feature invariant)
    val rows =
      (1L to 4L).flatMap(d => Seq((d, 1L, 0L, 8000L), (d, 1L, 1L, 2000L))) ++
        (5L to 8L).flatMap(d => Seq((d, -1L, 0L, 2000L), (d, -1L, 1L, 8000L)))
    val feat = rows.toDF("doc_id", "y", "bucket", "x")
    val out = TrainedFilter.perceptronConfusions(spark, feat, epochs = 3)
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        === ((4L, 0L, 4L, 0L)), s"confusion at epoch ${r.getLong(0)}: $r")
      assert(r.getLong(5) === 10000L && r.getLong(6) === 10000L)
    }
  }

  test("bulk masking: a dominant class-common bucket does not blind the " +
    "centered model (the uncentered margins would all take its sign)") {
    import spark.implicits._
    // bucket 7 carries 90% of every doc's mass in BOTH classes; the
    // separating 10% lives in buckets 0/1
    val rows =
      (1L to 4L).flatMap(d =>
        Seq((d, 1L, 7L, 9000L), (d, 1L, 0L, 1000L))) ++
        (5L to 8L).flatMap(d =>
          Seq((d, -1L, 7L, 9000L), (d, -1L, 1L, 1000L)))
    val out = TrainedFilter.perceptronConfusions(
      spark, rows.toDF("doc_id", "y", "bucket", "x"), epochs = 2).collect()
    out.foreach { r =>
      assert(r.getLong(6) === 10000L, s"epoch ${r.getLong(0)} not solved: $r")
    }
  }

  test("engine query on sf0.001: three epochs, counts partition the " +
    "corpus, rates in range") {
    val rows = TrainedFilter.x91PerceptronFilter.run(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val n0 = rows.head.getLong(1) + rows.head.getLong(2) +
      rows.head.getLong(3) + rows.head.getLong(4)
    assert(n0 > 0)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) === n0)
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000)
      assert(r.getLong(6) >= 0 && r.getLong(6) <= 10000)
    }
  }
}

package graft.text

import graft.SparkSpec

/** X91 brute-force differential: the distributed centered-perceptron
  * epoch chain must equal a single-threaded sequential fold of the same
  * integer arithmetic on random fixtures — the repo's exact-operator
  * discipline (x63/x71/e13 all carry one). Catches any divergence in
  * centering, truncating division, damping order, or miss-set
  * semantics that a planted fixture is too regular to expose.
  */
class TrainedFilterDifferentialSpec extends SparkSpec {

  private def tdiv(a: Long, b: Long): Long = a / b

  /** Sequential reference: same semantics as
    * [[TrainedFilter.perceptronConfusions]], no Spark.
    */
  private def ref(feat: Seq[(Long, Long, Long, Long)], epochs: Int)
      : Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val yOf = feat.map(f => f._1 -> f._2).toMap
    val n = math.max(yOf.size.toLong, 1L)
    val buckets = feat.map(_._3).distinct
    val mu = buckets.map(b =>
      b -> feat.filter(_._3 == b).map(_._4).sum / n).toMap
    val nPos = yOf.count(_._2 == 1L).toLong
    var w: Map[Long, Long] = mu.map { case (b, m) =>
      val sp = feat.filter(f => yOf(f._1) == 1L && f._3 == b).map(_._4).sum
      b -> tdiv(sp - nPos * m, math.max(nPos, 1L))
    }
    (1 to epochs).map { epoch =>
      val cC = w.map { case (b, wt) => wt * mu.getOrElse(b, 0L) }.sum
      val margins = yOf.keys.map { d =>
        d -> feat.filter(_._1 == d)
          .map(f => f._4 * w.getOrElse(f._3, 0L)).sum
      }.toMap
      def pos(d: Long) = margins(d) > cC
      val tp = yOf.count { case (d, y) => y == 1L && pos(d) }.toLong
      val fp = yOf.count { case (d, y) => y == -1L && pos(d) }.toLong
      val tn = yOf.count { case (d, y) => y == -1L && !pos(d) }.toLong
      val fn = yOf.count { case (d, y) => y == 1L && !pos(d) }.toLong
      if (epoch < epochs) {
        val miss = yOf.filter { case (d, y) =>
          (y == 1L && !pos(d)) || (y == -1L && pos(d))
        }.keySet
        val (np0, nn0) = (fn, fp)
        val (np, nn) = (math.max(np0, 1L), math.max(nn0, 1L))
        w = mu.map { case (b, m) =>
          val sp = feat.filter(f => miss(f._1) && yOf(f._1) == 1L &&
            f._3 == b).map(_._4).sum
          val sn = feat.filter(f => miss(f._1) && yOf(f._1) == -1L &&
            f._3 == b).map(_._4).sum
          val up = tdiv(tdiv(sp - np0 * m, np) - tdiv(sn - nn0 * m, nn),
            epoch + 1L)
          b -> (w.getOrElse(b, 0L) + up)
        }
      }
      val nc = math.max(tp + fp + tn + fn, 1L)
      val tpr = tp * 10000L / math.max(tp + fn, 1L)
      val tnr = tn * 10000L / math.max(tn + fp, 1L)
      (epoch.toLong, tp, fp, tn, fn, (tp + tn) * 10000L / nc, (tpr + tnr) / 2L)
    }
  }

  test("50 random fixtures: distributed epochs == sequential fold, " +
    "including single-class and empty-miss regimes") {
    import spark.implicits._
    val rnd = new scala.util.Random(1812L)
    for (i <- 1 to 50) {
      val nDocs = 1 + rnd.nextInt(30)
      val nBuckets = 1 + rnd.nextInt(8)
      // class mix includes degenerate draws: all-positive / all-negative
      val classBias = rnd.nextInt(3)
      val feat = (1L to nDocs.toLong).flatMap { d =>
        val y = classBias match {
          case 0 => if (rnd.nextBoolean()) 1L else -1L
          case 1 => 1L
          case _ => -1L
        }
        (0L until nBuckets.toLong)
          .filter(_ => rnd.nextInt(3) > 0) // sparse rows
          .map(b => (d, y, b, rnd.nextInt(3000).toLong))
      }
      if (feat.nonEmpty) {
        val got = TrainedFilter.perceptronConfusions(
          spark, feat.toDF("doc_id", "y", "bucket", "x"), epochs = 3)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
        val want = ref(feat, 3)
        assert(got === want, s"fixture $i (docs=$nDocs buckets=$nBuckets " +
          s"bias=$classBias):\n got=$got\nwant=$want")
      }
    }
  }
}

package graft.multimodal

import graft.SparkSpec

/** X90 brute-force differential: the broadcast count-better-than rank
  * must equal a single-threaded full ranking (sort by exact cosine,
  * tie-break vec_id) on random integer fixtures — including planted
  * exact ties (scaled vectors), zero vectors, and negative components.
  */
class CrossModalRetrievalDifferentialSpec extends SparkSpec {

  test("40 random fixtures: distributed rank == brute-force ranking") {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    val rnd = new scala.util.Random(9018L)
    val dim = 8
    for (i <- 1 to 40) {
      val nImgs = 2 + rnd.nextInt(20)
      // image vectors: small ints incl. negatives; occasionally a scaled
      // copy of a previous vector (exact cosine tie)
      val imgs = scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]()
      for (v <- 1L to nImgs.toLong) {
        val arr =
          if (v > 1 && rnd.nextInt(4) == 0)
            imgs(rnd.nextInt(imgs.size))._2.map(_ * (1 + rnd.nextInt(3)))
          else Array.fill(dim)((rnd.nextInt(21) - 10).toLong)
        imgs += ((v, arr))
      }
      // queries: a subset of image ids (paired) + one id with no image
      val qids = (1L to nImgs.toLong).filter(_ => rnd.nextInt(3) == 0) :+
        (nImgs + 50L)
      val qvecs = qids.map { q =>
        val arr =
          if (q <= nImgs && rnd.nextInt(3) == 0)
            imgs(q.toInt - 1)._2.map(_ * 2) // parallel to own image
          else Array.fill(dim)((rnd.nextInt(21) - 10).toLong)
        (q, arr, arr.map(x => x * x).sum)
      }
      val imgDf = imgs.toSeq.map { case (v, a) =>
        (v, a, a.map(x => x * x).sum)
      }.toDF("vec_id", "iarr", "iss")
      val qDf = qvecs.toDF("q_doc", "qarr", "tss")
      // skip degenerate zero-norm fixtures: cosine is NaN there and the
      // production corpus guarantees nonzero norms (tf-idf mass, |v|>0)
      val anyZero = qvecs.exists(_._3 == 0L) ||
        imgs.exists { case (_, a) => a.map(x => x * x).sum == 0L }
      if (!anyZero) {
        val got = CrossModalQueries.retrievalRanks(qDf, imgDf).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
            r.getBoolean(3), r.getDouble(4)))).toMap
        // brute force: exact cosine per (q, img), full sort, find truth
        val want = qvecs.flatMap { case (q, qa, tss) =>
          imgs.find(_._1 == q).map { case (_, ta) =>
            def cos(ia: Array[Long]): Double = {
              val dot = ia.zip(qa).map { case (a, b) => a * b }.sum
              val iss = ia.map(x => x * x).sum
              dot.toDouble / (math.sqrt(tss.toDouble) * math.sqrt(iss.toDouble))
            }
            val at = cos(ta)
            val better = imgs.count { case (v, ia) =>
              val c = cos(ia)
              c > at || (c == at && v < q)
            }
            q -> ((better + 1L, better == 0, better < 10, at))
          }
        }.toMap
        assert(got === want, s"fixture $i: got=$got want=$want")
      }
    }
  }
}

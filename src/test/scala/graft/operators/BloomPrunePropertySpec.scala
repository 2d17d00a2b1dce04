package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property fuzz for the Bloom filter: across random key sets, sizings
  * and probe batches, a member NEVER probes false (the soundness half
  * that makes prunedJoin ≡ plain join), and measured fpr stays within a
  * generous factor of the analytic bound.
  */
class BloomPrunePropertySpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(11L, 42L, 1337L)

  test("randomized: zero false negatives across sizes and key domains") {
    for (seed <- seeds; mBits <- Seq(256, 4096, 1 << 16)) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(500)
      // adversarial domains: clustered small ints, huge magnitudes, negatives
      val keys = Seq.fill(n)(rnd.nextInt(4) match {
        case 0 => rnd.nextInt(100).toLong
        case 1 => rnd.nextLong()
        case 2 => -math.abs(rnd.nextLong() % 1000000L)
        case _ => Long.MaxValue - rnd.nextInt(1000)
      }).distinct
      val df = keys.toDF("k")
      val model = BloomPrune.fit(df, col("k"), mBits = mBits, k = 4)
      val misses = df.filter(!BloomPrune.mightContain(model, col("k"))).count()
      assert(misses == 0L,
        s"seed=$seed m=$mBits: $misses members probed false")
    }
  }

  test("randomized: measured fpr within 4x of the analytic bound " +
    "at healthy occupancy") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val n = 2000
      val mBits = 1 << 16
      val k = 4
      val keys = Seq.fill(n)(rnd.nextLong()).distinct
      val model = BloomPrune.fit(keys.toDF("k"), col("k"), mBits, k)
      val probes = 20000
      val absent = Seq.fill(probes)(rnd.nextLong())
        .filterNot(keys.toSet)
      val fp = absent.toDF("k")
        .filter(BloomPrune.mightContain(model, col("k"))).count()
      val analytic = math.pow(
        1 - math.exp(-k.toDouble * keys.size / mBits), k)
      assert(fp.toDouble / absent.size <= analytic * 4 + 1e-4,
        s"seed=$seed: fpr ${fp.toDouble / absent.size} vs bound $analytic")
    }
  }

  test("string keys hash consistently too (fit and probe on text)") {
    val words = Seq("alpha", "beta", "gamma", "delta", "", "  ", "δ")
    val model = BloomPrune.fit(words.toDF("k"), col("k"))
    assert(words.toDF("k")
      .filter(!BloomPrune.mightContain(model, col("k"))).count() == 0)
  }
}

package graft

/** One spec per operator in the SparkEntry inventory: every QueryDef must
  * run on the smoke-scale data, produce its declared (non-empty, for the
  * queries where the data guarantees output) result, and expose an oracle
  * unless explicitly exempted. The DuckDB value-level gate is driver-side;
  * this suite is the fast structural gate.
  */
class QueryInventorySpec extends SparkSpec {

  // Queries whose sf0.001 result can legitimately be empty (threshold scans
  // and violation audits on clean/small data).
  private val mayBeEmpty = Set(
    "q2_uniqueness", "x2_dedup_minhash_lsh", "x3_dedup_simhash",
    "x4_dedup_ngram_jaccard", "x5_dedup_embedding")

  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name}: runs, has stable schema, plausible rows") {
      val df = q.run(spark, sfDir)
      val rows = df.count()
      assert(df.columns.nonEmpty, "no columns")
      assert(df.columns.forall(_.nonEmpty))
      if (!mayBeEmpty(q.name)) assert(rows > 0, s"${q.name} returned 0 rows")
      // re-running the same plan must be deterministic in row count
      assert(q.run(spark, sfDir).count() === rows)
    }
  }

  // Every query now carries an oracle (x8 gained its exact-count +
  // tolerance-verdict interface in round 2); keep the escape hatch for
  // future genuinely non-SQL-expressible ops.
  private val noOracleAllowed = Set.empty[String]

  test("every query has an oracle unless explicitly exempted") {
    val missing = SparkEntry.allDefs
      .filter(q => q.oracle.isEmpty && !noOracleAllowed(q.name)).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size === names.size)
  }
}

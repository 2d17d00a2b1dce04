package graft.lakehouse

import graft.SparkSpec

/** q18: the audit's numbers must actually demonstrate skipping — the
  * z-ordered deal touches fewer files for the date stripe than the
  * linear (custkey-leading) deal, while preserving the matching rows.
  */
class LayoutQueriesSpec extends SparkSpec {

  test("q18: z-order touches fewer files than linear for the date " +
    "stripe; matching rows identical across layouts") {
    val rows = LayoutQueries.q18ZOrderSkipping.run(spark, sfDir)
      .collect().map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("files_touched"),
          r.getAs[Long]("rows_in_touched"), r.getAs[Long]("rows_matching")))
      .toMap
    val (linF, linT, linR, linM) = rows("linear")
    val (zF, zT, zR, zM) = rows("zorder")
    assert(linF === 64L && zF === 64L)
    assert(linM === zM, "layouts must see the same matching rows")
    // custkey leads the linear sort, so the date stripe spans ~all files
    assert(linT >= 60L, s"linear should touch nearly all files, got $linT")
    // the curve clusters the stripe: strictly fewer files, fewer rows
    assert(zT * 2 <= linT,
      s"z-order should halve touched files: $zT vs $linT")
    assert(zR < linR, "fewer touched files must bound the rows read")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's QueryDefs into the `queries` / `oracleSql`
  * maps the correctness driver consumes.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    analytics.RelationalQueries.defs ++
      analytics.EventQueries.defs ++
      analytics.CustomerQueries.defs ++
      analytics.SketchQueries.defs ++
      analytics.ExtendedSqlQueries.defs ++
      analytics.AsOfQueries.defs ++
      analytics.GraphQueries.defs ++
      cdc.CdcQueries.defs ++
      dedup.DedupQueries.defs ++
      dedup.ClusterQueries.defs ++
      dedup.LinkageQueries.defs ++
      similarity.SimilarityQueries.defs ++
      similarity.QuantizationQueries.defs ++
      similarity.SpectralQueries.defs ++
      text.TextQueries.defs ++
      text.CurationQueries.defs ++
      text.TrainedFilter.defs ++
      quality.PiiQueries.defs ++
      quality.ContractQueries.defs ++
      lakehouse.LayoutQueries.defs ++
      multimodal.CrossModalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship mart: daily business metrics
    * (`.kiro/specs/batch-analytics-layer/design.md:658-730`).
    */
  def entry(spark: SparkSession): DataFrame =
    analytics.RelationalQueries.j4DailyBusinessMetrics
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

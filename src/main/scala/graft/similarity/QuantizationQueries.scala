package graft.similarity

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Embedding compression audit: symmetric per-dimension int8 scalar
  * quantization (the standard first rung of the 100 TB ANN ladder —
  * IVF + SQ8 cuts the vector store 4× before PQ is even considered).
  *
  * The audit quantizes every element with a per-dimension scale
  * (max|v| / 127), reconstructs, and reports the exact squared error per
  * label group. Error sums are fixed-point longs (`floor(err² · 1e12)`),
  * so the result is bit-identical regardless of partial-aggregation
  * order — the property that makes the number trustworthy when 1000
  * executors contribute partials, and what lets DuckDB replay it.
  *
  * Scale posture: one narrow explode (vec_id, dim, v), one
  * map-side-combinable groupBy for the 64 per-dim scales (broadcast
  * back), one groupBy for the audit — no joins keyed by anything wider
  * than the 64-row scale table.
  */
object QuantizationQueries {

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) = {
    graft.GraftExtensions.ensure(s)
    Tables.load(s, d, "embeddings")
  }

  val x17EmbeddingQuantization = QueryDef(
    "x17_embedding_quantization",
    "per-dim int8 symmetric quantization, exact reconstruction error per label",
    (s, d) => {
      val elems = emb(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("dim"),
          col("col").cast("double").as("v"))
      val scales = elems.groupBy("dim")
        .agg(max(abs(col("v"))).as("maxabs"))
        .withColumn("scale", col("maxabs") / lit(127))
      // |v| <= maxabs so |v/scale| <= 127 exactly — no clipping branch
      val q = when(col("scale") === 0, lit(0.0))
        .otherwise(round(col("v") / col("scale")))
      val err = col("v") - col("q") * col("scale")
      elems.join(broadcast(scales), Seq("dim"))
        .withColumn("q", q)
        .withColumn("sq_fp", floor(err * err * lit(1e12)).cast("long"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vals"),
          sum(col("sq_fp")).as("sum_sq_err_fp"),
          max(col("sq_fp")).as("max_sq_err_fp"))
        .withColumn("mse",
          col("sum_sq_err_fp").cast("double") /
            (col("n_vals") * lit(1000000000000L)))
        .orderBy("label")
    },
    Some("""WITH elems AS (
           |  SELECT vec_id, label, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
           |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
           |scales AS (
           |  SELECT dim, max(abs(v)) / 127 AS scale
           |  FROM elems GROUP BY dim),
           |quant AS (
           |  SELECT e.label,
           |         CAST(floor((e.v - (CASE WHEN s.scale = 0 THEN 0.0
           |                                 ELSE round(e.v / s.scale) END) * s.scale)
           |                    * (e.v - (CASE WHEN s.scale = 0 THEN 0.0
           |                                   ELSE round(e.v / s.scale) END) * s.scale)
           |                    * 1e12) AS BIGINT) AS sq_fp
           |  FROM elems e JOIN scales s ON e.dim = s.dim)
           |SELECT label, CAST(count(*) AS BIGINT) AS n_vals,
           |       CAST(sum(sq_fp) AS BIGINT) AS sum_sq_err_fp,
           |       CAST(max(sq_fp) AS BIGINT) AS max_sq_err_fp,
           |       CAST(sum(sq_fp) AS DOUBLE) / (count(*) * 1000000000000) AS mse
           |FROM quant GROUP BY label ORDER BY label""".stripMargin))

  val defs: Seq[QueryDef] = Seq(x17EmbeddingQuantization)
}

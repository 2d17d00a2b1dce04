package graft.cdc

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-gated CDC semantics: a deterministic change stream synthesized
  * from the orders table (insert for every order, update for fulfilled
  * orders, delete for every 97th key), unwrapped and compacted to current
  * state. This puts the T1/T2/W4 chain — including decimal-as-string money
  * and delete semantics — under the DuckDB value-level gate; the streaming
  * file-sink path is covered by ScalaTest (`CdcPipelineSpec`).
  */
object CdcQueries {

  /** The deterministic synthetic change stream both engines can build
    * from `orders`: insert per order, update for fulfilled orders,
    * delete for every 97th key — decimal-as-string money through the
    * envelope, LSN-ordered. Shared by cdc1 (compaction) and cdc3 (SCD2
    * history); `histSql` is the DuckDB mirror.
    */
  private def syntheticHistory(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val o = Tables.load(s, d, "orders")
    // decimal-as-string envelope money (Debezium decimal.handling.mode)
    val price = col("o_totalprice").cast(DecimalType(12, 2)).cast("string")
    val ins = o.select(
      col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
      price.as("total_price"), lit("c").as("__op"),
      (col("o_orderkey") * 10).as("__source_lsn"))
    val upd = o.filter(col("o_orderstatus") === "F").select(
      col("o_orderkey").as("id"), lit("S").as("status"),
      // additive bump: exact decimal math, no scale-2 rounding ties
      // (a multiplicative bump hits half-cent ties where engines differ
      // in rounding mode)
      (col("o_totalprice").cast(DecimalType(12, 2)) + lit(1.05).cast(DecimalType(3, 2)))
        .cast("string").as("total_price"),
      lit("u").as("__op"), (col("o_orderkey") * 10 + 1).as("__source_lsn"))
    val del = o.filter(col("o_orderkey") % 97 === 0).select(
      col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
      price.as("total_price"), lit("d").as("__op"),
      (col("o_orderkey") * 10 + 2).as("__source_lsn"))
    ins.unionByName(upd).unionByName(del)
      .withColumn("total_price", col("total_price").cast(DecimalType(12, 2)))
  }

  private val histSql =
    """hist AS (
              SELECT o_orderkey AS id, o_orderstatus AS status,
                     CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS DECIMAL(12,2)) AS total_price,
                     'c' AS op, o_orderkey * 10 AS lsn
              FROM orders
              UNION ALL
              SELECT o_orderkey, 'S',
                     CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST(1.05 AS DECIMAL(3,2)) AS VARCHAR) AS DECIMAL(12,2)),
                     'u', o_orderkey * 10 + 1
              FROM orders WHERE o_orderstatus = 'F'
              UNION ALL
              SELECT o_orderkey, o_orderstatus,
                     CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS DECIMAL(12,2)),
                     'd', o_orderkey * 10 + 2
              FROM orders WHERE o_orderkey % 97 = 0)"""

  /** CDC1 — envelope synthesis → unwrap (string→decimal) → latest-by-LSN
    * compaction → per-status current-state rollup.
    */
  val cdc1UnwrapCompact = QueryDef(
    "cdc1_unwrap_compact",
    "synthetic CDC stream -> unwrap -> latest-by-LSN compaction -> rollup",
    (s, d) => {
      Cdc.currentState(syntheticHistory(s, d))
        .groupBy("status")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("total_price")).cast("double").as("sum_price"),
          max(col("__source_lsn")).as("max_lsn"))
        .orderBy("status")
    },
    Some(s"""WITH $histSql,
            latest AS (
              SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
              FROM hist)
            SELECT status,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(total_price) AS DOUBLE) AS sum_price,
                   CAST(max(lsn) AS BIGINT) AS max_lsn
            FROM latest WHERE rn = 1 AND op <> 'd'
            GROUP BY status ORDER BY status"""))

  /** CDC2 — stock-level reconstruction via windowed running sum: replay
    * the order_items change stream (lineitem as movements, LSN-ordered by
    * orderkey/linenumber) and compute each part's cumulative consumption
    * and remaining stock. Reference trigger semantics:
    * `task4-postgresql-statefulset.yaml:148-186` (decrement on insert);
    * the reset-to-150 rule is a stateful scan covered by
    * [[Cdc.replayStock]] + spec (not expressible as a plain window).
    */
  val cdc2RunningStock = QueryDef(
    "cdc2_running_stock",
    "cumulative consumption + remaining stock per part (running-sum window)",
    (s, d) => {
      val l = Tables.load(s, d, "lineitem")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      l.filter(col("l_partkey") <= 200)
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          sum(col("l_quantity").cast("decimal(12,2)")).over(w)
            .cast("double").as("consumed"))
        .withColumn("stock_level", lit(1000.0) - col("consumed"))
        .orderBy("l_partkey", "l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_partkey, l_orderkey, l_linenumber, l_quantity,
                   CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER
                     (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS consumed,
                   1000.0 - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER
                     (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS stock_level
            FROM lineitem WHERE l_partkey <= 200
            ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  /** CDC3 — SCD type-2 dimension history from the change stream: every
    * value-bearing event (`c`/`u`) becomes a VERSION row with an LSN
    * validity interval `[valid_from_lsn, valid_to_lsn)`; the next event
    * on the same key (including a delete) closes the previous version,
    * and `is_current` marks versions no later event superseded — so a
    * deleted key has history but no current row. This is the staging
    * derivation the reference's warehouse implies: the raw layer keeps
    * the APPEND-ONLY CDC rows (`.kiro/specs/batch-analytics-layer/
    * design.md:304-330` — every `__op` retained with `__source_lsn`),
    * and point-in-time queries need them folded into validity intervals
    * rather than latest-only compaction (W4/cdc1's job).
    *
    * Scale posture: both windows (lead + version numbering) partition by
    * the dimension KEY — state bounded by one key's change count, never
    * the table; Catalyst plans them over one sort. A point-in-time
    * lookup against the output is a range predicate on the interval —
    * j9's bucketized range join applies when it must be a join.
    */
  /** The cdc3 SCD2 version frame: non-delete events with their validity
    * interval (`next_lsn` null = open) and per-key version numbers —
    * the lead window runs over ALL events (a delete closes the version
    * before it), the numbering over the surviving versions. Shared by
    * cdc3 (the history table), cdc4 (point-in-time lookups), and the
    * ST33 streaming enricher ([[graft.streaming.PitEnricher]]).
    */
  def scd2Versions(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("id").orderBy("__source_lsn")
    syntheticHistory(s, d)
      .withColumn("next_lsn", lead(col("__source_lsn"), 1).over(w))
      .filter(col("__op") =!= "d")
      .withColumn("version_no", row_number().over(w).cast("long"))
  }

  val cdc3Scd2 = QueryDef(
    "cdc3_scd2_history",
    "SCD type-2 dimension history: LSN validity intervals + current flags",
    (s, d) => scd2Versions(s, d)
      .select(col("id"), col("status"),
        col("total_price").cast("double").as("price"),
        col("__source_lsn").as("valid_from_lsn"),
        coalesce(col("next_lsn"), lit(-1L)).as("valid_to_lsn"),
        col("next_lsn").isNull.as("is_current"),
        col("version_no"))
      .orderBy("id", "valid_from_lsn"),
    Some(s"""WITH $histSql,
            v AS (SELECT *, lead(lsn) OVER (PARTITION BY id ORDER BY lsn) AS next_lsn
                  FROM hist)
            SELECT id, status, CAST(total_price AS DOUBLE) AS price,
                   lsn AS valid_from_lsn,
                   COALESCE(next_lsn, -1) AS valid_to_lsn,
                   next_lsn IS NULL AS is_current,
                   CAST(row_number() OVER (PARTITION BY id ORDER BY lsn) AS BIGINT) AS version_no
            FROM v WHERE op <> 'd'
            ORDER BY id, valid_from_lsn"""))

  /** CDC4 — point-in-time dimension lookup against the cdc3 SCD2
    * intervals: for each (key, probe_lsn), fetch the dimension version
    * that was valid AT that LSN — the temporal-correctness primitive
    * behind feature stores and training-data assembly (a feature joined
    * at any other version leaks the future into the training example).
    * Probes cover the four interesting positions per key: before birth
    * (no version — the lookup must MISS, not fall forward), at the
    * insert, at the update boundary (the new version is valid AT its
    * own from-LSN — interval semantics `[from, to)`), and after a
    * delete (history exists but no valid version — deleted keys must
    * MISS, not serve stale attributes).
    *
    * Scale posture: the join is an EQUI-join on the dimension key with
    * the interval test as a residual filter — per-key state is that
    * key's version count (the cdc3 bound), never the table; at most one
    * version matches any probe, so output = probe count. j9's
    * bucketized range join applies if probes were keyless.
    */
  val cdc4PitLookup = QueryDef(
    "cdc4_pit_lookup",
    "point-in-time SCD2 lookup: the version valid at each (key, lsn) probe, misses stay null",
    (s, d) => {
      val v = scd2Versions(s, d).select(
        col("id").as("vid"), col("status"),
        col("total_price").cast("double").as("price"),
        col("__source_lsn").as("vfrom"), col("next_lsn").as("vto"),
        col("version_no"))
      val probes = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("id"))
        .select(col("id"),
          explode(array(lit(-5L), lit(0L), lit(1L), lit(2L))).as("off"))
        .select(col("id"), (col("id") * 10 + col("off")).as("probe_lsn"))
      probes.join(v,
          col("id") === col("vid") && col("vfrom") <= col("probe_lsn") &&
            (col("vto").isNull || col("probe_lsn") < col("vto")),
          "left")
        .select(col("id"), col("probe_lsn"), col("status"), col("price"),
          col("version_no"))
        .orderBy("id", "probe_lsn")
    },
    Some(s"""WITH $histSql,
            v AS (SELECT *, lead(lsn) OVER (PARTITION BY id ORDER BY lsn) AS next_lsn
                  FROM hist),
            ver AS (SELECT id AS vid, status,
                           CAST(total_price AS DOUBLE) AS price,
                           lsn AS vfrom, next_lsn AS vto,
                           CAST(row_number() OVER (PARTITION BY id ORDER BY lsn) AS BIGINT) AS version_no
                    FROM v WHERE op <> 'd'),
            probes AS (SELECT o_orderkey AS id, o_orderkey * 10 + off AS probe_lsn
                       FROM orders, UNNEST([-5, 0, 1, 2]) AS u(off))
            SELECT p.id, p.probe_lsn, ver.status, ver.price, ver.version_no
            FROM probes p LEFT JOIN ver ON p.id = ver.vid
                 AND ver.vfrom <= p.probe_lsn
                 AND (ver.vto IS NULL OR p.probe_lsn < ver.vto)
            ORDER BY id, probe_lsn"""))

  /** The q21 audit core over any SCD2-shaped frame
    * (id, vfrom, vto nullable): per key, consecutive versions (ordered
    * by vfrom) must tile — `next.vfrom == vto` — with at most one open
    * (null-vto) version, and an open version must be the last. Returns
    * the one-row summary. Factored so the spec can run it on PLANTED
    * corrupt histories (the real cdc3 derivation is clean by
    * construction — the audit's job is catching hand-loaded or merged
    * dimension tables that are not).
    */
  private[cdc] def scd2AuditOf(ver: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("id").orderBy("vfrom")
    val paired = ver.withColumn("nxt_from", lead(col("vfrom"), 1).over(w))
    val pairFlags = paired.select(
      col("id"),
      when(col("nxt_from").isNotNull &&
        (col("vto").isNull || col("nxt_from") < col("vto")), 1L)
        .otherwise(0L).as("overlap"),
      when(col("nxt_from").isNotNull && col("vto").isNotNull &&
        col("nxt_from") > col("vto"), 1L).otherwise(0L).as("gap"),
      when(col("vto").isNull, 1L).otherwise(0L).as("open"))
    val perKey = pairFlags.groupBy("id").agg(
      count(lit(1)).as("nv"),
      sum(col("overlap")).as("ov"),
      sum(col("gap")).as("gp"),
      sum(col("open")).as("op"))
    perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("nv")).as("n_versions"),
      sum(col("ov")).as("n_overlap_pairs"),
      sum(col("gp")).as("n_gap_pairs"),
      sum(when(col("op") > 1, 1L).otherwise(0L)).as("n_multi_current_keys"))
      .withColumn("clean",
        col("n_overlap_pairs") === 0 && col("n_gap_pairs") === 0 &&
          col("n_multi_current_keys") === 0)
  }

  /** Q21 — SCD2 interval-integrity audit (dbt-utils
    * `mutually_exclusive_ranges` as an engine operator): per dimension
    * key the validity intervals must TILE — each version's `valid_to`
    * equals the next version's `valid_from`, no overlaps (a probe
    * matching two versions makes cdc4 lookups ambiguous), no gaps (a
    * probe matching none serves nulls for a live key), and at most one
    * open version. Run here over the cdc3 derivation, which must come
    * back clean — the audit's production use is hand-loaded or merged
    * dimension tables, where it doesn't (the spec plants all three
    * corruption classes).
    *
    * Scale posture: one key-partitioned window (the cdc3 bound — state
    * is a key's version count) + map-combinable aggregation to a single
    * summary row; no joins.
    */
  val q21Scd2Integrity = QueryDef(
    "q21_scd2_integrity",
    "SCD2 interval tiling audit: overlaps, gaps, multi-current keys",
    (s, d) => scd2AuditOf(scd2Versions(s, d).select(
      col("id"), col("__source_lsn").as("vfrom"), col("next_lsn").as("vto"))),
    Some(s"""WITH $histSql,
            |v AS (SELECT *, lead(lsn) OVER (PARTITION BY id ORDER BY lsn) AS next_lsn
            |      FROM hist),
            |ver AS (SELECT id, lsn AS vfrom, next_lsn AS vto
            |        FROM v WHERE op <> 'd'),
            |paired AS (SELECT id, vfrom, vto,
            |                  lead(vfrom) OVER (PARTITION BY id ORDER BY vfrom) AS nxt_from
            |           FROM ver),
            |flags AS (SELECT id,
            |                 CASE WHEN nxt_from IS NOT NULL AND
            |                           (vto IS NULL OR nxt_from < vto)
            |                      THEN 1 ELSE 0 END AS overlap,
            |                 CASE WHEN nxt_from IS NOT NULL AND vto IS NOT NULL
            |                           AND nxt_from > vto
            |                      THEN 1 ELSE 0 END AS gap,
            |                 CASE WHEN vto IS NULL THEN 1 ELSE 0 END AS op
            |          FROM paired),
            |perkey AS (SELECT id, CAST(count(*) AS BIGINT) AS nv,
            |                  CAST(sum(overlap) AS BIGINT) AS ov,
            |                  CAST(sum(gap) AS BIGINT) AS gp,
            |                  CAST(sum(op) AS BIGINT) AS opn
            |           FROM flags GROUP BY 1)
            |SELECT CAST(count(*) AS BIGINT) AS n_keys,
            |       CAST(sum(nv) AS BIGINT) AS n_versions,
            |       CAST(sum(ov) AS BIGINT) AS n_overlap_pairs,
            |       CAST(sum(gp) AS BIGINT) AS n_gap_pairs,
            |       CAST(sum(CASE WHEN opn > 1 THEN 1 ELSE 0 END) AS BIGINT)
            |         AS n_multi_current_keys,
            |       sum(ov) = 0 AND sum(gp) = 0 AND
            |         sum(CASE WHEN opn > 1 THEN 1 ELSE 0 END) = 0 AS clean
            |FROM perkey""".stripMargin))

  val defs: Seq[QueryDef] =
    Seq(cdc1UnwrapCompact, cdc2RunningStock, cdc3Scd2, cdc4PitLookup,
      q21Scd2Integrity)
}

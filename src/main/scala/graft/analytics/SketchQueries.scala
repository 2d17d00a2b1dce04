package graft.analytics

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Re-mergeable distinct-count sketches — the engine's version of the
  * reference's ClickHouse `uniq` MVs (A7-A9) as *stored, mergeable* state:
  * per-day HLL sketches (Apache DataSketches via Spark's built-in
  * `hll_sketch_agg`) that union to any coarser grain without rescanning
  * events. This is exactly how a 100 TB deployment serves "distinct users
  * this month" from daily partials.
  *
  * Oracle interface: the sketch binary and its estimate are
  * engine-specific, so the oracle-compared columns are the ones both
  * engines CAN agree on — day count, the exact distinct total, and a
  * tolerance verdict (`within_2pct`, 1/0). DataSketches HLL is
  * deterministic on identical input, so the verdict is stable: if the
  * union path degrades (wrong merge, lossy downgrade), the verdict flips
  * and the row hash-mismatches. `SketchSemanticsSpec` keeps the
  * finer-grained merge-law and accuracy assertions.
  */
object SketchQueries {

  /** The Count-Min bucket expansion shared by the x22 batch sketch and
    * the streaming heavy-hitter monitor
    * ([[graft.streaming.HeavyHitters]]): one `(r, bucket)` struct per
    * sketch row, keyed by the portable row-salted md5 — identical cells
    * whoever computes them, which is what makes the sketch mergeable
    * across engines AND across micro-batches.
    */
  def cmsBuckets(key: org.apache.spark.sql.Column,
      depth: Int = 4, width: Int = 1024): org.apache.spark.sql.Column =
    explode(array((0 until depth).map(r => struct(lit(r).as("r"),
      pmod(call_function("graft_md5u60",
        concat(lit(s"$r:"), key.cast("string"))), lit(width))
        .as("bucket"))): _*)).as("rb")

  /** X8 — per-day user sketches (lgK=14, ~0.8% RSE) unioned to one overall
    * estimate, hash-compared to DuckDB via the exact count + tolerance
    * verdict. The 1×1 scalar join is a broadcast, not a data shuffle.
    */
  val x8HllMergeable = QueryDef(
    "x8_hll_mergeable",
    "daily HLL user sketches -> union -> estimate within 2% of exact",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
      val merged = ev
        .groupBy(to_date(col("ts")).as("date"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("user_sketch"))
        .agg(
          count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("user_sketch")))
            .as("merged_estimate"))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_total"))
      merged.join(exact)
        .select(
          col("n_days"),
          col("exact_total"),
          (abs(col("merged_estimate").cast("double") - col("exact_total")) <=
            col("exact_total") * lit(0.02)).cast("long").as("within_2pct"))
    },
    Some("""SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_total,
           |       CAST(1 AS BIGINT) AS within_2pct
           |FROM events""".stripMargin))

  /** X22 — Count-Min frequency sketch, fully deterministic and therefore
    * hash-gated WITHOUT a tolerance verdict: every cell is an exact sum
    * over portable md5 buckets (4 rows × 1024 cols, row-salted keys), so
    * both engines compute bit-identical sketches AND estimates. The build
    * is one scan with a map-side-combinable groupBy onto ≤ 4096 cells —
    * sketch state is O(1) in corpus size, the 100 TB path for "how often
    * does key k appear" without a full distinct aggregation. Probes (10
    * fixed part keys) check the CM guarantee est ≥ true; the estimate
    * itself is also compared exactly.
    */
  val x22CountMin = QueryDef(
    "x22_countmin",
    "deterministic Count-Min sketch (4x1024) over l_partkey + probe check",
    (s, d) => {
      graft.GraftExtensions.ensure(s)
      def buckets(key: org.apache.spark.sql.Column) = cmsBuckets(key)
      val li = Tables.load(s, d, "lineitem").select(col("l_partkey"))
      // pre-aggregate by key BEFORE the bucket explode: the md5 bucket of
      // a key is row-independent, so summing per-key counts into cells is
      // exactly the per-row count — but the digest runs once per DISTINCT
      // key (|keys| × depth hashes) instead of once per row (|rows| ×
      // depth). At sf0.1 that is 80k digests instead of 2.4M (guide §2.3
      // "aggregate before you shuffle", applied to the hash stage); at
      // 100 TB the explode stage stops scaling with fact rows entirely.
      val perKey = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("kc"))
      val cells = perKey.select(col("kc"), buckets(col("l_partkey")))
        .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
        .agg(sum(col("kc")).as("cnt"))
      val probes = Tables.load(s, d, "part")
        .filter(col("p_partkey") <= 10).select(col("p_partkey"))
      val probeBuckets = probes
        .select(col("p_partkey"), buckets(col("p_partkey")))
        .select(col("p_partkey"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      val est = probeBuckets.join(cells, Seq("r", "bucket"))
        .groupBy("p_partkey").agg(min(col("cnt")).as("est_count"))
      val exact = li.filter(col("l_partkey") <= 10)
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(count(lit(1)).as("true_count"))
      probes
        .join(est, Seq("p_partkey"), "left")
        .join(exact, Seq("p_partkey"), "left")
        .select(col("p_partkey"),
          coalesce(col("true_count"), lit(0L)).as("true_count"),
          coalesce(col("est_count"), lit(0L)).as("est_count"),
          (coalesce(col("est_count"), lit(0L)) >=
            coalesce(col("true_count"), lit(0L))).cast("long")
            .as("no_underestimate"))
        .orderBy("p_partkey")
    },
    Some("""WITH cells AS (
           |  SELECT r, CAST(md5_number_lower(r || ':' || CAST(l_partkey AS VARCHAR)) >> 4 AS BIGINT) % 1024 AS bucket,
           |         CAST(count(*) AS BIGINT) AS cnt
           |  FROM lineitem, UNNEST(generate_series(0, 3)) AS u(r)
           |  GROUP BY 1, 2),
           |probes AS (SELECT p_partkey FROM part WHERE p_partkey <= 10),
           |pb AS (
           |  SELECT p_partkey, r,
           |         CAST(md5_number_lower(r || ':' || CAST(p_partkey AS VARCHAR)) >> 4 AS BIGINT) % 1024 AS bucket
           |  FROM probes, UNNEST(generate_series(0, 3)) AS u(r)),
           |est AS (
           |  SELECT p_partkey, CAST(min(cnt) AS BIGINT) AS est_count
           |  FROM pb JOIN cells c ON pb.r = c.r AND pb.bucket = c.bucket
           |  GROUP BY 1),
           |exact AS (
           |  SELECT l_partkey AS p_partkey, CAST(count(*) AS BIGINT) AS true_count
           |  FROM lineitem WHERE l_partkey <= 10 GROUP BY 1)
           |SELECT p.p_partkey,
           |       coalesce(x.true_count, 0) AS true_count,
           |       coalesce(e.est_count, 0) AS est_count,
           |       CAST(CASE WHEN coalesce(e.est_count, 0) >= coalesce(x.true_count, 0)
           |                 THEN 1 ELSE 0 END AS BIGINT) AS no_underestimate
           |FROM probes p
           |LEFT JOIN est e ON p.p_partkey = e.p_partkey
           |LEFT JOIN exact x ON p.p_partkey = x.p_partkey
           |ORDER BY p.p_partkey""".stripMargin))

  /** X50 — audience-overlap matrix via HLL inclusion–exclusion:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) over the per-event-type user
    * sketches. This is the question x8's union path cannot answer
    * ("distinct users overall") and the reason stored sketches beat
    * stored counts: overlap between any two segments comes from THREE
    * sketch reads, no re-scan of events, no user-level join at serve
    * time. The exact overlap (a user-keyed equi-join over the distinct
    * (type, user) table — computed here as the audit truth) is what a
    * 100 TB deployment precisely avoids recomputing per segment pair.
    *
    * Oracle interface follows x8: sketch binaries are engine-specific,
    * so the compared columns are the exact counts plus a tolerance
    * verdict. DataSketches HLL is exact in sparse mode at these
    * cardinalities and deterministic on identical input, so the verdict
    * (I-E estimate within 5% + slack of truth) is stable; if the union
    * or subtraction path degrades, the verdict flips and the row
    * hash-mismatches. Segment-pair space is types²-bounded.
    */
  val x50AudienceOverlap = QueryDef(
    "x50_audience_overlap",
    "pairwise event-type audience overlap: HLL inclusion-exclusion vs exact",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), col("user_id"))
      val sk = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
          countDistinct(col("user_id")).as("exact_n"))
        .withColumn("k", lit(1))
      val pairs = sk.select(col("k"), col("event_type").as("type_a"),
          col("sk").as("sk_a"), col("exact_n").as("exact_a"))
        .join(sk.select(col("k"), col("event_type").as("type_b"),
          col("sk").as("sk_b"), col("exact_n").as("exact_b")), Seq("k"))
        .filter(col("type_a") < col("type_b"))
        .withColumn("est_union",
          hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
        .withColumn("est_a", hll_sketch_estimate(col("sk_a")))
        .withColumn("est_b", hll_sketch_estimate(col("sk_b")))
        .withColumn("est_overlap",
          col("est_a") + col("est_b") - col("est_union"))
      val ut = ev.distinct()
      val exactOv = ut.as("x")
        .join(ut.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("exact_overlap"))
      pairs.join(exactOv, Seq("type_a", "type_b"))
        .select(col("type_a"), col("type_b"), col("exact_a"), col("exact_b"),
          col("exact_overlap"),
          (abs(col("est_overlap") - col("exact_overlap")) <=
            expr("exact_overlap DIV 20") + lit(8L)).cast("long")
            .as("within_tol"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
           |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
           |      FROM ut GROUP BY 1),
           |ov AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
           |              CAST(count(*) AS BIGINT) AS exact_overlap
           |       FROM ut x JOIN ut y
           |         ON x.user_id = y.user_id AND x.event_type < y.event_type
           |       GROUP BY 1, 2)
           |SELECT type_a, type_b,
           |       na.n_users AS exact_a, nb.n_users AS exact_b,
           |       exact_overlap, CAST(1 AS BIGINT) AS within_tol
           |FROM ov JOIN n na ON type_a = na.event_type
           |        JOIN n nb ON type_b = nb.event_type
           |ORDER BY type_a, type_b""".stripMargin))

  /** X64 — join-size estimation from Count-Min sketches (the AMS/CM
    * inner-product bound): |R ⋈ S| on a key = Σ_k f_R(k)·f_S(k), and the
    * per-row CM estimate Σ_bucket cntR(r,b)·cntS(r,b) NEVER
    * underestimates it (collisions only add); the estimate is the min
    * over depth rows. This is the planner primitive a 100 TB engine
    * runs BEFORE committing to a shuffle: events ⋈ orders on the user
    * key is genuinely many-to-many (10k × 15k rows → 95,614 pairs at
    * sf0.01), and the prediction costs two fixed-size sketches + one
    * bounded cell join — no key-level distinct aggregation, no join
    * execution, state O(1) in table size. The inner-product error is
    * additive ≈ |R|·|S|/width, NOT relative — x22's 1024-wide profile
    * sketch would drown this join's signal (measured +125%), so the
    * join-size sketch uses width 65536 (4×64Ki cells ≈ 2 MB — still a
    * planner-cheap constant; measured error ≈ 2%).
    *
    * Deterministic md5 buckets (x22's [[cmsBuckets]]) → both engines
    * compute bit-identical estimates, so the gate is an exact hash
    * compare, error reported in basis points. The exact size here is
    * the audit truth (two per-key aggs + one join on ≤ |keys| rows —
    * the thing the sketch path avoids at scale).
    */
  val x64JoinCardinality = QueryDef(
    "x64_join_cardinality",
    "CM-sketch inner-product join-size estimate (events x orders on user key) vs exact",
    (s, d) => {
      graft.GraftExtensions.ensure(s)
      val ev = Tables.load(s, d, "events").select(col("user_id"))
      val or = Tables.load(s, d, "orders").select(col("o_custkey"))
      // per-key pre-aggregation before the bucket explode (x22's rewrite):
      // cell counts are sums over keys, so the md5 digest runs per DISTINCT
      // key, not per row — and the key agg is map-side combinable.
      def cells(df: org.apache.spark.sql.DataFrame, key: String) =
        df.groupBy(col(key)).agg(count(lit(1)).as("kc"))
          .select(col("kc"), cmsBuckets(col(key), width = 65536))
          .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
          .agg(sum(col("kc")).as("cnt"))
      val est = cells(ev, "user_id").withColumnRenamed("cnt", "cnt_e")
        .join(cells(or, "o_custkey").withColumnRenamed("cnt", "cnt_o"),
          Seq("r", "bucket"))
        .groupBy("r").agg(sum(col("cnt_e") * col("cnt_o")).as("ip"))
        .agg(min(col("ip")).as("est_size"))
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("ne"))
        .join(or.groupBy(col("o_custkey").as("user_id"))
          .agg(count(lit(1)).as("no")), Seq("user_id"))
        .agg(sum(col("ne") * col("no")).as("exact_size"))
      exact.join(est)
        .select(col("exact_size"), col("est_size"),
          (col("est_size") >= col("exact_size")).cast("long")
            .as("no_underestimate"),
          expr("(est_size - exact_size) * 10000 DIV exact_size")
            .as("err_bp"))
    },
    Some("""WITH ce AS (
           |  SELECT r, CAST(md5_number_lower(r || ':' || CAST(user_id AS VARCHAR)) >> 4 AS BIGINT) % 65536 AS bucket,
           |         CAST(count(*) AS BIGINT) AS cnt
           |  FROM events, UNNEST(generate_series(0, 3)) AS u(r)
           |  GROUP BY 1, 2),
           |co AS (
           |  SELECT r, CAST(md5_number_lower(r || ':' || CAST(o_custkey AS VARCHAR)) >> 4 AS BIGINT) % 65536 AS bucket,
           |         CAST(count(*) AS BIGINT) AS cnt
           |  FROM orders, UNNEST(generate_series(0, 3)) AS u(r)
           |  GROUP BY 1, 2),
           |ip AS (SELECT ce.r, sum(ce.cnt * co.cnt) AS ip
           |       FROM ce JOIN co ON ce.r = co.r AND ce.bucket = co.bucket
           |       GROUP BY 1),
           |est AS (SELECT CAST(min(ip) AS BIGINT) AS est_size FROM ip),
           |exact AS (
           |  SELECT CAST(sum(ne * no) AS BIGINT) AS exact_size
           |  FROM (SELECT user_id, count(*) AS ne FROM events GROUP BY 1) e
           |  JOIN (SELECT o_custkey AS user_id, count(*) AS no
           |        FROM orders GROUP BY 1) o USING (user_id))
           |SELECT exact_size, est_size,
           |       CAST(CASE WHEN est_size >= exact_size THEN 1 ELSE 0 END
           |            AS BIGINT) AS no_underestimate,
           |       (est_size - exact_size) * 10000 // exact_size AS err_bp
           |FROM exact CROSS JOIN est""".stripMargin))

  /** X66 — join-skew report: x64 predicts the TOTAL join size; this
    * names the keys responsible — per-key pair volume ne·no of the
    * events ⋈ orders user-key join, top 10 by volume (deterministic
    * key tie-break), each with its basis-point share of the total and
    * the running cumulative share. The salting/AQE-skew decision input:
    * "one key is 8% of the join" reads directly off the first row.
    *
    * Scale: two map-combinable per-key aggs + one equi-join on the key
    * (|keys| rows, not |rows|), top-10 via TakeOrdered (bounded, no
    * global sort), shares against the broadcast total. The cumulative
    * column is a window over exactly 10 rows.
    */
  val x66SkewReport = QueryDef(
    "x66_skew_report",
    "top-10 heaviest join keys of events x orders with pair-volume shares",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val perKey = Tables.load(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("ne"))
        .join(Tables.load(s, d, "orders")
          .groupBy(col("o_custkey").as("user_id"))
          .agg(count(lit(1)).as("no")), Seq("user_id"))
        .withColumn("pairs", col("ne") * col("no"))
      val total = perKey.agg(sum(col("pairs")).as("total_pairs"))
      val top = perKey.orderBy(col("pairs").desc, col("user_id")).limit(10)
      top.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("pairs").desc, col("user_id"))).cast("long"))
        .withColumn("share_bp", expr("pairs * 10000 DIV total_pairs"))
        .withColumn("cum_share_bp",
          expr("sum(pairs) OVER (ORDER BY pairs DESC, user_id " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
            "* 10000 DIV total_pairs"))
        .select("rank", "user_id", "ne", "no", "pairs", "share_bp",
          "cum_share_bp")
        .orderBy("rank")
    },
    Some("""WITH pk AS (
           |  SELECT user_id, CAST(e.ne AS BIGINT) AS ne,
           |         CAST(o.no AS BIGINT) AS no,
           |         CAST(e.ne * o.no AS BIGINT) AS pairs
           |  FROM (SELECT user_id, count(*) AS ne FROM events GROUP BY 1) e
           |  JOIN (SELECT o_custkey AS user_id, count(*) AS no
           |        FROM orders GROUP BY 1) o USING (user_id)),
           |tot AS (SELECT CAST(sum(pairs) AS BIGINT) AS total_pairs FROM pk),
           |top AS (SELECT * FROM pk ORDER BY pairs DESC, user_id LIMIT 10)
           |SELECT CAST(row_number() OVER (ORDER BY pairs DESC, user_id)
           |            AS BIGINT) AS rank,
           |       user_id, ne, no, pairs,
           |       pairs * 10000 // total_pairs AS share_bp,
           |       CAST(sum(pairs) OVER (ORDER BY pairs DESC, user_id
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |            AS BIGINT) * 10000 // total_pairs AS cum_share_bp
           |FROM top CROSS JOIN tot
           |ORDER BY rank""".stripMargin))

  val defs: Seq[QueryDef] = Seq(x8HllMergeable, x22CountMin,
    x50AudienceOverlap, x64JoinCardinality, x66SkewReport)
}

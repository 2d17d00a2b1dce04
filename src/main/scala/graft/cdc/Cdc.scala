package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC ingestion pipeline: synthetic Debezium-shaped change events →
  * unwrap/flatten → time-partitioned bronze Parquet → partition-pruned
  * reads → latest-by-LSN compaction into a current-state view.
  *
  * Mirrors the reference's implemented ingestion path (SURVEY §2.1 S1-S5,
  * §2.2 T1-T3, §2.5 W4):
  *  - the envelope reproduces Debezium's post-`ExtractNewRecordState` shape
  *    with `add.fields=op,ts_ms,source.ts_ms,source.lsn` and delete
  *    *rewrite* (full row + `__deleted` flag) — reference
  *    `connectors/users-debezium-connector.json:26-32`;
  *  - money fields arrive as STRINGS (`decimal.handling.mode=string`,
  *    `users-debezium-connector.json:38`) and timestamps as epoch millis
  *    (TimestampConverter SMTs, `users-s3-sink-connector.json:31-47`);
  *    unwrap casts both;
  *  - the bronze sink is Hive-style time-partitioned Parquet
  *    (`users-s3-sink-connector.json:8-22`), written with
  *    `partitionBy(year, month, day, hour)` so reads prune on partition
  *    columns (Catalyst static partition pruning replaces the reference's
  *    hand-rolled S3 listing, `utils-dev/s3_parquet_query.py:62-88`);
  *  - compaction is the W4 operator: `row_number() over (partition by pk
  *    order by lsn desc) = 1`, deletes dropped from current state, retained
  *    in history (`utils-dev/read_s3_parquet.py:51`).
  *
  * Scale: generation/unwrap/compaction are all expressed on DataFrames —
  * the only shuffle in the whole path is the compaction window, keyed by
  * primary key (high cardinality → even distribution). In production the
  * same code runs with `format("kafka")` + `writeStream` (wiring is config,
  * not code — SURVEY §7.4).
  */
object Cdc {

  /** Post-SMT flat envelope for the `users` table. */
  val usersEnvelopeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("email", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("account_balance", StringType), // decimal-as-string
    StructField("created_at", LongType), // epoch ms
    StructField("updated_at", LongType), // epoch ms
    StructField("__op", StringType),
    StructField("__ts_ms", LongType),
    StructField("__source_ts_ms", LongType),
    StructField("__source_lsn", LongType),
    StructField("__deleted", StringType))) // "true"/"false" (Debezium rewrite)

  private val cdcMeta = Seq(
    StructField("__op", StringType),
    StructField("__ts_ms", LongType),
    StructField("__source_ts_ms", LongType),
    StructField("__source_lsn", LongType),
    StructField("__deleted", StringType))

  /** Envelopes for the reference's other CDC'd tables (same post-SMT
    * shape; money as decimal-string, timestamps as epoch ms —
    * `task4-postgresql-statefulset.yaml` table DDL).
    */
  val productsEnvelopeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("price", StringType), // decimal-as-string
    StructField("stock_quantity", IntegerType),
    StructField("created_at", LongType),
    StructField("updated_at", LongType)) ++ cdcMeta)

  val ordersEnvelopeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType),
    StructField("status", StringType),
    StructField("total_amount", StringType), // decimal-as-string
    StructField("created_at", LongType),
    StructField("updated_at", LongType)) ++ cdcMeta)

  val orderItemsEnvelopeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("order_id", LongType),
    StructField("product_id", LongType),
    StructField("quantity", IntegerType),
    StructField("unit_price", StringType), // decimal-as-string
    StructField("created_at", LongType)) ++ cdcMeta)

  /** The four CDC'd envelope subjects, as a registry would hold them. */
  val envelopeSchemas: Map[String, StructType] = Map(
    "users-value" -> usersEnvelopeSchema,
    "products-value" -> productsEnvelopeSchema,
    "orders-value" -> ordersEnvelopeSchema,
    "order_items-value" -> orderItemsEnvelopeSchema)

  /** Deterministic distributed generator of a users change stream.
    *
    * Per user id: one insert; an update for `id % 3 == 0` (bumps balance
    * and `updated_at`); a delete rewrite for `id % 11 == 0`. LSNs are
    * strictly increasing per key (insert < update < delete), mirroring WAL
    * order. Pure `spark.range` + column exprs — generation itself is
    * cluster-parallel, no driver-side loops (reference's generator is a
    * 10-thread Python pool; ours scales with executors).
    */
  def generateUsersCdc(spark: SparkSession, nUsers: Long,
      baseTsMs: Long = 980000000000L): DataFrame = {
    val ids = spark.range(0, nUsers).toDF("id")
    def row(op: String, lsnOff: Int, tsOff: Int, balanceBump: Column,
        deleted: String)(df: DataFrame): DataFrame =
      df.select(
        col("id"),
        concat(lit("user"), col("id"), lit("@example.com")).as("email"),
        concat(lit("First"), col("id")).as("first_name"),
        concat(lit("Last"), col("id") % 100).as("last_name"),
        // decimal-as-string money, deterministic per id
        ((col("id") % 9000 + 100).cast(DecimalType(12, 2)) / 7 + balanceBump)
          .cast(DecimalType(12, 2)).cast("string").as("account_balance"),
        (lit(baseTsMs) + col("id") * 1000).as("created_at"),
        (lit(baseTsMs) + col("id") * 1000 + tsOff * 1000).as("updated_at"),
        lit(op).as("__op"),
        (lit(baseTsMs) + col("id") * 1000 + tsOff * 1000 + 250).as("__ts_ms"),
        (lit(baseTsMs) + col("id") * 1000 + tsOff * 1000).as("__source_ts_ms"),
        (col("id") * 100 + lsnOff).as("__source_lsn"),
        lit(deleted).as("__deleted"))
    val inserts = row("c", 0, 0, lit(0), "false")(ids)
    val updates = row("u", 50, 60, lit(25), "false")(
      ids.filter(col("id") % 3 === 0))
    val deletes = row("d", 70, 90, lit(0), "true")(
      ids.filter(col("id") % 11 === 0))
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** Debezium snapshot-phase view of an envelope: `op = 'r'` (read) —
    * the connector's initial table scan emitted before the WAL tail.
    * Every downstream op treats 'r' exactly like an upsert image ('c'/
    * 'u'): [[latestByKey]] keys on LSN regardless of op, and only
    * `__op = 'd'` deletes — so bootstrap-then-stream composes through
    * the SAME compaction/apply machinery as a pure change stream
    * (pinned by `CdcApplySpec`'s snapshot-bootstrap case).
    *
    * Input contract: a CURRENT-STATE extract (e.g. [[currentState]]
    * output, or the insert images of keys that still exist) — a table
    * scan has no delete rewrites. Feeding a change HISTORY would
    * re-stamp its 'd' rows as live upserts and silently resurrect
    * deleted keys in the mirror, so any 'd' row fails the job instead.
    */
  def asSnapshotRead(envelope: DataFrame): DataFrame =
    envelope
      .withColumn("__op",
        when(col("__op") === "d", raise_error(lit(
          "asSnapshotRead: input contains delete rewrites - pass a " +
            "current-state extract (e.g. Cdc.currentState), not a change history")))
          .otherwise(lit("r")))
      .withColumn("__deleted", lit("false"))

  /** T1-T3: typed view of the envelope — string money → DECIMAL(12,2),
    * epoch-ms → TimestampType; keeps CDC metadata columns; T2 drops the
    * `__deleted` rewrite flag (the `__op='d'` code is authoritative).
    * Schema-driven: casts whichever of the four envelopes' money/time
    * columns are present, so one unwrap serves every CDC'd table
    * ([[envelopeSchemas]]) — the per-connector SMT config expressed once.
    */
  def unwrap(envelope: DataFrame): DataFrame = {
    val money = Seq("account_balance", "price", "total_amount", "unit_price")
    val times = Seq("created_at", "updated_at")
    val present = envelope.columns.toSet
    val cast1 = money.filter(present).foldLeft(envelope)((df, c) =>
      df.withColumn(c, col(c).cast(DecimalType(12, 2))))
    times.filter(present).foldLeft(cast1)((df, c) =>
      df.withColumn(c, timestamp_millis(col(c))))
      .drop("__deleted")
  }

  /** S4: bronze sink — Hive-style time partitions derived from the source
    * commit timestamp, exactly the reference's partition scheme. The
    * shared spec lake partitions to the hour; the per-table sinks go to
    * sub-hour grain (`users-s3-sink-connector.json:10-21`,
    * `partition.duration.ms=1000` with a minute-level path format), so
    * `grain` selects how deep the directory tree goes. Deeper grains
    * trade smaller prunable units for more files — at 100 TB, hour is
    * the default; minute is for short-retention hot paths.
    */
  def writeBronze(df: DataFrame, path: String,
      grain: String = "hour",
      mode: String = "overwrite"): Unit = {
    val partitionCols = grain match {
      case "hour" => Seq("year", "month", "day", "hour")
      case "minute" => Seq("year", "month", "day", "hour", "minute")
      case other => throw new IllegalArgumentException(
        s"unsupported bronze grain '$other' (hour|minute)")
    }
    df.withColumn("__src_ts", timestamp_millis(col("__source_ts_ms")))
      .withColumn("year", year(col("__src_ts")))
      .withColumn("month", month(col("__src_ts")))
      .withColumn("day", dayofmonth(col("__src_ts")))
      .withColumn("hour", hour(col("__src_ts")))
      .withColumn("minute", minute(col("__src_ts")))
      .drop("__src_ts")
      .drop((Seq("year", "month", "day", "hour", "minute")
        diff partitionCols): _*)
      .write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** S5: partition-pruned read — predicates on year/month/day/hour prune
    * directories at planning time (no hand-rolled listing). `mergeSchema`
    * so a BACKWARD schema evolution mid-stream (new nullable column — the
    * reference's users-table evolution drill, `task9-validate-cdc.sh:
    * 295-420`) reads pre- and post-evolution files in ONE scan, old rows
    * null-filled.
    */
  def readBronze(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** W4: latest-record-per-key compaction by LSN (generic). */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Current state = latest version per key, deletes dropped. */
  def currentState(history: DataFrame, keyCols: Seq[String] = Seq("id"),
      orderCol: String = "__source_lsn"): DataFrame =
    latestByKey(history, keyCols, orderCol).filter(col("__op") =!= "d")

  /** §2.9 trigger replay: the reference's stock state machine — decrement
    * per movement, restock to `resetTo` whenever the level falls below
    * `resetBelow` (`task4-postgresql-statefulset.yaml:148-186`). A reset
    * depends on every prior row, so this is a per-key ORDERED FOLD (typed
    * groups), not a window: keys process in parallel, rows within a key
    * sequentially — exactly the trigger's semantics, horizontally scaled.
    */
  def replayStock(movements: DataFrame, keyCol: String, ordCol: String,
      qtyCol: String, initial: Long = 150, resetBelow: Long = 25,
      resetTo: Long = 150): DataFrame = {
    val spark = movements.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types._
    // silent long-casts would truncate fractional quantities and null
    // string keys — demand integral columns up front
    Seq(keyCol, ordCol, qtyCol).foreach { c =>
      val t = movements.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
        s"replayStock column '$c' must be integral, got ${t.simpleString}")
    }
    // a NULL key/ord/qty would otherwise surface as an opaque NPE deep in
    // the tuple deserializer — raise a descriptive error inline (no extra
    // validation pass over the data)
    def nonNull(c: String): Column =
      when(col(c).isNull, raise_error(lit(
        s"replayStock: NULL in required column '$c' — filter or impute upstream")))
        .otherwise(col(c)).cast("long").as(c)
    // spillable secondary sort: repartition by key + sortWithinPartitions
    // puts each key's rows contiguously in order, so the fold streams
    // through the partition with O(1) state — no per-key in-memory
    // materialization (a hot key with millions of movements must not OOM)
    movements
      .select(nonNull(keyCol), nonNull(ordCol), nonNull(qtyCol))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(ordCol))
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        var curKey = Long.MinValue
        var level = initial
        rows.map { case (key, ord, qty) =>
          if (key != curKey) { curKey = key; level = initial }
          level -= qty
          val reset = level < resetBelow
          if (reset) level = resetTo
          (key, ord, qty, level, reset)
        }
      }
      .toDF(keyCol, ordCol, qtyCol, "stock_level", "was_restocked")
  }
}

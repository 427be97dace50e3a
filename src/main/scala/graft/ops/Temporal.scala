package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal / event-log operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props) — the behavioral
  * side of a web-scale corpus (session corpora, interaction traces,
  * conversion labels for quality classifiers).
  *
  * All three operators share one scale discipline: a SINGLE shuffle on
  * `user_id`, after which every pass (window sorts, per-session
  * aggregation, per-step funnel joins) stays co-partitioned — Spark's
  * HashPartitioning(user_id) satisfies every downstream clustering on
  * (user_id, ...) superkeys, so the plans carry exactly one exchange
  * per input regardless of how many steps compose. Timestamps are
  * compared as integral epoch microseconds (exact in both engines; no
  * double arithmetic anywhere near a hash-checked column).
  */
object Temporal {

  /** Events projected to the integral working shape. `ts` arrives as a
    * parquet timestamp; `unix_micros(cast ... as timestamp)` under the
    * session's UTC zone is exact and mirrors DuckDB's `epoch_us`. */
  private def base(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"))

  /** As-of join over the event log: for every `leftType` event, the
    * most recent `rightType` event of the SAME user at or before it
    * (ties at equal ts resolve to the larger right event_id — a total
    * order, so the match is deterministic).
    *
    * Output: (event_id, user_id, ts_us, matched_id, lag_us) —
    * matched_id/lag_us null when no prior right event exists.
    * `direction = "forward"` matches the earliest at-or-after right
    * event instead (ties to the smaller event_id); `toleranceUs` is the
    * merge_asof-style match window — a farther match is null, not
    * clamped.
    *
    * Scale design: the classic union-tag formulation — tag right rows
    * 0 and left rows 1, ONE shuffle on user_id, one in-partition sort
    * on (ts_us, side, event_id), and a running `last(..., ignoreNulls)`
    * over rows-unbounded-preceding carries the latest right event to
    * every left row in a single streaming pass. No per-row range scan,
    * no point-in-interval join explosion, no broadcast of either side:
    * cost is one sort-shuffle of (left + right) regardless of skew in
    * the time dimension. (A hot user is a hot key; the window is a
    * sequential scan per user, so a pathological single-user log is
    * the inherent serial fraction of the *semantics*, not the plan.)
    */
  def asofJoin(spark: SparkSession, events: DataFrame,
               leftType: String = "click",
               rightType: String = "view",
               direction: String = "backward",
               toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    val backward = direction == "backward"
    val b = base(events)
    val right = b.filter(col("event_type") === rightType)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        lit(0).as("side"),
        col("event_id").as("r_id"), col("ts_us").as("r_ts"))
    val left = b.filter(col("event_type") === leftType)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        lit(1).as("side"),
        lit(null).cast(LongType).as("r_id"),
        lit(null).cast(LongType).as("r_ts"))
    // Backward scans time ascending: right rows sort BEFORE left rows at
    // equal ts (side 0 < 1), so "at or before" includes the simultaneous
    // right event, and among equal-ts rights the LARGEST event_id is
    // scanned last and wins the running `last`. Forward scans time
    // DESCENDING (same one-pass frame), so the running last holds the
    // earliest at-or-after right; equal-ts rights scan event_id
    // descending, so the SMALLEST event_id wins — both are total orders.
    val w = (if (backward)
        Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("side"), col("event_id"))
      else
        Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("side"), col("event_id").desc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lag =
      if (backward) col("ts_us") - col("matched_ts")
      else col("matched_ts") - col("ts_us")
    val withMatch = right.unionAll(left)
      .withColumn("matched_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("matched_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("lag_us", lag)
    // merge_asof-style tolerance: a match farther than `toleranceUs`
    // is no match at all (both columns null), not a clamped one.
    val keep = col("lag_us") <= toleranceUs
    withMatch.select(col("event_id"), col("user_id"), col("ts_us"),
      when(keep, col("matched_id")).as("matched_id"),
      when(keep, col("lag_us")).as("lag_us"))
  }

  /** Sessionization: split each user's event stream at inactivity gaps
    * of `gapMinutes` or more, and emit one summary row per session:
    * (user_id, session_idx, first_event_id, n_events, start_us, end_us,
    * duration_us). `session_idx` is 1-based in time order per user.
    *
    * The gap rule is `next.ts - prev.ts >= gap` starts a new session —
    * exactly Spark's built-in `session_window(ts, gap)` merge semantics
    * (windows [ts, ts+gap) merge only when they overlap), so the
    * summary is bit-comparable against the built-in aggregation and
    * against a streaming `session_window` run (parity specs).
    *
    * Scale design: one shuffle on user_id; the lag + running-sum
    * windows and the (user_id, session_idx) aggregation all reuse that
    * partitioning (the groupBy keys are a superkey of the hash
    * partitioning, so no second exchange — plan-pinned in the spec).
    * State per user is O(1); no session buffering.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base(events)
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(ord))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") >= gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        // The session's first event by (ts_us, event_id) is EXACTLY the
        // row whose new_sess flag is 1: session_idx increments on that
        // row and on no other, so each group holds precisely one such
        // row — max(when(...)) over the group is that row's event_id,
        // value-identical to min(struct(ts_us, event_id)).event_id
        // (parity-pinned incl. equal-ts ties). Unlike the struct min,
        // a plain long max is HashAggregate-able, so the aggregation
        // needs NO re-sort of the 48M-row frame on (user_id,
        // session_idx) and no SortAggregate pair (plan-pinned).
        max(when(col("new_sess") === 1L, col("event_id")))
          .as("first_event_id"),
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Strict-order funnel: per user, greedily match `steps` — step 1 is
    * the user's earliest event of that type, each later step the
    * earliest event of its type STRICTLY after the previous step's
    * event (ties in ts break on event_id; "after" is (ts, event_id)
    * lexicographic, so simultaneous events still funnel in id order).
    * A user converts when all steps match within `windowUs` of step 1.
    *
    * Output: one row per user who matched step 1 — (user_id, depth,
    * t1_us, t_last_us, converted).
    *
    * Scale design: step k is a (user_id)-keyed aggregation of the
    * step-k event slice joined to the step-(k−1) frontier — after the
    * first exchange everything is co-partitioned on user_id, so the
    * whole k-step funnel is ONE shuffle per step slice and k tiny
    * hash joins, never a per-user sort or a sequence self-join. The
    * frontier is one row per user (bounded by |users|), not an event
    * blow-up.
    */
  def funnel(spark: SparkSession, events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase"),
             windowUs: Long = 3600L * 1000000L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val b = base(events)
    // Frontier after step 1: earliest (ts, id) event of steps(0).
    var frontier = b.filter(col("event_type") === steps.head)
      .groupBy("user_id")
      .agg(min(struct(col("ts_us"), col("event_id"))).as("m"))
      .select(col("user_id"),
        col("m.ts_us").as("t1_us"), col("m.ts_us").as("tk_us"),
        col("m.event_id").as("ek_id"), lit(1).as("depth"))
    var prevDepth = 1
    for (step <- steps.tail) {
      val slice = b.filter(col("event_type") === step)
        .select(col("user_id"), col("ts_us"), col("event_id"))
      // Only users whose PREVIOUS step matched are eligible to advance:
      // a view -> purchase user with no click stays at depth 1.
      val nxt = slice.join(frontier.filter(col("depth") === prevDepth),
          "user_id")
        .filter(col("ts_us") > col("tk_us") ||
          (col("ts_us") === col("tk_us") && col("event_id") > col("ek_id")))
        .groupBy("user_id")
        .agg(min(struct(col("ts_us"), col("event_id"))).as("m"),
          min(col("t1_us")).as("t1_us"))
        .select(col("user_id"), col("t1_us"),
          col("m.ts_us").as("n_ts"), col("m.event_id").as("n_id"))
      frontier = frontier.join(nxt.withColumnRenamed("t1_us", "t1n"),
          Seq("user_id"), "left")
        .select(col("user_id"), col("t1_us"),
          coalesce(col("n_ts"), col("tk_us")).as("tk_us"),
          coalesce(col("n_id"), col("ek_id")).as("ek_id"),
          (col("depth") + when(col("n_ts").isNotNull, 1).otherwise(0))
            .as("depth"))
        // Truncate lineage per step: frontier_k references frontier_{k-1}
        // TWICE (directly and through nxt), so without the cut the
        // logical plan doubles per step — 2^(k-1) embedded copies of the
        // step-1 aggregation by step k (analysis/planning cost, and
        // ReusedExchange was the only thing containing the runtime).
        // localCheckpoint materializes the one-row-per-user frontier and
        // makes the plan linear in steps (plan-pinned in TemporalSpec).
        .localCheckpoint(eager = false)
      prevDepth += 1
    }
    frontier.select(col("user_id"), col("depth"),
      col("t1_us"), col("tk_us").as("t_last_us"),
      (col("depth") === steps.size &&
        col("tk_us") - col("t1_us") <= windowUs).as("converted"))
  }
}

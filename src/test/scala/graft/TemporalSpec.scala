package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Temporal

/** Temporal event-log operators: brute-force references on randomized
  * logs, hand-built edge fixtures, session_window parity, and the
  * one-exchange plan contract. */
class TemporalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Deterministic pseudo-random event log: ~n events, nUsers users,
    * clustered timestamps so sessions/ties/funnels all actually occur
    * (ts is a multiple of 1s with repeats across users and within a
    * user at the same instant). */
  private def synthEvents(n: Int, nUsers: Int, seed: Long): DataFrame = {
    val types = Array("view", "click", "purchase", "signup", "error")
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val user = rnd.nextInt(nUsers).toLong
      // bursty: mostly small steps, occasionally a >30min jump
      val tsSec = rnd.nextInt(500) * 60L + rnd.nextInt(4)
      (i.toLong, new Timestamp(1700000000000L + tsSec * 1000L),
        user, types(rnd.nextInt(types.length)))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type")
  }

  private case class Ev(id: Long, tsUs: Long, user: Long, tpe: String)

  private def collectEvents(df: DataFrame): Seq[Ev] =
    df.select(col("event_id"), unix_micros(col("ts").cast("timestamp")),
        col("user_id"), col("event_type"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  // ------------------------------------------------------------- asofJoin

  test("asofJoin matches the brute-force latest-at-or-before reference") {
    val df = synthEvents(4000, 40, seed = 11)
    val evs = collectEvents(df)
    val views = evs.filter(_.tpe == "view")
    val expected = evs.filter(_.tpe == "click").map { c =>
      val prior = views.filter(v => v.user == c.user &&
        (v.tsUs < c.tsUs || (v.tsUs == c.tsUs)))
      val m = if (prior.isEmpty) None
        else Some(prior.maxBy(v => (v.tsUs, v.id)))
      (c.id, c.user, c.tsUs, m.map(_.id), m.map(v => c.tsUs - v.tsUs))
    }.toSet

    val got = Temporal.asofJoin(spark, df).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the synth log must exercise both matched and unmatched clicks
    assert(got.exists(_._4.isEmpty) && got.exists(_._4.nonEmpty))
  }

  test("forward asofJoin with tolerance matches the brute reference") {
    val df = synthEvents(4000, 40, seed = 29)
    val tol = 1800L * 1000000L
    val evs = collectEvents(df)
    val views = evs.filter(_.tpe == "view")
    val expected = evs.filter(_.tpe == "click").map { c =>
      val after = views.filter(v => v.user == c.user &&
        (v.tsUs > c.tsUs || v.tsUs == c.tsUs))
      val m = (if (after.isEmpty) None
        else Some(after.minBy(v => (v.tsUs, v.id))))
        .filter(v => v.tsUs - c.tsUs <= tol)
      (c.id, c.user, c.tsUs, m.map(_.id), m.map(v => v.tsUs - c.tsUs))
    }.toSet
    val got = Temporal.asofJoin(spark, df,
        direction = "forward", toleranceUs = tol)
      .collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSet
    assert(got == expected)
    // matched, tolerance-nulled and no-later-view cases all occur
    assert(got.exists(_._4.nonEmpty) && got.exists(_._4.isEmpty))
    val unmatchedWithLater = evs.filter(_.tpe == "click").exists { c =>
      val after = views.filter(v => v.user == c.user && v.tsUs >= c.tsUs)
      after.nonEmpty && after.minBy(v => (v.tsUs, v.id)).tsUs - c.tsUs > tol
    }
    assert(unmatchedWithLater) // the tolerance null-out path is exercised
  }

  test("asofJoin tie semantics: simultaneous view matches, max id wins") {
    val t0 = new Timestamp(1700000000000L)
    val df = Seq(
      (1L, t0, 7L, "view"),
      (2L, t0, 7L, "view"),   // same instant, larger id wins
      (3L, t0, 7L, "click"),  // simultaneous click matches view 2
      (4L, new Timestamp(t0.getTime + 1000), 8L, "click") // no prior view
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.asofJoin(spark, df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got(3L) == 2L)
    assert(got(4L) == -1L)
  }

  test("asofJoin plan: one exchange, no join node") {
    val plan = Temporal.asofJoin(spark, synthEvents(100, 5, 3))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  // ----------------------------------------------------------- sessionize

  test("sessionize matches Spark's built-in session_window aggregation") {
    val df = synthEvents(4000, 40, seed = 17)
    val mine = Temporal.sessionize(spark, df, gapMinutes = 30)
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val builtin = df
      .groupBy(col("user_id"),
        session_window(col("ts").cast("timestamp"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts").cast("timestamp"))).as("start_us"),
        max(unix_micros(col("ts").cast("timestamp"))).as("end_us"))
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(mine == builtin)
    assert(mine.nonEmpty)
  }

  test("sessionize gap boundary: exactly 30min starts a new session") {
    val t0 = 1700000000000L
    val df = Seq(
      (1L, new Timestamp(t0), 5L, "view"),
      (2L, new Timestamp(t0 + 30 * 60 * 1000L - 1), 5L, "view"), // same
      (3L, new Timestamp(t0 + 60 * 60 * 1000L - 1), 5L, "view")  // new: gap == 30min
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.sessionize(spark, df)
      .orderBy("session_idx")
      .select("session_idx", "n_events", "first_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 3L)))
  }

  test("sessionize plan: a single exchange serves windows and groupBy") {
    // distributed source so the exchange isn't folded into a local scan
    val df = spark.range(0, 1000, 1, 8).selectExpr(
      "id AS event_id",
      "timestamp_micros(1700000000000000 + (id % 97) * 1800000000) AS ts",
      "id % 13 AS user_id", "'view' AS event_type")
    val plan = Temporal.sessionize(spark, df)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("sessionize plan: hash aggregation, no post-window re-sort") {
    // first_event_id via max(when(new_sess=1, event_id)) keeps every
    // aggregate a mutable-buffer long, so the groupBy plans as a
    // HashAggregate directly over the window output — no SortAggregate
    // and no second full sort of the event frame on (user_id,
    // session_idx). Exactly one Sort node: the window's own.
    val df = spark.range(0, 1000, 1, 8).selectExpr(
      "id AS event_id",
      "timestamp_micros(1700000000000000 + (id % 97) * 1800000000) AS ts",
      "id % 13 AS user_id", "'view' AS event_type")
    val plan = Temporal.sessionize(spark, df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), plan)
    assert(plan.contains("HashAggregate"), plan)
    assert("Sort \\[".r.findAllIn(plan).size == 1, plan)
  }

  test("sessionize first_event_id equals the min(struct) formulation") {
    // The r5 formulation took min(struct(ts_us, event_id)).event_id per
    // (user_id, session_idx); the hash-aggregable rewrite takes the
    // event_id of the unique new_sess=1 row. Equality on a randomized
    // log whose same-instant repeats exercise the tie case: the session
    // opener IS the lexicographic (ts_us, event_id) minimum.
    val df = synthEvents(6000, 25, seed = 41)
    val gapUs = 30L * 60L * 1000000L
    val evs = collectEvents(df)
    val expected = evs.groupBy(_.user).flatMap { case (user, us) =>
      val sorted = us.sortBy(e => (e.tsUs, e.id))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.tail.foreach { e =>
        if (e.tsUs - sessions.last.last.tsUs >= gapUs)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (user, (i + 1).toLong, s.minBy(e => (e.tsUs, e.id)).id,
          s.length.toLong)
      }
    }.toSet
    val got = Temporal.sessionize(spark, df)
      .select("user_id", "session_idx", "first_event_id", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // ties actually occur in the fixture (same user, same instant)
    assert(evs.groupBy(e => (e.user, e.tsUs)).exists(_._2.size > 1))
  }

  // --------------------------------------------------------------- funnel

  /** Brute-force greedy funnel reference. */
  private def bruteFunnel(evs: Seq[Ev], steps: Seq[String],
                          windowUs: Long): Set[(Long, Int, Long, Long, Boolean)] =
    evs.groupBy(_.user).flatMap { case (user, es) =>
      val first = es.filter(_.tpe == steps.head)
        .sortBy(e => (e.tsUs, e.id)).headOption
      first.map { f =>
        var depth = 1
        var cur = f
        var done = false
        for (step <- steps.tail if !done) {
          es.filter(e => e.tpe == step &&
              (e.tsUs > cur.tsUs || (e.tsUs == cur.tsUs && e.id > cur.id)))
            .sortBy(e => (e.tsUs, e.id)).headOption match {
            case Some(n) => depth += 1; cur = n
            case None => done = true
          }
        }
        (user, depth, f.tsUs, cur.tsUs,
          depth == steps.size && cur.tsUs - f.tsUs <= windowUs)
      }
    }.toSet

  test("funnel matches the brute-force greedy reference") {
    // sparse log (~5 events/user) so missing steps actually occur; a
    // 4h window so conversions occur too (ts spans ~8.3h uniformly)
    val df = synthEvents(1500, 300, seed = 23)
    val windowUs = 4L * 3600L * 1000000L
    val expected = bruteFunnel(collectEvents(df),
      Seq("view", "click", "purchase"), windowUs)
    val got = Temporal.funnel(spark, df, windowUs = windowUs)
      .collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
    }.toSet
    assert(got == expected)
    // all depths and both conversion outcomes must occur in the fixture
    assert(Set(1, 2, 3).subsetOf(got.map(_._2)))
    assert(got.exists(_._5) && got.exists(g => g._2 == 3 && !g._5))
  }

  test("funnel skipped middle step does not advance depth") {
    val t0 = 1700000000000L
    def ts(s: Long) = new Timestamp(t0 + s * 1000L)
    val df = Seq(
      (1L, ts(0), 1L, "view"),
      (2L, ts(10), 1L, "purchase"),   // no click: depth stays 1
      (3L, ts(0), 2L, "view"),
      (4L, ts(10), 2L, "click"),
      (5L, ts(5), 2L, "purchase"),    // purchase BEFORE click: no advance
      (6L, ts(20), 2L, "purchase"),   // after click: converts
      (7L, ts(0), 3L, "click")        // no view: user absent entirely
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.funnel(spark, df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(4)))).toMap
    assert(got == Map(1L -> ((1, false)), 2L -> ((3, true))))
  }

  test("funnel conversion window boundary is inclusive") {
    val t0 = 1700000000000L
    def ts(s: Long) = new Timestamp(t0 + s * 1000L)
    val mk = (u: Long, off: Long) => Seq(
      (u * 10 + 1, ts(0), u, "view"),
      (u * 10 + 2, ts(1), u, "click"),
      (u * 10 + 3, ts(off), u, "purchase"))
    val df = (mk(1L, 3600L) ++ mk(2L, 3601L))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.funnel(spark, df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got == Map(1L -> true, 2L -> false))
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),
      (2L, "k1", ts("2024-01-01 12:00:00")),
      (3L, "k1", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "k2", ts("2024-01-01 12:00:00"))  // key with no right rows
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k1", ts("2024-01-01 09:30:00"), 100L),
      ("k1", ts("2024-01-01 11:00:00"), 200L)
    ).toDF("k", "t", "v")
    val out = Joins.asofJoin(left, right, "k", "t", "t")
      .select($"id", $"asof.v".as("v")).sort("id")
      .as[(Long, Option[Long])].collect()
    assert(out === Seq((1L, Some(100L)), (2L, Some(200L)), (3L, None), (4L, None)))
  }

  test("asofJoin: equal-time right row matches, unless strict") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("k", ts("2024-01-01 10:00:00"), 1L),
      ("k", ts("2024-01-01 09:00:00"), 2L)).toDF("k", "t", "v")
    def run(strict: Boolean) =
      Joins.asofJoin(left, right, "k", "t", "t", strict = strict)
        .select($"asof.v").as[Option[Long]].head()
    assert(run(strict = false) === Some(1L)) // inclusive: the 10:00 row
    assert(run(strict = true) === Some(2L))  // strict: falls back to 09:00
  }

  test("asofJoin: carried payload keeps all value columns from ONE right row") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((7L, ts("2024-01-01 09:00:00"), 5L, "a"),
      (7L, ts("2024-01-01 08:00:00"), 9L, "b")).toDF("k", "t", "v1", "v2")
    val r = Joins.asofJoin(left, right, "k", "t", "t")
      .select($"asof.v1", $"asof.v2", unix_micros($"asof.__rt")).head()
    assert(r === Row(5L, "a", ts("2024-01-01 09:00:00").getTime * 1000L))
  }

  // Consistency check of the production wiring against a hand-rolled
  // window formulation (it shares the algorithm — the INDEPENDENT
  // correctness signal is the DuckDB ASOF JOIN oracle of q_asof_join).
  test("asofJoin matches a window-derived oracle on events (self as-of)") {
    val events = sources.Tables(spark, sfDir, "events")
    val purchases = events.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max("event_id").as("pid"))
    val got = Joins.asofJoin(events, purchases, "user_id", "ts", "ts")
      .select($"event_id", $"asof.pid".as("pid"))
    // independent oracle: last_value(ignoreNulls) over a tagged union
    val u = events.select($"user_id", $"ts", lit(null).cast("long").as("pid"),
        $"event_id", lit(1).as("side"))
      .unionByName(purchases.select($"user_id", $"ts", $"pid",
        lit(null).cast("long").as("event_id"), lit(0).as("side")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy($"ts".asc, $"side".asc)
      .rowsBetween(Long.MinValue, 0)
    val want = u.withColumn("lp", last($"pid", ignoreNulls = true).over(w))
      .filter($"side" === 1).select($"event_id", $"lp".as("pid"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // sanity: some events have a prior purchase, some don't
    val n = got.count()
    val matched = got.filter($"pid".isNotNull).count()
    assert(matched > 0 && matched < n)
  }

  test("asofJoin: null keys never match; null-key left rows pass through") {
    val left = Seq((1L, Some(7L), ts("2024-01-01 10:00:00")),
      (2L, None: Option[Long], ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((Some(7L), ts("2024-01-01 09:00:00"), 1L),
      (None: Option[Long], ts("2024-01-01 09:00:00"), 2L)).toDF("k", "t", "v")
    val out = Joins.asofJoin(left, right, "k", "t", "t")
      .select($"id", $"asof.v").sort("id").as[(Long, Option[Long])].collect()
    assert(out === Seq((1L, Some(1L)), (2L, None)))
  }

  test("working-column collisions are rejected up front") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("asof", "t")
    val r = Seq((1L, ts("2024-01-01 09:00:00"))).toDF("k", "t")
    intercept[IllegalArgumentException](Joins.asofJoin(df, r, "asof", "t", "t"))
    val p = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("__b", "pt")
    val iv = Seq((ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"))).toDF("s", "e")
    intercept[IllegalArgumentException](
      Joins.rangeJoin(p, "pt", iv, "s", "e", 3600000000L))
  }

  test("rangeJoin: inclusive start, exclusive end, multi-bucket intervals") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start: in
      (2L, ts("2024-01-01 11:29:59")), // interior, second bucket: in
      (3L, ts("2024-01-01 11:30:00")), // == end: out
      (4L, ts("2024-01-01 09:59:59"))  // before: out
    ).toDF("pid", "pt")
    val iv = Seq((10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:30:00")))
      .toDF("iv_id", "s", "e")
    val got = Joins.rangeJoin(probe, "pt", iv, "s", "e", bucketUs = 3600L * 1000000L)
      .select("pid", "iv_id").sort("pid").as[(Long, Long)].collect()
    assert(got === Seq((1L, 10L), (2L, 10L)))
  }

  test("rangeJoin fails loud on an interval spanning more than the bucket budget") {
    val probe = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "pt")
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00")))
      .toDF("iv_id", "s", "e")
    val ex = intercept[Exception] {
      Joins.rangeJoin(probe, "pt", iv, "s", "e", bucketUs = 3600L * 1000000L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("rangeJoin: interval spans")), ex.toString)
  }

  test("rangeJoin: each match emitted once; empty intervals drop") {
    val probe = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "pt")
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")), // spans 3 buckets
      (2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:00"))  // empty
    ).toDF("iv_id", "s", "e")
    val got = Joins.rangeJoin(probe, "pt", iv, "s", "e", bucketUs = 2400L * 1000000L)
      .select("pid", "iv_id").as[(Long, Long)].collect()
    assert(got === Seq((1L, 1L)))
  }

  test("asofJoin equals per-row brute force over seeded random data") {
    val rng = new scala.util.Random(7)
    val leftRows = Seq.fill(300)((rng.nextInt(8).toLong, rng.nextInt(100000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    // unique (key, time) on the right by construction (distinct)
    val rightRows = Seq.fill(150)((rng.nextInt(8).toLong,
      rng.nextInt(100000).toLong)).distinct
      .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
    val left = leftRows.toDF("id", "k", "tu")
      .select($"id", $"k", timestamp_micros($"tu").as("t"))
    val right = rightRows.toDF("k", "tu", "v")
      .select($"k", timestamp_micros($"tu").as("t"), $"v")
    val got = Joins.asofJoin(left, right, "k", "t", "t")
      .select($"id", $"asof.v".as("v")).sort("id")
      .as[(Long, Option[Long])].collect().toSeq
    val byKey = rightRows.groupBy(_._1)
    val want = leftRows.map { case (id, k, t) =>
      val c = byKey.getOrElse(k, Nil).filter(_._2 <= t)
      (id, if (c.isEmpty) None else Some(c.maxBy(_._2)._3))
    }
    assert(got == want)
    // strict mode: drop the equal-time matches from the candidate set
    val gotStrict = Joins.asofJoin(left, right, "k", "t", "t", strict = true)
      .select($"id", $"asof.v".as("v")).sort("id")
      .as[(Long, Option[Long])].collect().toSeq
    val wantStrict = leftRows.map { case (id, k, t) =>
      val c = byKey.getOrElse(k, Nil).filter(_._2 < t)
      (id, if (c.isEmpty) None else Some(c.maxBy(_._2)._3))
    }
    assert(gotStrict == wantStrict)
  }

  test("rangeJoin equals per-row brute force over seeded random intervals") {
    val rng = new scala.util.Random(11)
    val probeRows = (0 until 400).map(i => (i.toLong, rng.nextInt(500000).toLong))
    val ivRows = (0 until 60).map { i =>
      val s = rng.nextInt(500000).toLong
      (1000L + i, s, s + rng.nextInt(40000).toLong)
    }
    val probe = probeRows.toDF("pid", "ptu")
      .select($"pid", timestamp_micros($"ptu").as("pt"))
    val iv = ivRows.toDF("iv_id", "su", "eu")
      .select($"iv_id", timestamp_micros($"su").as("s"), timestamp_micros($"eu").as("e"))
    val got = Joins.rangeJoin(probe, "pt", iv, "s", "e", bucketUs = 10000L)
      .select("pid", "iv_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (pid, pt) <- probeRows
      (ivId, s, e) <- ivRows
      if pt >= s && pt < e
    } yield (pid, ivId)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("guards are case-insensitive and fail with caller-facing messages") {
    val l = Seq((1L, 100L)).toDF("k", "t")
      .select($"k", timestamp_micros($"t").as("t"))
    val r = Seq((1L, 50L, "x")).toDF("k", "rt", "v")
      .select($"k", timestamp_micros($"rt").as("rt"), $"v")
    // the session resolver is case-insensitive: a user column 'Asof'
    // IS the operator's output column — reject it, don't overwrite it
    val lAsof = l.withColumn("Asof", lit(1))
    val e1 = intercept[IllegalArgumentException](
      Joins.asofJoin(lAsof, r, "k", "t", "rt"))
    assert(e1.getMessage.contains("collide"))
    // time-type mismatch names the CALLER's columns, not internal __t
    val rLong = Seq((1L, 50L, "x")).toDF("k", "rt", "v")
    val e2 = intercept[IllegalArgumentException](
      Joins.asofJoin(l, rLong, "k", "t", "rt"))
    assert(e2.getMessage.contains("'t'") && e2.getMessage.contains("'rt'"))
    // rangeJoin: case-variant working-column clash + bad budget
    val probe = Seq((1L, 100L)).toDF("pid", "ptu")
      .select($"pid", timestamp_micros($"ptu").as("pt"), lit(0L).as("__B"))
    val iv = Seq((10L, 0L, 200L)).toDF("iv", "su", "eu")
      .select($"iv", timestamp_micros($"su").as("s"), timestamp_micros($"eu").as("e"))
    val e3 = intercept[IllegalArgumentException](
      Joins.rangeJoin(probe, "pt", iv, "s", "e", 1000L))
    assert(e3.getMessage.contains("collide"))
    intercept[IllegalArgumentException](
      Joins.rangeJoin(probe.drop("__B"), "pt", iv, "s", "e", 1000L,
        maxBucketsPerInterval = 0))
  }

  test("asofJoin: null-key left rows bypass the window with a null match") {
    val l = Seq((Some(1L), 100L, "a"), (None, 100L, "b"), (None, 200L, "c"))
      .toDF("k", "t", "tag")
      .select($"k", timestamp_micros($"t").as("t"), $"tag")
    val r = Seq((1L, 50L, "hit")).toDF("k", "rt", "v")
      .select($"k", timestamp_micros($"rt").as("rt"), $"v")
    val got = Joins.asofJoin(l, r, "k", "t", "rt")
      .select($"tag", $"asof".isNull.as("noMatch")).as[(String, Boolean)]
      .collect().toSet
    // all three left rows survive; only the keyed one matches
    assert(got == Set(("a", false), ("b", true), ("c", true)))
  }

  test("rangeJoin plans a hash/merge join on the bucket key, not a cross join") {
    val events = sources.Tables(spark, sfDir, "events")
    val anchors = events.filter($"event_type" === "signup" && $"value" > 9.0)
      .select($"event_id".as("anchor_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 1 HOUR")).as("w_end"))
    val plan = Joins.rangeJoin(events, "ts", anchors, "w_start", "w_end",
        3600L * 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}

package graft.ops

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, event_id, ts) — ts in plain longs; gaps of 5 split sessions
  private def events = Seq(
    (1L, 1L, 100L), (1L, 2L, 103L), (1L, 3L, 104L), // session 1
    (1L, 4L, 200L), (1L, 5L, 205L),                 // session 2 (gap 96; 205-200=5 = gap, same session)
    (2L, 6L, 100L),                                 // lone event
    (2L, 7L, 300L)                                  // next session
  ).toDF("user_id", "event_id", "ts")

  test("sessionize breaks on gap > threshold, 1-based per key") {
    val got = Temporal.sessionize(events, "user_id", "ts", gap = 5L,
        tieCols = Seq("event_id"))
      .select($"user_id", $"event_id", $"session_seq")
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L),
      (1L, 4L, 2L), (1L, 5L, 2L), (2L, 6L, 1L), (2L, 7L, 2L)), got.toString)
  }

  test("asof join strict: equal timestamps do not match; prior row carried") {
    val left = Seq((1L, 10L, 104L), (1L, 11L, 100L), (2L, 12L, 50L))
      .toDF("user_id", "id", "ts")
    val right = Seq((1L, 20L, 100L, 7.0), (1L, 21L, 103L, 8.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = Temporal.asofJoin(left, right, "user_id", "ts",
        rightVals = Seq("event_id", "ts", "value"), tieCol = "event_id")
      .select($"id", $"asof_event_id", $"asof_ts", $"asof_value")
      .as[(Long, Option[Long], Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq
    // id=10 at 104 sees right@103; id=11 at 100 sees nothing (strict <);
    // id=12 has no right rows for its key
    assert(got == Seq(
      (10L, Some(21L), Some(103L), Some(8.0)),
      (11L, None, None, None),
      (12L, None, None, None)), got.toString)
  }

  test("asof join carries the matched ROW intact when right fields are null") {
    // right@2 has a null value: the left row must see (event 21, null) —
    // the most recent right row as-is — not event 21's id with event 20's
    // value smuggled in by a per-column non-null carry
    val left = Seq((1L, 10L, 5L)).toDF("user_id", "id", "ts")
    val right = Seq((1L, 20L, 1L, Some(7.0)), (1L, 21L, 2L, None))
      .toDF("user_id", "event_id", "ts", "value")
    val got = Temporal.asofJoin(left, right, "user_id", "ts",
        rightVals = Seq("event_id", "value"), tieCol = "event_id")
      .select($"asof_event_id", $"asof_value")
      .as[(Option[Long], Option[Double])].collect().toSeq
    assert(got == Seq((Some(21L), None)), got.toString)
  }

  test("asof join resolves exact-timestamp ties to the greatest tie column") {
    val left = Seq((1L, 10L, 200L)).toDF("user_id", "id", "ts")
    val right = Seq((1L, 20L, 150L, 1.0), (1L, 22L, 150L, 2.0),
      (1L, 21L, 150L, 3.0)).toDF("user_id", "event_id", "ts", "value")
    val got = Temporal.asofJoin(left, right, "user_id", "ts",
        rightVals = Seq("event_id", "value"), tieCol = "event_id")
      .select($"asof_event_id", $"asof_value")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((22L, 2.0)), got.toString)
  }

  test("streaming sessionize: in-batch gap closes; timeout closes on watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val src = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
    val out = Temporal.sessionizeStream(src, "user_id", "ts", "value",
      gapMs = 60_000L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sess_stream_test").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: two events 30s apart (one session), then a 90s gap opens a
    // second session in the same batch — the first closes immediately
    mem.addData((1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:30"), 2.0),
      (1L, ts("2024-01-01 00:02:00"), 4.0))
    q.processAllAvailable()
    // batch 2: another key far in the future advances the watermark past
    // key 1's open session + gap — the timeout path must emit it
    mem.addData((2L, ts("2024-01-01 00:10:00"), 8.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, session_start, n_events, sum_value FROM sess_stream_test ORDER BY session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3))).toSeq
    q.stop()
    assert(rows == Seq(
      (1L, "2024-01-01 00:00:00.0", 2L, 3.0),
      (1L, "2024-01-01 00:02:00.0", 1L, 4.0)), rows.toString)
  }

  test("stream-stream asof: out-of-order arrivals converge to batch answers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lMem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rMem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = Temporal.asofJoinStream(
      lMem.toDF().toDF("k", "ts", "price"),
      rMem.toDF().toDF("k", "ts", "quote"),
      "k", "ts", "price", "quote", delay = "30 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("asof_stream_test").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: rights at :10 and :40, lefts at :05 (no prior right), :15, :45
    rMem.addData((1L, ts("2024-01-01 00:00:10"), 100.0),
      (1L, ts("2024-01-01 00:00:40"), 400.0))
    lMem.addData((1L, ts("2024-01-01 00:00:05"), 0.5),
      (1L, ts("2024-01-01 00:00:15"), 1.5),
      (1L, ts("2024-01-01 00:00:45"), 4.5))
    q.processAllAvailable()
    // batch 2: an OUT-OF-ORDER right at :25 (inside the 30 s horizon —
    // it must still win for the left at :30), a left at :30, and
    // far-future rows on BOTH streams (union watermark = min of the two)
    rMem.addData((1L, ts("2024-01-01 00:00:25"), 250.0),
      (2L, ts("2024-01-01 00:05:00"), 0.0))
    lMem.addData((1L, ts("2024-01-01 00:00:30"), 3.0),
      (2L, ts("2024-01-01 00:05:00"), 0.0))
    q.processAllAvailable()
    // batch 3 + 4: keep advancing so the lagged watermark passes :45
    for (m <- Seq("00:07:00", "00:09:00")) {
      rMem.addData((2L, ts(s"2024-01-01 $m"), 0.0))
      lMem.addData((2L, ts(s"2024-01-01 $m"), 0.0))
      q.processAllAvailable()
    }
    val rows = spark.sql(
      "SELECT ts, price, asof_ts, asof_quote FROM asof_stream_test WHERE k = 1 ORDER BY ts")
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1),
        Option(r.getTimestamp(2)).map(_.toString), Option(r.get(3)))).toSeq
    q.stop()
    assert(rows == Seq(
      ("2024-01-01 00:00:05.0", 0.5, None, None),
      ("2024-01-01 00:00:15.0", 1.5, Some("2024-01-01 00:00:10.0"), Some(100.0)),
      ("2024-01-01 00:00:30.0", 3.0, Some("2024-01-01 00:00:25.0"), Some(250.0)),
      ("2024-01-01 00:00:45.0", 4.5, Some("2024-01-01 00:00:40.0"), Some(400.0))),
      rows.toString)
  }

  test("asof join inclusive (strict=false) matches equal timestamps") {
    val left = Seq((1L, 10L, 100L)).toDF("user_id", "id", "ts")
    val right = Seq((1L, 20L, 100L, 7.0)).toDF("user_id", "event_id", "ts", "value")
    val got = Temporal.asofJoin(left, right, "user_id", "ts",
        rightVals = Seq("event_id"), tieCol = "event_id", strict = false)
      .select($"asof_event_id").as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(20L)), got.toString)
  }

  test("band join matches the BETWEEN semantics exactly once per pair") {
    val left = Seq((1L, 10L, 5.0), (1L, 11L, 100.0), (2L, 12L, 5.0), (1L, 13L, -3.0))
      .toDF("user_id", "lid", "lv")
    val right = Seq((1L, 20L, 7.0), (1L, 21L, 3.0), (1L, 22L, 7.001),
      (1L, 23L, 98.0), (1L, 26L, 97.999), (2L, 24L, 400.0), (1L, 25L, -5.0))
      .toDF("user_id", "rid", "rv")
    val got = Temporal.bandJoin(left, right, "user_id", "lv", "rv", band = 2.0)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
    // lid=10 (5.0): rids at 7.0 (inclusive boundary), 3.0; NOT 7.001
    // lid=11 (100.0): 98.0 on the inclusive boundary, 97.999 just out;
    // lid=13 (-3.0): -5.0 inclusive boundary on the negative axis;
    // key isolation keeps user 2's 400.0 away from user 1's probes
    assert(got == Seq((10L, 20L), (10L, 21L), (11L, 23L), (13L, 25L)), got.toString)
    // exactly-once: no pair duplicated by the bucket explode
    assert(got.distinct == got)
  }

  test("band join equals the naive BETWEEN join on random data (bucket-edge fuzz)") {
    val rnd = new scala.util.Random(11)
    // values intentionally land ON and NEAR bucket boundaries: multiples
    // of band/2 mixed with arbitrary doubles, both signs
    val band = 3.0
    def v() = if (rnd.nextBoolean()) (rnd.nextInt(41) - 20) * (band / 2)
              else rnd.nextDouble() * 60 - 30
    val left = (1 to 120).map(i => (i % 5L, i.toLong, v())).toDF("k", "lid", "lv")
    val right = (1 to 120).map(i => (i % 5L, 1000L + i, v())).toDF("k", "rid", "rv")
    val got = Temporal.bandJoin(left, right, "k", "lv", "rv", band)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
    val want = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && abs($"l.lv" - $"r.rv") <= band)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == want, s"band join diverged: ${got.size} vs ${want.size} pairs")
    assert(got.distinct == got, "no pair may be emitted twice")
    assert(want.nonEmpty)
  }

  test("band join renames colliding right columns with the suffix") {
    val left = Seq((1L, 1.0, "a")).toDF("k", "v", "tag")
    val right = Seq((1L, 1.5, "b")).toDF("k", "v", "tag")
    val out = Temporal.bandJoin(left, right, "k", "v", "v", band = 1.0)
    assert(out.columns.toSeq == Seq("k", "v", "tag", "v_r", "tag_r"))
    assert(out.count() == 1)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property layer for the round-6 event operators: randomized event
  * streams (duplicate timestamps, bursts, sparse keys) asserting
  * equivalence against straightforward in-memory reference
  * implementations. Raw ScalaCheck `Gen` with a fixed seed (the
  * scalatest-plus bridge isn't in the offline cache); deterministic
  * samples per property.
  */
class EventOpsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // (id, key, time-us) with heavy ts collisions and few keys
  private val eventsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(60, for {
      key <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 30L).map(_ * 10L) // collisions guaranteed
    } yield (key, t)).map(_.zipWithIndex.map {
      case ((k, t), i) => (i.toLong, k, t)
    })

  private def samples[A](g: Gen[List[A]], n: Int): Seq[List[A]] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("sessionize == reference fold over sorted events (10 random streams)") {
    for (ev <- samples(eventsGen, 10)) {
      val df = ev.toDF("eid", "k", "us")
        .withColumn("t", timestamp_micros(col("us"))).drop("us")
      val gap = 25L
      val got = Sessionize.assignSessions(df, "k", "t", "eid", gap)
        .select("eid", "session_seq")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: per key, sort by (t, id), split on gap
      val want = ev.groupBy(_._2).flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._1))
        var seq = -1L; var prev = Long.MinValue
        sorted.map { case (id, _, t) =>
          if (prev == Long.MinValue || t - prev > gap) seq += 1
          prev = t
          id -> seq
        }
      }.toMap
      assert(got === want)
    }
  }

  test("joinAsOf == reference per-row max-prior scan (10 random stream pairs)") {
    for (ev <- samples(eventsGen, 10)) {
      val (rightRaw, leftRaw) = ev.partition(_._1 % 2 == 0)
      val l = leftRaw.toDF("id", "k", "us")
        .withColumn("t", timestamp_micros(col("us"))).drop("us")
      val r = rightRaw.map { case (id, k, t) => (id, k, t, t.toDouble) }
        .toDF("rid", "k", "us", "price")
        .withColumn("t", timestamp_micros(col("us"))).drop("us")
      val got = Asof.joinAsOf(l, r, Seq("k"), "t", "t", "rid")
        .select("id", "right_rid")
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
      val want = leftRaw.map { case (id, k, t) =>
        val cand = rightRaw.filter(rr => rr._2 == k && rr._3 <= t)
        id -> (if (cand.isEmpty) -1L
               else cand.maxBy(rr => (rr._3, rr._1))._1)
      }.toMap
      assert(got === want)
    }
  }

  test("pointInInterval == reference filter (10 random point/interval sets)") {
    for (ev <- samples(eventsGen, 10)) {
      val points = ev.take(30)
      val intervals = ev.drop(30).map { case (id, k, t) =>
        (id, k, t, t + (id % 5) * 20L) // spans 0..4 buckets of width 20
      }
      val p = points.toDF("pid", "k", "t")
      val i = intervals.toDF("iid", "k", "lo", "hi")
      val got = RangeJoin.pointInInterval(p, i, Seq("k"), "t", "lo", "hi", 20L)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, pk, t) <- points
        (iid, ik, lo, hi) <- intervals
        if pk == ik && t >= lo && t <= hi
      } yield (pid, iid)).toSet
      assert(got === want)
    }
  }

  test("Cdc.apply == reference latest-wins map (10 random changelogs)") {
    for (ev <- samples(eventsGen, 10)) {
      val log = ev.map { case (id, k, t) =>
        (id, k, t, if (id % 5 == 0) "D" else "U", s"v$id")
      }
      val df = log.toDF("tie", "k", "ts", "op", "v")
      val got = graft.silver.Cdc.apply(df, "k", "ts", "tie", "op", Seq("v"))
        .select("k", "v")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = log.groupBy(_._2).flatMap { case (k, rows) =>
        val deciding = rows.maxBy(r => (r._3, r._1))
        if (deciding._4 == "D") None else Some(k -> deciding._5)
      }.toMap
      assert(got === want)
    }
  }
}

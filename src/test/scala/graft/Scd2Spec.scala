package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Scd2, Temporal}

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val changes = Seq(
    (1L, 100L, "v1"), (1L, 200L, "v2"), (1L, 300L, "v3"),
    (2L, 150L, "w1")
  ).toDF("key", "ts", "payload")

  test("versionize chains intervals per key; the last version is open") {
    val got = Scd2.versionize(changes, Seq("key"), "ts")
      .select($"key", $"valid_from", $"valid_to", $"payload")
      .as[(Long, Long, Option[Long], String)].collect().toSet
    assert(got == Set(
      (1L, 100L, Some(200L), "v1"), (1L, 200L, Some(300L), "v2"),
      (1L, 300L, None, "v3"), (2L, 150L, None, "w1")))
  }

  test("snapshotAt returns at most one version per key, the one " +
    "containing t; before the first change a key is absent") {
    val vs = Scd2.versionize(changes, Seq("key"), "ts")
    def snap(t: Long) = Scd2.snapshotAt(vs, lit(t))
      .select($"key", $"payload").as[(Long, String)].collect().toMap
    assert(snap(99L) == Map.empty)
    assert(snap(100L) == Map(1L -> "v1"))
    assert(snap(250L) == Map(1L -> "v2", 2L -> "w1"))
    assert(snap(5000L) == Map(1L -> "v3", 2L -> "w1"))
  }

  test("snapshotAt agrees with the as-of join for every event time " +
    "(point-in-time resolution consistency)") {
    val r = new scala.util.Random(5)
    val rndChanges = Seq.fill(300)((r.nextInt(8).toLong,
        r.nextInt(1000).toLong)).distinct
      .map { case (k, t) => (k, t, s"p$k-$t") }
      .toDF("key", "ts", "payload")
    val versions = Scd2.versionize(rndChanges, Seq("key"), "ts")
    val events = Seq.tabulate(100)(i =>
      (i.toLong, r.nextInt(9).toLong, r.nextInt(1200).toLong))
      .toDF("event_id", "key", "ets")
    // per-event as-of resolution of the same change log
    val viaAsOf = Temporal.asOfJoinBackward(events, rndChanges,
        Seq("key"), "ets", "ts")
      .select($"event_id", $"payload")
      .as[(Long, Option[String])].collect().toMap
    // per-event snapshot lookup (slow path: one snapshot per distinct t)
    events.select($"event_id", $"key", $"ets")
      .as[(Long, Long, Long)].collect().foreach { case (eid, k, t) =>
        val snap = Scd2.snapshotAt(versions, lit(t))
          .filter($"key" === k).select($"payload").as[String].collect()
        assert(snap.length <= 1)
        assert(viaAsOf(eid) == snap.headOption, s"event $eid key $k t $t")
      }
  }
}

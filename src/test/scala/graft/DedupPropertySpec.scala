package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Property tests over the DataFrame dedup operators. Each generated
  * case runs Spark jobs, so generators are sized down (tens of cases,
  * tens of rows) — the point is invariants over adversarial small
  * inputs (ties, duplicates, empty frames), not volume. */
class DedupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(name: String, p: Prop, cases: Int = 15): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // small key/value domains force collisions and ties; sizes include 0
  // so empty frames are exercised too
  private val rows: Gen[List[(String, Int, Int)]] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4")
      a <- Gen.choose(0, 5)
      b <- Gen.choose(0, 5)
    } yield (k, a, b)))

  test("latestWins keeps exactly the rows attaining all per-key extremes") {
    check("latest-wins", Prop.forAll(rows) { rs =>
      val df = rs.toDF("k", "a", "b")
      val got = Dedup.latestWins(df, Seq("k"), maxCols = Seq("a"), minCols = Seq("b"))
        .as[(String, Int, Int)].collect().toSet
      val byKey = rs.groupBy(_._1)
      val expected = byKey.flatMap { case (k, g) =>
        val mx = g.map(_._2).max; val mn = g.map(_._3).min
        g.filter(r => r._2 == mx && r._3 == mn).toSet
      }.toSet
      got == expected
    })
  }

  test("antiJoinNew output is disjoint from existing and within incoming") {
    val existingGen = Gen.listOf(Gen.oneOf("k1", "k2", "k3", "k4"))
    check("anti-join", Prop.forAll(rows, existingGen) { (rs, ex) =>
      val incoming = rs.toDF("k", "a", "b")
      val existing = ex.toDF("k")
      val got = Dedup.antiJoinNew(incoming, existing, Seq("k"))
        .as[(String, Int, Int)].collect()
      got.forall(r => !ex.contains(r._1)) &&
        got.toSet.subsetOf(rs.toSet) &&
        got.length == rs.count(r => !ex.contains(r._1))
    }, cases = 10)
  }

  test("sessionizeBatch: event counts conserved; session count equals " +
    "gap count + 1 per user") {
    val events: Gen[List[(Long, Int)]] = // (user, minute offset)
      Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        m <- Gen.choose(0, 600)
      } yield (u, m)))
    check("sessionize", Prop.forAll(events) { evs =>
      val df = evs.zipWithIndex.map { case ((u, m), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + m * 60000L),
          u, "e", 1.0, "")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val sessions = graft.streaming.EventsStreaming
        .sessionizeBatch(df, gapMinutes = 30)
        .select($"user_id", $"n_events").as[(Long, Long)].collect()
      val conserved = sessions.map(_._2).sum == evs.length
      val expectedPerUser = evs.groupBy(_._1).map { case (u, g) =>
        val times = g.map(_._2).sorted
        u -> (1 + times.zip(times.tail).count { case (a, b) => b - a > 30 })
      }
      val gotPerUser = sessions.groupBy(_._1).map { case (u, s) => u -> s.length }
      conserved && gotPerUser == expectedPerUser
    }, cases = 10)
  }

  test("idempotentUpsert: applying twice equals applying once") {
    check("upsert-idem", Prop.forAll(rows) { rs =>
      val all = rs.toDF("k", "a", "b")
      val existing = all.filter($"a" % 2 === 0)
      val once = Dedup.idempotentUpsert(existing, all, Seq("k"))
      val twice = Dedup.idempotentUpsert(once, all, Seq("k"))
      // same key multiset after one and two applications
      once.groupBy($"k").count().as[(String, Long)].collect().toMap ==
        twice.groupBy($"k").count().as[(String, Long)].collect().toMap
    }, cases = 10)
  }
}

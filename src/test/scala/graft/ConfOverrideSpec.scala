package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.GraftSqlShim
import org.scalatest.funsuite.AnyFunSuite

/** The thread-confined SQLConf override behind Graph.withShuffleWidth
  * (round-16 verdict item 3): the iterative loops narrow
  * spark.sql.shuffle.partitions for THEIR OWN planning without leaking
  * the narrowed width into queries planned concurrently on the same
  * session (the grouped-pass hazard of the old session-global
  * conf.set/restore pattern). */
class ConfOverrideSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def aggWidth(): Int = {
    // width of the aggregation exchange as PLANNED on this thread
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("v", "k")
      .groupBy("k").count()
    val plan = df.queryExecution.executedPlan.toString
    val m = "hashpartitioning\\([^)]*?(\\d+)\\)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"no hash exchange in plan:\n$plan")
    m.get.group(1).toInt
  }

  test("withConfOverride narrows planning on the calling thread only") {
    val default = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(aggWidth() == default)
    val inOverride = new CountDownLatch(1)
    val peerDone = new CountDownLatch(1)
    @volatile var peerWidth = -1
    @volatile var peerErr: Throwable = null
    val peer = new Thread(() => {
      try {
        inOverride.await(30, TimeUnit.SECONDS)
        peerWidth = aggWidth() // planned WHILE the override is active
      } catch { case t: Throwable => peerErr = t }
      finally peerDone.countDown()
    })
    peer.start()
    val insideWidth =
      GraftSqlShim.withConfOverride(spark,
        Map("spark.sql.shuffle.partitions" -> "3")) {
        val w = aggWidth()
        inOverride.countDown()
        assert(peerDone.await(30, TimeUnit.SECONDS), "peer thread timed out")
        w
      }
    peer.join(30000)
    if (peerErr != null) throw peerErr
    assert(insideWidth == 3, "override must reach planning on its own thread")
    assert(peerWidth == default,
      "a concurrently-planning thread must keep the session width")
    // the session conf itself is never mutated
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt == default)
    assert(aggWidth() == default)
  }
}

package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.util.LongAccumulator

/** Observability for the `maxBucket` candidate caps.
  *
  * Every bucketed pair-generation path ([[NearDup.minhashPairs]],
  * [[Similarity.cosineNearDupPairs]]) drops buckets larger than
  * `maxBucket` instead of letting a degenerate bucket (boilerplate
  * documents, a black-hole LSH cell) explode quadratically. At 100 TB a
  * silently dropped bucket is invisible RECALL loss — so the cap filter
  * COUNTS what it drops into named [[LongAccumulator]]s (visible in the
  * Spark UI per job) and a session listener logs any new drops after
  * each action.
  *
  * Why accumulators and not `Dataset.observe`: AQE's empty-relation
  * propagation replaces a join subtree whose materialized side is empty
  * — which is exactly what happens when every bucket is dropped — and
  * the `CollectMetrics` node is discarded WITH the subtree, so the
  * observation comes back empty in precisely the degenerate case it
  * exists to report (verified against Spark 4.1). Accumulator values
  * survive: the capping stage has already run by the time AQE prunes.
  * The trade: accumulator counts can over-count under task retries /
  * speculation — observability-grade, not an exact aggregate.
  */
object BucketCap {

  private val n = new AtomicLong()
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Drop counters for one capped operator instance.
    * `droppedBuckets` = buckets over the cap; `droppedIds` = the sum of
    * their sizes (an upper bound on ids losing SOME candidate edges).
    * Serializable because the cap predicate's closure captures the
    * WHOLE wrapper (not just the accumulators): the driver-side plan
    * then strongly references it for exactly as long as the query can
    * run, which is the lifetime the weak logging registry needs — an
    * internally-created counter must not be GC'd before its action's
    * listener callback fires. The logged-delta fields are driver-only
    * (executors never read them). */
  final class CapCounters private[BucketCap](val name: String,
      val droppedBuckets: LongAccumulator, val droppedIds: LongAccumulator)
      extends Serializable {
    // last values the session listener reported, so each action logs
    // only its own delta
    @transient private[BucketCap] var loggedBuckets = 0L
    @transient private[BucketCap] var loggedIds = 0L
  }

  object CapCounters {
    def apply(spark: SparkSession, op: String): CapCounters = {
      val name = s"graft_cap_${op}_${n.incrementAndGet()}"
      new CapCounters(name,
        spark.sparkContext.longAccumulator(s"${name}_dropped_buckets"),
        spark.sparkContext.longAccumulator(s"${name}_dropped_ids"))
    }
  }

  /** Capped operators' live counters, for the logging listener (weak:
    * observability bookkeeping must not pin finished queries). */
  private val registry =
    new java.util.WeakHashMap[CapCounters, java.lang.Boolean]()

  /** Sessions that already carry the logging listener. */
  private val installed = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Apply the bucket cap `minSize <= sizeCol <= maxBucket` to `df`,
    * counting what the upper bound drops. The counting predicate is a
    * nondeterministic conjunct so the optimizer can neither duplicate
    * it (double-count) nor reorder it below the deterministic bounds;
    * it runs once per already-aggregated bucket row, off the data hot
    * path. Returns the filtered frame; reads land in `capMetrics` (or
    * internal counters that only feed the log line). */
  def applyCap(df: DataFrame, op: String, sizeCol: Column,
               minSize: Int, maxBucket: Int,
               capMetrics: Option[CapCounters] = None): DataFrame = {
    val spark = df.sparkSession
    installLogger(spark)
    val counters = capMetrics.getOrElse(CapCounters(spark, op))
    registry.synchronized { registry.put(counters, java.lang.Boolean.TRUE) }
    // capture the WRAPPER, not its accumulators: the UDF closure rides
    // in the plan, pinning `counters` (and thus its weak registry
    // entry) until the query itself is collectable — see CapCounters
    val underCap = udf { (size: Int) =>
      if (size > maxBucket) {
        counters.droppedBuckets.add(1L)
        counters.droppedIds.add(size.toLong)
        false
      } else true
    }.asNondeterministic()
    df.filter(sizeCol >= minSize).filter(underCap(sizeCol))
  }

  /** Idempotently register the listener that logs any capped
    * operator's NEW drops once an action completes. */
  def installLogger(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        private def report(): Unit = {
          val live = registry.synchronized {
            registry.keySet().toArray(Array.empty[CapCounters]).toSeq
          }
          live.foreach { c =>
            c.synchronized {
              val (b, i) = (c.droppedBuckets.value.longValue(),
                c.droppedIds.value.longValue())
              if (b > c.loggedBuckets) {
                log.warn(s"${c.name}: maxBucket cap dropped " +
                  s"${b - c.loggedBuckets} bucket(s) spanning " +
                  s"${i - c.loggedIds} ids — recall loss; raise maxBucket " +
                  "or pre-filter boilerplate")
                c.loggedBuckets = b
                c.loggedIds = i
              }
            }
          }
        }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = report()
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = report()
      })
    }
}

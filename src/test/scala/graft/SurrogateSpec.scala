package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Surrogate

class SurrogateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rangeDenseIds equals dense_rank over the key on distinct input") {
    val keys = (1 to 997).map(i => f"key_${i * 7919 % 1000}%04d").distinct
    val df = keys.toDF("k")
    val expected = df
      .withColumn("id", dense_rank().over(Window.orderBy($"k")).cast("bigint"))
      .as[(String, Long)].collect().toSet
    val got = Surrogate.rangeDenseIds(df, Seq($"k"), "id", numPartitions = 7)
      .as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("rangeDenseIds ids are contiguous from 1 and deterministic across runs") {
    val df = (1 to 500).map(i => s"p_${i % 123}").distinct.toDF("k")
    val run1 = Surrogate.rangeDenseIds(df, Seq($"k"), "id")
      .as[(String, Long)].collect().toSet
    val run2 = Surrogate.rangeDenseIds(df, Seq($"k"), "id")
      .as[(String, Long)].collect().toSet
    assert(run1 == run2)
    assert(run1.map(_._2) == (1L to run1.size.toLong).toSet)
  }

  test("rangeDenseIds plan has no single-partition sort over the data") {
    val df = (1 to 100).map(i => s"k$i").toDF("k")
    // materialize=false keeps the logical plan inspectable (the default
    // eagerly checkpoints, collapsing the plan to a scan)
    val out = Surrogate.rangeDenseIds(df, Seq($"k"), "id", numPartitions = 4,
      materialize = false)
    // the data-side exchange must be a range partitioning, not a
    // SinglePartition collapse (the offsets side is partition counts
    // only, so its tiny global window is fine)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range exchange in:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (test scope; not shipped). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    // warm the session
    Tables.part(spark, dir).count()

    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      time(n) { SparkEntry.queries(n)(spark, dir).count() }
    }
  }
}

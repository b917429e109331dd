package graft.tools

/** Pure-JVM concurrency probe for the spread-CPU investigation: N
  * threads each run an IDENTICAL fixed amount of regex work (the
  * q_quality_score pattern set) and report their own thread CPU time.
  * If per-thread CPU inflates with N, the amplification lives in the
  * JVM/hardware (allocation, SMT, memory bandwidth), not in Spark's
  * plan. Diagnostic only. */
object RegexBurn {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 1) args(1).toInt else 2000
    val text = ("The quick brown fox jumps over the lazy dog and runs to " +
      "the old mill by the river, where a miller grinds wheat into flour. ") * 20
    val pats = Seq("[A-Za-z]", "\\S+", "\\b(the|a|and|of|to|in|is)\\b",
      "[.,;:!?'\"()-]").map(java.util.regex.Pattern.compile)
    val bean = java.lang.management.ManagementFactory.getThreadMXBean
    def burn(): Double = {
      val t0 = bean.getCurrentThreadCpuTime
      var cnt = 0
      var i = 0
      while (i < reps) {
        pats.foreach { p =>
          val m = p.matcher(text)
          while (m.find()) cnt += 1
        }
        i += 1
      }
      if (cnt == -1) println("impossible")
      (bean.getCurrentThreadCpuTime - t0) / 1e9
    }
    // JIT warm-up on the main thread
    burn(); burn()
    Seq(1, 4, 32).foreach { n =>
      val cpus = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val threads = (1 to n).map(_ => new Thread(() => { cpus.add(burn()); () }))
      val w0 = System.nanoTime()
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - w0) / 1e9
      val arr = cpus.toArray(Array.empty[java.lang.Double]).map(_.doubleValue)
      println(f"n=$n%3d wall=$wall%6.2f meanThreadCpu=${arr.sum / arr.length}%6.3f " +
        f"maxThreadCpu=${arr.max}%6.3f")
    }
  }
}

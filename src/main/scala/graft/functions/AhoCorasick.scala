package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern automaton — the scale path for
  * blocklist/keyword scanning: one pass over the text whatever the
  * term-list size, where the regex-alternation route
  * ([[graft.operators.WebClean.filterBlocklist]], fine for a handful
  * of words) degrades linearly in the number of terms and real
  * curation lists carry hundreds (Gopher's obscenity lists, C4's
  * badwords, licensing phrase banks).
  *
  * The automaton is built ONCE per JVM from the serialized term list
  * (transient lazy — the [[UnigramVocab]] pattern): only the
  * `Array[String]` ships with the task binary; goto/fail/output
  * tables rebuild on first use per executor.
  *
  * Match semantics: every occurrence of every term is counted,
  * INCLUDING overlapping occurrences and terms nested inside other
  * terms' matches ("aa" occurs twice in "aaa"; "in" matches inside
  * "window") — the textbook automaton's output function, replayed by
  * the oracle as a per-position substring equality count. Matching is
  * case-sensitive over code points; callers wanting case folding
  * lower the INPUT with an engine-exact map (the ASCII `translate`
  * discipline, not `lower()`).
  */
final class AcAutomaton(val terms: Array[String]) extends Serializable {
  require(terms.nonEmpty, "term list must be non-empty")
  require(terms.forall(_.nonEmpty), "empty pattern is not a valid term")

  @transient private lazy val tables: (Array[java.util.HashMap[Character, Integer]],
      Array[Int], Array[Array[Int]]) = build()

  private def build() = {
    val gotoT = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outT = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    var t = 0
    while (t < terms.length) {
      var state = 0
      for (ch <- terms(t)) {
        val nxt = gotoT(state).get(ch)
        if (nxt == null) {
          gotoT += new java.util.HashMap[Character, Integer]()
          outT += Nil
          gotoT(state).put(ch, gotoT.length - 1)
          state = gotoT.length - 1
        } else state = nxt
      }
      outT(state) = t :: outT(state)
      t += 1
    }
    // failure links via BFS
    val fail = new Array[Int](gotoT.length)
    val queue = new java.util.ArrayDeque[Int]()
    gotoT(0).forEach((_, s) => { fail(s) = 0; queue.add(s) })
    while (!queue.isEmpty) {
      val r = queue.poll()
      gotoT(r).forEach { (ch, s) =>
        queue.add(s)
        var f = fail(r)
        while (f != 0 && gotoT(f).get(ch) == null) f = fail(f)
        val g = gotoT(f).get(ch)
        fail(s) = if (g != null && g != s) g.intValue() else 0
        outT(s) = outT(s) ++ outT(fail(s))
      }
    }
    (gotoT.toArray, fail, outT.map(_.toArray).toArray)
  }

  /** Per-term occurrence counts over `text` (index-aligned with
    * [[terms]]), one left-to-right pass. */
  def scan(text: String): Array[Long] = {
    val (gotoT, fail, outT) = tables
    val counts = new Array[Long](terms.length)
    var state = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      var g = gotoT(state).get(ch)
      while (g == null && state != 0) { state = fail(state); g = gotoT(state).get(ch) }
      state = if (g != null) g.intValue() else 0
      val hits = outT(state)
      var k = 0
      while (k < hits.length) { counts(hits(k)) += 1L; k += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {
  /** Kernel entry for the codegen expression: scan and return the
    * per-term count array. */
  def scanCounts(text: UTF8String, ac: AcAutomaton): ArrayData =
    new GenericArrayData(ac.scan(text.toString).map(Long.box(_): Any))
}

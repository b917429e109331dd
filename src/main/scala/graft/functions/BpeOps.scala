package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for one greedy left-to-right BPE merge pass over a
  * symbol array (called from the codegen of
  * [[graft.plans.BpeMerge]]): every non-overlapping adjacent
  * occurrence of (a, b), scanned left to right, is replaced by the
  * concatenated symbol — the apply step of byte-pair-encoding merge
  * learning (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units", alg. 1).
  *
  * Greedy-left-to-right is the part that matters for cross-engine
  * parity: for a != b adjacent matches can never overlap, so "merge
  * all matches" is unambiguous; for a == b a run of k identical
  * symbols merges floor(k/2) leading pairs (positions 0,2,4,... of
  * the run). The DuckDB oracle reproduces exactly this via a
  * run-parity window form (see the q_bpe_merges oracle).
  */
object BpeOps {

  def mergePass(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (i < n - 1 && s != null && s.equals(a)) {
        val t = arr.getUTF8String(i + 1)
        if (t != null && t.equals(b)) {
          out.add(UTF8String.concat(a, b))
          i += 2
        } else {
          out.add(s)
          i += 1
        }
      } else {
        out.add(s)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

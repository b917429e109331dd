package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHash
import graft.operators.Dsir
import graft.plans.HashExpressions
import org.apache.spark.unsafe.types.UTF8String

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = 256

  test("hashGramBuckets emits the exact feature walk hashGramLogit sums: " +
    "folding any weight vector over the bucket sequence reproduces the logit bitwise") {
    val w = Array.tabulate(B)(b => math.sin(b.toDouble)) // arbitrary weights
    val texts = Seq("", "one", "one two", "a  b\t c\nd", "x y z x y z",
      "the quick brown fox jumps over the lazy dog")
    texts.foreach { s =>
      val u = UTF8String.fromString(s)
      val buckets = TextHash.hashGramBuckets(u, B).toLongArray()
      val folded = buckets.foldLeft(0.0)((acc, b) => acc + w(b.toInt))
      assert(folded == TextHash.hashGramLogit(u, w),
        s"fold mismatch on '$s'") // == : identical IEEE addition order
    }
  }

  test("hashGramBuckets codegen and interpreted eval agree, and a doc with " +
    "n tokens emits 2n-1 features (n unigrams + n-1 bigrams)") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    // n via regexp_extract_all, not size(split(trim(..))): split on an
    // empty/whitespace-only doc yields one empty token (n=1) while the
    // kernel emits 0 features — this form gives n=0 there instead
    val viaExpr = docs.select($"doc_id",
        HashExpressions.hashGramBuckets($"text", B).as("fs"),
        size(regexp_extract_all($"text", lit("\\S+"), lit(0))).as("n"))
      .as[(Long, Seq[Long], Int)].collect()
    assert(viaExpr.nonEmpty)
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    viaExpr.foreach { case (id, fs, n) =>
      val expected = if (n == 0) 0 else 2 * n - 1
      assert(fs.length == expected, s"doc $id: ${fs.length} features for $n tokens")
      val direct = TextHash.hashGramBuckets(
        UTF8String.fromString(texts(id)), B).toLongArray().toSeq
      assert(fs == direct, s"doc $id codegen/interpreted mismatch")
    }
  }

  test("featureCounts total equals the emitted feature count and buckets stay in range") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val counts = Dsir.featureCounts(docs, "text", B).collect()
    assert(counts.forall { r =>
      val b = r.getLong(0); b >= 0 && b < B
    })
    val total = counts.map(_.getLong(1)).sum
    val expected = docs.select(
        size(HashExpressions.hashGramBuckets($"text", B)).cast("long"))
      .as[Long].collect().sum
    assert(total == expected)
  }

  test("importance weights point toward the target slice: selection " +
    "over-represents the target language vs its corpus share") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val n = docs.count()
    val enShare = docs.filter($"lang" === "en").count().toDouble / n
    val sel = Dsir.select(docs.filter($"lang" === "en"), docs,
      "doc_id", "text", numBuckets = 1024, k = (n / 3).toInt, seed = 42L)
    val selIds = sel.select($"doc_id").as[Long].collect().toSet
    val selEn = docs.filter($"doc_id".isInCollection(selIds))
      .filter($"lang" === "en").count().toDouble / selIds.size
    assert(selEn > enShare,
      f"selected en-share $selEn%.2f not above corpus share $enShare%.2f")
  }

  test("selection is deterministic in (data, seed) and changes with the seed") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val lambda = Dsir.importanceWeights(
      docs.filter($"lang" === "en"), docs, "text", 1024)
    def ids(seed: Long) =
      Dsir.importanceResample(docs, "doc_id", "text", lambda, k = 10, seed)
        .select($"doc_id").as[Long].collect().toSeq
    assert(ids(42L) == ids(42L))
    assert(ids(42L) != ids(43L), "seed change should move the Gumbel draw")
  }
}

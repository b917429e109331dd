package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force top-k is the correctness baseline: the (small) query set
  * is broadcast against a single scan of the corpus — a
  * BroadcastNestedLoopJoin whose cost is |corpus| × |queries| dot
  * products, linear in the corpus and embarrassingly parallel. The scale
  * path is [[lshTopK]]: random-hyperplane signatures bucket the corpus so
  * each query only scores its bucket's candidates.
  */
object Similarity {

  /** Dot product of two array<double> columns via zip_with + aggregate
    * (codegen'd; array order fixed, so the fold is deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of each query vector.
    * `queries` must be small (it is broadcast). Ties break on vec id for
    * determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qidCol: String = "query_id", qvecCol: String = "query_vec"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val q = queries.select(col(qidCol), col(qvecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col("v"), col("qv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** Embedding-cosine near-dup pairs: multi-table hyperplane-LSH
    * buckets prune the pair space (hash-shuffle self-join per
    * (table, bucket), never all-pairs), then exact cosine decides.
    * Returns (id_a, id_b, sim) with id_a < id_b and sim >= threshold. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, dim: Int,
                         bits: Int = 4, numTables: Int = 8, seed: Long = 42L,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val tables = (0 until numTables).map(t => t -> hyperplanes(dim, bits, seed + t))
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .select(col("*"), explode(array(tables.map { case (tid, planes) =>
        struct(lit(tid).as("table_id"), signature(col("v"), planes).as("bucket"))
      }: _*)).as("tb"))
      .select(col(idCol), col("v"), col("tb.table_id"), col("tb.bucket"))
    val a = c.select(col("table_id"), col("bucket"),
      col(idCol).as("id_a"), col("v").as("v_a"))
    val b = c.select(col("table_id"), col("bucket"),
      col(idCol).as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("table_id", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic random hyperplanes (seeded), as literal arrays —
    * computed once on the driver, inlined into the plan. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-dot-product signature: bit i = 1 iff dot(v, plane_i) > 0.
    * Kernel expression — see [[graft.plans.VecOps.hyperplaneSig]]. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column =
    graft.plans.VecExpressions.hyperplaneSig(vec, planes)

  /** Multi-table LSH ANN: `numTables` independent `bits`-bit
    * hyperplane signatures; each query scores the union of its buckets
    * across tables (equi-join on (table, bucket) — a hash shuffle, no
    * cross product). Recall for neighbors at angle θ is
    * 1-(1-p^bits)^numTables with p = 1-θ/π, tunable per corpus; bucket
    * size shrinks 2^-bits, so candidate work stays
    * numTables·|corpus|/2^bits per query. The corpus is replicated
    * numTables times into the bucket index — the standard LSH
    * space-for-recall trade; at 100 TB the index is built once and
    * reused across query batches. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              bits: Int = 4, numTables: Int = 8, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "query_id", qvecCol: String = "query_vec"): DataFrame = {
    val tables = (0 until numTables).map(t =>
      t -> hyperplanes(dim, bits, seed + t))
    def bucketed(df: DataFrame, vec: String): DataFrame =
      df.select(col("*"), explode(array(tables.map { case (tid, planes) =>
        struct(lit(tid).as("table_id"), signature(col(vec), planes).as("bucket"))
      }: _*)).as("tb")).select(col("*"), col("tb.table_id"), col("tb.bucket")).drop("tb")
    val c = bucketed(
      corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v")), "v")
    val q = bucketed(
      queries.select(col(qidCol), col(qvecCol).cast("array<double>").as("qv")), "qv")
    val candidates = c.join(q, Seq("table_id", "bucket"))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol), col("v"), col("qv"))
      .dropDuplicates(qidCol, idCol) // union across tables
    val scored = candidates.withColumn("sim", cosine(col("v"), col("qv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }
}

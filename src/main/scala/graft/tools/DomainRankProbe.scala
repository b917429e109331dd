package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the q_domain_rank composition —
  * scratch diagnosis tool for the round-15 regression hunt. */
object DomainRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._
    import graft.plans.HashExpressions
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // rebuild the q_domain_rank pieces (same shapes as SparkEntry)
    val syntheticUrl = concat(lit("https://"),
      when(pmod(col("doc_id"), lit(11)) === 0, lit("user:pw@")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("www.")).otherwise(lit("")),
      lit("u"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".host"), pmod(col("doc_id"), lit(13)).cast("string"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(".co.uk"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit(".org"))
        .otherwise(lit(".com")),
      when(pmod(col("doc_id"), lit(5)) === 0, lit(":8080")).otherwise(lit("")),
      lit("/p/"), col("doc_id").cast("string"), lit("?ref=rss#top"))
    val linkPage = concat(lit("<a href=\"http://u"),
      pmod(col("doc_id"), lit(7)).cast("string"), lit(".host"),
      pmod(col("doc_id"), lit(13)).cast("string"), lit(".com/p/"),
      col("doc_id").cast("string"), lit("\">x</a>"),
      lit("<a href=\"/relative/"), col("doc_id").cast("string"), lit("\">r</a>"),
      lit("<a href=\"../up/"), pmod(col("doc_id"), lit(9)).cast("string"),
      lit("\">d</a>"))
    val pages = docs.select(col("doc_id"), syntheticUrl.as("src_url"),
      linkPage.as("html"))
    val links = WebClean.extractLinks(pages, "doc_id", "html",
      baseUrlCol = Some("src_url"))
    time("links.count")(links.count())
    val srcSite = WebClean.urlSite(WebClean.urlHost(col("src_url")))
    val dstSite = WebClean.urlSite(WebClean.urlHost(col("url")))
    val sedges = pages.select(col("doc_id"), srcSite.as("src_site"))
      .join(links, "doc_id")
      .select(col("src_site"), dstSite.as("dst_site"))
      .where(col("src_site") =!= "" && col("dst_site") =!= "")
    time("sedges.count")(sedges.count())
    val edges = sedges.select(
      HashExpressions.fnv64(col("src_site")).as("src"),
      HashExpressions.fnv64(col("dst_site")).as("dst"))
    time("edges.distinct.count")(edges.distinct().count())
    val names = sedges.select(col("src_site").as("site"))
      .union(sedges.select(col("dst_site"))).distinct()
      .select(col("site"), HashExpressions.fnv64(col("site")).as("node"))
    time("names.count")(names.count())
    val pr = time("pageRank(5) build+run") {
      val r = Graph.pageRank(edges, "src", "dst", iters = 5)
      r.count(); r
    }
    time("join-back + top50") {
      pr.join(names, Seq("node")).select(col("site"), col("rank_micro"))
        .orderBy(col("rank_micro").desc, col("site")).limit(50)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}

package graft

/** Scratch: dump formatted physical plans for the plan audit (PLANS.md). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.01"
    val out = new java.io.PrintWriter("/root/repo/target/plans.txt")
    Seq("q_latest_wins", "q_anti_join_new", "q_resolve_members",
      "q_minhash_pairs", "q_ann_lsh", "q_ann_ivf", "q_exact_dedup",
      "q_embed_neardup", "q_surrogate_ids", "q_top_revenue",
      "q_pricing_summary", "q_window_agg",
      "q_chunk_docs", "q_stratified_sample", "q_bm25",
      "q_classifier_score", "q_clean_lines", "q_cluster_best",
      "q_temperature_sample", "q_dsir_select", "q_semdedup",
      "q_gopher_rep", "q_dataset_card", "q_norm_dedup",
      "q_quality_topp", "q_cdc_blocks", "q_edit_verify", "q_embed_outliers",
      "q_decontaminate_spans", "q_containment", "q_hll_card",
      "q_bpe_encode", "q_token_drift", "q_cms_counts",
      // q_train_classifier deliberately absent: its result plan is a
      // driver-local weights table (LocalTableScan) — dumping it runs
      // 3 full GD iterations to audit nothing
      "q_card_incremental",
      "q_strip_boilerplate", "q_token_budget_mix",
      "q_bpe_docs").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      out.println(s"===== $name =====")
      out.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    out.close()
    println("wrote /root/repo/target/plans.txt")
  }
}

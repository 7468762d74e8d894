package graft.tools

/** Dev tool: dump formatted physical plans of flagship queries to stdout
  * (captured into docs/PLANS.md as plan-quality evidence). */
object PlanDump {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (a.nonEmpty) a.toSeq
      else Seq("q01_pricing_summary", "q05_enrich_join", "q07_latest_per_key",
        "q08_asof_join", "q24_exact_dedup", "q25_minhash_pairs", "q26_ngram_jaccard",
        "q27_simhash_pairs", "q31_hierarchy_paths", "q39_star_fact",
        "q46_detail_merge", "q47_category_counts", "q28_embed_neardup",
        "q58_tree_flatten", "q62_mixture_sample", "q63_top_tokens",
        "q66_precedence_merge", "q67_skew_salted",
        "q45_ivf_topk", "q64_payload_parse", "q65_store_lifecycle",
        "q68_split_assign", "q69_incremental_dedup", "q70_envelope_roundtrip",
        "q71_ingest_cycle", "q73_compacted_ingest", "q74_ivf_fixed",
        "q89_index_delete", "q90_ivf_delete")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      df.collect() // finalize AQE
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count independence: the repo's determinism claims (exact
  * integer arithmetic, commutative/associative accumulations, total
  * output orders) imply every query returns BYTE-IDENTICAL rows in
  * IDENTICAL order no matter how the shuffle is partitioned. This
  * spec re-runs the riskiest shapes — decimal-free money sums
  * (q105), whole-bit surprisal (q124), the interval merge (q127),
  * star contraction's iterative digest loop (q102), integer-exact
  * k-means (q115), and the prefix-filtered pair join (q130) — under
  * shuffle.partitions = 2 and 17 and diffs the full ordered output.
  * A double sum, a first()-style order-sensitive aggregate, or a
  * non-total sort key anywhere in these plans would flip rows here. */
class DeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-determinism-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String): Seq[String] =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).toSeq

  private val watched = Seq(
    "q105_decimal_ledger",
    "q124_unigram_surprisal",
    "q127_dup_span_merge",
    "q102_cc_star",
    "q115_kmeans_ivf",
    "q128_dsir_selection",
    "q130_prefix_jaccard_scale",
    "q132_label_centroid_cohesion",
    "q133_filter_funnel",
    "q134_vocab_drift",
    "q138_source_quota",
    "q139_overlap_chunking",
    "q140_source_similarity",
    "q142_bigram_fluency",
    "q143_quality_dup_calibration",
    "q144_split_leakage",
    "q145_laggard_suppliers",
    "q146_dedup_threshold_sweep",
    "q148_winnowing_fingerprints",
    "q150_drift_tvd",
    "q152_mad_outliers",
    "q154_padding_waste",
    "q149_zorder_layout",
    "q155_crossdoc_spans",
    "q151_scene_cuts",
    "q153_bpe_train",
    "q156_dedup_rewrite",
    "q157_greedy_coverage",
    "q158_source_containment",
    "q159_tokenizer_fertility",
    "q160_triangle_census",
    "q161_jump_reshard",
    "q162_longest_selfrepeat",
    "q163_median_bisect",
    "q164_incremental_components",
    "q165_epoch_shuffle",
    "q166_grouped_median_bisect",
    "q167_image_dhash_dedup",
    "q168_audio_fingerprint_dedup",
    "q169_table_profile",
    "q170_compaction_bins",
    "q171_segment_langmix",
    "q172_matryoshka_recall",
    "q173_event_transitions",
    "q174_source_novelty",
    "q175_lsh_band_sweep",
    "q176_trimmed_mean",
    "q177_conversion_latency",
    "q178_rolling_active_users",
    "q179_centroid_split_drift",
    "q180_receivables_aging",
    "q181_tx_size_histogram",
    "q182_anomaly_days",
    "q183_value_concentration",
    "q184_apply_order_audit",
    "q185_pareto_frontier",
    "q186_session_concurrency",
    "q187_pagerank_neardup",
    "q188_cascade_delete_audit",
    "q189_gap_fill_locf",
    "q190_benford_audit",
    "q191_hybrid_rrf",
    "q192_multitouch_attribution",
    "q193_rolling_hll_union",
    "q194_sorted_neighborhood",
    "q195_lww_origin_merge",
    "q196_ewma_daily",
    "q197_event_paths",
    "q198_mmr_rerank",
    "q199_quantile_normalization",
    "q200_snapshot_asof",
    "q201_linkage_scores",
    "q202_bootstrap_ci",
    "q203_expectations_audit",
    "q204_kmv_source_similarity",
    "q205_basket_pairs",
    "q206_sql_entry",
    "q207_k_anonymity",
    "q208_bitmap_retention",
    "q209_join_size_audit",
    // round-9 additions with rank/tie-break or iterative shapes
    "q229_typed_oid_tail",
    "q230_ranking_metrics",
    "q231_contamination_check",
    "q232_matryoshka_recall",
    "q233_annotator_agreement",
    "q235_canonical_doc_election",
    "q236_temperature_mixture",
    "q237_leakage_safe_splits")

  for (q <- watched)
    test(s"$q: identical ordered output at shuffle.partitions 2 and 17") {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val a = run(q)
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val b = run(q)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b,
        s"$q output depends on the shuffle partitioning " +
          s"(${a.size} vs ${b.size} rows)")
      assert(a.nonEmpty, s"$q returned no rows at sf0.001")
    }
}

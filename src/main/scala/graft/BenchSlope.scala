package graft

import org.apache.spark.sql.SparkSession

/** Scaling-slope evidence for the expensive queries: times each one at TWO
  * scale factors (default sf0.01 → sf0.1, a 10× data step — the largest
  * step the sandbox's generated data supports) and records the wall-time
  * ratio. The 100 TB arguments elsewhere are plan-shape arguments; this is
  * the measured counterpart: a query whose time grows SUPER-LINEARLY in SF
  * (ratio > data ratio × margin) gets flagged — at bench sizes fixed
  * per-query overhead dominates, so an honest distributed plan lands well
  * UNDER the data ratio.
  *
  * Usage: `runMain graft.BenchSlope` (env `SPARK_GRAFT_SF_SMALL` /
  * `SPARK_GRAFT_SF_LARGE` / `SPARK_GRAFT_SLOPE_OUT` override defaults).
  * Emits one JSON line and writes it to SCALING_SLOPE.json. */
object BenchSlope {

  /** The plan-audited expensive queries (the ones whose 100× behavior the
    * engine's scale story leans on), plus the scan-heavy json battery that
    * was the r5 noise victim. */
  val SlopeQueries: Seq[String] = Seq(
    "q_d4_lsh_pairs", "q_j6_composite_key", "q_d9_dup_components",
    "q_a7_top_revenue", "q_j10_range_band", "q_j9_asof_join",
    "q_x3_json_agg",
    // multimodal family: the typed decode path is otherwise invisible to
    // the audits (the round-6 q_mm1 drift hid here)
    "q_mm1_asset_features", "q_mm4_decode_real", "q_mm6_video_frames",
    // round-7 expensive additions
    "q_d10_block_pairs", "q_d11_edit_verified", "q_t9_tfidf",
    "q_g3_component_sizes",
    // round-8: the remaining heavy round-7 queries (graph diagnostics,
    // the simhash band join itself, interval merge, event paths) and the
    // decontamination sweep (the corpus-side gram stream is the volume)
    "q_g1_degree_hist", "q_g2_triangles", "q_d6_simhash_pairs",
    "q_w6_interval_merge", "q_x7_event_paths", "q_t11_decontaminate",
    // round-8 additions: the corpus-sized chunk-hash stream, the
    // double-window sessionization, the centroid-assignment projection,
    // and the map-only lang-confusion rollup
    "q_d12_chunk_dups", "q_x8_sessionize",
    "q_sim7_centroid_assign", "q_t13_lang_confusion",
    // round-9 additions: the iterative PageRank (3 edge-sized BSP rounds),
    // the estimator audit (signature + band join + double verify fetch),
    // the distinct-then-window retention rollup, and the regex PII battery
    // (per-row scan work dominating at scale)
    "q_g4_pagerank", "q_d13_minhash_est", "q_x9_retention",
    "q_t14_pii_density",
    // this round: the block-key containment verify (per-block-squares work,
    // same risk profile as q_d10) and the two-pass MG heavy-hitter sketch
    "q_d14_containment", "q_v9_heavy_hitters",
    // round 8b late additions: the triangle+triads coefficient (edge-join
    // shapes), the gram-join leakage audit (corpus-sided gram stream), and
    // the fused quality battery (scan-bound + anti-join)
    "q_g5_clustering_coeff", "q_t16_split_leakage", "q_v10_quality_checks",
    // round 9: the remaining round-8b queries without rows (VERDICT ask 5)
    // — split rollup, packing window, norm profile, the three recall
    // audits (bounded-probe all-pairs lanes), frame stats, patch tiling,
    // spike detection —
    "q_t15_train_split", "q_t17_pack_stats", "q_sim8_norm_profile",
    "q_sim9_int8_recall", "q_sim10_mrl_recall", "q_mm10_png_meta",
    "q_mm11_tile_stats", "q_w8_spike_detect",
    // and this round's additions: cluster-routed split + keep-canonical
    // (component machinery + pagerank over the simhash graph) and the
    // int8-served IVF probe
    "q_t18_cluster_split", "q_t19_keep_canonical", "q_sim11_ivf_int8",
    // round-9b: the in-cell SemDeDup pair join (per-cell-squares work),
    // the two-pass unigram LM score (token-stream shuffle + term join),
    // and the NAAJ exclusion filter (probe-side scan + broadcast build)
    "q_d15_semantic_dedup", "q_t20_unigram_ll", "q_j11_nullaware_anti",
    // round-9c: the BM25 scorer (token shuffle + 3-term broadcast join),
    // the shared-shingle detector (gram explode + per-doc distinct), the
    // RRF fusion (two corpus rankings reduced to candidate lists), and the
    // radius search (broadcast map-only corpus stream)
    "q_t21_bm25", "q_d16_boilerplate", "q_t23_rrf_fusion",
    "q_sim12_range_search",
    // and the fuzzy-decontamination pass (map-only signature stream +
    // broadcast eval bands — the shape must stay corpus-linear)
    "q_t24_fuzzy_decontam",
    // round-9d: the with-multiplicity gram-mass aggregation (the largest
    // intermediate stream in the suite), the vocabulary spectrum (token
    // shuffle + bin reduce), and the PQ encode+ADC lanes (corpus encodes
    // map-only; the bounded-probe scoring joins must stay corpus-linear)
    "q_d17_dup_gram_mass", "q_t25_token_spectrum", "q_sim13_pq_adc",
    // round-9e: the iterative LPA rounds (edge-sized joins + node-sized
    // arg-max windows, the qG4 risk profile), the decorrelated Q17 gate
    // (per-part agg + gate join sharing one exchange), the audio-fingerprint
    // band join (third banded-dedup modality), the set-algebra KMV sketch
    // (per-partition TakeOrdered merges), and the diversified top-k
    // (partitioned cap + bounded TakeOrdered)
    "q_g6_label_prop", "q_a9_small_orders", "q_mm12_audio_dups",
    "q_v11_kmv_overlap", "q_o2_diverse_topk", "q_w9_robust_spike",
    "q_t22_mix_weights",
    // the substring-removal accounting: gram-keyed self-join of the gram
    // stream against its duplicated subset + an x8 coverage explode — the
    // heaviest gram-family plan, must stay corpus-linear
    "q_d18_substr_removal",
    // dedup-aware mix: the full qT19 survivor chain + a corpus tokenize
    // pass with a broadcast anti-join exclusion
    "q_t26_dedup_mix",
    // round-9f: the iterative k-core peel (3 BSP rounds of degree count +
    // double semi-join, the qG4/qG6 risk profile) and the bloom prejoin
    // (distributed filter build + probe-filtered fact-fact shuffle join —
    // the probe cost must stay scan-bound as the fact side grows)
    "q_g7_kcore", "q_j12_bloom_prejoin",
    // round 10: the JPEG decode lane (batched executor-side decode must
    // stay corpus-linear like its PNG sibling), the temperature mix (one
    // map-combined tokenize pass to an L-row frame), and the priority
    // sample (map-only TakeOrdered)
    "q_mm13_jpeg_decode", "q_t27_temperature_mix", "q_o3_weighted_sample",
    // the BPE pair induction (vocabulary-sized pair explode over the
    // word-frequency table — must stay corpus-linear in the tokenize, flat
    // in the pair stage) and the IVF-PQ ADC lane (corpus encode map-only,
    // candidate scoring cell-bounded)
    "q_t28_bpe_merges", "q_sim14_ivfpq",
    // hybrid retrieval: two broadcast map-only lanes + candidate-bounded
    // fusion — both lanes must stay corpus-linear
    "q_sim15_hybrid_rrf")

  /** Linear-scaling margin: data grows 10×, so a ratio beyond 10 × 1.3
    * means super-linear growth even granting 30% measurement noise. */
  val Margin = 1.3

  private def fmt(d: Double): String = f"$d%.4f"

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val large = sys.env.getOrElse("SPARK_GRAFT_SF_LARGE", "/root/testdata/sf0.1")
    val dataRatio = sys.env.getOrElse("SPARK_GRAFT_SF_RATIO", "10.0").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(small, large).foreach { dir =>
      graft.core.Tables.names.foreach { t =>
        try graft.core.Tables.load(spark, dir, t)
          .selectExpr("count(md5(CAST(1 AS STRING)))").collect()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"bench-slope: warmup failed for table '$t': $e") }
      }
    }

    def best3(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, dir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val rows = SlopeQueries.filter(SparkEntry.queries.contains).map { name =>
      val ts = best3(name, small)
      val tl = best3(name, large)
      val slope = if (ts > 0) tl / ts else Double.NaN
      val flagged = slope > dataRatio * Margin
      (name, ts, tl, slope, flagged)
    }
    val qs = rows.map { case (n, ts, tl, sl, fl) =>
      s""""$n":{"t_small":${fmt(ts)},"t_large":${fmt(tl)},""" +
        s""""slope":${fmt(sl)},"super_linear":$fl}"""
    }.mkString("{", ",", "}")
    val flaggedNames = rows.filter(_._5).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val json = s"""{"metric":"scaling_slope","data_ratio":$dataRatio,""" +
      s""""margin":$Margin,"queries":$qs,"flagged":$flaggedNames,""" +
      s""""sf_small":"$small","sf_large":"$large"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_SLOPE_OUT", "SCALING_SLOPE.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"bench-slope: failed to write $out: $e") }
    spark.stop()
  }
}

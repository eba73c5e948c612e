"""Physical-plan guards: the properties that make these queries viable
at 100 TB must hold in the compiled plan, not just in intent.

- filters/projections reach the parquet scan (PushedFilters/ReadSchema)
- dimension joins broadcast; fact⋈fact does not degrade to NL join
- global top-k compiles to TakeOrderedAndProject (no full sort)
- aggregates are partial+final (map-side combine)
"""

import contextlib
import io

import iot_system_plc_data_to_influxdb_spark.plans as plans

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name, mode="formatted"):
    df = plans.all_queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_b1_scan_pushdown(spark):
    p = _plan(spark, "b1_scan_pushdown")
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1][:200]
    # column pruning: only the 6 needed columns in ReadSchema
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema


def test_b2_time_range_pushdown(spark):
    # Both bounds must reach the parquet reader as raw int64-nanos
    # comparisons (catalog.events_between) — an expression-wrapped ts
    # would push only IsNotNull and full-scan at 100 TB.
    p = _plan(spark, "b2_time_range")
    pushed = p.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed
    assert "LessThan(ts" in pushed


def test_flagship_time_range_pushdown(spark):
    p = _plan(spark, "flagship_signal_snapshot")
    pushed = p.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed
    assert "LessThan(ts" in pushed


def test_b3_downsample_pushdown(spark):
    p = _plan(spark, "b3_downsample")
    pushed = p.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed
    assert "LessThan(ts" in pushed


def test_b7_star_join_broadcasts(spark):
    p = _plan(spark, "b7_broadcast_star_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # dims must not shuffle the fact side


def test_b8_fact_join_not_nested_loop(spark):
    p = _plan(spark, "b8_shuffle_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p  # AQE may broadcast at tiny SF
    )


def test_b10_interval_join_broadcasts_small_side(spark):
    p = _plan(spark, "b10_range_join")
    assert "BroadcastNestedLoopJoin" in p  # 6-row dim broadcast, fact streams


def test_b13_global_topk_is_take_ordered(spark):
    p = _plan(spark, "b13_global_topk")
    assert "TakeOrderedAndProject" in p


def test_b4_partial_final_aggregate(spark):
    p = _plan(spark, "b4_hash_aggregate")
    assert p.count("HashAggregate") >= 2  # partial + final


def test_b20_knn_plan(spark):
    p = _plan(spark, "b20_knn_bruteforce")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_b21_tfidf_broadcasts_probe_not_vocab(spark):
    """The idf (vocabulary) side grows with the corpus — it must be the
    streamed side. The bounded 50-doc tf slice is the broadcast side."""
    p = _plan(spark, "b21_tfidf_top_terms", mode="simple")
    hash_bc = p.split("BroadcastExchange HashedRelation")
    assert len(hash_bc) == 2  # exactly one hashed broadcast (the tf probe)
    assert "LessThan(doc_id,50)" in hash_bc[1][:2500]  # probe slice inside it
    assert "count(distinct" not in hash_bc[1][:2500]  # vocab NOT inside it
    assert "count(distinct" in hash_bc[0]  # vocab on the streamed side


def test_whole_stage_codegen_on_decode(spark):
    """The native decode path (a7) must stay inside codegen — no
    Python boundary (BatchEvalPython/ArrowEvalPython) in the plan."""
    p = _plan(spark, "a7_decode_dispatch")
    assert "EvalPython" not in p
    p2 = _plan(spark, "flagship_signal_snapshot")
    assert "EvalPython" not in p2

def test_b21_decontaminate_broadcasts_eval_grams(spark):
    # the eval-gram set must broadcast (benchmarks are small; the corpus
    # probe stays map-only) and the corpus gram explode must not pay a
    # corpus-wide DISTINCT shuffle (dedup happens inside the array)
    p = _plan(spark, "b21_decontaminate")
    assert "BroadcastExchange" in p
    joins = p.count("SortMergeJoin")
    assert joins == 0, f"eval probe degraded to SMJ:\n{p[:1500]}"


def test_b21_pii_redaction_is_map_only(spark):
    # pure per-row regex work: nothing but the fan-out repartition may
    # shuffle, and there is no join or aggregate anywhere
    p = _plan(spark, "b21_pii_redaction")
    assert "Join" not in p
    assert "HashAggregate" not in p
    assert p.count("Exchange") <= 2  # the explicit repartition only


def test_b20_quantization_corpus_stays_unshuffled(spark):
    # the only aggregation shuffles 64 dim-stat rows; the corpus side
    # joins them via BroadcastNestedLoopJoin (1-row stats cross join)
    p = _plan(spark, "b20_embedding_quantization")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_influxql_transform_reuses_bucket_partitioning(spark):
    # derivative-of-mean: the window over buckets must partition by the
    # GROUP BY tag (no single-partition global window on the data path)
    p = _plan(spark, "b3_influxql_derivative", mode="simple")
    assert "Window" in p
    assert "windowspecdefinition(event_type" in p


def test_shingle_queries_materialize_token_array(spark):
    # the token split() must be aliased into a column BEFORE shingling:
    # an un-aliased tokens() is textually inlined once per element
    # access inside the shingle transform (5 per position), which blows
    # the Generate expression up ~10x and costs >10s of Janino compile
    # on first run. Guard: the explode expression references the split
    # at most twice (probe + eval branches), not per-element.
    for name in ("b21_decontaminate", "b21_boilerplate_ngrams",
                 "b19_minhash_lsh_neardup"):
        p = _plan(spark, name, mode="extended")
        gen = [ln for ln in p.splitlines() if "Generate explode" in ln]
        assert gen, f"{name}: no explode in plan"
        worst = max(ln.count("split(") for ln in gen)
        assert worst <= 1, (
            f"{name}: split() inlined {worst}x inside the shingle explode"
        )


def test_chunk_windows_is_map_only(spark):
    # tokenize -> sequence -> explode -> slice: nothing but the explicit
    # fan-out repartition may shuffle, and there is no join anywhere
    p = _plan(spark, "b21_chunk_windows")
    assert "Join" not in p
    assert p.count("Exchange") <= 2  # repartition + AQE read, no more


def test_curation_pipeline_single_logical_shuffle(spark):
    # dedup window partitions by content hash — that plus the explicit
    # repartition are the only exchanges; the quality gate and the
    # chunk explode stream map-side, and no join ever appears
    p = _plan(spark, "b21_curation_pipeline")
    assert "Join" not in p
    assert "SortMergeJoin" not in p
    exchanges = [
        ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) <= 2, p[:1200]


def test_b21_boilerplate_hashed_shuffles_int64_grams(spark):
    """The 100 TB fix the string variant documents: the gram→df
    aggregate and the boilerplate probe must shuffle xxhash64 int64
    keys, and the df>=3 filter must sit below the join so singleton
    grams never enter the join shuffle."""
    p = _plan(spark, "b21_boilerplate_hashed")
    assert "xxhash64" in p
    # the join key is the hashed column, not the gram string
    joins = [ln for ln in p.splitlines() if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln or "BroadcastHashJoin" in ln]
    assert any("gh" in ln for ln in joins)
    assert not any(" g#" in ln for ln in joins)


def test_b8_bucketed_join_has_zero_exchange(spark):
    """Write-time co-partitioning must eliminate BOTH query-time
    shuffles: the fact⋈fact join and the downstream aggregate reuse
    the bucketed storage partitioning."""
    p = _plan(spark, "b8_bucketed")
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p[:1500]


def test_b10_fact_scan_is_range_prefiltered(spark):
    """The general NL range join must pre-filter the fact scan to the
    interval dim's bounding range — bounds pushed to the reader."""
    p = _plan(spark, "b10_range_join")
    assert "BroadcastNestedLoopJoin" in p
    assert "PushedFilters" in p
    pushed = p.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed or "LessThan(ts" in pushed, pushed


def test_b10_pruned_variant_has_no_join(spark):
    """The compiled small-dim variant unrolls windows into pushed range
    scans — no join operator at all, every branch pushes its bounds."""
    p = _plan(spark, "b10_range_join_pruned")
    assert "Join" not in p
    # one pruned branch per window (formatted mode prints each node
    # twice: tree + detail)
    assert p.count("Scan parquet") == 12
    # every branch carries pushed ts bounds
    for seg in p.split("PushedFilters")[1:]:
        assert "ts" in seg[:200]


def test_b8_points_bucketed_zero_exchange(spark):
    """Signal-keyed stats join over the bucketed points layout: the
    groupBy AND the merge join both reuse storage partitioning."""
    p = _plan(spark, "b8_points_bucketed")
    assert "Exchange" not in p
    assert "SortMergeJoin" in p


def test_b18_domain_cap_partial_window_group_limit(spark):
    # the per-domain quota must pre-filter to <=N rows per input
    # partition BEFORE the per-source shuffle (WindowGroupLimit
    # Partial under the Exchange) — otherwise a mega-domain ships its
    # whole crawl into one task's sort at 100 TB
    p = _plan(spark, "b18_domain_cap")
    pre, _, post = p.partition("Exchange")
    assert "WindowGroupLimit" in pre and "WindowGroupLimit" in post


def test_b5_bloom_probe_is_broadcast_only(spark):
    """The bloom probe side must stay map-only: every word lookup is a
    BroadcastHashJoin against the 128-row filter — the probe table is
    never exchanged by its own key (no explode + re-group)."""
    p = _plan(spark, "b5_bloom_membership")
    assert p.count("BroadcastHashJoin") >= 3  # k word joins (+ truth join)
    # the only acceptable exchanges: the 128-word bit_or aggregate and
    # the DISTINCT truth side — never a hashpartitioning on c_custkey
    assert "hashpartitioning(c_custkey" not in p


def test_media_pipelines_map_only_after_fanout(spark):
    """Every media decode/analysis query must compile to: one
    deliberate fan-out Exchange (the repartition on doc_id) and
    nothing else — no aggregation or join exchange sneaking in. The
    map-only claim in SCALE.md, held in the compiled plan."""
    for name in (
        "b22_image_decode", "b22_png_palette", "b22_png_gray", "b22_gif_decode", "b22_jpeg_decode",
        "b22_jpeg_420", "b22_jpeg_progressive", "b22_resize_bilinear",
        "b22_hist_equalize", "b22_augmentations", "b22_audio_decode",
        "b22_mulaw_decode", "b22_alaw_decode", "b22_adpcm_decode",
        "b22_pcm24_decode", "b22_stereo_decode", "b22_float32_decode",
        "b22_video_c444",
        "b22_audio_resample", "b22_audio_spectrogram",
        "b22_mel_features", "b22_video_decode", "b22_scene_changes",
        "b22_video_retime",
    ):
        p = _plan(spark, name, mode="simple")
        n_exchange = p.count("Exchange")
        assert n_exchange <= 1, (name, n_exchange)
        assert "SortMergeJoin" not in p and "HashAggregate" not in p, name

def test_b19_cdc_chunk_dedup_exchanges_carry_metadata_only(spark):
    """CDC dedup's scale contract (SCALE.md): the payload column dies
    inside the chunking mapInPandas — every Exchange after the fan-out
    moves only ~60 B chunk-metadata rows. Three exchanges total: the
    deliberate doc_id fan-out, the chunk_hash partitioning for the
    first-occurrence window, and the doc_id rollup."""
    p = _plan(spark, "b19_cdc_chunk_dedup", mode="simple")
    assert p.count("Exchange") <= 3, p.count("Exchange")
    for line in p.splitlines():
        if "hashpartitioning(chunk_hash" in line or (
            "hashpartitioning(doc_id" in line and "rangepartitioning" not in line
        ):
            assert "payload" not in line, line
    # the window sort is per-hash-partition, never a global sort
    assert "rangepartitioning" not in p, "global sort leaked into the plan"


def test_round7_analytics_single_fact_exchange(spark):
    """The per-series analytics ops compile to ONE hash exchange over
    the fact projection — every window in the plan rides it (totals as
    unordered frames on the same shuffle, no groupBy+join re-scan)."""
    for name in ("b23_acf", "b23_changepoint", "b18_stratified_sample"):
        p = _plan(spark, name, mode="simple")
        n_ex = p.count("Exchange hashpartitioning")
        assert n_ex == 1, (name, n_ex)
        assert p.count("Scan parquet") + p.count("FileScan") <= 2, name


def test_round7_small_side_broadcasts(spark):
    """Breakpoint / day-spine / size tables broadcast back onto the
    fact — a sort-merge join here would shuffle the corpus twice."""
    for name in ("b24_segmented_trend", "b27_rolling_active_users",
                 "b19_fuzzy_match"):
        p = _plan(spark, name, mode="simple")
        assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, name


def test_attribution_is_one_window_no_self_join(spark):
    """Last-touch attribution must stay the conditional-last window
    form: one user_id exchange, zero joins."""
    p = _plan(spark, "b27_attribution", mode="simple")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p


def test_url_dedup_single_canonical_exchange(spark):
    """URL canonicalization is map-only string algebra; the only
    exchange keys the canonical URL for the dedup window. A second
    exchange would mean the synth/parse stages shuffled raw strings."""
    p = _plan(spark, "b19_url_dedup", mode="simple")
    assert p.count("Exchange hashpartitioning") <= 2  # repartition + window
    assert "Join" not in p
    # one physical scan ("FileScan parquet" double-matches both needles)
    assert p.count("Scan parquet") + p.count("FileScan") <= 2


def test_importance_resample_reuses_bucket_counts(spark):
    """The round-8 rework: per-(doc, bucket) counts are computed once
    and REUSED by both the weight table and the per-doc score — the
    formatted plan must carry ReusedExchange nodes, and the weight
    side must broadcast back (no fact-fact shuffle join)."""
    p = _plan(spark, "b21_importance_resample")
    assert "ReusedExchange" in p
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_alert_transitions_single_series_exchange(spark):
    """The LAG edge detector rides ONE per-series exchange — the same
    single-window contract as the other B23 per-series ops."""
    p = _plan(spark, "b23_alert_transitions", mode="simple")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p


def test_quantile_sketch_is_partial_final_bounded_agg(spark):
    """The sketch build must be a partial+final aggregate (map-side
    combine bounds the shuffle at series × ~60 bucket rows) with no
    join anywhere; quantile extraction rides one window exchange."""
    p = _plan(spark, "b5_quantile_sketch")
    assert "partial_count" in p or "HashAggregate" in p
    assert "Join" not in p
    simple = _plan(spark, "b5_quantile_sketch", mode="simple")
    assert simple.count("Exchange hashpartitioning") <= 2  # agg + window


def test_b20_jl_projection_leg_is_map_only(spark):
    """The full-corpus JL projection leg (quantize + 16 signed folds)
    must compile to a single map stage: scan → project, zero Exchange,
    zero explode/generate — that is its 100 TB contract. (The pair
    AUDIT in b20_jl_projection joins a sample and is allowed to
    shuffle; this guards the leg that touches every vector.)"""
    import contextlib
    import io

    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _jl_project,
        _jl_quantize,
    )

    df = _jl_project(_jl_quantize(t(spark, SF_DIR, "embeddings")))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "Generate" not in p  # no explode — folds over the array
    # and the projection actually computes: 16 bigint outputs
    row = df.limit(1).collect()[0]
    assert len(row["p"]) == 16


def test_handoff_extraction_is_one_window_exchange(spark):
    """The round-10 data-derived link-graph extraction (events →
    consecutive-distinct-user handoffs) must compile to exactly ONE
    exchange — the window's (event_type, hour-bucket) hash
    partitioning — with the per-bucket sort inside it. A per-type
    global sort (low-cardinality partition spec) or a second shuffle
    would be the 100 TB killer this shape exists to avoid."""
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _handoff_pairs,
    )

    df = _handoff_pairs(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    p = buf.getvalue()
    assert p.count("Exchange") == 1
    assert "hashpartitioning(event_type" in p and "hr" in p
    assert p.count("Window") == 1


def test_kcore_delta_round_probes_with_broadcast(spark):
    """One delta-peel round's decrement leg must be a broadcast-hash
    probe of the materialized neighbor list with a partial+final
    count — never a SortMergeJoin (that would re-shuffle the E-sized
    relation every round, the exact cost the round-10 rewrite
    removed)."""
    from pyspark.sql import functions as F

    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _handoff_nb,
    )

    nb = _handoff_nb(spark, SF_DIR)
    deg = (
        nb.groupBy(F.col("src").alias("x"))
        .agg(F.count("*").alias("dg"))
        .localCheckpoint()
    )
    dead = deg.filter(F.col("dg") < 3).select("x")
    dec = (
        nb.join(F.broadcast(dead.withColumnRenamed("x", "src")), "src")
        .groupBy(F.col("dst").alias("x"))
        .agg(F.count("*").alias("dc"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dec.explain("simple")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "partial_count" in p  # map-side combine before the shuffle
    # the only hash exchange is the O(decrements) aggregate
    assert p.count("Exchange hashpartitioning") == 1


def test_pipeline_e2e_is_synth_then_one_aggregate(spark):
    """The composed pipeline (config → sim → decode → points →
    compiled InfluxQL downsample) must stay map-only until one
    partial+final aggregate: no join bigger than the 1-row dimension
    broadcasts, no extra shuffle before the bucket aggregation."""
    p = _plan(spark, "pipeline_plc_e2e", mode="simple")
    assert "SortMergeJoin" not in p
    assert "partial_count" in p and "partial_avg" in p
    # one agg exchange + the compiler's output ordering (range) only
    assert p.count("Exchange hashpartitioning") == 1


def test_bm25_and_rrf_legs_are_take_ordered(spark):
    """Both retrieval legs must end in TakeOrderedAndProject (top-K
    without a global sort), and the BM25 side must broadcast the
    4-row df / 1-row corpus-stats dimensions rather than shuffling
    the term relation against them."""
    p = _plan(spark, "b21_bm25_retrieval", mode="simple")
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    p2 = _plan(spark, "b20_rrf_hybrid", mode="simple")
    assert p2.count("TakeOrderedAndProject") >= 2  # each leg + fusion
    # Spark cannot broadcast a FULL OUTER join side, so the fusion of
    # the two TakeOrdered leg outputs compiles to exactly one SMJ —
    # over <= 2*LEG_TOPK rows, bounded by construction. The corpus-
    # sized legs themselves must never sort-merge.
    assert p2.count("SortMergeJoin") == 1
    assert "FullOuter" in p2


def test_rrf_recall_fusion_bounded_and_dims_broadcast(spark):
    """b20_rrf_recall: exactly ONE full-outer join (the RRF fusion of
    the two top-20 legs — Spark cannot broadcast a full-outer side, so
    it compiles to a sort-merge over <= 40 rows per probe, bounded by
    construction) and the BM25 dimensions (probe vocabulary, df,
    corpus stats) must broadcast rather than shuffling the postings
    against them. The truth-vs-systems comparison joins key on
    (pid, vec_id) — per-probe-bounded relations where a shuffle join
    is the correct shape at fleet-scale panel sizes."""
    p = _plan(spark, "b20_rrf_recall", mode="simple")
    assert p.count("FullOuter") == 1
    # the legs are localCheckpoint'ed (each feeds two consumers), so
    # the BM25 broadcasts live inside the checkpoint-materialization
    # jobs and the returned plan consumes them as ExistingRDD scans —
    # one materialization per leg instead of a re-run per consumer
    assert "Scan ExistingRDD" in p
    # the corpus postings pass must not cartesian against the panel
    assert "CartesianProduct" not in p


def test_pipeline_training_e2e_no_smj_and_bounded_pack(spark):
    """The composed curation funnel: the gate is map-only expressions,
    the dedup is one content-hash window, the pack fold runs as
    grouped-in-pandas over the (lang, shard) exchange, and every
    report join broadcasts (O(langs) sides) — no sort-merge join
    anywhere in the static plan."""
    p = _plan(spark, "pipeline_training_e2e", mode="simple")
    assert "SortMergeJoin" not in p
    assert "FlatMapGroupsInPandas" in p  # the bounded pack fold
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_ivf_cell_assignment_is_map_only(spark):
    """The IVF index-BUILD assignment (every vector → nearest
    centroid) must compile to scan → project: zero Exchange, zero
    Generate, zero join. This is the round-11 weak item — the old
    plan crossJoined the corpus against 8 broadcast centroids and
    took the argmax with a per-vec_id window, a full hash exchange
    of an 8×-exploded corpus (multi-PB at 100 TB) on the build path.
    The fold (operators/similarity.ivf_best_cell) is now the ONLY
    quantizer, shared with the streaming router, so the single
    remaining exchange in write_ivf_index is the repartition("cell")
    write clustering."""
    import contextlib
    import io

    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.operators.similarity import (
        ivf_cell_assignments,
        ivf_centroids,
    )

    emb = t(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = ivf_centroids(emb, n_cells=8)
    df = ivf_cell_assignments(emb, cents)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p, p[:1500]
    assert "Generate" not in p
    assert "Join" not in p
    assert "Window" not in p
    # and it still assigns: more than one populated cell on the fixture
    assert len({int(r["cell"]) for r in df.collect()}) > 1

"""Plan-guard tests: lock in the physical-plan properties that matter at
100 TB (SURVEY.md §4). A regression here is a performance bug even when
results stay correct."""

from __future__ import annotations

from tests.conftest import SF_DIR


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df) -> str:
    """The AQE-final physical plan: execute the query, then read the
    adaptive plan. Broadcast-vs-shuffle guards assert on THIS, not on a
    forced hint — the production contract is "AQE keeps the dim side
    unshuffled at this scale", not "a hint forces broadcast at every
    scale" (forced broadcasts of SF-scaling tables OOM at 100 TB).
    collect() (not a noop write) so the DataFrame's OWN QueryExecution
    finalizes — a write wraps the plan in a new execution and leaves
    df.queryExecution un-adapted. The string carries BOTH the final and
    the initial plan; keep only the final section so assertions don't
    see pre-adaptive join choices."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    marker = "== Initial Plan =="
    return plan.split(marker)[0] if marker in plan else plan


def test_filter_pushdown_through_date_cast(spark):
    """cast(l_shipdate AS DATE) >= lit must still reach the parquet scan
    as a timestamp predicate (Catalyst UnwrapCastInBinaryComparison)."""
    from aws_lakehouse_project_spark.operators.relational import q_filter_range

    plan = physical_plan(q_filter_range(spark, SF_DIR))
    assert "DataFilters: [isnotnull(l_shipdate" in plan.replace("\n", " ")


def test_column_pruning(spark):
    """A 3-column aggregate over lineitem must not scan all 11 columns."""
    from aws_lakehouse_project_spark.operators.relational import q_scan_parquet

    plan = physical_plan(q_scan_parquet(spark, SF_DIR))
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_orderkey" in scan_line and "l_quantity" in scan_line
    assert "l_extendedprice" not in scan_line  # pruned


def test_topk_is_take_ordered(spark):
    """orderBy().limit(k) must compile to TakeOrderedAndProject —
    per-partition top-k, not a global sort."""
    from aws_lakehouse_project_spark.operators.joins import q_sort_topk

    plan = physical_plan(q_sort_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_inner_join_broadcasts_dimension(spark):
    """The customer side of the Q3-shape join must end up broadcast at
    this scale WITHOUT a forced hint (AQE/stats outcome, not a hint that
    would OOM when customer is multi-TB at SF 100k)."""
    from aws_lakehouse_project_spark.operators.joins import q_join_inner

    plan = final_plan(q_join_inner(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_fact_daily_reuses_aggregation_exchange(spark):
    """The fact build shuffles each input exactly once: both sides
    pre-aggregate on (cust_id, dt) and the full-outer join reuses that
    partitioning (2 hash exchanges; the final orderBy adds only a range
    exchange)."""
    from aws_lakehouse_project_spark.operators.fact import build_fact_daily

    plan = physical_plan(build_fact_daily(spark, SF_DIR))
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 2, f"expected 2 hash exchanges, got {n_hash_exchanges}"
    # and events must be scanned once, not once per metric family
    n_event_scans = plan.count("events.parquet")
    assert n_event_scans == 1, f"expected 1 events scan, got {n_event_scans}"


def test_whole_stage_codegen_covers_q1(spark):
    """The Q1-shape aggregation must run inside WholeStageCodegen (check
    the AQE-finalized plan — pre-execution it is not yet staged)."""
    from aws_lakehouse_project_spark.operators.relational import q_agg_sum

    df = q_agg_sum(spark, SF_DIR)
    df.collect()  # finalize AQE
    plan = physical_plan(df)
    # "*(n) HashAggregate" is the WholeStageCodegen marker in plan strings
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan


def test_grouping_sets_single_expand(spark):
    """GROUPING SETS must plan one Expand + one shuffle over one scan of
    the input, not one scan per grain."""
    from aws_lakehouse_project_spark.operators.stats import q_grouping_sets

    plan = physical_plan(q_grouping_sets(spark, SF_DIR))
    assert plan.count("Expand") >= 1
    assert plan.count("customer.parquet") == 1, "each grain re-scanned the table"


def test_calendar_fill_broadcasts_daily_metrics(spark):
    """The date-spine join must broadcast the post-aggregation daily
    frame — a shuffle join on a ~2.4k-row side is wrong at any scale."""
    from aws_lakehouse_project_spark.operators.stats import q_calendar_fill

    plan = physical_plan(q_calendar_fill(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_having_filters_before_join(spark):
    """The HAVING predicate must apply to the aggregate's output before
    the join back to orders (total_qty filter above the agg, below the
    join), so only qualifying orders are joined."""
    from aws_lakehouse_project_spark.operators.tpch import q_having

    plan = physical_plan(q_having(spark, SF_DIR))
    lines = plan.splitlines()
    filt = next(i for i, l in enumerate(lines) if "Filter" in l and "total_qty" in l)
    join = next(i for i, l in enumerate(lines) if "Join" in l)
    # plan strings print top-down: the join appears above the filter
    assert join < filt, "HAVING filter did not stay below the join"


def test_correlated_subquery_no_shuffle_join(spark):
    """The decorrelated Q17 plan at this scale must broadcast both the
    part-key filter and the per-part average — lineitem must never
    shuffle for a join. No hints: the part-keys joins come from static
    size stats, the per-part-average join from AQE's runtime conversion
    (its pre-execution estimate is unknown, so only the final adaptive
    plan shows the broadcast)."""
    from aws_lakehouse_project_spark.operators.tpch import q_correlated_subquery

    plan = final_plan(q_correlated_subquery(spark, SF_DIR))
    # part-keys broadcast appears in both the avg branch and the final
    # branch, plus the per-part-average broadcast: 3 total
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_stats_exact_is_single_aggregation(spark):
    """All six moments must compute in ONE partial+final hash aggregate
    over one lineitem scan — no per-moment passes."""
    from aws_lakehouse_project_spark.operators.stats import q_stats_exact

    plan = physical_plan(q_stats_exact(spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_corpus_prep_filters_before_dedup_shuffle(spark):
    """The lang/quality gates must evaluate on the scan (map-side) and
    the window dedup must pre-prune via partial WindowGroupLimit BEFORE
    the content shuffle — only quality-passing docs move, at most one
    candidate row per (partition, text)."""
    from aws_lakehouse_project_spark.operators.text import q_corpus_prep

    plan = physical_plan(q_corpus_prep(spark, SF_DIR))
    lines = plan.splitlines()
    scan = next(i for i, l in enumerate(lines) if "FileScan parquet" in l)
    gate = next(i for i, l in enumerate(lines) if "Filter" in l and "0.08" in l)
    shuffle = next(
        i for i, l in enumerate(lines) if "Exchange hashpartitioning(text" in l
    )
    partial_limit = next(
        i for i, l in enumerate(lines) if "WindowGroupLimit" in l and "Partial" in l
    )
    # top-down plan: scan is the bottom line, shuffle above the partial limit
    assert shuffle < partial_limit < gate < scan


def test_quantile_filter_broadcasts_cutoffs(spark):
    """The per-language p25 cutoff (one row per language) must broadcast
    back into the documents scan — never shuffle documents for the
    threshold join."""
    from aws_lakehouse_project_spark.operators.stats import q_quantile_filter

    plan = physical_plan(q_quantile_filter(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_tfidf_no_vocabulary_join(spark):
    """Document frequency must come from a window over term — not a join
    against the vocabulary-sized term dimension (whose forced broadcast
    would OOM at corpus scale). The ONLY hint is the 1-row n_docs scalar;
    the corpus is scanned once for tf plus one pruned scan for n_docs."""
    from aws_lakehouse_project_spark.operators.text import q_tfidf

    qe = q_tfidf(spark, SF_DIR)._jdf.queryExecution()
    assert qe.analyzed().toString().count("ResolvedHint") == 1
    plan = qe.executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("FileScan") == 2
    # final (source, term) aggregation reuses the term window's
    # partitioning: tf agg + term window + ranking window = 3 exchanges
    assert plan.count("Exchange hashpartitioning") == 3


def test_cpu_spread_is_identity_when_well_partitioned(spark):
    """The pre-shingling rebalance must not force a full-corpus shuffle
    when upstream already has >= core-count partitions (the normal case
    at warehouse scale)."""
    from aws_lakehouse_project_spark.operators.dedup import _cpu_spread

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wide = docs.repartition(spark.sparkContext.defaultParallelism)
    assert _cpu_spread(wide) is wide  # no-op, no Exchange inserted
    assert (
        _cpu_spread(docs).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_minhash_band_join_carries_only_keys(spark):
    """LSH candidate generation must move only (doc_id, band keys)
    through the self-join — the 32-wide signatures re-join AFTER the
    candidate set is known. A projection feeding the band join that
    still carries mh_* columns widens the exchange ~16×."""
    from aws_lakehouse_project_spark.operators.dedup import q_dedup_minhash

    plan = physical_plan(q_dedup_minhash(spark, SF_DIR))
    band_projects = [l for l in plan.splitlines() if ".band_sig" in l]
    assert band_projects, "band projection not found in plan"
    assert all("mh_" not in l for l in band_projects), band_projects


def test_pack_sequences_single_window_shuffle(spark):
    """Sequence packing must cost one shard-keyed window shuffle plus
    the final aggregation — and the final groupBy(source, pack_id) can
    reuse the window's source partitioning, so exactly one hash
    exchange overall."""
    from aws_lakehouse_project_spark.operators.text import q_pack_sequences

    plan = physical_plan(q_pack_sequences(spark, SF_DIR))
    n = plan.count("Exchange hashpartitioning")
    assert n == 1, f"expected 1 hash exchange, got {n}"


def test_scd2_single_shuffle(spark):
    """Both SCD2 window passes share one (user_id) exchange — the feed is
    shuffled exactly once."""
    from aws_lakehouse_project_spark.operators.dimensions import q_scd2

    plan = physical_plan(q_scd2(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1


def test_tpch_q19_pushes_single_side_implications(spark):
    """Catalyst extracts the per-side implications of the disjunctive
    predicate and pushes them below the join as scan filters."""
    from aws_lakehouse_project_spark.operators.tpch import q_tpch_q19

    plan = physical_plan(q_tpch_q19(spark, SF_DIR))
    # part scan carries a brand filter; lineitem scan carries a quantity
    # range — neither table reaches the join unfiltered
    assert "PushedFilters: [" in plan
    assert "p_brand" in plan.split("Scan parquet")[1] or "p_brand" in plan
    assert "l_quantity" in plan


def test_ri_audit_broadcasts_dimension_keys(spark):
    """Small-parent FK edges (nation) check via broadcast, not a shuffle
    of the child."""
    from aws_lakehouse_project_spark.operators.dimensions import q_ri_audit

    plan = physical_plan(q_ri_audit(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_fuzzy_match_is_blocked_join(spark):
    """The fuzzy self-join keys on the block struct (hash join on blk),
    and levenshtein is evaluated post-join — never a cartesian product."""
    from aws_lakehouse_project_spark.operators.dedup import q_fuzzy_match

    plan = physical_plan(q_fuzzy_match(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q8_broadcasts_all_dimensions(spark):
    """Q8 at this scale: nation/region ride hinted bounded broadcasts;
    the PROMO part slice must ALSO end up broadcast here purely from
    stats/AQE (no hint — part scales with SF)."""
    from aws_lakehouse_project_spark.operators.tpch import q_tpch_q8

    plan = final_plan(q_tpch_q8(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_tpch_q21_semi_and_anti_share_order_key(spark):
    """Q21's EXISTS/NOT EXISTS plan as LeftSemi + LeftAnti joins — no
    aggregate-subquery rewrite, no cartesian."""
    from aws_lakehouse_project_spark.operators.tpch import q_tpch_q21

    plan = physical_plan(q_tpch_q21(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_tpch_q2_no_cartesian_and_bounded_broadcasts(spark):
    """Q2's decorrelated min-cost plan: nation/region ride bounded
    broadcast hints, the per-(part,supplier) aggregate and its per-part
    min rejoin are hash joins on their keys — never a cartesian."""
    from aws_lakehouse_project_spark.operators.tpch import q_tpch_q2

    plan = physical_plan(q_tpch_q2(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q12_pushes_date_range_to_lineitem_scan(spark):
    """Q12's date window must reach the lineitem parquet scan as pushed
    filters; the conditional counts are a plain hash aggregate (no
    expand, no cartesian)."""
    from aws_lakehouse_project_spark.operators.tpch import q_tpch_q12

    plan = physical_plan(q_tpch_q12(spark, SF_DIR))
    # assert the RANGE itself is pushed (an empty PushedFilters or a bare
    # IsNotNull would satisfy weaker checks); Catalyst unwraps the date
    # cast into a pushable timestamp comparison
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_query_reads_bucketed_scans(spark):
    """q_bucketed_join's join + per-key aggregation must run on
    bucket-aligned scans: both parquet scans report Bucketed: true and
    the only exchange in the executed plan is the final few-row
    histogram aggregate."""
    import re

    from aws_lakehouse_project_spark.operators.joins import q_bucketed_join

    plan = final_plan(q_bucketed_join(spark, SF_DIR))
    assert plan.count("Bucketed: true") == 2
    assert len(re.findall(r"Exchange (?:hash|range|Single)", plan)) <= 1


def test_no_forced_broadcast_of_sf_scaling_tables():
    """Static lint: customer (150k rows/SF), supplier (10k/SF) and part
    (200k/SF) grow linearly with data size — a forced F.broadcast() hint
    on any of them OOMs every executor at the 100 TB design point.
    Hints are reserved for genuinely bounded frames (nation=25,
    region=5, 1-row scalar aggregates, top-k slices). AQE makes the
    right call for the scaling dims at every scale."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "aws_lakehouse_project_spark"
    pat = re.compile(
        r"F\.broadcast\(\s*(customer|supplier|part|cust|supp)\b(?!_keys)"
    )
    offenders = []
    for py in pkg.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if pat.search(line):
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, "forced broadcast of SF-scaling table:\n" + "\n".join(
        offenders
    )


def test_tpch_q1_pushes_date_filter_and_single_exchange(spark):
    """Q1: the shipdate cutoff reaches the parquet scan and the eight
    aggregates compute in ONE partial+final pass — exactly one exchange,
    keyed on the two grouping columns."""
    from aws_lakehouse_project_spark.operators.tpch import q_tpch_q1

    plan = physical_plan(q_tpch_q1(spark, SF_DIR)).replace("\n", " ")
    assert "DataFilters: [isnotnull(l_shipdate" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tpch_q9_prunes_part_before_join(spark):
    """Q9: the p_name LIKE filter is applied at the part scan (pushed
    data filter), so lineitem only ever joins the filtered keys."""
    from aws_lakehouse_project_spark.operators.tpch import q_tpch_q9

    plan = physical_plan(q_tpch_q9(spark, SF_DIR)).replace("\n", " ")
    assert "StringContains(p_name,widget)" in plan, plan


def test_tpch_q20_aggregates_before_semi_join(spark):
    """Q20: the qualifying-supplier side collapses to aggregated keys
    BEFORE the semi join — the join probe carries keys, not lines."""
    from aws_lakehouse_project_spark.operators.tpch import q_tpch_q20

    plan = final_plan(q_tpch_q20(spark, SF_DIR)).replace("\n", " ")
    semi = plan.find("LeftSemi")
    agg = plan.find("HashAggregate", semi)
    assert semi != -1 and agg != -1, plan


def test_skew_salted_join_is_shuffle_join_on_salted_key(spark):
    """The salted join must actually plan as a shuffle join (the hint
    pins it) — a broadcast would make the salt dead weight — and the
    replicated dimension must carry only its two key/payload columns."""
    from aws_lakehouse_project_spark.operators.joins import q_skew_salted_join

    plan = final_plan(q_skew_salted_join(spark, SF_DIR)).replace("\n", " ")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "s_name" not in plan  # dim pruned to (s_suppkey, s_nationkey)
    # The hash table must build from the replicated DIMENSION (right
    # side), never from a fact partition — at scale the fact streams.
    shj = plan[plan.find("ShuffledHashJoin"):][:250]
    assert "BuildRight" in shj, plan


def test_semantic_decontam_broadcasts_eval_side(spark):
    """The held-out split is ~10% of the corpus and must be the
    broadcast side of the bucket join; the train side never reships
    for the flag join (semi join on vec_id keys only)."""
    from aws_lakehouse_project_spark.operators.similarity import (
        q_semantic_decontam,
    )

    plan = final_plan(q_semantic_decontam(spark, SF_DIR)).replace("\n", " ")
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_pq_encode_single_scan_no_shuffle_of_corpus(spark):
    """PQ encoding must be one corpus scan with the codebook as a 1-row
    broadcast — a shuffle or sort-merge join here would reship the
    embedding store it exists to compress."""
    from aws_lakehouse_project_spark.operators.similarity import q_pq_encode

    plan = final_plan(q_pq_encode(spark, SF_DIR)).replace("\n", " ")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row codebook


def test_unigram_logprob_shuffles_counts_not_text(spark):
    """The vocab join and per-doc aggregation must never carry the raw
    text column past the scan — only (doc_id, token) and counts."""
    from aws_lakehouse_project_spark.operators.text import q_unigram_logprob

    plan = final_plan(q_unigram_logprob(spark, SF_DIR)).replace("\n", " ")
    exchanges = [
        seg for seg in plan.split("Exchange") if seg.startswith(" hashpartitioning")
    ]
    assert exchanges, plan
    assert all("text#" not in seg.split(")")[0] for seg in exchanges)


def test_multimodal_frames_single_python_boundary_no_shuffle(spark):
    """Frame sampling is a pure mapInPandas fan-out: exactly one Arrow
    boundary, zero exchanges — payload bytes never shuffle."""
    from aws_lakehouse_project_spark.operators.multimodal import (
        q_multimodal_frames,
    )

    plan = final_plan(q_multimodal_frames(spark, SF_DIR)).replace("\n", " ")
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_approx_distinct_plans_without_expand(spark):
    """Mixing countDistinct with plain aggregates makes Catalyst plan an
    Expand that doubles the fact stream (measured 10x wall-clock at the
    100x soak). The split exact/sketch formulation must stay
    Expand-free."""
    from aws_lakehouse_project_spark.operators.analytics import (
        q_approx_distinct,
    )

    plan = final_plan(q_approx_distinct(spark, SF_DIR)).replace("\n", " ")
    assert "Expand" not in plan, plan


def test_scaled_lsh_pairs_no_cartesian_and_banded_ships_keys_only(spark):
    """The scale-safe LSH configs registered in r7 must keep the demo
    family's plan shape: candidate generation is an equality join on
    bucket keys (never CartesianProduct / BNL over vectors), and the
    banded variant's (band, bucket) self-join must not carry the
    embedding arrays — vectors re-join only after the distinct
    candidate ids are known."""
    from aws_lakehouse_project_spark.operators.similarity import (
        q_dedup_clusters_semantic_scaled,
        q_semantic_decontam_scaled,
        q_similarity_pairs_banded,
        q_similarity_pairs_scaled,
    )

    for q in (
        q_similarity_pairs_scaled,
        q_semantic_decontam_scaled,
        q_dedup_clusters_semantic_scaled,
    ):
        plan = physical_plan(q(spark, SF_DIR))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__

    plan = physical_plan(q_similarity_pairs_banded(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the band-key self-join: joins on (band, bucket); the build/stream
    # projections feeding it must not include the ev vector column
    join_lines = [
        l for l in plan.splitlines()
        if "Join" in l and "band" in l and "bucket" in l
    ]
    assert join_lines, "band-bucket join not found in plan"
    assert all("ev" not in l.split("Join")[1] for l in join_lines), join_lines

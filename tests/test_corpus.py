"""Corpus-hygiene operators: planted-case semantics + plan-shape guards."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_lakehouse_project_spark.operators.corpus import (
    chunk_dup_profile,
    ngram_overlap,
    q_zipf,
)
from tests.conftest import SF_DIR
from tests.test_plans import physical_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_ngram_overlap_detects_planted_leak(spark):
    bench = _docs(spark, [(100, "eval", "alpha beta gamma delta epsilon")])
    train = _docs(
        spark,
        [
            # copies the bench 4-gram "beta gamma delta epsilon"
            (1, "web", "intro beta gamma delta epsilon outro filler"),
            # shares words but no 4-gram
            (2, "web", "beta delta gamma epsilon alpha beta delta"),
            (3, "web", "totally unrelated words in this one here"),
        ],
    )
    hits = {r["doc_id"]: r["n_shared"] for r in ngram_overlap(train, bench, n=4).collect()}
    assert hits == {1: 1}


def test_ngram_overlap_counts_distinct_shared_shingles(spark):
    bench = _docs(spark, [(100, "eval", "a b c d e")])  # 4-grams: "a b c d","b c d e"
    train = _docs(spark, [(1, "web", "x a b c d e y"), (2, "web", "q w e r t")])
    out = {r["doc_id"]: r["n_shared"] for r in ngram_overlap(train, bench, n=4).collect()}
    assert out == {1: 2}


def test_ngram_overlap_bench_side_broadcasts(spark):
    bench = _docs(spark, [(100, "eval", "a b c d e")])
    train = _docs(spark, [(1, "web", "x a b c d e y")])
    plan = physical_plan(ngram_overlap(train, bench, n=4))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunk_dup_profile_planted(spark):
    docs = _docs(
        spark,
        [
            (1, "s1", "a b c x y z"),  # chunks(3): "a b c", "x y z"
            (2, "s1", "a b c p q r"),  # "a b c" duplicated across docs
            (3, "s2", "m n o"),
        ],
    )
    out = {r["source"]: r for r in chunk_dup_profile(docs, chunk=3).collect()}
    assert out["s1"]["n_chunks"] == 4
    assert out["s1"]["dup_chunks"] == 2  # both instances of "a b c"
    assert abs(out["s1"]["dup_ratio"] - 0.5) < 1e-9
    assert out["s2"]["dup_chunks"] == 0


def test_zipf_top20_is_take_ordered_not_global_sort(spark):
    df = q_zipf(spark, SF_DIR)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 20
    assert [r["rank"] for r in rows] == list(range(1, 21))
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert abs(sum(r["rel_freq"] for r in rows)) <= 1.0 + 1e-9


def test_contamination_rate_is_small_but_nonzero(spark):
    from aws_lakehouse_project_spark.operators.corpus import q_contamination

    out = q_contamination(spark, SF_DIR).collect()
    n_train = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(~F.expr("doc_id % 97 = 0"))
        .count()
    )
    assert 0 < len(out) < 0.2 * n_train


def test_contamination_single_corpus_shuffle(spark):
    """The corpus side must shuffle exactly once (the survivor
    aggregation) — deduping shingles before the broadcast filter would
    shuffle the whole corpus."""
    from aws_lakehouse_project_spark.operators.corpus import q_contamination

    plan = physical_plan(q_contamination(spark, SF_DIR))
    # distinct-agg plans as partial+final over ONE logical exchange pair
    # on the corpus side, plus the (tiny) bench-side distinct
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BroadcastHashJoin" in plan


def test_fuzzy_match_finds_planted_typo_in_block(spark):
    """Blocked edit-distance matching with unioned prefix+suffix keys: a
    typo in the prefix's tail is found via the prefix block, a typo in
    the FIRST character (which prefix-only blocking provably missed) is
    found via the suffix block, each matched pair emits exactly once,
    and ≥2-edit names stay excluded."""
    from aws_lakehouse_project_spark.operators.dedup import fuzzy_name_pairs

    df = spark.createDataFrame(
        [
            (1, "Customer#000000001"),
            (2, "Customer#000000002"),   # 1 edit from #1 — prefix block
            (3, "Customer#0000000XX"),   # 2 edits from #1 — beyond max_dist
            (4, "Xustomer#000000001"),   # 1 edit in char 1 — suffix block
        ],
        "k long, nm string",
    )
    rows = fuzzy_name_pairs(df, key="k", name="nm", max_dist=1).collect()
    pairs = {(r["k1"], r["k2"], r["dist"]) for r in rows}
    assert (1, 2, 1) in pairs          # prefix-tail edit: prefix block
    assert (1, 4, 1) in pairs          # first-char edit: suffix block
    assert all(d <= 1 for _, _, d in pairs)
    assert all(not (a == 1 and b == 3) for a, b, _ in pairs)
    # short names (< 2*block_len) are caught by BOTH keys — still one row
    assert len(rows) == len(pairs)


def test_fuzzy_match_hot_block_capped(spark):
    """Skew guard: a block key exceeding max_block is excluded wholesale
    (its members emit no pairs), while normal-width blocks still match —
    a hot 16-char prefix can't go quadratic at scale."""
    from aws_lakehouse_project_spark.operators.dedup import fuzzy_name_pairs

    # 60 same-length names sharing prefix AND suffix blocks (only the
    # middle two characters vary) → one hot block of width 60 under both
    # keys; plus one normal near-dup pair outside it
    hot = [(i, f"{'A' * 16}{i:02d}{'B' * 16}") for i in range(60)]
    normal = [(100, "Customer#000000001"), (101, "Customer#000000002")]
    df = spark.createDataFrame(hot + normal, "k long, nm string")

    capped = fuzzy_name_pairs(df, key="k", name="nm", max_dist=1, max_block=50)
    pairs = {(r["k1"], r["k2"]) for r in capped.collect()}
    assert (100, 101) in pairs                      # normal block unaffected
    assert all(k1 >= 100 for k1, _ in pairs)        # hot block fully excluded

    uncapped = fuzzy_name_pairs(df, key="k", name="nm", max_dist=1, max_block=None)
    assert len(uncapped.collect()) > len(pairs)     # cap is what removed them


def test_ngram_overlap_short_docs_yield_no_shingles(spark):
    """Docs shorter than n tokens must contribute nothing — not crash
    (Spark's sequence(0, -1) is DESCENDING, so the unguarded index
    expression evaluated slice(w, 0, n)) and not diverge from the
    oracle, which emits no shingles for short docs."""
    bench = _docs(spark, [(100, "eval", "a b"), (101, "eval", "a b c d e")])
    train = _docs(
        spark,
        [
            (1, "web", "a"),                  # 1 token < n
            (2, "web", "a b c"),              # 3 tokens < n
            (3, "web", "x a b c d e y"),      # real 4-gram leak
            (4, "web", ""),                   # empty text → [""]
        ],
    )
    out = {r["doc_id"]: r["n_shared"] for r in ngram_overlap(train, bench, n=4).collect()}
    assert out == {3: 2}


def test_chunk_dup_profile_short_docs_yield_no_chunks(spark):
    """Docs with fewer than `chunk` tokens emit no chunks, and docs with
    a trailing partial window emit only their full chunks — matching the
    oracle, which generates nothing for the remainder."""
    docs = _docs(
        spark,
        [
            (1, "s1", "a b"),            # < chunk: no chunks
            (2, "s1", "a b c d"),        # 1 full chunk "a b c", drop "d"
            (3, "s1", "a b c"),          # duplicates doc 2's chunk
        ],
    )
    out = {r["source"]: r for r in chunk_dup_profile(docs, chunk=3).collect()}
    assert out["s1"]["n_chunks"] == 2
    assert out["s1"]["dup_chunks"] == 2


def test_chunk_dup_profile_chunk_one_on_empty_tokens(spark):
    """chunk=1 on an empty-text doc must not crash (split('') → [''],
    one 1-token chunk of the empty string — same as the oracle)."""
    docs = _docs(spark, [(1, "s1", ""), (2, "s1", "a")])
    out = {r["source"]: r for r in chunk_dup_profile(docs, chunk=1).collect()}
    assert out["s1"]["n_chunks"] == 2
    assert out["s1"]["dup_chunks"] == 0


def test_resize_media_drops_empty_payloads(spark):
    """Zero-length (and null) payloads must emit NO row from the Arrow
    resize path — the SQL twin's generate_series(1, 0, stride) produces
    no rows, so an emitted md5-of-empty row would silently diverge from
    the oracle. Regression for the r5 ADVICE finding (multimodal.py)."""
    from aws_lakehouse_project_spark.operators.multimodal import (
        documents_as_media,
        resize_media,
    )

    rows = [
        (1, "src0", "hello world payload", "en"),
        (2, "src0", "", "en"),  # empty payload
        (3, "src0", None, "en"),  # null payload
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string"
    )
    out = {r["media_id"]: r for r in resize_media(documents_as_media(docs)).collect()}
    assert set(out) == {1}
    assert out[1]["orig_bytes"] == len("hello world payload")

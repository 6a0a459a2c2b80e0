"""Planted near-duplicate tests: the testdata contains no near-dups, so
the LSH/SimHash demos legitimately return few/no pairs there. These
tests plant known duplicates and assert the operators catch them —
the recall side of the rows-only dedup surface."""

from __future__ import annotations

from pyspark.sql import functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden under "
    "a bright morning sun with dew still on the grass"
)
# ~90% shingle overlap: one word changed mid-text
NEAR = BASE.replace("windowsill", "doorstep")
# unrelated text, same vocabulary style
OTHER = (
    "spark engines shuffle partitioned data across executors while the "
    "optimizer prunes columns and pushes filters into columnar scans "
    "before aggregating results for the final stage of the query"
)


def docs_df(spark):
    rows = [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)]  # 4 == exact dup of 1
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_minhash_catches_planted_dups(spark):
    from aws_lakehouse_project_spark.operators.dedup import (
        _LSH_ROWS,
        _MINHASH_K,
        minhash_signatures,
    )

    sig = {r["doc_id"]: [r[f"mh_{j}"] for j in range(_MINHASH_K)]
           for r in minhash_signatures(docs_df(spark)).collect()}
    # exact dup: identical signature
    assert sig[1] == sig[4]
    # near dup: high signature agreement (est jaccard)
    agree = sum(a == b for a, b in zip(sig[1], sig[2])) / _MINHASH_K
    assert agree >= 0.5, agree
    # unrelated: low agreement
    noise = sum(a == b for a, b in zip(sig[1], sig[3])) / _MINHASH_K
    assert noise <= 0.2, noise
    # and at least one full band agrees for the near pair → LSH finds it
    bands_agree = any(
        sig[1][b * _LSH_ROWS : (b + 1) * _LSH_ROWS]
        == sig[2][b * _LSH_ROWS : (b + 1) * _LSH_ROWS]
        for b in range(_MINHASH_K // _LSH_ROWS)
    )
    assert bands_agree


def test_simhash_hamming_orders_similarity(spark):
    from aws_lakehouse_project_spark.operators.dedup import simhash_bands

    sig = {r["doc_id"]: [r[f"sb_{b}"] for b in range(4)]
           for r in simhash_bands(docs_df(spark)).collect()}

    def hamming(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert hamming(sig[1], sig[4]) == 0  # exact dup
    near = hamming(sig[1], sig[2])
    far = hamming(sig[1], sig[3])
    assert near < far, (near, far)
    assert near <= 6  # one-word change flips few bits


def _shingle_set(text: str) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def test_minhash_lsh_recall_matches_scurve_prediction(spark):
    """Quantitative recall bound: plant 40 near-dup pairs (~5% token
    edits) in a seeded synthetic corpus; LSH must recover them at no
    less than the banding s-curve's predicted recall (mean over pairs of
    1-(1-s^r)^b at each pair's exact jaccard) minus sampling slack, and
    est_jaccard must track the exact shingle jaccard on recovered
    pairs."""
    import random

    from aws_lakehouse_project_spark.operators.dedup import (
        _LSH_ROWS,
        _MINHASH_K,
        minhash_pairs,
    )

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(500)]
    n_words, n_pairs = 80, 40
    rows, exact = [], {}
    for i in range(n_pairs):
        words = [rng.choice(vocab) for _ in range(n_words)]
        dup = list(words)
        for pos in rng.sample(range(n_words), 4):  # 4/80 = 5% token edits
            dup[pos] = rng.choice(vocab)
        rows.append((i, " ".join(words)))
        rows.append((1000 + i, " ".join(dup)))
        a, b = _shingle_set(" ".join(words)), _shingle_set(" ".join(dup))
        exact[(i, 1000 + i)] = len(a & b) / len(a | b)

    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    found = {
        (r["d1"], r["d2"]): r["est_jaccard"] for r in minhash_pairs(docs).collect()
    }

    n_bands = _MINHASH_K // _LSH_ROWS
    predicted = sum(
        1.0 - (1.0 - s**_LSH_ROWS) ** n_bands for s in exact.values()
    ) / len(exact)
    recovered = [p for p in exact if p in found]
    recall = len(recovered) / len(exact)
    # sampling slack: 40 Bernoulli trials + hash-function randomness
    assert recall >= predicted - 0.15, (recall, predicted)
    assert recall >= 0.6  # absolute floor: 5% edits are near-dups, full stop

    # estimator quality on the recovered pairs: est ≈ exact jaccard
    # (k=32 signature ⇒ std ≈ sqrt(s(1-s)/32) ≈ 0.08 at s≈0.75)
    errs = [abs(found[p] - exact[p]) for p in recovered]
    assert sum(errs) / len(errs) <= 0.12, sorted(errs)[-3:]

    # precision: unrelated random-salad docs must not collide (any
    # stray pair would need 4 agreeing minhashes in one band)
    false_pos = [p for p in found if p not in exact]
    assert len(false_pos) <= 2, false_pos


def test_jaccard_and_clusters_on_planted(spark):
    from aws_lakehouse_project_spark.operators.dedup import (
        connected_components,
        word_shingles,
    )

    sh = word_shingles(docs_df(spark))
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = cnt.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    cb = cnt.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    jac = F.col("c").cast("double") / (F.col("n1") + F.col("n2") - F.col("c"))
    pairs = (
        shared.join(ca, "d1").join(cb, "d2")
        .filter(jac >= 0.5)
        .select("d1", "d2")
    )
    got = sorted(map(tuple, pairs.collect()))
    assert got == [(1, 2), (1, 4), (2, 4)]
    comps = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert comps == {1: 1, 2: 1, 4: 1}  # one cluster; doc 3 untouched


def test_shingle_primitives_survive_short_docs_under_ansi(spark):
    """1-token and empty docs must yield ZERO shingles/signatures, not
    crash: Spark's sequence(0, -1) is a DESCENDING [0, -1] (step
    defaults to -1 when start > stop), so an unguarded index transform
    evaluates w[-1] — INVALID_ARRAY_INDEX under Spark 4's default ANSI
    mode. Regression for the r5 ADVICE finding (corpus.py:451 and the
    same idiom in dedup.py)."""
    from aws_lakehouse_project_spark.operators.dedup import (
        minhash_signatures,
        word_shingles,
    )

    rows = [(1, "one"), (2, ""), (3, "two words"), (4, BASE)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    sh = word_shingles(docs).collect()
    assert {r["doc_id"] for r in sh} == {4}  # short docs contribute nothing
    sig = minhash_signatures(docs).collect()
    assert {r["doc_id"] for r in sig} == {4}


def test_bpe_pairs_single_token_docs_emit_no_pairs(spark, tmp_path):
    """A 1-token doc has no adjacent pair: the CASE guard must emit an
    empty array (sequence(0, -1) would be [0, -1] and w[-1] throws
    under ANSI). Mirrors the DuckDB oracle's len(w)>=2 CASE."""
    from aws_lakehouse_project_spark.operators.corpus import q_bpe_pairs

    rows = [
        (1, "src0", "solo", "en"),
        (2, "src0", "", "en"),
        (3, "src0", "a b a b", "en"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING, lang STRING"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["pair"]: r["n_occurrences"] for r in q_bpe_pairs(spark, str(tmp_path)).collect()}
    assert out == {"a b": 2, "b a": 1}


def test_substring_spans_merge_planted_run_maximally(spark):
    """A 12-token run shared by two docs must surface as ONE maximal
    12-token span in each (5 consecutive duplicated 8-shingles merged),
    never as shingle fragments; unique docs yield nothing."""
    from aws_lakehouse_project_spark.operators.dedup import (
        substring_spans,
        substring_scrub_accounting,
    )

    run = " ".join(f"dup{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + run + " gamma delta"),
            (2, run + " omega psi chi phi"),
            (3, " ".join(f"uniq{i}" for i in range(20))),
            (4, "too short"),
        ],
        "doc_id LONG, text STRING",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in substring_spans(docs, k=8).collect()
    }
    # doc 1: run occupies tokens 3..14; doc 2: tokens 1..12
    assert spans == {1: (3, 14, 12), 2: (1, 12, 12)}

    acct = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"], r["tokens_kept"])
        for r in substring_scrub_accounting(docs, k=8).collect()
    }
    # keep-first is global (doc 1, pos 3) — only doc 2's copy is scrubbed
    assert acct == {2: (16, 12, 4)}


def test_substring_spans_overlapping_removals_union_once(spark):
    """Three copies of the same run: the two non-first copies' removal
    intervals overlap shingle-by-shingle but each token is counted
    once (interval union, not sum of shingle widths)."""
    from aws_lakehouse_project_spark.operators.dedup import (
        substring_scrub_accounting,
    )

    run = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, run), (2, run + " tail1 tail2"), (3, "lead0 " + run)],
        "doc_id LONG, text STRING",
    )
    acct = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"], r["tokens_kept"])
        for r in substring_scrub_accounting(docs, k=8).collect()
    }
    assert acct == {2: (12, 10, 2), 3: (11, 10, 1)}


def test_substring_rewrite_splices_expected_text(spark):
    """The rewrite pass must reassemble exactly the text minus the
    keep-first removal spans — verified against hand-computed clean
    strings, not just hashes."""
    from pyspark.sql import functions as F

    from aws_lakehouse_project_spark.operators.dedup import (
        substring_scrub_rewrite,
    )

    run = " ".join(f"dup{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + run + " gamma delta"),
            (2, run + " omega psi chi phi"),
            (3, "solo text here"),
        ],
        "doc_id LONG, text STRING",
    )
    # recompute clean_text (not just md5) for the assertion
    out = substring_scrub_rewrite(docs, k=8)
    got = {r["doc_id"]: (r["clean_md5"], r["n_tokens_kept"]) for r in out.collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 1 keeps everything (its copy is globally first)
    assert got[1] == (md5("alpha beta " + run + " gamma delta"), 16)
    # doc 2 loses the run (tokens 1..12), keeps the 4-token tail
    assert got[2] == (md5("omega psi chi phi"), 4)
    # untouched doc round-trips byte-exactly
    assert got[3] == (md5("solo text here"), 3)


def test_minhash_arrow_kernel_matches_jvm_aggregate(spark, tmp_path=None):
    """The mapInArrow signature kernel must be BYTE-IDENTICAL to the JVM
    explode + k-min-aggregate form it replaced (r15): signatures feed
    LSH banding, so any drift silently changes every candidate set."""
    from aws_lakehouse_project_spark.operators.dedup import (
        _minhash_signatures_agg,
        minhash_signatures,
    )

    rows = [(i, t) for i, t in enumerate([BASE, NEAR, OTHER] * 5)]
    # plus edge shapes: exactly 3 tokens (1 shingle), repeated shingles
    rows += [(100, "a b c"), (101, "x y x y x y x y")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = minhash_signatures(docs)
    b = _minhash_signatures_agg(docs)
    assert a.columns == b.columns
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

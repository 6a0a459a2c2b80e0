"""Corpus-hygiene operators for training-data pipelines: benchmark
contamination detection, cross-document chunk duplication accounting, and
heavy-hitter token statistics.

These extend the reference's quality gates (`local_runner.py:62-104`'s
expectation DSL validates rows; these validate the *corpus*) with the
checks an LLM-data pipeline runs before training: is an eval benchmark
leaked into the training split, how much of the corpus is copy-pasted
boilerplate, and what does the token distribution look like. All are
built-in expressions — shingling/chunking happen map-side on the scan and
only bounded aggregates shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import demo_query

# Benchmark membership for the demo: a deterministic ~1% slice of the
# corpus stands in for an eval set (real pipelines join against the actual
# benchmark corpus; the plan shape is identical).
_BENCH_PRED = "doc_id % 97 = 0"


def ngram_overlap(
    docs: DataFrame, bench: DataFrame, n: int = 13
) -> DataFrame:
    """Training docs sharing at least one word-``n``-gram with ``bench``.

    Returns (doc_id, source, n_shared) where n_shared counts distinct
    leaked n-grams. The benchmark side of the join is an eval suite —
    thousands of rows, not billions — so its distinct-shingle set
    broadcasts and the training corpus is never shuffled: shingles are
    generated map-side (transform over a sequence), the broadcast hash
    join filters them map-side, and the ONLY corpus-side exchange is the
    final per-doc aggregation of surviving (doc, shingle) pairs — a tiny
    fraction of the corpus. countDistinct dedups inside that one
    aggregation; deduping before the join would shuffle every shingle of
    the corpus for nothing. At 100 TB the default 13-gram window
    (WaT/GPT-3 convention) makes collisions rare enough that the
    survivor set stays small.
    """
    def shingles(df: DataFrame) -> DataFrame:
        w = F.split(F.lower(F.col("text")), " ")
        # docs shorter than n tokens yield NO shingles (the CASE guard
        # matters: Spark's sequence(0, -1) is a DESCENDING [0,-1], so the
        # unguarded form emitted slice(w, 0, n) and crashed; the oracle's
        # CASE WHEN len(w)>=n ... ELSE [] is mirrored here)
        expr = F.expr(
            f"CASE WHEN size(w) >= {n} THEN "
            f"transform(sequence(1, size(w)-{n}+1), "
            f"i -> concat_ws(' ', slice(w, i, {n}))) "
            f"ELSE array() END"
        )
        return (
            df.select("doc_id", "source", w.alias("w"))
            .select("doc_id", "source", F.explode(expr).alias("s"))
        )

    bench_sh = F.broadcast(shingles(bench).select("s").distinct())
    return (
        shingles(docs).join(bench_sh, "s")
        .groupBy("doc_id", "source")
        .agg(F.countDistinct("s").alias("n_shared"))
    )


@demo_query(
    "q_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS s
      FROM (SELECT doc_id, source, w,
                   unnest(CASE WHEN len(w) >= 4
                               THEN generate_series(1, len(w)-3) ELSE [] END) AS i
            FROM toks)
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT DISTINCT doc_id, source, s FROM sh WHERE doc_id % 97 <> 0)
    SELECT t.doc_id, t.source, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM train t JOIN bench b USING (s)
    GROUP BY t.doc_id, t.source
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination report: training documents sharing a word
    4-gram with the (deterministic ~1%) benchmark slice. 4-grams, not the
    production 13, because the synthetic corpus draws from a ~30-word
    vocabulary — the plan is the same, only the collision rate differs.
    """
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.expr(_BENCH_PRED))
    train = docs.filter(~F.expr(_BENCH_PRED))
    return ngram_overlap(train, bench, n=4)


def chunk_dup_profile(
    docs: DataFrame, chunk: int = 50, check_contract: bool = False
) -> DataFrame:
    """Per-source cross-document chunk-duplication profile.

    Splits each document into non-overlapping ``chunk``-token windows,
    counts how many chunk *instances* also occur in some other document,
    and aggregates the duplication ratio per source — the signal used to
    strip boilerplate (headers, license blocks, navigation chrome) that
    exact whole-doc dedup misses.

    One corpus-sized shuffle total: chunk instances aggregate straight
    to (chunk, source) grain — n_inst + distinct-doc count — and since
    every doc belongs to exactly ONE source, the global
    docs-containing-chunk count is the SUM of the per-source distinct
    counts, so the cross-source combine and the flag join both run on
    the distinct-chunk table (vocabulary-sized), never on instances.
    (The previous shape joined the full instance stream against the
    frequency table — a second corpus-wide shuffle that made the query
    scale at ~10.5x for 10x data in the round-6 registry soak; this
    shape re-measured at ~3x, in line with the linear cohort.) Chunk
    generation is a map-side array expression.

    PRECONDITION: each ``doc_id`` belongs to exactly ONE source — the
    identity that lets the global distinct-doc count be the sum of
    per-source distinct counts. ``check_contract=True`` verifies it
    with one doc-grain aggregate over the two key columns (far cheaper
    than the chunk stream; skipped by default because the documents
    table guarantees it) and raises ValueError on violation instead of
    silently inflating ``n_docs_with``.
    """
    if check_contract:
        bad = (
            docs.groupBy("doc_id")
            .agg(F.countDistinct("source").alias("__ns"))
            .filter(F.col("__ns") > 1)
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError(
                "chunk_dup_profile: doc_id values repeat across sources — "
                "the per-source distinct-sum identity does not hold; "
                "disambiguate doc_ids (e.g. concat(source, doc_id)) first"
            )
    w = F.split(F.lower(F.col("text")), " ")
    # docs shorter than one chunk yield NO chunks (guard mirrors the
    # oracle; unguarded sequence(0,-1) is DESCENDING [0,-1] in Spark,
    # which emitted a bogus partial chunk plus a from-the-end slice)
    expr = F.expr(
        f"CASE WHEN size(w) >= {chunk} THEN "
        f"transform(sequence(0, int(size(w)/{chunk})-1), "
        f"i -> concat_ws(' ', slice(w, i*{chunk}+1, {chunk}))) "
        f"ELSE array() END"
    )
    chunks = (
        docs.select("doc_id", "source", w.alias("w"))
        .select("doc_id", "source", F.explode(expr).alias("c"))
    )
    per_cs = chunks.groupBy("c", "source").agg(
        F.count(F.lit(1)).alias("n_inst"),
        F.countDistinct("doc_id").alias("nd_src"),
    )
    # CONTRACT: each doc_id must belong to exactly ONE source (true of
    # the documents table; a frame repeating a doc_id across sources
    # would silently inflate n_docs_with here). Under that precondition
    # the global distinct-doc count per chunk is the sum of the
    # per-source distinct counts — which is what lets this stay a
    # single (c, source)-grain aggregation instead of a second
    # corpus-wide COUNT(DISTINCT) shuffle (the r6 re-plan, 10.5x→3x
    # at 10x data).
    per_c = per_cs.groupBy("c").agg(F.sum("nd_src").alias("n_docs_with"))
    dup_inst = F.when(F.col("n_docs_with") > 1, F.col("n_inst")).otherwise(0)
    return (
        per_cs.join(per_c, "c")
        .groupBy("source")
        .agg(
            F.sum("n_inst").cast("bigint").alias("n_chunks"),
            F.sum(dup_inst).cast("bigint").alias("dup_chunks"),
            F.round(
                F.sum(dup_inst).cast("double") / F.sum("n_inst"),
                6,
            ).alias("dup_ratio"),
        )
    )


@demo_query(
    "q_chunk_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents
    ),
    chunks AS (
      SELECT doc_id, source,
             array_to_string(list_slice(w, (i-1)*3+1, (i-1)*3+3), ' ') AS c
      FROM (SELECT doc_id, source, w,
                   unnest(CASE WHEN len(w) >= 3
                               THEN generate_series(1, CAST(floor(len(w)/3) AS BIGINT))
                               ELSE [] END) AS i
            FROM toks)
    ),
    freq AS (SELECT c, COUNT(DISTINCT doc_id) AS n_docs_with FROM chunks GROUP BY c)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) FILTER (WHERE n_docs_with > 1) AS BIGINT) AS dup_chunks,
           ROUND(CAST(COUNT(*) FILTER (WHERE n_docs_with > 1) AS DOUBLE)
                 / COUNT(*), 6) AS dup_ratio
    FROM chunks JOIN freq USING (c)
    GROUP BY source
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document chunk-duplication ratios per source (3-token chunks
    so the ~30-word synthetic vocabulary yields visible collisions; real
    corpora use ~50)."""
    return chunk_dup_profile(load_table(spark, sf_dir, "documents"), chunk=3)


@demo_query(
    "q_zipf",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
    ranked AS (
      SELECT token, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank,
             SUM(freq) OVER () AS total
      FROM counts
    )
    SELECT CAST(rank AS INT) AS rank, token, CAST(freq AS BIGINT) AS freq,
           ROUND(CAST(freq AS DOUBLE) / total, 8) AS rel_freq
    FROM ranked WHERE rank <= 20
    """,
)
def q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-20 tokens by frequency with their rank
    and relative frequency — the vocabulary sanity check (Zipf curve head)
    run before tokenizer training.

    Token explosion and partial counts are map-side; the distinct-token
    table (vocabulary-sized, not corpus-sized) is what shuffles. The
    top-20 cut is ``orderBy().limit()`` — TakeOrderedAndProject, a per-
    partition heap + driver merge, never a single-partition sort of the
    vocabulary — and the corpus token total rides in as a 1-row broadcast.
    The only global window (rank assignment) runs over the 20 surviving
    rows. Ties broken by token so the cut is deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = counts.agg(F.sum("freq").alias("total"))
    top20 = counts.orderBy(F.desc("freq"), F.asc("token")).limit(20)
    return top20.crossJoin(F.broadcast(total)).select(
        # rank only the 20 surviving rows; the partition key is a
        # non-foldable constant ("" for every row), so the bounded
        # single-partition window is explicit in the plan
        F.row_number()
        .over(
            Window.partitionBy(F.substring("token", 1, 0)).orderBy(
                F.desc("freq"), F.asc("token")
            )
        )
        .alias("rank"),
        "token",
        F.col("freq").cast("bigint").alias("freq"),
        F.round(F.col("freq").cast("double") / F.col("total"), 8).alias("rel_freq"),
    )


@demo_query(
    "q_vocab_encode",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, token_id FROM (
        SELECT token,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS token_id
        FROM tok GROUP BY token
      ) WHERE token_id <= 4096
    ),
    pos_tok AS (
      SELECT doc_id, i AS pos, w[i] AS token
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w,
                   unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS i
            FROM documents)
      WHERE doc_id < 20
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(v.token_id, ',' ORDER BY p.pos) AS token_ids
    FROM pos_tok p JOIN vocab v USING (token)
    GROUP BY p.doc_id
    """,
)
def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-apply: build a frequency-ranked top-K vocabulary over
    the corpus (token_id = rank, ties broken lexically; K = 4096) and
    encode a bounded document slice into its in-vocab ID sequence — the
    vocabulary-encoding step between corpus prep and sequence packing
    in a training pipeline. Out-of-vocab tokens drop (the inner join is
    the UNK filter); n_tokens counts encoded tokens.

    Scale design: real tokenizers are bounded-vocab, and the cap is what
    makes this plan 100 TB-safe. A raw space-split vocabulary over a
    100 TB corpus is 10⁸–10⁹ distinct terms — ranking it with a global
    row_number window is a single-partition sort of the whole vocabulary
    and broadcasting it OOMs executors. Instead the top-K select
    compiles to TakeOrderedAndProject (per-partition top-K, no global
    sort of the distinct-token table); the row_number window then ranks
    only the K surviving rows (bounded, same shape as q_zipf), and the
    broadcast dict is K entries by construction. Encoding is a map-side
    hash-join of the positional token stream against that dict plus one
    groupBy(doc) that rebuilds sequences from (pos, id) pairs — order
    restored by sort_array on the struct, so the result is identical
    under any partitioning. IDs ride as a CSV string (driver-hashable;
    the array form is one split() away)."""
    K = 4096
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(K)
        .select(
            "token",
            # rank only the K surviving rows. The partition key is a
            # non-foldable constant ("" for every row — a literal would
            # be constant-folded out of the spec): the frame is bounded
            # at K by the limit, so the single partition is by design,
            # not an unpartitioned-window accident.
            F.row_number()
            .over(
                Window.partitionBy(F.substring("token", 1, 0)).orderBy(
                    F.desc("freq"), F.asc("token")
                )
            )
            .alias("token_id"),
        )
    )
    pos_tok = (
        docs.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos0", "token"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    )
    encoded = pos_tok.join(F.broadcast(vocab.select("token", "token_id")), "token")
    return encoded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("pos", "token_id"))
                ),
                lambda s: s["token_id"].cast("string"),
            ),
        ).alias("token_ids"),
    )


@demo_query(
    "q_mixture",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             len(string_split(lower(text), ' ')) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS hash_frac
      FROM documents
    ),
    totals AS (
      SELECT source, SUM(n_tokens) AS tokens_total FROM toks GROUP BY source
    ),
    budget AS (SELECT MIN(tokens_total) AS b FROM totals),
    rates AS (
      SELECT source, tokens_total,
             CAST(b AS DOUBLE) / tokens_total AS rate
      FROM totals, budget
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(r.tokens_total AS BIGINT) AS tokens_total,
           ROUND(r.rate, 6) AS rate,
           CAST(COUNT(*) FILTER (WHERE t.hash_frac < r.rate) AS BIGINT) AS docs_kept,
           CAST(SUM(n_tokens) FILTER (WHERE t.hash_frac < r.rate) AS BIGINT)
             AS tokens_kept
    FROM toks t JOIN rates r USING (source)
    GROUP BY t.source, r.tokens_total, r.rate
    """,
)
def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: equalize each source's token budget to the smallest
    source's total (uniform mixture) by computing per-source sampling
    rates and applying them with a deterministic hash fraction — the
    pretraining-mix step that follows corpus prep.

    The per-source totals are a 1-row-per-source aggregate; the budget is
    a 1-row broadcast; the keep/drop decision is a map-side predicate
    (md5-fraction < rate) identical on any engine, run, or partitioning —
    a reshuffle never changes which documents survive. Two shuffles
    total, both on the bounded source key.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            / F.lit(4294967296.0)
        ).alias("hash_frac"),
    )
    totals = toks.groupBy("source").agg(
        F.sum("n_tokens").alias("tokens_total")
    )
    budget = totals.agg(F.min("tokens_total").alias("b"))
    rates = totals.crossJoin(F.broadcast(budget)).select(
        "source",
        "tokens_total",
        (F.col("b").cast("double") / F.col("tokens_total")).alias("rate"),
    )
    joined = toks.join(F.broadcast(rates), "source")
    kept = F.col("hash_frac") < F.col("rate")
    return joined.groupBy("source", "tokens_total", "rate").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(kept).alias("docs_kept"),
        F.sum(F.when(kept, F.col("n_tokens"))).cast("bigint").alias("tokens_kept"),
    ).select(
        "source",
        "n_docs",
        F.col("tokens_total").cast("bigint").alias("tokens_total"),
        F.round("rate", 6).alias("rate"),
        "docs_kept",
        "tokens_kept",
    )


_BPE_TOPK = 20


@demo_query(
    "q_bpe_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    pairs AS (
      SELECT w[i] || ' ' || w[i+1] AS pair
      FROM (SELECT doc_id, w,
                   unnest(CASE WHEN len(w) >= 2
                               THEN generate_series(1, len(w)-1)
                               ELSE [] END) AS i
            FROM toks)
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT {_BPE_TOPK}
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-pair frequency ranking — the inner loop of BPE tokenizer
    training (count adjacent-symbol pairs corpus-wide, merge the top
    pair, repeat). One iteration as a query: the top-20 adjacent token
    pairs by exact occurrence count, deterministic pair tie-break.

    Scale shape: pair generation is a map-side transform over the token
    array (no shuffle); the count is one partial+final aggregation
    keyed on the pair string; the top-k compiles to
    TakeOrderedAndProject. At 100 TB this is exactly the counting job a
    distributed BPE trainer runs per merge round — the merge-apply step
    between rounds is q_vocab_encode's broadcast-dictionary shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("w"))
    # sequence(0, -1) is NOT empty in Spark (step defaults to -1 when
    # start > stop, yielding [0, -1]), so a 1-token doc must hit the
    # explicit empty-array branch — under ANSI mode w[-1+1=0]/w[-1]
    # would otherwise throw INVALID_ARRAY_INDEX at runtime.
    pairs = toks.select(
        F.explode_outer(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN "
                "transform(sequence(0, size(w)-2), "
                "i -> concat_ws(' ', w[i], w[i+1])) "
                "ELSE array() END"
            )
        ).alias("pair")
    ).filter(F.col("pair").isNotNull())
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(_BPE_TOPK)
    )

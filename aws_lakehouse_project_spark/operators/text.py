"""Text-analysis operators over ``documents`` (SURVEY.md §7.2 M6d):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All built-ins — split/regexp/aggregate expressions stay in
whole-stage codegen; group-level ratios are ratios of summed integers so
results are deterministic under any aggregation order (same discipline as
functions/money.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import demo_query

# shared heuristic vocabulary: high-frequency English function words.
# documents.text is synthetic word salad, so the heuristic's value here is
# determinism, not linguistic accuracy — the oracle applies the same rule.
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@demo_query(
    "q_text_quality",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t IN ({_STOP_SQL}))) AS n_stop,
             length(text) - length(replace(text, ' ', '')) AS n_spaces
      FROM documents WHERE source IN ('src0', 'src1')
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_stop AS BIGINT) AS n_stop,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
           ROUND(CAST(n_chars - n_spaces AS DOUBLE) / n_tokens, 6) AS avg_word_len
    FROM feat
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, stopword count/ratio,
    average word length (length/punct/stopword heuristics — the classic
    pretraining quality filters). Per-row arithmetic on identical inputs
    → oracle-exact doubles."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    toks = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_tokens = F.size(toks)
    # note: not array_intersect (it dedups); filter keeps multiplicity
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_spaces = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stop"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stop_ratio"),
        F.round(
            (F.col("n_chars") - n_spaces).cast("double") / n_tokens, 6
        ).alias("avg_word_len"),
    )


@demo_query(
    "q_token_count",
    oracle=f"""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
               AS re_tokens,
           ROUND(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*), 6)
               AS tokens_per_doc
    FROM documents
    GROUP BY lang, source
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting at corpus scale: whitespace tokens + regex tokens
    (the BPE-ish `[a-z0-9]+` word pattern) summed per (lang, source);
    tokens/doc as a ratio of summed integers (order-independent)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " ")).cast("long")
    re_toks = F.regexp_count(F.lower(F.col("text")), F.lit("[a-z0-9]+")).cast("long")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws).alias("ws_tokens"),
        F.sum(re_toks).alias("re_tokens"),
        F.round(F.sum(ws).cast("double") / F.count(F.lit(1)), 6).alias(
            "tokens_per_doc"
        ),
    )


_LANG_THRESHOLD = 0.08


@demo_query(
    "q_lang_id",
    oracle=f"""
    WITH feat AS (
      SELECT lang,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  t -> t IN ({_STOP_SQL}))) AS DOUBLE)
               / len(string_split(lower(text), ' ')) AS stop_ratio
      FROM documents
    )
    SELECT lang,
           CASE WHEN stop_ratio >= {_LANG_THRESHOLD} THEN 'en' ELSE 'other' END
             AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM feat
    GROUP BY 1, 2
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram heuristic: stopword-ratio classifier (English
    function-word density), reported as a (true lang × predicted)
    contingency. On real corpora the vocabulary per language drives this;
    the operator shape (per-doc feature → threshold → contingency
    aggregate) is the production one."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
        "double"
    ) / F.size(toks)
    predicted = F.when(ratio >= _LANG_THRESHOLD, "en").otherwise("other")
    return docs.select("lang", predicted.alias("predicted")).groupBy(
        "lang", "predicted"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


_TFIDF_ORACLE = """
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, source, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2, 3
    ),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.source, tf.term,
             SUM(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)) AS w
      FROM tf, n JOIN df ON tf.term = df.term
      GROUP BY 1, 2
    )
    SELECT source, term, ROUND(w, 6) AS tfidf
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY w DESC, term) <= 3
"""


@demo_query("q_tfidf", oracle=_TFIDF_ORACLE)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency × inverse document frequency, summed per
    (source, term), top-3 terms per source.

    Determinism: tf and df are integer counts, n_docs a constant —
    ln(n/df) and the weighted sum run on identical doubles in both
    engines. Sum order: weights are summed per (source, term) group from
    per-doc integer tf values — multiplication first keeps each addend
    identical, and the rounded output tolerates the remaining
    associativity at 1e-6.

    Scale notes: document frequency is NOT a join against a
    vocabulary-sized dimension (billions of distinct terms at web scale —
    a forced broadcast there OOMs executors, and even a shuffle join
    recomputes the whole tf subtree). Because doc_id is unique, df is
    simply the tf table's row count per term — one unbounded window over
    ``term``, whose partitioning the final (source, term) aggregation
    then reuses (term ⊆ (source, term) satisfies the clustered
    distribution): the corpus is scanned once and shuffled twice, total.
    n_docs rides the plan as a 1-row aggregate cross-joined in (the one
    justified broadcast hint), not a separate driver-side count() scan."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "source", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .join(F.broadcast(n_docs))  # 1 row; scalar-subquery shape
        .withColumn("w", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .groupBy("source", "term")
        .agg(F.sum("w").alias("w"))
    )
    win = Window.partitionBy("source").orderBy(F.col("w").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .select("source", "term", F.round("w", 6).alias("tfidf"))
    )


_FP_PRIME = 1_000_000_007


@demo_query(
    "q_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(lower(text), ' '),
                   t -> CAST(length(t) * 7 + ascii(substring(t, 1, 1)) AS BIGINT))),
               (acc, v) -> (acc * 31 + v) % {_FP_PRIME}) AS fp
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints,
           CAST(MIN(fp) AS BIGINT) AS min_fp,
           CAST(MAX(fp) AS BIGINT) AS max_fp
    FROM fp GROUP BY source
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: a portable rolling hash (Horner fold,
    base 31 mod 1e9+7) over per-token features, folded left-to-right with
    F.aggregate — identical arithmetic to the DuckDB list_reduce oracle.
    Fingerprint collisions per source approximate the dup profile without
    shuffling full text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    tok_feature = "CAST(length(t) * 7 + ascii(substring(t, 1, 1)) AS BIGINT)"
    fp = F.expr(
        "aggregate(transform(split(lower(text), ' '), "
        f"t -> {tok_feature}), CAST(0 AS BIGINT), "
        f"(acc, v) -> (acc * 31 + v) % {_FP_PRIME})"
    )
    return (
        docs.select("doc_id", "source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )


@demo_query(
    "q_corpus_prep",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, source, text,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t IN ({_STOP_SQL}))) AS n_stop
      FROM documents
    ), kept AS (
      SELECT doc_id, source, text, n_tokens
      FROM feat
      WHERE n_tokens >= 5
        AND CAST(n_stop AS DOUBLE) / n_tokens >= {_LANG_THRESHOLD}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(n_tokens AS BIGINT)) AS DOUBLE) / COUNT(*), 6)
             AS tokens_per_doc
    FROM kept GROUP BY source
    """,
)
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation in one declarative plan:
    language-ID gate (stopword-ratio >= threshold) → quality gate
    (minimum token count) → exact dedup keeping the lowest-id copy →
    per-source token accounting.

    The composition is the point: both filters are per-row expressions
    that run map-side BEFORE the dedup shuffle, so only quality-passing
    English docs ever move; the window dedup is the single content-keyed
    shuffle; the final per-source aggregation re-shuffles only survivor
    metadata (no text). At 100 TB, partition the dedup by xxhash64(text)
    and this plan holds unchanged.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    feat = docs.select(
        "doc_id",
        "source",
        "text",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stop"),
    )
    kept = feat.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("n_stop").cast("double") / F.col("n_tokens") >= _LANG_THRESHOLD)
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "n_tokens")
    )
    n = F.count(F.lit(1))
    tot = F.sum(F.col("n_tokens").cast("bigint"))
    return deduped.groupBy("source").agg(
        n.alias("n_docs"),
        tot.alias("total_tokens"),
        F.round(tot.cast("double") / n, 6).alias("tokens_per_doc"),
    )


_PACK_BUDGET = 2048


@demo_query(
    "q_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, n_tokens,
             CAST(FLOOR(
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                    - n_tokens AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT source, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY source, pack_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents, in deterministic doc_id order
    within each source shard, to consecutive fixed-token-budget packs
    (pack_id = the budget bucket the doc's cumulative token count starts
    in) — the standard pretraining step that turns ragged documents into
    uniform training sequences.

    One window shuffle keyed by source computes the running token count;
    the pack assignment is a per-row expression on top. At 100 TB the
    shard key is the natural partition (each source's packing is
    independent), so packs parallelize across shards with no global
    coordination.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    toks = docs.select("source", "doc_id", n_tokens.alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id")
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    pack_id = F.floor(start.cast("double") / _PACK_BUDGET).cast("bigint")
    return (
        toks.withColumn("pack_id", pack_id)
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
    )


@demo_query(
    "q_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents
    ),
    tok AS (
      SELECT doc_id, lang,
             unnest(CASE WHEN len(w) >= 3 THEN generate_series(1, len(w)-2)
                         ELSE [] END) AS i,
             w
      FROM toks
    ),
    sh AS (
      SELECT doc_id, lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM tok
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_sh, COUNT(DISTINCT shingle) AS d_sh
      FROM sh GROUP BY doc_id
    ),
    alldocs AS (
      SELECT d.lang, COALESCE(p.n_sh, 0) AS n_sh, COALESCE(p.d_sh, 0) AS d_sh
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS total_shingles,
           CAST(SUM(n_sh - d_sh) AS BIGINT) AS dup_shingles,
           CAST(COUNT(*) FILTER (WHERE n_sh > d_sh) AS BIGINT) AS docs_with_repeats,
           ROUND(CAST(SUM(n_sh - d_sh) AS DOUBLE) / SUM(n_sh), 6) AS dup_ratio
    FROM alldocs GROUP BY lang
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality filter (the Gopher-style duplicate-n-gram
    signal): per document, total vs distinct word-3-gram counts; per
    language, the corpus repetition profile.

    The per-doc counts are pure array expressions on the scan — total =
    size of the shingle index range, distinct = size(array_distinct(...))
    — so the only shuffle is the final per-language aggregation of five
    integers. dup_ratio is a ratio of summed integers (deterministic
    under any aggregation order).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower(F.col("text")), " ")
    # Only evaluated under the F.when(size>=3) guard below (CaseWhen is
    # lazy), so the unguarded bound is safe; sequence(0,-1) would be
    # [0,-1] in Spark and w[-1] throws under ANSI if ever unguarded.
    sh_expr = F.expr(
        "transform(sequence(0, size(w)-3), "
        "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
    )
    feat = docs.select(
        "lang",
        w.alias("w"),
    ).select(
        "lang",
        F.when(F.size("w") >= 3, F.size("w") - 2).otherwise(0).alias("n_sh"),
        F.when(F.size("w") >= 3, F.size(F.array_distinct(sh_expr)))
        .otherwise(0)
        .alias("d_sh"),
    )
    dup = F.col("n_sh") - F.col("d_sh")
    return feat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_sh").cast("bigint")).alias("total_shingles"),
        F.sum(dup.cast("bigint")).alias("dup_shingles"),
        F.count_if(dup > 0).alias("docs_with_repeats"),
        F.round(
            F.sum(dup.cast("bigint")).cast("double")
            / F.sum(F.col("n_sh").cast("bigint")),
            6,
        ).alias("dup_ratio"),
    )


@demo_query(
    "q_pii_scrub",
    oracle="""
    WITH scrub AS (
      SELECT event_type, props,
             len(regexp_extract_all(props, '[0-9]{2,}')) AS n_hits,
             regexp_replace(props, '[0-9]{2,}', '<NUM>', 'g') AS redacted
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           CAST(COUNT(*) FILTER (WHERE n_hits > 0) AS BIGINT) AS rows_with_hits,
           CAST(SUM(length(props)) AS BIGINT) AS chars_before,
           CAST(SUM(length(redacted)) AS BIGINT) AS chars_after
    FROM scrub GROUP BY event_type
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing over semi-structured logs: detect multi-digit
    runs in the events props JSON, redact them, and account for the
    redaction per event type (hit counts, affected rows, byte savings).

    The detect+redact is two regexp expressions evaluated map-side on the
    scan; only six integers per event type reach the aggregation — the
    shape of a compliance scrub over petabytes of logs. (On the synthetic
    corpus the digit-run pattern stands in for SSN/phone patterns, which
    are plain alternations in the same expression slot.)
    """
    ev = load_table(spark, sf_dir, "events")
    pattern = "[0-9]{2,}"
    scrub = ev.select(
        "event_type",
        F.length("props").alias("len_before"),
        F.regexp_count("props", F.lit(pattern)).alias("n_hits"),
        F.length(F.regexp_replace("props", pattern, "<NUM>")).alias("len_after"),
    )
    return scrub.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("n_hits").cast("bigint")).alias("total_hits"),
        F.count_if(F.col("n_hits") > 0).alias("rows_with_hits"),
        F.sum(F.col("len_before").cast("bigint")).alias("chars_before"),
        F.sum(F.col("len_after").cast("bigint")).alias("chars_after"),
    )


@demo_query(
    "q_lang_mix",
    oracle="""
    WITH per_lang AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per_lang)
    SELECT lang, n_docs, n_tokens,
           CAST(ROUND(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS DOUBLE)
             AS token_share
    FROM per_lang, tot
    """,
)
def q_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language mixture: per-language doc/token counts and each
    language's share of total tokens — the report that drives mixture
    reweighting for a training run (cf. q_mixture, which SAMPLES to
    target weights; this MEASURES the as-is mix).

    One shuffle (groupBy lang, ~10s of groups after map-side combine);
    the total is a 1-row broadcast cross join, so the share division
    never reshuffles. Token counts are exact integers; the single
    int/int division is reproducible across engines."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    total = per_lang.agg(F.sum("n_tokens").alias("total_tokens"))
    return per_lang.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("total_tokens"), 6)
        .cast("double")
        .alias("token_share"),
    )


@demo_query(
    "q_length_histogram",
    oracle="""
    SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY 1
    """,
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram in fixed 100-char buckets — the
    length-distribution profile a corpus-prep pipeline checks before
    choosing truncation/packing thresholds.

    Bucketing is integer arithmetic on an already-materialized column,
    so the scan reads exactly one int column (ReadSchema pruning) and
    the aggregate is one partial+final pass over O(buckets) groups."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 100) * 100).cast("bigint")
    return docs.groupBy(bucket.alias("bucket_lo")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@demo_query(
    "q_lang_temperature",
    oracle="""
    WITH per_lang AS (
      SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per_lang),
    powed AS (
      SELECT lang, n_tokens,
             POW(CAST(n_tokens AS DOUBLE) / total, 0.7) AS p_alpha
      FROM per_lang, tot
    ),
    z AS (SELECT SUM(p_alpha) AS z FROM powed)
    SELECT lang, n_tokens,
           CAST(ROUND(p_alpha / z, 6) AS DOUBLE) AS sample_prob,
           CAST(ROUND((p_alpha / z) / (CAST(n_tokens AS DOUBLE)
                 / (SELECT total FROM tot)), 6) AS DOUBLE) AS upweight
    FROM powed, z
    """,
)
def q_lang_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual resampling (the alpha-weighting
    used for multilingual training mixtures, alpha=0.7): raise each
    language's token share to alpha, renormalize, and report both the
    sampling probability and the implied up/down-weight vs natural
    frequency — low-resource languages upweight, high-resource ones
    downweight.

    Two 1-row scalar reductions (total tokens, normalizer Z) both rejoin
    as broadcast cross joins over the ~10-row per-language frame; the
    only data-scale work is the one token-count aggregation. The pow/
    div chain runs on identical exact-integer inputs in both engines, so
    the rounded doubles compare bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens")
    )
    total = per_lang.agg(F.sum("n_tokens").alias("total"))
    powed = per_lang.crossJoin(F.broadcast(total)).withColumn(
        "p_alpha", F.pow(F.col("n_tokens").cast("double") / F.col("total"), 0.7)
    )
    z = powed.agg(F.sum("p_alpha").alias("z"))
    return powed.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_tokens",
        F.round(F.col("p_alpha") / F.col("z"), 6).cast("double").alias("sample_prob"),
        F.round(
            (F.col("p_alpha") / F.col("z"))
            / (F.col("n_tokens").cast("double") / F.col("total")),
            6,
        )
        .cast("double")
        .alias("upweight"),
    )


@demo_query(
    "q_token_entropy",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    cnt AS (
      SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, t
    ),
    tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM cnt GROUP BY source
    )
    SELECT cnt.source, n AS n_tokens, vocab AS vocab_size,
           ROUND(ln(CAST(n AS DOUBLE))
                 - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                   / CAST(n AS DOUBLE), 6) AS entropy_nats
    FROM cnt JOIN tot ON cnt.source = tot.source
    GROUP BY cnt.source, n, vocab
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution entropy per source — the corpus-diversity
    signal quality pipelines track (low entropy ⇒ templated or
    repetitive sources; pairs with q_repetition's within-doc signal).

    Computed from exact integer counts in closed form,
    H = ln(N) − (Σ c·ln c)/N, so the only float work is ~vocab-size
    ln/multiply terms, rounded to 6 decimals — the same ln-portability
    envelope q_tfidf established. Shape: one explode + two
    aggregations; the exchange carries (source, token) counts, never
    raw text."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("source", F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("source").agg(
        F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("vocab_size")
    )
    ent = cnt.join(tot, "source").groupBy(
        "source", "n_tokens", "vocab_size"
    ).agg(
        F.round(
            F.log(F.col("n_tokens").cast("double"))
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("entropy_nats")
    )
    return ent


@demo_query(
    "q_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    uni AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(ln(CAST(c AS DOUBLE) / n)) / COUNT(*), 6)
             AS avg_logprob
    FROM tok JOIN uni USING (t), n
    GROUP BY doc_id, n
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model log-probability per document — the
    perplexity-style quality filter (CCNet shape: score every document
    against a corpus LM, filter the tail). avg_logprob = Σ ln(c_t/N) /
    n_tokens from exact integer counts; documents full of rare tokens
    score low.

    Scale shape: the unigram table is an aggregation keyed by token
    (vocabulary-sized, shuffles counts not text); scoring joins tokens
    back to it — AQE broadcasts the vocab side when it fits, which a
    real-corpus unigram table (≈ millions of rows) does on any
    executor. The corpus total is a 1-row broadcast. Float work is one
    ln + one division per distinct (doc, token), summed per doc and
    rounded inside the q_tfidf-established envelope."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    n = uni.agg(F.sum("c").alias("n"))
    return (
        tok.join(uni, "t")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.log(F.col("c").cast("double") / F.col("n")))
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


_BM25_TERMS = ["spark", "table", "query"]  # deterministic demo query
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    # per-term score columns summed as one fixed expression — float
    # addition order is pinned on both engines (see q_bm25 docstring)
    per_term = []
    for i, t in enumerate(_BM25_TERMS):
        per_term.append(
            f"COALESCE(MAX(CASE WHEN t = '{t}' THEN"
            f" idf * tf * ({_BM25_K1} + 1)"
            f" / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
            f" END), 0.0) AS s{i}"
        )
    cols = ",\n             ".join(per_term)
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM tok WHERE t IN ({terms}) GROUP BY doc_id, t
    ),
    df AS (
      SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t
    ),
    scored AS (
      SELECT tf.doc_id, tf.t, tf.tf, dl.dl, stats.avgdl,
             ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1) AS idf
      FROM tf
      JOIN df USING (t), stats
      JOIN dl ON dl.doc_id = tf.doc_id
    ),
    pivoted AS (
      SELECT doc_id,
             {cols}
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, ROUND(s0 + s1 + s2, 6) AS bm25
    FROM pivoted WHERE s0 + s1 + s2 > 0
    """


@demo_query("q_bm25", oracle=_bm25_oracle())
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring for a fixed query over the corpus — the
    lexical-retrieval twin of the ANN queries (hybrid retrieval runs
    both and fuses). Okapi BM25 with k1=1.2, b=0.75: idf from exact
    document frequencies, per-term saturation from exact term
    frequencies and document lengths.

    Determinism: each query term's partial score lands in its own
    pivoted column (conditional aggregate) and the total is the FIXED
    expression s0+s1+s2 — float addition order is pinned on both
    engines, unlike a SUM over term rows whose order an engine may
    choose. ln/division stay in the q_tfidf-established envelope.

    Scale shape: tf is an aggregation keyed on (doc, term) over the
    query terms only (map-side filtered); df and corpus stats are
    metadata-sized broadcasts; no shuffle carries text."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("t").isin(_BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "t")
        .crossJoin(F.broadcast(stats))
        .join(dl, "doc_id")
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1),
        )
        .withColumn(
            "s",
            F.col("idf")
            * F.col("tf")
            * (_BM25_K1 + 1)
            / (
                F.col("tf")
                + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    pivoted = scored.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("t") == t, F.col("s"))), F.lit(0.0)
            ).alias(f"s{i}")
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    total = F.col("s0") + F.col("s1") + F.col("s2")
    return pivoted.filter(total > 0).select(
        "doc_id", F.round(total, 6).alias("bm25")
    )


_CHUNK_W = 32  # tokens per chunk
_CHUNK_STRIDE = 24  # 8-token overlap between adjacent chunks


@demo_query(
    "q_chunk_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w
      FROM documents WHERE source = 'src0'
    ),
    chunks AS (
      SELECT doc_id,
             CAST(i / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
             w[i + 1 : i + {_CHUNK_W}] AS c
      FROM (SELECT doc_id, w,
                   unnest(generate_series(0, len(w) - 1, {_CHUNK_STRIDE}))
                     AS i
            FROM toks)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(c) AS BIGINT) AS n_tokens,
           md5(array_to_string(c, ' ')) AS chunk_md5
    FROM chunks
    """,
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunk windows for retrieval indexing (the RAG
    chunking step): each document becomes ⌈len/stride⌉ windows of up to
    32 tokens starting every 24 tokens (8-token overlap keeps context
    across boundaries; the final window may be short). Every chunk's
    md5 hash-matches the SQL slicing twin, so the window arithmetic is
    value-verified chunk-for-chunk.

    All array built-ins (split → sequence → slice inside transform →
    posexplode) — no shuffle at all: chunking is a map-side 1→N
    expansion, the shape that feeds the embedding stage at any corpus
    size."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == "src0"
    )
    toks = docs.select("doc_id", F.split(F.lower("text"), " ").alias("w"))
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - 1, {_CHUNK_STRIDE}), "
                f"i -> slice(w, i + 1, {_CHUNK_W}))"
            )
        ).alias("chunk_idx", "c"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size("c").cast("bigint").alias("n_tokens"),
        F.md5(F.array_join("c", " ")).alias("chunk_md5"),
    )


_RRF_K = 60
_RRF_TOPK = 10


def _rrf_oracle() -> str:
    from .similarity import _TOPK_ORACLE

    return f"""
    WITH lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM ({_bm25_oracle()})
    ),
    sem AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r
      FROM ({_TOPK_ORACLE})
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / ({_RRF_K} + lex.r), 0.0)
                   + COALESCE(1.0 / ({_RRF_K} + sem.r), 0.0), 9) AS rrf
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id, rrf FROM fused
    ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOPK}
    """


@demo_query("q_hybrid_rrf", oracle=_rrf_oracle())
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval fusion: reciprocal-rank fusion (k=60) of the
    BM25 lexical ranking (q_bm25) and the cosine ANN ranking
    (q_similarity_topk; doc_id ≡ vec_id in the testdata) — the standard
    two-channel retrieval stack, fused without score calibration
    because RRF only consumes RANKS. Ranks are integers with doc-id
    tie-breaks and the fused score is a fixed two-term expression, so
    the top-k boundary is engine-exact.

    Scale shape: both channels end in k-row ranked lists (metadata-
    sized); the fusion join touches k+k rows regardless of corpus
    size."""
    from pyspark.sql import Window

    from ..catalog import load_table as _lt
    from .similarity import _QUERY_VEC_ID, brute_topk

    lex = q_bm25(spark, sf_dir).withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
    ).select("doc_id", F.col("r").alias("lex_r"))
    sem = brute_topk(_lt(spark, sf_dir, "embeddings"), _QUERY_VEC_ID).withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("cosine").desc(), "vec_id"))
    ).select(F.col("vec_id").alias("doc_id"), F.col("r").alias("sem_r"))
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("lex_r")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("sem_r")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(_RRF_TOPK)

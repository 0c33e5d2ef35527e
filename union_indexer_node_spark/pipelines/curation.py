"""Corpus-curation operators a pre-training data pipeline needs beyond
dedup/quality: repetition (boilerplate) detection, PII scrubbing,
domain-mixture weighting, and stratified sampling.

All pure column expressions / relational aggregations (no UDFs), all
deterministic and cross-engine oracle-checkable.

Scale notes (100 TB):
- repetition_stats shuffles (doc_id, bigram) rows once with map-side
  partial counts; everything else about it is per-row expressions.
- scrub_pii is fully map-side (regexp_replace / regexp_count).
- domain_mixture_weights aggregates to |sources| rows before the
  window; the global normalization touches only that tiny frame.
- stratified_sample is one hash-shuffle on the stratum key; the
  md5-order rank replaces rand() so any engine draws the same sample
  (reproducible pipelines beat true randomness for training-data work).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_hex, token_count, tokens

# RE2-safe (no lookarounds) so Java regex and DuckDB find identical
# matches; both are anchored to be greedy over the same character sets.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-token fraction and the
    fraction of all bigrams claimed by the single most frequent bigram.
    High values on either flag boilerplate / degenerate text.

    ONE shuffle total: documents are repartitioned by id BEFORE the
    bigram explode (narrow doc rows move, not exploded gram rows), and
    both aggregations — (doc, gram) counts and the per-doc max/sum —
    reuse that partitioning (hashpartitioning(id) satisfies the
    clustered distribution of any grouping that has id as a prefix).
    Docs with <2 tokens produce no bigrams (the gram list is explicitly
    guarded to empty — F.sequence(1, 0) would otherwise emit the
    DESCENDING [1, 0] and make element_at throw) and get ratio 0 via
    the left join + coalesce.
    """
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")).select(
        F.col(id_col),
        F.size(F.col("_toks")).alias("n_tokens"),
        F.size(F.array_distinct(F.col("_toks"))).alias("_n_distinct"),
        F.col("_toks"),
    )
    base = base.repartition(id_col)
    grams = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(F.col("_toks")) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(F.col("_toks")) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(F.col("_toks"), i),
                        F.element_at(F.col("_toks"), i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    top = (
        grams.groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("_top_cnt"), F.sum("c").alias("_total_g"))
    )
    dup_ratio = F.when(
        F.col("n_tokens") > 0,
        1 - F.col("_n_distinct").cast("double") / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    top_ratio = F.coalesce(
        F.col("_top_cnt").cast("double") / F.col("_total_g"), F.lit(0.0)
    )
    return (
        base.drop("_toks")
        .join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(dup_ratio, 6).alias("dup_token_ratio"),
            F.round(top_ratio, 6).alias("top_bigram_ratio"),
        )
    )


def scrub_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII redaction: replace emails/US-style phone numbers with typed
    placeholders and count what was removed. Map-side only; the scrubbed
    text ships alongside its content digest so audits can verify the
    rewrite without re-reading the original."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).alias("n_phones"),
        scrubbed.alias("scrubbed_text"),
        F.md5(scrubbed).alias("scrubbed_hash"),
    )


def domain_mixture_weights(
    df: DataFrame, group_col: str, text_col: str, *, alpha: float = 0.5
) -> DataFrame:
    """Per-domain sampling weights for mixture training: weight_s ∝
    (total tokens in s)^alpha, normalized to sum 1 (alpha<1 upweights
    small domains, the standard temperature-style mix). The corpus
    aggregates to |domains| rows before the normalization window."""
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("total_tokens"),
    )
    raw = F.pow(F.col("total_tokens").cast("double"), F.lit(alpha))
    w = Window.partitionBy()
    return per.select(
        group_col,
        "n_docs",
        "total_tokens",
        F.round(raw / F.sum(raw).over(w), 6).alias("mix_weight"),
    ).orderBy(group_col)


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, *, per_stratum: int = 20
) -> DataFrame:
    """Deterministic per-stratum sample: rank rows inside each stratum
    by md5 of their id (an engine-independent stand-in for rand()) and
    keep the first `per_stratum`. Same rows fall out of any engine, any
    run — reproducibility a training-data pipeline needs from its
    sampler.

    Scale: a hot stratum (one domain = half the corpus) would make a
    rank window partitioned by stratum alone a single multi-TB task.
    Two-level instead: rank within (stratum, md5-prefix shard) and keep
    each shard's top `per_stratum` — at most 256*per_stratum survivors
    per stratum, a bounded frame — then rank the survivors exactly.
    md5's lexicographic order equals (prefix, rest) order, so the
    survivor set provably contains the global per-stratum top and the
    final ranks equal the single-window ranks."""
    m = md5_hex(F.col(id_col))
    pre = Window.partitionBy(stratum_col, "_shard").orderBy("_md5", id_col)
    w = Window.partitionBy(stratum_col).orderBy("_md5", id_col)
    return (
        df.select(F.col(id_col), F.col(stratum_col))
        .withColumn("_md5", m)
        .withColumn("_shard", F.substring(F.col("_md5"), 1, 2))
        .withColumn("_pre_rank", F.row_number().over(pre))
        .filter(F.col("_pre_rank") <= per_stratum)
        .withColumn("draw_rank", F.row_number().over(w))
        .filter(F.col("draw_rank") <= per_stratum)
        .drop("_md5", "_shard", "_pre_rank")
    )


def adaptive_quality_gate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    *,
    p: float = 0.25,
) -> DataFrame:
    """Per-source adaptive quality gate (the per-domain-threshold
    curation rule): a single global cutoff over-prunes terse sources
    and under-prunes verbose ones, so the cutoff is the p-quantile of
    token count computed WITHIN each source. Returns every input row
    WITH A NON-NULL GROUP — rows whose ``group_col`` is NULL have no
    source to be thresholded against and are excluded (equi-join
    semantics; the semantic_dup_flags contract), callers re-attach
    them via a left join if needed. NULL ``text_col`` counts as 0
    tokens, so ``kept`` is always a real boolean. Output columns
    (n_tokens, thr, kept) let callers filter on ``kept`` or audit how
    much each source's gate removes.

    Scale: token counting is one map-side regexp scan (no array
    materialization, dedup.token_count); the per-group percentile is
    exact-interpolated to stay oracle-checkable — at 100 TB swap
    approx_percentile, same plan shape (the documented
    textstats.length_percentiles trade); the threshold table is
    |sources| rows and BROADCASTS back onto the corpus, so the corpus
    is scanned twice but shuffled never (the second scan's join key
    is broadcast-resident).
    """
    n_tok = F.coalesce(token_count(F.col(text_col)), F.lit(0))
    staged = df.select(
        F.col(id_col), F.col(group_col), n_tok.cast("long").alias("n_tokens")
    )
    thr = staged.groupBy(group_col).agg(
        F.round(F.percentile(F.col("n_tokens").cast("double"), F.lit(p)), 4).alias(
            "thr"
        )
    )
    return staged.join(F.broadcast(thr), group_col).select(
        F.col(id_col),
        F.col(group_col),
        "n_tokens",
        "thr",
        (F.col("n_tokens").cast("double") >= F.col("thr")).alias("kept"),
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile (the Deequ/expectations shape): one row per
    column with row count, NULL count, and exact distinct count — the
    completeness/cardinality report a pipeline gates ingest on.

    Type-agnostic on purpose: min/max/mean summaries are type- and
    format-dependent (timestamp→string casts differ per engine), while
    (n_rows, n_null, n_distinct) are exact integers for ANY column
    type, so the profile stays oracle-checkable and schema-stable.

    Scale: ONE aggregate pass. Multiple exact count(distinct)s in one
    aggregate make Catalyst plan a single Expand (one row per counted
    column per input row, all map-side partial-aggregated) — corpus
    scanned once, shuffled once at |cols| x partial-state width; the
    final unpivot (stack) is metadata over a one-row frame. For
    approximate profiles at extreme cardinality swap
    approx_count_distinct — same plan minus the Expand.
    """
    if not cols:
        raise ValueError("column_profile requires at least one column")
    # POSITIONAL internal aliases + escaped name literals: the column
    # name only ever appears as a quoted string constant, so names with
    # spaces/dots/quotes (legal in DataFrame schemas) profile fine.
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"_rows_{i}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"_null_{i}"
            ),
            F.count_distinct(F.col(c)).alias(f"_dist_{i}"),
        ]
    wide = df.agg(*aggs)
    lit = lambda c: "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    stack = ", ".join(
        f"{lit(c)}, _rows_{i}, _null_{i}, _dist_{i}"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column_name, n_rows, n_null, n_distinct)"
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Snapshot diff between two corpus versions — the audit every
    ingest cycle publishes before a training run re-cuts: per id,
    status ∈ {added, removed, changed, unchanged} by content digest.
    One full-outer join on the id with md5 digests compared (bytes
    moved ∝ 32B/doc — the exact_dedup digest discipline, never the
    text itself); deterministic in any engine.

    Returns (id, status, old_hash, new_hash); hashes NULL on the
    missing side. Downstream: `status != 'unchanged'` is the delta
    that feeds bm25_index_merge / update_minhash_index /
    merge_passage_counts — this operator produces the
    incremental-maintenance inputs the index-update family consumes.
    """
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("old_hash")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("new_hash")
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"), "old_hash", "new_hash")


def dedup_lines_within_doc(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Intra-document repeated-line removal — the C4 rule ("discard
    all but one of any three-sentence span occurring more than once"
    simplified to its per-line form, the variant most pipelines ship):
    within each document, keep only the FIRST occurrence of every
    line, where occurrence identity is the whitespace-trimmed line.
    The corpus-level passage/span operators (dedup.py) handle
    cross-document repetition; this is the within-page boilerplate
    cut (repeated nav rows, duplicated paragraphs from bad extraction).

    Byte-preserving by construction: surviving lines keep their
    original bytes (only identity is computed on the trimmed form) and
    re-join with the newline they were split on. Pure narrow HOFs —
    split, positional filter via array_position (first index), join —
    zero shuffle, zero UDF. NULL text normalizes to '' (the span-family
    entry contract).

    Returns (id, cleaned_text, n_lines, n_removed_lines).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col), F.split(t, "\n").alias("_ls")
    ).select(
        F.col(id_col),
        "_ls",
        F.transform(F.col("_ls"), lambda x: F.trim(x)).alias("_norm"),
    )
    kept = F.filter(
        F.col("_ls"),
        lambda x, i: F.array_position(
            F.col("_norm"), F.element_at(F.col("_norm"), i + 1)
        )
        == i + 1,
    )
    return base.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("cleaned_text"),
        F.size("_ls").cast("long").alias("n_lines"),
        (F.size("_ls") - F.size(kept)).cast("long").alias("n_removed_lines"),
    )


def remove_frequent_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_docs: int = 10,
) -> DataFrame:
    """CORPUS-WIDE frequent-line removal — the RefinedWeb/CCNet
    boilerplate cut that complements `dedup_lines_within_doc` (that one
    removes a page's OWN repeats; this one removes lines that appear
    across many DOCUMENTS — cookie banners, nav rows, subscribe
    prompts — from every page carrying them). Line identity is the
    whitespace-trimmed form; a line is boilerplate when at least
    ``min_docs`` DISTINCT documents contain it. Blank lines are never
    flagged (they would appear everywhere by construction and removing
    them would reflow every paragraph).

    ``min_docs`` is an absolute document count, not a fraction, on
    purpose: a fraction needs the corpus-size scalar and silently
    tightens as the corpus grows, while the boilerplate phenomenon is
    absolute ("this exact line is on 10k pages"). Callers wanting a
    fraction compute min_docs outside from the corpus count.

    Scale shape: explode lines once; collapse to DISTINCT (norm, doc)
    BEFORE counting (a page repeating its own nav row a hundred times
    contributes one vote — and the hot boilerplate line collapses
    map-side, the _digest_canonicals skew argument); the flagged set
    is only the frequent lines — tiny, broadcast into a left_anti on
    the exploded frame; reassembly groups by doc ordered by the
    original line index. Byte-preserving: kept lines keep their bytes
    and re-join with the newline they were split on; NULL text
    normalizes to '' (the span-family contract).

    Returns (id, cleaned_text, n_lines, n_removed_lines).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(t, "\n")).alias("_i", "_line"),
    ).withColumn("_norm", F.trim(F.col("_line")))
    flagged = (
        lines.filter(F.col("_norm") != "")
        .select("_norm", id_col)
        .distinct()
        .groupBy("_norm")
        .agg(F.count(F.lit(1)).alias("_dfreq"))
        .filter(F.col("_dfreq") >= min_docs)
        .select("_norm")
    )
    kept = lines.join(F.broadcast(flagged), "_norm", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_i"), F.col("_line")))
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    # a doc whose every line was boilerplate drops out of `rebuilt`;
    # the left join + coalesce keeps it with an empty cleaned_text
    return totals.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed_lines"),
    )


def keyword_tag(
    df: DataFrame,
    dictionary: DataFrame,
    text_col: str,
    id_col: str,
    *,
    tag_col: str = "tag",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Dictionary phrase tagging — FlashText/Aho–Corasick SEMANTICS
    (find every occurrence of every dictionary phrase in every
    document, word-boundary exact, case-folded) expressed as Spark
    relational algebra instead of an automaton: a PII term list, a
    topic taxonomy, or a blocklist applied to a pre-training corpus is
    exactly this operator.

    Design (the scale shape): phrases normalize through the shared
    ``tokens()`` contract; documents enumerate the n-grams of every
    DISTINCT phrase length in ONE corpus scan (one flatten-of-
    transforms projection + one explode — a per-length union would
    re-read and re-tokenize the corpus |lengths| times), and matching
    is a BROADCAST equi-join gram == normalized phrase — never a
    ``contains`` theta-join (that would be a BNLJ over corpus ×
    dictionary) and never a per-row loop over the dictionary (that
    re-scans every document |dict| times). Occurrences count
    OVERLAPPING matches ("batch batch batch" has two "batch batch"
    hits) because gram enumeration is exhaustive. One shuffle total:
    the final (doc, tag) aggregation.

    The distinct-lengths ``collect`` is dictionary METADATA (≤ max
    phrase token count rows), the same bounded-scalar class as the BPE
    merge table. Dictionaries too large to broadcast (>~100 MB of
    phrases) would switch the join hint, not the shape.

    Returns (id, tag, n_matches, first_pos) — 1-based token position
    of the earliest match; docs with no matches are absent (tag rows
    are facts, not a dense matrix).
    """
    d = dictionary.select(
        F.col(tag_col).alias("_tag"),
        tokens(F.coalesce(F.col(phrase_col), F.lit(""))).alias("_ptoks"),
    ).filter(F.size("_ptoks") >= 1)
    d = d.select(
        "_tag",
        F.array_join("_ptoks", " ").alias("_pnorm"),
        F.size("_ptoks").alias("_plen"),
        F.split("_pnorm", " ").getItem(0).alias("_p0"),
    )
    # (length, first-token) pairs — still dictionary metadata (≤ one
    # row per phrase). The first tokens feed the position prefilter
    # below (r15): a gram can only match a length-L phrase if its
    # FIRST token is some length-L phrase's first token, so positions
    # failing that membership test skip the L-token slice+join string
    # build entirely — the FlashText first-character transition, in
    # expression form. tokens() output is [a-z0-9]+ by construction,
    # so embedding them as SQL string literals needs no escaping.
    meta = d.select("_plen", "_p0").distinct().collect()
    starts_by_len: dict[int, list[str]] = {}
    for r in meta:
        starts_by_len.setdefault(r["_plen"], []).append(r["_p0"])
    lengths = sorted(starts_by_len)
    if not lengths:
        raise ValueError("keyword_tag: dictionary has no tokenizable phrases")
    toks = df.select(
        F.col(id_col),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    )
    # ALL lengths from one scan: a per-length union would re-read and
    # re-tokenize the corpus once per distinct length. Each arm guards
    # its positions with filter-over-sequence(1, size) rather than
    # sequence(1, size-L+1) because Spark's sequence DESCENDS when
    # stop < start ([1,0] for a too-short doc, inventing positions).
    def _starts_pred(length: int) -> str:
        toks0 = sorted(set(starts_by_len[length]))
        lits = ",".join(f"'{t}'" for t in toks0)
        return f" AND element_at(_toks, i) IN ({lits})"

    arms_sql = ", ".join(
        f"transform(filter(sequence(1, size(_toks)),"
        f" i -> i <= size(_toks) - {length} + 1{_starts_pred(length)}),"
        f" i -> struct(i AS pos,"
        f" array_join(slice(_toks, i, {length}), ' ') AS gram))"
        for length in lengths
    )
    grams = (
        toks.filter(F.size("_toks") >= min(lengths))
        .select(
            F.col(id_col),
            F.explode(F.expr(f"flatten(array({arms_sql}))")).alias("_g"),
        )
        .select(
            F.col(id_col),
            F.col("_g.pos").cast("long").alias("_pos"),
            F.col("_g.gram").alias("_gram"),
        )
    )
    # a gram of L tokens equals a normalized phrase only when the
    # phrase also has L tokens (space-joined identity), so the single
    # string key is a complete join condition across lengths
    matched = grams.join(
        F.broadcast(d), grams["_gram"] == d["_pnorm"], "inner"
    )
    return (
        matched.groupBy(F.col(id_col), F.col("_tag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("_pos").alias("first_pos"),
        )
        .select(
            F.col(id_col),
            F.col("_tag").alias(tag_col),
            "n_matches",
            "first_pos",
        )
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 2,
) -> DataFrame:
    """First-occurrence n-gram novelty scoring — for each document,
    the fraction of its DISTINCT token n-grams that no smaller-id
    document contains (ids are the corpus's ingest order, so this is
    "how much of this page is new text"). The data-selection
    literature uses exactly this signal to down-weight near-template
    pages that per-document quality scores miss: a page can be fluent,
    long, and 95 % previously-seen.

    Distinct from the dedup family: near-dup operators DECIDE
    (keep/drop on a threshold); novelty SCORES every document on a
    continuous scale, feeding sampling weights. Complements
    ``training_contamination_report`` (overlap vs a benchmark set —
    this is overlap vs the corpus's own past).

    Scale shape: within-doc gram dedup is a map-side
    ``array_distinct`` (zero shuffle — the hot boilerplate gram
    collapses before it ever moves); the first-seer per gram is a
    map-side-combining groupBy MIN, deliberately NOT a window MIN over
    the gram partition: the window form saves one exchange (measured —
    Catalyst does not reuse the gram exchange across the agg and join
    branches) but serializes a hot gram's every row through one task,
    while the groupBy partially aggregates map-side and the rejoin
    streams. Skew safety is worth one exchange of (doc, gram) rows at
    corpus scale. Integer permille output so every engine agrees
    exactly.

    Returns (id, n_grams, n_novel, novelty_permille); docs with fewer
    than ``n`` tokens have no grams and are absent.
    """
    toks = df.select(
        F.col(id_col),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    ).filter(F.size("_toks") >= n)
    grams = toks.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(_toks) - {n} + 1),"
                    f" i -> array_join(slice(_toks, i, {n}), ' '))"
                )
            )
        ).alias("_gram"),
    )
    firsts = grams.groupBy("_gram").agg(F.min(F.col(id_col)).alias("_first"))
    return (
        grams.join(firsts, "_gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("_first") == F.col(id_col), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_permille", F.expr("(1000 * n_novel) div n_grams")
        )
    )


# (?i): tracking params arrive in any case ('UTM_Source=', 'Fbclid=');
# (=|$): a valueless 'fbclid' (no '=') is still a tracking param. Both
# were survivable before (ADVICE r13); the name-boundary alternation
# keeps 'refresh=1' / 'reference=x' untouched ('ref' must be followed
# by '=' or end-of-param, never a letter).
_TRACKING_PARAM_RE = (
    r"(?i)^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref|ref_src)(=|$)"
)


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for identity comparison — the CommonCrawl-
    style key under exact URL dedup and frontier dedup: lowercase
    scheme and host, strip a leading ``www.``, drop the scheme's
    default port (:80 http / :443 https) but keep explicit non-default
    ports, strip trailing slashes from the path, drop tracking
    parameters (utm_*, fbclid, gclid, msclkid, ref, ref_src —
    case-insensitively, with or without a '=value') while preserving
    the order of the rest, and drop the fragment.

    Pure map-side expression built from regexp_extract/replace and a
    higher-order filter over the split query string — no UDF, stays
    inside whole-stage codegen, and every piece has an exact DuckDB
    equivalent so dedup built on it is oracle-checkable.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1
    )
    host = F.regexp_replace(
        F.lower(F.substring_index(hostport, ":", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_replace(
        F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1
        ),
        r"/+$",
        "",
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(_TRACKING_PARAM_RE),
    )
    qs = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    # non-absolute inputs (mailto:, javascript:, relative paths,
    # scheme-less hosts) pass through AS THEMSELVES: canonicalizing
    # them would collapse every unparseable URL onto the shared
    # degenerate '://...' key and url_dedup would then merge unrelated
    # documents (review r13); NULL is no better — NULL keys group
    # together under groupBy. Identity keeps distinct inputs distinct.
    # the guard also demands a NON-EMPTY authority: 'file:///etc/a'
    # matches 'scheme://' but its hostport extraction is empty, so the
    # canon branch would fold every empty-authority URL onto the bare
    # 'scheme://' key — the same collapse, one level down (review r13)
    return F.when(
        url.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]"), canon
    ).otherwise(url)


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Exact URL dedup on the canonical form: one row per canonical
    URL with the smallest id as the keeper and the duplicate count.
    One map-side canonicalization + one partially-aggregated groupBy —
    shuffle bytes ∝ distinct canonical URLs, never pages; the id-min
    keeper rule needs no window and no secondary sort."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("canonical_url")
        .agg(
            F.min("_id").alias("keeper_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit (column_profile's relational
    sibling): for each named (child, fk) -> (parent, pk) relation,
    count child rows, NULL foreign keys, and ORPHANS (non-NULL fk with
    no matching parent) — the join-health report a pipeline gates
    ingest on before a silent left join turns orphans into NULLs
    downstream.

    ``relations`` is a list of (name, child_df, fk_col, parent_df,
    pk_col). Each relation is ONE pass: a left join against the
    DISTINCT parent keys (deduped, so a duplicated parent key can
    never double-count a child — the bug a naive join-count commits)
    feeds a single aggregate computing all three counts at once —
    one child scan, shuffle bytes ∝ child keys + distinct parent
    keys, never parent rows. A NULL fk joins nothing and is counted
    from its own indicator, never as an orphan.
    """
    if not relations:
        raise ValueError("referential_audit requires at least one relation")
    out = None
    for name, child, fk, parent, pk in relations:
        # the join key is prefix-tagged and NULL fks are SALTED by
        # partition id: a raw left join would hash every NULL fk to
        # one reducer — and a 50%-null fk column is exactly the dirty
        # data this audit exists to find. The salt changes only
        # placement, never a match (parent keys all carry the 'v:'
        # prefix). Keys must be same-typed on both sides (string-cast
        # equality).
        jk = F.when(
            F.col("_fk").isNull(),
            F.concat(F.lit("n:"), F.spark_partition_id().cast("string")),
        ).otherwise(F.concat(F.lit("v:"), F.col("_fk").cast("string")))
        keys = child.select(F.col(fk).alias("_fk")).withColumn("_jk", jk)
        pkeys = (
            parent.select(
                F.concat(
                    F.lit("v:"), F.col(pk).cast("string")
                ).alias("_jk")
            )
            .where(F.col("_jk").isNotNull())
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        row = (
            keys.join(pkeys, "_jk", "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                # coalesce: SUM over an EMPTY child is NULL, and a
                # downstream n_orphans == 0 gate must not see NULL
                # for a clean empty batch (review r13)
                F.coalesce(
                    F.sum(F.when(F.col("_fk").isNull(), 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_null_fk"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("_fk").isNotNull()
                            & F.col("_hit").isNull(),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("relation"),
                "n_rows",
                "n_null_fk",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def source_scorecard(
    df: DataFrame, text_col: str, id_col: str, source_col: str
) -> DataFrame:
    """Per-source corpus scorecard — the one-page report an ingest
    gate or a data lead reads before admitting a crawl slice: doc
    count, exact-duplicate rate, mean token entropy (template spam
    scores near zero), short-doc rate, and mean length. Every column
    is integer permille/count arithmetic so the report is
    reproducible on any engine and any partitioning.

    Two passes over the slice (the entropy fold needs the tokenized
    explode; the digest/length stats are one map-side aggregate) and
    one |sources|-row join — the source column RIDES the entropy
    aggregation keys (token_entropy's carry_cols), so no |docs|-row
    join re-attaches it. Composes token_entropy; duplicate rate
    counts distinct text digests, the exact_dedup identity.
    """
    from .textstats import token_entropy

    base = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct(F.md5(F.col(text_col))).cast("long").alias("_nd"),
        F.sum(
            F.when(F.length(text_col) < 100, 1).otherwise(0)
        ).cast("long").alias("_short"),
        F.sum(F.length(text_col)).cast("long").alias("_chars"),
    )
    ent = (
        token_entropy(df, text_col, id_col, carry_cols=(source_col,))
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.sum("entropy_permille").cast("long").alias("_se"),
            F.count(F.lit(1)).cast("long").alias("_ne"),
        )
    )
    return (
        base.join(ent, "source", "left")
        .select(
            "source",
            "n_docs",
            F.expr("(1000 * (n_docs - _nd)) div n_docs").alias(
                "dup_permille"
            ),
            F.expr(
                "coalesce(_se div _ne, 0)"
            ).cast("long").alias("mean_entropy_permille"),
            F.expr("(1000 * _short) div n_docs").alias("short_permille"),
            F.expr("_chars div n_docs").alias("mean_chars"),
        )
    )

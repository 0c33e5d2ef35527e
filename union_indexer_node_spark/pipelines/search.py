"""Full-text search (SURVEY X21): token index build + query rewrite.

The reference uses a MongoDB text index over post bodies
(services/db.ts:61-63) but sorts results by recency, never by text
score (resolvers/index.ts:210-213) — so token-match + recency-sort
reproduces all observable behavior. Stemming is NOT replicated
(documented divergence; Mongo's stemmer is engine-internal).

Two physical strategies:
- v1 (operators/feeds.search_feed): scan + token-AND filter. Fine when
  the scan is already pruned (date partitions, pushed predicates).
- v2 (here): an inverted-index table (token -> posting list rows),
  built once per batch cycle; a query becomes per-term semi-joins on
  the posting table — at 100 TB this touches only the posting-list
  partitions for the query terms (the table is written partitioned or
  bucketed by token), not the corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def build_inverted_index(
    df: DataFrame, text_col: str, key_cols: list[str]
) -> DataFrame:
    """Posting rows (token, *key). distinct() collapses repeated tokens
    within a document map-side before the shuffle."""
    return (
        df.select(*key_cols, tokens(F.col(text_col)).alias("_toks"))
        .select(*key_cols, F.explode("_toks").alias("token"))
        .distinct()
    )


def update_inverted_index(
    index: DataFrame, changed_docs: DataFrame, text_col: str, key_cols: list[str]
) -> DataFrame:
    """Incremental posting-list maintenance (F12/T6 applied to X21):
    drop every posting of a changed/deleted key (anti-join on the key)
    and append the fresh postings — O(changed docs) work per cycle, not
    an O(corpus) rebuild. Pass the changed docs with their NEW text
    (deleted docs: include the key with empty text). With the posting
    table bucketed by token, the anti-join prunes to the touched
    buckets and the append preserves layout."""
    fresh = build_inverted_index(changed_docs, text_col, key_cols)
    kept = index.join(
        changed_docs.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    return kept.unionByName(fresh)


def search_by_index(
    index: DataFrame,
    corpus: DataFrame,
    terms: list[str],
    key_cols: list[str],
    *,
    any_term: bool = False,
) -> DataFrame:
    """Posting-list query, then a semi-join against the corpus. Default
    is token-AND (posting-list intersection — the SURVEY §2.8/§5
    documented divergence from Mongo's $text, which ORs space-delimited
    terms); ``any_term=True`` gives Mongo-exact OR matching as ONE
    pushed-down `token IN (...)` scan over the posting table. Either
    way each access is an equality/IN filter on the
    (bucketed/partitioned) token column. Terms are re-tokenized with
    the index's own tokenizer so a punctuated query ('spark-sql')
    matches as its word tokens — the index can never hold a token
    containing punctuation."""
    from ..operators.feeds import query_tokens

    terms = [t for raw in terms for t in query_tokens(raw)]
    if not terms:
        return corpus
    if any_term:
        matched = index.filter(F.col("token").isin(terms)).select(*key_cols)
    else:
        postings = [
            index.filter(F.col("token") == t).select(*key_cols) for t in terms
        ]
        matched = reduce(lambda a, b: a.join(b, key_cols, "inner"), postings)
    return corpus.join(matched.distinct(), key_cols, "left_semi")


def build_trigram_index(
    df: DataFrame, text_col: str, key_cols: list[str]
) -> DataFrame:
    """Character-trigram posting table for SUBSTRING search (the
    pg_trgm strategy): a `LIKE '%pat%'` / contains() predicate cannot
    use the token index above — the pattern may start or end mid-word
    or span a word boundary — but every occurrence of a >=3-char
    pattern implies every one of the pattern's character trigrams
    occurs, so an AND-intersection over a trigram posting table prunes
    the corpus to verifiable candidates. Grams slide over the RAW
    lowercased text (spaces included — cross-word patterns stay
    indexable). distinct() collapses repeats within a doc map-side
    before the shuffle. This BUILDS the posting frame; to amortize
    across queries, persist it partitioned/bucketed by gram (the same
    deployment note as the token index above) — the callers in this
    repo rebuild it inline, paying the one-time cost per run.

    The char-array + element-concat build avoids the documented
    O(len²) substring(_lt, i, 3) dead end (SCALE.md / char_lm)."""
    grams = F.expr(
        "CASE WHEN char_length(_lt) >= 3 "
        "THEN transform(sequence(1, char_length(_lt) - 2), "
        "i -> concat(_ch[i - 1], _ch[i], _ch[i + 1])) "
        "ELSE CAST(array() AS array<string>) END"
    )
    return (
        df.select(*key_cols, F.lower(F.col(text_col)).alias("_lt"))
        .withColumn("_ch", F.split(F.col("_lt"), ""))
        .select(*key_cols, F.explode(grams).alias("gram"))
        .distinct()
    )


def search_substring(
    index: DataFrame,
    corpus: DataFrame,
    pattern: str,
    text_col: str,
    key_cols: list[str],
) -> DataFrame:
    """Substring search through the trigram posting table: AND-join the
    pattern's trigrams (each an equality/IN filter on the gram column —
    partition-pruned to those grams WHEN the posting table is persisted
    partitioned/bucketed by gram; a plain filter over the in-memory
    frame otherwise), then VERIFY with contains() on the candidate rows
    only, so trigram co-occurrence false positives ('ab ra' matching
    'abra') never escape. Patterns shorter than 3 chars have no trigram
    and fall back to the verify scan alone. Case-insensitive, matching
    the index build."""
    pat = pattern.lower()
    grams = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    verified = F.contains(F.lower(F.col(text_col)), F.lit(pat))
    if not grams:
        return corpus.filter(verified)
    cand = (
        index.filter(F.col("gram").isin(grams))
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_ng"))
        .filter(F.col("_ng") == len(grams))
        .select(*key_cols)
    )
    return corpus.join(cand, key_cols, "left_semi").filter(verified)

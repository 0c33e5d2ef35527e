"""Round-8 regression tests: the semantic-dedup hot-bucket cap (the one
uncapped candidate generator flagged in VERDICT r7), the community
updateProps dispatch arm, the spk.bridge_id needs_stream_id flag-setter,
and the serving facade over real pipeline-produced tables."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR


def _hot_corpus(spark):
    """12 identical vectors (one hot (cluster, band, bv) bucket in every
    band) + one isolated near-dup pair pointing a different way. The
    identical block is the boilerplate-cluster hazard the cap guards."""
    dim = 8
    hot = [(i, [1.0] + [0.0] * (dim - 1)) for i in range(12)]
    pair = [
        (100, [0.0, 1.0] + [0.0] * (dim - 2)),
        (101, [0.0, 1.0, 0.001] + [0.0] * (dim - 3)),
    ]
    return spark.createDataFrame(
        hot + pair, "vec_id long, embedding array<double>"
    )


def _planes(dim=8, n=8):
    """Hand-built planes that provably separate the two vector
    directions: dot(hot, p) = 1 > 0 (bit set), dot(pair, p) < 0 (bit
    clear) — so the hot block sits in (bv=15, bv=15) and the pair in
    (bv=0, bv=0), never sharing a bucket regardless of clustering."""
    return [[1.0, -1.0] + [0.0] * (dim - 2)] * n


def test_semantic_bucket_cap_drops_hot_bucket(spark):
    """With bucket_cap below the hot bucket's size, none of its members
    may generate candidates (no flags), while the small-bucket near-dup
    pair still verifies and flags — the cap is a targeted recall trade,
    not a global off-switch."""
    from union_indexer_node_spark.pipelines.similarity import semantic_dup_flags

    df = _hot_corpus(spark)
    flags = {
        r.vec_id: r.is_semantic_dup
        for r in semantic_dup_flags(
            df, _planes(), k=2, iters=1, threshold=0.35, bucket_cap=5
        ).collect()
    }
    assert len(flags) == 14
    for i in range(12):
        assert flags[i] is False, i  # hot bucket dropped by the cap
    assert flags[100] is False  # canonical of the surviving pair
    assert flags[101] is True  # its near-dup still flags


def test_semantic_bucket_cap_none_keeps_all(spark):
    """cap=None restores the uncapped behavior: every identical vector
    except the lowest id flags."""
    from union_indexer_node_spark.pipelines.similarity import semantic_dup_flags

    df = _hot_corpus(spark)
    flags = {
        r.vec_id: r.is_semantic_dup
        for r in semantic_dup_flags(
            df, _planes(), k=2, iters=1, threshold=0.35, bucket_cap=None
        ).collect()
    }
    assert flags[0] is False
    for i in range(1, 12):
        assert flags[i] is True, i
    assert flags[101] is True


def test_semantic_bucket_stats_reports_dropped_mass(spark):
    """The audit histogram must expose the hot bucket so a pipeline can
    log the pair mass a cap drops before choosing it."""
    from union_indexer_node_spark.pipelines.similarity import (
        semantic_bucket_stats,
    )

    df = _hot_corpus(spark)
    stats = semantic_bucket_stats(df, _planes(), k=2, iters=1).collect()
    # every band has one 12-member bucket (identical vectors share all
    # bands) and the pair's 2-member buckets
    sizes = sorted(r.n_members for r in stats)
    assert sizes.count(12) == 2  # one hot bucket per band
    over_cap_pairs = sum(
        n * (n - 1) // 2 for n in sizes if n > 5
    )
    assert over_cap_pairs == 2 * (12 * 11 // 2)


def test_language_consistency_flags_code_switching(spark):
    """A half-English half-Spanish doc must get consistency 0.5 while
    pure-language docs get 1.0 and empty docs carry (0, 'und', 0.0) —
    the mixed-language signal a whole-doc langid misses."""
    from union_indexer_node_spark.pipelines.textstats import (
        language_consistency,
    )

    en = "the and of to a in is the and of"  # exactly one 10-token chunk
    es = "el la de que y en un el la de"
    rows = [
        (1, en + " " + es),  # chunk 1 en, chunk 2 es
        (2, en),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in language_consistency(
            df, "text", "doc_id", chunk_tokens=10
        ).collect()
    }
    r1 = out[1]
    assert r1.n_chunks == 2 and r1.consistency == 0.5
    assert r1.majority_lang == "en"  # tie on count -> smaller lang wins
    assert out[2].majority_lang == "en" and out[2].consistency == 1.0
    assert out[3].n_chunks == 0 and out[3].majority_lang == "und"
    assert out[3].consistency == 0.0


def _media_frame(spark):
    rows = [
        (1, b"\x01\x02\x03payload-one", "image/png"),
        (2, b"another-blob-entirely", "image/jpeg"),
        (3, None, "image/gif"),  # NULL blob must not fail the task
    ]
    return spark.createDataFrame(rows, "id long, content binary, mime string")


def test_resize_media_fake_kernel_plumbing(spark):
    """resize_media: schema, determinism, NULL pass-through, and the
    explicit codec boundary (real kernel raises in this Pillow-less
    container)."""
    import hashlib

    from union_indexer_node_spark.pipelines.multimodal import resize_media

    df = _media_frame(spark)
    out = {
        r.id: r
        for r in resize_media(
            df, width=32, height=16, use_fake_kernel=True
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    r1 = out[1]
    assert (r1.width, r1.height, r1.mime) == (32, 16, "image/png")
    expected = hashlib.md5(b"\x01\x02\x03payload-one").digest() + b"32x16"
    assert bytes(r1.content) == expected
    assert bytes(out[3].content) == b""  # NULL blob -> empty output
    # repeated run is byte-identical (deterministic kernel)
    again = {
        r.id: bytes(r.content)
        for r in resize_media(
            df, width=32, height=16, use_fake_kernel=True
        ).collect()
    }
    assert again == {i: bytes(r.content) for i, r in out.items()}
    # the real kernel is a missing-codec configuration error here
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        resize_media(df, width=8, height=8).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_extract_media_features_feeds_similarity(spark):
    """extract_media_features: deterministic sha-derived embedding,
    NULL-blob -> NULL embedding, and the output frame plugs straight
    into the similarity layer (quantize_int8 over it works and excludes
    the NULL row via its documented contract)."""
    import hashlib

    from union_indexer_node_spark.pipelines.multimodal import (
        extract_media_features,
    )
    from union_indexer_node_spark.pipelines.similarity import quantize_int8

    df = _media_frame(spark)
    feats = extract_media_features(df, dim=8, use_fake_kernel=True)
    rows = {r.id: r.embedding for r in feats.collect()}
    digest = hashlib.sha256(b"\x01\x02\x03payload-one").digest()
    expected = [round(x / 255.0, 6) for x in digest[:8]]
    # schema is array<float> (float32): compare at that precision
    assert rows[1] == pytest.approx(expected, abs=1e-6)
    assert rows[3] is None
    q = quantize_int8(
        feats.filter(F.col("embedding").isNotNull()),
        vec_col="embedding",
        id_col="id",
    )
    qr = {r.id: r for r in q.collect()}
    assert set(qr) == {1, 2}
    assert all(len(r.q_vec) == 8 for r in qr.values())


def test_shared_passages_match_python_oracle(spark):
    """Hypothesis property: shared_passage_stats equals an independent
    pure-Python fold (tokenize -> windows at the stride -> per-window
    share test across distinct docs) over random small corpora drawn
    from a tiny vocabulary so windows actually collide."""
    import re as _re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.pipelines.dedup import shared_passage_stats

    W, S = 3, 2
    vocab = ["aa", "bb", "cc"]

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        docs = data.draw(
            st.lists(
                st.lists(st.sampled_from(vocab), min_size=0, max_size=9).map(
                    " ".join
                ),
                min_size=1,
                max_size=8,
            )
        )
        rows = list(enumerate(docs))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_windows, r.n_shared_windows, r.has_shared_passage)
            for r in shared_passage_stats(
                df, "text", "doc_id", window_tokens=W, stride=S
            ).collect()
        }

        def windows(text):
            toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
            if len(toks) < W:
                return []
            return [
                " ".join(toks[s : s + W])
                for s in range(0, len(toks) - W + 1, S)
            ]

        wins = {i: windows(t) for i, t in rows}
        owners = {}
        for i, ws in wins.items():
            for w in ws:
                owners.setdefault(w, set()).add(i)
        expected = {
            i: (
                len(ws),
                sum(1 for w in ws if len(owners[w]) > 1),
                any(len(owners[w]) > 1 for w in ws),
            )
            for i, ws in wins.items()
        }
        assert got == expected

    check()


def test_community_merge_permutation_invariance(spark):
    """build_communities is a deterministic function of the op SET —
    replaying account_update2 + updateProps ops in any row order and
    partitioning must yield the identical communities table (the same
    guarantee test_ingest pins for posts/follows)."""
    import random

    from test_ingest import OPS_SCHEMA
    from test_sources_streaming import _account_update, _update_props

    from union_indexer_node_spark.ingest.profiles import build_communities

    rows = [
        _update_props(1, "hive-1", "t1", "a1"),
        _account_update(2, "hive-1", {"name": "au1", "about": "x",
                                      "profile_image": "i1"}),
        _update_props(3, "hive-1", "t3", "a3"),
        _account_update(4, "hive-2", {"name": "au2", "about": "y"}),
        _update_props(5, "hive-2", "t5", "a5"),
        _update_props(6, "hive-3", "t6", "a6"),
    ]

    def canon(df):
        return sorted(map(tuple, df.fillna("").collect()))

    base = canon(build_communities(spark.createDataFrame(rows, OPS_SCHEMA)))
    for seed in (1, 7):
        shuffled = rows[:]
        random.Random(seed).shuffle(shuffled)
        odf = spark.createDataFrame(shuffled, OPS_SCHEMA).repartition(
            3, "block_height"
        )
        assert canon(build_communities(odf)) == base, seed


def test_bridge_flags_plan_broadcasts(spark):
    """Scale pin: apply_bridge_id_flags must BROADCAST the (distinct)
    bridge key set — the posts table is never shuffled for the flag
    merge."""
    from union_indexer_node_spark import queries as q

    df = q.registry()["offchain_id_refresh"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_shared_passage_stats(spark):
    """Passage-level dedup: two long docs sharing one exact 8-token
    passage must both flag (the doc-level-Jaccard blind spot), docs
    with unique text must not, and sub-window docs carry zeros."""
    from union_indexer_node_spark.pipelines.dedup import shared_passage_stats

    passage = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "alpha beta gamma delta " + passage + " one two three four"),
        (2, "totally different opening words here " + passage),
        (3, "no overlap with anything else at all in this document text"),
        (4, "short doc"),  # under one window: zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in shared_passage_stats(
            df, "text", "doc_id", window_tokens=8, stride=1
        ).collect()
    }
    assert len(out) == 4
    assert out[1].has_shared_passage and out[1].n_shared_windows > 0
    assert out[2].has_shared_passage
    assert not out[3].has_shared_passage and out[3].n_shared_windows == 0
    assert out[4].n_windows == 0 and not out[4].has_shared_passage


def test_serving_e2e_on_pipeline_tables(spark):
    """VERDICT r7 #8: the HTTP/GraphQL facade must work on tables the
    INGEST PIPELINES produced (build_posts / build_profiles /
    build_follows schemas), not just hand-built fixture frames — one
    real HTTP round trip each for socialFeed, profile and follows over
    ops derived from the sf0.001 events table."""
    pytest.importorskip("graphql")
    import json as _json
    import threading
    import urllib.request

    from test_ingest import OPS_SCHEMA, comment, follow_op
    from test_sources_streaming import _account_update

    from union_indexer_node_spark import tables
    from union_indexer_node_spark.ingest.posts import build_follows, build_posts
    from union_indexer_node_spark.ingest.profiles import build_profiles
    from union_indexer_node_spark.serving.graphql_api import GraphQLService
    from union_indexer_node_spark.serving.http import serve

    ev = (
        tables.load(spark, SF_DIR, "events")
        .select("event_id", "user_id")
        .orderBy("event_id")
        .limit(120)
        .collect()
    )
    rows = []
    for e in ev:
        author = f"u{e.user_id % 10}"
        app = "3speak/1.0" if e.event_id % 2 == 0 else "dbuzz/2"
        rows.append(
            comment(int(e.event_id) + 1, author, f"p{e.event_id}", "body", app=app)
        )
    for u in range(10):
        rows.append(
            _account_update(
                2000 + u, f"u{u}", {"name": f"User {u}", "about": f"about {u}"}
            )
        )
    rows.append(follow_op(3000, "follow", "u1", "u2", ["blog"]))
    rows.append(follow_op(3001, "follow", "u3", "u2", ["blog"]))
    rows.append(follow_op(3002, "follow", "u2", "u4", ["blog"]))
    ops = spark.createDataFrame(rows, OPS_SCHEMA)

    posts = build_posts(ops)
    profiles = build_profiles(ops)
    follows = build_follows(ops)
    svc = GraphQLService(posts=posts, profiles=profiles, follows=follows)
    server = serve(svc, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"

    def post(query, variables=None):
        req = urllib.request.Request(
            base + "/api/v2/graphql",
            data=_json.dumps({"query": query, "variables": variables or {}}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            return _json.loads(resp.read())

    try:
        feed = post(
            """
            query { socialFeed(feedOptions: {byApp: {_eq: "3speak"}},
                               pagination: {limit: 5}) {
                      items { author permlink app_name num_votes } } }
            """
        )
        assert not feed.get("errors"), feed.get("errors")
        items = feed["data"]["socialFeed"]["items"]
        assert items and all(i["app_name"] == "3speak" for i in items)

        prof = post(
            'query { profile(id: "u3") { username displayName about } }'
        )
        assert not prof.get("errors"), prof.get("errors")
        assert prof["data"]["profile"]["displayName"] == "User 3"

        fol = post(
            'query { follows(id: "u2") { followers_count followings_count'
            " followers followings } }"
        )
        assert not fol.get("errors"), fol.get("errors")
        f2 = fol["data"]["follows"]
        assert f2["followers_count"] == 2
        assert sorted(f2["followers"]) == ["u1", "u3"]
        assert f2["followings"] == ["u4"]
    finally:
        server.shutdown()
        t.join(timeout=10)


def test_kmeans_update_arms_identical(spark):
    """The dim-gated centroid-update arms (wide sum-aggregate vs
    posexplode over the pre-materialized assignment) must produce
    bit-identical centroids — both sum exact quantized integers; only
    the physical plan differs."""
    from union_indexer_node_spark.pipelines.similarity import kmeans_centroids

    dim, n = 130, 60  # above WIDE_DIM_UPDATE_THRESHOLD=128
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: ((F.col("id") * 31 + i.cast("long")) % 97).cast(
                "double"
            )
            / 97.0,
        ).alias("embedding"),
    )
    via_explode = kmeans_centroids(emb, k=3, iters=2)  # default gate
    via_wide = kmeans_centroids(emb, k=3, iters=2, wide_dim_threshold=8192)
    assert via_explode == via_wide
    # the persist_base scale knob must not change the result either
    via_persisted = kmeans_centroids(emb, k=3, iters=2, persist_base=True)
    assert via_persisted == via_explode


def test_lm_sampled_oracle_unseen_gram_parity(spark):
    """ADVICE r7: the sampled-LM oracle must mirror the engine for a
    gram UNSEEN by the sampled model whose CONTEXT was sampled — the
    whole-q constant 1000, not 1000000//(cctx+1000). Crafted corpus:
    one sampled doc supplies context 'ab' via gram 'abc'; one unsampled
    doc carries gram 'abd' (context seen, gram unseen). sf0.1 can't see
    this (its half-sample covers every doc trigram)."""
    import hashlib

    import duckdb
    import pandas as pd

    from union_indexer_node_spark import queries
    from union_indexer_node_spark.pipelines.textstats import char_lm_quality

    def draw(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32

    sampled = [i for i in range(1, 50) if draw(i) < 0.5]
    unsampled = [i for i in range(1, 50) if draw(i) >= 0.5]
    rows = [
        (sampled[0], "abc", "s"),  # model doc: grams {abc}, ctx {ab}
        (unsampled[0], "abd", "s"),  # unseen gram 'abd', seen ctx 'ab'
        (unsampled[1], "xyz", "s"),  # fully unseen gram AND ctx
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))

    engine = (
        char_lm_quality(sdf, "text", "doc_id", n=3, model_sample_rate=0.5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = (
        con.execute(queries.registry()["text_lm_quality_sampled"].oracle)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert engine["score_sum"].tolist() == oracle["score_sum"].tolist()
    assert engine["avg_q"].tolist() == oracle["avg_q"].tolist()
    # the unseen-gram doc must score the whole-q constant
    unseen = engine.set_index("doc_id").loc[unsampled[0]]
    assert int(unseen["score_sum"]) == 1000


def test_apply_bridge_id_flags(spark):
    """hive-stream.ts:264-281: a spk.bridge_id op flags an EXISTING
    post needs_stream_id; ops naming nonexistent posts are no-ops;
    repeated ops for one key must not fan the posts table out; an
    already-set flag stays set."""
    import json as _json

    from union_indexer_node_spark.ingest.posts import apply_bridge_id_flags

    posts = spark.createDataFrame(
        [
            ("alice", "p1", False),
            ("bob", "p2", False),
            ("carol", "p3", True),  # pre-flagged stays flagged
            ("dave", "p4", False),
        ],
        "author string, permlink string, needs_stream_id boolean",
    )

    def op(author, permlink, cid="spk.bridge_id"):
        return (
            "custom_json",
            cid,
            _json.dumps({"author": author, "permlink": permlink}),
        )

    ops = spark.createDataFrame(
        [
            op("alice", "p1"),
            op("alice", "p1"),  # duplicate: no fan-out
            op("ghost", "nope"),  # findOne miss: no-op
            op("bob", "p2", cid="other.id"),  # wrong id: ignored
        ],
        "op_type string, custom_json_id string, custom_json string",
    )
    out = apply_bridge_id_flags(posts, ops)
    rows = {(r.author, r.permlink): r.needs_stream_id for r in out.collect()}
    assert len(rows) == 4  # no fan-out from the duplicate op
    assert rows[("alice", "p1")] is True
    assert rows[("bob", "p2")] is False
    assert rows[("carol", "p3")] is True
    assert rows[("dave", "p4")] is False

    # posts without the column get it created
    bare = posts.drop("needs_stream_id")
    out2 = apply_bridge_id_flags(bare, ops)
    rows2 = {(r.author, r.permlink): r.needs_stream_id for r in out2.collect()}
    assert rows2[("alice", "p1")] is True
    assert rows2[("carol", "p3")] is False


def test_bpe_pair_counts_hand_computed(spark):
    """Vocab-weighted adjacent char-pair counts on a corpus small
    enough to count by hand; single-char and empty tokens contribute
    nothing; ordering is (count desc, a, b)."""
    from union_indexer_node_spark.pipelines.textstats import bpe_pair_counts

    rows = [
        (1, "ab ab cd"),  # ab x2, cd x1
        (2, "ab a !"),    # ab x1 more; 'a' too short; '!' not a token
        (3, "abc"),       # (a,b) + (b,c)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [
        (r.a, r.b, r.pair_count)
        for r in bpe_pair_counts(df, "text", k=10).collect()
    ]
    # word freqs: ab=3, cd=1, abc=1 -> (a,b)=3+1=4, (c,d)=1, (b,c)=1
    assert out == [("a", "b", 4), ("b", "c", 1), ("c", "d", 1)]


def test_tfidf_topk_exact_quantized_scores(spark):
    """tfidf_q = tf * (scale*(N+1) DIV (df+1)), ranked per doc with
    (score desc, term asc) tie-break; a corpus-ubiquitous term scores
    below a rarer term at equal tf."""
    from union_indexer_node_spark.pipelines.textstats import tfidf_topk

    rows = [
        (1, "common rare rare"),
        (2, "common other"),
        (3, "common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_id, r.rank): r
        for r in tfidf_topk(df, "text", "doc_id", k=2).collect()
    }
    idf = lambda dft: (1_000_000 * 4) // (dft + 1)  # N=3
    r11 = out[(1, 1)]
    assert (r11.term, r11.tf, r11.df_t) == ("rare", 2, 1)
    assert r11.tfidf_q == 2 * idf(1)
    r12 = out[(1, 2)]
    assert (r12.term, r12.tfidf_q) == ("common", 1 * idf(3))
    # doc 2: equal tf -> rarer term ('other', df=1) outranks 'common'
    assert out[(2, 1)].term == "other" and out[(2, 2)].term == "common"
    assert out[(3, 1)].term == "common" and (3, 2) not in out


def test_tfidf_single_corpus_explode(spark):
    """The plan must explode the corpus exactly once: df_t comes from a
    window over the compacted tf table, not a second explode subtree
    (Spark does not dedupe common subexpressions)."""
    from union_indexer_node_spark.pipelines.textstats import tfidf_topk

    df = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    plan = tfidf_topk(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1


def test_bpe_pair_counts_matches_python_fold(spark):
    """Hypothesis property: bpe_pair_counts equals an independent
    pure-Python fold (re-tokenize, count words, weight every adjacent
    char pair by word frequency) over random lowercase corpora with
    punctuation, including the (count desc, a, b) head ordering."""
    import re
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.pipelines.textstats import bpe_pair_counts

    word = st.text(alphabet="abc1", min_size=1, max_size=4)
    doc = st.lists(word, min_size=0, max_size=8).map(lambda ws: " , ".join(ws))

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        docs = data.draw(st.lists(doc, min_size=1, max_size=6))
        wf = Counter()
        for d in docs:
            for w in re.split(r"[^a-z0-9]+", d.lower()):
                if w:
                    wf[w] += 1
        pairs = Counter()
        for w, f in wf.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += f
        expect = sorted(
            ((a, b, n) for (a, b), n in pairs.items()),
            key=lambda r: (-r[2], r[0], r[1]),
        )[:10]

        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
        )
        got = [
            (r.a, r.b, r.pair_count)
            for r in bpe_pair_counts(df, "text", k=10).collect()
        ]
        assert got == expect

    check()


def test_tfidf_topk_matches_python_fold(spark):
    """Hypothesis property: tfidf_topk equals a pure-Python fold
    computing tf, df, the quantized idf (scale*(N+1) // (df+1)) and the
    per-doc (score desc, term asc) head — N counts ALL docs including
    token-free ones."""
    import re
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.pipelines.textstats import tfidf_topk

    word = st.sampled_from(["aa", "bb", "cc", "dd", "e"])
    doc = st.lists(word, min_size=0, max_size=10).map(" ".join)

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        docs = data.draw(st.lists(doc, min_size=1, max_size=8))
        n = len(docs)
        tf = {}
        for i, d in enumerate(docs):
            toks = [w for w in re.split(r"[^a-z0-9]+", d.lower()) if w]
            if toks:
                tf[i] = Counter(toks)
        df_t = Counter()
        for c in tf.values():
            for t in c:
                df_t[t] += 1
        expect = {}
        for i, c in tf.items():
            scored = sorted(
                (
                    (-t_f * ((1_000_000 * (n + 1)) // (df_t[t] + 1)), t, t_f)
                    for t, t_f in c.items()
                ),
            )[:3]
            expect[i] = [
                (rank + 1, t, t_f, df_t[t], -neg)
                for rank, (neg, t, t_f) in enumerate(scored)
            ]

        sdf = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
        )
        got = {}
        for r in tfidf_topk(sdf, "text", "doc_id", k=3).collect():
            got.setdefault(r.doc_id, []).append(
                (r.rank, r.term, r.tf, r.df_t, r.tfidf_q)
            )
        for i in got:
            got[i].sort()
        assert got == expect

    check()


def test_adaptive_quality_gate_per_source_thresholds(spark):
    """The gate cutoff is per-source: a 3-token doc passes in a terse
    source whose p25 is low but fails in a verbose source, and every
    input row comes back with its threshold."""
    from union_indexer_node_spark.pipelines.curation import (
        adaptive_quality_gate,
    )

    rows = [
        (1, "a b c", "terse"),
        (2, "a b", "terse"),
        (3, "a", "terse"),
        (4, "a b c", "verbose"),
        (5, "a b c d e f g h", "verbose"),
        (6, "a b c d e f g h i j", "verbose"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r
        for r in adaptive_quality_gate(
            df, "text", "doc_id", "source", p=0.25
        ).collect()
    }
    assert len(out) == 6
    # terse p25 of [1,2,3] = 1.5 -> 3-token doc kept, 1-token dropped
    assert out[1].kept and not out[3].kept
    # verbose p25 of [3,8,10] = 5.5 -> the same 3-token doc is dropped
    assert not out[4].kept and out[5].kept and out[6].kept
    assert out[1].thr != out[4].thr


def test_budget_select_matches_naive_window_fold(spark):
    """Hypothesis property: the two-level value-bucketed prefix sum
    equals a pure-Python per-source ordered cumsum — including tied
    token counts (id tiebreak), the all-same-length one-bucket
    degenerate shape, and budget boundaries hit exactly."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.pipelines.training import budget_select

    word = st.sampled_from(["x", "y"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        docs = data.draw(
            st.lists(
                st.tuples(st.sampled_from(["s1", "s2"]), doc),
                min_size=1,
                max_size=12,
            )
        )
        budget = data.draw(st.integers(0, 30))
        rows = [(i, t, s) for i, (s, t) in enumerate(docs)]
        counts = {
            i: len([w for w in re.split(r"[^a-z0-9]+", t.lower()) if w])
            for i, t, _ in rows
        }
        expect = {}
        for src in {s for _, _, s in rows}:
            cum = 0
            for i, _, _ in sorted(
                (r for r in rows if r[2] == src),
                key=lambda r: (-counts[r[0]], r[0]),
            ):
                cum += counts[i]
                expect[i] = (counts[i], cum, cum <= budget)

        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            r.doc_id: (r.n_tokens, r.cum_tokens, r.selected)
            for r in budget_select(
                df, "text", "doc_id", "source", budget
            ).collect()
        }
        assert got == expect

    check()


def test_budget_select_two_level_plan(spark):
    """Pin the distributed-scan shape: the corpus-sized cumsum window
    partitions by (source, bucket) — never by source alone — and the
    bucket-offset table comes back via a broadcast join."""
    from union_indexer_node_spark.pipelines.training import budget_select

    df = spark.createDataFrame(
        [(1, "a b c", "s"), (2, "a", "s")], "doc_id long, text string, source string"
    )
    plan = (
        budget_select(df, "text", "doc_id", "source", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    import re

    # every corpus-side Window must include _bkt in its partition spec;
    # the offsets window runs on the tiny aggregated table only.
    corpus_windows = [
        w for w in re.findall(r"Window \[sum\(n_tokens#\d+L?\)[^\n]*", plan)
    ]
    assert corpus_windows, plan
    assert all("_bkt" in w for w in corpus_windows), corpus_windows


def test_funnel_stages_strict_ts_and_partials(spark):
    """Funnel semantics corners: strict-ts advancement (a click
    simultaneous with the anchoring view does NOT count), partial
    progressions, out-of-order users (click before any view), and the
    greedy min-anchor letting a later click+purchase pair qualify."""
    import datetime as dt

    from union_indexer_node_spark.operators.temporal import funnel_stages

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: full funnel in order
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2: click at the SAME ts as the anchoring view -> stage 1,
        # purchase after can't count without a qualifying click
        (2, t(0), "view"), (2, t(0), "click"), (2, t(5), "purchase"),
        # u3: click precedes every view -> stage 1 only
        (3, t(1), "view"), (3, t(0), "click"),
        # u4: purchase between view and click -> stage 2 (purchase
        # must FOLLOW the click anchor)
        (4, t(0), "view"), (4, t(1), "purchase"), (4, t(2), "click"),
        # u5: no view at all -> stage 0 (still reported)
        (5, t(0), "click"), (5, t(1), "purchase"),
        # u6: ties broken by a SECOND click strictly later -> stage 3
        (6, t(0), "view"), (6, t(0), "click"), (6, t(1), "click"),
        (6, t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.user_id: r.stage
        for r in funnel_stages(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1, 4: 2, 5: 0, 6: 3}


def test_search_substring_trigram_verify_and_fallback(spark):
    """The trigram path must (a) find cross-word substrings, (b) reject
    docs that contain every trigram but not the contiguous pattern
    (the verify step), and (c) fall back to a plain scan for <3-char
    patterns."""
    from union_indexer_node_spark.pipelines.search import (
        build_trigram_index,
        search_substring,
    )

    rows = [
        (1, "big value stream"),      # 'alue s' crosses the word gap
        (2, "alu ue e s value"),      # no contiguous match
        (3, "VALUE Stream upper"),    # case-insensitive hit
        (4, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_trigram_index(df, "text", ["doc_id"])
    hits = sorted(
        r.doc_id
        for r in search_substring(idx, df, "alue s", "text", ["doc_id"]).collect()
    )
    assert hits == [1, 3]
    # every trigram of 'alue s' is present in doc 2's text? build the
    # check honestly: if it is, the verify step is what excluded it.
    grams = {"alue s"[i : i + 3] for i in range(len("alue s") - 2)}
    doc2 = {g for g in (
        r.gram for r in idx.filter(F.col("doc_id") == 2).collect()
    )}
    assert grams <= doc2  # candidate only thanks to co-occurrence
    short = search_substring(idx, df, "os", "text", ["doc_id"])
    assert sorted(r.doc_id for r in short.collect()) == []
    short2 = search_substring(idx, df, "ng", "text", ["doc_id"])
    assert sorted(r.doc_id for r in short2.collect()) == [4]


def test_cohort_retention_hand_computed(spark):
    """Retention triangle corners: multi-event weeks count once, the
    cohort anchor is the user's FIRST week, offsets are exact week
    multiples off Monday-aligned truncation."""
    import datetime as dt

    from union_indexer_node_spark.operators.temporal import cohort_retention

    mon = dt.datetime(2024, 1, 1)  # a Monday
    wk = dt.timedelta(days=7)
    rows = [
        (1, mon), (1, mon + dt.timedelta(days=2)),      # week 0 twice
        (1, mon + wk),                                   # week 1
        (2, mon + dt.timedelta(days=6)),                 # cohort wk0
        (2, mon + 2 * wk),                               # offset 2
        (3, mon + wk + dt.timedelta(days=3)),            # cohort wk1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.date(), r.week_offset): r.n_active
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    d0, d1 = mon.date(), (mon + wk).date()
    assert got == {
        (d0, 0): 2,  # u1 + u2 in their cohort week
        (d0, 1): 1,  # u1 returns
        (d0, 2): 1,  # u2 returns
        (d1, 0): 1,  # u3's cohort
    }


def test_authless_spk_community_ops_dropped(spark):
    """Empty required_posting_auths (active-auth custom_json): the
    signer-keyed families must DROP the row instead of emitting a
    NULL-follower edge whose concat_ws key collapses onto other
    signers' edges (documented divergence: the reference interpolates
    the JS string 'undefined'). Same for updateProps communities."""
    import datetime as dt

    from union_indexer_node_spark.ingest.posts import build_follows
    from union_indexer_node_spark.ingest.profiles import (
        community_updateprops,
    )

    t = dt.datetime(2024, 1, 1)
    schema = (
        "op_type string, custom_json_id string, custom_json string, "
        "required_posting_auths array<string>, block_timestamp timestamp, "
        "block_height long, tx_idx int, op_idx int"
    )
    rows = [
        # authless spk.follow / community subscribe: dropped
        ("custom_json", "spk.follow", '{"did":"did:key:z1","what":["blog"]}',
         [], t, 1, 0, 0),
        ("custom_json", "community",
         '{"action":"subscribe","community":"hive-1"}', [], t, 2, 0, 0),
        # signed siblings: kept (and must NOT collide with the above)
        ("custom_json", "spk.follow", '{"did":"did:key:z1","what":["blog"]}',
         ["alice"], t, 3, 0, 0),
        ("custom_json", "community",
         '{"action":"subscribe","community":"hive-1"}', ["bob"], t, 4, 0, 0),
        # authless updateProps: dropped from the communities feed
        ("custom_json", "community",
         '{"action":"updateProps","title":"T","about":"A"}', [], t, 5, 0, 0),
        ("custom_json", "community",
         '{"action":"updateProps","title":"T2","about":"A2"}',
         ["comm"], t, 6, 0, 0),
    ]
    ops = spark.createDataFrame(rows, schema)
    edges = build_follows(ops).collect()
    assert {(r.follower, r._id) for r in edges} == {
        ("alice", "hive/alice/did:key:z1"),
        ("bob", "hive-bob-hive-1"),
    }
    props = community_updateprops(ops).collect()
    assert [(r.account, r.title) for r in props] == [("comm", "T2")]


def test_moving_window_agg_range_frame(spark):
    """RANGE-frame corners: the trailing window is an interval (a
    burst of 3 events within a week all see each other; an event 8
    days later sees only itself plus in-range peers), boundary ts
    exactly 7 days back IS included, and equal-ts peers are all
    included for both rows."""
    import datetime as dt

    from union_indexer_node_spark.operators.temporal import (
        moving_window_agg,
    )

    t0 = dt.datetime(2024, 1, 1)
    d = dt.timedelta
    rows = [
        (1, t0, 1.0),
        (1, t0 + d(days=3), 2.0),
        (1, t0 + d(days=7), 4.0),          # exactly 7d after t0: includes it
        (1, t0 + d(days=11), 8.0),         # sees days 7, 11 only
        (2, t0, 1.5), (2, t0, 2.5),        # equal-ts peers see each other
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.ts, r.value_cents): (r.n_trailing, r.sum_trailing_cents)
        for r in moving_window_agg(df, "user_id", "ts", "value", days=7).collect()
    }
    assert got[(1, t0, 100)] == (1, 100)
    assert got[(1, t0 + d(days=3), 200)] == (2, 300)
    assert got[(1, t0 + d(days=7), 400)] == (3, 700)
    assert got[(1, t0 + d(days=11), 800)] == (2, 1200)
    assert got[(2, t0, 150)] == (2, 400)
    assert got[(2, t0, 250)] == (2, 400)


def test_column_profile_awkward_names_and_nulls(spark):
    """Profile contract corners: names with spaces/quotes profile fine
    (positional aliases + escaped literals), NULLs and distincts are
    exact, empty column list raises."""
    import pytest

    from union_indexer_node_spark.pipelines.curation import column_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "a")],
        "`my col` long, `it's` string",
    )
    got = {
        r.column_name: (r.n_rows, r.n_null, r.n_distinct)
        for r in column_profile(df, ["my col", "it's"]).collect()
    }
    assert got == {"my col": (3, 0, 2), "it's": (3, 1, 1)}
    with pytest.raises(ValueError):
        column_profile(df, [])


def test_funnel_stages_matches_python_recurrence(spark):
    """Hypothesis property: funnel_stages equals the pure-Python
    strict-ts greedy recurrence (t_i = min ts of step i strictly after
    t_{i-1}) over random event sets with a tiny timestamp pool so ties
    and out-of-order progressions are common."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.operators.temporal import funnel_stages

    t0 = dt.datetime(2024, 1, 1)
    steps = ["a", "b", "c"]

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        evs = data.draw(
            st.lists(
                st.tuples(
                    st.integers(0, 2),           # user
                    st.integers(0, 5),           # ts minute (ties likely)
                    st.sampled_from(steps + ["x"]),  # non-step noise
                ),
                min_size=1,
                max_size=30,
            )
        )
        expect = {}
        for u in {e[0] for e in evs if e[2] in steps}:
            anchor, stage = None, 0
            for s in steps:
                cand = [
                    m for (uu, m, tp) in evs
                    if uu == u and tp == s
                    and (anchor is None if stage == 0 else m > anchor)
                ]
                if not cand:
                    break
                anchor = min(cand)
                stage += 1
            expect[u] = stage

        df = spark.createDataFrame(
            [(u, t0 + dt.timedelta(minutes=m), tp) for u, m, tp in evs],
            "user_id long, ts timestamp, event_type string",
        )
        got = {
            r.user_id: r.stage
            for r in funnel_stages(
                df, "user_id", "ts", "event_type", steps
            ).collect()
        }
        assert got == expect

    check()


def test_update_minhash_index_incremental_semantics(spark):
    """Incremental signature maintenance: an edited doc gets a NEW
    signature, a deleted doc (empty text) leaves the index, an
    untouched doc keeps its exact old row — and the merged result
    equals a full rebuild over the new corpus."""
    from union_indexer_node_spark.pipelines.dedup import (
        minhash_signature,
        update_minhash_index,
    )

    old = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five"),
            (3, "to be deleted soon enough"),
        ],
        "doc_id long, text string",
    )
    changed = spark.createDataFrame(
        [(2, "one two three four five six seven"), (3, "")],
        "doc_id long, text string",
    )
    index = minhash_signature(old, "text", "doc_id")
    out = update_minhash_index(index, changed, "text", "doc_id")
    new_corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    rebuild = minhash_signature(new_corpus, "text", "doc_id")
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, rebuild.collect()))
    assert got == want and {r[0] for r in got} == {1, 2}


def test_cohort_retention_matches_python_fold(spark):
    """Hypothesis property: cohort_retention equals a pure-Python fold
    (truncate to Monday weeks, anchor each user at their min week,
    count distinct users per (cohort, offset)) over random event sets
    spanning week boundaries."""
    import datetime as dt
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.operators.temporal import cohort_retention

    t0 = dt.datetime(2024, 1, 1)  # a Monday

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        evs = data.draw(
            st.lists(
                st.tuples(st.integers(0, 3), st.integers(0, 35)),  # (user, day)
                min_size=1,
                max_size=25,
            )
        )
        def week(day):
            return day - (day % 7)

        weeks = {(u, week(d)) for u, d in evs}
        first = {}
        for u, w in weeks:
            first[u] = min(first.get(u, w), w)
        expect = Counter()
        for u, w in weeks:
            expect[(first[u], (w - first[u]) // 7)] += 1

        df = spark.createDataFrame(
            [(u, t0 + dt.timedelta(days=d)) for u, d in evs],
            "user_id long, ts timestamp",
        )
        got = {
            ((r.cohort_week - t0).days, r.week_offset): r.n_active
            for r in cohort_retention(df, "user_id", "ts").collect()
        }
        assert got == dict(expect)

    check()


def test_funnel_and_trigram_plans_stay_hash_joined(spark):
    """Plan guards: the funnel's per-stage joins and the trigram
    candidate intersection must stay equi/hash joins — a future edit
    adding a non-equi condition would silently fall back to a
    nested-loop plan."""
    import datetime as dt

    from union_indexer_node_spark.operators.temporal import funnel_stages
    from union_indexer_node_spark.pipelines.search import (
        build_trigram_index,
        search_substring,
    )

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a")],
        "user_id long, ts timestamp, event_type string",
    )
    fplan = (
        funnel_stages(ev, "user_id", "ts", "event_type", ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    docs = spark.createDataFrame([(1, "abc def")], "doc_id long, text string")
    idx = build_trigram_index(docs, "text", ["doc_id"])
    splan = (
        search_substring(idx, docs, "abc", "text", ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    for name, plan in [("funnel", fplan), ("trigram", splan)]:
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

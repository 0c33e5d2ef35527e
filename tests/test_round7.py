"""Round-7 regression tests: community-feed spkvideo parity (ADVICE
r6), image header probing, the sampled LM-quality arm, and scale-boundary
properties for the two-level rank."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR


def test_community_latest_feed_applies_spkvideo(spark):
    """ADVICE r6: community_feed's non-trending path must apply the
    spkvideo predicates like every other feed (reference
    Community.latestFeed delegates to Resolvers.socialFeed,
    resolvers/index.ts:425-437)."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.operators import api

    posts = tables.posts(spark, SF_DIR)
    silver = posts.withColumn("first_upload", F.col("event_id") % 2 == 0)
    unfiltered = api.community_feed(silver, {"id": "hive-3", "limit": 50})
    assert any(not r.first_upload for r in unfiltered.collect())
    filtered = api.community_feed(
        silver,
        {"id": "hive-3", "spkvideo": {"firstUpload": True}, "limit": 50},
    )
    rows = filtered.collect()
    assert rows and all(r.first_upload for r in rows)


def _md5_colliding_ids(prefix: str = "00", want: int = 40) -> list[int]:
    """Brute-force ids whose md5 hex shares a first-2-hex shard — the
    concentration case the two-level rank's shard split must survive."""
    import hashlib

    out, i = [], 0
    while len(out) < want:
        if hashlib.md5(str(i).encode()).hexdigest().startswith(prefix):
            out.append(i)
        i += 1
    return out


_COLLIDE = _md5_colliding_ids()


def _naive_stratum_ranks(rows):
    """Independent pure-Python oracle for the per-stratum md5 rank."""
    import hashlib

    by: dict = {}
    for id_, s in rows:
        by.setdefault(s, []).append(id_)
    out = []
    for s, ids in by.items():
        ordered = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        out.extend((id_, s, r) for r, id_ in enumerate(ordered, 1))
    return out


def test_two_level_rank_scale_boundaries(spark):
    """VERDICT r6 #8: the two-level (stratum x md5-shard) rank must
    equal the naive single-window rank when (a) md5 prefixes collide
    into ONE shard, (b) there are more strata than shards (>256), and
    (c) a null stratum is present — all three at once, via hypothesis
    over the row multiset, against a pure-Python oracle."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.pipelines.curation import stratified_sample
    from union_indexer_node_spark.pipelines.training import epoch_interleave

    pool = _COLLIDE + list(range(1000, 2000))

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        n_strata = data.draw(st.sampled_from([1, 2, 257, 300]))
        k = data.draw(st.sampled_from([1, 3, 7]))
        strata = [f"s{i:03d}" for i in range(n_strata)] + [None]
        # one guaranteed row per stratum (incl. the null stratum), plus
        # hypothesis-drawn extras biased toward the colliding-shard ids
        rows = [(pool[i % len(pool)], s) for i, s in enumerate(strata)]
        rows += data.draw(
            st.lists(
                st.tuples(
                    st.sampled_from(_COLLIDE), st.sampled_from(strata)
                ),
                max_size=60,
            )
        )
        df = spark.createDataFrame(rows, "doc_id long, source string")
        expected = _naive_stratum_ranks(rows)
        key = lambda t: (t[1] is not None, t[1] or "", t[0], t[2])  # noqa: E731

        got_sample = sorted(
            (
                (r.doc_id, r.source, r.draw_rank)
                for r in stratified_sample(
                    df, "source", "doc_id", per_stratum=k
                ).collect()
            ),
            key=key,
        )
        assert got_sample == sorted(
            (t for t in expected if t[2] <= k), key=key
        )

        inter = epoch_interleave(
            df.withColumn("weight", F.lit(0.5)), "doc_id", "source", "weight"
        )
        got_inter = sorted(
            (
                (r.doc_id, r.source, r.source_rank, r.interleave_key)
                for r in inter.collect()
            ),
            key=key,
        )
        assert got_inter == sorted(
            ((id_, s, r, round(r / 0.5, 6)) for id_, s, r in expected),
            key=key,
        )

    check()


def test_kmeans_assign_properties(spark):
    """Deterministic Lloyd: every vector assigned to a cluster in
    [0, k); repeat invocation is byte-identical; the assignment stage
    is map-only (centroids are plan literals — no join, no extra
    shuffle beyond the update aggregations already executed)."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.pipelines.similarity import kmeans_assign

    e = tables.load(spark, SF_DIR, "embeddings")
    out = kmeans_assign(e, k=4, iters=2)
    rows = out.collect()
    assert len(rows) == e.count()
    assert {r.cluster for r in rows} <= {0, 1, 2, 3}
    assert all(r.dist_sq >= 0 for r in rows)
    # non-degenerate on real data: more than one cluster populated
    assert len({r.cluster for r in rows}) > 1
    again = {(r.vec_id, r.cluster, r.dist_sq) for r in kmeans_assign(e, k=4, iters=2).collect()}
    assert again == {(r.vec_id, r.cluster, r.dist_sq) for r in rows}
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "Join" not in plan, plan

    # fewer rows than k: each row seeds its own cluster, dist 0
    tiny = e.limit(3)
    t = kmeans_assign(tiny, k=4, iters=2).collect()
    assert len(t) == 3 and all(r.dist_sq == 0.0 for r in t)
    assert {r.cluster for r in t} == {0, 1, 2}


def test_limit_zero_falls_back_to_default(spark):
    """Reference parity: resolvers read `pagination?.limit || N`, so a
    FALSY limit (0/None) means the default page size, never zero rows
    (resolvers/index.ts:178,300,390)."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.operators import api

    posts = tables.posts(spark, SF_DIR)
    assert api.social_feed(posts, {"limit": 0}).count() == 100
    assert api.social_feed(posts, {"limit": None}).count() == 100
    assert api.trending_tags(posts, {"limit": 0}).count() == 5
    r = posts.select("author", "permlink").first()
    assert (
        api.related_feed(
            posts, {"author": r.author, "permlink": r.permlink, "limit": 0}
        ).count()
        <= 25
    )


def test_community_lookup_prepends_hive_parity(spark):
    """Reference parity: community(id) is findOne({_id: `hive/${id}`})
    (resolvers/index.ts:407-409) — the name form resolves, a full _id
    input double-prefixes and misses, exactly like the reference."""
    from union_indexer_node_spark.operators import api

    communities = spark.createDataFrame(
        [("hive/hive-1", "hive-1", "c", "about")],
        "_id string, name string, title string, about string",
    )
    assert api.community(communities, {"id": "hive-1"}).count() == 1
    assert api.community(communities, {"id": "hive/hive-1"}).count() == 0


def test_profile_did_prefix_routing_parity(spark):
    """Reference parity: profile(id) routes on startsWith('did') with
    NO colon (resolvers/index.ts:308) — a username beginning with
    'did' goes to the DID store and misses, exactly like the
    reference."""
    from union_indexer_node_spark.operators import api

    profiles = spark.createDataFrame(
        [("didier", "did:key:zx", 1.0), ("alice", None, 2.0)],
        "username string, did string, score double",
    )
    assert api.profile(profiles, {"id": "didier"}).count() == 0  # misroute, per ref
    assert api.profile(profiles, {"id": "did:key:zx"}).first().username == "didier"
    assert api.profile(profiles, {"id": "alice"}).first().username == "alice"


def test_ivf_topk_over_kmeans_buckets(spark):
    """kmeans_assign produces the coarse buckets ivf_topk was designed
    around: searching only the query vector's own cluster must return
    the true global top-1 when the nearest neighbor shares the cluster
    (it does for a query ON a corpus point), with the scan restricted
    to that bucket."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.pipelines.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_assign,
    )

    emb = tables.load(spark, SF_DIR, "embeddings")
    assign = kmeans_assign(emb, k=4, iters=2).select("vec_id", "cluster")
    clustered = emb.join(assign, "vec_id")
    probe = emb.filter(F.col("vec_id") == 7).first()
    qvec = [float(x) for x in probe.embedding]
    qcluster = {r.vec_id: r.cluster for r in assign.collect()}[7]

    ivf = ivf_topk(
        clustered, qvec, qcluster, bucket_col="cluster", k=5
    ).collect()
    brute = brute_force_topk(emb, qvec, k=5).collect()
    # the probe itself (cosine 1.0) is in its own cluster by definition
    assert ivf[0].vec_id == brute[0].vec_id == 7
    # every IVF hit comes from the probed bucket
    hit_ids = [r.vec_id for r in ivf]
    assert all(qcluster == c for c in (
        {r.vec_id: r.cluster for r in assign.collect()}[i] for i in hit_ids
    ))


def test_semantic_flags_plan_no_cartesian(spark):
    """The candidate stage must be a (cluster, band, value) equi-join —
    never a cartesian/nested-loop — and the verify must join back to
    the corpus rather than carry vectors through the band exchange."""
    from union_indexer_node_spark import queries as q

    df = q.registry()["dedup_semantic_flags"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_semantic_dup_flags_keep_canonical(spark):
    """An exact duplicate vector (cosine 1.0 > any threshold, same
    cluster, same bands by construction) must flag the HIGHER id and
    keep the lower one; the flag covers every input row."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.pipelines.ann_lsh import hyperplanes
    from union_indexer_node_spark.pipelines.similarity import semantic_dup_flags

    e = tables.load(spark, SF_DIR, "embeddings")
    src = e.select("vec_id", "embedding")
    clone = src.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    df = src.unionByName(clone)
    flags = {
        r.vec_id: r.is_semantic_dup
        for r in semantic_dup_flags(
            df, hyperplanes(64, 8), k=4, iters=2, threshold=0.35
        ).collect()
    }
    assert len(flags) == df.count()
    assert flags[1_000_000] is True  # the clone is the duplicate
    assert flags[0] is False  # canonical survivor


def test_char_lm_sampled_model_broadcasts(spark):
    """Scale pin for the sampled arm: the per-gram q model must still
    BROADCAST to the corpus-sized scoring join (never shuffle-join the
    exploded gram stream)."""
    from union_indexer_node_spark import queries as q

    df = q.registry()["text_lm_quality_sampled"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_char_lm_sampled_model_arm(spark):
    """The md5-sampled-model arm must keep the quality ranking
    (gibberish below corpus text) and must score EVERY doc — grams
    unseen by the sampled model take the zero-count smoothed constant
    (scale DIV smooth_k) instead of dropping from the sum."""
    from union_indexer_node_spark.pipelines.textstats import char_lm_quality

    normal = "the quick brown fox jumps over the lazy dog and runs home"
    docs = [(i, normal) for i in range(40)]
    docs.append((97, "qzxjvkwpq zzkj xqvw jjqz wkxv"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in char_lm_quality(
            df, "text", "doc_id", model_sample_rate=0.5
        ).collect()
    }
    assert out[97].avg_q < out[0].avg_q
    assert all(r.n_grams > 0 for r in out.values())

    # rate ~0 -> empty model -> every gram takes the unseen constant
    empty_model = {
        r.doc_id: r
        for r in char_lm_quality(
            df, "text", "doc_id", model_sample_rate=1e-12
        ).collect()
    }
    assert all(r.avg_q == 1_000_000 // 1000 for r in empty_model.values())


def test_http_graphql_end_to_end(spark):
    """S9 transport: a real HTTP POST to the reference route
    (/api/v2/graphql) must execute the same plan as the in-process
    executor, and transport errors must be HTTP-level."""
    pytest.importorskip("graphql")
    import json
    import threading
    import urllib.error
    import urllib.request

    from union_indexer_node_spark import tables
    from union_indexer_node_spark.serving.graphql_api import GraphQLService
    from union_indexer_node_spark.serving.http import serve

    posts = tables.posts(spark, SF_DIR)
    svc = GraphQLService(posts=posts)
    server = serve(svc, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    query = """
      query Feed($app: String) {
        socialFeed(feedOptions: {byApp: {_eq: $app}},
                   pagination: {limit: 5}) {
          items { author permlink app_name }
        }
      }
    """
    try:
        req = urllib.request.Request(
            base + "/api/v2/graphql",
            data=json.dumps(
                {"query": query, "variables": {"app": "3speak"}}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            body = json.loads(resp.read())
        assert not body.get("errors"), body.get("errors")
        items = body["data"]["socialFeed"]["items"]
        assert items and all(i["app_name"] == "3speak" for i in items)
        # must equal the in-process executor byte-for-byte
        direct = svc.execute(query, {"app": "3speak"})
        assert body["data"] == direct["data"]

        # transport errors are HTTP errors
        with pytest.raises(urllib.error.HTTPError) as e404:
            urllib.request.urlopen(base + "/nope", data=b"{}", timeout=10)
        assert e404.value.code == 404
        bad = urllib.request.Request(
            base + "/api/v2/graphql", data=b"not json", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e400:
            urllib.request.urlopen(bad, timeout=10)
        assert e400.value.code == 400
        # valid JSON that is NOT an object ([1], "x") is also a
        # transport-level 400, not an unhandled 500
        for payload in (b"[1]", b'"x"', b"42"):
            nonobj = urllib.request.Request(
                base + "/api/v2/graphql", data=payload, method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as e400b:
                urllib.request.urlopen(nonobj, timeout=10)
            assert e400b.value.code == 400, payload
        # query-level errors stay 200 with an errors array
        req2 = urllib.request.Request(
            base + "/api/v2/graphql",
            data=json.dumps({"query": "query { nope }"}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req2, timeout=60) as resp:
            assert resp.status == 200
            assert json.loads(resp.read())["errors"]
    finally:
        server.shutdown()
        t.join(timeout=10)


def test_ceramic_replies_carry_comment_flag(spark):
    """Reference parity (services/index.ts:72-75): an offchain doc with
    a parent permlink is a reply and carries the 'comment' flag, so a
    feed with includeCeramic but NOT includeComments excludes it."""
    import datetime as dt

    from union_indexer_node_spark.operators import feeds
    from union_indexer_node_spark.sources.ceramic import (
        CERAMIC_DOCS_SCHEMA,
        ceramic_posts,
    )

    t0 = dt.datetime(2024, 1, 1)
    docs = spark.createDataFrame(
        [
            ("s1", "v1", "did:key:a", None, None, "top", "body", [], None,
             t0, t0, None, False, None),
            ("s2", "v1", "did:key:b", "did:key:a", "s1", "re", "body", [],
             None, t0, t0, None, False, None),
        ],
        CERAMIC_DOCS_SCHEMA,
    )
    mapped = {r.permlink: r for r in ceramic_posts(docs).collect()}
    assert mapped["s1"].flags == []
    assert mapped["s2"].flags == ["comment"]

    # feed semantics: ceramic-inclusive feed still excludes the reply
    # unless comments are opted into
    posts = ceramic_posts(docs).withColumn("app_name", F.lit("blog")).withColumn(
        "num_votes", F.lit(0)
    )
    got = {
        r.permlink
        for r in feeds.social_feed(
            posts, feeds.FeedSpec(include_ceramic=True, limit=10)
        ).collect()
    }
    assert got == {"s1"}
    got_all = {
        r.permlink
        for r in feeds.social_feed(
            posts,
            feeds.FeedSpec(
                include_ceramic=True, include_comments=True, limit=10
            ),
        ).collect()
    }
    assert got_all == {"s1", "s2"}


def test_search_any_term_matches_mongo_or(spark):
    """Mongo $text ORs space-delimited terms; any_term=True reproduces
    that, the default AND stays the documented divergence. OR results
    must equal AND ∪ (each single-term search)."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.operators import feeds
    from union_indexer_node_spark.pipelines.search import (
        build_inverted_index,
        search_by_index,
    )

    posts = tables.posts(spark, SF_DIR)
    spec = feeds.FeedSpec(limit=10_000)

    def keys(df):
        return {(r.author, r.permlink) for r in df.select("author", "permlink").collect()}

    both = keys(feeds.search_feed(posts, "plain punctuation", spec))
    either = keys(feeds.search_feed(posts, "plain punctuation", spec, any_term=True))
    t1 = keys(feeds.search_feed(posts, "plain", spec))
    t2 = keys(feeds.search_feed(posts, "punctuation", spec))
    assert both == t1 & t2
    assert either == t1 | t2
    assert both <= either

    # v2 has no feed defaults (comment/ceramic filters), so check the
    # OR/AND algebra within its own surface
    idx = build_inverted_index(posts, "body", ["author", "permlink"])

    def v2(terms, **kw):
        return keys(search_by_index(idx, posts, terms, ["author", "permlink"], **kw))

    assert v2(["plain", "punctuation"], any_term=True) == v2(["plain"]) | v2(
        ["punctuation"]
    )
    assert v2(["plain", "punctuation"]) == v2(["plain"]) & v2(["punctuation"])


def test_asof_join_matches_python_oracle(spark):
    """Hypothesis property: for every left row, asof_join returns the
    payload of the LATEST right row with ts <= left ts in the same key
    group (inclusive at equality), None when no right row qualifies —
    checked against an independent pure-Python fold over random event
    sets with deliberately colliding timestamps."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.operators.temporal import asof_join

    t0 = dt.datetime(2024, 1, 1)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        ts_pool = st.integers(0, 12)  # small pool forces ties
        keys = st.integers(0, 2)
        left = data.draw(
            st.lists(st.tuples(keys, ts_pool), min_size=1, max_size=25)
        )
        right = data.draw(
            st.lists(st.tuples(keys, ts_pool), min_size=0, max_size=25)
        )
        # right side unique per (key, ts) — the documented precondition
        right = list({(k, t) for k, t in right})

        ldf = spark.createDataFrame(
            [
                (k, t0 + dt.timedelta(minutes=t), i)
                for i, (k, t) in enumerate(left)
            ],
            "k long, ts timestamp, lid long",
        )
        rdf = spark.createDataFrame(
            [(k, t0 + dt.timedelta(minutes=t), f"p{k}-{t}") for k, t in right],
            "k long, ts timestamp, payload string",
        )
        got = {
            (r.lid, r.asof_payload)
            for r in asof_join(ldf, rdf, ["k"], payload=["payload"]).collect()
        }
        expected = set()
        for i, (k, t) in enumerate(left):
            cands = [(rt, p) for (rk, rt) in right if rk == k and rt <= t
                     for p in [f"p{rk}-{rt}"]]
            expected.add((i, max(cands)[1] if cands else None))
        assert got == expected

    check()


def test_bucketed_range_join_cap_split_property(spark):
    """Hypothesis property: the bucket-explode + long-interval
    broadcast split returns EXACTLY the point-in-interval pairs of a
    naive cross check, for any cap — including caps that route most
    intervals to the broadcast arm — and boundary-inclusive at both
    interval ends."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.operators.temporal import bucketed_range_join

    t0 = dt.datetime(2024, 1, 1)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        pts = data.draw(st.lists(st.integers(0, 600), min_size=1, max_size=20))
        ivs = data.draw(
            st.lists(
                st.tuples(st.integers(0, 600), st.integers(0, 600)),
                min_size=1,
                max_size=10,
            )
        )
        ivs = [(min(a, b), max(a, b)) for a, b in ivs]
        cap = data.draw(st.sampled_from([1, 3, None]))
        p = spark.createDataFrame(
            [(i, m(t)) for i, t in enumerate(pts)], "pid long, ts timestamp"
        )
        iv = spark.createDataFrame(
            [(j, m(a), m(b)) for j, (a, b) in enumerate(ivs)],
            "iid long, start_ts timestamp, end_ts timestamp",
        )
        got = {
            (r.pid, r.iid)
            for r in bucketed_range_join(
                p, iv, max_buckets_per_interval=cap
            ).collect()
        }
        expected = {
            (i, j)
            for i, t in enumerate(pts)
            for j, (a, b) in enumerate(ivs)
            if a <= t <= b
        }
        assert got == expected

    check()


def test_pipeline_ops_survive_empty_input(spark):
    """A scheduled pipeline run over an empty partition/day must not
    crash: the iterative and banded operators all return empty frames
    with their declared schemas."""
    from union_indexer_node_spark.pipelines.ann_lsh import hyperplanes
    from union_indexer_node_spark.pipelines.dedup import lsh_candidate_pairs
    from union_indexer_node_spark.pipelines.similarity import (
        kmeans_assign,
        semantic_dup_flags,
    )
    from union_indexer_node_spark.pipelines.textstats import char_lm_quality
    from union_indexer_node_spark.pipelines.training import pack_next_fit

    no_docs = spark.createDataFrame([], "doc_id long, source string, text string")
    no_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")

    assert kmeans_assign(no_vecs, k=4, iters=2).count() == 0
    flags = semantic_dup_flags(no_vecs, hyperplanes(64, 8), k=4, iters=2)
    assert flags.count() == 0
    assert set(flags.columns) == {"vec_id", "cluster", "is_semantic_dup"}
    assert char_lm_quality(no_docs, "text", "doc_id").count() == 0
    assert (
        char_lm_quality(no_docs, "text", "doc_id", model_sample_rate=0.5).count()
        == 0
    )
    assert lsh_candidate_pairs(no_docs, "text", "doc_id", k=8, bands=4).count() == 0
    assert (
        pack_next_fit(
            no_docs.selectExpr("source", "doc_id", "CAST(1 AS LONG) AS n"),
            "n",
            "doc_id",
            budget=16,
            by="source",
        ).count()
        == 0
    )


def test_write_training_shards_deterministic_roundtrip(spark, tmp_path):
    """Sharded export: every row lands in exactly one md5-stable shard,
    the manifest matches the written data, and a re-export produces
    identical shard assignments."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.pipelines.dedup import token_count
    from union_indexer_node_spark.pipelines.training import write_training_shards

    d = (
        tables.load(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .withColumn("n_tokens", token_count(F.col("text")).cast("long"))
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        d, out, n_shards=8, id_col="doc_id", token_col="n_tokens"
    ).collect()
    assert sum(r.n_docs for r in manifest) == d.count()
    assert all(0 <= r.shard < 8 for r in manifest)

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    per_shard = {r.shard: r.n_docs for r in back.groupBy("shard").count().withColumnRenamed("count", "n_docs").collect()}
    assert per_shard == {r.shard: r.n_docs for r in manifest}
    tok = {r.shard: r.total_tokens for r in manifest}
    got_tok = {
        r.shard: r.t
        for r in back.groupBy("shard").agg(F.sum("n_tokens").cast("long").alias("t")).collect()
    }
    assert got_tok == tok

    # determinism: second export to a new path, same assignment
    out2 = str(tmp_path / "shards2")
    write_training_shards(d, out2, n_shards=8, id_col="doc_id")
    a = {(r.doc_id, r.shard) for r in spark.read.parquet(out).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in spark.read.parquet(out2).select("doc_id", "shard").collect()}
    assert a == b


def test_http_create_stream_id_rest_route(spark):
    """REST parity (controller.ts:6-40): unknown post -> stream_id
    null; post with offchain_id -> that id; flagged post with a
    snapshot assignment -> assigned id + trx."""
    pytest.importorskip("graphql")
    import json
    import threading
    import urllib.request

    from union_indexer_node_spark.serving.graphql_api import GraphQLService
    from union_indexer_node_spark.serving.http import serve

    posts = spark.createDataFrame(
        [
            ("alice", "p1", "k2t6existing", False),
            ("bob", "p2", None, True),
        ],
        "author string, permlink string, offchain_id string, needs_stream_id boolean",
    )
    assignments = spark.createDataFrame(
        [("bob", "p2", "k2t6new", "trx9")],
        "author string, permlink string, stream_id string, trx_id string",
    )
    svc = GraphQLService(posts=posts, stream_assignments=assignments)
    server = serve(svc, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_port}/api/v1/create_stream_id"

    def post(body):
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            return json.loads(resp.read())

    try:
        assert post({"author": "nope", "permlink": "x"}) == {"stream_id": None}
        assert post({"author": "alice", "permlink": "p1"}) == {
            "stream_id": "k2t6existing"
        }
        assert post({"author": "bob", "permlink": "p2"}) == {
            "stream_id": "k2t6new",
            "trx_id": "trx9",
        }
    finally:
        server.shutdown()
        t.join(timeout=10)


def _png(w, h):
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"
    )


def _jpeg(w, h):
    # SOI + APP0(JFIF) + DQT-ish filler segment + SOF0 carrying dims
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x01\x01" + b"\x00" * 7
    filler = b"\xff\xdb" + (5).to_bytes(2, "big") + b"\x00" * 3
    sof0 = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + b"\x08"  # precision
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03\x01\x11\x00"  # component stub
    )
    return b"\xff\xd8" + app0 + filler + sof0 + b"\xff\xd9"


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def test_header_dims_pure_parsers():
    """PNG IHDR / JPEG SOF / GIF logical-screen parsing with no codec
    lib; garbage and truncation return None instead of raising."""
    from union_indexer_node_spark.pipelines.multimodal import _header_dims

    assert _header_dims(_png(640, 480)) == (640, 480)
    assert _header_dims(_jpeg(1920, 1080)) == (1920, 1080)
    assert _header_dims(_gif(12, 7)) == (12, 7)
    assert _header_dims(b"") is None
    assert _header_dims(b"\x89PNG fake") is None
    assert _header_dims(_png(640, 480)[:20]) is None  # truncated IHDR
    assert _header_dims(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no SOF
    assert _header_dims(b"RIFF....WEBPVP8 ") is None


def test_header_dims_never_raises_on_fuzz_bytes():
    """The header parsers must be total: arbitrary byte strings —
    including ones starting with valid signatures — return None or a
    dimension tuple, never raise (one corrupt blob must not fail a
    worker)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from union_indexer_node_spark.pipelines.multimodal import _header_dims

    prefixes = [b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"GIF87a"]

    @settings(max_examples=300, deadline=None)
    @given(
        prefix=st.sampled_from(prefixes),
        tail=st.binary(max_size=64),
    )
    def check(prefix, tail):
        out = _header_dims(prefix + tail)
        assert out is None or (
            isinstance(out, tuple) and len(out) == 2
        )

    check()


def test_kmeans_excludes_null_vectors(spark):
    """NULL embeddings are not clusterable: they are excluded from
    assignment (and from flags) rather than silently landing in an
    engine-dependent cluster via NULL-distance argmin."""
    from union_indexer_node_spark.pipelines.ann_lsh import hyperplanes
    from union_indexer_node_spark.pipelines.similarity import (
        kmeans_assign,
        semantic_dup_flags,
    )

    rows = [(i, [float(i % 3), 1.0]) for i in range(10)] + [(99, None)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(emb, k=2, iters=1)
    ids = {r.vec_id for r in out.collect()}
    assert 99 not in ids and len(ids) == 10
    flags = semantic_dup_flags(emb, hyperplanes(2, 8), k=2, iters=1)
    assert 99 not in {r.vec_id for r in flags.collect()}


def test_kmeans_update_is_single_exchange(spark):
    """Scale pin: one Lloyd update is ONE partial-aggregated exchange
    (map-side combine to k rows per partition before the shuffle) —
    never a corpus-wide explode or a second shuffle."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.pipelines.similarity import (
        _quantized,
        kmeans_centroids,
        kmeans_cluster_cols,
    )

    emb = tables.load(spark, SF_DIR, "embeddings")
    cents = kmeans_centroids(emb, k=4, iters=0)  # seeds only
    cluster, _ = kmeans_cluster_cols(cents)
    stats = (
        emb.select(F.col("vec_id"), _quantized("embedding", 1_000_000).alias("_q"))
        .select("_q", cluster)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Generate" not in plan, plan


def test_probe_media_default_real_dims(spark):
    """Default probe_media path returns REAL dimensions for
    PNG/JPEG/GIF bytes in any container; corrupt blobs of those
    formats yield (0,0,0) instead of failing the task."""
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    media = spark.createDataFrame(
        [
            (1, _png(32, 48), "image/png"),
            (2, _jpeg(640, 360), "image/jpeg"),
            (3, _gif(5, 9), "image/gif"),
            (4, b"\x89PNG corrupt", "image/png"),
            (5, b"not an image", "text/plain"),
        ],
        "id long, content binary, mime string",
    )
    out = {r.id: (r.width, r.height, r.n_frames) for r in probe_media(media).collect()}
    assert out[1] == (32, 48, 1)
    assert out[2] == (640, 360, 1)
    assert out[3] == (5, 9, 1)
    assert out[4] == (0, 0, 0)
    assert out[5] == (0, 0, 0)


def test_graphql_community_latest_feed_spkvideo_arg(spark):
    """The SDL must accept spkvideo on Community.latestFeed (reference
    schema.ts:215-216) and the predicate must reach the plan."""
    pytest.importorskip("graphql")
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.serving.graphql_api import GraphQLService

    posts = tables.posts(spark, SF_DIR).withColumn(
        "first_upload", F.col("event_id") % 2 == 0
    )
    communities = spark.createDataFrame(
        [("hive/hive-3", "hive-3", "c3", "about c3")],
        "_id string, name string, title string, about string",
    )
    svc = GraphQLService(posts=posts, communities=communities)
    body = svc.execute(
        """
        query {
          community(id: "hive-3") {
            latestFeed(spkvideo: {firstUpload: true},
                       pagination: {limit: 50}) {
              items { author permlink }
            }
          }
        }
        """
    )
    assert not body.get("errors"), body.get("errors")
    items = body["data"]["community"]["latestFeed"]["items"]
    assert items
    # every returned (author, permlink) must be a first_upload post
    keys = {(i["author"], i["permlink"]) for i in items}
    ok = {
        (r.author, r.permlink)
        for r in posts.filter("first_upload").select("author", "permlink").collect()
    }
    assert keys <= ok

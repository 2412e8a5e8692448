"""Dataops quality/determinism tests beyond the oracle hash-match:
planted near-duplicates are actually found, LSH approximations recall
against their brute-force oracles, multimodal plumbing round-trips.
"""

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.dataops.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from clickhouse_etl_spark.dataops.similarity import cosine_topk, lsh_bucket_topk
from clickhouse_etl_spark.dataops.text import language_id
from clickhouse_etl_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        # near-dup of 1 (one word changed)
        (2, "the quick brown fox jumps over the lazy cat near the river bank today"),
        (3, "completely different text about spark query engines and columnar execution"),
        # exact dup of 3
        (4, "completely different text about spark query engines and columnar execution"),
        (5, "unrelated short document"),
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_ngram_jaccard_finds_planted_pair(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.4).collect()}
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    assert (1, 5) not in pairs and (2, 5) not in pairs


def test_minhash_lsh_finds_planted_pair(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, n=3, threshold=0.4).collect()}
    assert (3, 4) in pairs  # exact dup always collides in every band
    assert (1, 2) in pairs  # high-jaccard near-dup
    assert all(5 not in p for p in pairs)


def test_simhash_near_dups_are_close(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert sigs[3] == sigs[4]                        # identical text
    assert ham(sigs[1], sigs[2]) <= 6                # near-dup: small distance
    assert ham(sigs[1], sigs[3]) > ham(sigs[1], sigs[2])  # unrelated farther


def test_simhash_deterministic_across_sessions(spark, docs):
    a = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert a == b


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk(emb, queries, k=5)
    approx = lsh_bucket_topk(emb, queries, k=5, n_tables=8, bits_per_table=4, dim=64)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    # 8 tables x 4 bits: multi-table OR-construction should recover the
    # majority of true top-5 even on weakly-correlated vectors
    assert recall >= 0.5, f"LSH recall collapsed: {recall}"
    # approximate results are a subset of legal candidates, ranked correctly
    assert all(r["rank"] >= 1 for r in approx.collect())


def test_langid_on_real_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = language_id(docs)
    preds = out.groupBy("lang_pred").count().collect()
    assert sum(r["count"] for r in preds) == docs.count()
    assert {r["lang_pred"] for r in preds} <= set(["de", "en", "es", "fr", "zh", "und"])


def test_multimodal_decode_batch_shapes(spark):
    from clickhouse_etl_spark.dataops.multimodal import attach_asset_meta, decode_assets

    df = spark.createDataFrame(
        [(1, b"0123456789"), (2, b"abcdef")], ["asset_id", "payload"]
    )
    assets = attach_asset_meta(df, media_type="image", fmt="png")
    out = decode_assets(assets)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert rows[1]["decode_ok"] is True
    assert rows[1]["n_bytes"] == 10
    assert rows[1]["width"] == 10 % 640 + 1  # deterministic fake decode
    assert rows[1]["n_channels"] == 3
    # unknown format -> decode_ok False (NotImplementedError path)
    bad = attach_asset_meta(df, media_type="image", fmt="tiff")
    out2 = {r["asset_id"]: r for r in decode_assets(bad).collect()}
    assert out2[1]["decode_ok"] is False and out2[1]["width"] is None


def test_connected_components_transitive_closure(spark):
    """a~b, b~c (a never directly paired with c) must collapse into ONE
    cluster labeled by the min id; isolated nodes label themselves."""
    from clickhouse_etl_spark.dataops.dedup import connected_components

    edges = spark.createDataFrame([(2, 1), (2, 3), (7, 8)], ["id_a", "id_b"])
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 8, 9]], ["doc_id"])
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 9}


def test_dup_clusters_one_survivor(spark):
    """Three copies of one text -> one cluster, one canonical row."""
    from clickhouse_etl_spark.dataops.dedup import dup_clusters

    text = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, text), (4, "completely different words here for sure ok")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in dup_clusters(df, n=3, threshold=0.9).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[1]["is_canonical"]
    assert rows[2]["cluster_id"] == 1 and not rows[2]["is_canonical"]
    assert rows[3]["cluster_size"] == 3
    assert rows[4]["cluster_id"] == 4 and rows[4]["cluster_size"] == 1


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from clickhouse_etl_spark.dataops.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    # probing half the cells should recover most of the true top-5
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"
    # determinism: same plan twice -> identical rows
    again = {(r["query_id"], r["neighbor_id"]) for r in
             ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4).collect()}
    assert a == again


def test_ivf_kmeans_centroids_beat_naive_on_clustered_data(spark):
    """VERDICT r3 #7: the deterministic k-means seeding (farthest-point
    + Lloyd) must beat the old first-N-by-id seeding where centroid
    quality actually matters — clustered corpora. (The sf* embeddings
    are isotropic random vectors, where no seeding can help; this
    builds a deterministic 16-cluster corpus instead.)"""
    import numpy as np

    import clickhouse_etl_spark.dataops.similarity as S

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(16, 32)) * 5
    pts = np.concatenate([c + rng.normal(size=(40, 32)) for c in centers])
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(pts)],
        ["vec_id", "embedding"],
    ).cache()
    df.count()
    queries = (
        df.filter(F.col("vec_id") % 40 == 7).limit(10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    brute = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(df, queries, k=5).collect()}

    def recall():
        a = {(r["query_id"], r["neighbor_id"])
             for r in S.ivf_topk(df, queries, k=5, n_centroids=16, n_probe=2).collect()}
        return len(a & brute) / len(brute)

    kmeans_recall = recall()

    def naive(corpus, n_centroids, vec_col, id_col, **kw):
        rows = corpus.orderBy(id_col).limit(n_centroids).select(vec_col).collect()
        return [[float(v) for v in r[vec_col]] for r in rows]

    orig = S._kmeans_centroids
    S._kmeans_centroids = naive
    try:
        naive_recall = recall()
    finally:
        S._kmeans_centroids = orig
    # measured at introduction: kmeans 1.00 vs naive 0.92 (n_probe=2/16)
    assert kmeans_recall > naive_recall
    assert kmeans_recall >= 0.95


def test_repetition_signals_known_values(spark):
    from clickhouse_etl_spark.dataops.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # top bigram "a b" x3, 6 tokens, 2 distinct
            (2, "x y z"),                # no repetition, 3 distinct bigram ties -> "x y" wins
            (3, "solo"),                 # single token: no bigram
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 6 and r1["n_distinct_tokens"] == 2
    assert r1["dup_token_ratio"] == pytest.approx(4 / 6)
    assert r1["top_bigram"] == "a b" and r1["top_bigram_count"] == 3
    assert r1["top_bigram_char_frac"] == pytest.approx(3 * 3 / 11)
    r2 = rows[2]
    assert r2["top_bigram"] == "x y" and r2["top_bigram_count"] == 1  # tie -> smallest gram
    r3 = rows[3]
    assert r3["top_bigram"] == "" and r3["top_bigram_count"] == 0
    assert r3["top_bigram_char_frac"] == 0.0 and r3["dup_token_ratio"] == 0.0


def test_boilerplate_ngrams_doc_frequency(spark):
    from clickhouse_etl_spark.dataops.text import boilerplate_ngrams

    docs = [(i, "common header text plus unique%d tail" % i) for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    hot = {r["gram"]: r["doc_freq"] for r in boilerplate_ngrams(df, n=3, min_doc_freq=5).collect()}
    assert hot["common header text"] == 10
    assert hot["header text plus"] == 10
    # distinct-per-doc: a gram repeated inside one doc counts once
    rep = spark.createDataFrame([(1, "a b c a b c a b c")], ["doc_id", "text"])
    out = boilerplate_ngrams(rep, n=3, min_doc_freq=1).collect()
    assert all(r["doc_freq"] == 1 for r in out)


def test_split_assign_deterministic_and_partitioned(spark, sf_dir):
    from clickhouse_etl_spark.dataops.text import split_assign

    docs = load_table(spark, sf_dir, "documents")
    a = split_assign(docs).groupBy("split").count().collect()
    b = split_assign(docs.repartition(7)).groupBy("split").count().collect()
    assert {r["split"]: r["count"] for r in a} == {r["split"]: r["count"] for r in b}
    counts = {r["split"]: r["count"] for r in a}
    total = sum(counts.values())
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / total > 0.6  # hash split lands near 80/10/10


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    from clickhouse_etl_spark.dataops.text import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    m = mixture_sample(docs).select("source", "doc_id", "rate_bp", "keep")
    per_src = (
        m.groupBy("source", "rate_bp")
        .agg(F.count("*").alias("n"), F.sum(F.col("keep").cast("int")).alias("k"))
        .collect()
    )
    # one rate per source, rates from the 4-step ladder
    assert len({r["source"] for r in per_src}) == len(per_src)
    assert {r["rate_bp"] for r in per_src} <= {2500, 5000, 7500, 10000}
    for r in per_src:
        if r["rate_bp"] == 10000:
            assert r["k"] == r["n"]  # full-rate source keeps everything
    # deterministic across evaluations
    k1 = m.filter("keep").count()
    k2 = mixture_sample(docs.repartition(5)).filter("keep").count()
    assert k1 == k2


# ---- behavior analytics (funnel / retention) ----


def _ev(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(microseconds=us), uid, et, 0.0, "{}")
        for eid, us, uid, et in rows
    ]
    return spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_funnel_greedy_order_and_window(spark):
    from clickhouse_etl_spark.dataops.behavior import US_PER_DAY, funnel_steps

    rows = [
        # user 1: full chain in order -> 3 steps
        (1, 0, 1, "view"), (2, 10, 1, "click"), (3, 20, 1, "purchase"),
        # user 2: click precedes the first view -> funnel stalls at 1
        (4, 0, 2, "click"), (5, 10, 2, "view"),
        # user 3: click lands beyond the 7-day window -> 1 step
        (6, 0, 3, "view"), (7, 8 * US_PER_DAY, 3, "click"),
        # user 4: purchase without click -> 1 step (no skipping)
        (8, 0, 4, "view"), (9, 10, 4, "purchase"),
        # user 5: no chain head at all -> 0 steps
        (10, 0, 5, "error"),
    ]
    out = {r["user_id"]: r["steps"] for r in funnel_steps(_ev(spark, rows)).collect()}
    assert out == {1: 3, 2: 1, 3: 1, 4: 1, 5: 0}


def test_retention_day_flags(spark):
    from clickhouse_etl_spark.dataops.behavior import US_PER_DAY, retention_cohorts

    rows = [
        # user 1: day0 and day1 -> retained_d1
        (1, 0, 1, "view"), (2, 1 * US_PER_DAY + 5, 1, "click"),
        # user 2: day0 and day7 -> retained_d7
        (3, 0, 2, "view"), (4, 7 * US_PER_DAY + 5, 2, "view"),
        # user 3: day0 only
        (5, 0, 3, "view"),
        # user 4: cohort day1, active day2 -> second cohort, retained_d1
        (6, 1 * US_PER_DAY, 4, "view"), (7, 2 * US_PER_DAY, 4, "view"),
    ]
    out = {
        r["cohort_day"]: (r["n_users"], r["retained_d1"], r["retained_d7"])
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    d0 = 19723  # 2024-01-01 in epoch days
    assert out[d0] == (3, 1, 1)
    assert out[d0 + 1] == (1, 1, 0)


def test_domain_cap_bounds_and_determinism(spark):
    from clickhouse_etl_spark.dataops.text import domain_cap

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", f"src{i % 3}", 10) for i in range(60)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    kept = domain_cap(docs, max_per_domain=5)
    per_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src == {"src0": 5, "src1": 5, "src2": 5}
    ids_a = sorted(r["doc_id"] for r in kept.collect())
    ids_b = sorted(r["doc_id"] for r in domain_cap(docs.repartition(7), max_per_domain=5).collect())
    assert ids_a == ids_b  # survivor set independent of physical layout


def test_quality_topk_plan_is_partial_topk(spark):
    """The global ranking must plan as TakeOrderedAndProject (or
    WindowGroupLimit) — never a full global sort of the corpus."""
    from clickhouse_etl_spark.dataops.text import quality_topk

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog", "en", "s", 44) for i in range(50)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    df = quality_topk(docs, k=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert ("TakeOrderedAndProject" in plan) or ("WindowGroupLimit" in plan)
    assert df.count() == 3


def test_pack_sequences_invariants(spark):
    """Concat-then-chunk packing: exclusive prefix offsets are contiguous
    per stream, pack assignment is start_offset div capacity, and span
    counts cover multi-capacity documents."""
    from clickhouse_etl_spark.dataops.chunking import pack_sequences

    rows = [
        # (doc_id, text, stream) — stream "a": 3+4+10 tokens, capacity 8
        (1, "w w w", "a"),
        (2, "x x x x", "a"),
        (3, " ".join(["y"] * 10), "a"),
        (4, "", "a"),              # empty doc occupies one slot
        (5, "z z", "b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, capacity=8).collect()
    }
    assert (out[1]["start_offset"], out[1]["pack_id"], out[1]["packs_spanned"]) == (0, 0, 1)
    assert (out[2]["start_offset"], out[2]["offset_in_pack"]) == (3, 3)
    # doc 3: starts at 7 (pack 0), 10 tokens -> ends at 16 (pack 2): spans 3
    assert (out[3]["start_offset"], out[3]["pack_id"], out[3]["packs_spanned"]) == (7, 0, 3)
    # empty doc: one slot at offset 17 -> pack 2, spans 1
    assert (out[4]["start_offset"], out[4]["n_tokens"], out[4]["packs_spanned"]) == (17, 0, 1)
    # stream b packs independently from offset 0
    assert (out[5]["start_offset"], out[5]["pack_id"]) == (0, 0)

    # sharded variant: each shard is its own independent stream
    sharded = pack_sequences(docs, capacity=8, shards=2).collect()
    by_id = {r["doc_id"]: r for r in sharded}
    assert by_id[2]["start_offset"] == 0 or by_id[1]["start_offset"] == 0
    # ADVICE r3: pack_id is namespaced by shard (p*shards + s) and the
    # shard column is emitted -> (stream, pack_id) never collides across
    # shards of one stream
    assert all(r["shard"] == r["doc_id"] % 2 for r in sharded)
    assert all(r["pack_id"] % 2 == r["shard"] for r in sharded)
    keys = [(r["source"], r["pack_id"], r["offset_in_pack"]) for r in sharded]
    assert len(keys) == len(set(keys))  # distinct docs -> distinct slots


def test_multimodal_resize_frames_features(spark):
    """Resize / frame-sample / feature-extract plumbing: schema
    contracts, 1→N frame explode, deterministic stub outputs, row-level
    error isolation for unknown formats."""
    from clickhouse_etl_spark.dataops.multimodal import (
        attach_asset_meta,
        extract_features,
        resize_assets,
        sample_frames,
    )
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, b"a" * 100), (2, b"b" * 5000), (3, None)], ["asset_id", "payload"]
    )
    imgs = attach_asset_meta(base, media_type="image", fmt="png")
    rs = {r["asset_id"]: r for r in resize_assets(imgs, 224, 224).collect()}
    assert rs[1]["resize_ok"] and rs[1]["width"] == 224 and len(rs[1]["payload"]) == 16
    assert not rs[3]["resize_ok"] and rs[3]["payload"] is None
    # deterministic: same input -> identical stub payload
    rs2 = {r["asset_id"]: r for r in resize_assets(imgs, 224, 224).collect()}
    assert rs[1]["payload"] == rs2[1]["payload"]
    # unknown format isolated, not fatal
    gifs = attach_asset_meta(base, media_type="image", fmt="gif")
    assert all(not r["resize_ok"] for r in resize_assets(gifs, 64, 64).collect())

    vids = attach_asset_meta(base, media_type="video", fmt="mp4")
    frames = sample_frames(vids, every_ms=1000, max_frames=4).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 100-byte "video" = 100ms -> 0 frames; 5000ms -> capped at 4
    assert 1 not in by_asset and len(by_asset[2]) == 4
    assert [r["frame_ts_ms"] for r in sorted(by_asset[2], key=lambda r: r["frame_index"])] == [0, 1000, 2000, 3000]
    # non-video rows yield nothing
    assert sample_frames(imgs, every_ms=1000).count() == 0

    feats = {r["asset_id"]: r for r in extract_features(imgs, dim=16).collect()}
    assert feats[1]["feature_ok"] and len(feats[1]["feature"]) == 16
    import math
    assert math.isclose(sum(x * x for x in feats[1]["feature"]), 1.0, rel_tol=1e-5)
    assert not feats[3]["feature_ok"]
    # composes with the similarity ops: array<float> column shape
    from clickhouse_etl_spark.dataops.similarity import cosine_topk
    emb = (
        extract_features(imgs, dim=16)
        .filter(F.col("feature_ok"))
        .select(F.col("asset_id").alias("vec_id"), F.col("feature").alias("embedding"))
    )
    topk = cosine_topk(emb, emb.limit(1).select(F.col("vec_id").alias("query_id"), "embedding"), k=1)
    assert topk.count() == 1


def test_lsh_near_dup_pairs_recall(spark, sf_dir):
    """The LSH pair generator must find a usable fraction of the exact
    near-dup pairs (recall compounds across tables) and never invent a
    below-threshold pair (precision 1.0 — exact verify stage)."""
    from clickhouse_etl_spark.dataops.similarity import (
        embedding_near_dup_pairs,
        lsh_near_dup_pairs,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(emb, threshold=0.45).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in lsh_near_dup_pairs(emb, threshold=0.45, n_tables=12, bits_per_table=4).collect()}
    assert approx <= exact                      # precision 1.0
    assert exact and len(approx) / len(exact) >= 0.5  # usable recall
    # the clustering stage composes unchanged
    out = semantic_dedup(emb, threshold=0.45, method="lsh")
    assert out.filter("is_kept").count() <= out.count()


def test_quadratic_guard_fires(spark, sf_dir):
    """VERDICT r3 #8: the exact quadratic baselines refuse inputs above
    broadcast scale (max_rows guard) and point at the LSH path; the LSH
    method itself is unguarded."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.similarity import (
        embedding_near_dup_pairs,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    with _pytest.raises(ValueError, match="quadratic"):
        embedding_near_dup_pairs(emb, threshold=0.45, max_rows=n - 1)
    with _pytest.raises(ValueError, match="lsh_near_dup_pairs"):
        semantic_dedup(emb, threshold=0.45, method="exact", max_rows=n - 1)
    # under the cap / disabled: plan builds
    assert embedding_near_dup_pairs(emb, threshold=0.45, max_rows=n).columns == ["id_a", "id_b", "sim"]
    assert embedding_near_dup_pairs(emb, threshold=0.45, max_rows=None).columns == ["id_a", "id_b", "sim"]
    # lsh path never counts the input
    semantic_dedup(emb, threshold=0.45, method="lsh", max_rows=n - 1)


def test_span_dedup_planted_duplicate_spans(spark):
    from clickhouse_etl_spark.dataops.dedup import span_dedup

    block = " ".join(f"w{i}" for i in range(16))        # one full 16-token span
    other = " ".join(f"x{i}" for i in range(16))
    df = spark.createDataFrame(
        [
            (1, block + " " + other),                   # first occurrence of both
            (2, block + " " + block),                   # both spans are copies of doc 1's
            (3, other),                                 # one span, already seen
            (4, ""),                                    # no tokens -> omitted
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in span_dedup(df, span_tokens=16).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["dup_spans"] == 0
    assert out[2]["n_spans"] == 2 and out[2]["dup_spans"] == 2
    assert out[2]["dup_permille"] == 1000
    assert out[3]["n_spans"] == 1 and out[3]["dup_spans"] == 1
    assert 4 not in out


def test_rare_token_ratio_flags_tail_vocab(spark):
    from clickhouse_etl_spark.dataops.text import rare_token_ratio

    common = "the the the the"
    df = spark.createDataFrame(
        [(i, common) for i in range(1, 9)] + [(9, common + " zyzzyx")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in rare_token_ratio(df, k_rare=1).collect()}
    # 'zyzzyx' (df=1) is the single rarest term; 'the' (df=9) is not
    assert out[9]["n_rare"] == 1 and out[9]["n_tokens"] == 5
    assert out[9]["rare_permille"] == 200
    assert all(out[i]["n_rare"] == 0 for i in range(1, 9))


def test_balanced_sample_equal_classes_deterministic(spark):
    from clickhouse_etl_spark.dataops.similarity import balanced_sample

    rows = [(i, [0.0], i % 3) for i in range(30)] + [(100 + i, [0.0], 0) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = balanced_sample(df).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r["vec_id"])
    # min class size is 10 (labels 1 and 2); every label keeps exactly 10
    assert {len(v) for v in by_label.values()} == {10}
    assert set(by_label) == {0, 1, 2}
    # deterministic: a second run picks the identical sample
    again = balanced_sample(df).collect()
    assert sorted((r["vec_id"], r["label"]) for r in out) == sorted(
        (r["vec_id"], r["label"]) for r in again
    )


def test_quality_deciles_bounds_and_monotonicity(spark, sf_dir):
    from clickhouse_etl_spark.dataops.text import quality_deciles

    docs = load_table(spark, sf_dir, "documents")
    out = quality_deciles(docs).collect()
    assert len(out) == docs.count()
    assert all(1 <= r["decile"] <= 10 for r in out)
    # monotone: a higher quality score never lands in a lower decile
    rows = sorted(out, key=lambda r: r["qm"])
    for a, b in zip(rows, rows[1:]):
        assert a["decile"] <= b["decile"]


def test_dedup_against_drops_seen_and_within_wave(spark):
    from clickhouse_etl_spark.dataops.dedup import dedup_against

    seen = spark.createDataFrame(
        [(1, "known content"), (2, "other known")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (10, "known content"),    # dup of seen -> dropped
            (11, "fresh content"),    # survives
            (12, "fresh content"),    # within-wave dup of 11 -> dropped
            (13, "more new text"),    # survives
        ],
        ["doc_id", "text"],
    )
    kept = sorted(r["doc_id"] for r in dedup_against(new, seen).collect())
    assert kept == [11, 13]


def test_epoch_shuffle_permutes_across_epochs(spark, sf_dir):
    from clickhouse_etl_spark.dataops.chunking import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents")
    e0 = epoch_shuffle(docs, epoch=0, n_shards=8)
    n = docs.count()
    rows0 = e0.collect()
    assert len(rows0) == n
    # every (shard, pos) slot is unique and positions are 1..shard_size
    slots = {(r["shard"], r["pos"]) for r in rows0}
    assert len(slots) == n
    by_shard = {}
    for r in rows0:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different epoch yields a different global order, deterministically
    order1 = [r["doc_id"] for r in sorted(epoch_shuffle(docs, epoch=1, n_shards=8).collect(), key=lambda r: (r["shard"], r["pos"]))]
    order0 = [r["doc_id"] for r in sorted(rows0, key=lambda r: (r["shard"], r["pos"]))]
    assert order0 != order1
    again = [r["doc_id"] for r in sorted(epoch_shuffle(docs, epoch=1, n_shards=8).collect(), key=lambda r: (r["shard"], r["pos"]))]
    assert order1 == again


def test_upsample_mixture_copy_counts(spark):
    from clickhouse_etl_spark.dataops.text import upsample_mixture

    df = spark.createDataFrame(
        [(i, f"src{i % 4}", "x") for i in range(200)], ["doc_id", "source", "text"]
    )
    out = upsample_mixture(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_idx"])
    # copy_idx is exactly 1..n_copies for every emitted doc
    for rows, n in ((v, len(v)) for v in by_doc.values()):
        assert sorted(rows) == list(range(1, n + 1))
    # rates above 10000 bp guarantee at least floor(rate) copies per doc
    from clickhouse_etl_spark.dataops.hashing import HASH_MOD
    n_copies = {r["doc_id"]: r["n_copies"] for r in out}
    for r in out:
        assert len(by_doc[r["doc_id"]]) == n_copies[r["doc_id"]]


def test_pq_topk_recall_vs_brute_force(spark, sf_dir):
    from clickhouse_etl_spark.dataops.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk(emb, queries, k=5)
    approx = pq_topk(emb, queries, k=5, m=8, n_codes=16, shortlist_factor=8)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    rows = approx.collect()
    a = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(a & b) / len(b)
    # ADC over 8x16 codebooks with an 8x shortlist + exact re-rank:
    # 0.70 measured on these weakly-clustered synthetic vectors (real
    # embedding spaces cluster better); the floor guards collapse
    assert recall >= 0.6, f"PQ recall collapsed: {recall}"
    # re-ranked output is exact-cosine ordered with a total tie-break
    assert all(r["rank"] >= 1 for r in rows)
    # deterministic: identical output across runs (codebooks are RNG-free)
    again = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in
             pq_topk(emb, queries, k=5, m=8, n_codes=16, shortlist_factor=8).collect()}
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rows} == again


def test_pq_encode_codes_in_range(spark, sf_dir):
    from clickhouse_etl_spark.dataops.similarity import _pq_codebooks, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    books = _pq_codebooks(emb, m=8, n_codes=16, vec_col="embedding", id_col="vec_id")
    assert len(books) == 8 and all(len(b) <= 16 for b in books)
    out = pq_encode(emb, books).collect()
    assert len(out) == emb.count()
    for r in out[:50]:
        assert len(r["pq_codes"]) == 8
        assert all(0 <= c < 16 for c in r["pq_codes"])
    # the Arrow-batched encoder and the pure-Catalyst reference form
    # must emit bit-identical codes (same fold order, same tie rule)
    cat = {r["vec_id"]: list(r["pq_codes"])
           for r in pq_encode(emb, books, engine="catalyst").collect()}
    assert {r["vec_id"]: list(r["pq_codes"]) for r in out} == cat


def test_ivf_pq_topk_recall_vs_brute_force(spark, sf_dir):
    from clickhouse_etl_spark.dataops.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk(emb, queries, k=5)
    approx = ivf_pq_topk(emb, queries, k=5, n_centroids=16, n_probe=8)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    # cell misses compound with quantization error: floor guards collapse
    assert recall >= 0.5, f"IVF+PQ recall collapsed: {recall}"


def test_r4_ops_edge_cases(spark):
    """Degenerate inputs: empty seen corpus, single label, one shard,
    empty documents — the shapes that break naive window/agg code."""
    from clickhouse_etl_spark.dataops.chunking import epoch_shuffle
    from clickhouse_etl_spark.dataops.dedup import dedup_against, span_dedup
    from clickhouse_etl_spark.dataops.similarity import balanced_sample
    from clickhouse_etl_spark.dataops.text import quality_deciles, rare_token_ratio

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "")], ["doc_id", "text"]
    )
    empty_seen = spark.createDataFrame([], "doc_id long, text string")
    # empty seen corpus -> pure within-batch first-wins
    kept = sorted(r["doc_id"] for r in dedup_against(docs, empty_seen).collect())
    assert kept == [1, 3]
    # empty text contributes no spans; the other docs dedupe against each other
    spans = {r["doc_id"]: r["dup_spans"] for r in span_dedup(docs).collect()}
    assert spans == {1: 0, 2: 1}
    # single label -> everything kept, ranks are a permutation
    one_label = spark.createDataFrame(
        [(i, [0.0], 7) for i in range(5)], ["vec_id", "embedding", "label"]
    )
    out = balanced_sample(one_label).collect()
    assert sorted(r["sample_rank"] for r in out) == [1, 2, 3, 4, 5]
    # one shard -> positions are 1..n
    sh = epoch_shuffle(docs, n_shards=1).collect()
    assert sorted(r["pos"] for r in sh) == [1, 2, 3]
    assert {r["shard"] for r in sh} == {0}
    # deciles on a tiny corpus stay within [1, 10]
    dec = quality_deciles(docs).collect()
    assert len(dec) == 3 and all(1 <= r["decile"] <= 10 for r in dec)
    # rare-token ratio: empty doc has no tokens -> omitted from output
    rt = {r["doc_id"] for r in rare_token_ratio(docs, k_rare=1).collect()}
    assert rt == {1, 2}


def test_plan_mixture_rates_hits_target_shares(spark):
    from clickhouse_etl_spark.dataops.text import (
        plan_mixture_rates,
        upsample_mixture,
    )

    # measured corpus: web-heavy, code-light; recipe wants the reverse tilt
    source_tokens = {"web": 1_000_000, "code": 100_000, "books": 300_000}
    targets = {"web": 0.5, "code": 0.3, "books": 0.2}
    rates = plan_mixture_rates(source_tokens, targets, max_epochs=3.0)
    # the scarce source (code) binds at the epoch cap
    assert rates["code"] == 30000
    # achieved token shares match the recipe
    achieved = {s: source_tokens[s] * bp / 10000 for s, bp in rates.items()}
    total = sum(achieved.values())
    for s, w in targets.items():
        assert abs(achieved[s] / total - w) < 0.01, (s, achieved)
    # no rate exceeds the epoch cap
    assert all(bp <= 30000 for bp in rates.values())

    # the rates drive the distributed op: expected copies per doc
    df = spark.createDataFrame(
        [(i, "code", "x") for i in range(100)]
        + [(1000 + i, "web", "x") for i in range(100)]
        + [(2000 + i, "unknown", "x") for i in range(10)],
        ["doc_id", "source", "text"],
    )
    out = upsample_mixture(df, rates_bp=rates).collect()
    by_src = {}
    for r in out:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    # code at exactly 3.0 epochs -> every doc exactly 3 copies
    assert by_src["code"] == 300
    # unmapped sources get rate 0 -> dropped entirely
    assert "unknown" not in by_src
    # web rate is fractional (< 1 epoch): copies strictly between 0 and 100
    assert 0 < by_src["web"] < 100


def test_plan_mixture_rates_validation():
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.text import plan_mixture_rates

    with _pytest.raises(ValueError, match="positive weights"):
        plan_mixture_rates({"a": 10}, {})
    with _pytest.raises(ValueError, match="no measured tokens"):
        plan_mixture_rates({"a": 10}, {"a": 0.5, "b": 0.5})


def test_pool_frame_features_contract(spark):
    from clickhouse_etl_spark.dataops.multimodal import (
        attach_asset_meta,
        pool_frame_features,
    )

    df = spark.createDataFrame(
        [
            (1, b"0123456789" * 400),   # "video" of 4000ms -> 4 frames at 1s
            (2, b"ab"),                 # too short for any frame
        ],
        ["asset_id", "payload"],
    )
    assets = attach_asset_meta(df, media_type="video", fmt="mp4")
    out = {r["asset_id"]: r for r in pool_frame_features(assets, dim=16).collect()}
    assert 1 in out and 2 not in out
    r = out[1]
    assert r["n_frames"] == 4
    assert len(r["embedding"]) == 16
    # mean of L2-normalized frame features: norm in (0, 1]
    nrm = sum(v * v for v in r["embedding"]) ** 0.5
    assert 0 < nrm <= 1.0 + 1e-9
    # deterministic across runs
    again = {r["asset_id"]: list(r["embedding"])
             for r in pool_frame_features(assets, dim=16).collect()}
    assert again[1] == list(r["embedding"])
    # non-video assets yield nothing
    images = attach_asset_meta(df, media_type="image", fmt="png")
    assert pool_frame_features(images, dim=16).count() == 0


def test_ann_empty_query_set_returns_empty(spark, sf_dir):
    """ADVICE r5: pq_topk/ivf_pq_topk on an empty query set must return
    an empty frame with the standard schema, not crash on (0,)-shaped
    numpy slicing."""
    from clickhouse_etl_spark.dataops.similarity import ivf_pq_topk, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    none = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for fn in (pq_topk, ivf_pq_topk):
        out = fn(emb, none, k=3)
        assert out.columns == ["query_id", "neighbor_id", "rank", "sim"]
        assert out.count() == 0


def test_ann_query_collect_guard(spark, sf_dir):
    """VERDICT r4 #6: the driver-side LUT query collect is bounded —
    oversized query sets get an actionable error, not a driver OOM."""
    import pytest

    from clickhouse_etl_spark.dataops.similarity import ivf_pq_topk, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(20).select(F.col("vec_id").alias("query_id"), "embedding")
    for fn in (pq_topk, ivf_pq_topk):
        with pytest.raises(ValueError, match="max_queries"):
            fn(emb, queries, k=3, max_queries=5)
        # and None disables the guard
        assert fn(emb, queries.limit(3), k=3, max_queries=None).count() > 0


def test_cells_batched_zero_norm_vector_deterministic(spark):
    """ADVICE r5: a zero-norm vector must get a deterministic cell (tie
    rule over sim=-inf), not NaN-ordering-dependent garbage."""
    from clickhouse_etl_spark.dataops.similarity import _cells_batched

    cents = [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]]
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.1]), (3, [0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: list(r["_cells"])
           for r in _cells_batched(df, cents, 2, "vec_id", "embedding").collect()}
    # degenerate vectors: all sims tie at -inf -> index-descending tie rule
    assert out[1] == out[3] == [2, 1]
    # a normal vector is unaffected
    assert out[2][0] == 0
    again = {r["vec_id"]: list(r["_cells"])
             for r in _cells_batched(df, cents, 2, "vec_id", "embedding").collect()}
    assert out == again


def test_plan_mixture_rates_rejects_zero_token_source(spark):
    import pytest

    from clickhouse_etl_spark.dataops.text import plan_mixture_rates

    with pytest.raises(ValueError, match="<= 0"):
        plan_mixture_rates({"web": 1000, "code": 0}, {"web": 0.7, "code": 0.3})


def test_balanced_sample_spec_surface_documents_defaults(spark):
    """ADVICE r5: the dataop spec surface defaults balanced_sample to the
    documents stream (doc_id/source) like every other registered op."""
    from clickhouse_etl_spark.plans.compiler import resolve_dataop

    docs = spark.createDataFrame(
        [(1, "a", "web"), (2, "b", "web"), (3, "c", "code")],
        ["doc_id", "text", "source"],
    )
    out = resolve_dataop("balanced_sample")(docs).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["web"]) == len(by_src["code"]) == 1


@pytest.mark.heavy
def test_pq_index_persisted_equals_fresh_build(spark, sf_dir, tmp_path):
    """VERDICT r4 #2: the persisted-index query path answers exactly what
    the fresh-build ivf_pq_topk answers (same deterministic index, shared
    answer stage) — for both self-contained and codes-only indexes."""
    from clickhouse_etl_spark.dataops.similarity import (
        ivf_pq_topk,
        pq_index_build,
        pq_index_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fresh = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
        for r in ivf_pq_topk(emb, queries, k=5, n_centroids=16, n_probe=8).collect()
    )

    path = str(tmp_path / "idx")
    meta = pq_index_build(emb, path, n_centroids=16, m=8, n_codes=16)
    assert meta["dim"] == 64 and meta["store_vectors"]
    persisted = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
        for r in pq_index_query(spark, path, queries, k=5, n_probe=8).collect()
    )
    assert persisted == fresh and len(fresh) > 0

    # codes-only index: caller supplies the corpus for the re-rank
    lean_path = str(tmp_path / "idx_lean")
    pq_index_build(emb, lean_path, n_centroids=16, m=8, n_codes=16,
                   store_vectors=False)
    lean = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
        for r in pq_index_query(
            spark, lean_path, queries, k=5, n_probe=8, corpus=emb
        ).collect()
    )
    assert lean == fresh
    # ...and refuses to re-rank without vectors
    import pytest
    with pytest.raises(ValueError, match="store_vectors"):
        pq_index_query(spark, lean_path, queries, k=5, n_probe=8)

    # the codes table is partitioned by cell (partition-pruned probes)
    import os
    parts = [d for d in os.listdir(f"{path}/codes") if d.startswith("cell=")]
    assert len(parts) > 1


def test_r5_text_ops_edge_cases(spark):
    """Short documents (0/1/2 tokens) through the bigram/k-gram ops:
    empty-array guards must hold (Spark's sequence() would DESCEND on
    stop < start) and ratios must stay defined."""
    from clickhouse_etl_spark.dataops.text import (
        bigram_pmi,
        kgram_novelty,
        lm_familiarity,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "one two three"),
         (5, "one two three")],
        ["doc_id", "text"],
    )
    fam = {r["doc_id"]: r for r in lm_familiarity(docs).collect()}
    assert len(fam) == 5
    assert fam[1]["n_bigrams"] == 0 and fam[1]["familiarity"] == 0.0
    assert fam[2]["n_bigrams"] == 0
    # 'one two' occurs in docs 3,4,5 -> count 3; 'two three' in 4,5 -> 2
    assert fam[3]["familiarity"] == 3.0
    assert fam[4]["familiarity"] == (3 + 2) / 2

    nov = {r["doc_id"]: r for r in kgram_novelty(docs, k=3).collect()}
    assert nov[1]["n_grams"] == 0 and nov[1]["novelty_ratio"] == 0.0
    assert nov[4]["n_grams"] == 1 and nov[4]["n_novel"] == 1
    assert nov[5]["n_grams"] == 1 and nov[5]["n_novel"] == 0

    pmi = bigram_pmi(docs, top_k=10, min_count=2).collect()
    assert [r["rank"] for r in pmi] == list(range(1, len(pmi) + 1))
    assert all(r["c_ab"] >= 2 for r in pmi)


def test_r5_embedding_ops_edge_cases(spark):
    """mean_center: exact integer-derived mean (order-independent);
    truncate_renorm: zero prefix yields null unit vector, not NaN."""
    from clickhouse_etl_spark.dataops.similarity import mean_center, truncate_renorm

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0]), (2, [3.0, 0.0, 4.0]), (3, [5.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: list(r["centered"]) for r in mean_center(emb).collect()}
    assert abs(out[1][0] - (1.0 - 3.0)) < 1e-9   # mean dim0 = 3.0 exactly
    assert out[1][1] == 0.0
    # shuffled input order produces the IDENTICAL mean (integer sums)
    out2 = {
        r["vec_id"]: list(r["centered"])
        for r in mean_center(emb.orderBy(F.col("vec_id").desc())).collect()
    }
    assert out == out2

    tr = {r["vec_id"]: r for r in truncate_renorm(emb, d=2).collect()}
    assert abs(tr[1]["trunc_norm"] - 1.0) < 1e-12
    assert list(tr[1]["truncated"]) == [1.0, 0.0]
    zero = spark.createDataFrame([(9, [0.0, 0.0, 1.0])], ["vec_id", "embedding"])
    z = truncate_renorm(zero, d=2).collect()[0]
    assert z["trunc_norm"] == 0.0 and z["truncated"] is None


def test_bpe_learn_textbook_example(spark):
    """The Sennrich et al. worked example: corpus of {low, lower, newest,
    widest} with counts — the first merges must be the classic ones, and
    the whole run must be a pure function of the corpus (shuffled input
    gives identical merges)."""
    from clickhouse_etl_spark.dataops.bpe import EOW, learn_bpe

    rows = (
        [(i, "low") for i in range(5)]
        + [(100 + i, "lower") for i in range(2)]
        + [(200 + i, "newest") for i in range(6)]
        + [(300 + i, "widest") for i in range(3)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = learn_bpe(docs, n_merges=6)
    got = [(m["left"], m["right"]) for m in merges]
    # 'es' (9: newest 6 + widest 3) is the most frequent pair; then
    # 'est' (9), then 'est</w>' (9); 'lo' (7: low 5 + lower 2) follows
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")
    assert got[2] == ("est", EOW)
    assert got[3] == ("l", "o")
    assert got[4] == ("lo", "w")
    assert merges[0]["pair_count"] == 9
    assert merges[3]["pair_count"] == 7
    # determinism under input order
    again = learn_bpe(docs.orderBy(F.col("doc_id").desc()), n_merges=6)
    assert [(m["left"], m["right"], m["pair_count"]) for m in merges] == [
        (m["left"], m["right"], m["pair_count"]) for m in again
    ]


def test_bpe_segment_and_apply(spark):
    """Segmentation follows merge rank order (lowest rank first); the
    Arrow-batched apply matches per-word segmentation and handles empty
    documents."""
    from clickhouse_etl_spark.dataops.bpe import (
        EOW,
        apply_bpe,
        bpe_segment_word,
        learn_bpe,
    )

    docs = spark.createDataFrame(
        [(i, "low") for i in range(5)] + [(10, "lowest"), (11, ""), (12, "low lowest")],
        ["doc_id", "text"],
    )
    merges = learn_bpe(docs, n_merges=10)
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    seg = bpe_segment_word("low", ranks)
    assert "".join(seg) == "low" + EOW
    out = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
    assert out[11]["n_words"] == 0 and out[11]["n_bpe_tokens"] == 0
    assert out[0]["n_bpe_tokens"] == len(seg)
    assert out[12]["n_bpe_tokens"] == len(seg) + len(bpe_segment_word("lowest", ranks))
    # more merges can only compress: ratio bounded below by 1/word... and
    # every word yields at least one symbol
    assert all(r["n_bpe_tokens"] >= r["n_words"] for r in out.values())


def test_bpe_matches_pure_python_reference(spark, sf_dir):
    """The Spark word-count + driver merge-loop pipeline must equal a
    single-process reference BPE run over the same corpus sample."""
    from collections import Counter

    from clickhouse_etl_spark.dataops.bpe import EOW, learn_bpe
    from clickhouse_etl_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    rows = docs.select("text").collect()
    # pure-python reference: same tokenization, same greedy rule
    wc = Counter()
    for r in rows:
        for w in (r["text"] or "").lower().split(" "):
            if w:
                wc[w] += 1
    vocab = Counter()
    for w, c in wc.items():
        vocab[tuple(w) + (EOW,)] += c
    ref = []
    for _ in range(12):
        pc = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        (l, r_), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        nv = Counter()
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == r_:
                    out.append(l + r_)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] += c
        vocab = nv
        ref.append((l, r_, cnt))
    got = [
        (m["left"], m["right"], m["pair_count"])
        for m in learn_bpe(docs, n_merges=12)
    ]
    assert got == ref


def test_matryoshka_ann_recall_floor(spark, sf_dir):
    """Coarse-to-fine prefix retrieval: recall vs full brute force stays
    above a loose floor even on these unstructured synthetic vectors
    (a 16-of-64 prefix of noise — real MRL embeddings concentrate
    signal in the prefix and sit near 1.0)."""
    from clickhouse_etl_spark.queries import QUERIES

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, qs, k=5).collect()}
    mrl = {(r["query_id"], r["neighbor_id"])
           for r in QUERIES["emb_matryoshka_ann_topk"].fn(spark, sf_dir).collect()}
    recall = len(mrl & brute) / len(brute)
    assert recall >= 0.2, recall


def test_snapshot_diff_statuses(spark):
    from clickhouse_etl_spark.dataops.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c-changed"), (4, "d")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


@pytest.mark.heavy
def test_pq_index_append_wave_equals_one_shot_encode(spark, sf_dir, tmp_path):
    """Index lifecycle: build on wave 1, append wave 2 with the STORED
    codebooks — querying the grown index equals querying an index whose
    codes were all produced by those same (wave-1-trained) codebooks in
    one shot."""
    from clickhouse_etl_spark.dataops.similarity import (
        pq_index_append,
        pq_index_build,
        pq_index_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    wave1 = emb.filter(F.col("vec_id") % 2 == 0)
    wave2 = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    grown = str(tmp_path / "grown")
    pq_index_build(wave1, grown, n_centroids=16, m=8, n_codes=16)
    pq_index_append(spark, grown, wave2)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
        for r in pq_index_query(spark, grown, queries, k=5, n_probe=8).collect()
    )

    assert len(got) > 0
    # the grown index answers over BOTH waves (odd and even neighbors)
    ids = {nid for _, nid, _, _ in got}
    assert any(i % 2 == 0 for i in ids) and any(i % 2 == 1 for i in ids)

    # independent reference: the appended wave-2 codes must equal a
    # fresh pq_encode of wave 2 with the codebooks READ BACK from the
    # index (not the in-memory ones) — proves append used the stored
    # artifact, not retraining
    from clickhouse_etl_spark.dataops.similarity import pq_encode

    books_rows = spark.read.parquet(f"{grown}/codebooks").collect()
    meta = spark.read.parquet(f"{grown}/meta").collect()[0].asDict()
    books = [[None] * meta["n_codes"] for _ in range(meta["m"])]
    for r in books_rows:
        books[r["subspace"]][r["code"]] = list(r["centroid"])
    books = [[c for c in sub if c is not None] for sub in books]
    stored = {
        r["vec_id"]: list(r["codes"])
        for r in spark.read.parquet(f"{grown}/codes")
        .filter(F.col("vec_id") % 2 == 1)
        .collect()
    }
    fresh = {
        r["vec_id"]: list(r["pq_codes"]) for r in pq_encode(wave2, books).collect()
    }
    assert stored == fresh and len(stored) == wave2.count()


def test_percentile_threshold_gate_keeps_top_fraction(spark):
    from clickhouse_etl_spark.dataops.text import percentile_threshold_gate

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], ["doc_id", "v"]
    )
    kept = percentile_threshold_gate(df, "v", 0.6).collect()
    # 40th percentile of 1..100 (fixed-point exact) is 40.6 -> keep v >= 40.6
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == list(range(41, 101))
    # gate columns are dropped
    assert set(kept[0].asDict()) == {"doc_id", "v"}


def test_percentile_threshold_gate_ties_and_empty(spark):
    from clickhouse_etl_spark.dataops.text import percentile_threshold_gate

    # all-equal values: threshold == the value -> keep-all-ties keeps everything
    df = spark.createDataFrame([(i, 7.5) for i in range(20)], ["doc_id", "v"])
    assert percentile_threshold_gate(df, "v", 0.3).count() == 20
    # empty input: NULL percentile gates everything out, no crash
    assert percentile_threshold_gate(df.filter("doc_id < 0"), "v", 0.5).count() == 0


def test_sample_codebook_pq_recall_floor(spark, sf_dir):
    """The oracle-backed registry variant (SQL-derivable sample
    codebooks, no Lloyd) must still retrieve: exact re-rank over an 8x
    ADC shortlist keeps recall well above collapse even with unrefined
    codebooks."""
    from clickhouse_etl_spark.dataops.similarity import (
        cosine_topk,
        pq_topk,
        sample_codebooks,
        sample_centroids,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=10).collect()
    }
    books = sample_codebooks(emb, m=8, n_codes=16)
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, q, k=10, codebooks=books, emit_adc=True).collect()
    }
    assert len(pq & exact) / len(exact) >= 0.5, "sample-codebook PQ recall collapsed"
    cents = sample_centroids(emb, n_centroids=16)
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=10, n_probe=4, centroids=cents).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.4, "sample-centroid IVF recall collapsed"


def test_bpe_vocab_overflow_contract(spark):
    """VERDICT r5 #8: when the corpus's distinct-word count exceeds
    max_vocab, learn_bpe must report how hard the bound bit."""
    from clickhouse_etl_spark.dataops.bpe import learn_bpe

    docs = spark.createDataFrame(
        [(i, f"common common w{i} w{i+1000}") for i in range(50)],
        ["doc_id", "text"],
    )
    merges, stats = learn_bpe(docs, n_merges=4, max_vocab=10, return_stats=True)
    assert stats["kept_words"] == 10
    assert stats["distinct_words"] > 10
    assert stats["truncated_words"] == stats["distinct_words"] - 10
    assert stats["kept_occurrences"] < stats["total_occurrences"]
    frac = stats["truncated_occurrence_fraction"]
    assert 0 < frac < 1
    assert frac == (
        (stats["total_occurrences"] - stats["kept_occurrences"])
        / stats["total_occurrences"]
    )
    # unbounded run reports zero truncation
    _, full = learn_bpe(docs, n_merges=4, max_vocab=100_000, return_stats=True)
    assert full["truncated_words"] == 0
    assert full["truncated_occurrence_fraction"] == 0.0
    # bounded vs unbounded merges may differ; both are deterministic
    assert merges == learn_bpe(docs, n_merges=4, max_vocab=10)


def test_bpe_vocab_registry_entry_handles_zero_merges(spark, tmp_path):
    """ADVICE r5: a corpus with no repeating pair yields an EMPTY merge
    list; the registry entry must return an empty frame with the
    declared schema, not crash on schema inference."""
    from clickhouse_etl_spark.queries import QUERIES

    docs = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = QUERIES["docs_bpe_vocab"].fn(spark, str(tmp_path))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "rank", "left", "right", "merged", "pair_count",
    ]


def test_digest_lifecycle_null_text_policy(spark, tmp_path):
    """ADVICE r5: null text must dedup like empty text across waves —
    md5(NULL) never matches an anti-join, so without the coalesce
    policy null-text docs survive forever and null digests accumulate."""
    from clickhouse_etl_spark.dataops.dedup import (
        dedup_against_path,
        write_digest_table,
    )

    wave1 = spark.createDataFrame(
        [(1, None), (2, "real content")], ["doc_id", "text"]
    )
    path = f"{tmp_path}/digests"
    write_digest_table(wave1, path, mode="overwrite")
    digests = spark.read.parquet(path)
    assert digests.filter(F.col("digest").isNull()).count() == 0
    # next wave: null-text AND empty-text rows both match wave1's null row
    wave2 = spark.createDataFrame(
        [(10, None), (11, ""), (12, "fresh")], ["doc_id", "text"]
    )
    kept = dedup_against_path(wave2, path)
    assert [r["doc_id"] for r in kept.collect()] == [12]


@pytest.mark.heavy
def test_pq_index_append_dedup_guard(spark, sf_dir, tmp_path):
    """ADVICE r5: re-appending an already-indexed wave must be a no-op
    (duplicate ids would surface as duplicate neighbor_id rows in
    query results); dedup_ids=False skips the guard by contract."""
    from clickhouse_etl_spark.dataops.similarity import (
        pq_index_append,
        pq_index_build,
        pq_index_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    wave = emb.filter(F.col("vec_id") % 2 == 1)
    path = f"{tmp_path}/idx"
    pq_index_build(base, path, n_centroids=4, m=8, n_codes=8)
    pq_index_append(spark, path, wave)
    n_all = spark.read.parquet(f"{path}/codes").count()
    assert n_all == emb.count()
    # guarded re-append: no growth
    pq_index_append(spark, path, wave)
    assert spark.read.parquet(f"{path}/codes").count() == n_all
    # query results carry no duplicate neighbors
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = pq_index_query(spark, path, q, k=10, n_probe=2).collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in res]
    assert len(pairs) == len(set(pairs))
    # unguarded re-append DOES grow (the documented contract)
    pq_index_append(spark, path, wave, dedup_ids=False)
    assert spark.read.parquet(f"{path}/codes").count() == n_all + wave.count()


def test_hash_embedding_contract(spark, sf_dir):
    from clickhouse_etl_spark.dataops.text import hash_embedding

    docs = load_table(spark, sf_dir, "documents")
    out = hash_embedding(docs, dim=64).collect()
    assert len(out) == docs.filter(F.length("text") > 0).count()
    for r in out[:50]:
        assert len(r["embedding"]) == 64
        # unit norm (within float tolerance)
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-9
        assert r["n_tokens"] >= 1
    # deterministic across partitionings
    again = hash_embedding(docs.repartition(7), dim=64).collect()
    assert {r["doc_id"]: r["embedding"] for r in out} == {
        r["doc_id"]: r["embedding"] for r in again
    }


def test_hash_embedding_engines_identical(spark, sf_dir):
    """The Arrow-batched dense rebuild (default) and the pure-Catalyst
    reference form must emit BIT-identical embeddings and norms — the
    numpy path replays the same scatter, the same sequential square
    fold, and the same single division per weight (pq_encode fix
    pattern, VERDICT r6 #3)."""
    from clickhouse_etl_spark.dataops.text import hash_embedding

    docs = load_table(spark, sf_dir, "documents")
    pan = {
        r["doc_id"]: (r["n_tokens"], r["embedding"], r["l2_norm"])
        for r in hash_embedding(docs, dim=64, engine="pandas").collect()
    }
    cat = {
        r["doc_id"]: (r["n_tokens"], r["embedding"], r["l2_norm"])
        for r in hash_embedding(docs, dim=64, engine="catalyst").collect()
    }
    assert pan == cat


def test_shingle_stream_engines_identical(spark, sf_dir):
    """The Arrow-batched shingle generator (default) and the
    Catalyst HOF reference form must emit ROW-identical (id, sz, g)
    streams — the Python generator replays split-on-single-space
    (empties kept), space-joined n-word windows, and
    first-occurrence-distinct exactly (pq_encode fix pattern; the HOF
    projection was ~80% of the pair-engine runtime at sf0.1)."""
    from clickhouse_etl_spark.dataops.dedup import (
        _shingle_stream,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pan = sorted(map(tuple, _shingle_stream(docs, "text", "doc_id", 5).collect()))
    cat = sorted(
        map(
            tuple,
            _shingle_stream(docs, "text", "doc_id", 5, engine="catalyst").collect(),
        )
    )
    assert pan == cat
    assert pan, "empty shingle stream on the test corpus"
    # and the composed pair output stays identical end to end
    pj = sorted(map(tuple, ngram_jaccard_pairs(docs).collect()))
    cj = sorted(map(tuple, ngram_jaccard_pairs(docs, engine="catalyst").collect()))
    assert pj == cj


def test_shingle_stream_null_and_short_docs(spark):
    """NULL text drops the row (split(NULL) -> explode drops) and a
    doc shorter than n words emits no shingles — same as the guarded
    Catalyst form."""
    from clickhouse_etl_spark.dataops.dedup import _shingle_stream

    df = spark.createDataFrame(
        [(1, None), (2, "too short"), (3, "one two three four five six")],
        "doc_id long, text string",
    )
    rows = _shingle_stream(df, "text", "doc_id", 5).collect()
    assert {r["id"] for r in rows} == {3}
    cat = _shingle_stream(df, "text", "doc_id", 5, engine="catalyst").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, cat))


def test_simhash_arrow_sigs_identical(spark, sf_dir):
    """The Arrow SimHash signature stage (pair-generator default) must
    equal the expression-form simhash() bit for bit — same char-fold
    hash per word (memoized), same ±1 bit votes, same bit packing —
    and the banded pair output must be identical end to end."""
    from clickhouse_etl_spark.dataops.dedup import (
        _simhash_sigs_arrow,
        simhash,
        simhash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    arrow = sorted(map(tuple, _simhash_sigs_arrow(docs, "text", "doc_id", 32).collect()))
    expr = sorted(map(tuple, simhash(docs).collect()))
    assert arrow == expr
    pa = sorted(map(tuple, simhash_near_dup_pairs(docs).collect()))
    pc = sorted(map(tuple, simhash_near_dup_pairs(docs, engine="catalyst").collect()))
    assert pa == pc


def test_cms_overestimates_only_and_merges(spark, sf_dir):
    from clickhouse_etl_spark.dataops.sketches import (
        cms_estimate,
        cms_merge,
        cms_table,
    )

    ev = load_table(spark, sf_dir, "events")
    est = cms_estimate(ev, "user_id", width=128, depth=4, top_n=15).collect()
    assert len(est) == 15
    for r in est:
        # CMS guarantee: never underestimates
        assert r["cms_cnt"] >= r["true_cnt"]
        assert r["overestimate"] == r["cms_cnt"] - r["true_cnt"]
    # sketch table is bounded by depth*width regardless of cardinality
    tab = cms_table(ev, "user_id", width=128, depth=4)
    assert tab.count() <= 4 * 128
    # shard-merge == single-pass build
    a = cms_table(ev.filter(F.col("event_id") % 2 == 0), "user_id", 128, 4)
    b = cms_table(ev.filter(F.col("event_id") % 2 == 1), "user_id", 128, 4)
    merged = {(r["d"], r["bucket"]): r["cnt"] for r in cms_merge(a, b).collect()}
    single = {(r["d"], r["bucket"]): r["cnt"] for r in tab.collect()}
    assert merged == single


def test_containment_catches_subset_jaccard_misses(spark):
    from clickhouse_etl_spark.dataops.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    long = " ".join(f"w{i}" for i in range(60))
    short = " ".join(f"w{i}" for i in range(20, 28))  # fully inside long
    docs = spark.createDataFrame(
        [(1, long), (2, short), (3, "totally different text entirely here now")],
        ["doc_id", "text"],
    )
    cont = ngram_containment_pairs(docs, n=5, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in cont] == [(1, 2)]
    assert cont[0]["containment"] == 1.0
    # symmetric jaccard misses the same pair at any meaningful threshold
    jac = ngram_jaccard_pairs(docs, n=5, threshold=0.5).collect()
    assert (1, 2) not in [(r["id_a"], r["id_b"]) for r in jac]


def test_normalize_text_canonicalizes_variants(spark):
    from clickhouse_etl_spark.dataops.text import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "Hello,   World! (TEST)"),
            (2, "hello world test"),
            (3, None),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    # case/punct variants collapse to the same canonical form
    assert out[1]["text_norm"] == out[2]["text_norm"] == "hello world test"
    assert out[1]["n_tokens_raw"] == 3 and out[1]["n_tokens_norm"] == 3
    assert out[2]["n_tokens_raw"] == 3
    assert out[3]["text_norm"] is None
    # legacy size(NULL) = -1 contract, kept across the codegen rewrite
    assert out[3]["n_tokens_raw"] == -1 and out[3]["n_tokens_norm"] == -1


def test_normalize_text_token_count_edges(spark):
    """The regexp_count/spaces+1 token counts must agree with the
    split-filter definition on empty, all-space, all-punct, and
    tab-bearing inputs (split is on literal space only)."""
    from clickhouse_etl_spark.dataops.text import normalize_text

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "!!! ???"),
            (4, "a  b\tc"),
            (5, " x "),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert out[1]["n_tokens_raw"] == 0 and out[1]["n_tokens_norm"] == 0
    assert out[2]["n_tokens_raw"] == 0 and out[2]["n_tokens_norm"] == 0
    # punct-only: raw has 2 space-split tokens, canonical form is empty
    assert out[3]["n_tokens_raw"] == 2 and out[3]["n_tokens_norm"] == 0
    assert out[3]["text_norm"] == ""
    # tab is NOT a split char: "b\tc" is one raw token
    assert out[4]["n_tokens_raw"] == 2 and out[4]["n_tokens_norm"] == 3
    assert out[5]["n_tokens_raw"] == 1 and out[5]["n_tokens_norm"] == 1


def test_kmv_distinct_accuracy_and_small_set_exactness(spark, sf_dir):
    from clickhouse_etl_spark.dataops.sketches import kmv_distinct

    ev = load_table(spark, sf_dir, "events")
    out = kmv_distinct(ev, "user_id", group_col="event_type", k=64).collect()
    assert out
    for r in out:
        if r["n_distinct_exact"] < 64:
            # below the sketch threshold KMV IS the exact count
            assert r["kmv_estimate"] == float(r["n_distinct_exact"])
        else:
            # standard KMV accuracy ~ 1/sqrt(k) ≈ 12.5%; allow 3 sigma
            rel = abs(r["kmv_estimate"] - r["n_distinct_exact"]) / r["n_distinct_exact"]
            assert rel < 0.5, (r["event_type"], rel)
    # global (ungrouped) form runs too
    g = kmv_distinct(ev, "user_id", k=64).collect()
    assert len(g) == 1 and g[0]["kmv_k"] == 64


def test_connected_components_local_path_equals_distributed(spark):
    from clickhouse_etl_spark.dataops.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 8), (20, 21)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(25)], ["doc_id"])
    local = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, nodes).collect()
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, nodes, local_edge_bound=None).collect()
    }
    assert local == dist
    assert local[3] == 1 and local[8] == 7 and local[21] == 20
    assert local[0] == 0 and local[24] == 24  # isolated nodes label self


def test_sketch_key_type_validated(spark):
    """ADVICE r6: with ANSI off, a string key cast to bigint silently
    becomes NULL and the sketch emits garbage — the ops must refuse
    non-integral keys up front."""
    import pytest

    from clickhouse_etl_spark.dataops.sketches import (
        cms_estimate,
        cms_table,
        kmv_distinct,
    )

    df = spark.createDataFrame([("abc", 1), ("def", 2)], ["digest", "n"])
    for fn in (cms_table, cms_estimate, kmv_distinct):
        with pytest.raises(TypeError, match="integral key"):
            fn(df, "digest")
    # integral keys still work
    assert cms_table(df, "n", width=8, depth=2).count() <= 16


def test_sample_artifacts_reject_empty_corpus(spark):
    """ADVICE r6: an empty embeddings table must raise a descriptive
    error, not a bare IndexError."""
    import pytest

    from pyspark.sql import types as T

    from clickhouse_etl_spark.dataops.similarity import (
        sample_centroids,
        sample_codebooks,
    )

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    empty = spark.createDataFrame([], schema)
    with pytest.raises(ValueError, match="corpus is empty"):
        sample_codebooks(empty)
    with pytest.raises(ValueError, match="corpus is empty"):
        sample_centroids(empty)


def test_release_digest_cache(spark, sf_dir, tmp_path):
    """ADVICE r6: per-path digest caches are reusable within a wave and
    releasable when the wave completes."""
    from clickhouse_etl_spark.dataops import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    seen = str(tmp_path / "digests")
    dd.write_digest_table(docs.limit(50), seen)
    # streaming path registers the cache once per path
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS doc_id", "CAST(value AS STRING) AS text")
    )
    out1 = dd.dedup_against_path(stream, seen)
    out2 = dd.dedup_against_path(stream, seen)
    assert out1.isStreaming and out2.isStreaming
    assert len(dd._DIGEST_CACHES) == 1
    assert dd.release_digest_cache(seen) == 1
    assert dd.release_digest_cache(seen) == 0
    assert not dd._DIGEST_CACHES


def test_keep_best_per_cluster_semantics(spark):
    """The survivor of each near-dup cluster must be its highest-quality
    member (fixed-point argmax, doc-id tie-break), and singletons keep
    themselves with n_dropped = 0."""
    from clickhouse_etl_spark.dataops.dedup import keep_best_per_cluster

    # 40 DISTINCT words -> 36 distinct 5-gram shingles; a one-token
    # suffix keeps pairwise Jaccard ~0.9 (well over the 0.5 threshold)
    base = " ".join(f"word{i:02d}" for i in range(40)) + " "
    rows = [
        (1, base + "!!!!!"),      # punctuation-mangled copy
        (2, base + "the"),        # clean copy with a stopword: highest quality
        (3, base + "zzzzz"),      # neutral variant
        # singleton
        (9, "completely different content with no overlap at all here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["cluster_id"]: r for r in keep_best_per_cluster(docs).collect()}
    big = out[1]
    assert big["keep_id"] == 2, big  # the clean copy wins, not min-id 1
    assert big["cluster_size"] == 3 and big["n_dropped"] == 2
    single = out[9]
    assert single["keep_id"] == 9
    assert single["cluster_size"] == 1 and single["n_dropped"] == 0


def test_hash_feature_classifier_learns_and_calibrates(spark):
    """The fastText-pattern classifier must recover a clean class
    signal end-to-end: disjoint positive/negative vocabularies are
    linearly separable, so the NB-difference weights + mean threshold
    classify a held-out split perfectly; the output contract is one
    row per tokenized document with exact integer scores."""
    from clickhouse_etl_spark.dataops.text import hash_feature_classifier

    rows = []
    for i in range(200):
        y = i % 2
        text = ("spam junk offer " if y else "ham news report ") * 3
        rows.append((i, text.strip(), y, 1 if i % 5 != 0 else 0))
    rows.append((999, "", 0, 1))  # token-less doc: must drop, not crash
    df = spark.createDataFrame(rows, ["doc_id", "text", "label", "is_train"])
    out = hash_feature_classifier(df, dim=64).collect()
    assert len(out) == 200  # the empty doc dropped
    apply_rows = [r for r in out if r["is_train"] == 0]
    assert apply_rows, "apply split must be non-empty"
    acc = sum(1 for r in apply_rows if r["pred"] == r["label"]) / len(apply_rows)
    assert acc == 1.0, f"separable corpus must classify perfectly, got {acc}"
    # deterministic: identical scores on a second run
    again = hash_feature_classifier(df, dim=64).collect()
    assert sorted((r["doc_id"], r["score"]) for r in out) == sorted(
        (r["doc_id"], r["score"]) for r in again
    )


def test_cluster_balanced_sample_cap_and_coverage(spark):
    from clickhouse_etl_spark.dataops.similarity import cluster_balanced_sample

    # three orthogonal directions with slight deterministic jitter:
    # cluster membership is unambiguous
    rows = []
    for i in range(90):
        c = i % 3
        vec = [0.0] * 6
        vec[c] = 1.0
        vec[(c + 3) % 6] = 0.01 * (i % 7)
        rows.append((i, vec))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0, 0, 0, 0, 0], [0, 1.0, 0, 0, 0, 0], [0, 0, 1.0, 0, 0, 0]]
    out = cluster_balanced_sample(df, cap=10, centroids=cents).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    assert set(by_cell) == {0, 1, 2}
    for cell, members in by_cell.items():
        assert len(members) == 10  # 30 per cell capped to 10
        assert all(m["n_total"] == 30 for m in members)
        assert sorted(m["sample_rank"] for m in members) == list(range(1, 11))
        # every kept vector genuinely belongs to its cell
        assert all(m["vec_id"] % 3 == cell for m in members)
    again = cluster_balanced_sample(df, cap=10, centroids=cents).collect()
    assert sorted((r["cell"], r["vec_id"]) for r in out) == sorted(
        (r["cell"], r["vec_id"]) for r in again
    )


@pytest.mark.heavy
def test_hash_feature_classifier_engines_identical(spark, sf_dir):
    """The Arrow-batched feature stage must replay the explode/
    dictionary-join reference form exactly — integer counts, so
    equality is bitwise across the whole output."""
    from clickhouse_etl_spark.dataops.text import trained_quality_classifier
    from clickhouse_etl_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows_a = sorted(
        tuple(r) for r in trained_quality_classifier(docs).collect()
    )  # engine defaults to pandas
    # catalyst reference: the same label/split derivation, engine pinned
    from pyspark.sql import functions as F
    from clickhouse_etl_spark.dataops.hashing import affine_hash
    from clickhouse_etl_spark.dataops.text import (
        STOPWORDS,
        SPLIT_A,
        SPLIT_B,
        _stop_hits,
        _tokens,
        hash_feature_classifier,
    )

    toks = _tokens(F.col("text"))
    n_tok = F.regexp_count(F.col("text"), F.lit("[^ ]+")).cast("bigint")
    labeled = docs.select(
        F.col("doc_id"),
        F.col("text"),
        (
            affine_hash(F.col("doc_id").cast("bigint"), SPLIT_A, SPLIT_B) % 100 < 80
        ).cast("int").alias("is_train"),
        (16 * _stop_hits(toks, STOPWORDS["en"]).cast("bigint") >= n_tok)
        .cast("int").alias("label"),
    )
    ref = hash_feature_classifier(labeled, engine="catalyst")
    rows_b = sorted(tuple(r) for r in ref.collect())
    assert rows_a == rows_b


def test_bloom_table_no_false_negatives_and_fpr(spark, tmp_path):
    """The portable Bloom seen-set: every previously-seen document must
    probe positive (dup leaks impossible), and the false-positive rate
    on genuinely fresh keys stays near the k=7 / 10-bits-per-key
    theory (~0.8%; asserted under 3%). Deterministic build → the same
    filter bit-for-bit on a rebuild."""
    from clickhouse_etl_spark.dataops.dedup import (
        dedup_against_path,
        write_bloom_table,
    )

    seen = spark.createDataFrame(
        [(i, f"seen document number {i}") for i in range(2000)],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "bloom_seen")
    write_bloom_table(seen, path, capacity=2000)

    # replay the seen wave (plus within-wave dup ids): NOTHING survives
    replay = spark.createDataFrame(
        [(10_000 + i, f"seen document number {i}") for i in range(2000)],
        ["doc_id", "text"],
    )
    out = dedup_against_path(replay, path, seen_format="bloom")
    assert out.count() == 0

    fresh = spark.createDataFrame(
        [(20_000 + i, f"fresh document number {i}") for i in range(2000)],
        ["doc_id", "text"],
    )
    kept = dedup_against_path(fresh, path, seen_format="bloom").count()
    fpr = 1.0 - kept / 2000.0
    assert fpr < 0.03, f"bloom FPR {fpr} exceeds 3% at 10 bits/key, k=7"

    # deterministic: a rebuild produces the identical bitmap
    path2 = str(tmp_path / "bloom_seen2")
    write_bloom_table(seen, path2, capacity=2000)
    w1 = sorted((r["word_idx"], r["word"]) for r in spark.read.parquet(path).collect())
    w2 = sorted((r["word_idx"], r["word"]) for r in spark.read.parquet(path2).collect())
    assert w1 == w2

    # sharded build (the >214M-key tier mechanism): same guarantees
    path4 = str(tmp_path / "bloom_seen_sharded")
    write_bloom_table(seen, path4, capacity=2000, n_shards=4)
    assert dedup_against_path(replay, path4, seen_format="bloom").count() == 0
    kept4 = dedup_against_path(fresh, path4, seen_format="bloom").count()
    assert 1.0 - kept4 / 2000.0 < 0.03

    # per-shard bitmap range guard points at the sharding fix
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_shards"):
        write_bloom_table(seen, str(tmp_path / "bx"), capacity=300_000_000)


def test_bloom_merge_equals_rebuild_on_union(spark, tmp_path):
    from clickhouse_etl_spark.dataops.dedup import (
        merge_bloom_tables,
        write_bloom_table,
    )

    wave1 = spark.createDataFrame(
        [(i, f"wave one doc {i}") for i in range(500)], ["doc_id", "text"]
    )
    wave2 = spark.createDataFrame(
        [(i, f"wave two doc {i}") for i in range(500)], ["doc_id", "text"]
    )
    p1, p2, pm, pu = (str(tmp_path / n) for n in ("b1", "b2", "bm", "bu"))
    # same DECLARED capacity -> same m -> mergeable
    write_bloom_table(wave1, p1, capacity=1000)
    write_bloom_table(wave2, p2, capacity=1000)
    merge_bloom_tables(spark, [p1, p2], pm)
    write_bloom_table(wave1.unionByName(wave2), pu, capacity=1000)
    merged = sorted((r["word_idx"], r["word"]) for r in spark.read.parquet(pm).collect())
    union = sorted((r["word_idx"], r["word"]) for r in spark.read.parquet(pu).collect())
    assert merged == union

    # mismatched geometry refuses to merge
    import pytest as _pytest
    p3 = str(tmp_path / "b3")
    write_bloom_table(wave1, p3, capacity=2000)
    with _pytest.raises(ValueError, match="disagree"):
        merge_bloom_tables(spark, [p1, p3], str(tmp_path / "bx"))


def test_normalize_text_engines_identical(spark, sf_dir):
    """The Arrow normalize pass must replay the Catalyst regex chain
    value-for-value, including the NULL-text (NULL, -1, -1) contract
    and messy whitespace/punctuation edges."""
    from clickhouse_etl_spark.dataops.text import normalize_text
    from clickhouse_etl_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    edge = spark.createDataFrame(
        [
            (9001, None),
            (9002, ""),
            (9003, "   "),
            (9004, "Tabs\tand\nnewlines!  MIXED?? 42"),
            (9005, "---"),
            (9006, "  Leading and trailing  "),
        ],
        ["doc_id", "text"],
    ).withColumn("source", F.lit("edge")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text").cast("long"))
    corpus = docs.unionByName(edge.select(*docs.columns))
    a = sorted(tuple(r) for r in normalize_text(corpus).collect())
    b = sorted(
        tuple(r) for r in normalize_text(corpus, engine="catalyst").collect()
    )
    assert a == b


def test_clf_idiv_exact_across_int64_range(spark):
    """The classifier's floor division must equal Python's exact `//`
    for non-negative int64 operands INCLUDING values past 2^53, where
    the old double-division form silently rounded (and where a naive
    decimal quotient would HALF_UP across integer boundaries)."""
    import random

    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.text import _clf_idiv

    rng = random.Random(20260815)
    rows = []
    for _ in range(300):
        a = rng.randrange(0, 2**62)
        b = rng.randrange(1, 2**40)
        rows.append((a, b))
    # adversarial: quotients just below an integer (fractional part
    # near 1 — the decimal HALF_UP trap), and exact multiples
    for q in (1, 7, 2**30, 2**52, 2**61):
        for b in (3, 10**6, 2**31 - 1):
            if q * b < 2**62:
                rows.append((q * b, b))          # exact multiple
                rows.append((q * b + b - 1, b))  # frac part (b-1)/b
    df = spark.createDataFrame(rows, ["a", "b"])
    got = (
        df.select("a", "b", _clf_idiv(F.col("a"), F.col("b")).alias("q"))
        .collect()
    )
    for r in got:
        assert r["q"] == r["a"] // r["b"], (r["a"], r["b"], r["q"])


def test_repetition_signals_engines_identical(spark, sf_dir):
    """The Arrow per-doc Counter pass must replay the explode/agg
    expression form value-for-value — including the NULL (-1, -1)
    contract, single-token docs, tie-broken argmax, and the exact
    IEEE ratio divisions."""
    from clickhouse_etl_spark.dataops.text import repetition_signals
    from clickhouse_etl_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    edge = spark.createDataFrame(
        [
            (9001, None),
            (9002, ""),
            (9003, "one"),
            (9004, "a b a b a b"),      # clear top bigram
            (9005, "x y y x x y"),      # ties: 'x y' vs 'y x' vs 'y y' ... min gram wins
            (9006, "  spaced   out  "),
        ],
        ["doc_id", "text"],
    ).withColumn("source", F.lit("edge")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text").cast("long"))
    corpus = docs.unionByName(edge.select(*docs.columns))
    a = sorted(tuple(r) for r in repetition_signals(corpus).collect())
    b = sorted(
        tuple(r) for r in repetition_signals(corpus, engine="catalyst").collect()
    )
    assert a == b


def test_top_terms_engines_identical(spark, sf_dir):
    """Per-doc Counter top-k must replay the explode/agg/rank window
    form exactly — argmax ties (tf desc, term asc), min_len filter,
    and NULL/empty docs dropping."""
    from clickhouse_etl_spark.dataops.chunking import top_terms
    from clickhouse_etl_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    edge = spark.createDataFrame(
        [
            (9001, None),
            (9002, ""),
            (9003, "a b c"),                   # all below min_len -> drops
            (9004, "zz aa zz aa bb bb cc"),    # ties everywhere
            (9005, "solo solo solo"),
        ],
        ["doc_id", "text"],
    ).withColumn("source", F.lit("edge")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text").cast("long"))
    corpus = docs.unionByName(edge.select(*docs.columns))
    a = sorted(tuple(r) for r in top_terms(corpus, k=3).collect())
    b = sorted(
        tuple(r) for r in top_terms(corpus, k=3, engine="catalyst").collect()
    )
    assert a == b


def test_digest_cache_invalidates_on_rewrite(spark, sf_dir, tmp_path):
    """ADVICE r7 (medium): the per-path streaming digest cache must
    drop itself when the digest table at that path is REWRITTEN —
    otherwise a later wave silently anti-joins against the stale
    seen-set. The cache key is the parquet file listing (overwrite and
    append both change it)."""
    from clickhouse_etl_spark.dataops import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    seen = str(tmp_path / "digests_rw")
    dd.write_digest_table(docs.limit(20), seen, mode="overwrite")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS doc_id", "CAST(value AS STRING) AS text")
    )
    dd.dedup_against_path(stream, seen)
    sig1, frame1 = dd._DIGEST_CACHES[seen]
    # repeat call with an unchanged table: reuses the same cache entry
    dd.dedup_against_path(stream, seen)
    assert dd._DIGEST_CACHES[seen][0] == sig1
    assert dd._DIGEST_CACHES[seen][1] is frame1
    # rewrite the table -> new part files -> cache must rotate
    dd.write_digest_table(docs.limit(40), seen, mode="overwrite")
    dd.dedup_against_path(stream, seen)
    sig2, frame2 = dd._DIGEST_CACHES[seen]
    assert sig2 != sig1
    # the rotated entry is a FRESH frame over the new listing (the old
    # one was unpersisted; storageLevel can't observe that here because
    # the cache manager matches both frames' identical logical plans)
    assert frame2 is not frame1
    assert dd.release_digest_cache(seen) == 1


def test_bloom_probe_rejects_mixed_geometry(spark, tmp_path):
    """ADVICE r7: a mixed-geometry bloom artifact (two capacities in
    ONE path — writable only by pre-guard code now that the base
    writer rejects mode='append', ADVICE r10 #2) must be refused by
    the probe instead of silently reading the wrong m and breaking the
    no-false-negative guarantee."""
    import shutil
    from pathlib import Path as _P

    import pytest as _pytest

    from clickhouse_etl_spark.dataops import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], ["doc_id", "text"]
    )
    path = str(tmp_path / "bloom_mixed")
    other = str(tmp_path / "bloom_other")
    dd.write_bloom_table(docs, path, capacity=1000)
    dd.write_bloom_table(docs, other, capacity=2000)
    # splice the second geometry's rows in by file copy — the legacy
    # on-disk state the in-place append used to produce
    for f in _P(other).glob("part-*.parquet"):
        shutil.copy(f, _P(path) / f"legacy-{f.name}")
    with _pytest.raises(ValueError, match="mixes geometries"):
        dd.dedup_against_bloom_path(docs, path).collect()

    # and the base writer itself refuses in-place appends outright
    with _pytest.raises(ValueError, match="merge_bloom_tables"):
        dd.write_bloom_table(docs, path, capacity=1000, mode="append")


def test_bloom_bitmap_size_guard(spark, tmp_path):
    """VERDICT r7 nit: a mis-declared capacity must fail loud at plan
    build when the dense probe bitmap would exceed the byte budget —
    and the override parameter accepts the footprint explicitly."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], ["doc_id", "text"]
    )
    path = str(tmp_path / "bloom_guard")
    dd.write_bloom_table(docs, path, capacity=100_000)
    with _pytest.raises(ValueError, match="max_bitmap_bytes"):
        dd.dedup_against_bloom_path(docs, path, max_bitmap_bytes=64)
    # explicit acceptance proceeds
    assert dd.dedup_against_bloom_path(
        docs, path, max_bitmap_bytes=1 << 30
    ).count() == 0
    dd.release_bloom_cache(path)


def test_release_bloom_cache_and_rewrite_invalidation(spark, tmp_path):
    """ADVICE r7: the broadcast bloom bitmap is cached per seen_path
    (no per-call broadcast stacking), invalidates when the artifact is
    rewritten, and releases on demand like the digest cache."""
    from clickhouse_etl_spark.dataops import dedup as dd

    dd.release_bloom_cache()
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
    )
    path = str(tmp_path / "bloom_cache")
    dd.write_bloom_table(docs, path, capacity=1000)
    dd.dedup_against_bloom_path(docs, path)
    entry1 = dd._BLOOM_CACHES[path]
    dd.dedup_against_bloom_path(docs, path)
    assert dd._BLOOM_CACHES[path] is entry1  # reused, not re-broadcast
    # rewrite with more keys: the probe must pick up the new bitmap
    more = spark.createDataFrame(
        [(i, f"extra {i}") for i in range(300)], ["doc_id", "text"]
    )
    dd.write_bloom_table(docs.unionByName(more), path, capacity=1000)
    assert dd.dedup_against_bloom_path(more, path).count() == 0
    assert dd._BLOOM_CACHES[path] is not entry1
    assert dd.release_bloom_cache(path) == 1
    assert dd.release_bloom_cache(path) == 0


def test_shingle_stream_preserves_id_type(spark):
    """ADVICE r7: the Arrow shingle engine must carry the input id
    column's actual type (int32, string) instead of hardcoding long —
    both engines agree on schema AND values for every id type."""
    from clickhouse_etl_spark.dataops.dedup import _shingle_stream

    text = "one two three four five six seven"
    for id_vals, id_type in [
        ([1, 2], "int"),
        ([10**12, 10**12 + 1], "long"),
        (["a-1", "b-2"], "string"),
    ]:
        df = spark.createDataFrame(
            [(v, text) for v in id_vals],
            f"doc_id {id_type}, text string",
        )
        a = _shingle_stream(df, "text", "doc_id", 5, engine="pandas")
        b = _shingle_stream(df, "text", "doc_id", 5, engine="catalyst")
        assert a.schema["id"].dataType == b.schema["id"].dataType, id_type
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        ), id_type


def test_classifier_threshold_decimal_past_int64(spark):
    """VERDICT r7 nit discharged: the two threshold terms are
    DECIMAL(38,0), so a train-score sum PAST the int64 ceiling stays
    exact and the calibrated comparison is unchanged."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.text import (
        _calibrated_pred,
        _classifier_threshold,
    )

    big = 2**62
    scored = spark.createDataFrame(
        [
            (1, 1, 1, big), (2, 1, 1, big), (3, 1, 1, big), (4, 1, 1, big),
            (5, 0, 1, big),        # apply doc at exactly the mean -> pred 0
            (6, 0, 1, big - 1),    # just under -> pred 0
            (7, 0, 0, -big),       # far under -> pred 0
        ],
        "doc_id long, _tr long, _y long, score long",
    )
    thr = _classifier_threshold(scored)
    row = thr.collect()[0]
    assert int(row["_ss"]) == 4 * big  # 2^64: exact, past int64
    assert row["_nt"] == 4
    out = {
        r["doc_id"]: r["pred"]
        for r in scored.crossJoin(F.broadcast(thr))
        .select("doc_id", _calibrated_pred().alias("pred"))
        .collect()
    }
    # score*4 > 4*big only for score > big; everything here is <= big
    assert out == {1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0}
    # one doc just over the mean flips to 1 (product 2^64 + 4)
    over = spark.createDataFrame(
        [(8, 0, 1, big + 1)], "doc_id long, _tr long, _y long, score long"
    )
    pred = (
        over.crossJoin(F.broadcast(thr))
        .select(_calibrated_pred().alias("pred"))
        .collect()[0]["pred"]
    )
    assert pred == 1


@pytest.mark.heavy
def test_curation_fused_engine_identical(spark, sf_dir, tmp_path):
    """The fused single-pass curation body must replay the staged
    3-op composition row-for-row — normalize NULL contract, bloom
    drop decisions, token-less and all-unseen-bucket drops, exact
    scores and calibrated preds."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.dedup import (
        release_bloom_cache,
        write_bloom_table,
    )
    from clickhouse_etl_spark.dataops.text import (
        normalize_text,
        write_classifier_table,
    )
    from clickhouse_etl_spark.streaming.curation import curation_scored_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (9001, None),               # NULL text: (-1, -1), drops at classify
            (9002, ""),                 # empty: drops at classify
            (9003, "!!! ??? ..."),      # normalizes to empty
            (9004, "MIXED Case,   punct!! 42"),
        ],
        ["doc_id", "text"],
    )
    corpus = docs.unionByName(edge)
    bloom = str(tmp_path / "fused_bloom")
    write_bloom_table(
        normalize_text(corpus.filter("doc_id % 3 = 0")),
        bloom, capacity=1000, text_col="text_norm",
    )
    weights = str(tmp_path / "fused_weights")
    write_classifier_table(
        normalize_text(corpus), weights, text_col="text_norm"
    )
    a = sorted(
        tuple(r)
        for r in curation_scored_stream(
            corpus, bloom, weights, engine="staged"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in curation_scored_stream(
            corpus, bloom, weights, engine="fused"
        ).collect()
    )
    assert a == b
    assert a, "curation output must be non-empty"

    # VERDICT r9 #8: the optional DSIR importance stage composes into
    # the same pass — fused == staged incl. iw_tokens/iw_score, and the
    # survivor set is unchanged (importance scoring never drops a
    # classifier survivor: every scored doc has >= 1 token)
    from clickhouse_etl_spark.dataops.text import write_importance_table

    src_docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    iw_path = str(tmp_path / "fused_iw")
    write_importance_table(
        normalize_text(src_docs), iw_path, ["src0", "src1"],
        text_col="text_norm",
    )
    corpus2 = corpus.withColumn("source", F.lit("srcX"))
    a2 = sorted(
        tuple(r)
        for r in curation_scored_stream(
            corpus2, bloom, weights, engine="staged", importance_path=iw_path
        ).collect()
    )
    b2 = sorted(
        tuple(r)
        for r in curation_scored_stream(
            corpus2, bloom, weights, engine="fused", importance_path=iw_path
        ).collect()
    )
    assert a2 == b2
    assert a2, "importance-staged curation output must be non-empty"
    cols2 = curation_scored_stream(
        corpus2, bloom, weights, importance_path=iw_path
    ).columns
    assert cols2[-2:] == ["iw_tokens", "iw_score"]
    # same survivors as the 3-stage body, now carrying importance
    assert len(a2) == len(a)
    # iw_tokens == the classifier's normalized token count (same
    # tokenization of the same canonical text)
    idx = {c: i for i, c in enumerate(cols2)}
    for row in a2:
        assert row[idx["iw_tokens"]] == row[idx["n_tokens_norm"]]
        assert row[idx["iw_score"]] > 0

    # the optional DECONTAMINATION stage composes into the same pass
    # (r10): persist the n-grams of a benchmark slice of the corpus,
    # probe on the RAW text — fused == staged with the stage active,
    # every benchmark-colliding doc is gone, the stage strictly
    # shrinks the survivor set, and clean survivors are unchanged
    from clickhouse_etl_spark.dataops.dedup import (
        release_ngram_digest_cache,
        write_ngram_digest_table,
    )

    dc_path = str(tmp_path / "fused_eval_ngrams")
    write_ngram_digest_table(
        corpus2.filter("doc_id % 5 = 1"), dc_path, n=5, mode="overwrite"
    )
    a3 = sorted(
        tuple(r)
        for r in curation_scored_stream(
            corpus2, bloom, weights, engine="staged",
            importance_path=iw_path, decontam_path=dc_path, decontam_n=5,
        ).collect()
    )
    b3 = sorted(
        tuple(r)
        for r in curation_scored_stream(
            corpus2, bloom, weights, engine="fused",
            importance_path=iw_path, decontam_path=dc_path, decontam_n=5,
        ).collect()
    )
    assert a3 == b3
    assert a3, "decontaminated curation output must be non-empty"
    assert len(a3) < len(a2), "decontamination must drop colliders"
    # composition law: the in-chain stage == the standalone dataop
    # prepended to the 4-stage body (clean docs scored identically)
    from clickhouse_etl_spark.dataops.dedup import decontaminate_against_path

    clean_ids = {
        r["doc_id"]
        for r in decontaminate_against_path(
            corpus2, dc_path, n=5
        ).select("doc_id").collect()
    }
    id_i = idx["doc_id"]
    assert {row[id_i] for row in a3} == {
        row[id_i] for row in a2 if row[id_i] in clean_ids
    }
    assert set(a3) == {row for row in a2 if row[id_i] in clean_ids}

    # the optional NEAR-dup stage composes into the same pass (third
    # r10 session): register a slice's CANONICAL band keys, probe
    # text_norm after the exact bloom dedup — fused == staged with the
    # stage active, the stage strictly shrinks the survivor set, and
    # the in-chain verdict == the standalone dataop on the same
    # canonical text (composition law)
    from clickhouse_etl_spark.dataops.dedup import (
        neardup_against_path,
        release_band_digest_cache,
        write_band_digest_table,
    )

    nd_path = str(tmp_path / "fused_band_seen")
    write_band_digest_table(
        normalize_text(corpus2.filter("doc_id % 4 = 2")), nd_path,
        text_col="text_norm", mode="overwrite",
    )
    kw = dict(
        importance_path=iw_path, decontam_path=dc_path, decontam_n=5,
        neardup_path=nd_path,
    )
    a4 = sorted(
        tuple(r)
        for r in curation_scored_stream(
            corpus2, bloom, weights, engine="staged", **kw
        ).collect()
    )
    b4 = sorted(
        tuple(r)
        for r in curation_scored_stream(
            corpus2, bloom, weights, engine="fused", **kw
        ).collect()
    )
    assert a4 == b4
    assert a4, "near-dup-staged curation output must be non-empty"
    assert len(a4) < len(a3), "the near-dup probe must drop colliders"
    nd_clean_ids = {
        r["doc_id"]
        for r in neardup_against_path(
            normalize_text(corpus2), nd_path, text_col="text_norm"
        ).select("doc_id").collect()
    }
    assert set(a4) == {row for row in a3 if row[id_i] in nd_clean_ids}
    release_band_digest_cache(f"{nd_path}/bands")
    release_ngram_digest_cache(dc_path)
    release_bloom_cache(bloom)


def test_shingle_stream_null_id_both_engines(spark):
    """ADVICE r8: a NULL id must flow through the Arrow shingle engine
    exactly like the catalyst form (the numpy int dtypes raised on
    construction; nullable ids now use pandas nullable dtypes)."""
    from clickhouse_etl_spark.dataops.dedup import _shingle_stream

    text = "one two three four five six seven"
    for id_type in ["int", "long", "string"]:
        df = spark.createDataFrame(
            [("1" if id_type == "string" else 1, text), (None, text)],
            f"doc_id {id_type}, text string",
        )
        a = _shingle_stream(df, "text", "doc_id", 5, engine="pandas")
        b = _shingle_stream(df, "text", "doc_id", 5, engine="catalyst")
        assert a.schema["id"].dataType == b.schema["id"].dataType, id_type
        from collections import Counter

        ra = Counter(map(tuple, a.collect()))
        rb = Counter(map(tuple, b.collect()))
        assert ra == rb, id_type
        assert any(k[0] is None for k in ra), id_type  # NULL id survived

    # review r9: Arrow->pandas converts a nullable int64 column to
    # float64, rounding ids past 2^53 — the non-null-carrier + flag
    # path must keep the id EXACT next to a NULL in the same batch
    big = (1 << 53) + 1
    df = spark.createDataFrame(
        [(big, text), (None, text)], "doc_id long, text string"
    )
    got = {
        r["id"]
        for r in _shingle_stream(
            df, "text", "doc_id", 5, engine="pandas"
        ).collect()
    }
    assert big in got and None in got, got


def test_score_kernel_rejects_overflow_dim():
    """ADVICE r8: |score| <= dim * 2^40 must stay inside the int64 the
    vectorized scorer accumulates in — a huge-dim artifact fails loud
    at kernel construction instead of wrapping silently."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.text import _score_kernel

    with _pytest.raises(ValueError, match="int64 overflow"):
        _score_kernel(1 << 22, {}, 0, 1)
    # just under the bound constructs fine
    assert _score_kernel((1 << 22) - 1, {0: 1}, 0, 1) is not None


def test_calibrated_pred_product_exact_across_int64():
    """ADVICE r8: the threshold comparison's product term must be
    exact for the FULL int64 range of score and n_train — decimal
    19x19 -> 38 cannot overflow ((9.2e18)^2 < 10^38), where the old
    38x38 product could silently NULL under ANSI-off."""
    from clickhouse_etl_spark.dataops.text import _calibrated_pred
    from clickhouse_etl_spark.session import get_spark

    from decimal import Decimal

    spark = get_spark()
    big = 2**63 - 1
    # NB: build the exact 38-digit value with PYTHON int multiply —
    # Decimal(big)*big rounds at the decimal context's 28-digit default
    df = spark.createDataFrame(
        [
            (big, big, Decimal(big * big - 1)),
            (big, big, Decimal(big * big)),
        ],
        "score long, _nt long, _ss decimal(38,0)",
    )
    preds = [r["p"] for r in df.select(_calibrated_pred().alias("p")).collect()]
    # product == big^2 exactly: > (big^2 - 1) but not > big^2
    assert preds == [1, 0]


def test_curation_clash_guard_both_engines(spark):
    """ADVICE r8: the output-column clash guard applies to BOTH
    engines — staged must reject the same inputs fused does instead of
    silently overwriting text_norm."""
    import pytest as _pytest

    from clickhouse_etl_spark.streaming.curation import curation_scored_stream

    df = spark.createDataFrame(
        [(1, "some text", "stale")], ["doc_id", "text", "text_norm"]
    )
    for engine in ["staged", "fused"]:
        with _pytest.raises(ValueError, match="already carries"):
            curation_scored_stream(df, "/nonexistent", "/nonexistent", engine=engine)


def test_score_kernel_chunking_identical(spark, monkeypatch):
    """The vectorized scorer builds dense matrices in bounded row
    chunks (memory independent of the artifact's dim); 1-row chunks
    must produce identical kept-sets, scores, and preds to one big
    chunk — including all-unseen drops at chunk boundaries."""
    from clickhouse_etl_spark.dataops import text as tx
    from clickhouse_etl_spark.dataops.hashing import char_fold_hash_py

    dim = 8
    # train exactly apple's and banana's buckets, leave the others
    # untrained so all-cherry / all-elderberry docs exercise the
    # all-unseen drop (unless they collide, which the asserts tolerate)
    wt = {
        char_fold_hash_py("apple") % dim: 5,
        char_fold_hash_py("banana") % dim: -7,
    }
    tok_lists = [
        ["apple"], ["banana", "apple"], ["cherry"] * 5,
        ["date", "apple", "banana"], ["elderberry"],
    ]
    big = tx._score_kernel(dim, wt, s_sum=10, n_tr=3)(tok_lists)
    monkeypatch.setattr(tx, "_SCORE_CHUNK_BYTES", 1)  # 1 row per chunk
    small = tx._score_kernel(dim, wt, s_sum=10, n_tr=3)(tok_lists)
    assert big == small
    sel, scores, preds = big
    assert len(sel) == len(scores) == len(preds)
    # at least one doc must hit a trained bucket and at least one must
    # be droppable for the test to mean anything
    assert 0 < len(sel) <= len(tok_lists)


@pytest.mark.heavy
def test_index_cache_survives_append_rotates_on_rebuild(spark, sf_dir, tmp_path):
    """The loaded-index cache (meta/codebooks/centroids) must SURVIVE
    pq_index_append — append reuses the stored codebooks and only
    grows codes/, and queries re-scan codes fresh each call so new
    vectors are visible — and must ROTATE on a rebuild (all three
    artifact listings change)."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "cache_idx")
    sim.release_index_cache()
    sim.pq_index_build(emb.filter("vec_id < 400"), path)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = sim.pq_index_query(spark, path, queries).collect()
    assert before
    entry0 = sim._INDEX_CACHES[path]

    # append new vectors: cache entry reused, appended ids queryable
    sim.pq_index_append(spark, path, emb.filter("vec_id >= 400"))
    after = sim.pq_index_query(spark, path, queries)
    ids_after = {r["neighbor_id"] for r in after.collect()}
    assert sim._INDEX_CACHES[path] is entry0
    n_codes = spark.read.parquet(f"{path}/codes").count()
    assert n_codes == emb.count()  # append landed
    assert ids_after  # answers still flow over the grown index

    # rebuild: listings change -> cache rotates
    sim.pq_index_build(emb, path)
    sim.pq_index_query(spark, path, queries.limit(1)).collect()
    assert sim._INDEX_CACHES[path] is not entry0
    sim.release_index_cache(path)


@pytest.mark.heavy
def test_pq_index_cell_skew_report_and_rebalance(spark, sf_dir, tmp_path):
    """VERDICT r8 #5: IVF cell-skew maintenance. Appends quantize with
    STORED centroids, so a drifted wave piles into few cells — the
    occupancy report surfaces it, and pq_index_rebalance (retrain on
    the index's own contents) restores the spread. Rebalance ==
    rebuild: the rebalanced artifact is bit-identical to a fresh
    pq_index_build on the union corpus (both deterministic), pinned on
    the drifted corpus. Recall on drifted queries must not degrade
    through the rebalance, and the serving cache rotates on the swap."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter("vec_id < 250").select("vec_id", "embedding")
    path = str(tmp_path / "skew_idx")
    sim.release_index_cache()
    sim.pq_index_build(base, path, n_centroids=8)
    stats0 = sim.pq_index_cell_stats(spark, path)
    assert stats0["n_cells"] == 8
    assert stats0["n_codes"] == base.count()

    # drifted wave: every vector pushed hard toward the all-ones
    # direction — the stored centroids quantize them all into 1-2 cells
    drift = emb.filter("vec_id >= 250").select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x.cast("float") + F.lit(20.0).cast("float")
        ).alias("embedding"),
    )
    sim.pq_index_append(spark, path, drift)
    stats1 = sim.pq_index_cell_stats(spark, path)
    assert stats1["n_codes"] == stats0["n_codes"] + drift.count()
    # the drifted pile dominates one cell far past the uniform share
    assert stats1["max_share"] > 3 * stats1["uniform_share"], stats1
    report = sim.pq_index_cell_report(spark, path)
    shares = [r["share"] for r in report.collect()]
    assert len(shares) == 8 and abs(sum(shares) - 1.0) < 1e-9

    # recall on drifted queries, before the rebalance
    queries = drift.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    union_corpus = base.unionByName(drift)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(union_corpus, queries, k=5).collect()
    }
    got_before = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.pq_index_query(spark, path, queries, k=5).collect()
    }
    recall_before = len(got_before & truth) / len(truth)

    # rebalance in place (reads vectors back from the index itself)
    sim.pq_index_rebalance(spark, path)
    stats2 = sim.pq_index_cell_stats(spark, path)
    assert stats2["n_codes"] == stats1["n_codes"]
    # retrained centroids spread the pile back out
    assert stats2["max_share"] < stats1["max_share"], (stats1, stats2)
    got_after = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.pq_index_query(spark, path, queries, k=5).collect()
    }
    recall_after = len(got_after & truth) / len(truth)
    assert recall_after >= recall_before, (recall_before, recall_after)
    assert recall_after >= 0.9, recall_after

    # rebalance == rebuild, bit for bit, on the drifted union corpus
    fresh = str(tmp_path / "fresh_idx")
    sim.pq_index_build(union_corpus, fresh, n_centroids=8)
    for part, key in (
        ("codes", ["vec_id"]),
        ("centroids", ["cell"]),
        ("codebooks", ["subspace", "code"]),
        ("meta", []),
    ):
        a = sorted(
            map(str, spark.read.parquet(f"{path}/{part}").collect())
        )
        b = sorted(
            map(str, spark.read.parquet(f"{fresh}/{part}").collect())
        )
        assert a == b, f"{part} differs between rebalance and rebuild"

    # codes-only indexes must refuse a corpus-less rebalance loudly
    lean = str(tmp_path / "lean_idx")
    sim.pq_index_build(base, lean, n_centroids=8, store_vectors=False)
    with pytest.raises(ValueError, match="store_vectors"):
        sim.pq_index_rebalance(spark, lean)
    sim.release_index_cache()


def test_gopher_rules_engines_identical(spark):
    """The Arrow counter kernel (default, r12) is row-identical to the
    Catalyst expression battery — real corpus + the edge shapes (null,
    empty, all-punct, bullet/ellipsis lines, substring-short lines)."""
    from clickhouse_etl_spark.dataops.text import gopher_rules
    from clickhouse_etl_spark.sources import load_table

    edge = spark.createDataFrame(
        [
            (100, None), (101, ""), (102, " "), (103, "..."),
            (104, "-"), (105, "- "), (106, "* x\n...\nab..."),
            (107, "ONE Two #three ... mixed...case\nplain"),
        ],
        "doc_id long, text string",
    )
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).unionByName(edge)
    a = sorted(
        map(tuple, gopher_rules(docs, engine="pandas").collect()),
        key=repr,
    )
    b = sorted(
        map(tuple, gopher_rules(docs, engine="catalyst").collect()),
        key=repr,
    )
    assert a == b and len(a) > 8


def test_gopher_rules_battery(spark):
    """Each Gopher rule trips on a purpose-built doc and the clean doc
    passes the whole battery (r9: dataops/text.gopher_rules)."""
    from clickhouse_etl_spark.dataops.text import gopher_rules

    good = (
        "the quick brown fox jumps over that lazy dog and runs away "
        "with great speed to be seen of all in town here today now "
    ) * 3  # ~66 words, mean len in [3,10], two+ required stops
    docs = [
        (0, good),
        (1, "too few words"),  # word count < 50
        (2, " ".join(["a"] * 60)),  # mean word length < 3
        (3, " ".join(["#tag"] * 30 + ["word"] * 30)),  # symbol ratio > 0.1
        (4, "\n".join(["- bullet line"] * 10 + ["plain line"])),  # >90%
        (5, "\n".join(["ends like this..."] * 5 + ["plain line"] * 5)),
        (6, " ".join(["12345"] * 60)),  # alpha fraction < 0.8
        (7, " ".join(["zork"] * 60)),  # no required stopwords
        (8, None),  # null text gates like empty
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert out[0]["pass_gopher"] == 1, out[0]
    assert out[1]["r_word_count"] == 0
    assert out[2]["r_mean_word_len"] == 0
    assert out[3]["r_symbol_ratio"] == 0 and out[3]["n_symbol_words"] == 30
    assert out[4]["r_bullet"] == 0 and out[4]["n_bullet_lines"] == 10
    # 5/10 bullet lines is list-BEARING, not list-dominated — the
    # published 90% threshold keeps it (the 10% misread would reject)
    extra = gopher_rules(
        spark.createDataFrame(
            [(90, "\n".join(["- item"] * 5 + ["plain line"] * 5))],
            "doc_id long, text string",
        )
    ).collect()[0]
    assert extra["r_bullet"] == 1, extra
    assert out[5]["r_ellipsis"] == 0 and out[5]["n_ellipsis_lines"] == 5
    assert out[6]["r_alpha"] == 0
    assert out[7]["r_stopwords"] == 0 and out[7]["n_req_stops"] == 0
    assert out[8]["n_words"] == 0 and out[8]["pass_gopher"] == 0
    for i in range(1, 9):
        assert out[i]["pass_gopher"] == 0, i


def test_temperature_mixture_rates_and_gate(spark):
    """count^0.5 shares: the small source's rate caps at 10000 bp, the
    big source's rate matches the exact integer formula, and keep is
    the deterministic id-hash gate (r9: dataops/text.temperature_
    mixture)."""
    from clickhouse_etl_spark.dataops.hashing import HASH_MOD
    from clickhouse_etl_spark.dataops.text import (
        SAMPLE_A,
        SAMPLE_B,
        temperature_mixture,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df).collect()
    assert len(out) == 1000

    # N=1000, W = (30+10)*2^20; rate_big = 1000*5000*30/(40*900) -> 4166
    rates = {r["source"]: r["rate_bp"] for r in out}
    assert rates == {"big": 4166, "small": 10000}

    for r in out:
        gate = ((r["doc_id"] * SAMPLE_A + SAMPLE_B) % HASH_MOD) % 10000
        assert r["keep"] == (gate < r["rate_bp"]), r
    # every small-source doc is kept at the 10000-bp cap
    assert all(r["keep"] for r in out if r["source"] == "small")
    n_kept_big = sum(1 for r in out if r["source"] == "big" and r["keep"])
    # hash gate tracks the rate (binomial-ish tolerance)
    assert abs(n_kept_big - 0.4166 * 900) < 60, n_kept_big


@pytest.mark.heavy
def test_serving_chunks_oversized_query_batch(spark, sf_dir, tmp_path):
    """Review r9: a serving micro-batch over the max_queries LUT bound
    must split into chunks and answer identically to the unchunked
    query path — the raw guard raising inside foreachBatch killed the
    whole serving StreamingQuery on the first backlog batch."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "serve_chunk_idx")
    sim.release_index_cache()
    sim.pq_index_build(emb.filter("vec_id < 400"), path)
    queries = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in sim.pq_index_query(
            spark, path, queries, k=3, max_queries=None
        ).collect()
    }
    # 25 queries over a 10-query bound -> 5-row chunk target, 5 chunks
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in sim.pq_index_query_chunked(
            spark, path, queries, k=3, max_queries=10
        ).collect()
    }
    assert got == want
    # under the bound: the single direct call path
    small = sim.pq_index_query_chunked(
        spark, path, queries.limit(5), k=3, max_queries=10
    )
    assert small.count() == 15
    # chunk-count cap fails loud with trigger guidance, not OOM
    with _pytest.raises(ValueError, match="bound the source trigger"):
        sim.pq_index_query_chunked(
            spark, path, queries, k=3, max_queries=10, max_serve_chunks=2
        )
    sim.release_index_cache()


def test_c4_filters_battery(spark):
    """Each C4 rule trips on a purpose-built page and the clean page
    passes the whole battery (r9: dataops/text.c4_filters)."""
    from clickhouse_etl_spark.dataops.text import c4_filters

    good = "\n".join(["this line is long enough and fine."] * 6)
    docs = [
        (0, good),
        (1, "no terminal punctuation on this line\n" + good),
        (2, "four words right here.\n" + good),  # < 5 words: dropped
        (3, "this page uses JavaScript heavily and often.\n" + good),
        (4, "classic Lorem Ipsum placeholder text sits here.\n" + good),
        (5, "a code sample with a { brace inside it.\n" + good),
        (6, "\n".join(["only two long sentences remain right here."] * 2)),
        (7, None),
    ]
    out = {
        r["doc_id"]: r
        for r in c4_filters(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert out[0]["pass_c4"] == 1 and out[0]["n_kept_lines"] == 6
    assert out[0]["text_clean"] == good and out[0]["n_sentences"] == 6
    # dropped lines never reach text_clean; doc flags still pass
    assert out[1]["n_kept_lines"] == 6 and out[1]["pass_c4"] == 1
    assert out[2]["n_kept_lines"] == 6
    assert "four words right here." not in out[2]["text_clean"]
    assert out[3]["n_kept_lines"] == 6  # javascript line dropped
    assert out[3]["pass_c4"] == 1  # page-level flags unaffected
    assert out[4]["r_lorem"] == 0 and out[4]["pass_c4"] == 0
    assert out[5]["r_brace"] == 0 and out[5]["pass_c4"] == 0
    assert out[6]["r_sentences"] == 0 and out[6]["n_sentences"] == 2
    assert out[7]["n_kept_lines"] == 0 and out[7]["pass_c4"] == 0
    assert out[7]["text_clean"] == ""

    # parameterized blocklist: page-level kill, schema unchanged
    blocked = c4_filters(
        spark.createDataFrame(
            # sentence-final position: the word abuts the terminal
            # punctuation the line rule itself requires (review fix:
            # tokens split on non-alphanumeric runs, list case-folded)
            [(90, "this page ends with a badword."), (91, good),
             (92, "first long line is fine here.\nbadword\n" + good)],
            "doc_id long, text string",
        ),
        bad_words=["BadWord"],
    ).collect()
    got = {r["doc_id"]: r for r in blocked}
    assert got[90]["r_bad_words"] == 0 and got[90]["pass_c4"] == 0
    assert got[91]["r_bad_words"] == 1
    assert got[92]["r_bad_words"] == 0  # newline-adjacent occurrence

    # ADVICE r9: an entry the [a-z0-9]-run tokenizer can never match
    # (multi-word phrase, punctuation, non-ASCII) fails loud instead of
    # sitting inert in the blocklist
    import pytest as _pytest

    for inert in (["two words"], ["bad-word"], ["naïve"], [""]):
        with _pytest.raises(ValueError, match="bad_words"):
            c4_filters(
                spark.createDataFrame([(0, good)], "doc_id long, text string"),
                bad_words=inert,
            )


def test_importance_against_id_col_fail_loud(spark, tmp_path):
    """ADVICE r9: a typo'd id_col used to be silently ignored on the
    keep-input serve path — it now fails loud at plan build."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.text import (
        importance_against_path,
        write_importance_table,
    )

    docs = spark.createDataFrame(
        [(1, "aaa bbb", "tgt"), (2, "ccc ddd", "raw")],
        "doc_id long, text string, source string",
    )
    path = str(tmp_path / "iw")
    write_importance_table(docs, path, ["tgt"], dim=64)
    with _pytest.raises(ValueError, match="id_col"):
        importance_against_path(docs, path, id_col="document_id")
    # the valid name still scores
    assert importance_against_path(docs, path).count() == 2


def test_line_dedup_first_occurrence(spark):
    """Corpus line dedup keeps only the globally-first copy of every
    line ((doc_id, pos) order), rewrites documents in original line
    order, and drops documents with no surviving lines (r9:
    dataops/dedup.line_dedup)."""
    from clickhouse_etl_spark.dataops.dedup import line_dedup

    docs = [
        (0, "alpha one two.\nshared boilerplate line."),
        (1, "shared boilerplate line.\nunique second line."),
        (2, "shared boilerplate line."),  # fully deduped -> vanishes
        (3, "rep line here.\nrep line here.\nother line stays."),
        (4, "first kept.\n\nsecond kept."),  # empty line ignored
        (5, None),  # null text -> no lines -> vanishes
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert set(out) == {0, 1, 3, 4}
    assert out[0]["text_dedup"] == "alpha one two.\nshared boilerplate line."
    assert out[1]["n_lines_kept"] == 1
    assert out[1]["text_dedup"] == "unique second line."
    # within-doc repeat: first copy survives, order preserved
    assert out[3]["n_lines_kept"] == 2
    assert out[3]["text_dedup"] == "rep line here.\nother line stays."
    assert out[4]["n_lines_kept"] == 2
    assert out[4]["text_dedup"] == "first kept.\nsecond kept."


def test_sentence_span_dedup_published_semantics(spark):
    """C4's final stage at its published unit (Raffel 2020 §2.2): any
    THREE-SENTENCE span occurring more than once keeps its first
    occurrence only; covered sentences drop, short docs pass through,
    fully-covered docs vanish (r10: dataops/dedup.sentence_span_dedup)."""
    from clickhouse_etl_spark.dataops.dedup import sentence_span_dedup

    docs = [
        (0, "alpha one. beta two. gamma three. delta four."),
        # repeats doc 0's first three sentences -> they drop here
        (1, "alpha one. beta two. gamma three. epsilon five."),
        # within-doc repetition: the second and third XYZ copies drop
        (2, "xx one. yy two. zz three. " * 3),
        # entirely one duplicated span -> vanishes
        (3, "alpha one. beta two. gamma three."),
        # fewer sentences than the span -> untouched
        (4, "short one. short two."),
        (5, None),
    ]
    out = {
        r["doc_id"]: r
        for r in sentence_span_dedup(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert set(out) == {0, 1, 2, 4}
    assert out[0]["n_sentences"] == 4 and out[0]["n_sentences_kept"] == 4
    assert out[0]["text_dedup"] == "alpha one\nbeta two\ngamma three\ndelta four"
    assert out[1]["n_sentences_kept"] == 1
    assert out[1]["text_dedup"] == "epsilon five"
    assert out[2]["n_sentences"] == 9 and out[2]["n_sentences_kept"] == 3
    assert out[2]["text_dedup"] == "xx one\nyy two\nzz three"
    assert out[4]["n_sentences_kept"] == 2
    assert out[4]["text_dedup"] == "short one\nshort two"


@pytest.mark.heavy
def test_span_dedup_against_lifecycle(spark, tmp_path):
    """Span-grain cross-wave lifecycle (the sentence_span_dedup
    streaming analogue): wave 1 -> write_span_digest_table -> wave 2
    drops every sentence covered by a seen three-sentence span; short
    docs pass through (rewritten to the sentence stream); fully-covered
    docs vanish; bloom tier equals the exact tier on a deterministic
    corpus; the Python sentence split replays the Spark expression."""
    from clickhouse_etl_spark.dataops.dedup import (
        _sentences_expr,
        release_bloom_cache,
        release_line_digest_cache,
        span_dedup_against_path,
        write_span_bloom_table,
        write_span_digest_table,
    )

    wave1 = spark.createDataFrame(
        [(0, "alpha one. beta two. gamma three. delta four.")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "span_digests")
    write_span_digest_table(wave1, path, mode="overwrite")
    # spans of 4 sentences at k=3: 2 digests
    assert spark.read.parquet(path).count() == 2

    wave2 = spark.createDataFrame(
        [
            # repeats wave-1's first span -> sentences 0-2 drop
            (10, "alpha one. beta two. gamma three. epsilon five."),
            # fully covered by the two seen spans -> vanishes
            (11, "alpha one. beta two. gamma three. delta four."),
            # short doc: no spans -> passes through, rewritten
            (12, "short one. short two."),
            # fresh doc: untouched
            (13, "x uno. y dos. z tres."),
            (14, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_sentences_kept"])
        for r in span_dedup_against_path(wave2, path).collect()
    }
    assert set(out) == {10, 12, 13}
    assert out[10] == ("epsilon five", 1)
    assert out[12] == ("short one\nshort two", 2)
    assert out[13] == ("x uno\ny dos\nz tres", 3)

    # bloom tier: replay vanishes the >=k-sentence docs, equality with
    # the exact tier on this corpus
    bpath = str(tmp_path / "span_bloom")
    write_span_bloom_table(wave1, bpath, capacity=100)
    bloom_out = {
        r["doc_id"]: (r["text"], r["n_sentences_kept"])
        for r in span_dedup_against_path(
            wave2, bpath, seen_format="bloom"
        ).collect()
    }
    assert bloom_out == out
    assert (
        span_dedup_against_path(wave1, bpath, seen_format="bloom").count() == 0
    )

    # Python split parity with the Spark expression on the edges
    edges = [
        (0, "a one! b two? c three. "),
        (1, "\n . ! ?  \n"),
        (2, "no terminal punct at all"),
        (3, None),
    ]
    spark_sents = {
        r["doc_id"]: r["s"]
        for r in spark.createDataFrame(edges, "doc_id long, text string")
        .select("doc_id", _sentences_expr("text").alias("s"))
        .collect()
    }
    import re

    split = re.compile(r"[.!?]").split
    for did, t in edges:
        py = [s2 for s in split(t if t is not None else "") if (s2 := s.strip(" \n"))]
        assert py == spark_sents[did], did

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_sentences_kept"):
        span_dedup_against_path(
            span_dedup_against_path(wave2, path), path
        )
    release_line_digest_cache()
    release_bloom_cache()


def test_line_dedup_against_lifecycle(spark, tmp_path):
    """The line-grain cross-wave lifecycle (VERDICT r9 #3): wave 1 ->
    write_line_digest_table -> wave 2 probes it via
    line_dedup_against_path (seen lines drop, text rewritten in order,
    fully-seen/null docs vanish), and the composition law holds:
    line_dedup(union) restricted to wave-2 docs equals
    line_dedup(line_dedup_against_path(wave2, digests(wave1)))."""
    from clickhouse_etl_spark.dataops.dedup import (
        line_dedup,
        line_dedup_against_path,
        release_line_digest_cache,
        write_line_digest_table,
    )

    wave1 = spark.createDataFrame(
        [
            (0, "cookie banner line.\nalpha unique one."),
            (1, "nav bar line.\ncookie banner line."),
        ],
        "doc_id long, text string",
    )
    wave2 = spark.createDataFrame(
        [
            (10, "cookie banner line.\nfresh wave2 line."),
            (11, "nav bar line."),  # fully seen -> vanishes
            (12, "brand new only.\n\ncookie banner line.\nsecond new."),
            (13, None),  # null text -> vanishes
            (14, "rep in wave2.\nrep in wave2."),  # within-wave dup kept (probe-only)
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "line_digests")
    write_line_digest_table(wave1, path, mode="overwrite")

    probed = {
        r["doc_id"]: r for r in line_dedup_against_path(wave2, path).collect()
    }
    assert set(probed) == {10, 12, 14}
    assert probed[10]["text"] == "fresh wave2 line."
    assert probed[10]["n_lines_kept"] == 1
    # empty lines drop, order preserved
    assert probed[12]["text"] == "brand new only.\nsecond new."
    assert probed[12]["n_lines_kept"] == 2
    # within-wave duplicates are the batch line_dedup's job, not the probe's
    assert probed[14]["text"] == "rep in wave2.\nrep in wave2."

    # composition law: probe + within-wave line_dedup == union line_dedup
    # restricted to wave-2 docs (wave-1 ids sort first, so union
    # first-occurrence order matches "wave 1 seen first")
    union_out = {
        r["doc_id"]: r["text_dedup"]
        for r in line_dedup(wave1.unionByName(wave2)).collect()
        if r["doc_id"] >= 10
    }
    probed_frame = line_dedup_against_path(wave2, path).select("doc_id", "text")
    composed = {
        r["doc_id"]: r["text_dedup"] for r in line_dedup(probed_frame).collect()
    }
    assert composed == union_out
    assert release_line_digest_cache(path) == 1


def test_line_dedup_against_bloom_tier(spark, tmp_path):
    """Line-grain bloom seen-set: every wave-1 line always drops (no
    false negatives by construction) and on this deterministic corpus
    the bloom probe equals the exact digest probe row for row."""
    from clickhouse_etl_spark.dataops.dedup import (
        line_dedup_against_path,
        release_bloom_cache,
        write_line_bloom_table,
        write_line_digest_table,
    )

    wave1 = spark.createDataFrame(
        [(i, f"seen boilerplate line number {i}.\ncommon footer line.") for i in range(50)],
        "doc_id long, text string",
    )
    wave2 = spark.createDataFrame(
        [
            (100 + i, f"seen boilerplate line number {i}.\nfresh content line {i}.")
            for i in range(50)
        ],
        "doc_id long, text string",
    )
    bpath = str(tmp_path / "line_bloom")
    dpath = str(tmp_path / "line_digests")
    write_line_bloom_table(wave1, bpath, capacity=200)
    write_line_digest_table(wave1, dpath, mode="overwrite")

    # replaying wave 1 through the bloom probe leaves nothing
    assert line_dedup_against_path(wave1, bpath, seen_format="bloom").count() == 0

    bloom_out = {
        r["doc_id"]: (r["text"], r["n_lines_kept"])
        for r in line_dedup_against_path(wave2, bpath, seen_format="bloom").collect()
    }
    digest_out = {
        r["doc_id"]: (r["text"], r["n_lines_kept"])
        for r in line_dedup_against_path(wave2, dpath).collect()
    }
    assert bloom_out == digest_out
    assert set(bloom_out) == {100 + i for i in range(50)}
    assert all(t == f"fresh content line {k - 100}." for k, (t, _) in bloom_out.items())
    release_bloom_cache(bpath)


def test_line_digest_cache_rotates_on_append(spark, tmp_path):
    """A wave appending to the line-digest table changes the parquet
    listing, so the cached broadcast seen-set rotates instead of
    anti-probing against stale digests (the ADVICE r7 digest-cache rule
    at line grain)."""
    from clickhouse_etl_spark.dataops.dedup import (
        line_dedup_against_path,
        release_line_digest_cache,
        write_line_digest_table,
    )

    w1 = spark.createDataFrame([(0, "first wave line.")], "doc_id long, text string")
    w2 = spark.createDataFrame([(1, "second wave line.")], "doc_id long, text string")
    probe_doc = spark.createDataFrame(
        [(9, "first wave line.\nsecond wave line.\nstill fresh line.")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "ld")
    write_line_digest_table(w1, path, mode="overwrite")
    out1 = line_dedup_against_path(probe_doc, path).collect()
    assert out1[0]["text"] == "second wave line.\nstill fresh line."
    write_line_digest_table(w2, path, mode="append")
    out2 = line_dedup_against_path(probe_doc, path).collect()
    assert out2[0]["text"] == "still fresh line."
    assert release_line_digest_cache() >= 1


def test_line_dedup_against_guards(spark, tmp_path):
    """Fail-loud surfaces: a seen-set too large to broadcast exactly
    names the bloom tier; an input already carrying n_lines_kept is a
    clash; an unknown seen_format raises."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.dedup import (
        line_dedup_against_path,
        write_line_digest_table,
    )
    from pyspark.sql import functions as F

    w1 = spark.createDataFrame(
        [(i, f"line {i}.") for i in range(5)], "doc_id long, text string"
    )
    path = str(tmp_path / "ld")
    write_line_digest_table(w1, path, mode="overwrite")
    with _pytest.raises(ValueError, match="bloom"):
        line_dedup_against_path(w1, path, max_broadcast_digests=2)
    # the cap must hold on cache HITS too (the r8 bloom-cache rule): a
    # permissive first probe must not grandfather the set past a later,
    # stricter caller
    fresh = spark.createDataFrame(
        [(9, "brand new line.")], "doc_id long, text string"
    )
    assert line_dedup_against_path(fresh, path).count() == 1
    with _pytest.raises(ValueError, match="distinct digests"):
        line_dedup_against_path(fresh, path, max_broadcast_digests=2)
    # append-mode overlap counts DISTINCT keys, not raw parquet rows
    write_line_digest_table(w1, path, mode="append")
    assert (
        line_dedup_against_path(fresh, path, max_broadcast_digests=5).count()
        == 1
    )
    with _pytest.raises(ValueError, match="n_lines_kept"):
        line_dedup_against_path(
            w1.withColumn("n_lines_kept", F.lit(1)), path
        )
    with _pytest.raises(ValueError, match="seen_format"):
        line_dedup_against_path(w1, path, seen_format="nope")


def test_importance_weights_target_affinity(spark):
    """DSIR-style importance weighting: docs matching the target
    domain's hashed-token distribution score strictly higher per token
    than off-target docs; the exact fixed-point weight formula is
    replayed for one bucket (r9: dataops/text.importance_weights)."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.text import importance_weights

    rows = (
        [(i, "aaa aaa aaa", "tgt") for i in range(3)]
        + [(i + 10, "bbb bbb bbb", "web") for i in range(3)]
        + [(20, "aaa bbb", "web"), (21, "", "web")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in importance_weights(df, target_sources=["tgt"], dim=64).collect()
    }
    assert 21 not in out  # zero-token doc omitted
    # n_t[aaa]=9, n_r[aaa]=10 -> wt = (10*2^20)//11 = 953250
    # n_t[bbb]=0, n_r[bbb]=10 -> wt = (1*2^20)//11  =  95325
    assert out[0]["score"] == 3 * 953250 and out[0]["n_tokens"] == 3
    assert out[10]["score"] == 3 * 95325
    assert out[20]["score"] == 953250 + 95325 and out[20]["n_tokens"] == 2
    # per-token affinity orders target > mixed > off-target
    per_tok = {k: v["score"] / v["n_tokens"] for k, v in out.items()}
    assert per_tok[0] > per_tok[20] > per_tok[10]
    with _pytest.raises(ValueError, match="target"):
        importance_weights(df, target_sources=[])


def test_importance_weights_null_source(spark):
    """A token seen ONLY in NULL-source docs still gets the smoothed
    floor weight, not a NULL (ADVICE r11: isin() is NULL for NULL
    input, and sum over all-NULL flags is NULL — the flag must fold
    NULL source to not-target)."""
    from clickhouse_etl_spark.dataops.text import _importance_table

    rows = [
        (0, "aaa aaa", "tgt"),
        (1, "zzz zzz zzz", None),  # zzz appears ONLY under NULL source
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    wt = _importance_table(df, ["tgt"], 64, "text", "source").collect()
    assert wt and all(r["_wt"] is not None for r in wt)
    from clickhouse_etl_spark.dataops.hashing import char_fold_hash_py

    by_bucket = {r["_b"]: r["_wt"] for r in wt}
    # n_t[zzz]=0, n_r[zzz]=3 -> smoothed floor (1*2^20)//4
    assert by_bucket[char_fold_hash_py("zzz") % 64] == (1 << 20) // 4


def test_importance_weights_engine_equality(spark):
    """The Arrow scoring pass (default) is value-identical to the
    catalyst explode/join/groupBy reference form, including null/empty
    text drops and repeated-token counting (r9 wave 2)."""
    from clickhouse_etl_spark.dataops.text import importance_weights

    rows = [
        (0, "aaa bbb aaa ccc aaa", "tgt"),
        (1, "bbb bbb", "web"),
        (2, None, "web"),
        (3, "", "tgt"),
        (4, "ccc " * 50, "web"),
        (5, "zzz yyy xxx www", "tgt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kw = dict(target_sources=["tgt"], dim=32)
    a = sorted(
        map(tuple, importance_weights(df, engine="pandas", **kw).collect())
    )
    b = sorted(
        map(tuple, importance_weights(df, engine="catalyst", **kw).collect())
    )
    assert a == b and len(a) == 4  # null/empty text dropped by both


def test_importance_table_serve_parity(spark, tmp_path):
    """write_importance_table -> importance_against_path replays the
    batch importance_weights scores EXACTLY, appends to input columns,
    and scores never-seen buckets at the add-one-smoothed floor (r9
    wave 2: the classify_against train-offline/score-online split)."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.text import (
        _CLF_FP,
        importance_against_path,
        importance_weights,
        write_importance_table,
    )

    rows = (
        [(i, "aaa aaa bbb", "tgt") for i in range(3)]
        + [(i + 10, "bbb ccc ccc ccc", "web") for i in range(4)]
        + [(20, None, "web")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    path = str(tmp_path / "iw_table")
    write_importance_table(df, path, target_sources=["tgt"], dim=64)

    batch = {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in importance_weights(df, target_sources=["tgt"], dim=64).collect()
    }
    served = importance_against_path(df, path)
    assert set(served.columns) == {"doc_id", "text", "source", "n_tokens", "score"}
    got = {r["doc_id"]: (r["n_tokens"], r["score"]) for r in served.collect()}
    assert got == batch and 20 not in got

    # a NEW doc whose tokens never hit a built bucket: every bucket
    # scores at the smoothed floor (1*2^20)//1
    new = spark.createDataFrame(
        [(99, "zzzz qqqq", "web")], "doc_id long, text string, source string"
    )
    srv = importance_against_path(new, path).collect()[0]
    assert srv["score"] == 2 * _CLF_FP and srv["n_tokens"] == 2

    # clash guard + artifact guards fail loud
    with _pytest.raises(ValueError, match="rename"):
        importance_against_path(
            served, path
        )  # already carries n_tokens/score
    with _pytest.raises(Exception):
        importance_against_path(df, str(tmp_path / "missing"))


def test_shuffle_partitions_for_rule(spark):
    """VERDICT r9 #7: the partition-sizing rule is encoded — measured
    anchors (100M events -> 256, 1B -> 2048, 10M fat docs at the 40k
    target -> 256), clamps, power-of-two rounding, and the restore
    semantics of the sized_shuffle context manager."""
    from clickhouse_etl_spark.dataops.util import (
        shuffle_partitions_for,
        sized_shuffle,
    )

    assert shuffle_partitions_for(10_000_000) == 32  # min clamp
    assert shuffle_partitions_for(100_000_000) == 256
    assert shuffle_partitions_for(1_000_000_000) == 2048
    assert shuffle_partitions_for(
        10_000_000, target_rows_per_partition=40_000
    ) == 256
    assert shuffle_partitions_for(0) == 32
    assert shuffle_partitions_for(10**13) == 8192  # max clamp
    # power-of-two rounding keeps hash partitioning even
    assert shuffle_partitions_for(150_000_000) == 512

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with sized_shuffle(spark, 100_000_000) as parts:
        assert parts == 256
        assert spark.conf.get("spark.sql.shuffle.partitions") == "256"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

def test_decontaminate_against_lifecycle(spark, tmp_path):
    """The n-gram-grain decontamination lifecycle: benchmark corpus ->
    write_ngram_digest_table -> training wave probes it. drop keeps
    only clean docs (published GPT-3/Gopher behavior); flag appends
    the verdict plus the DISTINCT dirty-n-gram count; short/null docs
    are always clean; matching is case- and punctuation-insensitive
    (the published protocol); a second benchmark suite APPENDS and the
    cached seen-set rotates on the listing change."""
    from clickhouse_etl_spark.dataops.dedup import (
        decontaminate_against_path,
        release_ngram_digest_cache,
        write_ngram_digest_table,
    )

    bench = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over dogs"),
            (1, "alpha beta gamma delta"),
        ],
        "bench_id long, text string",
    )
    path = str(tmp_path / "eval_ngrams")
    write_ngram_digest_table(bench, path, n=3, mode="overwrite")

    train = spark.createDataFrame(
        [
            # shares 'quick brown fox' + 'brown fox jumps' -> dirty
            (10, "prefix quick brown fox jumps suffix"),
            # same collision modulo CASE and PUNCTUATION -> still dirty
            (11, "Prefix QUICK, brown: FOX! Jumps? suffix"),
            (12, "completely clean training document here"),
            (13, "alpha beta"),  # 2 tokens < n -> no grams -> clean
            (14, None),  # null text -> clean
            (15, "beta gamma delta epsilon"),  # 2 bench trigrams... check
        ],
        "doc_id long, text string",
    )
    flagged = {
        r["doc_id"]: (r["contaminated"], r["n_dirty_ngrams"])
        for r in decontaminate_against_path(
            train, path, n=3, action="flag"
        ).collect()
    }
    assert set(flagged) == {10, 11, 12, 13, 14, 15}
    assert flagged[10] == (True, 2)  # quick brown fox / brown fox jumps
    assert flagged[11] == (True, 2)  # case/punct fold to the same grams
    assert flagged[12] == (False, 0)
    assert flagged[13] == (False, 0)
    assert flagged[14] == (False, 0)
    # 'beta gamma delta' is the one bench trigram inside doc 15
    assert flagged[15] == (True, 1)

    dropped = {
        r["doc_id"]
        for r in decontaminate_against_path(
            train, path, n=3, action="drop"
        ).collect()
    }
    assert dropped == {d for d, (c, _) in flagged.items() if not c}

    # a second benchmark suite appends; the cache rotates on the
    # listing change and doc 12 now collides with the new suite
    bench2 = spark.createDataFrame(
        [(2, "clean training document")], "bench_id long, text string"
    )
    write_ngram_digest_table(bench2, path, n=3, mode="append")
    flagged2 = {
        r["doc_id"]: (r["contaminated"], r["n_dirty_ngrams"])
        for r in decontaminate_against_path(
            train, path, n=3, action="flag"
        ).collect()
    }
    assert flagged2[12] == (True, 1)
    assert flagged2[10] == (True, 2)  # suite-1 verdicts unchanged
    assert release_ngram_digest_cache(path) == 1


def test_decontaminate_ngram_catalyst_python_parity(spark):
    """The Catalyst n-gram derivation the artifact writers use
    (_distinct_ngrams: lower -> [^a-z0-9]+ split -> guarded sliding
    slices) enumerates EXACTLY the grams the Python probe kernel
    replays — the span-grain _sentences_expr parity rule at word
    grain, on punctuation/case/short-doc edges."""
    import re

    from clickhouse_etl_spark.dataops.dedup import _distinct_ngrams

    texts = [
        "The quick, BROWN fox! jumps --- over 2 lazy dogs.",
        "one two three",
        "short one",  # below n=3 -> no grams
        "",
        None,
        "  leading?! and trailing...  ",
        "a1 b2! C3 a1 b2? c3",  # repeats collapse in the DISTINCT set
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    n = 3
    got = {
        r["ngram"] for r in _distinct_ngrams(df, "text", n).collect()
    }
    split = re.compile(r"[^a-z0-9]+").split
    want = set()
    for t in texts:
        toks = [w for w in split((t or "").lower()) if w]
        for j in range(0, len(toks) - n + 1):
            want.add(" ".join(toks[j : j + n]))
    assert got == want and want, "parity set empty or diverged"


def test_decontaminate_bloom_tier(spark, tmp_path):
    """Bloom-tier decontamination: NO false negatives — every document
    the exact digest probe flags, the bloom probe flags too (drop-mode
    survivors are a subset); on this deterministic corpus the two
    tiers agree exactly."""
    from clickhouse_etl_spark.dataops.dedup import (
        decontaminate_against_path,
        release_bloom_cache,
        write_ngram_bloom_table,
        write_ngram_digest_table,
    )

    bench = spark.createDataFrame(
        [(i, f"benchmark question number {i} asks about topic {i}")
         for i in range(40)],
        "bench_id long, text string",
    )
    bpath = str(tmp_path / "ng_bloom")
    dpath = str(tmp_path / "ng_digests")
    write_ngram_bloom_table(bench, bpath, capacity=2000, n=5)
    write_ngram_digest_table(bench, dpath, n=5, mode="overwrite")

    train = spark.createDataFrame(
        [(100 + i,
          f"leaked benchmark question number {i} asks about topic {i}"
          if i % 2 == 0
          else f"original training text number {i} on subject {i}")
         for i in range(40)],
        "doc_id long, text string",
    )
    dig = {
        r["doc_id"]: (r["contaminated"], r["n_dirty_ngrams"])
        for r in decontaminate_against_path(
            train, dpath, n=5, action="flag"
        ).collect()
    }
    blo = {
        r["doc_id"]: (r["contaminated"], r["n_dirty_ngrams"])
        for r in decontaminate_against_path(
            train, bpath, n=5, action="flag", seen_format="bloom"
        ).collect()
    }
    assert {d for d, (c, _) in dig.items() if c} == {100 + i for i in range(40) if i % 2 == 0}
    # no false negatives: every exact-dirty gram probes dirty in bloom
    for d, (c, k) in dig.items():
        assert blo[d][1] >= k
        if c:
            assert blo[d][0]
    assert blo == dig  # deterministic corpus: tiers agree exactly here
    release_bloom_cache(bpath)


def test_decontaminate_guards(spark, tmp_path):
    """Fail-loud surfaces: unknown action; n < 1 (probe and writers);
    flag-column clashes; an eval set too large to broadcast exactly
    names write_ngram_bloom_table."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.dedup import (
        decontaminate_against_path,
        write_ngram_bloom_table,
        write_ngram_digest_table,
    )

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "bench_id long, text string"
    )
    path = str(tmp_path / "ng")
    write_ngram_digest_table(bench, path, n=3, mode="overwrite")
    train = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="action"):
        decontaminate_against_path(train, path, n=3, action="nope")
    with _pytest.raises(ValueError, match=">= 1"):
        decontaminate_against_path(train, path, n=0)
    with _pytest.raises(ValueError, match=">= 1"):
        write_ngram_digest_table(bench, str(tmp_path / "x"), n=0)
    with _pytest.raises(ValueError, match=">= 1"):
        write_ngram_bloom_table(bench, str(tmp_path / "y"), capacity=10, n=0)
    with _pytest.raises(ValueError, match="contaminated"):
        decontaminate_against_path(
            train.withColumn("contaminated", F.lit(True)), path, n=3,
            action="flag",
        )
    with _pytest.raises(ValueError, match="n_dirty_ngrams"):
        decontaminate_against_path(
            train.withColumn("n_dirty_ngrams", F.lit(0)), path, n=3,
            action="flag",
        )
    # drop mode has no output columns to clash with — allowed
    assert decontaminate_against_path(
        train.withColumn("contaminated", F.lit(True)), path, n=3,
        action="drop",
    ).count() == 0
    with _pytest.raises(ValueError, match="write_ngram_bloom_table"):
        decontaminate_against_path(
            train, path, n=3, max_broadcast_digests=1
        )


@pytest.mark.heavy
def test_neardup_against_lifecycle(spark, tmp_path):
    """The MinHash-LSH near-dup serving split: wave-1 survivors ->
    write_band_digest_table -> wave 2 probes it. The flag verdict
    equals the REFERENCE band-intersection computed Catalyst-side
    (deterministic regardless of hash luck); an exact copy hits every
    band; short/null docs carry no signature and always pass; drop ==
    flag-filtered; a second wave APPENDS and the cached seen-set
    rotates on the listing change."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.dedup import (
        _band_keys_expr,
        _distinct_band_keys,
        neardup_against_path,
        release_band_digest_cache,
        write_band_digest_table,
    )

    wave1 = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "pack my box with five dozen liquor jugs today"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "band_seen")
    write_band_digest_table(wave1, path, n=3, k=8, rows_per_band=2,
                            mode="overwrite")

    wave2 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # exact
            (11, "prefix the quick brown fox jumps over the lazy dog"),
            (12, "a completely fresh document about training data"),
            (13, "two words"),  # < n tokens -> no signature
            (14, None),
        ],
        "doc_id long, text string",
    )
    # reference verdict: per-doc band keys intersected with wave-1's set
    w1_keys = {
        r["band"]
        for r in _distinct_band_keys(wave1, "text", 3, 8, 2).collect()
    }
    expected = {
        r["doc_id"]: len(set(r["keys"]) & w1_keys)
        for r in wave2.select(
            "doc_id",
            _band_keys_expr(F.col("text"), 3, 8, 2).alias("keys"),
        ).collect()
    }
    assert expected[10] == 4  # identical text -> all k/rows_per_band bands
    assert expected[13] == 0 and expected[14] == 0

    flagged = {
        r["doc_id"]: (r["neardup"], r["n_bands_hit"])
        for r in neardup_against_path(wave2, path, action="flag").collect()
    }
    assert set(flagged) == {10, 11, 12, 13, 14}
    for d, hits in expected.items():
        assert flagged[d] == (hits > 0, hits), f"doc {d}"

    dropped = {
        r["doc_id"]
        for r in neardup_against_path(wave2, path, action="drop").collect()
    }
    assert dropped == {d for d, (v, _) in flagged.items() if not v}

    # wave-2 survivors register; the cache rotates on the listing
    # change and an exact copy of doc 12 now collides
    write_band_digest_table(
        wave2.filter(F.col("doc_id").isin(list(dropped))), path,
        n=3, k=8, rows_per_band=2, mode="append",
    )
    wave3 = spark.createDataFrame(
        [(20, "a completely fresh document about training data")],
        "doc_id long, text string",
    )
    flagged3 = {
        r["doc_id"]: r["n_bands_hit"]
        for r in neardup_against_path(wave3, path, action="flag").collect()
    }
    assert flagged3[20] == 4
    assert release_band_digest_cache(f"{path}/bands") == 1


def test_neardup_band_catalyst_python_parity(spark):
    """The Catalyst band-key derivation the artifact writers use
    (_band_keys_expr: single-space split keeping empties, guarded
    sliding windows, distinct, char-fold, affine minima, "{i}:{v}_{v}"
    keys) produces EXACTLY the keys the Python probe kernel replays —
    the decontam parity rule at band grain, on short/empty/null/
    multi-space edges."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.dedup import (
        _band_keys_expr,
        _neardup_probe_kernel,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two three",
        "two words",  # below n=3 -> no keys
        "",
        None,
        "double  space  tokens  here",  # empty tokens preserved
        "repeat repeat repeat repeat repeat",  # grams collapse distinct
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    catalyst = {
        r["i"]: list(r["keys"])
        for r in df.select(
            "i", _band_keys_expr(F.col("text"), 3, 8, 2).alias("keys")
        ).collect()
    }

    def record_keys(t):
        probed = []
        kern = _neardup_probe_kernel(
            lambda key: probed.append(key) or False, 3, 8, 2, count=True
        )
        kern(t)
        return probed

    any_keys = False
    for i, t in enumerate(texts):
        assert record_keys(t) == catalyst[i], f"text {i}"
        any_keys = any_keys or bool(catalyst[i])
    assert any_keys, "parity set empty"


def test_neardup_vs_pair_miner_no_false_negatives(spark, tmp_path):
    """Every cross-wave candidate the batch miner verifies
    (minhash_lsh_pairs over the union, same geometry) has its wave-2
    member flagged by the probe — the serving split can only ADD
    unverified candidates (the declared candidate-grain trade), never
    miss a verified near-dup."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.dedup import (
        minhash_lsh_pairs,
        neardup_against_path,
        write_band_digest_table,
    )

    wave1 = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "completely different text about other things entirely"),
        ],
        "doc_id long, text string",
    )
    wave2 = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta iota"),  # near
            (11, "fresh and unrelated content goes right here"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(
        wave1.unionByName(wave2), n=3, k=8, rows_per_band=2, threshold=0.0
    ).collect()
    cross_w2 = {
        r["id_b"] for r in pairs if r["id_a"] < 10 and r["id_b"] >= 10
    } | {r["id_a"] for r in pairs if r["id_b"] < 10 and r["id_a"] >= 10}
    assert 10 in cross_w2  # the near-copy IS a candidate

    path = str(tmp_path / "band_fn")
    write_band_digest_table(wave1, path, n=3, k=8, rows_per_band=2,
                            mode="overwrite")
    flagged = {
        r["doc_id"]
        for r in neardup_against_path(wave2, path, action="flag").collect()
        if r["neardup"]
    }
    assert cross_w2 <= flagged


@pytest.mark.heavy
def test_neardup_bloom_tier(spark, tmp_path):
    """Bloom-tier near-dup probing: NO false negatives — every document
    the exact digest probe flags, the bloom probe flags too (drop-mode
    survivors are a subset); merge_band_bloom_tables carries the
    geometry and equals the per-wave artifacts' union verdicts."""
    from clickhouse_etl_spark.dataops.dedup import (
        merge_band_bloom_tables,
        neardup_against_path,
        release_bloom_cache,
        write_band_bloom_table,
        write_band_digest_table,
    )

    wave1 = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "pack my box with five dozen liquor jugs today"),
        ],
        "doc_id long, text string",
    )
    probe_df = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "pack my box with five dozen liquor jugs tomorrow"),
            (12, "entirely novel content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    dpath = str(tmp_path / "band_digests")
    bpath = str(tmp_path / "band_bloom")
    write_band_digest_table(wave1, dpath, n=3, k=8, rows_per_band=2,
                            mode="overwrite")
    write_band_bloom_table(wave1, bpath, capacity=64, n=3, k=8,
                           rows_per_band=2, mode="overwrite")

    exact_flags = {
        r["doc_id"]
        for r in neardup_against_path(probe_df, dpath, action="flag").collect()
        if r["neardup"]
    }
    bloom_flags = {
        r["doc_id"]
        for r in neardup_against_path(
            probe_df, bpath, action="flag", seen_format="bloom"
        ).collect()
        if r["neardup"]
    }
    assert exact_flags <= bloom_flags  # no false negatives

    # merge carries geometry; merged verdicts cover each input's
    wave2 = spark.createDataFrame(
        [(2, "entirely novel content with no overlap at all")],
        "doc_id long, text string",
    )
    bpath2 = str(tmp_path / "band_bloom2")
    mpath = str(tmp_path / "band_bloom_merged")
    write_band_bloom_table(wave2, bpath2, capacity=64, n=3, k=8,
                           rows_per_band=2, mode="overwrite")
    merge_band_bloom_tables(spark, [bpath, bpath2], mpath)
    merged_flags = {
        r["doc_id"]
        for r in neardup_against_path(
            probe_df, mpath, action="flag", seen_format="bloom"
        ).collect()
        if r["neardup"]
    }
    assert bloom_flags | {12} <= merged_flags
    release_bloom_cache()


@pytest.mark.heavy
def test_neardup_guards(spark, tmp_path):
    """Fail-loud surface: indivisible/oversized geometry at write,
    mixed geometry across appends at probe, mixed-geometry merge,
    unknown action, flag-column clash."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.dedup import (
        merge_band_bloom_tables,
        neardup_against_path,
        write_band_bloom_table,
        write_band_digest_table,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="must divide k"):
        write_band_digest_table(docs, str(tmp_path / "x1"), k=8,
                                rows_per_band=3)
    with _pytest.raises(ValueError, match="merge_band_bloom_tables"):
        write_band_bloom_table(docs, str(tmp_path / "x3"), capacity=16,
                               mode="append")
    with _pytest.raises(ValueError, match="MINHASH_COEFFS"):
        write_band_digest_table(docs, str(tmp_path / "x2"), k=17)

    path = str(tmp_path / "mixed")
    write_band_digest_table(docs, path, k=8, rows_per_band=2,
                            mode="overwrite")
    # ADVICE r10 #1 (7baeb11): a mismatched-geometry append now fails
    # loud BEFORE any band key is written — the artifact stays intact
    # and probeable under its registered geometry
    with _pytest.raises(ValueError, match="geometry mismatch"):
        write_band_digest_table(docs, path, k=4, rows_per_band=2,
                                mode="append")
    assert [
        r["neardup"]
        for r in neardup_against_path(docs, path, action="flag").collect()
    ] == [True]
    # a legacy artifact that DID accumulate two geometries (pre-guard
    # code) still fails loud at probe time
    from clickhouse_etl_spark.dataops.dedup import _write_band_geometry

    _write_band_geometry(spark, path, 3, 4, 2, "append")
    with _pytest.raises(ValueError, match="distinct geometries"):
        neardup_against_path(docs, path)

    ok = str(tmp_path / "ok")
    write_band_digest_table(docs, ok, mode="overwrite")
    with _pytest.raises(ValueError, match="drop|flag"):
        neardup_against_path(docs, ok, action="verify")
    with _pytest.raises(ValueError, match="rename"):
        neardup_against_path(
            docs.withColumn("neardup", docs.doc_id > 0), ok, action="flag"
        )

    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    write_band_bloom_table(docs, b1, capacity=16, k=8, mode="overwrite")
    write_band_bloom_table(docs, b2, capacity=16, k=4, mode="overwrite")
    with _pytest.raises(ValueError, match="mixed geometries"):
        merge_band_bloom_tables(spark, [b1, b2], str(tmp_path / "bm"))


def test_gopher_repetition_battery(spark):
    """Hand-computed counters on one crafted document: duplicate
    line/paragraph counting (first occurrence is content), top-n-gram
    coverage (count x gram chars, once-only grams contribute 0), and
    overlap-aware duplicate-n-gram position coverage; clash guard; the
    battery composes after gopher_rules (disjoint output columns)."""
    from clickhouse_etl_spark.dataops.text import (
        _repetition_counters,
        gopher_repetition,
        gopher_rules,
    )

    # two paragraphs; the second repeats a line; "x y" bigram repeats
    text = "x y one two\nx y one two\n\nx y three four five"
    c = dict(zip(
        ("rep_n_lines", "rep_dup_lines", "rep_chars_lines",
         "rep_chars_dup_lines", "rep_n_paras", "rep_dup_paras",
         "rep_chars_paras", "rep_chars_dup_paras", "rep_n_toks",
         "rep_chars_toks", "rep_top2_chars", "rep_top3_chars",
         "rep_top4_chars", "rep_dup5_chars", "rep_dup6_chars",
         "rep_dup7_chars", "rep_dup8_chars", "rep_dup9_chars",
         "rep_dup10_chars"),
        _repetition_counters(text),
    ))
    assert c["rep_n_lines"] == 3 and c["rep_dup_lines"] == 1
    assert c["rep_chars_lines"] == 11 + 11 + 19
    assert c["rep_chars_dup_lines"] == 11
    assert c["rep_n_paras"] == 2 and c["rep_dup_paras"] == 0
    assert c["rep_n_toks"] == 13
    # tokens: x y one two x y one two x y three four five
    assert c["rep_chars_toks"] == 1+1+3+3 + 1+1+3+3 + 1+1+5+4+4
    # top 2-gram (x,y) count 3 -> 3 * 2 chars; (y,one)/(one,two) tie at
    # 2 but fewer covered... top picks max (count, chars): (one,two)x2
    # = 12 chars beats (x,y)x3 = 6? no: count 3 > count 2 wins first
    assert c["rep_top2_chars"] == 3 * 2
    # top 3-gram: (x,y,one) x2 -> 2*5=10; (y,one,two) x2 -> 2*7=14 wins
    assert c["rep_top3_chars"] == 14
    # top 4-gram: (x,y,one,two) x2 -> 2*8=16
    assert c["rep_top4_chars"] == 16
    # dup 5-grams, beyond-first greedy scan: (x,y,one,two,x) first at
    # position 0, its repeat found at position 4 -> tokens 4..8 count
    # (1+1+3+3+1 = 9), scan advances past the match
    assert c["rep_dup5_chars"] == 9
    # dup 6-grams: (x,y,one,two,x,y) repeat at position 4 -> 10 chars
    assert c["rep_dup6_chars"] == 10
    # 7-grams: no repeats survive the paragraph change
    assert c["rep_dup7_chars"] == 0

    # "a b c d e a b c d e": the first copy is content; only the
    # second occurrence's 5 token chars count (the dup-line rule at
    # n-gram grain)
    c2 = _repetition_counters("a b c d e a b c d e")
    assert dict(zip(c.keys(), c2))["rep_dup5_chars"] == 5

    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    row = gopher_repetition(df).collect()[0]
    for k, v in c.items():
        assert row[k] == v, k
    assert row["pass_repetition"] in (0, 1)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="rename"):
        gopher_repetition(gopher_repetition(df))

    # composes after gopher_rules: column sets are disjoint by design,
    # and the composed battery reproduces the standalone values
    both = gopher_repetition(gopher_rules(df, required_stops=["one"]))
    r = both.collect()[0]
    assert "pass_gopher" in both.columns
    assert r["pass_repetition"] == row["pass_repetition"]
    for kk in c:
        assert r[kk] == row[kk], kk


def test_gopher_repetition_on_spec_surface(spark):
    """gopher_repetition is declarable as a dataop and stream-safe
    (row-local Arrow pass, like gopher_rules)."""
    from clickhouse_etl_spark.plans.compiler import (
        DATAOPS,
        STREAM_SAFE_DATAOPS,
        resolve_dataop,
    )

    assert "gopher_repetition" in DATAOPS
    assert "gopher_repetition" in STREAM_SAFE_DATAOPS
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None)], ["doc_id", "text"]
    )
    out = resolve_dataop("gopher_repetition")(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["pass_repetition"] == 1 and rows[2]["pass_repetition"] == 1


def test_lsh_geometry_tuning_helpers():
    """The textbook s-curve (1 - (1 - s^r)^b) and the midpoint-tuning
    rule: band_geometry_for(0.5) is exactly the library default (8, 2)
    — midpoint (1/4)^(1/2) = 0.5 — collision probability is monotone
    in jaccard, endpoints exact, and pinning k restricts the search."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.dedup import (
        band_geometry_for,
        lsh_collision_probability,
    )

    assert band_geometry_for(0.5) == (8, 2)
    # pinned-k variants: midpoint (1/b)^(1/r) closest to the target
    assert band_geometry_for(0.2, k=5) == (5, 1)  # exact: 1/5
    k8 = band_geometry_for(0.9, k=8)
    assert k8[0] == 8 and 8 % k8[1] == 0

    assert lsh_collision_probability(0.0) == 0.0
    assert lsh_collision_probability(1.0) == 1.0
    # the default geometry's midpoint is its tuning target
    mid = lsh_collision_probability(0.5, k=8, rows_per_band=2)
    assert abs(mid - (1 - (1 - 0.25) ** 4)) < 1e-12
    probs = [lsh_collision_probability(s / 10) for s in range(11)]
    assert probs == sorted(probs)

    with _pytest.raises(ValueError, match="jaccard"):
        lsh_collision_probability(1.5)
    with _pytest.raises(ValueError, match="threshold"):
        band_geometry_for(0.0)


def test_band_keys_engines_identical(spark):
    """The Arrow write path (default, _band_keys_py — the probe's own
    kernel) and the Catalyst reference form (_band_keys_expr) derive
    the IDENTICAL distinct band-key set, on short/empty/null/
    multi-space edges and real-looking text."""
    from clickhouse_etl_spark.dataops.dedup import _distinct_band_keys

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs today",
        "one two three",
        "two words",
        "",
        None,
        "double  space  tokens  here",
        "repeat repeat repeat repeat repeat",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = {
        r["band"]
        for r in _distinct_band_keys(df, "text", 3, 8, 2, engine="pandas").collect()
    }
    b = {
        r["band"]
        for r in _distinct_band_keys(df, "text", 3, 8, 2, engine="catalyst").collect()
    }
    assert a == b and a, "engines diverged or produced nothing"


@pytest.mark.heavy
def test_vec_dedup_against_lifecycle(spark, sf_dir, tmp_path):
    """The SemDeDup serving split: wave-1 kept vectors ->
    write_vec_bucket_table -> wave 2 probes it. The flag verdict
    equals the REFERENCE bucket-intersection computed with the shared
    kernel; an exact copy hits every table; NULL vectors always pass;
    drop == flag-filtered; appends under the same geometry accumulate
    and the cache rotates on the listing change."""
    from clickhouse_etl_spark.dataops.similarity import (
        _vec_bucket_keys_py,
        release_vec_bucket_cache,
        vec_dedup_against_path,
        write_vec_bucket_table,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    w1 = emb.filter("vec_id % 2 = 0")
    w2 = emb.filter("vec_id % 2 = 1")
    path = str(tmp_path / "vec_buckets")
    write_vec_bucket_table(w1, path, mode="overwrite")

    keys = _vec_bucket_keys_py(8, 16, 64)
    w1_keys = set()
    for r in w1.collect():
        w1_keys.update(keys(r["embedding"]))
    expected = {
        r["vec_id"]: sum(1 for kk in keys(r["embedding"]) if kk in w1_keys)
        for r in w2.collect()
    }

    flagged = {
        r["vec_id"]: (r["semantic_neardup"], r["n_tables_hit"])
        for r in vec_dedup_against_path(w2, path, action="flag").collect()
    }
    assert len(flagged) == w2.count()
    for vid, hits in expected.items():
        assert flagged[vid] == (hits > 0, hits), f"vec {vid}"

    dropped = {
        r["vec_id"]
        for r in vec_dedup_against_path(w2, path).collect()
    }
    assert dropped == {v for v, (f, _) in flagged.items() if not f}

    # an exact copy of a registered vector hits all 8 tables; a NULL
    # vector has no keys and passes
    one = w1.limit(1).collect()[0]
    probe_df = spark.createDataFrame(
        [(9001, one["embedding"]), (9002, None)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["semantic_neardup"], r["n_tables_hit"])
        for r in vec_dedup_against_path(probe_df, path, action="flag").collect()
    }
    assert got[9001] == (True, 8) and got[9002] == (False, 0)

    # a later wave registers (append, same geometry); an exact copy of
    # the newly registered vector collides after the cache rotates on
    # the listing change
    fresh_vec = [0.0] * 63 + [1.0]
    wave3 = spark.createDataFrame(
        [(9100, fresh_vec)], "vec_id long, embedding array<float>"
    )
    write_vec_bucket_table(wave3, path, mode="append")
    again = vec_dedup_against_path(
        spark.createDataFrame(
            [(9101, fresh_vec)], "vec_id long, embedding array<float>"
        ),
        path, action="flag",
    ).collect()[0]
    assert again["semantic_neardup"] and again["n_tables_hit"] == 8
    assert release_vec_bucket_cache(path) == 1


@pytest.mark.heavy
def test_vec_bucket_keys_match_pair_miner(spark, sf_dir, tmp_path):
    """The shared probe/writer kernel derives EXACTLY the bucket keys
    the LSH pair miner buckets on (_lsh_buckets_batched's '_bkt'), so
    a probe hit == 'would have been a miner candidate': every
    cross-wave candidate pair's wave-2 member is flagged (no false
    negatives vs the miner)."""
    from clickhouse_etl_spark.dataops.similarity import (
        _lsh_buckets_batched,
        _vec_bucket_keys_py,
        lsh_near_dup_pairs,
        vec_dedup_against_path,
        write_vec_bucket_table,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sample = emb.limit(50)
    mined = {}
    for r in _lsh_buckets_batched(
        sample, 8, 4, 64, "vec_id", "embedding"
    ).collect():
        mined.setdefault(r["vec_id"], set()).add(r["_bkt"])
    keys = _vec_bucket_keys_py(8, 4, 64)
    for r in sample.collect():
        assert set(keys(r["embedding"])) == mined[r["vec_id"]], r["vec_id"]

    w1 = emb.filter("vec_id % 2 = 0")
    w2 = emb.filter("vec_id % 2 = 1")
    # threshold -1: every LSH candidate pair survives (cosine >= -1)
    pairs = lsh_near_dup_pairs(w1.unionByName(w2), threshold=-1.0)
    w1_ids = {r["vec_id"] for r in w1.collect()}
    cross_w2 = set()
    for r in pairs.collect():
        if r["id_a"] in w1_ids and r["id_b"] not in w1_ids:
            cross_w2.add(r["id_b"])
        elif r["id_b"] in w1_ids and r["id_a"] not in w1_ids:
            cross_w2.add(r["id_a"])
    path = str(tmp_path / "vb_miner")
    # parity with the miner needs the MINER'S geometry (8x4) — its
    # 128-key space runs dense on this label-clustered corpus, so the
    # occupancy guard is explicitly lifted (this test measures miner
    # parity, not geometry health; the guard has its own test)
    write_vec_bucket_table(
        w1, path, n_tables=8, bits_per_table=4, mode="overwrite",
        max_occupancy=1.0,
    )
    flagged = {
        r["vec_id"]
        for r in vec_dedup_against_path(
            w2, path, action="flag", max_occupancy=1.0
        ).collect()
        if r["semantic_neardup"]
    }
    assert cross_w2 and cross_w2 <= flagged


@pytest.mark.heavy
def test_vec_dedup_against_guards(spark, tmp_path):
    """Fail-loud surface: mixed geometry across appends, wrong-dim
    probe vectors, unknown action, flag-column clash, bad geometry
    parameters, spec-surface registration."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.similarity import (
        _vec_bucket_keys_py,
        vec_dedup_against_path,
        write_vec_bucket_table,
    )
    from clickhouse_etl_spark.plans.compiler import (
        DATAOPS,
        REQUIRED_DATAOP_PARAMS,
        STREAM_SAFE_DATAOPS,
    )

    assert "semantic_dedup_against" in DATAOPS
    assert "semantic_dedup_against" in STREAM_SAFE_DATAOPS
    assert REQUIRED_DATAOP_PARAMS["semantic_dedup_against"] == ("seen_path",)

    vecs = spark.createDataFrame(
        [(0, [float(i) for i in range(8)])],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "vb_mixed")
    write_vec_bucket_table(vecs, path, n_tables=4, bits_per_table=4,
                           dim=8, mode="overwrite")
    # ADVICE r10 #1: a mismatched-geometry append fails loud BEFORE
    # writing any key — the artifact stays intact and probeable
    before = spark.read.parquet(f"{path}/buckets").count()
    with _pytest.raises(ValueError, match="geometry mismatch"):
        write_vec_bucket_table(vecs, path, n_tables=8, bits_per_table=4,
                               dim=8, mode="append")
    assert spark.read.parquet(f"{path}/buckets").count() == before
    vec_dedup_against_path(vecs, path).collect()  # still healthy

    # a legacy artifact that DID accumulate two geometries (written by
    # pre-guard code) still fails loud at probe time
    from clickhouse_etl_spark.dataops.similarity import (
        _write_vec_bucket_geometry,
    )

    _write_vec_bucket_geometry(spark, path, 8, 4, 8, "append")
    with _pytest.raises(ValueError, match="distinct geometries"):
        vec_dedup_against_path(vecs, path)

    ok = str(tmp_path / "vb_ok")
    write_vec_bucket_table(vecs, ok, dim=8, mode="overwrite")
    wrong_dim = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(Exception, match="dim"):
        vec_dedup_against_path(wrong_dim, ok).collect()
    with _pytest.raises(ValueError, match="drop|flag"):
        vec_dedup_against_path(vecs, ok, action="verify")
    with _pytest.raises(ValueError, match="rename"):
        vec_dedup_against_path(
            vecs.withColumn("n_tables_hit", F.lit(1)), ok, action="flag"
        )
    with _pytest.raises(ValueError, match="int64"):
        _vec_bucket_keys_py(1, 63, 8)
    with _pytest.raises(ValueError, match=">= 1"):
        _vec_bucket_keys_py(0, 4, 8)

    # assembles into the one streaming chain (mid-chain, embeddings-
    # shaped stream — the ann_serve precedent); drop mode keeps schema
    import datetime as dt

    from pyspark.sql import types as T

    from clickhouse_etl_spark.spec.model import DataopConfig, SourceConfig
    from clickhouse_etl_spark.streaming.runner import streaming_source_chain

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("ts", T.TimestampType()),
    ])
    src_dir = str(tmp_path / "vb_stream_in")
    spark.createDataFrame(
        [(7, [float(i) for i in range(8)], dt.datetime(2024, 1, 1))],
        schema,
    ).write.parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    cfg = SourceConfig(
        source_id="embeddings",
        dataops=(DataopConfig(
            op="semantic_dedup_against", params={"seen_path": ok}
        ),),
    )
    out_stream = streaming_source_chain(cfg, "ts", value_is_json=False)(stream)
    assert out_stream.isStreaming
    assert set(out_stream.columns) == {"vec_id", "embedding", "ts"}


@pytest.mark.heavy
def test_vec_bucket_saturation_guard(spark, tmp_path):
    """VERDICT r10 #2: a vector-bucket artifact whose registered keys
    fill the geometry's bucket space past max_occupancy is rejected at
    BOTH ends — the writer raises pre-write (artifact untouched), and
    the probe raises on a saturated artifact built by legacy code —
    instead of silently dropping ~100% of every probed wave."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.similarity import (
        vec_dedup_against_path,
        write_vec_bucket_table,
    )

    # 1 table x 1 bit = a 2-key space; v and -v land in opposite
    # hyperplane buckets, so together they saturate it exactly
    both = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]), (1, [-1.0, -1.0, -1.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "vb_sat")
    with _pytest.raises(ValueError, match="occupancy"):
        write_vec_bucket_table(
            both, path, n_tables=1, bits_per_table=1, dim=4,
            mode="overwrite",
        )
    from clickhouse_etl_spark.dataops.util import path_exists

    assert not path_exists(spark, f"{path}/buckets"), (
        "rejected wave must leave nothing behind"
    )

    # half the space (one key) passes the default 0.5 threshold ...
    one = both.filter("vec_id = 0")
    write_vec_bucket_table(
        one, path, n_tables=1, bits_per_table=1, dim=4, mode="overwrite"
    )
    # ... and an append that would overflow it is rejected pre-write
    before = spark.read.parquet(f"{path}/buckets").count()
    with _pytest.raises(ValueError, match="occupancy"):
        write_vec_bucket_table(
            both, path, n_tables=1, bits_per_table=1, dim=4, mode="append"
        )
    assert spark.read.parquet(f"{path}/buckets").count() == before

    # a saturated artifact force-built (or written by pre-guard code)
    # is rejected at probe time; the explicit override still probes
    write_vec_bucket_table(
        both, path, n_tables=1, bits_per_table=1, dim=4,
        mode="overwrite", max_occupancy=1.0,
    )
    with _pytest.raises(ValueError, match="occupancy"):
        vec_dedup_against_path(both, path)
    assert (
        vec_dedup_against_path(both, path, max_occupancy=1.0).count() == 0
    )  # every vector collides — the loud-vs-silent difference


@pytest.mark.heavy
def test_band_digest_append_geometry_prechecked(spark, tmp_path):
    """ADVICE r10 #1 at band grain: a mismatched-geometry append to a
    band-digest artifact fails loud BEFORE any band key is written, so
    the artifact stays intact instead of corrupt-then-detected."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.dedup import (
        neardup_against_path,
        write_band_digest_table,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bands_geom")
    write_band_digest_table(docs, path, n=3, k=8, rows_per_band=2,
                            mode="overwrite")
    before = spark.read.parquet(f"{path}/bands").count()
    with _pytest.raises(ValueError, match="geometry mismatch"):
        write_band_digest_table(docs, path, n=2, k=8, rows_per_band=4,
                                mode="append")
    assert spark.read.parquet(f"{path}/bands").count() == before
    assert neardup_against_path(docs, path).count() == 0  # still healthy


def test_bloom_grain_writers_reject_inplace_append(spark, tmp_path):
    """Every grain wrapper of the bloom tier rejects mode='append':
    two waves' sparse bitmap rows clobber each other's bits at load
    time (silent false negatives) — merge_bloom_tables is the only
    accumulation path (the band-tier review lesson, applied to the
    line/span/ngram grains it generalized to)."""
    import pytest as _pytest

    from clickhouse_etl_spark.dataops.dedup import (
        write_line_bloom_table,
        write_ngram_bloom_table,
        write_span_bloom_table,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon. second sentence here. third one too.")],
        "doc_id long, text string",
    )
    for i, writer in enumerate(
        (write_line_bloom_table, write_span_bloom_table, write_ngram_bloom_table)
    ):
        with _pytest.raises(ValueError, match="merge_bloom_tables"):
            writer(docs, str(tmp_path / f"bl{i}"), capacity=16, mode="append")


def test_scrub_pii_battery(spark):
    """VERDICT r10 #5: the published scrub surface beyond email/URL —
    per-rule boundary cases, the declared rule ORDER (IPs inside URLs
    belong to <URL>; card/ID numbers are not bitten by the phone
    rule), audit counts, and cross-engine determinism (the battery is
    in the Java-regex/RE2 agreement subset — pinned against DuckDB on
    every tricky row, the normalize_text precedent)."""
    import duckdb

    from clickhouse_etl_spark.dataops.chunking import (
        PII_RULES,
        scrub_pii,
        scrub_pii_battery,
    )
    from clickhouse_etl_spark.plans.compiler import (
        DATAOPS,
        STREAM_SAFE_DATAOPS,
    )

    assert "scrub_pii_battery" in DATAOPS
    assert "scrub_pii_battery" in STREAM_SAFE_DATAOPS

    rows = [
        # (doc_id, text, expected_scrubbed, {rule: count})
        (0, "mail bob.smith+x@corp.example.co now",
         "mail <EMAIL> now", {"email": 1}),
        (1, "see https://a.example.com/p?q=1.2.3.4 ok",
         "see <URL> ok", {"url": 1}),          # IP inside URL -> <URL>
        (2, "card 1234 5678 9012 3456 and 1234-5678-9012-3456",
         "card <CC> and <CC>", {"cc": 2}),
        (3, "ssn 123-45-6789 stays ID not phone",
         "ssn <ID> stays ID not phone", {"ssn": 1}),
        (4, "host 192.168.0.1 up", "host <IP> up", {"ip": 1}),
        (5, "call +1 555 123 4567 or (555) 123-4567 or 555.123.4567",
         "call <PHONE> or <PHONE> or <PHONE>", {"phone": 3}),
        # boundary misses: 5-digit zip pair, a date, a bare digit run,
        # a 3-part dotted version that is not a quad
        (6, "zip 12345-6789 date 2024-01-15 run 5551234567 v 1.2.3",
         "zip 12345-6789 date 2024-01-15 run 5551234567 v 1.2.3", {}),
        (7, None, "", {}),
        # a 4-4-4 separator-joined group is NOT a <CC> (needs 4 groups)
        # but IS phone-shaped — the battery's documented behavior
        (8, "x 1234 5678 9012 345 y",
         "x <PHONE> 345 y", {"phone": 1}),
        (9, "both a@b.co https://c.d 222-333-4444 10.0.0.7",
         "both <EMAIL> <URL> <PHONE> <IP>",
         {"email": 1, "url": 1, "phone": 1, "ip": 1}),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in scrub_pii_battery(df).collect()}
    for i, _, want, want_counts in rows:
        assert got[i]["text_scrubbed"] == want, f"doc {i}"
        for name, _, _ in PII_RULES:
            assert got[i][f"pii_{name}"] == want_counts.get(name, 0), (
                f"doc {i} count {name}"
            )

    # cross-engine determinism: DuckDB (RE2) replays the same ordered
    # battery to identical text and counts on every row
    con = duckdb.connect()
    for i, t, want, want_counts in rows:
        if t is None:
            continue
        cur = t
        for name, pat, repl in PII_RULES:
            n = con.execute(
                "select len(regexp_extract_all(?, ?))", [cur, pat]
            ).fetchone()[0]
            assert n == want_counts.get(name, 0), f"duckdb {i} {name}"
            cur = con.execute(
                "select regexp_replace(?, ?, ?, 'g')", [cur, pat, repl]
            ).fetchone()[0]
        assert cur == want, f"duckdb doc {i}"

    # superset of the email/URL pass: identical text_scrubbed there
    base = df.filter("doc_id in (0, 1, 9)")
    a = {r["doc_id"]: r["text_scrubbed"]
         for r in scrub_pii(base).collect()}
    b = {r["doc_id"]: r["text_scrubbed"]
         for r in scrub_pii_battery(base).collect()}
    assert a[0] == b[0] and a[1] == b[1]  # no numeric rules triggered


def test_scrub_pii_battery_streams(spark, tmp_path):
    """The battery assembles mid-chain under Structured Streaming (a
    row-local projection — no state, no shuffle) via the spec surface."""
    import datetime as dt

    from pyspark.sql import types as T

    from clickhouse_etl_spark.spec.model import DataopConfig, SourceConfig
    from clickhouse_etl_spark.streaming.runner import streaming_source_chain

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    src = str(tmp_path / "scrub_stream_in")
    spark.createDataFrame(
        [(1, "mail a@b.co from 10.0.0.7", dt.datetime(2024, 1, 1))], schema
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    cfg = SourceConfig(
        source_id="documents",
        dataops=(DataopConfig(op="scrub_pii_battery", params={}),),
    )
    out = streaming_source_chain(cfg, "ts", value_is_json=False)(stream)
    assert out.isStreaming
    assert "text_scrubbed" in out.columns and "pii_ip" in out.columns
    # and the one micro-batch actually scrubs
    q = (
        out.writeStream.format("memory")
        .queryName("scrub_battery_smoke")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select text_scrubbed from scrub_battery_smoke"
    ).collect()[0][0]
    assert got == "mail <EMAIL> from <IP>"

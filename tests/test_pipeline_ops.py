"""Training-data pipeline operators: text, dedup, ANN, windows, multimodal."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from alp_ray.pipelines.ann import build_ivf, cosine_topk, ivf_topk, norm2
from alp_ray.pipelines.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from alp_ray.stages.multimodal import (
    AudioFeatureStage,
    DecodeImageStage,
    FrameSampleStage,
    synth_media,
)
from alp_ray.stages.text import (
    FingerprintStage,
    LangIdStage,
    QualityScoreStage,
    TokenCountStage,
)
from alp_ray.stages.window import sessionize, tumbling_window

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_token_counts(docs):
    out = docs.map_batches(
        TokenCountStage, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    row = out.iloc[0]
    assert row["n_tokens"] == len(row["text"].split())
    assert (out["n_subwords"] >= out["n_tokens"]).all()


def test_quality_scores(docs):
    out = docs.map_batches(
        QualityScoreStage, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    assert ((out["q_score"] >= 0) & (out["q_score"] <= 1)).all()
    assert (out["q_n_chars"] == out["text"].str.len()).all()


def test_langid_deterministic(docs):
    out1 = docs.map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    assert set(out1["lang_pred"]) <= {"en", "de", "fr", "es", "und"}
    english = "the cat sat on the mat and the dog ran to the house"
    t = pa.table({"doc_id": [0], "text": [english]})
    got = LangIdStage()(t)
    assert got.column("lang_pred")[0].as_py() == "en"


def test_fingerprint_whitespace_invariant():
    t = pa.table(
        {"doc_id": [0, 1], "text": ["hello  world", "hello world"]}
    )
    out = FingerprintStage()(t)
    fps = out.column("fingerprint").to_pylist()
    assert fps[0] == fps[1]


def _docs_with_dups():
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about graph engines and rays",
        "numerical linear algebra over semirings is surprisingly fun",
    ]
    texts = []
    for i in range(20):
        texts.append(base[i % 3] + f" filler {i} " + "pad " * (i % 5))
    # Plant exact dup of doc 0 and a near-dup (one word changed).
    texts.append(texts[0])
    texts.append(texts[0].replace("quick", "swift"))
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": np.arange(len(texts), dtype=np.int64),
             "text": texts}
        )
    )


def test_exact_dedup():
    ds = _docs_with_dups()
    kept = exact_dedup(ds).to_pandas()
    # 21 distinct texts (one exact dup planted).
    assert len(kept) == 21
    assert 0 in set(kept["keep_id"])  # min id survives
    assert 20 not in set(kept["keep_id"])  # the dup lost to id 0


def test_minhash_lsh_finds_planted_pair():
    ds = _docs_with_dups()
    pairs = minhash_lsh_pairs(ds, num_perm=64, bands=16).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 20) in found  # exact dup must collide
    hi = pairs[(pairs.id_a == 0) & (pairs.id_b == 20)]
    assert (hi["est_jaccard"] >= 0.99).all()
    near = pairs[(pairs.id_a == 0) & (pairs.id_b == 21)]
    assert len(near) == 1 and near["est_jaccard"].iloc[0] > 0.5


def test_ngram_jaccard_exact_values():
    ds = _docs_with_dups()
    pairs = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    exact = pairs[(pairs.id_a == 0) & (pairs.id_b == 20)]
    assert len(exact) == 1
    assert exact["jaccard"].iloc[0] == 1.0


def test_simhash_near_dups():
    ds = _docs_with_dups()
    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 20) in found
    ham0 = pairs[(pairs.id_a == 0) & (pairs.id_b == 20)]["hamming"].iloc[0]
    assert ham0 == 0


def test_embedding_cosine_pairs(emb):
    # Plant an exact duplicate vector.
    df = emb.to_pandas().head(50)
    dup = df.iloc[[0]].copy()
    dup["vec_id"] = 9999
    import pandas as pd

    ds = ray.data.from_pandas(pd.concat([df, dup], ignore_index=True))
    pairs = embedding_cosine_pairs(ds, threshold=0.999).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (df["vec_id"].iloc[0], 9999) in found


def test_cosine_topk_exact(emb):
    df = emb.to_pandas()
    V = np.array(df["embedding"].tolist(), dtype=np.float64)
    q = V[0]
    got = cosine_topk(emb, q, k=5).to_pandas()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ (q / np.linalg.norm(q))
    want_ids = df["vec_id"].to_numpy()[np.argsort(-sims)[:5]]
    assert set(got["vec_id"]) == set(want_ids)
    assert got["cosine"].iloc[0] == pytest.approx(1.0)


def test_ivf_topk_recall(emb):
    C, bucketed = build_ivf(emb, n_centroids=8)
    bucketed = bucketed.materialize()
    df = emb.to_pandas()
    V = np.array(df["embedding"].tolist(), dtype=np.float64)
    q = V[3]
    exact = set(cosine_topk(emb, q, k=10).to_pandas()["vec_id"])
    approx = set(
        ivf_topk(bucketed, C, q, k=10, nprobe=4).to_pandas()["vec_id"]
    )
    # ≥60% recall at nprobe=4/8 on tiny data.
    assert len(exact & approx) >= 6


def test_norm2(emb):
    df = emb.to_pandas()
    V = np.array(df["embedding"].tolist(), dtype=np.float64)
    assert norm2(emb) == pytest.approx(np.linalg.norm(V), rel=1e-9)


def test_tumbling_window():
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    out = tumbling_window(ev, width_s=3600).to_pandas()
    df = ev.to_pandas()
    df["window_start"] = df["ts"].dt.floor("h")
    want = (
        df.groupby(["window_start", "event_type"])["value"]
        .agg(["count", "sum"])
        .reset_index()
    )
    got = out.sort_values(["window_start", "event_type"]).reset_index(
        drop=True
    )
    want = want.sort_values(["window_start", "event_type"]).reset_index(
        drop=True
    )
    assert (got["n_events"].to_numpy() == want["count"].to_numpy()).all()
    np.testing.assert_allclose(
        got["sum_value"].to_numpy(), want["sum"].to_numpy()
    )


def test_sessionize():
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    out = sessionize(ev, gap_s=1800).to_pandas()
    df = ev.to_pandas().sort_values(["user_id", "ts"])
    # Oracle for one user.
    uid = df["user_id"].iloc[0]
    sub = df[df.user_id == uid]
    gaps = sub["ts"].diff().dt.total_seconds() > 1800
    n_sessions = int(gaps.sum()) + 1
    got = out[out.user_id == uid]
    assert len(got) == n_sessions
    assert got["n_events"].sum() == len(sub)


def test_multimodal_stubs():
    media = ray.data.from_arrow(synth_media(48))
    imgs = media.filter(expr="kind == 'image'")
    decoded = imgs.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(fake=True),
        batch_size=8,
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert (decoded["pixels"].str.len() == 32 * 32 * 3).all()
    # Deterministic: same payload → same pixels.
    d2 = imgs.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(fake=True),
        batch_size=8,
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    m1 = dict(zip(decoded["media_id"], decoded["pixels"]))
    m2 = dict(zip(d2["media_id"], d2["pixels"]))
    k = next(iter(m1))
    assert list(m1[k]) == list(m2[k])

    audio = media.filter(expr="kind == 'audio'")
    feats = audio.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs=dict(fake=True),
        batch_size=8,
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert (feats["frame_energy"].str.len() == 16).all()

    video = media.filter(expr="kind == 'video'")
    frames = video.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(fake=True),
        batch_size=4,
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert (frames["frame_index"] % 8 == 0).all()


def test_multimodal_real_codec_raises():
    stage = DecodeImageStage(fake=False)
    t = synth_media(2)
    with pytest.raises(NotImplementedError):
        stage(t)


def test_minhash_dedup_keep_antijoin():
    from alp_ray.pipelines.dedup import minhash_dedup_keep

    ds = _docs_with_dups()
    kept = minhash_dedup_keep(ds, threshold=0.8).to_pandas()
    ids = set(kept["doc_id"])
    assert 0 in ids          # winner of the planted dup pair survives
    assert 20 not in ids     # exact dup (larger id) removed
    assert len(kept) < ds.count()
    # No-duplicates corpus passes through untouched (empty loser set).
    clean = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(3, dtype=np.int64),
                "text": [
                    "alpha beta gamma delta epsilon zeta eta theta",
                    "one two three four five six seven eight nine",
                    "red green blue cyan magenta yellow black white",
                ],
            }
        )
    )
    assert minhash_dedup_keep(clean, threshold=0.8).count() == 3


def test_broadcast_join_inner_left_and_guard():
    import pytest

    from alp_ray.stages.relational import broadcast_join

    large = ray.data.from_arrow(
        pa.table(
            {
                "k": np.array([1, 2, 3, 2], np.int64),
                "x": np.array([10, 20, 30, 40], np.int64),
            }
        )
    )
    small = pa.table(
        {"k": np.array([1, 2], np.int64), "name": ["a", "b"]}
    )
    inner = broadcast_join(large, small, on="k").to_pandas()
    assert len(inner) == 3 and set(inner["name"]) == {"a", "b"}
    left = broadcast_join(large, small, on="k", how="left").to_pandas()
    assert len(left) == 4 and left["name"].isna().sum() == 1
    with pytest.raises(ValueError, match="max_rows"):
        broadcast_join(large, small, on="k", max_rows=1)


def test_stratified_split_exact_per_stratum():
    from alp_ray.stages.relational import stratified_split

    rng = np.random.RandomState(5)
    n = 500
    keys = rng.permutation(100_000)[:n].astype(np.int64)
    strata = np.array(["en", "de", "fr"])[rng.randint(0, 3, n)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": keys, "lang": strata})
    )
    got = stratified_split(
        ds, stratum_col="lang", key_col="doc_id", test_frac=0.2
    ).to_pandas()
    mult, mod = 1_000_003, 1_000_000_007
    for lang in ("en", "de", "fr"):
        kk = keys[strata == lang]
        k_s = int(np.floor(kk.size * 0.2))
        h = (kk * mult) % mod
        order = np.lexsort((kk, h))
        expect = set(kk[order][:k_s].tolist())
        have = set(got[got["lang"] == lang]["doc_id"])
        assert have == expect and len(have) == k_s


def test_range_join_bands():
    import pytest

    from alp_ray.stages.relational import range_join

    large = ray.data.from_arrow(
        pa.table({"v": np.array([5.0, 15.0, 25.0, 99.0], np.float64)})
    )
    bands = pa.table(
        {
            "band": np.array([0, 1, 2], np.int64),
            "lo": np.array([0.0, 10.0, 20.0]),
            "hi": np.array([10.0, 20.0, 30.0]),
        }
    )
    inner = range_join(large, bands, value_col="v").to_pandas()
    assert list(inner.sort_values("v")["band"]) == [0, 1, 2]
    left = range_join(
        large, bands, value_col="v", how="left"
    ).to_pandas()
    assert len(left) == 4 and left["band"].isna().sum() == 1
    overlapping = pa.table(
        {"band": [0, 1], "lo": [0.0, 5.0], "hi": [10.0, 15.0]}
    )
    with pytest.raises(ValueError, match="disjoint"):
        range_join(large, overlapping, value_col="v")


def test_cc_dedup_keep_transitive():
    from alp_ray.pipelines.dedup import cc_dedup_keep

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(1, 7, dtype=np.int64),
                "text": [f"doc {i}" for i in range(1, 7)],
            }
        )
    )
    # Chain 1-3-2 (transitive cluster {1,2,3}) + pair {5,6}; 4 single.
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": np.array([1, 2, 5], np.int64),
                "id_b": np.array([3, 3, 6], np.int64),
            }
        )
    )
    kept, iters = cc_dedup_keep(docs, pairs)
    assert set(kept.to_pandas()["doc_id"]) == {3, 4, 6}
    assert iters >= 1
    # Empty pair set: all docs pass through.
    no_pairs = pairs.filter(expr="id_a > 100")
    kept2, iters2 = cc_dedup_keep(docs, no_pairs)
    assert kept2.count() == 6 and iters2 == 0


def test_simhash_batch_matches_naive():
    from alp_ray.pipelines.dedup import SimHashStage

    texts = [
        "the quick brown fox", "", "one", "the the the",
        "a b c d e f g", "the quick brown fox",
    ]
    st = SimHashStage()
    batch = st._batch_simhash(texts)
    for i, t in enumerate(texts):
        assert int(batch[i]) == st.simhash64(t), i


def test_ivf_one_pass_multi_query_and_store(emb, tmp_path):
    """The batched IVF serves all queries in ONE scan; all-bucket probe
    equals brute force; the hive-partitioned store path (partition-path
    pruning) returns identical results to the in-memory path."""
    from alp_ray.pipelines.ann import ivf_topk_from_store

    rows = emb.take(3)
    Q = np.array([r["embedding"] for r in rows], np.float64)
    path = str(tmp_path / "ivf_store")
    C, bucketed = build_ivf(emb, n_centroids=8, persist_path=path)
    bucketed = bucketed.materialize()
    full = ivf_topk(bucketed, C, Q, k=5, nprobe=8).to_pandas()
    brute = cosine_topk(emb, Q, k=5).to_pandas()
    assert full.round(9).equals(brute.round(9))
    mem4 = ivf_topk(bucketed, C, Q, k=5, nprobe=3).to_pandas()
    store4 = ivf_topk_from_store(path, C, Q, k=5, nprobe=3).to_pandas()
    assert mem4.round(9).equals(store4.round(9))


def test_keyed_running_ties_singletons_and_prefix_exactness():
    from alp_ray.stages.window import keyed_running

    # user 1: three events, two with TIED ts (order falls back to
    # event_id); user 2: a single event (gap = -1, seq = 1).
    tbl = pa.table({
        "event_id": pa.array([10, 11, 12, 20], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([100, 100, 250, 7], pa.timestamp("us")),
        "value": pa.array([1.25, 2.50, 0.30, 9.99], pa.float64()),
    })
    out = (
        keyed_running(ray.data.from_arrow(tbl), n_parts=3)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out["seq"].tolist() == [1, 2, 3, 1]
    assert out["running_cents"].tolist() == [125, 375, 405, 999]
    assert out["gap_us"].tolist() == [-1, 0, 150, -1]


def test_keyed_running_matches_pandas_across_partitions():
    from alp_ray.stages.window import keyed_running

    rng = np.random.RandomState(11)
    n = 500
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, 17, n), pa.int64()),
        "ts": pa.array(rng.randint(0, 10**7, n), pa.timestamp("us")),
        "value": pa.array(
            np.round(rng.uniform(0, 100, n), 2), pa.float64()
        ),
    })
    got = (
        keyed_running(ray.data.from_arrow(tbl), n_parts=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    df["cents"] = np.rint(df["value"] * 100).astype(np.int64)
    df["ts_us"] = df["ts"].astype(np.int64)
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    df["seq"] = df.groupby("user_id").cumcount() + 1
    df["running_cents"] = df.groupby("user_id")["cents"].cumsum()
    df["gap_us"] = (
        df.groupby("user_id")["ts_us"].diff().fillna(-1).astype(np.int64)
    )
    want = df.sort_values("event_id").reset_index(drop=True)
    for c in ("seq", "running_cents", "gap_us"):
        np.testing.assert_array_equal(
            got[c].to_numpy(), want[c].to_numpy(), err_msg=c
        )


def test_co_occurrence_counts_and_heavy_basket_guard():
    from alp_ray.stages.relational import co_occurrence

    # Groups: 10={1,2,3}, 11={2,3}, 12={2,3}(dup rows), 13=big (capped).
    g = [10, 10, 10, 11, 11, 12, 12, 12] + [13] * 6
    it = [1, 2, 3, 2, 3, 3, 2, 2] + list(range(100, 106))
    tbl = pa.table({
        "g": pa.array(g, pa.int64()),
        "i": pa.array(it, pa.int64()),
    })
    out = (
        co_occurrence(
            ray.data.from_arrow(tbl), group_col="g", item_col="i",
            min_count=1, max_group=4, n_parts=3,
        )
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    # Group 13 (6 items > max_group=4) contributes nothing.
    want = {(1, 2): 1, (1, 3): 1, (2, 3): 3}
    got = {
        (r.item_a, r.item_b): r.n_groups for r in out.itertuples()
    }
    assert got == want


def test_co_occurrence_min_count_threshold():
    from alp_ray.stages.relational import co_occurrence

    tbl = pa.table({
        "g": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "i": pa.array([7, 8, 7, 8, 7, 9], pa.int64()),
    })
    out = co_occurrence(
        ray.data.from_arrow(tbl), group_col="g", item_col="i",
        min_count=2, n_parts=2,
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].tolist() == [7, 8, 2]


def test_global_rank_total_order_with_ties():
    from alp_ray.stages.relational import global_rank

    rng = np.random.RandomState(5)
    n = 300
    vals = rng.randint(0, 20, n).astype(np.float64)  # heavy ties
    tbl = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(vals, pa.float64()),
    })
    got = (
        global_rank(
            ray.data.from_arrow(tbl).repartition(7), by="v", id_col="id"
        )
        .to_pandas()
        .sort_values("id")["rank"]
        .to_numpy()
    )
    want = np.lexsort((np.arange(n), vals))
    ranks = np.empty(n, np.int64)
    ranks[want] = np.arange(n)
    np.testing.assert_array_equal(got, ranks)


def test_semi_anti_join_partition_and_duplicates():
    from alp_ray.stages.relational import semi_anti_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 2], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "r": pa.array([2, 2, 4, 9], pa.int64()),
    }))
    semi = sorted(
        semi_anti_join(left, right, "k", "r", n_parts=3)
        .to_pandas()["k"].tolist()
    )
    anti = sorted(
        semi_anti_join(left, right, "k", "r", anti=True, n_parts=3)
        .to_pandas()["k"].tolist()
    )
    assert semi == [2, 2, 4]     # left duplicates preserved
    assert anti == [1, 3, 5]


def test_pivot_counts_conditional_sums():
    from alp_ray.stages.relational import pivot_counts

    tbl = pa.table({
        "u": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "t": pa.array(["a", "b", "a", "a", "c"], pa.string()),
        "v": pa.array([1.10, 2.00, 0.25, 0.25, 9.99], pa.float64()),
    })
    out = (
        pivot_counts(
            ray.data.from_arrow(tbl).repartition(3), key="u",
            pivot_col="t", categories=("a", "b"), value_col="v",
        )
        .to_pandas()
        .set_index("u")
        .sort_index()
    )
    assert out.loc[1, ["n_a", "n_b"]].tolist() == [1, 1]
    assert out.loc[1, ["cents_a", "cents_b"]].tolist() == [110, 200]
    assert out.loc[2, ["n_a", "n_b"]].tolist() == [2, 0]
    assert out.loc[2, ["cents_a", "cents_b"]].tolist() == [50, 0]
    # category "c" wasn't requested -> no column
    assert "n_c" not in out.columns


def test_grouped_median_odd_even():
    from alp_ray.stages.relational import grouped_median

    tbl = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array([3.0, 1.0, 2.0, 10.0, 20.0], pa.float64()),
    })
    out = (
        grouped_median(
            ray.data.from_arrow(tbl).repartition(2), key="k",
            value_col="v", n_parts=2,
        )
        .to_pandas()
        .set_index("k")["median"]
    )
    assert out.loc[1] == 2.0     # odd count -> middle
    assert out.loc[2] == 15.0    # even count -> mean of middles


def test_rollup_levels_and_exact_cents():
    from alp_ray.stages.relational import rollup_aggregate

    tbl = pa.table({
        "a": pa.array(["x", "x", "y"], pa.string()),
        "b": pa.array(["p", "q", "p"], pa.string()),
        "v": pa.array([1.00, 2.50, 4.00], pa.float64()),
    })
    out = rollup_aggregate(
        ray.data.from_arrow(tbl).repartition(2), keys=("a", "b"),
        value_col="v",
    ).to_pandas()
    rows = {
        (r.a, r.b, r.level): (r.n_rows, r.cents)
        for r in out.itertuples()
    }
    assert rows[("x", "p", 2)] == (1, 100)
    assert rows[("x", "q", 2)] == (1, 250)
    assert rows[("y", "p", 2)] == (1, 400)
    assert rows[("x", "", 1)] == (2, 350)
    assert rows[("y", "", 1)] == (1, 400)
    assert rows[("", "", 0)] == (3, 750)
    assert len(rows) == 6


def test_rolling_sum_window_clamp_at_segment_start():
    from alp_ray.stages.window import rolling_sum

    # One user, 6 events of 1.00 each: window=3 -> 100,200,300,300,...
    tbl = pa.table({
        "event_id": pa.array(np.arange(6), pa.int64()),
        "user_id": pa.array([1] * 6, pa.int64()),
        "ts": pa.array(np.arange(6) * 10, pa.timestamp("us")),
        "value": pa.array([1.0] * 6, pa.float64()),
    })
    out = (
        rolling_sum(ray.data.from_arrow(tbl), window=3, n_parts=2)
        .to_pandas()
        .sort_values("event_id")["window_cents"]
        .tolist()
    )
    assert out == [100, 200, 300, 300, 300, 300]


def test_zscore_outliers_flags_planted_spike():
    from alp_ray.stages.relational import zscore_outliers

    # User 1: 20 near-constant values + one spike; user 2: constant
    # (sigma = 0 -> emits nothing, exact integer predicate).
    vals = [10.00 + 0.01 * (i % 3) for i in range(20)] + [99.99]
    tbl = pa.table({
        "event_id": pa.array(np.arange(23), pa.int64()),
        "user_id": pa.array([1] * 21 + [2, 2], pa.int64()),
        "value": pa.array(vals + [5.0, 5.0], pa.float64()),
    })
    out = zscore_outliers(
        ray.data.from_arrow(tbl), key="user_id", value_col="value",
        id_col="event_id",
    ).to_pandas()
    assert out["event_id"].tolist() == [20]   # only the spike
    assert (out["z"] > 2).all()


def test_keyed_sequence_order_and_ties():
    from alp_ray.stages.window import keyed_sequence

    tbl = pa.table({
        "event_id": pa.array([3, 1, 2, 9], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([5, 5, 1, 0], pa.timestamp("us")),
        "event_type": pa.array(["c", "b", "a", "x"], pa.string()),
    })
    out = (
        keyed_sequence(ray.data.from_arrow(tbl), n_parts=2)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # ts order, event_id tiebreak: a(ts1), b(ts5,id1), c(ts5,id3).
    assert out.loc[1, "sequence"] == "a,b,c"
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, "sequence"] == "x"


def test_first_last_touch_tiebreaks():
    from alp_ray.stages.window import first_last_touch

    tbl = pa.table({
        "event_id": pa.array([5, 2, 9, 1], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 0, 7, 3], pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "c", "x"], pa.string()),
    })
    out = (
        first_last_touch(ray.data.from_arrow(tbl), n_parts=2)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # ts tie at 0 -> lower event_id (2, "b") is first.
    assert out.loc[1, ["first_id", "first_token"]].tolist() == [2, "b"]
    assert out.loc[1, ["last_id", "last_token"]].tolist() == [9, "c"]
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, ["first_id", "last_id"]].tolist() == [1, 1]


def test_grouped_mode_tiebreak_lexicographic():
    from alp_ray.stages.relational import grouped_mode

    tbl = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "t": pa.array(["b", "b", "a", "a", "z"], pa.string()),
    })
    out = (
        grouped_mode(
            ray.data.from_arrow(tbl).repartition(2), key="k",
            token_col="t", n_parts=2,
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    # 2-2 tie between "a" and "b" -> lexicographically smaller wins.
    assert out.loc[1].tolist() == ["a", 2]
    assert out.loc[2].tolist() == ["z", 1]


def test_cube_all_subsets():
    from alp_ray.stages.relational import cube_aggregate

    tbl = pa.table({
        "a": pa.array(["x", "y"], pa.string()),
        "b": pa.array(["p", "p"], pa.string()),
        "v": pa.array([1.00, 2.00], pa.float64()),
    })
    out = cube_aggregate(
        ray.data.from_arrow(tbl), keys=("a", "b"), value_col="v"
    ).to_pandas()
    rows = {
        (r.a, r.b, r.grouping_id): (r.n_rows, r.cents)
        for r in out.itertuples()
    }
    assert rows[("x", "p", 0)] == (1, 100)
    assert rows[("y", "p", 0)] == (1, 200)
    assert rows[("", "p", 1)] == (2, 300)     # a suppressed (bit 0)
    assert rows[("x", "", 2)] == (1, 100)     # b suppressed (bit 1)
    assert rows[("y", "", 2)] == (1, 200)
    assert rows[("", "", 3)] == (2, 300)
    assert len(rows) == 6


def test_grouped_distinct_count_cross_batch_dups():
    from alp_ray.stages.relational import grouped_distinct_count

    # Same (key, item) pair repeated across partitions must count once.
    tbl = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 1], pa.int64()),
        "i": pa.array([7, 7, 8, 9, 9, 7], pa.int64()),
    })
    out = (
        grouped_distinct_count(
            ray.data.from_arrow(tbl).repartition(3), key="k",
            item_col="i", n_parts=2,
        )
        .to_pandas()
        .set_index("k")["n_distinct"]
    )
    assert out.loc[1] == 2 and out.loc[2] == 1


def test_funnel_ordering_is_strict():
    from alp_ray.stages.window import funnel

    # u1: view(1) click(2) purchase(3) -> 3 stages.
    # u2: click(1) view(2) -> click BEFORE view doesn't count -> 1.
    # u3: purchase only -> no view -> excluded.
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([1, 2, 3, 1, 2, 5], pa.timestamp("us")),
        "event_type": pa.array(
            ["view", "click", "purchase", "click", "view", "purchase"],
            pa.string(),
        ),
    })
    out = (
        funnel(
            ray.data.from_arrow(tbl),
            stages=("view", "click", "purchase"), n_parts=2,
        )
        .to_pandas()
        .set_index("user_id")["stages_reached"]
        .sort_index()
    )
    assert out.to_dict() == {1: 3, 2: 1}


def test_cohort_retention_multi_cohort():
    from alp_ray.stages.window import cohort_retention

    P = 10  # period_s=10 -> period_us = 1e7
    us = 1_000_000
    # u1 first in period 0, returns periods 1 and 3 (two events in p1
    # count once). u2 first in period 1, returns period 2. u3 only p0.
    rows = [
        (1, 5), (1, 12), (1, 17), (1, 35),
        (2, 11), (2, 25),
        (3, 2),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [r[1] * us for r in rows], pa.timestamp("us")
        ),
    })
    out = cohort_retention(
        ray.data.from_arrow(tbl), period_s=P, max_k=4, n_parts=2
    ).to_pandas()
    got = {
        (r.cohort_period, r.k): r.n for r in out.itertuples()
    }
    assert got == {
        (0, 0): 2,   # cohort 0: u1, u3
        (1, 0): 1,   # cohort 1: u2
        (0, 1): 1,   # u1 returned in period 1 (once, despite 2 events)
        (0, 3): 1,   # u1 in period 3
        (1, 1): 1,   # u2 in period 2 = k 1
    }


def test_embedding_cosine_candidates_emitted_exactly_once():
    """The in-kernel multi-probe dedup (canonical co-bucket, derived
    from the two base sign-keys) must emit each candidate pair EXACTLY
    once — no duplicates (the old groupby dedup is gone) and no losses
    vs a brute-force replay of the bucket collisions."""
    import numpy as np
    import pandas as pd

    from alp_ray.pipelines.dedup import embedding_cosine_pairs

    rng = np.random.RandomState(3)
    n, d, planes = 300, 16, 12
    V = rng.randn(n, d)
    # Plant exact duplicates so real candidates exist.
    V[50] = V[10]
    V[51] = V[11] + 1e-6 * rng.randn(d)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(V)),
            }
        )
    ).repartition(7)
    pairs = embedding_cosine_pairs(
        ds, threshold=-1.1, planes=planes, seed=42
    ).to_pandas()
    # threshold=-1.1 keeps every candidate → output IS the candidate set.
    got = list(zip(pairs["id_a"], pairs["id_b"]))
    assert len(got) == len(set(got)), "duplicate candidate pair emitted"
    # Brute-force oracle: multi-probe bucket collisions.
    H = np.random.RandomState(42).randn(d, planes)
    signs = (V @ H) > 0
    base = np.packbits(signs, axis=1, bitorder="little").astype(np.int64)
    key = np.zeros(n, np.int64)
    for b in range(base.shape[1]):
        key |= base[:, b] << (8 * b)
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            x = int(key[i] ^ key[j])
            if bin(x).count("1") <= 2:
                # popcount<=2 over the low `planes` bits ⇒ the probe
                # sets intersect (0: same bucket; 1: base↔flip;
                # 2: flip↔flip).
                want.add((i, j))
    assert set(got) == want

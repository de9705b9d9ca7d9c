"""Training-data ops: dedup family, ANN, text stats, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from ligrust_ray.dataops import ann, dedup, multimodal, textstats


def docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",          # exact dup of 0
        "the quick brown fox jumped over the lazy dog today",   # near dup
        "completely different content about ray data engines",
        "another unrelated document mentioning arrow batches",
        "",                                                      # empty
        "the quick brown fox jumps over the lazy dog",          # exact dup of 0
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


@pytest.fixture()
def docs_ds(ray_session):
    return ray.data.from_arrow(docs_table())


def test_exact_dedup(docs_ds):
    got = sorted(dedup.exact_dedup(docs_ds).to_pandas()["doc_id"])
    # distinct texts: {0(=1=6), 2, 3, 4, 5} -> min ids
    assert got == [0, 2, 3, 4, 5]


def test_minhash_lsh_clusters_near_dups(docs_ds):
    pdf = dedup.minhash_lsh_dedup(docs_ds, num_perm=64, bands=32,
                                  threshold=0.3).to_pandas()
    cl = dict(zip(pdf["doc_id"], pdf["cluster"]))
    assert cl[0] == cl[1] == cl[6] == 0          # exact dups cluster
    assert cl[2] == 0                    # near dup joins (jaccard 4/11 > 0.3)
    assert cl[3] != cl[4]                        # unrelated stay apart
    # determinism
    pdf2 = dedup.minhash_lsh_dedup(docs_ds, num_perm=64, bands=32,
                                   threshold=0.3).to_pandas()
    assert pdf.equals(pdf2)


def test_minhash_distributed_path_matches_fast_path(docs_ds, monkeypatch):
    """Forcing the large-candidate-set path (bucketed Jaccard joins +
    dataset label propagation) must give the same clusters as the bounded
    single-task fast path."""
    fast = dedup.minhash_lsh_dedup(docs_ds, num_perm=64, bands=32,
                                   threshold=0.3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(dedup, "CAND_BROADCAST_MAX", 0)
    dist = dedup.minhash_lsh_dedup(docs_ds, num_perm=64, bands=32,
                                   threshold=0.3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert fast.equals(dist)
    # mid regime: broadcast pre-filter ON, single-task verify OFF
    monkeypatch.setattr(dedup, "CAND_BROADCAST_MAX", 2_000_000)
    monkeypatch.setattr(dedup, "SMALL_VERIFY_MAX", 0)
    mid = dedup.minhash_lsh_dedup(docs_ds, num_perm=64, bands=32,
                                  threshold=0.3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert fast.equals(mid)


def test_simhash_properties(docs_ds):
    pdf = dedup.simhash_dataset(docs_ds).to_pandas().set_index("doc_id")
    assert pdf.loc[0, "simhash"] == pdf.loc[1, "simhash"]
    h0 = int(pdf.loc[0, "simhash"])
    h2 = int(pdf.loc[2, "simhash"])
    ham = bin((h0 ^ h2) & ((1 << 64) - 1)).count("1")
    assert ham <= 16                              # near dup -> small hamming
    h3 = int(pdf.loc[3, "simhash"])
    assert bin((h0 ^ h3) & ((1 << 64) - 1)).count("1") > ham
    assert pdf.loc[5, "simhash"] == 0


def test_ngram_pairs(docs_ds):
    pdf = dedup.ngram_jaccard_pairs(docs_ds, threshold=0.3).to_pandas()
    pairs = set(zip(pdf["a"], pdf["b"]))
    assert (0, 1) in pairs and (0, 6) in pairs and (0, 2) in pairs


def _emb_ds(n=60, d=8, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d)).astype(np.float32)
    mat[1] = mat[0] * 2.0          # same direction as 0 -> cosine 1
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), type=pa.float32()), d),
    })), mat


def test_knn_bruteforce_exact(ray_session):
    ds, mat = _emb_ds()
    got = ann.knn_bruteforce(ds, query_ids=[0, 5], k=5).to_pandas()
    m = mat.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for q in (0, 5):
        sims = m @ m[q]
        exp = np.lexsort((np.arange(len(m)), -sims))[:5]
        sub = got[got["query_id"] == q].sort_values("rank")
        np.testing.assert_array_equal(sub["neighbor_id"].to_numpy(), exp)


def test_knn_ivf_recall(ray_session):
    ds, mat = _emb_ds(n=200, d=8, seed=4)
    exact = ann.knn_bruteforce(ds, query_ids=[0, 1, 2], k=10).to_pandas()
    approx = ann.knn_ivf(ds, query_ids=[0, 1, 2], k=10,
                         n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for q in (0, 1, 2):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6               # nprobe=4/8 buckets


def test_embedding_near_dup_pairs(ray_session):
    ds, _ = _emb_ds()
    pdf = ray.data.Dataset.to_pandas(
        dedup.embedding_near_dup(ds, threshold=0.999))
    assert (0, 1) in set(zip(pdf["a"], pdf["b"]))


def test_embedding_near_dup_ivf_recall(ray_session):
    ds, _ = _emb_ds()
    exact = set(map(tuple, dedup.embedding_near_dup(ds, threshold=0.9)
                    .to_pandas()[["a", "b"]].to_numpy()))
    approx = set(map(tuple, dedup.embedding_near_dup_ivf(
        ds, threshold=0.9, n_centroids=4, nprobe=2)
        .to_pandas()[["a", "b"]].to_numpy()))
    assert approx <= exact                    # no false pairs (exact cosine)
    if exact:
        assert len(approx & exact) / len(exact) >= 0.6


def test_ivf_auto_bucket_count_scales(ray_session):
    """n >> 16: auto mode must produce MORE than 16 buckets (the r2 fixed
    B=16 capped groupby parallelism at 16 tasks forever) and the bucketed
    layout must actually use >16 distinct buckets."""
    from ligrust_ray.dataops.ann import auto_centroids

    n = 2000
    assert auto_centroids(n) > 16
    ds, _ = _emb_ds(n=n, d=8, seed=11)
    bucketed, n_buckets = dedup.ivf_bucketize(ds, n_centroids=None, nprobe=2)
    assert n_buckets > 16
    used = bucketed.to_pandas()["bucket"].nunique()
    assert used > 16


def test_ivf_two_level_recall(ray_session):
    """B above the two-level threshold (coarse x fine index) must still
    find near-dups: only exact-cosine pairs, decent recall."""
    ds, _ = _emb_ds(n=500, d=8, seed=12)
    exact = set(map(tuple, dedup.embedding_near_dup(ds, threshold=0.9)
                    .to_pandas()[["a", "b"]].to_numpy()))
    approx = set(map(tuple, dedup.embedding_near_dup_ivf(
        ds, threshold=0.9, n_centroids=100, nprobe=4)
        .to_pandas()[["a", "b"]].to_numpy()))
    assert approx <= exact
    if exact:
        assert len(approx & exact) / len(exact) >= 0.5


def test_ivf_pair_chunking_matches_unchunked(ray_session, monkeypatch):
    """The tiled in-bucket matmul (memory bounding for skewed buckets) must
    emit exactly the pairs the one-shot matmul emits — including pairs
    whose two rows land in different tiles in either id order."""
    ds, _ = _emb_ds(n=120, d=4, seed=13)
    full = set(map(tuple, dedup.embedding_near_dup_ivf(
        ds, threshold=0.8, n_centroids=4, nprobe=2)
        .to_pandas()[["a", "b"]].to_numpy()))
    monkeypatch.setattr(dedup, "IVF_PAIR_CHUNK", 17)
    tiled = set(map(tuple, dedup.embedding_near_dup_ivf(
        ds, threshold=0.8, n_centroids=4, nprobe=2)
        .to_pandas()[["a", "b"]].to_numpy()))
    assert tiled == full


def test_token_count_bpe(docs_ds):
    pdf = docs_ds.map_batches(textstats.token_count_bpe_batch,
                              batch_format="pyarrow").to_pandas() \
        .set_index("doc_id")
    # "the quick brown fox jumps over the lazy dog" -> 9 letter runs
    assert pdf.loc[0, "n_tokens_bpe"] == 9
    assert pdf.loc[5, "n_tokens_bpe"] == 0    # empty text


def test_textstats_and_fingerprint(docs_ds):
    tc = docs_ds.map_batches(textstats.token_count_batch,
                             batch_format="pyarrow").to_pandas()
    assert tc.set_index("doc_id").loc[0, "n_tokens"] == 9
    assert tc.set_index("doc_id").loc[5, "n_tokens"] == 1  # duckdb semantics
    fp = docs_ds.map_batches(textstats.fingerprint_batch,
                             batch_format="pyarrow").to_pandas()
    f = fp.set_index("doc_id")["fingerprint"]
    assert f[0] == f[1] and f[0] != f[3]
    q = docs_ds.map_batches(textstats.QualityScore, batch_format="pyarrow",
                            concurrency=1).to_pandas()
    assert (q["quality_1e6"] >= 0).all() and (q["quality_1e6"] <= 10**6).all()


def test_langid_charset_rule(ray_session):
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["the cat and the dog in a house",
                                    "这是一个中文文档 关于图计算 的测试文本"])})
    pdf = ray.data.from_arrow(t).map_batches(
        textstats.LangId, batch_format="pyarrow", concurrency=1).to_pandas()
    got = dict(zip(pdf["doc_id"], pdf["pred_lang"]))
    assert got[0] == "en" and got[1] == "zh"


def test_multimodal_plumbing(docs_ds):
    media = multimodal.docs_as_media(docs_ds)
    out = multimodal.decode_features(media, feature_dim=8).to_pandas()
    assert set(out.columns) == {"media_id", "width", "height", "features"}
    assert len(out) == 7
    assert all(len(f) == 8 for f in out["features"])
    # deterministic fake decode
    out2 = multimodal.decode_features(
        multimodal.docs_as_media(docs_ds), feature_dim=8).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert (a["width"] == b["width"]).all()
    # the stub raises exactly where a real codec would plug in
    stage = multimodal.DecodeStage(real=True)
    with pytest.raises(NotImplementedError):
        stage(pa.table({"media_id": pa.array([1], type=pa.int64()),
                        "payload": pa.array([b"x"], type=pa.binary())}))


def test_media_resize_and_frames(ray_session, docs_ds):
    from ligrust_ray.dataops import multimodal

    media = multimodal.docs_as_media(docs_ds)
    rs = multimodal.resize_media(media, 128, 96).to_pandas()
    assert (rs["width"] == 128).all() and (rs["height"] == 96).all()
    assert rs["payload"].map(len).nunique() == 1       # fixed-size fake
    # deterministic across runs
    rs2 = multimodal.resize_media(
        multimodal.docs_as_media(docs_ds), 128, 96).to_pandas()
    assert rs.sort_values("media_id")["payload"].tolist() == \
        rs2.sort_values("media_id")["payload"].tolist()

    fr = multimodal.sample_frames(media, n_frames=3).to_pandas()
    n_docs = docs_ds.count()
    assert len(fr) == 3 * n_docs
    assert set(fr["frame_idx"].unique()) == {0, 1, 2}
    # real=True is a clearly-marked stub at the decode point
    import pytest as _pytest

    stage = multimodal.ResizeStage(64, 64, real=True)
    with _pytest.raises(NotImplementedError, match="real resize"):
        stage(media.take_batch(2, batch_format="pyarrow"))


def test_relational_queries_vs_duckdb(ray_session):
    """lineitem_pricing / orders_by_segment / docs_lang_hist vs DuckDB on
    sf0.001 — the in-repo mirror of the driver's oracle compare."""
    import duckdb

    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = (Q.q_lineitem_pricing(sf).to_pandas()
           .sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    exp = duckdb.sql(
        f"""SELECT l_returnflag, l_linestatus,
            SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty,
            SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS sum_price_cents,
            COUNT(*) AS n_rows FROM '{sf}/lineitem.parquet'
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1,2 ORDER BY 1,2""").df()
    assert len(got) == len(exp)
    for c in ("sum_qty", "sum_price_cents", "n_rows"):
        np.testing.assert_array_equal(got[c].to_numpy(dtype=np.int64),
                                      exp[c].to_numpy(dtype=np.int64))

    g2 = (Q.q_orders_by_segment(sf).to_pandas()
          .sort_values("mktsegment").reset_index(drop=True))
    e2 = duckdb.sql(
        f"""SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
            SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS revenue_cents
            FROM '{sf}/orders.parquet' o
            JOIN '{sf}/customer.parquet' c ON o.o_custkey=c.c_custkey
            GROUP BY 1 ORDER BY 1""").df()
    np.testing.assert_array_equal(
        g2["revenue_cents"].to_numpy(dtype=np.int64),
        e2["revenue_cents"].to_numpy(dtype=np.int64))
    np.testing.assert_array_equal(g2["n_orders"].to_numpy(dtype=np.int64),
                                  e2["n_orders"].to_numpy(dtype=np.int64))

    g3 = Q.q_docs_lang_hist(sf).to_pandas()
    e3 = duckdb.sql(f"SELECT lang, COUNT(*) n FROM '{sf}/documents.parquet' "
                    "GROUP BY 1").df()
    assert g3["n_docs"].sum() == e3["n"].sum()
    assert set(g3["lang"]) == set(e3["lang"])


def test_sessionize_and_windows(ray_session):
    from ligrust_ray.dataops import windows

    us = 1_000_000
    t = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "ts": pa.array(
            np.array([0, 10 * 60, 50 * 60,            # user 1: gap 40min
                      0, 29 * 60, 60 * 60], dtype=np.int64) * us
        ).cast(pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, 2], type=pa.int64()),
    })
    out = windows.sessionize(ray.data.from_arrow(t)).to_pandas() \
        .set_index("user_id").sort_index()
    assert out.loc[1, "n_sessions"] == 2 and out.loc[1, "n_events"] == 3
    # user 2: 29min gap (same session), then 31min gap (new session)
    assert out.loc[2, "n_sessions"] == 2

    t2 = pa.table({
        "ts": pa.array(np.array([0, 1800, 3600, 7200], dtype=np.int64)
                       * us).cast(pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
    })
    w = windows.tumbling_window_counts(ray.data.from_arrow(t2)).to_pandas()
    w = w.set_index("window_start_us").sort_index()
    assert w.loc[0, "n_events"] == 2 and w.loc[0, "sum_value_cents"] == 300
    assert w.loc[3600 * us, "n_events"] == 1
    assert w.loc[7200 * us, "sum_value_cents"] == 400


def test_minhash_rep_collapse_matches_classic(ray_session):
    """The exact-dup rep-collapse path must produce IDENTICAL clusters to
    the classic whole-corpus pipeline on a corpus mixing exact replicas,
    near-dups and singletons (replica families attach through their rep)."""
    base = ["the quick brown fox jumps over the lazy dog again and again",
            "pack my box with five dozen liquor jugs before noon today ok",
            "completely unrelated text about distributed graph processing"]
    texts, ids = [], []
    nid = 0
    for b in base:
        for r in range(6):                      # 6 exact replicas each
            texts.append(b)
            ids.append(nid)
            nid += 1
        texts.append(b + " extra")              # one near-dup per family
        ids.append(nid)
        nid += 1
    texts.append("a lone singleton document with no relatives anywhere")
    ids.append(nid)
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    ds = ray.data.from_arrow(t)
    classic = dedup._minhash_lsh_core(ds, threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    collapsed = dedup.minhash_lsh_dedup(ds, threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(classic, collapsed)
    # sanity: the rep path actually engaged (dup ratio ~78%)
    assert len(set(collapsed["cluster"])) < len(collapsed)


def test_minhash_rep_collapse_empty_texts(ray_session):
    """Byte-identical EMPTY/whitespace docs must each stay their own
    cluster on the rep path too — zero-shingle docs never verify (Jaccard
    union 0), and the classic path / SQL oracle leave them alone."""
    t = pa.table({"doc_id": pa.array(range(6), type=pa.int64()),
                  "text": pa.array(["", "", "   ",
                                    "real text here one", "real text here one",
                                    "other doc entirely"], type=pa.string())})
    ds = ray.data.from_arrow(t)
    classic = dedup._minhash_lsh_core(ds, threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    collapsed = dedup.minhash_lsh_dedup(ds, threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(classic, collapsed)
    cl = dict(zip(collapsed["doc_id"], collapsed["cluster"]))
    assert cl[0] == 0 and cl[1] == 1 and cl[2] == 2   # empties untouched
    assert cl[3] == cl[4] == 3                        # real dups cluster


def test_hll_estimate_accuracy(ray_session):
    """HLL estimate within ~3x the theoretical 1.04/sqrt(m) rel. error of
    the exact distinct count, across cardinalities spanning the
    linear-counting and harmonic-mean regimes."""
    from ligrust_ray.dataops import sketch

    rng = np.random.default_rng(5)
    for true_n in (50, 1000, 20000):
        vals = rng.integers(0, 10**12, size=true_n * 3) % (10**9)
        vals = np.unique(vals)[:true_n]          # exactly true_n distinct
        t = pa.table({"v": pa.array(np.repeat(vals, 2).astype(np.int64)),
                      "g": pa.array(["x"] * (2 * len(vals)),
                                    type=pa.string())})
        regs = sketch.hll_registers(ray.data.from_arrow(t), "v", "g") \
            .to_pandas()
        est = sketch.hll_estimate(regs, "g")["estimate"].iloc[0]
        rel = abs(est - len(vals)) / len(vals)
        assert rel < 3 * 1.04 / np.sqrt(1 << sketch.HLL_P), \
            f"n={true_n}: est {est:.0f} rel {rel:.3f}"


def test_hll_registers_merge(ray_session):
    """Sketching two halves separately and max-merging the registers must
    equal sketching the whole (the mergeable-sketch property that makes
    the operator shuffle-safe)."""
    from ligrust_ray.dataops import sketch

    rng = np.random.default_rng(6)
    vals = rng.integers(0, 10**9, size=5000).astype(np.int64)
    g = pa.array(["a"] * len(vals), type=pa.string())

    def regs_of(v):
        t = pa.table({"v": pa.array(v), "g": g.slice(0, len(v))})
        return sketch.hll_registers(ray.data.from_arrow(t), "v", "g") \
            .to_pandas()

    whole = regs_of(vals).set_index("reg")["rho"].sort_index()
    h1, h2 = regs_of(vals[:2500]), regs_of(vals[2500:])
    merged = pd.concat([h1, h2]).groupby("reg")["rho"].max().sort_index()
    pd.testing.assert_series_equal(whole, merged, check_names=False)


def test_decontaminate_planted(ray_session):
    """A train doc sharing an 8-gram with an eval doc is flagged; disjoint
    docs and eval docs themselves are not."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),  # 0 = eval (mod 10)
        "text": pa.array([
            base,                                   # eval doc
            "prefix words " + base,                 # shares 8-grams -> flagged
            "totally disjoint text with other words here now",  # clean
            "alpha bravo charlie",                  # <8 tokens, no full match
        ], type=pa.string()),
    })
    out = dedup.decontaminate(ray.data.from_arrow(t), eval_mod=10,
                              shingle_k=8).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1]


def test_hash_mod_sample_deterministic(ray_session):
    t = pa.table({"doc_id": pa.array(range(1000), type=pa.int64()),
                  "text": pa.array([""] * 1000, type=pa.string())})
    a = textstats.hash_mod_sample_batch(t)["doc_id"].to_pylist()
    b = textstats.hash_mod_sample_batch(t)["doc_id"].to_pylist()
    assert a == b and 0 < len(a) < 1000          # reproducible, non-trivial


def test_repetition_stats(ray_session):
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["a\nb\na\na", "x"], type=pa.string())})
    r = textstats.repetition_stats_batch(t).to_pandas().set_index("doc_id")
    assert r.loc[0, "n_lines"] == 4 and r.loc[0, "n_dup_lines"] == 2
    assert r.loc[1, "n_lines"] == 1 and r.loc[1, "n_dup_lines"] == 0


def test_sessionize_salted_matches_single_pass(ray_session):
    """The two-phase salted plan (one hot key spanning MANY time slabs —
    i.e. far more than one partition's worth under (key, slab) hashing)
    must reproduce the single-pass counts exactly, including sessions that
    straddle slab boundaries in both directions (gap <= and > gap_us)."""
    from ligrust_ray.dataops import windows

    us = 1_000_000
    rng = np.random.default_rng(8)
    # one pathological user with 5000 events across ~140 hours plus a few
    # normal users; gaps straddle the 30-min session threshold both ways
    gaps = rng.choice([60, 20 * 60, 29 * 60, 31 * 60, 3 * 3600],
                      size=5000, p=[0.5, 0.25, 0.1, 0.1, 0.05])
    hot_ts = np.cumsum(gaps).astype(np.int64) * us
    cold_ts = (np.arange(50, dtype=np.int64) * 45 * 60) * us
    ts = np.concatenate([hot_ts, cold_ts, cold_ts + 7 * us])
    uid = np.concatenate([np.full(5000, 7), np.full(50, 1), np.full(50, 2)])
    t = pa.table({
        "event_id": pa.array(range(len(ts)), type=pa.int64()),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(uid.astype(np.int64)),
    })
    plain = windows.sessionize(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    # 1-hour slabs -> the hot user spans ~140 slabs
    salted = windows.sessionize(ray.data.from_arrow(t),
                                salt_slab_us=3_600_000_000).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted)


def test_asof_salted_matches_single_pass(ray_session):
    """Two-phase salted as-of join (within-slab sweep + per-user carry
    prefix + (user, slab)-bucketed attach) must equal the single-pass
    sweep, including strict precedence at equal timestamps and events whose
    nearest click sits many slabs back."""
    from ligrust_ray.dataops import windows

    us = 1_000_000
    rng = np.random.default_rng(9)
    n = 4000
    ts = np.sort(rng.integers(0, 200 * 3600, size=n)).astype(np.int64) * us
    ts[100] = ts[101]              # equal-ts pair (event_id breaks the tie)
    uid = np.concatenate([np.full(n - 60, 7),
                          rng.integers(1, 4, size=60)]).astype(np.int64)
    et = np.where(rng.random(n) < 0.1, "click", "view")
    t = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(et.tolist(), type=pa.string()),
    })
    plain = windows.asof_last_match(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    salted = windows.asof_last_match(
        ray.data.from_arrow(t), salt_slab_us=3_600_000_000).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted)


def test_embedding_near_dup_multiblock(ray_session):
    """Block-pair decomposition: a multi-block layout must yield exactly
    the single-block pair set (exercises the cross-block canonicalise
    path, which single-block datasets never hit)."""
    ds, _ = _emb_ds(n=90, d=8, seed=6)
    one = set(map(tuple, dedup.embedding_near_dup(ds, threshold=0.8)
                  .to_pandas()[["a", "b"]].to_numpy()))
    many = set(map(tuple, dedup.embedding_near_dup(
        ds.repartition(5), threshold=0.8)
        .to_pandas()[["a", "b"]].to_numpy()))
    assert one == many and len(one) > 0


def test_pair_components_deep_chain(ray_session):
    """A 50-link chain component must converge within 16 rounds (pointer
    jumping is O(log diameter); plain propagation would need 50 rounds)
    and label every member with the minimum id."""
    n = 50
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array(np.arange(n - 1, dtype=np.int64) + 1000),
        "b": pa.array(np.arange(1, n, dtype=np.int64) + 1000),
    }))
    labels = dedup._pair_components(pairs, max_rounds=16).to_pandas()
    assert len(labels) == n
    assert (labels["label"].to_numpy() == 1000).all()


def test_ivf_grouped_apply_path_matches_per_group(ray_session):
    """Above IVF_GROUP_DISPATCH_MAX buckets the pair stage switches from
    per-bucket map_groups tasks to grouped_apply (buckets looped inside
    hash partitions); both dispatch plans must emit the identical pair
    set. group_dispatch_max=0 forces the partitioned path."""
    ds, _ = _emb_ds(n=400, d=8, seed=14)
    per_group = set(map(tuple, dedup.embedding_near_dup_ivf(
        ds, threshold=0.85, n_centroids=12, nprobe=2)
        .to_pandas()[["a", "b"]].to_numpy()))
    partitioned = set(map(tuple, dedup.embedding_near_dup_ivf(
        ds, threshold=0.85, n_centroids=12, nprobe=2,
        group_dispatch_max=0)
        .to_pandas()[["a", "b"]].to_numpy()))
    assert partitioned == per_group and len(per_group) > 0



def test_pii_scrub_planted(ray_session):
    """Planted PII: known emails/IPs/phones must be counted and redacted;
    the same batch is cross-checked against the DuckDB rendering of the
    oracle (both engines run RE2, so outputs must be identical)."""
    import duckdb

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "mail bob.smith+x@corp.example.org or admin@sub.dom.io now",
            "server 10.0.0.1 and 192.168.255.3; port 8080",
            "call +1 555-123-4567 or 0123456789",
            "in 1984. 2000 people came",         # NOT a phone (see pattern)
            "plain text, no pii at all"])})
    got = textstats.pii_scrub_batch(docs).to_pandas()
    assert got["n_email"].tolist() == [2, 0, 0, 0, 0]
    assert got["n_ip"].tolist() == [0, 2, 0, 0, 0]
    assert got["n_phone"].tolist() == [0, 0, 2, 0, 0]
    assert got["text_clean"][0] == "mail <EMAIL> or <EMAIL> now"
    assert got["text_clean"][1] == "server <IP> and <IP>; port 8080"
    assert got["text_clean"][2] == "call <PHONE> or <PHONE>"
    assert got["text_clean"][3] == "in 1984. 2000 people came"
    # DuckDB cross-check with the contract oracle SQL (documents view)
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(E._pii_sql()).fetchdf().sort_values("doc_id")
    for c in ("text_clean", "n_email", "n_ip", "n_phone"):
        assert exp[c].tolist() == got[c].tolist(), c


def test_line_dedup_planted(ray_session):
    """Planted boilerplate: a cookie-banner line shared by 3 docs must be
    removed everywhere (min_count=3), a line shared by 2 kept; order and
    blank lines preserved; an all-boilerplate doc collapses to ''. The
    same table is cross-checked against the oracle SQL in-process."""
    import duckdb
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    banner = "We use cookies to improve your experience."
    pair = "Subscribe to our newsletter!"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            f"{banner}\nUnique article zero.\n\nThe end.",
            f"Intro one.\n{banner}\n{pair}",
            f"{pair}\nBody two.\n{banner}",
            banner,                                   # all-boilerplate
            "Entirely unique text four."])})
    ds = ray.data.from_arrow(docs)
    got = (dedup.line_dedup(ds, min_count=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["text_clean"].tolist() == [
        "Unique article zero.\n\nThe end.",
        f"Intro one.\n{pair}",
        f"{pair}\nBody two.",
        "",
        "Entirely unique text four."]
    assert got["n_removed"].tolist() == [1, 1, 1, 1, 0]
    con = duckdb.connect()
    con.register("documents", docs)
    exp = (con.execute(E._line_dedup_sql(3)).fetchdf()
           .sort_values("doc_id").reset_index(drop=True))
    for c in ("text_clean", "n_removed"):
        assert exp[c].tolist() == got[c].tolist(), c


def test_hopping_windows_planted(ray_session):
    """Each event must appear in exactly window/hop = 4 overlapping
    windows, and the hop-aligned window covering a tumbling hour must
    equal that hour's tumbling aggregate."""
    ts = np.array(["2026-01-01T10:07:00", "2026-01-01T10:20:00",
                   "2026-01-01T11:59:59"], dtype="datetime64[us]")
    t = pa.table({"ts": pa.array(ts), "value": pa.array([1.0, 2.0, 4.0])})
    from ligrust_ray.dataops import windows

    w = windows.hopping_window_counts(ray.data.from_arrow(t)).to_pandas()
    assert int(w["n_events"].sum()) == 3 * 4       # 4 windows per event
    hour = int(ts[0].astype(np.int64) // 3_600_000_000 * 3_600_000_000)
    row = w[w["window_start_us"] == hour]
    assert row["n_events"].tolist() == [2]         # the 10:00 hour
    assert row["sum_value_cents"].tolist() == [300]


def test_docs_tfidf_vs_duckdb(ray_session):
    """K=3 distinctive-terms (integer TF-IDF shape) vs DuckDB on sf0.001:
    full-row equality after canonical sort, plus the planted invariant
    that every doc contributes at most K rows."""
    import duckdb

    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = (Q.q_docs_tfidf(sf).to_pandas()
           .sort_values(["doc_id", "tf", "df", "token"],
                        ascending=[True, False, True, True])
           .reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH toks AS (SELECT doc_id,
            UNNEST(regexp_extract_all(lower(text), '\\S+')) AS token
            FROM '{sf}/documents.parquet'),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
            GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        ranked AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
            ROW_NUMBER() OVER (PARTITION BY tf.doc_id
            ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rn
            FROM tf JOIN df USING (token))
        SELECT doc_id, token, tf, df FROM ranked WHERE rn <= 3
        ORDER BY doc_id, tf DESC, df ASC, token ASC""").df()
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["doc_id"].to_numpy(dtype=np.int64),
                                  exp["doc_id"].to_numpy(dtype=np.int64))
    assert got["token"].tolist() == exp["token"].tolist()
    np.testing.assert_array_equal(got["tf"].to_numpy(dtype=np.int64),
                                  exp["tf"].to_numpy(dtype=np.int64))
    np.testing.assert_array_equal(got["df"].to_numpy(dtype=np.int64),
                                  exp["df"].to_numpy(dtype=np.int64))
    assert got.groupby("doc_id").size().max() <= Q.TFIDF_K


def test_graph_dataset_ops_vs_duckdb(ray_session):
    """events_graph_stats / events_lcc / events_common_neighbors vs their
    contract SQL on sf0.001 — in-repo mirror of the driver compare."""
    import duckdb

    import __ray_entry__ as E
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    sqls = E.oracle_sql()
    for name, fn in [("events_graph_stats", Q.q_events_graph_stats),
                     ("events_lcc", Q.q_events_lcc),
                     ("events_assortativity", Q.q_events_assortativity),
                     ("events_component_sizes",
                      Q.q_events_component_sizes),
                     ("events_community_stats",
                      Q.q_events_community_stats),
                     ("events_common_neighbors",
                      Q.q_events_common_neighbors)]:
        got = fn(sf)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        exp = con.execute(sqls[name]).df()
        cols = sorted(exp.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        exp = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(got) == len(exp), name
        for c in cols:
            np.testing.assert_array_equal(
                got[c].to_numpy(dtype=np.int64),
                exp[c].to_numpy(dtype=np.int64), err_msg=f"{name}.{c}")


def test_simhash_dup_pairs_matches_bruteforce(ray_session):
    """Banding recall is lossless for hamming <= 3 (pigeonhole): the
    grouped pair op must equal brute-force popcount over all nonzero-sig
    pairs — planted exact dups (hamming 0), one-token swaps (small
    hamming), empties excluded."""
    import ray.data

    from ligrust_ray.dataops import dedup

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the quiet hills before dawn")
    texts = [base, base,                                   # exact dup
             base.replace("quick", "swift"),               # near dup
             base.replace("dog", "cat").replace("far", "near"),
             "completely different content about graph engines and ray",
             "", "   ",                                    # empty -> sig 0
             "unrelated short doc"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts)}))
    got = (dedup.simhash_dup_pairs(docs).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    sig = dedup.simhash_dataset(docs).to_pandas()
    sig = sig[sig["simhash"] != 0].sort_values("doc_id")
    ids = sig["doc_id"].to_numpy()
    v = sig["simhash"].to_numpy().astype(np.int64)
    i, j = np.triu_indices(len(ids), 1)
    h = dedup._popcount64(v[i] ^ v[j])
    ok = h <= dedup.SIMHASH_MAX_HAMMING
    exp = (pd.DataFrame({"a": ids[i[ok]], "b": ids[j[ok]],
                         "hamming": h[ok]})
           .sort_values(["a", "b"]).reset_index(drop=True))
    assert len(exp) >= 1                  # the exact dup at minimum
    pd.testing.assert_frame_equal(
        got.astype(np.int64), exp.astype(np.int64))

    # clusters = min-id connected components of those pairs; unpaired
    # docs (incl. the sig==0 empties) self-cluster
    cl = (dedup.simhash_clusters(docs).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    lab = {int(d): int(d) for d in range(len(texts))}

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for a, b in zip(exp["a"], exp["b"]):
        ra, rb = find(int(a)), find(int(b))
        lab[max(ra, rb)] = min(ra, rb)
    want = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "cluster": np.array([find(d) for d in
                                              range(len(texts))],
                                             dtype=np.int64)})
    assert want["cluster"].lt(want["doc_id"]).any()   # a real merge
    pd.testing.assert_frame_equal(cl.astype(np.int64), want)

    # the distributed label-propagation path must agree with the
    # single-task union-find fast path
    import unittest.mock as mock
    with mock.patch.object(dedup, "CAND_BROADCAST_MAX", -1):
        cl2 = (dedup.simhash_clusters(docs).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(cl2.astype(np.int64), want)


def test_events_props_agg_adversarial_json(ray_session, tmp_path):
    """JSON-extraction semantics pinned against DuckDB on adversarial
    props: malformed JSON, floats, bools, strings, missing k, negatives —
    the engine's parse-and-skip must equal the SQL's json_valid +
    json_type('BIGINT'/'UBIGINT') guard."""
    import duckdb

    import __ray_entry__ as E
    from ligrust_ray.pipelines import queries as Q

    props = ['{"k": 87}', '{"k": 0}', '{"k": -5}', '{"k": 1.5}',
             '{"k": true}', '{"k": "9"}', '{"j": 3}', 'not json', '',
             '{"k": null}', '[1, 2]', '{"k": 9007199254740993}']
    t = pa.table({
        "event_type": pa.array([f"t{i % 3}" for i in range(len(props))]),
        "props": pa.array(props, type=pa.string())})
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/events.parquet")

    got = Q.q_events_props_agg(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = con.execute(E.oracle_sql()["events_props_agg"]).df()
    cols = sorted(exp.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ("n", "k_sum", "k_max"):
        np.testing.assert_array_equal(got[c].to_numpy(dtype=np.int64),
                                      exp[c].to_numpy(dtype=np.int64), c)
    assert got["event_type"].tolist() == exp["event_type"].tolist()


# ---------------------------------------------------------------- packing


def test_pack_assign_matches_prefix_sum(ray_session):
    """Multi-bucket, multi-partition pack assignment equals the sequential
    exclusive-prefix-sum oracle (bucket=8 forces many scan buckets and
    sparse doc_ids cross bucket boundaries)."""
    from ligrust_ray.dataops.pack import pack_assign

    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(10_000, size=400, replace=False))
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(0, 40, 400)]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string())})).repartition(7)

    got = (pack_assign(docs, pack_tokens=64, bucket=8, num_partitions=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # sequential oracle: DuckDB token semantics (empty -> 1 token)
    nt = np.array([max(len(t.split()), 1) for t in texts], dtype=np.int64)
    prev = np.cumsum(nt) - nt
    exp = pd.DataFrame({"doc_id": doc_ids.astype(np.int64), "n_tokens": nt,
                        "pack_id": prev // 64})
    pd.testing.assert_frame_equal(got, exp)


def test_pack_assign_empty(ray_session):
    from ligrust_ray.dataops.pack import pack_assign

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    assert pack_assign(docs).count() == 0


# ---------------------------------------------------- stratified sample


def test_stratified_sample_quota_and_determinism(ray_session, tmp_path):
    from ligrust_ray.pipelines import queries as Q

    rng = np.random.default_rng(3)
    langs = rng.choice(["en", "de", "fr"], size=300,
                       p=[0.7, 0.2, 0.1]).tolist() + ["zz"] * 3
    n = len(langs)
    tab = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["x"] * n, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(["s"] * n, type=pa.string()),
        "n_chars": pa.array([1] * n, type=pa.int64())})
    pq.write_table(tab, tmp_path / "documents.parquet")

    a = (Q.q_docs_stratified_sample(str(tmp_path)).to_pandas()
         .sort_values(["lang", "doc_id"]).reset_index(drop=True))
    b = (Q.q_docs_stratified_sample(str(tmp_path)).to_pandas()
         .sort_values(["lang", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)

    counts = a.groupby("lang").size()
    from collections import Counter
    pop = Counter(langs)
    for lang, c in counts.items():
        assert c == min(Q.STRAT_K, pop[lang])
    assert set(counts.index) == set(pop)     # every language represented

    # brute-force oracle for one language
    from ligrust_ray.dataops.hashing import md5_u64_lower
    ids_fr = [i for i, l in enumerate(langs) if l == "fr"]
    keyed = sorted(ids_fr, key=lambda i: (md5_u64_lower(str(i).encode()), i))
    assert sorted(a[a["lang"] == "fr"]["doc_id"]) == \
        sorted(keyed[:Q.STRAT_K])


# ------------------------------------------------------------ rich club


def test_rich_club_matches_bruteforce(ray_session, tmp_path):
    """events_rich_club == brute-force phi(k) curve over the same simple
    undirected graph: for each k, induced subgraph on nodes of degree > k
    has N_k nodes / E_k edges; phi_ppm = (2*E_k*1e6)//(N_k*(N_k-1));
    rows with N_k < 2 dropped."""
    from ligrust_ray.pipelines import queries as Q

    rng = np.random.default_rng(23)
    n_ev = 700
    tab = pa.table({
        "event_id": pa.array(range(n_ev), type=pa.int64()),
        "ts": pa.array([0] * n_ev, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 50, n_ev), type=pa.int64()),
        "event_type": pa.array(["t"] * n_ev, type=pa.string()),
        "value": pa.array(rng.uniform(0, 10, n_ev), type=pa.float64()),
        "props": pa.array(["{}"] * n_ev, type=pa.string())})
    pq.write_table(tab, tmp_path / "events.parquet")

    got = (Q.q_events_rich_club(str(tmp_path)).to_pandas()
           .sort_values("k").reset_index(drop=True).astype(np.int64))

    uid = tab.column("user_id").to_numpy()
    val = tab.column("value").to_numpy()
    dst = (np.floor(val * 100).astype(np.int64)) % 150
    und = {(min(int(s), int(d)), max(int(s), int(d)))
           for s, d in zip(uid, dst) if s != d}
    from collections import Counter
    deg = Counter()
    for a_, b_ in und:
        deg[a_] += 1
        deg[b_] += 1
    rows = []
    for k in range(max(deg.values())):
        keep = {v for v, d in deg.items() if d > k}
        if len(keep) < 2:
            continue
        e_k = sum(1 for a_, b_ in und if a_ in keep and b_ in keep)
        rows.append((k, len(keep), e_k,
                     (2 * e_k * 1_000_000) // (len(keep) * (len(keep) - 1))))
    exp = pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges", "phi_ppm"]
                       ).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
    # the curve exists for every threshold below max degree with >=2 nodes
    assert (got["n_nodes"].to_numpy()[:-1] >= got["n_nodes"].to_numpy()[1:]
            ).all()


# ----------------------------------------------------------- butterflies


def test_butterflies_matches_bruteforce(ray_session, tmp_path):
    """events_butterflies == brute-force bipartite 2x2-biclique count;
    a planted complete 2x3 biclique contributes C(3,2)=3 wedge pairs
    each with c=2 -> 3 butterflies."""
    from itertools import combinations

    from ligrust_ray.pipelines import queries as Q

    # planted: users 100, 101 both like items 5, 6, 7 (a K_{2,3});
    # plus noise edges
    edges = [(100, 5), (100, 6), (100, 7),
             (101, 5), (101, 6), (101, 7),
             (102, 5), (103, 9)]
    n = len(edges)
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
        "user_id": pa.array([a for a, _ in edges], type=pa.int64()),
        "event_type": pa.array(["t"] * n, type=pa.string()),
        "value": pa.array([b * 0.01 + 0.001 for _, b in edges],
                          type=pa.float64()),
        "props": pa.array(["{}"] * n, type=pa.string())})
    pq.write_table(tab, tmp_path / "events.parquet")

    got = Q.q_events_butterflies(str(tmp_path)).to_pandas()

    from collections import Counter, defaultdict
    adj = defaultdict(set)
    for u, it in edges:
        adj[u].add(it)
    cij = Counter()
    for items in adj.values():
        for i, j in combinations(sorted(items), 2):
            cij[(i, j)] += 1
    n_wedges = sum(cij.values())
    n_bf = sum(c * (c - 1) // 2 for c in cij.values())
    assert int(got["n_wedges"][0]) == n_wedges == 6
    assert int(got["n_butterflies"][0]) == n_bf == 3


# ----------------------------------------------------------------- BM25


def test_bm25_matches_bruteforce(ray_session, tmp_path):
    """docs_bm25 == a Python-int replica of the fixed-point Okapi
    formula on a planted corpus: docs without query tokens emit no row,
    repeated terms saturate via the tf normalizer, ties break doc_id
    ASC."""
    import math

    from ligrust_ray.pipelines import queries as Q

    texts = [
        "query window spark customer extra pad",       # all four terms
        "query query query query pad pad pad pad",     # tf saturation
        "nothing relevant here at all",                # no query terms
        "customer spark pad",                          # short doc
        "window pad pad pad pad pad pad pad pad pad",  # long-ish, 1 term
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (Q.q_docs_bm25(str(tmp_path)).to_pandas()
           .reset_index(drop=True))

    toks = [t.split() for t in texts]
    n = len(texts)
    big_t = sum(len(w) for w in toks)
    exp_rows = {}
    for tok in Q.BM25_QUERY:
        df = sum(1 for w in toks if tok in w)
        if not df:
            continue
        idf = int(math.floor(
            Q.BM25_SCALE * math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            + 0.5))
        for d, w in enumerate(toks):
            tf = w.count(tok)
            if not tf:
                continue
            v = (idf * 22 * big_t * tf) // (
                10 * big_t * tf + 3 * big_t + 9 * len(w) * n)
            exp_rows[d] = exp_rows.get(d, 0) + v
    exp = pd.DataFrame(
        sorted(exp_rows.items(), key=lambda kv: (-kv[1], kv[0])),
        columns=["doc_id", "score_milli"]).head(Q.BM25_K_DOCS)
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  exp.astype(np.int64))
    assert 2 not in set(got["doc_id"])   # no-query-term doc absent


# ------------------------------------------------------ WL refinement


def _wl_brute(und: set, rounds: int = 2) -> list[dict]:
    """hashlib replica of the _wl_round spec: c0 = degree, then
    md5('{own}|{sum}') with sum = wrapped mod-2^64 multiset hash."""
    from collections import defaultdict

    from ligrust_ray.dataops.hashing import md5_u64_lower, u64_to_i64

    adj = defaultdict(set)
    for a_, b_ in und:
        adj[a_].add(b_)
        adj[b_].add(a_)
    cols = [{v: len(nb) for v, nb in adj.items()}]
    for _ in range(rounds):
        cur = cols[-1]
        nxt = {}
        for v, nb in adj.items():
            s = sum(md5_u64_lower(str(cur[w]).encode()) for w in nb)
            sm = u64_to_i64(s % (1 << 64))
            nxt[v] = u64_to_i64(
                md5_u64_lower(f"{cur[v]}|{sm}".encode()))
        cols.append(nxt)
    return cols


def test_wl_colors_match_bruteforce(ray_session, tmp_path):
    """events_wl_colors == hashlib replica of the multiset-hash WL spec
    on a random events graph."""
    from ligrust_ray.pipelines import queries as Q

    rng = np.random.default_rng(31)
    n_ev = 600
    tab = pa.table({
        "event_id": pa.array(range(n_ev), type=pa.int64()),
        "ts": pa.array([0] * n_ev, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 40, n_ev), type=pa.int64()),
        "event_type": pa.array(["t"] * n_ev, type=pa.string()),
        "value": pa.array(rng.uniform(0, 10, n_ev), type=pa.float64()),
        "props": pa.array(["{}"] * n_ev, type=pa.string())})
    pq.write_table(tab, tmp_path / "events.parquet")

    got = (Q.q_events_wl_colors(str(tmp_path)).to_pandas()
           .sort_values("node_id").reset_index(drop=True))

    uid = tab.column("user_id").to_numpy()
    val = tab.column("value").to_numpy()
    dst = (np.floor(val * 100).astype(np.int64)) % 150
    und = {(min(int(s), int(d)), max(int(s), int(d)))
           for s, d in zip(uid, dst) if s != d}
    cols = _wl_brute(und)
    exp = pd.DataFrame(
        sorted((v, cols[1][v], cols[2][v]) for v in cols[0]),
        columns=["node_id", "wl1", "wl2"])
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  exp.astype(np.int64))


def test_wl_colors_orbit_equivalence(ray_session, tmp_path):
    """Symmetric positions get identical colors: two disjoint triangles
    share one wl2 color; a 3-star's leaves share another and its center
    a third; all three classes differ. (A 4-cycle would NOT separate
    from a triangle — both are 2-regular, the classic 1-WL limit.)"""
    from ligrust_ray.pipelines import queries as Q

    # planted edges (a, b): user_id = a, value = b/100 + eps
    edges = [(0, 1), (1, 2), (2, 0),          # triangle A
             (10, 11), (11, 12), (12, 10),    # triangle B
             (20, 21), (20, 22), (20, 23)]    # star, center 20
    n = len(edges)
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
        "user_id": pa.array([a for a, _ in edges], type=pa.int64()),
        "event_type": pa.array(["t"] * n, type=pa.string()),
        "value": pa.array([b * 0.01 + 0.001 for _, b in edges],
                          type=pa.float64()),
        "props": pa.array(["{}"] * n, type=pa.string())})
    pq.write_table(tab, tmp_path / "events.parquet")

    got = Q.q_events_wl_colors(str(tmp_path)).to_pandas()
    by = dict(zip(got["node_id"], got["wl2"]))
    tri = {by[v] for v in (0, 1, 2, 10, 11, 12)}
    leaf = {by[v] for v in (21, 22, 23)}
    assert len(tri) == 1 and len(leaf) == 1
    assert len(tri | leaf | {by[20]}) == 3


# ------------------------------------------------ resource-allocation LP


def test_link_pred_matches_bruteforce(ray_session, tmp_path):
    """events_link_pred == brute-force RA scoring over the same simple
    undirected graph with the same degree cap."""
    from ligrust_ray.pipelines import queries as Q

    rng = np.random.default_rng(11)
    n_ev = 800
    tab = pa.table({
        "event_id": pa.array(range(n_ev), type=pa.int64()),
        "ts": pa.array([0] * n_ev, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 60, n_ev), type=pa.int64()),
        "event_type": pa.array(["t"] * n_ev, type=pa.string()),
        "value": pa.array(rng.uniform(0, 10, n_ev), type=pa.float64()),
        "props": pa.array(["{}"] * n_ev, type=pa.string())})
    pq.write_table(tab, tmp_path / "events.parquet")

    got = (Q.q_events_link_pred(str(tmp_path)).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True)
           .astype(np.int64))

    # brute force from the same edge rule
    uid = tab.column("user_id").to_numpy()
    val = tab.column("value").to_numpy()
    dst = (np.floor(val * 100).astype(np.int64)) % 150
    und = {(min(int(s), int(d)), max(int(s), int(d)))
           for s, d in zip(uid, dst) if s != d}
    from collections import defaultdict
    adj = defaultdict(set)
    for a_, b_ in und:
        adj[a_].add(b_)
        adj[b_].add(a_)
    acc: dict = {}
    for v, nbrs in adj.items():
        if len(nbrs) > Q.CN_DEGREE_CAP:
            continue
        ns = sorted(nbrs)
        w = Q.RA_SCALE // len(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                k = (ns[i], ns[j])
                c, s = acc.get(k, (0, 0))
                acc[k] = (c + 1, s + w)
    exp = pd.DataFrame(
        [(a_, b_, c, s) for (a_, b_), (c, s) in sorted(acc.items())
         if c >= Q.CN_MIN_COMMON],
        columns=["a", "b", "n_common", "ra_ppb"]).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


# ------------------------------------------------------- resumable sink


def test_resumable_sink_roundtrip_and_resume(ray_session, tmp_path):
    from ligrust_ray.sources.resumable_sink import (
        read_partitioned, shard_of, write_partitioned)

    n = 1000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": [f"doc {i}" for i in range(n)]})
    ds = ray.data.from_pandas(df).repartition(6)
    out = str(tmp_path / "sink")

    stats = write_partitioned(ds, out, key="doc_id", num_shards=8,
                              num_partitions=4)
    assert stats["rows"].sum() == n and stats["skipped"].sum() == 0
    assert len(stats) == 8

    back = (read_partitioned(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, df)

    # simulate a mid-run failure: one shard lost its marker (uncommitted)
    import os
    victim = str(tmp_path / "sink" / "shard=00003")
    os.remove(os.path.join(victim, "_SUCCESS"))
    os.remove(os.path.join(victim, "part.parquet"))

    before = {p: os.path.getmtime(os.path.join(out, p, "part.parquet"))
              for p in os.listdir(out)
              if p.startswith("shard=") and p != "shard=00003"}
    stats2 = write_partitioned(ds, out, key="doc_id", num_shards=8,
                               num_partitions=4)
    # only the victim was rewritten; everything else skipped untouched
    assert int(stats2["skipped"].sum()) == 7
    exp_victim = int((shard_of(df["doc_id"].to_numpy(), 8) == 3).sum())
    assert int(stats2["rows"].sum()) == exp_victim
    for p, m in before.items():
        assert os.path.getmtime(os.path.join(out, p, "part.parquet")) == m

    back2 = (read_partitioned(out).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back2, df)


def test_resumable_sink_string_keys_deterministic(ray_session, tmp_path):
    from ligrust_ray.sources.resumable_sink import shard_of, write_partitioned

    df = pd.DataFrame({"url": [f"https://e{i}.com/p" for i in range(50)],
                       "v": np.arange(50, dtype=np.int64)})
    s1 = shard_of(df["url"].to_numpy(), 16)
    s2 = shard_of(df["url"].to_numpy(), 16)
    assert (s1 == s2).all() and len(np.unique(s1)) > 1
    out = str(tmp_path / "s")
    stats = write_partitioned(ray.data.from_pandas(df), out, key="url",
                              num_shards=16, num_partitions=4)
    assert stats["rows"].sum() == 50


def test_docs_oov_planted(ray_session, tmp_path):
    """Vocab = top-1000 by count; rare tokens score as OOV; zero-word
    docs emit no row."""
    from ligrust_ray.pipelines import queries as Q

    texts = (["common words here"] * 20
             + ["common words here plus RARETOKEN" ]
             + ["   "])                       # whitespace-only: no row
    n = len(texts)
    tab = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n, type=pa.string()),
        "source": pa.array(["s"] * n, type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64())})
    pq.write_table(tab, tmp_path / "documents.parquet")

    got = (Q.q_docs_oov(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == n - 1                  # whitespace doc dropped
    base = got[got["doc_id"] < 20]
    assert (base["n_oov"] == 0).all() and (base["oov_permille"] == 0).all()
    rare = got[got["doc_id"] == 20].iloc[0]
    # vocab has only 4 distinct tokens (< K) so nothing is OOV... unless
    # the vocab cap binds; with K=1000 all 4 are in-vocab
    assert rare["n_tokens_w"] == 5 and rare["n_oov"] == 0

    # force a tiny vocab to plant real OOV: monkeypatch K
    old = Q.OOV_VOCAB_K
    try:
        Q.OOV_VOCAB_K = 3                     # top-3 = common/words/here
        got2 = (Q.q_docs_oov(str(tmp_path)).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        r2 = got2[got2["doc_id"] == 20].iloc[0]
        assert r2["n_oov"] == 2               # 'plus' and 'raretoken'
        assert r2["oov_permille"] == (1000 * 2) // 5
    finally:
        Q.OOV_VOCAB_K = old


def test_rolling_user_sum_planted(ray_session):
    """Trailing-3 per-user rolling sum: hand-checked values, cross-block
    users, ties broken by event_id."""
    from ligrust_ray.dataops.windows import rolling_user_sum

    ts = pd.to_datetime([1, 2, 3, 4, 5, 1, 2, 2], unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([7, 7, 7, 7, 7, 9, 9, 9], dtype=np.int64),
        "value": np.array([0.10, 0.20, 0.30, 0.40, 0.50,
                           1.00, 2.00, 3.00])})
    ds = ray.data.from_pandas(df).repartition(3)
    got = (rolling_user_sum(ds).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # cents: 10,20,30,40,50 | 100,200,300 (ts tie at rows 6,7 -> event_id)
    exp = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "user_id": df["user_id"],
        "roll_cents": np.array([0, 10, 30, 60, 90, 0, 100, 300],
                               dtype=np.int64)})
    pd.testing.assert_frame_equal(got, exp)


def test_edge_whitespace_parity_vs_duckdb(ray_session, tmp_path):
    """Adversarial edge whitespace (trailing \\n, leading \\t, \\n-only,
    space-only docs): every text-op token path must equal its DuckDB
    oracle exactly — DuckDB trim() strips SPACES only, so Python .strip()
    (all whitespace) silently diverged before this spec pin."""
    import duckdb

    import __ray_entry__ as E

    texts = ["plain words here", "trailing newline\n", "\tleading tab",
             "\n", "   ", "", "mixed  \t inner\nws", "a\n"]
    n = len(texts)
    tab = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n, type=pa.string()),
        "source": pa.array(["s"] * n, type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64())})
    pq.write_table(tab, tmp_path / "documents.parquet")

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    qs, sqls = E.queries(), E.oracle_sql()
    for name in ("docs_token_count", "docs_stats", "docs_fingerprint",
                 "docs_simhash", "docs_pack", "docs_source_stats",
                 "docs_decontaminate", "docs_token_quantiles"):
        got = qs[name](str(tmp_path))
        got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
        if isinstance(got, pa.Table):
            got = got.to_pandas()
        exp = con.execute(sqls[name]).df()
        got = got[sorted(got.columns)].sort_values(
            sorted(got.columns)).reset_index(drop=True)
        exp = exp[sorted(exp.columns)].sort_values(
            sorted(exp.columns)).reset_index(drop=True)
        for c in exp.columns:
            if exp[c].dtype != object:
                exp[c] = exp[c].astype(np.int64)
                got[c] = got[c].astype(np.int64)
        pd.testing.assert_frame_equal(got, exp, obj=name)


def test_resumable_sink_empty_input(ray_session, tmp_path):
    from ligrust_ray.sources.resumable_sink import write_partitioned

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype=np.int64),
        "text": pd.Series([], dtype=object)}))
    stats = write_partitioned(ds, str(tmp_path / "e"), key="doc_id",
                              num_shards=4)
    assert len(stats) == 0
    assert list(stats.columns) == ["shard", "rows", "skipped"]


def test_new_relational_and_bigrams_vs_duckdb(ray_session):
    """supplier_nation_revenue / docs_dup_bigrams vs their contract SQL on
    sf0.001 — in-repo mirror of the driver compare."""
    import duckdb

    import __ray_entry__ as E
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "part", "documents", "events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sqls = E.oracle_sql()
    for name, fn in [("supplier_nation_revenue",
                      Q.q_supplier_nation_revenue),
                     ("part_brand_revenue", Q.q_part_brand_revenue),
                     ("docs_dup_bigrams", Q.q_docs_dup_bigrams),
                     ("docs_lm_perplexity", Q.q_docs_lm_perplexity),
                     ("events_markov", Q.q_events_markov),
                     ("events_negative_samples",
                      Q.q_events_negative_samples),
                     ("emb_label_centroids", Q.q_emb_label_centroids)]:
        got = fn(sf)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        exp = con.execute(sqls[name]).df()
        cols = sorted(exp.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        exp = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(got) == len(exp), name
        for c in cols:
            if exp[c].dtype == object:
                np.testing.assert_array_equal(
                    got[c].astype(str).to_numpy(),
                    exp[c].astype(str).to_numpy(), err_msg=f"{name}.{c}")
            else:
                np.testing.assert_array_equal(
                    got[c].to_numpy(dtype=np.int64),
                    exp[c].to_numpy(dtype=np.int64),
                    err_msg=f"{name}.{c}")


def test_dup_bigrams_planted_edge_cases(ray_session, tmp_path):
    """Hand-checked repetition semantics: repeated pair, all-same tokens,
    single-token and empty docs (no row), case folding, mixed whitespace."""
    import pyarrow.parquet as pq

    from ligrust_ray.pipelines import queries as Q

    texts = ["a b a b a",        # (a,b)x2 (b,a)x2 -> top 2 / 4
             "Q q q\tq",         # (q,q)x3 -> 1000 permille
             "solo",             # 1 token -> no row
             "",                 # no tokens -> no row
             "  x   y  "]        # 1 bigram -> 1000
    tbl = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = (Q.q_docs_dup_bigrams(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = pd.DataFrame({"doc_id": [0, 1, 4], "n_bigrams": [4, 3, 1],
                        "top_n": [2, 3, 1], "top_permille": [500, 1000,
                                                             1000]})
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  exp.astype(np.int64))


def test_lm_perplexity_planted(ray_session, tmp_path):
    """Hand-computed add-one bigram-LM cross-entropy: corpus = {"a b a",
    "a a", "b"} -> unigrams a:4 b:2 (V=2), bigrams "a b":1 "b a":1
    "a a":1; nll("a b") = nll("a a") = round(ln(3)*1e6) = 1098612,
    nll("b a") = round(ln(2)*1e6) = 693147; single-token doc emits no
    row; ce is exact integer floor division."""
    import pyarrow.parquet as pq

    from ligrust_ray.pipelines import queries as Q

    tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": pa.array(["a b a", "a a", "b"])})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = (Q.q_docs_lm_perplexity(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = pd.DataFrame({
        "doc_id": [0, 1],
        "n_bigrams": [2, 1],
        "nll_sum_micro": [1098612 + 693147, 1098612],
        "ce_micro": [(1098612 + 693147) // 2, 1098612]})
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_cms_registers_and_point_query(ray_session):
    import pandas as pd
    import ray.data

    from ligrust_ray.dataops.sketch import cms_point_query, cms_registers

    words = {"alpha": 40, "beta": 25, "gamma": 7, "delta": 1}
    text = " ".join(w for w, k in words.items() for _ in range(k))
    docs = pd.DataFrame({"text": [text, "alpha beta", "alpha"]})
    ds = ray.data.from_pandas([docs.iloc[:1], docs.iloc[1:]])
    regs = cms_registers(ds).to_pandas()
    exact = {"alpha": 42, "beta": 26, "gamma": 7, "delta": 1}
    est = cms_point_query(regs, list(exact))
    assert (est >= np.array(list(exact.values()))).all()   # never under
    # few distinct tokens vs width 1024: no collisions -> exact
    assert est.tolist() == list(exact.values())
    # total mass per row == total token count (the CMS invariant)
    per_row = regs.groupby("r")["n"].sum()
    assert (per_row == sum(exact.values())).all()
    # mergeability: registers(half A) + registers(half B) == registers(all)
    ra = cms_registers(ray.data.from_pandas(docs.iloc[:1])).to_pandas()
    rb = cms_registers(ray.data.from_pandas(
        docs.iloc[1:].reset_index(drop=True))).to_pandas()
    merged = (pd.concat([ra, rb]).groupby(["r", "c"], as_index=False)
              ["n"].sum().sort_values(["r", "c"]).reset_index(drop=True))
    whole = regs.sort_values(["r", "c"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, whole)


def test_unicode_whitespace_re2_parity():
    """Engine tokenizers use an explicit [\\t\\n\\f\\r ] class so docs
    containing UNICODE whitespace (NBSP, LINE SEPARATOR, \\x0b — all
    Python-\\s but not RE2-\\s) tokenize identically to the DuckDB RE2
    oracles."""
    import duckdb
    import pyarrow as pa

    from ligrust_ray.dataops import textstats

    texts = ["a\xa0b", "para break", "x\x0by", "a b", "a\t\nb", "", "  pad  "]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    got = textstats.token_count_batch(t).column("n_tokens").to_pylist()
    con = duckdb.connect()
    exp = [con.execute(
        "SELECT length(regexp_split_to_array(trim(?), '\\s+'))",
        [x]).fetchone()[0] for x in texts]
    assert got == exp

    got_fp = textstats.fingerprint_batch(t).column("fingerprint").to_pylist()
    exp_fp = [con.execute(
        "WITH h AS (SELECT md5_number_lower(regexp_replace(trim(?), "
        "'\\s+', ' ', 'g')) AS u) "
        "SELECT CAST(CAST(u AS HUGEINT) - (CASE WHEN u >= "
        "9223372036854775808 THEN 18446744073709551616 ELSE 0 END) "
        "AS BIGINT) FROM h", [x]).fetchone()[0] for x in texts]
    assert got_fp == exp_fp


def test_resumable_sink_rejects_mismatched_resume(ray_session, tmp_path):
    """_SUCCESS alone must not authorize a skip: resuming with different
    num_shards, a different key, or changed input data fails loudly
    instead of silently mixing output generations."""
    import os

    import pytest
    import ray.data

    from ligrust_ray.sources.resumable_sink import write_partitioned

    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                       "text": [f"t{i}" for i in range(50)]})
    out = str(tmp_path / "sink")
    write_partitioned(ray.data.from_pandas(df), out, key="doc_id",
                      num_shards=8)

    with pytest.raises(ValueError, match="num_shards"):
        write_partitioned(ray.data.from_pandas(df), out, key="doc_id",
                          num_shards=4)
    # changed input rows under the same params
    df2 = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                        "text": [f"t{i}" for i in range(40)]})
    with pytest.raises(ValueError, match="n_rows"):
        write_partitioned(ray.data.from_pandas(df2), out, key="doc_id",
                          num_shards=8)
    # identical rerun still resumes cleanly (everything skipped)
    stats = write_partitioned(ray.data.from_pandas(df), out, key="doc_id",
                              num_shards=8)
    assert stats["rows"].sum() == 0 and stats["skipped"].all()

    # resume=False declares a NEW generation: different params succeed,
    # every old shard dir is cleared (no generation mixing), config
    # replaced
    stats = write_partitioned(ray.data.from_pandas(df2), out, key="doc_id",
                              num_shards=4, resume=False)
    assert stats["rows"].sum() == 40 and not stats["skipped"].any()
    shard_dirs = [n for n in os.listdir(out) if n.startswith("shard=")]
    assert len(shard_dirs) <= 4          # 8-shard generation fully gone
    from ligrust_ray.sources.resumable_sink import read_partitioned
    assert read_partitioned(out).count() == 40

    # pre-upgrade sink (no _SINK_CONFIG) is ADOPTED on resume, not refused
    os.remove(os.path.join(out, "_SINK_CONFIG"))
    stats = write_partitioned(ray.data.from_pandas(df2), out, key="doc_id",
                              num_shards=4)
    assert stats["rows"].sum() == 0 and stats["skipped"].all()
    assert os.path.exists(os.path.join(out, "_SINK_CONFIG"))


def test_dsir_scores_match_duckdb(ray_session):
    """Engine DSIR scores == the SQL spec on an adversarial corpus:
    unicode whitespace (NBSP is a TOKEN character under RE2 \\s), empty
    and whitespace-only docs (no score row), exact ties (broken by
    doc_id), and a skewed target slice."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from ligrust_ray.dataops import dsir

    texts = ["the cat sat", "the\xa0cat", "", "   ", "le chat noir",
             "the the the", "cat", "\tcat\n", "der hund", "the cat sat"]
    langs = ["en", "en", "en", "fr", "fr", "en", "de", "de", "de", "fr"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string()),
                  "lang": pa.array(langs, type=pa.string())})
    ds = ray.data.from_arrow(t).repartition(3)

    got = dsir.dsir_sample(ds, k=8).to_pandas()

    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(
        "WITH tok AS (SELECT doc_id, lang, "
        "UNNEST(regexp_extract_all(text, '\\S+')) AS tk FROM documents), "
        "b AS (SELECT doc_id, lang, "
        "CAST(md5_number_lower(tk) % 8192 AS BIGINT) AS bucket FROM tok), "
        "cnt AS (SELECT bucket, COUNT(*) AS nc, "
        "COUNT(*) FILTER (WHERE lang = 'en') AS nt FROM b GROUP BY bucket), "
        "w AS (SELECT b.doc_id, (1000000 * (c.nt + 1)) // (c.nc + 1) AS tw "
        "FROM b JOIN cnt c USING (bucket)), "
        "s AS (SELECT doc_id, CAST(SUM(tw) // COUNT(*) AS BIGINT) AS score "
        "FROM w GROUP BY doc_id) "
        "SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 8"
    ).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)
    # empty/whitespace-only docs (2, 3) never appear
    assert not set(got["doc_id"]) & {2, 3}
    # determinism across a re-run with different partitioning
    got2 = dsir.dsir_sample(ray.data.from_arrow(t).repartition(7),
                            k=8).to_pandas()
    pd.testing.assert_frame_equal(got, got2)


def test_dup_spans_planted(ray_session, tmp_path):
    """Hand-checked duplicated-span semantics: one shared 16-token span
    between two long docs, a disjoint long doc (no row), and an exactly
    duplicated short doc pair (whole-text fallback under 16 tokens)."""
    import pyarrow.parquet as pq

    from ligrust_ray.pipelines import queries as Q

    span = " ".join(f"w{i}" for i in range(16))
    texts = [
        "lead in tokens " + span,              # shares exactly [w0..w15]
        span + " trailing stuff here",         # with this doc
        " ".join(f"z{i}" for i in range(30)),  # disjoint -> no row
        "tiny little doc five tokens",         # whole-text fallback,
        "tiny little doc five tokens",         # duplicated -> 1 each
    ]
    tbl = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = (Q.q_docs_dup_spans(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = pd.DataFrame({"doc_id": [0, 1, 3, 4],
                        "n_dup_spans": [1, 1, 1, 1]})
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  exp.astype(np.int64))


def test_gopher_filter_planted(ray_session, tmp_path):
    """Each rule knocks out exactly one planted doc: token floor, trigram
    repetition cap, alphabetic-ratio floor, mean-word-length ceiling."""
    import pyarrow.parquet as pq

    from ligrust_ray.pipelines import queries as Q

    ok_doc = " ".join(f"word{chr(97 + i)}x" for i in range(25))  # 7-char words
    texts = [
        ok_doc,                                     # passes everything
        "five short tokens only here",              # < 20 tokens
        " ".join(["spam"] * 24),                    # top trigram 1000 permille
        " ".join(str(1000 + i) for i in range(24)),  # digits: alpha ratio 0
        " ".join("abcdefghijkl" + str(i) for i in range(24)),  # mean wl 13
    ]
    tbl = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = (Q.q_docs_gopher_filter(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = pd.DataFrame({"doc_id": [0], "n_tokens": [25]})
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  exp.astype(np.int64))


def test_round4_link_and_modularity_vs_duckdb(ray_session):
    """events_modularity / events_jaccard_pairs / docs_gopher_filter /
    docs_dup_spans vs their contract SQL on sf0.001 — in-repo mirror of
    the driver compare."""
    import duckdb

    import __ray_entry__ as E
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sqls = E.oracle_sql()
    for name, fn in [("events_modularity", Q.q_events_modularity),
                     ("events_jaccard_pairs", Q.q_events_jaccard_pairs),
                     ("docs_gopher_filter", Q.q_docs_gopher_filter),
                     ("docs_dup_spans", Q.q_docs_dup_spans)]:
        got = fn(sf)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        exp = con.execute(sqls[name]).df()
        cols = sorted(exp.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        exp = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(got) == len(exp), name
        for c in cols:
            np.testing.assert_array_equal(
                got[c].to_numpy(dtype=np.int64),
                exp[c].to_numpy(dtype=np.int64), err_msg=f"{name}.{c}")


def test_window_hll_estimates_per_window_distinct(ray_session, tmp_path):
    """events_window_hll registers, run through the standard estimator,
    recover each hour's exact distinct-user count within 5%."""
    from ligrust_ray.dataops import sketch
    from ligrust_ray.pipelines import queries as Q

    rng = np.random.default_rng(7)
    n_ev = 6000
    hours = rng.integers(0, 3, n_ev)          # three 1-hour windows
    # window h draws users from a pool of (h+1)*400 ids
    users = np.array([int(rng.integers(0, (h + 1) * 400)) for h in hours],
                     dtype=np.int64)
    ts = hours * 3_600_000_000 + rng.integers(0, 3_600_000_000, n_ev)
    tab = pa.table({
        "event_id": pa.array(range(n_ev), type=pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(users),
        "event_type": pa.array(["t"] * n_ev, type=pa.string()),
        "value": pa.array(np.zeros(n_ev), type=pa.float64()),
        "props": pa.array(["{}"] * n_ev, type=pa.string())})
    pq.write_table(tab, tmp_path / "events.parquet")

    regs = Q.q_events_window_hll(str(tmp_path)).to_pandas()
    est = sketch.hll_estimate(regs, "window_start_us")
    exact = (pd.DataFrame({"w": (ts // 3_600_000_000) * 3_600_000_000,
                           "u": users})
             .groupby("w")["u"].nunique())
    assert len(est) == 3
    for w, e in zip(est["window_start_us"], est["estimate"]):
        true = exact[int(w)]
        assert abs(e - true) / true < 0.05, (w, e, true)


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    """Every inserted value tests positive; FP rate on disjoint probes is
    near (1 - e^{-kn/m})^k; merging two halves' bit sets = the whole's."""
    import ray.data

    from ligrust_ray.dataops import sketch

    vals = np.arange(3000, dtype=np.int64)
    t = pa.table({"user_id": pa.array(vals)})
    bits = sketch.bloom_bits(ray.data.from_arrow(t), "user_id").to_pandas()
    assert bits["bit"].is_unique and len(bits) <= sketch.BLOOM_BITS
    # no false negatives
    assert sketch.bloom_contains(bits, [str(v) for v in vals]).all()
    # FP rate on 5000 disjoint probes: theory ~ (1-e^{-kn/m})^k = 0.028%
    probes = [str(v) for v in range(10**6, 10**6 + 5000)]
    fp = sketch.bloom_contains(bits, probes).mean()
    assert fp < 0.01
    # merge = row union: two halves OR'd equal the whole
    h1 = sketch.bloom_bits(
        ray.data.from_arrow(t.slice(0, 1500)), "user_id").to_pandas()
    h2 = sketch.bloom_bits(
        ray.data.from_arrow(t.slice(1500)), "user_id").to_pandas()
    merged = np.union1d(h1["bit"].to_numpy(), h2["bit"].to_numpy())
    np.testing.assert_array_equal(np.sort(bits["bit"].to_numpy()), merged)


def test_funnel_counts_planted(ray_session):
    """Ordered funnel: strict-after semantics, per-stage counts.

    user 1: view@1 click@2 purchase@3          -> reaches all 3
    user 2: view@5 click@4 (click BEFORE view) -> view only
    user 3: click@1 purchase@2 (never views)   -> nothing
    user 4: view@1 click@1 (same ts, not >)    -> view only
    user 5: view@2 view@1 click@3 purchase@2   -> view+click (purchase
            at ts2 is before click-reach ts3)
    """
    from ligrust_ray.dataops.windows import funnel_counts

    rows = [  # (user, type, ts_sec)
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        (2, "view", 5), (2, "click", 4),
        (3, "click", 1), (3, "purchase", 2),
        (4, "view", 1), (4, "click", 1),
        (5, "view", 2), (5, "view", 1), (5, "click", 3),
        (5, "purchase", 2),
    ]
    df = pd.DataFrame({
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "event_type": [r[1] for r in rows],
        "ts": pd.to_datetime([r[2] for r in rows], unit="s")})
    ds = ray.data.from_pandas(df).repartition(3)
    got = (funnel_counts(ds).to_pandas()
           .sort_values("stage").reset_index(drop=True))
    exp = pd.DataFrame({
        "stage": ["1_view", "2_click", "3_purchase"],
        "n_users": np.array([4, 2, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, exp)


def test_winnowing_matches_bruteforce(ray_session):
    """winnow_batch == a per-doc pure-Python winnow (k-gram md5, window
    min with rightmost tie-break); the paper's guarantee holds: two docs
    sharing a run of w+k-1 tokens share a fingerprint; docs shorter than
    w+k-1 tokens emit nothing."""
    from ligrust_ray.dataops.hashing import md5_i64_lower
    from ligrust_ray.dataops.textstats import WINNOW_K, WINNOW_W, winnow_batch

    k, w = WINNOW_K, WINNOW_W
    shared = "alpha beta gamma delta epsilon zeta"       # w+k-1 = 6 tokens
    texts = [
        "one two three " + shared + " four five",
        shared + " completely different trailing words here",
        "tiny doc",                                       # < k tokens
        "exactly five tokens only here",                  # k grams < w
        "a a a a a a a a a a",                            # degenerate ties
        "",                                               # empty
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})

    import re

    def brute(doc_id, text):
        toks = [x for x in re.split("[\t\n\f\r ]+", text.lower()) if x]
        hs = [md5_i64_lower(" ".join(toks[i:i + k]).encode())
              for i in range(len(toks) - k + 1)]
        sel = set()
        for p in range(len(hs) - w + 1):
            win = hs[p:p + w]
            best = min(range(w), key=lambda j: (win[j], -j))
            sel.add(win[best])
        return {(doc_id, fp) for fp in sel}

    exp = set()
    for i, x in enumerate(texts):
        exp |= brute(i, x)
    got = winnow_batch(t)
    got_set = set(zip(got.column("doc_id").to_pylist(),
                      got.column("fp").to_pylist()))
    assert got_set == exp
    # guarantee: docs 0 and 1 share a fingerprint from the shared run
    assert {f for d, f in got_set if d == 0} & {f for d, f in got_set
                                                if d == 1}
    assert not {f for d, f in got_set if d in (2, 3, 5)}
    # degenerate all-equal hashes still yield exactly one fingerprint
    assert len({f for d, f in got_set if d == 4}) == 1


def test_pq_codes_match_numpy_reference(ray_session):
    """pq_codes == an independent numpy replay of the spec: fixed-point
    scale, md5-medoid codebook, argmin with smallest-bucket tie-break."""
    from ligrust_ray.dataops.hashing import md5_u64_lower

    ds, mat = _emb_ds(n=80, d=16, seed=7)
    got = (ann.pq_codes(ds, m_sub=8).to_pandas()
           .sort_values(["vec_id", "s"]).reset_index(drop=True))
    assert len(got) == 80 * 8

    x = np.floor(mat.astype(np.float64) * ann.PQ_SCALE).astype(np.int64)
    b = np.array([md5_u64_lower(str(i).encode()) % ann.PQ_K
                  for i in range(80)])
    buckets = np.unique(b)
    reps = np.array([np.min(np.flatnonzero(b == j)) for j in buckets])
    cent = x[reps]                     # (nj, 16)
    sub = 16 // 8
    for i in range(80):
        for s in range(8):
            seg = slice(s * sub, (s + 1) * sub)
            d2 = ((cent[:, seg] - x[i, seg]) ** 2).sum(axis=1)
            exp_code = buckets[np.argmin(d2)]
            r = got[(got["vec_id"] == i) & (got["s"] == s)]
            assert int(r["code"].iloc[0]) == exp_code


def test_pq_knn_is_exact_adc_and_has_signal(ray_session):
    """knn_pq reproduces the exact ADC ranking computed in numpy, and
    beats the random-baseline recall vs true cosine top-k."""
    ds, mat = _emb_ds(n=300, d=64, seed=11)
    k = 10
    got = ann.knn_pq(ds, query_ids=[0, 1, 2], k=k).to_pandas()

    # numpy ADC replay
    from ligrust_ray.dataops.hashing import md5_u64_lower

    x = np.floor(mat.astype(np.float64) * ann.PQ_SCALE).astype(np.int64)
    b = np.array([md5_u64_lower(str(i).encode()) % ann.PQ_K
                  for i in range(300)])
    buckets = np.unique(b)
    cent = x[[np.min(np.flatnonzero(b == j)) for j in buckets]]
    sub = 64 // 8
    codes = np.empty((300, 8), dtype=np.int64)
    for s in range(8):
        seg = slice(s * sub, (s + 1) * sub)
        d2 = ((x[:, None, seg] - cent[None, :, seg]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1)          # position in buckets
    for q in (0, 1, 2):
        dist = np.zeros(300, dtype=np.int64)
        for s in range(8):
            seg = slice(s * sub, (s + 1) * sub)
            lut = ((cent[:, seg] - x[q, seg]) ** 2).sum(axis=1)
            dist += lut[codes[:, s]]
        exp = np.lexsort((np.arange(300), dist))[:k]
        g = got[got["query_id"] == q].sort_values("rank")
        assert g["neighbor_id"].tolist() == exp.tolist()

    exact = ann.knn_bruteforce(ds, query_ids=[0, 1, 2], k=k).to_pandas()
    recalls = []
    for q in (0, 1, 2):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(got[got["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) > k / 300 * 3   # >> random baseline


def test_quality_model_planted(ray_session):
    """Hashed-linear scoring: per-token weight lookup sums exactly; empty
    and whitespace-only docs emit nothing; keep == (score >= 0)."""
    from ligrust_ray.dataops.hashing import md5_u64_lower
    from ligrust_ray.dataops.textstats import (QMODEL_BUCKETS,
                                               HashedLinearScorer)

    def w_of(tok: str) -> int:
        b = md5_u64_lower(tok.encode()) % QMODEL_BUCKETS
        return md5_u64_lower(f"w:{b}".encode()) % 2001 - 1000

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(["Hello world hello",
                                    "  \t\n ", "", "single"])})
    got = HashedLinearScorer()(t).to_pandas()
    assert got["doc_id"].tolist() == [1, 4]
    assert got["n_tokens"].tolist() == [3, 1]
    exp1 = 2 * w_of("hello") + w_of("world")
    assert got["score"].tolist() == [exp1, w_of("single")]
    assert got["keep"].tolist() == [exp1 >= 0, w_of("single") >= 0]


def test_winnow_pairs_planted(ray_session):
    """Docs sharing a long run share >= min_shared fingerprints and pair
    up; unrelated docs never pair; shared counts are symmetric-exact."""
    from ligrust_ray.dataops.dedup import winnow_pairs

    shared = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
              "sed do eiusmod tempor incididunt ut labore")
    texts = [
        "intro one two three " + shared + " outro alpha",
        shared + " tail beta gamma delta epsilon zeta",
        "totally different content with no overlap whatsoever here",
        "intro one two three " + shared + " outro alpha",   # exact copy of 0
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)})).repartition(2)
    got = winnow_pairs(ds, min_shared=2).to_pandas()
    pairs = {(int(a), int(b)): int(s)
             for a, b, s in zip(got["a"], got["b"], got["shared"])}
    assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs
    assert not any(2 in p for p in pairs)
    # identical docs share ALL fingerprints; the overlapped pair fewer
    assert pairs[(0, 3)] > pairs[(0, 1)]
    assert pairs[(0, 1)] == pairs[(1, 3)]


def test_dedup_keep_best_prefers_quality(ray_session):
    """Keep-best survivor: within a near-dup cluster the highest
    quality-model score wins (not the min doc_id); ties fall back to the
    min id; singletons keep themselves."""
    from ligrust_ray.pipelines.queries import (q_docs_dedup_keep_best,
                                               QM_MISSING_SCORE)
    import os
    import tempfile

    from ligrust_ray.dataops.hashing import md5_u64_lower
    from ligrust_ray.dataops.textstats import QMODEL_BUCKETS

    def w_of(tok):
        b = md5_u64_lower(tok.encode()) % QMODEL_BUCKETS
        return md5_u64_lower(f"w:{b}".encode()) % 2001 - 1000

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "and keeps running through the endless green fields forever")
    # find a suffix word making the longer variant strictly higher-scored
    extra = next(wd for wd in ("sunrise", "meadow", "quiet", "golden")
                 if w_of(wd) > 0)
    texts = {10: base, 11: base + " " + extra,   # near-dups, 11 scores higher
             30: "completely unrelated content lives here on its own"}
    sf = tempfile.mkdtemp(prefix="keepbest_")
    pa_tbl = pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([len(texts[k]) for k in sorted(texts)],
                            type=pa.int64())})
    import pyarrow.parquet as pq
    pq.write_table(pa_tbl, os.path.join(sf, "documents.parquet"))

    got = (q_docs_dedup_keep_best(sf).to_pandas()
           .sort_values("cluster").reset_index(drop=True))
    by_cluster = got.set_index("cluster")
    assert int(by_cluster.loc[10, "keep_id"]) == 11      # quality beats min-id
    assert int(by_cluster.loc[10, "n_members"]) == 2
    assert int(by_cluster.loc[30, "keep_id"]) == 30
    assert (got["best_score"] > QM_MISSING_SCORE).all()


def test_similarity_join_equals_bruteforce(ray_session):
    """Prefix-filtered AllPairs == quadratic brute force (the lossless
    guarantee), on a mixed corpus of heavy/partial/no overlap plus
    single-token and empty docs."""
    from itertools import combinations

    from ligrust_ray.dataops.dedup import similarity_join
    from ligrust_ray.dataops.hashing import md5_i64_lower

    import re as _re

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    base = list(rng.choice(vocab, size=12, replace=False))
    texts[0] = " ".join(base)
    texts[1] = " ".join(base[:11] + ["extra1"])          # high overlap
    texts[2] = " ".join(base[:6] + ["x1 x2 x3 x4 x5 x6".split()[i]
                                    for i in range(6)])  # ~0.33
    texts[3] = " ".join(rng.choice(vocab, size=12, replace=False))
    texts[4] = "solo"
    texts[5] = ""
    texts[6] = " ".join(base)                            # exact copy of 0
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)])})
    ).repartition(3)

    for num, den in ((9, 10), (1, 2)):
        got = similarity_join(ds, thr_num=num, thr_den=den).to_pandas()
        got_set = {(int(a), int(b), int(c), int(u)) for a, b, c, u in
                   zip(got["a"], got["b"], got["n_common"],
                       got["n_union"])}
        sets = {k: {md5_i64_lower(w.encode())
                    for w in _re.split("[\t\n\f\r ]+", v.lower()) if w}
                for k, v in texts.items()}
        exp = set()
        for a, b in combinations(sorted(texts), 2):
            c = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and c * den >= num * u:
                exp.add((a, b, c, u))
        assert got_set == exp, (num, den)
    # sanity: the exact copy and the 11/13 pair survive 9/10... copy only
    got9 = {(r[0], r[1]) for r in got_set}
    assert (0, 6) in got9


def test_containment_join_equals_bruteforce(ray_session):
    """Probing-side prefix filter + fully-indexed containing side ==
    quadratic brute force, on a corpus with a full wrap (quote inside a
    long doc — the low-Jaccard/high-containment case), a 9/10 partial,
    an exact copy, single-token and empty docs."""
    from ligrust_ray.dataops.dedup import containment_join
    from ligrust_ray.dataops.hashing import md5_i64_lower

    import re as _re

    w = [f"v{i}" for i in range(30)]
    texts = {
        0: " ".join(w[:10]),                        # the short doc
        1: " ".join(w[:10] + w[10:30]),             # wraps 0 (J = 1/3)
        2: " ".join(w[:9] + ["odd"]),               # 9/10 of 0
        3: " ".join(w[20:26]),                      # contained in 1 only
        4: "solo",
        5: "",
        6: " ".join(w[:10]),                        # exact copy of 0
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)])})
    ).repartition(3)

    sets = {k: {md5_i64_lower(x.encode())
                for x in _re.split("[\t\n\f\r ]+", v.lower()) if x}
            for k, v in texts.items()}
    for num, den in ((9, 10), (1, 2)):
        got = containment_join(ds, thr_num=num, thr_den=den).to_pandas()
        got_set = {(int(a), int(b), int(c), int(s)) for a, b, c, s in
                   zip(got["a"], got["b"], got["n_common"], got["n_a"])}
        exp = set()
        for a in texts:
            for b in texts:
                if a == b or not sets[a]:
                    continue
                c = len(sets[a] & sets[b])
                if c * den >= num * len(sets[a]):
                    exp.add((a, b, c, len(sets[a])))
        assert got_set == exp, (num, den)
    # the directional wrap survives 9/10 one way only
    got9 = {(r[0], r[1]) for r in got_set}
    assert (0, 1) in got9 and (1, 0) not in got9
    assert (3, 1) in got9
    assert (0, 6) in got9 and (6, 0) in got9      # exact copy: both ways


def test_chunk_batch_planted(ray_session):
    """Sliding-window chunking: full coverage with overlap, correct
    partial tail, empty docs emit nothing, fp = md5 of the joined seg."""
    from ligrust_ray.dataops.hashing import md5_i64_lower
    from ligrust_ray.dataops.textstats import chunk_batch

    toks = [f"t{i}" for i in range(100)]     # 100 tokens: chunks at 0,48,96
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array([" ".join(toks), "one two", "  "])})
    got = (chunk_batch(t).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    d1 = got[got["doc_id"] == 1]
    assert d1["start_tok"].tolist() == [0, 48, 96]
    assert d1["n_tokens"].tolist() == [64, 52, 4]
    assert int(d1["chunk_fp"].iloc[0]) == md5_i64_lower(
        " ".join(toks[:64]).encode())
    assert int(d1["chunk_fp"].iloc[2]) == md5_i64_lower(
        " ".join(toks[96:]).encode())
    d2 = got[got["doc_id"] == 2]
    assert d2["n_tokens"].tolist() == [2] and d2["start_tok"].tolist() == [0]
    assert (got["doc_id"] != 3).all()


def test_new_ops_empty_inputs(ray_session):
    """Every round-4f operator handles an empty table without crashing
    and returns its schema with zero rows."""
    from ligrust_ray.algos.hyperball import (hyperball_summary,
                                             neighborhood_function)
    from ligrust_ray.dataops.dedup import similarity_join, winnow_pairs
    from ligrust_ray.dataops.textstats import (HashedLinearScorer,
                                               chunk_batch, winnow_batch)
    from ligrust_ray.dataops.windows import funnel_counts

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    assert winnow_batch(pa.table({"doc_id": pa.array([], pa.int64()),
                                  "text": pa.array([], pa.string())})
                        ).num_rows == 0
    assert chunk_batch(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())})
                       ).num_rows == 0
    assert HashedLinearScorer()(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())})).num_rows == 0
    assert winnow_pairs(docs).count() == 0
    assert similarity_join(docs).count() == 0
    from ligrust_ray.dataops.dedup import containment_join
    assert containment_join(docs).count() == 0

    ev = ray.data.from_arrow(pa.table({
        "ts": pa.array([], type=pa.timestamp("us")),
        "user_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string())}))
    f = funnel_counts(ev).to_pandas()
    assert sorted(f["stage"]) == ["1_view", "2_click", "3_purchase"]
    assert (f["n_users"] == 0).all()

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64())}))
    assert hyperball_summary(edges).count() == 0
    nf = neighborhood_function(edges, max_t=2)
    assert set(nf["n_pairs"]) == {0.0} and len(nf) <= 2


def test_dedup_incremental_planted(ray_session, tmp_path):
    """Incoming docs (doc_id % 10 == 0) flagged iff their exact text
    exists in the existing split: planted cross-split dup, within-split
    dup (NOT flagged), and unique incoming doc."""
    import pyarrow.parquet as pq

    from ligrust_ray.pipelines import queries as Q

    tbl = pa.table({
        "doc_id": pa.array([10, 20, 30, 1, 2, 40, 50], type=pa.int64()),
        "text": pa.array(["same A", "unique in",  # 10 dup of 1, 20 unique
                          "same B",               # 30 dup of 2
                          "same A", "same B",     # existing split
                          "incoming twin", "incoming twin"])})
    # 40/50 duplicate EACH OTHER but nothing in the existing split ->
    # neither is flagged (intake-vs-corpus semantics, not intra-batch)
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = sorted(Q.q_docs_dedup_incremental(str(tmp_path))
                 .to_pandas()["doc_id"].tolist())
    assert got == [10, 30]


def test_kmeans_matches_numpy_mirror(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from ligrust_ray.dataops.ann import (KMEANS_K, KMEANS_ROUNDS, PQ_SCALE,
                                         kmeans, md5_buckets)
    from ligrust_ray.pipelines.queries import _emb

    sf = "/root/testdata/sf0.001"
    got = kmeans(_emb(sf)).to_pandas().sort_values("vec_id")

    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.floor(np.stack(t.column("embedding").to_pylist())
                   .astype(np.float64) * PQ_SCALE).astype(np.int64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    a = md5_buckets(ids.astype(np.int64), KMEANS_K)
    for _ in range(KMEANS_ROUNDS):
        cids = np.unique(a)
        cent = np.stack([
            np.floor(mat[a == c].sum(axis=0).astype(np.float64)
                     / (a == c).sum()).astype(np.int64) for c in cids])
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = cids[np.argmin(d2, axis=1)]
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["cluster"].to_numpy() == a).all()
    # stability: a second engine run is bit-identical
    again = kmeans(_emb(sf)).to_pandas().sort_values("vec_id")
    assert (again["cluster"].to_numpy() == got["cluster"].to_numpy()).all()


def test_char_entropy_known_values():
    import math

    import numpy as np
    import pyarrow as pa

    from ligrust_ray.dataops.textstats import char_entropy_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": ["aaaa", "abab", "abcd", ""]})
    r = char_entropy_batch(t)
    got = dict(zip(r.column("doc_id").to_pylist(),
                   r.column("entropy_ubits").to_pylist()))
    # repeated char: H = 0; two chars 50/50: 1 bit; four distinct: 2 bits
    assert got[1] == 0
    assert got[2] == 1_000_000
    assert got[3] == 2_000_000
    assert 4 not in got          # empty doc emits no row
    # a non-uniform case against the closed form, term-by-term
    t2 = pa.table({"doc_id": pa.array([9], type=pa.int64()),
                   "text": ["aab"]})
    n, N = np.array([2, 1]), 3.0
    exp = int(sum(int(math.floor((c / N) * (math.log2(N) - math.log2(c))
                                 * 1e6 + 0.5)) for c in n))
    assert char_entropy_batch(t2).column("entropy_ubits")[0].as_py() == exp


def test_char_pair_counts_nul_safe():
    from collections import Counter

    from ligrust_ray.dataops.textstats import char_pair_counts_batch

    texts = ["a\x00b", "ab", "", "\x00\x00", "x"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    r = char_pair_counts_batch(t)
    got = dict(zip(r.column("pair").to_pylist(),
                   r.column("n").to_pylist()))
    exp = Counter()
    for s in texts:
        for i in range(len(s) - 1):
            exp[s[i:i + 2]] += 1
    assert got == dict(exp)


def test_orders_by_segment_distributed_path(ray_session, monkeypatch):
    """SEG_BROADCAST_MAX=0 forces the keyed agg_co_group plan; parity
    with the broadcast path on sf0.001 (r5 de-broadcast gate)."""
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    bcast = (Q.q_orders_by_segment(sf).to_pandas()
             .sort_values("mktsegment").reset_index(drop=True))
    monkeypatch.setattr(Q, "SEG_BROADCAST_MAX", 0)
    dist = (Q.q_orders_by_segment(sf).to_pandas()
            .sort_values("mktsegment").reset_index(drop=True))
    assert list(dist.columns) == list(bcast.columns)
    assert (dist["mktsegment"].to_numpy() == bcast["mktsegment"].to_numpy()).all()
    for c in ("n_orders", "revenue_cents"):
        np.testing.assert_array_equal(dist[c].to_numpy(dtype=np.int64),
                                      bcast[c].to_numpy(dtype=np.int64))


def test_multimodal_real_codecs():
    """stdlib PPM/BMP/WAV codecs round-trip; real stages decode, resize
    nearest-neighbor, and frame-split genuine payloads (r5)."""
    from ligrust_ray.dataops import multimodal as M

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert (M.decode_pnm(M.encode_ppm(img)) == img).all()
    assert (M.decode_bmp(M.encode_bmp(img)) == img).all()  # padded stride
    com = b"P6\n# comment\n17 13\n255\n" + img.tobytes()
    assert (M.decode_pnm(com) == img).all()
    st = rng.integers(-30000, 30000, (100, 2), dtype=np.int16)
    rate, back = M.decode_wav(M.encode_wav(st, 8000))
    assert rate == 8000 and (back == st).all()

    dec = M.DecodeStage(feature_dim=8, real=True)
    assert dec._decode_real(M.encode_ppm(img))[:2] == (17, 13)
    assert dec._decode_real(M.encode_bmp(img))[:2] == (17, 13)
    assert dec._decode_real(M.encode_wav(st))[:2] == (100, 2)
    with pytest.raises(NotImplementedError):
        dec._decode_real(b"\x89PNG\r\n\x1a\n")

    rz = M.ResizeStage(5, 7, real=True)
    out = M.decode_pnm(rz._resize_real(M.encode_bmp(img)))
    assert out.shape == (7, 5, 3)
    assert (out == M._resize_nearest(img, 5, 7)).all()

    fs = M.FrameSampleStage(4, real=True)
    mono = rng.integers(-30000, 30000, 333, dtype=np.int16)
    frames = fs._frames_real(M.encode_wav(mono, 8000))
    cat = np.concatenate([M.decode_wav(f)[1][:, 0] for f in frames])
    assert (cat == mono).all()           # lossless contiguous split
    stream = b"".join(M.encode_ppm(((img.astype(int) + i) % 256)
                                   .astype(np.uint8)) for i in range(7))
    picked = fs._frames_real(stream)
    assert len(picked) == 4
    assert (M.decode_pnm(picked[0]) == img).all()


def test_media_real_queries(ray_session):
    """media_*_real queries vs their closed-form oracles on sf0.001."""
    import duckdb

    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = (Q.q_media_resize_real(sf).to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    exp = duckdb.sql(
        "WITH d AS (SELECT doc_id, 8 + doc_id % 17 AS w, "
        "8 + doc_id % 13 AS h FROM "
        f"read_parquet('{sf}/documents.parquet') WHERE doc_id % 3 <> 2), "
        "j AS (SELECT CAST(UNNEST(range(2304)) AS BIGINT) AS j) "
        "SELECT d.doc_id AS media_id, "
        "CAST(SUM(((((j.j // 96 * d.h // 24) * d.w "
        "+ (j.j // 3 % 32) * d.w // 32) * 3 + j.j % 3) * 31 "
        "+ d.doc_id * 7) % 256) AS BIGINT) AS pix_sum "
        "FROM d CROSS JOIN j GROUP BY d.doc_id ORDER BY media_id").df()
    np.testing.assert_array_equal(got["pix_sum"].to_numpy(np.int64),
                                  exp["pix_sum"].to_numpy(np.int64))
    assert (got["width"] == 32).all() and (got["height"] == 24).all()


def test_late_window_watermark(ray_session):
    """Bounded-lateness watermark semantics (r5): a hand-built
    out-of-order stream where the late/accepted split is known, a
    python replay oracle on random data, and slab-boundary coverage."""
    from ligrust_ray.dataops import hashing, windows

    W = 3_600_000_000
    base = 1_700_000_000_000_000

    def run(eids, tss, vals, lateness, jitter, slab):
        t = pa.table({
            "event_id": pa.array(eids, type=pa.int64()),
            "ts": pa.array(np.array(tss, dtype="datetime64[us]")),
            "value": pa.array(vals, type=pa.float64())})
        return (windows.late_window_counts(
            ray.data.from_arrow(t), window_us=W, lateness_us=lateness,
            jitter_us=jitter, slab_us=slab).to_pandas()
            .sort_values("window_start_us").reset_index(drop=True))

    # python replay oracle over the same deterministic arrival rule
    def oracle(eids, tss, vals, lateness, jitter):
        h = np.array([hashing.md5_u64_lower(str(e).encode())
                      for e in eids], dtype=np.uint64)
        ts = np.asarray(tss, dtype=np.int64)
        arr = ts + (h % np.uint64(jitter)).astype(np.int64)
        cents = np.floor(np.asarray(vals) * 100 + 0.5).astype(np.int64)
        order = np.lexsort((np.asarray(eids), h, arr))
        res = {}
        run_max = None
        for i in order:
            late = run_max is not None and ts[i] < run_max - lateness
            w = (ts[i] // W) * W
            n, c, nl = res.get(w, (0, 0, 0))
            res[w] = (n + (not late), c + (0 if late else cents[i]),
                      nl + late)
            run_max = ts[i] if run_max is None else max(run_max, ts[i])
        return res

    rng = np.random.default_rng(11)
    n = 400
    eids = rng.permutation(n * 7)[:n].tolist()
    tss = (base + rng.integers(0, 40 * W, n)).tolist()
    vals = np.round(rng.uniform(0, 50, n), 2).tolist()
    for lateness, jitter, slab in [
            (900_000_000, 1_800_000_000, 6 * W),
            (60_000_000, 7_200_000_000, W),        # heavy drops
            (10**15, 1_800_000_000, 6 * W)]:       # nothing late
        got = run(eids, tss, vals, lateness, jitter, slab)
        exp = oracle(eids, tss, vals, lateness, jitter)
        assert len(got) == len(exp)
        for _, r in got.iterrows():
            en, ec, el = exp[int(r["window_start_us"])]
            assert (int(r["n_events"]), int(r["sum_value_cents"]),
                    int(r["n_late"])) == (en, ec, el)
    # totals conserve events
    got = run(eids, tss, vals, 900_000_000, 1_800_000_000, 6 * W)
    assert int(got["n_events"].sum() + got["n_late"].sum()) == n
    # lateness=inf accepts everything
    got_inf = run(eids, tss, vals, 10**15, 1_800_000_000, 6 * W)
    assert int(got_inf["n_late"].sum()) == 0


def test_window_panes_taxonomy(ray_session):
    """panes=True splits accepted events into on-time vs late-pane
    refinements consistently with the drop-mode output (r5)."""
    import duckdb

    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    drop = (Q.q_events_window_late(sf).to_pandas()
            .sort_values("window_start_us").reset_index(drop=True))
    panes = (Q.q_events_window_panes(sf).to_pandas()
             .sort_values("window_start_us").reset_index(drop=True))
    assert len(drop) == len(panes)
    np.testing.assert_array_equal(
        panes["n_on_time"].to_numpy() + panes["n_late_acc"].to_numpy(),
        drop["n_events"].to_numpy())
    np.testing.assert_array_equal(panes["n_dropped"].to_numpy(),
                                  drop["n_late"].to_numpy())
    np.testing.assert_array_equal(panes["sum_value_cents"].to_numpy(),
                                  drop["sum_value_cents"].to_numpy())


def test_semdedup_planted_near_dups(ray_session):
    """r5 SemDeDup: planted exact+perturbed duplicates are dropped with
    exactly one survivor per near-dup family on the deterministic
    priority tape; distinct vectors all survive (the sf corpora carry
    no cos>=0.9 pairs, so the drop path needs this fixture)."""
    from ligrust_ray.dataops import hashing
    from ligrust_ray.dataops.ann import PQ_SCALE, semdedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(12, 64)) * 0.3
    vecs = [base[i] for i in range(12)]
    ids = list(range(12))
    # family A: ids 12, 13 duplicate id 0 (one exact, one tiny-perturbed)
    vecs += [base[0].copy(), base[0] + 1e-4]
    ids += [12, 13]
    # family B: id 14 duplicates id 5
    vecs += [base[5] * 1.001]
    ids += [14]
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float64()))})
    out = (semdedup(ray.data.from_arrow(t), k=2, rounds=1)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert len(out) == 15
    kept = dict(zip(out["vec_id"], out["kept"]))
    clus = dict(zip(out["vec_id"], out["cluster"]))

    # numpy replica of the verdict rule (same grid, same tape)
    mat = np.floor(np.stack(vecs) * PQ_SCALE).astype(np.int64)
    n2 = (mat * mat).sum(axis=1)
    pk = np.array([hashing.md5_u64_lower(str(i).encode()) for i in ids],
                  dtype=np.uint64)
    exp = {}
    for i in range(15):
        dropped = False
        for j in range(15):
            if clus[ids[j]] != clus[ids[i]] or ids[j] == ids[i]:
                continue
            if not (pk[j] < pk[i] or (pk[j] == pk[i]
                                      and ids[j] < ids[i])):
                continue
            dot = int(mat[i] @ mat[j])
            if dot > 0 and dot * dot * 100 >= 81 * int(n2[i]) * int(n2[j]):
                dropped = True
                break
        exp[ids[i]] = 0 if dropped else 1
    assert kept == exp
    # families that co-cluster lose all but their tape-first member
    for fam in ([0, 12, 13], [5, 14]):
        if len({clus[v] for v in fam}) == 1:
            assert sum(kept[v] for v in fam) == 1


def test_top_component_dominant_direction(ray_session):
    """r5: the ppm power iteration recovers a planted dominant
    direction and is bit-identical across runs."""
    from ligrust_ray.dataops.ann import top_component

    rng = np.random.default_rng(9)
    d = 16
    main = np.zeros(d)
    main[3] = 1.0
    vecs = [(main * rng.uniform(0.5, 1.0)
             + rng.normal(size=d) * 0.02).tolist() for _ in range(200)]
    t = pa.table({
        "vec_id": pa.array(range(200), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float64()))})
    out = top_component(ray.data.from_arrow(t), rounds=4).to_pandas() \
        .sort_values("dim").reset_index(drop=True)
    lead = out["loading_ppm"].abs().idxmax()
    assert out.loc[lead, "dim"] == 3
    assert out.loc[lead, "loading_ppm"] > 500_000   # dominates the L1
    again = top_component(ray.data.from_arrow(t), rounds=4).to_pandas() \
        .sort_values("dim").reset_index(drop=True)
    assert (again["loading_ppm"].to_numpy()
            == out["loading_ppm"].to_numpy()).all()


def test_banded_interval_count_vs_brute(ray_session):
    """r5 range join: banded plan == brute-force interval counting on
    random points/intervals, including intervals spanning many bands,
    zero-length and out-of-range intervals."""
    from ligrust_ray.dataops.windows import banded_interval_count

    rng = np.random.default_rng(17)
    ts = rng.integers(0, 10**9, 3000).astype(np.int64)
    lo = rng.integers(-10**8, 10**9, 60).astype(np.int64)
    length = rng.integers(0, 4 * 10**8, 60).astype(np.int64)
    hi = lo + length
    owners = np.arange(60, dtype=np.int64)
    pts = ray.data.from_arrow(pa.table({"ts_us": pa.array(ts)}))
    iv = ray.data.from_arrow(pa.table({
        "owner": pa.array(owners), "lo": pa.array(lo),
        "hi": pa.array(hi)}))
    got = (banded_interval_count(pts, iv, band_us=10**8)
           .to_pandas().set_index("owner")["n_points"].to_dict())
    for o, a, b in zip(owners, lo, hi):
        exp = int(((ts >= a) & (ts < b)).sum())
        assert got.get(int(o), 0) == exp, (o, a, b)

"""Driver-contract query implementations (one per operator family; see
__ray_entry__.py for the DuckDB oracle SQL). Every callable takes ``sf_dir``
and returns a Dataset / pandas DataFrame / pyarrow Table.

The SQL-reproducible edge table is derived from the ``events`` table
(FIXTURES.md F7): ``src = user_id``,
``dst = CAST(FLOOR(value * 100) AS BIGINT) % 150`` — deterministic in both
engines (identical IEEE double arithmetic).
"""

from __future__ import annotations

import os
import re
import tempfile
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ligrust_ray.algos.bfs import bfs
from ligrust_ray.algos.cc import cc
from ligrust_ray.algos.labelprop import label_propagation
from ligrust_ray.algos.pagerank import page_rank_delta
from ligrust_ray.algos.triangles import triangle_count
from ligrust_ray.dataops import ann, dedup, multimodal, textstats
from ligrust_ray.pipelines.build import build_graph_from_edges, build_graph_from_pages
from ligrust_ray.sources.synth import generate_pages
from ligrust_ray.stages import shuffle
from ligrust_ray.state.graph import DistGraph

N_EVENT_NODES = 150          # dst domain: CAST(FLOOR(value*100) AS BIGINT) % 150

# explicit [\t\n\f\r ] class = RE2 \s parity (Python \s is Unicode-wide;
# the DuckDB oracles run RE2) — see textstats.RE2_WS
_WS_SPLIT = re.compile("[\t\n\f\r ]+")   # regexp_split_to_array(x, '\s+')
_WORD_RE = re.compile("[^\t\n\f\r ]+")   # regexp_extract_all(x, '\S+')

_EVENTS_N_CACHE: dict = {}


def _events_fp(sf_dir: str) -> tuple[int, int]:
    """Freshness fingerprint of this sf_dir's events table: (mtime_ns,
    size). Every events-derived cache below keys on it, so a long-lived
    session that regenerates data under the same path gets fresh
    artifacts instead of stale ones (and the stale entries are dropped,
    releasing their object-store blocks)."""
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    return (st.st_mtime_ns, st.st_size)


def _evict_stale(cache: dict, key: tuple) -> None:
    """Drop other entries of the same logical key (all but the trailing
    fingerprint element) — at most one generation per artifact stays."""
    for k in [k for k in cache if k[:-1] == key[:-1] and k != key]:
        del cache[k]


def clear_caches() -> None:
    """Explicit invalidation hook: forget every cached Dataset/graph
    artifact (wedges, walk corpora, loaded CSR graphs, events_n)."""
    _EVENTS_N_CACHE.clear()
    _WEDGE_CACHE.clear()
    _WALK_CACHE.clear()
    _GRAPH_CACHE.clear()
    _TRI_CACHE.clear()
    _LP_CACHE.clear()


def events_n(sf_dir: str) -> int:
    """Node-id domain of the events graph: max(user_id)+1 scales with sf
    (src = user_id is unbounded; dst is always < N_EVENT_NODES). Read from
    parquet row-group statistics — no data scan."""
    key = (sf_dir, _events_fp(sf_dir))
    if key not in _EVENTS_N_CACHE:
        import pyarrow.parquet as pq

        _evict_stale(_EVENTS_N_CACHE, key)
        f = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
        idx = f.schema_arrow.get_field_index("user_id")
        mx = max(f.metadata.row_group(i).column(idx).statistics.max
                 for i in range(f.metadata.num_row_groups))
        _EVENTS_N_CACHE[key] = max(int(mx) + 1, N_EVENT_NODES)
    return _EVENTS_N_CACHE[key]


def _events_rows(sf_dir: str) -> int:
    """events.parquet row count from file metadata — no data scan."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, "events.parquet")).metadata.num_rows


_BLOCK_TARGET_BYTES = 32 << 20   # ~32 MiB per block


def _read_sized(path: str, columns: list[str] | None = None,
                filter=None) -> ray.data.Dataset:
    """read_parquet with block count sized by BYTES, not cluster CPUs.

    Ray Data's default parallelism heuristic targets ~2-3 blocks per CPU,
    which turns a 2 MB table on a 32-CPU cluster into 64 blocks — every
    downstream groupby becomes a 64x64 shuffle of near-empty partitions. We
    cap blocks at ceil(file_bytes / 32MiB): at 100 TB this matches the
    default (thousands of blocks); at contract/test scale it collapses the
    shuffle to a handful of tasks.

    ``filter`` (a pyarrow.dataset expression) pushes row predicates INTO
    the scan: row groups whose statistics exclude the predicate are never
    read off storage — the prune-at-the-read rule for selective filters."""
    size = sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(path) for f in fs) \
        if os.path.isdir(path) else os.path.getsize(path)
    nblocks = max(1, -(-size // _BLOCK_TARGET_BYTES))
    kw = {} if filter is None else {"filter": filter}
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=nblocks, **kw)


def _events(sf_dir: str) -> ray.data.Dataset:
    return _read_sized(os.path.join(sf_dir, "events.parquet"),
                       columns=["user_id", "value"])


def _docs(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=columns)


def _emb(sf_dir: str) -> ray.data.Dataset:
    return _read_sized(os.path.join(sf_dir, "embeddings.parquet"))


def events_edges_ds(sf_dir: str) -> ray.data.Dataset:
    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        v = t.column("value").to_numpy()
        dst = (np.floor(v * 100).astype(np.int64)) % N_EVENT_NODES
        return pa.table({"src": pa.array(u), "dst": pa.array(dst)})

    return _events(sf_dir).map_batches(derive, batch_format="pyarrow")


# ---------------------------------------------------------------- graph ops
def q_events_edges(sf_dir: str):
    return events_edges_ds(sf_dir)


def q_events_hyperball(sf_dir: str):
    """(node_id, n_regs, rho_sum) — HyperBall t=2 out-ball HLL registers
    over the events graph (algos/hyperball.py), integer-exact vs the
    unrolled SQL oracle; the float |ball| estimator is pytest-checked
    against exact BFS ball sizes."""
    from ligrust_ray.algos.hyperball import hyperball_summary

    return hyperball_summary(events_edges_ds(sf_dir), t=2)


def q_events_out_degree(sf_dir: str):
    return shuffle.grouped_agg(events_edges_ds(sf_dir), ["src"],
                               {"out_degree": (None, "count")})


def q_events_strength(sf_dir: str):
    """(src, strength) — weighted out-degree (node strength) over the
    directed events multigraph with the DERIVED md5:32 edge weights
    (state/weights.py: weights are a pure function of (src, dst), never
    stored — the same spec the weighted edgeMap / Bellman-Ford run on).
    Per-batch DuckDB-vectorised weight eval (parity with the oracle by
    construction), one partial-combined grouped sum."""
    from ligrust_ray.state.weights import edge_weights

    def w(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        d = t.column("dst").to_numpy().astype(np.int64)
        return pa.table({"src": pa.array(s),
                         "w": pa.array(edge_weights("md5:32", s, d))})

    return shuffle.grouped_agg(
        events_edges_ds(sf_dir).map_batches(w, batch_format="pyarrow"),
        ["src"], {"strength": ("w", "sum")})


def q_events_degree_histogram(sf_dir: str):
    deg = q_events_out_degree(sf_dir).map_batches(
        lambda t: pa.table({"degree": t.column("out_degree")}),
        batch_format="pyarrow")
    return shuffle.grouped_agg(deg, ["degree"], {"n_nodes": (None, "count")})


def _distinct_edges(sf_dir: str) -> ray.data.Dataset:
    return shuffle.distinct(events_edges_ds(sf_dir), ["src", "dst"])


def q_events_butterflies(sf_dir: str):
    """(n_wedges, n_butterflies) — one-row exact census of the BIPARTITE
    user→item view of the events graph (src = user side, dst = item
    side: two distinct node types, so no symmetrization or self-loop
    rule applies). A butterfly = 2×2 biclique (two users sharing two
    items) — the bipartite clustering primitive (Sariyüce & Pinar
    2018); n_wedges = Σ_u C(d_u, 2) = Σ_{i<j} c_ij with c_ij = users
    adjacent to both items. Scale shape: per-user item-pair explode via
    one src-keyed grouped_apply (volume Σ C(d_u,2); the item side is
    the bounded domain here — cap or sample hub users at real scale),
    one (i,j)-keyed grouped count, then per-block partials fold on the
    driver (O(#blocks) rows)."""
    de = _distinct_edges(sf_dir)
    cols = ("i", "j")

    def pairs_fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                              for c in cols})
        if not len(df):
            return empty
        df = df.sort_values(["src", "dst"])
        s = df["src"].to_numpy()
        d = df["dst"].to_numpy().astype(np.int64)
        seg = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        sizes = np.diff(np.append(seg, len(s)))
        outs_i, outs_j = [], []
        for st, k in zip(seg, sizes):
            if k < 2:
                continue
            nb = d[st:st + k]        # distinct + sorted within a user
            i, j = np.triu_indices(int(k), 1)
            outs_i.append(nb[i])
            outs_j.append(nb[j])
        if not outs_i:
            return empty
        return pd.DataFrame({"i": np.concatenate(outs_i),
                             "j": np.concatenate(outs_j)})

    pairs = shuffle.grouped_apply(de, ["src"], pairs_fn)
    cij = shuffle.grouped_agg(pairs, ["i", "j"], {"c": (None, "count")})

    def part(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy().astype(np.int64)
        return pa.table({
            "n_wedges": pa.array([int(c.sum())], type=pa.int64()),
            "n_butterflies": pa.array([int((c * (c - 1) // 2).sum())],
                                      type=pa.int64())})

    parts = cij.map_batches(part, batch_format="pyarrow").to_pandas()
    return pa.table({
        "n_wedges": pa.array([int(parts["n_wedges"].sum())],
                             type=pa.int64()),
        "n_butterflies": pa.array([int(parts["n_butterflies"].sum())],
                                  type=pa.int64())})


def q_events_mutual_edges(sf_dir: str):
    """Count of unordered pairs {a,b}, a<b, with BOTH directions present.
    Fully distributed (general-graph safe, no broadcast of the edge set):
    each distinct non-loop edge canonicalises to its unordered pair, one
    grouped count per pair, and a pair is mutual iff it appears twice
    (the input is distinct, so twice == both directions). The driver sees
    only per-partition partial counts."""
    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        d = t.column("dst").to_numpy().astype(np.int64)
        keep = s != d
        return pa.table({"lo": pa.array(np.minimum(s[keep], d[keep])),
                         "hi": pa.array(np.maximum(s[keep], d[keep]))})

    per_pair = shuffle.grouped_agg(
        _distinct_edges(sf_dir).map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], {"n_dirs": (None, "count")})
    parts = per_pair.map_batches(
        lambda df: pd.DataFrame(
            {"n_mutual": [int((df["n_dirs"].to_numpy() == 2).sum())]}),
        batch_format="pandas").to_pandas()
    return pa.table({"n_mutual": pa.array([int(parts["n_mutual"].sum())],
                                          type=pa.int64())})


_TRI_CACHE: dict = {}


def _tri_cached(sf_dir: str) -> tuple[int, ray.data.Dataset]:
    """(total, per-node triangle Dataset) computed ONCE per events
    fingerprint — the triangle family (count, per-node, LCC, global
    clustering) consumes the SAME oriented-probe result, so sharing the
    materialized artifact removes three redundant wedge-probe passes per
    session (the _cn_wedges_cached pattern)."""
    key = (sf_dir, _events_fp(sf_dir))
    if key not in _TRI_CACHE:
        _evict_stale(_TRI_CACHE, key)
        total, pern = triangle_count(events_edges_ds(sf_dir),
                                     n=events_n(sf_dir), per_node=True)
        _TRI_CACHE[key] = (total, pern.materialize())
    return _TRI_CACHE[key]


def q_events_triangles(sf_dir: str):
    total, _ = _tri_cached(sf_dir)
    return pa.table({"n_triangles": pa.array([total], type=pa.int64())})


def q_events_triangles_per_node(sf_dir: str):
    """Per-node triangle participation counts (nonzero nodes only —
    triangle_count's per_node Dataset already contains exactly those)."""
    return _tri_cached(sf_dir)[1]


TEMPORAL_SQL_ROUNDS = 8   # unroll depth of the DuckDB oracle = round cap


def q_events_temporal_bfs(sf_dir: str):
    """(node_id, arrival_us) — time-respecting earliest arrival from node
    0 over the TEMPORAL events multigraph (each event row is an edge
    usable only at its own timestamp; a path must have non-decreasing
    edge times — algos/temporal.py, Wu et al. VLDB 2014). Exactly
    TEMPORAL_SQL_ROUNDS synchronous relaxation rounds on both engines
    (the PPR fixed-round pattern: extra rounds are no-ops at fixpoint,
    so engine and oracle agree bit-for-bit regardless of convergence
    depth). Only reached nodes emit rows; the source departs 'before
    time' (arrival -1). Timestamps are integer epoch microseconds —
    the relaxation is exact integer arithmetic end to end."""
    from ligrust_ray.algos.temporal import earliest_arrival

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        v = t.column("value").to_numpy()
        dst = (np.floor(v * 100).astype(np.int64)) % N_EVENT_NODES
        ts = t.column("ts").cast(pa.int64())   # timestamp[us] -> epoch us
        return pa.table({"src": pa.array(u), "dst": pa.array(dst),
                         "t": ts})

    edges = _read_sized(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "value", "ts"]).map_batches(
            derive, batch_format="pyarrow")
    arr = earliest_arrival(edges, source=0, rounds=TEMPORAL_SQL_ROUNDS)
    return arr.map_batches(
        lambda t: pa.table({"node_id": t.column("node"),
                            "arrival_us": t.column("arr")}),
        batch_format="pyarrow")


DOULION_DEN = 4   # keep probability p = 1/4 -> estimate scale 1/p^3 = 64


def q_events_triangles_doulion(sf_dir: str):
    """(n_sampled_triangles, est_triangles) — DOULION approximate triangle
    counting (Tsourakakis et al., KDD 2009): sparsify the undirected graph
    by keeping each edge with probability p, count triangles on the
    sample, scale by 1/p^3. The coin is DETERMINISTIC — keep iff
    md5_number_lower("lo,hi") % DOULION_DEN == 0 on the canonical
    unordered pair — so both directions of an edge get the same decision,
    the run is reproducible, and the DuckDB oracle replays it exactly.
    At p=1/4 the exact-count stage sees ~1/4 of the edges and ~1/64 of
    the wedge-probe work; the estimator's variance bound is the paper's.
    Scale shape: the filter is a stateless vectorised map on the edge
    stream (one DuckDB-backed md5 call per batch), everything after is
    the existing bucketed triangle machinery on a 4x smaller graph."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow
    from ligrust_ray.algos.triangles import triangle_count

    def sample(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        d = t.column("dst").to_numpy().astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        key = pc.binary_join_element_wise(
            pc.cast(pa.array(lo), pa.string()),
            pc.cast(pa.array(hi), pa.string()), ",")
        keep = (md5_u64_lower_arrow(key) % DOULION_DEN) == 0
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    sampled = events_edges_ds(sf_dir).map_batches(
        sample, batch_format="pyarrow")
    t_s = triangle_count(sampled, n=events_n(sf_dir))
    scale = DOULION_DEN ** 3
    return pa.table({
        "n_sampled_triangles": pa.array([t_s], type=pa.int64()),
        "est_triangles": pa.array([t_s * scale], type=pa.int64())})


WALKS_SQL_LENGTH = 4   # unroll depth of the DuckDB oracle = walk length


def q_events_walks(sf_dir: str):
    """(start, step, node) — one deterministic 4-step random walk per node
    of the distinct directed events graph (algos/walks.py): next hop =
    neighbor at index hash(start, cur, step) % outdeg in dst-ascending
    order; dead ends terminate. The SQL oracle unrolls the identical 4
    chooser joins. The corpus is the shared _walks_cached artifact."""
    w = _walks_cached(sf_dir)
    return w.select_columns(["start", "step", "node"])   # wid == 0 at W=1


def q_events_walks_nb(sf_dir: str):
    """(start, step, node) — the no-backtrack (node2vec-style second
    order) walk corpus: the predecessor is excluded from the candidate
    set, chooser re-indexes the remaining neighbors in dst order. The
    SQL oracle re-ranks with a filtered ROW_NUMBER per step."""
    w = _walks_cached(sf_dir, no_backtrack=True)
    return w.select_columns(["start", "step", "node"])   # wid == 0 at W=1


def q_events_walk_vocab(sf_dir: str):
    """(node, n) — visit counts over the walk corpus (the unigram table a
    word2vec negative sampler draws from; distribution^0.75 is a trivial
    post-step on these integers). One grouped count over the shared
    _walks_cached corpus."""
    w = _walks_cached(sf_dir)
    counts = shuffle.grouped_agg(w, ["node"], {"n": (None, "count")})
    return counts.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.int64()),
                            "n": t.column("n").cast(pa.int64())}),
        batch_format="pyarrow")


HOLDOUT_PCT = 10


def q_events_edge_holdout(sf_dir: str):
    """(src, dst) — the deterministic link-prediction holdout split:
    distinct directed edges whose chooser hash lands below HOLDOUT_PCT%
    (the hash is the random tape; the complementary train set is the
    same filter negated, reproducible on any cluster size). Stateless
    per-batch filter after the one distinct shuffle."""
    from ligrust_ray.algos.walks import _A, _B

    e = shuffle.distinct(events_edges_ds(sf_dir), ["src", "dst"])

    def keep(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        d = t.column("dst").to_numpy().astype(np.int64)
        h = (s * _A + d * _B) % (1 << 32)
        return t.filter(pa.array(h % 100 < HOLDOUT_PCT))

    return e.map_batches(keep, batch_format="pyarrow")


def q_events_skipgrams(sf_dir: str):
    """(center, context, n) word2vec training pairs of the events walk
    corpus (walks.skipgram_pairs over the shared _walks_cached corpus,
    window 2) — skipgram cost is just its own two shuffles once the
    corpus artifact is warm."""
    from ligrust_ray.algos.walks import skipgram_pairs

    return skipgram_pairs(_walks_cached(sf_dir))


NS_K = 3    # sampled out-neighbors per source


def q_events_neighbor_sample(sf_dir: str):
    """(src, dst, rnk) — GraphSAGE-style deterministic neighbor sampling
    over the DISTINCT directed events graph: up to NS_K out-neighbors per
    source, ranked by the walk-family chooser hash
    (src*2654435761 + dst*40503) % 2^32 with dst tiebreak (the hash IS
    the random tape — reproducible on any cluster size, replicated
    verbatim in the SQL oracle). Scale shape: per-BATCH partial top-K per
    src bounds shuffle volume at K rows per src per block; one
    grouped_apply finishes and ranks."""
    from ligrust_ray.algos.walks import _A, _B

    e = shuffle.distinct(events_edges_ds(sf_dir), ["src", "dst"])

    def _key(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["src"].to_numpy(np.int64) * _A
             + df["dst"].to_numpy(np.int64) * _B) % (1 << 32)
        return df.assign(__h=h).sort_values(["src", "__h", "dst"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            # __h stays int64 on BOTH branches (h < 2^32 fits): a
            # uint64/int64 empty-vs-nonempty split would give mixed
            # Arrow block schemas
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("src", "dst", "__h")})
        return _key(df).groupby("src", sort=False).head(NS_K) \
            [["src", "dst", "__h"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("src", "dst", "rnk")})
        df = _key(df).groupby("src", sort=False).head(NS_K)
        rnk = df.groupby("src", sort=False).cumcount().to_numpy() + 1
        return pd.DataFrame({"src": df["src"].to_numpy(np.int64),
                             "dst": df["dst"].to_numpy(np.int64),
                             "rnk": rnk.astype(np.int64)})

    return shuffle.grouped_apply(e, ["src"], final, pre=topk)


TRUSS_SQL_ROUNDS = 16   # unroll depth of the DuckDB oracle = engine cap


def q_events_truss(sf_dir: str):
    """(a, b, died_round) truss peel of the canonical undirected simple
    events graph (algos/truss.py): threshold = lower median of initial
    per-edge triangle supports, TRUSS_SQL_ROUNDS synchronous peel rounds,
    died_round = 0 for survivors. The SQL oracle unrolls the identical
    rounds (surplus rounds after the fixed point are no-ops on both
    sides)."""
    from ligrust_ray.algos.truss import truss_peel

    return truss_peel(events_edges_ds(sf_dir), rounds=TRUSS_SQL_ROUNDS)


def _und_pairs(sf_dir: str) -> ray.data.Dataset:
    """Distinct undirected non-loop pairs (lo < hi) of the events graph."""
    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        d = t.column("dst").to_numpy().astype(np.int64)
        keep = s != d
        return pa.table({"lo": pa.array(np.minimum(s[keep], d[keep])),
                         "hi": pa.array(np.maximum(s[keep], d[keep]))})

    return shuffle.distinct(
        events_edges_ds(sf_dir).map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"])


def _sym_simple(sf_dir: str) -> ray.data.Dataset:
    """Both directions of the simple undirected events graph: (v, w)."""
    def both(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy()
        hi = t.column("hi").to_numpy()
        return pa.table({"v": pa.array(np.concatenate([lo, hi])),
                         "w": pa.array(np.concatenate([hi, lo]))})

    return _und_pairs(sf_dir).map_batches(both, batch_format="pyarrow")


def _simple_degree(sf_dir: str) -> ray.data.Dataset:
    """(node_id, degree) over the simple undirected events graph."""
    deg = shuffle.grouped_agg(_sym_simple(sf_dir), ["v"],
                              {"degree": (None, "count")})
    return deg.map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "degree": t.column("degree")}),
        batch_format="pyarrow")


def q_events_powerlaw(sf_dir: str):
    """(n_tail, sum_ln_upm, alpha_ppm) — one-row continuous power-law
    exponent MLE over the simple undirected degree distribution
    (Clauset-Shalizi-Newman 2009 eq. 3.1 with dmin = 1): alpha = 1 +
    n / Σ ln(d) over nodes with degree >= 1. The per-degree ln term is
    the integer micro-unit fixed point floor(ln(d)*1e6 + 0.5) (the
    Adamic-Adar LN-parity convention), summed EXACTLY from the bounded
    degree histogram; the final division is integer half-up, so the
    whole row is hash-exact. Only distinct-degree rows reach the
    driver."""
    hist = shuffle.grouped_agg(_simple_degree(sf_dir), ["degree"],
                               {"cnt": (None, "count")}).to_pandas()
    d = hist["degree"].to_numpy(np.int64)
    c = hist["cnt"].to_numpy(np.int64)
    keep = d >= 1
    n_tail = int(c[keep].sum())
    terms = np.floor(np.log(d[keep].astype(np.float64)) * 1e6
                     + 0.5).astype(np.int64)
    s = int((terms * c[keep]).sum())
    alpha_ppm = (1_000_000
                 + (2 * n_tail * 10**12 + s) // (2 * s)) if s else 0
    return pa.table({
        "n_tail": pa.array([n_tail], type=pa.int64()),
        "sum_ln_upm": pa.array([s], type=pa.int64()),
        "alpha_ppm": pa.array([int(alpha_ppm)], type=pa.int64())})


def q_events_graph_stats(sf_dir: str):
    """One-row summary of the raw directed events multigraph: edge count,
    distinct-edge count, self-loops, distinct sources, max out-degree.
    Everything is a per-block partial folded on the driver (O(#blocks)
    tiny rows — no full materialisation)."""
    e = events_edges_ds(sf_dir)

    def raw_part(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table({"n_edges": pa.array([len(s)], type=pa.int64()),
                         "n_self_loops": pa.array([int((s == d).sum())],
                                                  type=pa.int64())})

    raw = e.map_batches(raw_part, batch_format="pyarrow").to_pandas()
    dist = shuffle.distinct(e, ["src", "dst"]).map_batches(
        lambda t: pa.table({"c": pa.array([t.num_rows], type=pa.int64())}),
        batch_format="pyarrow").to_pandas()

    def od_part(t: pa.Table) -> pa.Table:
        od = t.column("out_degree").to_numpy()
        return pa.table({
            "n": pa.array([t.num_rows], type=pa.int64()),
            "mx": pa.array([int(od.max()) if len(od) else 0],
                           type=pa.int64())})

    od = q_events_out_degree(sf_dir).map_batches(
        od_part, batch_format="pyarrow").to_pandas()
    return pa.table({
        "n_edges": pa.array([int(raw["n_edges"].sum())], type=pa.int64()),
        "n_distinct_edges": pa.array([int(dist["c"].sum())],
                                     type=pa.int64()),
        "n_self_loops": pa.array([int(raw["n_self_loops"].sum())],
                                 type=pa.int64()),
        "n_src_nodes": pa.array([int(od["n"].sum())], type=pa.int64()),
        "max_out_degree": pa.array([int(od["mx"].max()) if len(od) else 0],
                                   type=pa.int64())})


def q_events_degree_mixing(sf_dir: str):
    """(bx, by, n_pairs) — the degree-mixing (joint degree) matrix over
    the simple undirected events graph in log2 buckets: for every
    directed pair (v, w) of the symmetrized edge set, bx =
    floor(log2 deg(v)), by = floor(log2 deg(w)). The bucketed matrix is
    the standard web-graph degree-correlation readout (assortativity's
    one Pearson number compresses exactly this table). log2 of an exact
    power of two is exact in IEEE double and the floor is unambiguous
    everywhere else, so the integer buckets match DuckDB bit-for-bit.
    Same two co-partitioned hash_joins as events_assortativity (degree
    table n-sized, never broadcast), one partial-combined grouped count;
    the shared sym edge set is materialized once and feeds both the
    degree aggregate and the pair stream."""
    sym0 = _sym_simple(sf_dir).materialize()
    deg = shuffle.grouped_agg(sym0, ["v"],
                              {"degree": (None, "count")}).map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "degree": t.column("degree")}),
        batch_format="pyarrow")
    sym = sym0.map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "w": t.column("w")}),
        batch_format="pyarrow")
    j1 = shuffle.hash_join(sym, deg, on="node_id",
                           l_cols=["w"], r_cols=["degree"]).map_batches(
        lambda t: pa.table({
            "node_id": t.column("w"),
            "bx": pa.array(np.floor(np.log2(
                t.column("degree").to_numpy().astype(np.float64)))
                .astype(np.int64))}),
        batch_format="pyarrow")
    j2 = shuffle.hash_join(j1, deg, on="node_id",
                           l_cols=["bx"], r_cols=["degree"]).map_batches(
        lambda t: pa.table({
            "bx": t.column("bx"),
            "by": pa.array(np.floor(np.log2(
                t.column("degree").to_numpy().astype(np.float64)))
                .astype(np.int64))}),
        batch_format="pyarrow")
    return shuffle.grouped_agg(j2, ["bx", "by"],
                               {"n_pairs": (None, "count")})


def q_events_multiplicity(sf_dir: str):
    """(multiplicity, n_edges) — parallel-edge census of the directed
    events multigraph: how many distinct (src, dst) pairs occur exactly
    m times (self-loops included; m = 1 is the simple-edge mass). The
    multigraph-vs-simple-graph gap this table measures decides whether
    an engine must deduplicate before triangle/k-core style algorithms.
    Two partial-combined grouped counts, nothing else."""
    per_edge = shuffle.grouped_agg(events_edges_ds(sf_dir),
                                   ["src", "dst"],
                                   {"multiplicity": (None, "count")})
    return shuffle.grouped_agg(per_edge, ["multiplicity"],
                               {"n_edges": (None, "count")})


def q_events_assortativity(sf_dir: str):
    """One-row exact integer moment sums for degree assortativity
    (Newman 2002) over the simple undirected events graph: for every
    directed pair (v, w) of the symmetrized edge set, x = deg(v),
    y = deg(w); emits (n_pairs, sum_x, sum_y, sum_xy, sum_x2, sum_y2) —
    the Pearson correlation is a trivial driver-side formula over these
    six numbers, but keeping the OUTPUT integral makes the DuckDB hash
    compare exact (no float summation order). Two hash_joins attach the
    endpoint degrees (the degree table is n-sized — co-partitioned, not
    broadcast), then per-block partials fold on the driver (O(#blocks)
    tiny rows). The symmetric edge set is built ONCE (materialized) and
    feeds both the degree aggregate and the pair stream — not two
    independent distinct shuffles."""
    sym0 = _sym_simple(sf_dir).materialize()
    deg = shuffle.grouped_agg(sym0, ["v"],
                              {"degree": (None, "count")}).map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "degree": t.column("degree")}),
        batch_format="pyarrow")
    sym = sym0.map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "w": t.column("w")}),
        batch_format="pyarrow")
    j1 = shuffle.hash_join(sym, deg, on="node_id",
                           l_cols=["w"], r_cols=["degree"]).map_batches(
        lambda t: pa.table({"node_id": t.column("w"),
                            "x": t.column("degree")}),
        batch_format="pyarrow")
    deg_y = deg.map_batches(
        lambda t: pa.table({"node_id": t.column("node_id"),
                            "y": t.column("degree")}),
        batch_format="pyarrow")
    j2 = shuffle.hash_join(j1, deg_y, on="node_id",
                           l_cols=["x"], r_cols=["y"])

    def part(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        return pa.table({
            "n_pairs": pa.array([len(x)], type=pa.int64()),
            "sum_x": pa.array([int(x.sum())], type=pa.int64()),
            "sum_y": pa.array([int(y.sum())], type=pa.int64()),
            "sum_xy": pa.array([int((x * y).sum())], type=pa.int64()),
            "sum_x2": pa.array([int((x * x).sum())], type=pa.int64()),
            "sum_y2": pa.array([int((y * y).sum())], type=pa.int64())})

    p = j2.map_batches(part, batch_format="pyarrow").to_pandas()
    return pa.table({c: pa.array([int(p[c].sum())], type=pa.int64())
                     for c in ("n_pairs", "sum_x", "sum_y", "sum_xy",
                               "sum_x2", "sum_y2")})


def q_events_global_clustering(sf_dir: str):
    """One-row (n_wedges, n_triangles, closed_permille) — the global
    clustering coefficient's exact integer ingredients over the simple
    undirected events graph: n_wedges = sum over nodes of C(deg, 2)
    (per-block partials of the degree Dataset folded on the driver),
    n_triangles from the oriented-probe counter, closed_permille =
    (3 * T * 1000) // W. Complements q_events_lcc (per-node local
    coefficient) with the corpus-level transitivity number."""
    def part(t: pa.Table) -> pa.Table:
        d = t.column("degree").to_numpy().astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())],
                                       type=pa.int64())})

    w = int(_simple_degree(sf_dir).map_batches(
        part, batch_format="pyarrow").to_pandas()["w"].sum())
    tri = q_events_triangles(sf_dir)
    tri = tri.to_pandas() if hasattr(tri, "to_pandas") else tri
    t3 = int(tri["n_triangles"][0])
    return pa.table({
        "n_wedges": pa.array([w], type=pa.int64()),
        "n_triangles": pa.array([t3], type=pa.int64()),
        "closed_permille": pa.array([(3 * t3 * 1000) // w if w else 0],
                                    type=pa.int64())})


def q_events_lcc(sf_dir: str):
    """(node_id, degree, triangles, lcc_ppm) local clustering coefficient
    over nodes of the simple undirected events graph (degree >= 1):
    lcc_ppm = (2 * T * 1e6) // (deg * (deg - 1)), 0 when deg < 2 — integer
    division on both sides, so the hash compare is exact. Degrees and
    per-node triangle counts are both Datasets joined by one co_group;
    nothing n-length touches the driver."""
    deg = _simple_degree(sf_dir)
    _, tri = _tri_cached(sf_dir)

    def lcc_fn(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.merge(rf, on="node_id", how="left")
        t = j["triangles"].fillna(0).astype(np.int64).to_numpy()
        d = j["degree"].to_numpy().astype(np.int64)
        denom = d * (d - 1)
        lcc = np.where(denom > 0,
                       (2 * t * 1_000_000) // np.where(denom > 0, denom, 1),
                       0).astype(np.int64)
        return pd.DataFrame({
            "node_id": j["node_id"].to_numpy().astype(np.int64),
            "degree": d, "triangles": t, "lcc_ppm": lcc})

    i64 = pa.int64()
    return shuffle.co_group(
        deg, tri, "node_id", "node_id", lcc_fn,
        l_schema=pa.schema([("node_id", i64), ("degree", i64)]),
        r_schema=pa.schema([("node_id", i64), ("triangles", i64)]))


CN_DEGREE_CAP = 500    # hub filter: only centers (= the common neighbour
                       # itself) below this degree generate wedges
CN_MIN_COMMON = 2


RA_SCALE = 1_000_000_000   # resource-allocation weight = RA_SCALE // deg(v)
AA_SCALE = 1_000_000       # Adamic-Adar weight = round(AA_SCALE / ln deg(v))


def _cn_wedges(sf_dir: str, with_score: bool) -> ray.data.Dataset:
    """Shared wedge generator for the link-prediction family: for every
    low-degree center v (degree <= CN_DEGREE_CAP), all unordered neighbour
    pairs (a < b). With ``with_score`` each wedge also carries the
    resource-allocation term RA_SCALE // deg(v) (integer division — exact
    in SQL too). Wedge volume is bounded by sum over capped centers of
    deg^2 (the standard hub filter)."""
    sym = _sym_simple(sf_dir)
    low_deg = _simple_degree(sf_dir).map_batches(
        lambda t: t.filter(
            pc.less_equal(t.column("degree"), CN_DEGREE_CAP)),
        batch_format="pyarrow")
    # keep only wedges whose CENTER v is low-degree
    low = shuffle.hash_join(
        sym.map_batches(lambda t: pa.table({"node_id": t.column("v"),
                                            "w": t.column("w")}),
                        batch_format="pyarrow"),
        low_deg, on="node_id", l_cols=["w"], r_cols=["degree"])

    out_cols = ["a", "b"] + (["ra", "aa"] if with_score else [])

    def pairs_fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                              for c in out_cols})
        if not len(df):
            return empty
        df = df.sort_values(["node_id", "w"])
        v = df["node_id"].to_numpy()
        w = df["w"].to_numpy().astype(np.int64)
        deg = df["degree"].to_numpy().astype(np.int64)
        seg = np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))
        sizes = np.diff(np.append(seg, len(v)))
        outs: dict[str, list[np.ndarray]] = {c: [] for c in out_cols}
        for s, k in zip(seg, sizes):
            if k < 2:
                continue
            nb = w[s:s + k]          # unique + sorted within a group
            i, j = np.triu_indices(int(k), 1)
            outs["a"].append(nb[i])
            outs["b"].append(nb[j])
            if with_score:
                outs["ra"].append(np.full(len(i), RA_SCALE // deg[s],
                                          dtype=np.int64))
                # Adamic-Adar term: round-half-up fixed point of
                # AA_SCALE/ln(deg). IEEE-double parity with DuckDB's
                # LN verified exhaustively for deg 2..100000 in
                # tests/test_properties.py (deg >= 2 here: k >= 2)
                outs["aa"].append(np.full(
                    len(i),
                    int(np.floor(AA_SCALE / np.log(float(deg[s])) + 0.5)),
                    dtype=np.int64))
        if not outs["a"]:
            return empty
        return pd.DataFrame({c: np.concatenate(v) for c, v in outs.items()})

    return shuffle.grouped_apply(low, ["node_id"], pairs_fn)


_WEDGE_CACHE: dict = {}
_WALK_CACHE: dict = {}


def _cn_wedges_cached(sf_dir: str) -> ray.data.Dataset:
    """Materialized scored wedge set, shared by the link-prediction family
    (q_events_common_neighbors and q_events_link_pred consume the SAME
    wedges; the scored variant is a superset — one extra int64 column).
    Computing it once halves the combined cost; the blocks live in the
    object store like the graph artifacts in _GRAPH_CACHE. Keyed on the
    events fingerprint — regenerated data invalidates, stale blocks drop."""
    key = (sf_dir, _events_fp(sf_dir))
    if key not in _WEDGE_CACHE:
        _evict_stale(_WEDGE_CACHE, key)
        _WEDGE_CACHE[key] = _cn_wedges(sf_dir,
                                       with_score=True).materialize()
    return _WEDGE_CACHE[key]


def _walks_cached(sf_dir: str, no_backtrack: bool = False
                  ) -> ray.data.Dataset:
    """Materialized walk corpus, shared by the embedding front-end family
    (q_events_walks / q_events_walk_vocab / q_events_skipgrams consume
    the SAME corpus; q_events_walks_nb is the no-backtrack twin) — the
    _cn_wedges_cached pattern: generate once per (sf_dir, variant,
    events fingerprint), let downstream queries pay only their own
    shuffles."""
    from ligrust_ray.algos.walks import random_walks

    key = (sf_dir, no_backtrack, _events_fp(sf_dir))
    if key not in _WALK_CACHE:
        _evict_stale(_WALK_CACHE, key)
        _WALK_CACHE[key] = random_walks(
            events_edges_ds(sf_dir), length=WALKS_SQL_LENGTH,
            no_backtrack=no_backtrack).materialize()
    return _WALK_CACHE[key]


def q_events_onion(sf_dir: str):
    """(node_id, layer, core) — onion decomposition of the simple
    undirected events graph (algos/onion.py): synchronous degeneracy
    peeling where each round removes every node at or below the running
    core threshold; layer = removal round (centre-vs-periphery depth),
    core = the node's k-core number."""
    from ligrust_ray.algos.onion import ONION_SQL_ROUNDS, onion_layers

    return onion_layers(_und_pairs(sf_dir), rounds=ONION_SQL_ROUNDS)


def q_events_rich_club(sf_dir: str):
    """(k, n_nodes, n_edges, phi_ppm) — rich-club coefficient curve
    (Colizza et al. 2006) over the simple undirected events graph: for
    every degree threshold k in [0, max_degree), the subgraph induced by
    nodes of degree > k has n_nodes nodes and n_edges edges, and phi =
    2E/(N(N-1)) rendered as exact integer ppm. Rows where n_nodes < 2
    are dropped (phi undefined). Scale shape: the curve needs only two
    SMALL histograms — the node-degree histogram and the per-edge
    min-endpoint-degree histogram (two hash_joins attach endpoint
    degrees, one grouped count each) — suffix sums over #distinct-degree
    rows finish on the driver; the node/edge tables themselves never
    leave the cluster."""
    deg = _simple_degree(sf_dir)
    dh = shuffle.grouped_agg(deg, ["degree"],
                             {"cnt": (None, "count")}).to_pandas()
    cols = ("k", "n_nodes", "n_edges", "phi_ppm")
    if not len(dh):
        return pa.table({c: pa.array([], type=pa.int64()) for c in cols})

    pairs = _und_pairs(sf_dir)
    j1 = shuffle.hash_join(
        pairs.map_batches(
            lambda t: pa.table({"node_id": t.column("lo"),
                                "other": t.column("hi")}),
            batch_format="pyarrow"),
        deg, on="node_id", l_cols=["other"], r_cols=["degree"])
    j2 = shuffle.hash_join(
        j1.map_batches(
            lambda t: pa.table({"node_id": t.column("other"),
                                "da": t.column("degree")}),
            batch_format="pyarrow"),
        deg, on="node_id", l_cols=["da"], r_cols=["degree"])
    mh = shuffle.grouped_agg(
        j2.map_batches(
            lambda t: pa.table({"md": pc.min_element_wise(
                t.column("da").cast(pa.int64()),
                t.column("degree").cast(pa.int64()))}),
            batch_format="pyarrow"),
        ["md"], {"cnt": (None, "count")}).to_pandas()

    max_d = int(dh["degree"].max())
    dcnt = np.zeros(max_d + 1, dtype=np.int64)
    dcnt[dh["degree"].to_numpy(dtype=np.int64)] = \
        dh["cnt"].to_numpy(dtype=np.int64)
    ecnt = np.zeros(max_d + 1, dtype=np.int64)
    if len(mh):
        ecnt[mh["md"].to_numpy(dtype=np.int64)] = \
            mh["cnt"].to_numpy(dtype=np.int64)
    # suffix sums: N_k / E_k = counts with degree / min-degree > k
    nsuf = np.cumsum(dcnt[::-1])[::-1]
    esuf = np.cumsum(ecnt[::-1])[::-1]
    ks = np.arange(0, max_d, dtype=np.int64)
    n_k = nsuf[ks + 1]
    e_k = esuf[ks + 1]
    keep = n_k >= 2
    ks, n_k, e_k = ks[keep], n_k[keep], e_k[keep]
    phi = (2 * e_k * 1_000_000) // (n_k * (n_k - 1))
    return pa.table({"k": pa.array(ks), "n_nodes": pa.array(n_k),
                     "n_edges": pa.array(e_k), "phi_ppm": pa.array(phi)})


def _wl_round(sym: ray.data.Dataset, colors: ray.data.Dataset
              ) -> ray.data.Dataset:
    """One Weisfeiler-Lehman refinement round over (v, w) sym edges:
    new_color(v) = md5("{color_v}|{S_v}") with S_v = Σ_{w∈N(v)}
    md5(str(color_w)) wrapped mod 2^64. The wrapped SUM is an
    order-independent multiset hash, so the neighbor aggregation is a
    plain combiner-friendly grouped sum — a hub never builds the
    O(degree) sorted signature string classic WL would need (Arrow's
    int64 group_by sum wraps two's-complement = mod 2^64, same as
    DuckDB HUGEINT % 2^64 in the oracle)."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    def hashed(t: pa.Table) -> pa.Table:
        h = md5_u64_lower_arrow(
            pc.cast(t.column("color"), pa.string()).combine_chunks()
        ).astype(np.int64)
        return pa.table({"node_id": t.column("node_id"),
                         "hc": pa.array(h)})

    nbh = colors.map_batches(hashed, batch_format="pyarrow")
    j = shuffle.hash_join(
        sym.map_batches(
            lambda t: pa.table({"node_id": t.column("w"),
                                "v": t.column("v")}),
            batch_format="pyarrow"),
        nbh, on="node_id", l_cols=["v"], r_cols=["hc"])
    sm = shuffle.grouped_agg(
        j.map_batches(lambda t: pa.table({"node_id": t.column("v"),
                                          "hc": t.column("hc")}),
                      batch_format="pyarrow"),
        ["node_id"], {"sm": ("hc", "sum")})
    sig = shuffle.hash_join(sm, colors, on="node_id",
                            l_cols=["sm"], r_cols=["color"])

    def fin(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pc.cast(t.column("color"), pa.string()),
            pc.cast(t.column("sm"), pa.string()), "|")
        h = md5_u64_lower_arrow(s.combine_chunks()).astype(np.int64)
        return pa.table({"node_id": t.column("node_id"),
                         "color": pa.array(h)})

    return sig.map_batches(fin, batch_format="pyarrow")


WL_LOCAL_GATE = 1 << 22


@ray.remote(num_cpus=1)
def _wl_colors_task(blocks: list) -> pa.Table:
    """Single-task replica of the two _wl_round passes (identical hash
    spec: signed-int64 string rendering, wrapped int64 multiset sum,
    md5('{color}|{sum}')); numpy int64 addition wraps two's-complement
    exactly like Arrow's group_by sum."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    esch = pa.schema([("v", pa.int64()), ("w", pa.int64())])
    ts = []
    for b in ray.get(list(blocks)):
        t = (pa.Table.from_pandas(b, preserve_index=False)
             if isinstance(b, pd.DataFrame) else b)
        if t.num_columns:
            ts.append(t.select(["v", "w"]).cast(esch))
    sym = pa.concat_tables(ts) if ts else esch.empty_table()
    v = sym.column("v").to_numpy().astype(np.int64)
    w = sym.column("w").to_numpy().astype(np.int64)
    nodes, inv_v = np.unique(v, return_inverse=True)
    color = np.bincount(inv_v).astype(np.int64)     # round-0 = degree
    w_idx = np.searchsorted(nodes, w)
    outs = []
    for _ in range(2):
        hc = md5_u64_lower_arrow(
            pc.cast(pa.array(color), pa.string())).astype(np.int64)
        s = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(s, inv_v, hc[w_idx])
        sig = pc.binary_join_element_wise(
            pc.cast(pa.array(color), pa.string()),
            pc.cast(pa.array(s), pa.string()), "|")
        color = md5_u64_lower_arrow(sig).astype(np.int64)
        outs.append(color.copy())
    return pa.table({"node_id": pa.array(nodes),
                     "wl1": pa.array(outs[0]),
                     "wl2": pa.array(outs[1])})


def q_events_wl_colors(sf_dir: str, mode: str = "auto"):
    """(node_id, wl1, wl2) — two rounds of 1-WL color refinement
    (Weisfeiler-Leman graph fingerprinting; the kernel behind WL graph
    kernels and GIN expressiveness) over the simple undirected events
    graph. Round-0 color = degree; each round rehashes (own color,
    neighbor-color multiset). Nodes with identical wl2 have isomorphic
    2-hop unrolling trees (up to hash collision). Scale shape: per round
    one edge-keyed hash_join + one combiner-friendly grouped sum + one
    node-keyed join — state is one row per node, and the multiset-sum
    spec (see _wl_round) keeps hub work distributed. Below WL_LOCAL_GATE
    sym edges the whole refinement runs in ONE task (the
    coloring/truss/temporal gate economics — six keyed shuffles were
    pure dispatch floor at sandbox scale); parity forced in tests."""
    sym = _sym_simple(sf_dir)
    if mode == "auto" and sym.count() <= WL_LOCAL_GATE:
        from ligrust_ray.dataops.dedup import _block_refs

        ref = _wl_colors_task.remote(_block_refs(sym.materialize()))
        return ray.data.from_arrow_refs([ref])
    c0 = _simple_degree(sf_dir).map_batches(
        lambda t: pa.table({"node_id": t.column("node_id"),
                            "color": t.column("degree").cast(pa.int64())}),
        batch_format="pyarrow")
    c1 = _wl_round(sym, c0).materialize()   # node-sized state, read twice
    c2 = _wl_round(sym, c1)
    return shuffle.hash_join(
        c2.map_batches(
            lambda t: pa.table({"node_id": t.column("node_id"),
                                "wl2": t.column("color")}),
            batch_format="pyarrow"),
        c1.map_batches(
            lambda t: pa.table({"node_id": t.column("node_id"),
                                "wl1": t.column("color")}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["wl2"], r_cols=["wl1"]
    ).map_batches(
        lambda t: t.select(["node_id", "wl1", "wl2"]),
        batch_format="pyarrow")


def q_events_common_neighbors(sf_dir: str):
    """(a, b, n_common) link-prediction candidates over the simple
    undirected events graph: unordered pairs sharing >= CN_MIN_COMMON
    common neighbours of degree <= CN_DEGREE_CAP. The degree cap bounds
    wedge volume at sum over low-degree centers of deg^2 (the standard
    hub filter — a hub as common neighbour carries ~no signal, the same
    rationale as Adamic-Adar's 1/log weighting) and is replicated in the
    SQL oracle."""
    counts = shuffle.grouped_agg(_cn_wedges_cached(sf_dir),
                                 ["a", "b"],
                                 {"n_common": (None, "count")})
    return counts.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("n_common"), CN_MIN_COMMON)),
        batch_format="pyarrow")


def q_events_link_pred(sf_dir: str):
    """(a, b, n_common, ra_ppb) resource-allocation link-prediction scores
    (Zhou/Lu/Zhang 2009): for unordered non-adjacent-or-adjacent pairs
    sharing >= CN_MIN_COMMON capped-degree common neighbours v, ra_ppb =
    sum over those v of RA_SCALE // deg(v) — integer arithmetic end to
    end so the DuckDB hash compare is exact. Same wedge machinery and hub
    cap as q_events_common_neighbors; one extra int64 column rides the
    same shuffle."""
    scored = shuffle.grouped_agg(_cn_wedges_cached(sf_dir),
                                 ["a", "b"],
                                 {"n_common": (None, "count"),
                                  "ra_ppb": ("ra", "sum")})
    return scored.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("n_common"), CN_MIN_COMMON)),
        batch_format="pyarrow")


def q_events_adamic_adar(sf_dir: str):
    """(a, b, n_common, aa_ppm) Adamic-Adar link-prediction scores
    (Adamic/Adar 2003): for the same capped-degree wedge pairs as
    q_events_link_pred, aa_ppm = sum over common neighbours v of
    round(AA_SCALE / ln deg(v)) — each term a deterministic int64 (the
    fixed-point rounding is DuckDB-LN-parity-tested exhaustively over the
    whole degree range), so the summed score is addition-order
    independent and the hash compare exact. Consumes the SAME materialized
    wedge artifact as the rest of the link-prediction family — one extra
    int64 column rides the one (a, b)-keyed shuffle."""
    scored = shuffle.grouped_agg(_cn_wedges_cached(sf_dir),
                                 ["a", "b"],
                                 {"n_common": (None, "count"),
                                  "aa_ppm": ("aa", "sum")})
    return scored.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("n_common"), CN_MIN_COMMON)),
        batch_format="pyarrow")


NEG_SAMPLES_K = 4    # candidate negative slots per source node


def q_events_negative_samples(sf_dir: str):
    """(src, dst, slot) — deterministic negative sampling for link-
    prediction training data: for every source node with at least one
    out-edge, NEG_SAMPLES_K candidate destinations dst =
    md5_number_lower("src:slot") % n, keeping only candidates that are
    neither self-loops nor REAL edges (the anti-join every GNN training
    pipeline runs to pair positives with negatives). Deterministic coin
    -> reproducible training sets and an exact SQL replay. Scale shape:
    candidate generation is a stateless vectorised map over the distinct
    source set (K rows per source); the anti-join is ONE composite-keyed
    co_group against the distinct edge table — candidates co-partition
    with the edges they must miss, bodies never broadcast."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    de = _distinct_edges(sf_dir)
    srcs = shuffle.distinct(
        de.map_batches(lambda t: pa.table({"src": t.column("src")}),
                       batch_format="pyarrow"), ["src"])

    def gen(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        rs = np.repeat(s, NEG_SAMPLES_K)
        js = np.tile(np.arange(NEG_SAMPLES_K, dtype=np.int64), len(s))
        key = pc.binary_join_element_wise(
            pc.cast(pa.array(rs), pa.string()),
            pc.cast(pa.array(js), pa.string()), ":")
        dst = (md5_u64_lower_arrow(key) % N_EVENT_NODES).astype(np.int64)
        keep = dst != rs
        return pa.table({"src": pa.array(rs[keep]),
                         "dst": pa.array(dst[keep]),
                         "slot": pa.array(js[keep]),
                         "k": pa.array(rs[keep] * N_EVENT_NODES
                                       + dst[keep])})

    cands = srcs.map_batches(gen, batch_format="pyarrow")
    ek = de.map_batches(
        lambda t: pa.table({"k": pc.add(
            pc.multiply(t.column("src"), N_EVENT_NODES),
            t.column("dst"))}),
        batch_format="pyarrow")

    def anti(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if not len(lf):
            return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                 "dst": pd.Series([], dtype=np.int64),
                                 "slot": pd.Series([], dtype=np.int64)})
        keep = ~lf["k"].isin(rf["k"])
        return lf.loc[keep, ["src", "dst", "slot"]]

    i64 = pa.int64()
    return shuffle.co_group(
        cands, ek, l_on="k", r_on="k", fn=anti,
        l_schema=pa.schema([("src", i64), ("dst", i64), ("slot", i64),
                            ("k", i64)]),
        r_schema=pa.schema([("k", i64)]))


def q_events_jaccard_pairs(sf_dir: str):
    """(a, b, n_common, jac_ppb) Jaccard link-prediction scores over the
    shared capped wedge set (Liben-Nowell/Kleinberg 2003): jac_ppb =
    (1e9 * n_common) // (deg(a) + deg(b) - n_common), deg = FULL simple
    undirected degree — CN_DEGREE_CAP applies only to wedge CENTERS,
    exactly as in the CN/RA family, so |A ∪ B| in the denominator is the
    true union size. Non-negative integer floor division end to end
    (DuckDB's `//` truncates toward zero = floor for non-negatives), so
    the oracle hash compare is exact. Endpoint degrees attach via two
    keyed hash_joins against the degree table — co-partitioned shuffles,
    never a broadcast of the degree side."""
    counts = shuffle.grouped_agg(_cn_wedges_cached(sf_dir), ["a", "b"],
                                 {"n_common": (None, "count")})
    counts = counts.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("n_common"), CN_MIN_COMMON)),
        batch_format="pyarrow")
    deg = _simple_degree(sf_dir).map_batches(
        lambda t: pa.table({"node_id": t.column("node_id"),
                            "degree": t.column("degree").cast(pa.int64())}),
        batch_format="pyarrow")
    j1 = shuffle.hash_join(
        counts.map_batches(lambda t: pa.table({
            "node_id": t.column("a").cast(pa.int64()),
            "b": t.column("b").cast(pa.int64()),
            "n_common": t.column("n_common").cast(pa.int64())}),
            batch_format="pyarrow"),
        deg.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"), "da": t.column("degree")}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["b", "n_common"], r_cols=["da"])
    j2 = shuffle.hash_join(
        j1.map_batches(lambda t: pa.table({
            "node_id": t.column("b"), "a": t.column("node_id"),
            "n_common": t.column("n_common"), "da": t.column("da")}),
            batch_format="pyarrow"),
        deg.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"), "db": t.column("degree")}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["a", "n_common", "da"], r_cols=["db"])

    def score(t: pa.Table) -> pa.Table:
        nc = t.column("n_common").to_numpy()
        un = (t.column("da").to_numpy() + t.column("db").to_numpy() - nc)
        return pa.table({
            "a": t.column("a"), "b": t.column("node_id"),
            "n_common": pa.array(nc),
            "jac_ppb": pa.array(1_000_000_000 * nc // un)})

    return j2.map_batches(score, batch_format="pyarrow")


def q_docs_clean(sf_dir: str):
    """Composite corpus-cleaning pipeline (the realistic end-to-end
    training-data prep): predicted-English docs above a quality floor,
    exact-deduplicated (min doc_id per text). Quality and language are
    pure functions of the text, so filtering BEFORE the dedup shuffle is
    semantics-identical and means only survivors' (hash, doc_id) pairs
    enter the one wide step — a single streaming pass plus one hash
    shuffle, no broadcast of any id set."""
    docs = _docs(sf_dir)

    def filter_score(t: pa.Table) -> pa.Table:
        import hashlib

        q = textstats.quality_scorer()(t)
        lang = textstats.lang_id()(t)
        ok = (q.column("quality_1e6").to_numpy() >= 500_000) & \
            (np.asarray(lang.column("pred_lang")) == "en")
        keep = t.filter(pa.array(ok))
        hs = [hashlib.sha1(x.encode("utf-8")).hexdigest()
              for x in keep.column("text").to_pylist()]
        return pa.table({"doc_id": keep.column("doc_id"),
                         "h": pa.array(hs, type=pa.string())})

    filtered = docs.map_batches(filter_score, batch_format="pyarrow")
    return (shuffle.grouped_agg(filtered, ["h"],
                                {"doc_id": ("doc_id", "min")})
            .select_columns(["doc_id"]))


# ------------------------------------------------- iterative graph algorithms
_GRAPH_CACHE: dict = {}


def _events_tag(sf_dir: str) -> int:
    """crc32 of (path, fingerprint) — names the on-disk CSR artifact, so
    regenerated events data under the same path builds into a FRESH dir
    instead of reusing a stale one."""
    fp = _events_fp(sf_dir)
    return zlib.crc32(f"{sf_dir}:{fp[0]}:{fp[1]}".encode()) & 0xFFFFFFFF


def _sf_tag(sf_dir: str) -> int:
    """crc32 of the sf_dir path alone — the GENERATION-STABLE half of an
    on-disk artifact name, so a fresh data generation can find (and GC)
    the stale generations' dirs of the same source."""
    return zlib.crc32(sf_dir.encode()) & 0xFFFFFFFF


def _graph_dir(sf_dir: str, kind: str) -> str:
    """/tmp CSR dir for (sf_dir, kind, data generation):
    ``ligr_{kind}_{sf_tag}_{gen_tag}_n{n}``. When the current generation's
    dir is absent (fresh data), OTHER generations of the same (kind,
    sf_dir) are deleted first — the in-memory cache eviction alone would
    leak one CSR dir per regeneration into tempdir."""
    import glob
    import shutil

    stem = os.path.join(tempfile.gettempdir(),
                        f"ligr_{kind}_{_sf_tag(sf_dir):08x}")
    gd = f"{stem}_{_events_tag(sf_dir):08x}_n{events_n(sf_dir)}"
    if not os.path.exists(os.path.join(gd, "manifest.json")):
        for stale in glob.glob(stem + "_*"):
            if stale != gd:
                shutil.rmtree(stale, ignore_errors=True)
    return gd


def events_graph(sf_dir: str) -> DistGraph:
    key = ("events", sf_dir, _events_fp(sf_dir))
    if key not in _GRAPH_CACHE:
        _evict_stale(_GRAPH_CACHE, key)
        gd = _graph_dir(sf_dir, "events")
        if not os.path.exists(os.path.join(gd, "manifest.json")):
            build_graph_from_edges(events_edges_ds(sf_dir), gd,
                                   n=events_n(sf_dir), num_partitions=4)
        _GRAPH_CACHE[key] = DistGraph.load(gd)
    return _GRAPH_CACHE[key]


def events_sym_graph(sf_dir: str) -> DistGraph:
    """Symmetrized simple events graph (for undirected algorithms like
    k-core): distinct non-loop undirected edges, stored both directions."""
    key = ("events_sym", sf_dir, _events_fp(sf_dir))
    if key not in _GRAPH_CACHE:
        _evict_stale(_GRAPH_CACHE, key)
        gd = _graph_dir(sf_dir, "events_sym")
        if not os.path.exists(os.path.join(gd, "manifest.json")):
            build_graph_from_edges(events_edges_ds(sf_dir), gd,
                                   n=events_n(sf_dir), num_partitions=4,
                                   symmetrize=True)
        _GRAPH_CACHE[key] = DistGraph.load(gd)
    return _GRAPH_CACHE[key]


def events_rev_graph(sf_dir: str) -> DistGraph:
    """The events graph with every edge reversed, built over the same
    (n, num_partitions) so partition bounds match the forward graph —
    the backward-propagation twin for SCC / HITS (algos/scc.py's
    transfer_state moves state between the aligned shard actors)."""
    key = ("events_rev", sf_dir, _events_fp(sf_dir))
    if key not in _GRAPH_CACHE:
        _evict_stale(_GRAPH_CACHE, key)
        gd = _graph_dir(sf_dir, "events_rev")
        if not os.path.exists(os.path.join(gd, "manifest.json")):
            rev = events_edges_ds(sf_dir).map_batches(
                lambda t: pa.table({"src": t.column("dst"),
                                    "dst": t.column("src")}),
                batch_format="pyarrow")
            build_graph_from_edges(rev, gd, n=events_n(sf_dir),
                                   num_partitions=4)
        _GRAPH_CACHE[key] = DistGraph.load(gd)
    return _GRAPH_CACHE[key]


def q_events_scc(sf_dir: str):
    """(node_id, scc) strongly connected component ids (min member id)
    over the directed events graph — forward-backward min-label with
    trimming across the twin forward/reversed graphs (algos/scc.py).
    Oracle: recursive both-ways reachability closure; scc(v) =
    MIN(u : u ->* v AND v ->* u)."""
    from ligrust_ray.algos.scc import scc

    g = events_graph(sf_dir)
    scc(g, events_rev_graph(sf_dir))
    st = g.collect_state(["scc"])["scc"]
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "scc": pa.array(st)})


def events_err_edges_ds(sf_dir: str) -> ray.data.Dataset:
    """Sparse directed subgraph: edges from 'error' events with value
    < 15 only. The full events multigraph is strongly connected even at
    sf0.01 (one SCC — condensation would be trivially empty), so the
    SCC-structure queries run on this filtered slice, which has real
    bow-tie structure (20 SCCs at sf0.01, ~1.4k at sf0.1)."""
    def derive(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t.column("event_type"), "error"),
                       pc.less(t.column("value"), 15.0))
        t = t.filter(keep)
        u = t.column("user_id").to_numpy().astype(np.int64)
        v = t.column("value").to_numpy()
        dst = (np.floor(v * 100).astype(np.int64)) % N_EVENT_NODES
        return pa.table({"src": pa.array(u), "dst": pa.array(dst)})

    return _read_sized(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "value", "event_type"]).map_batches(
        derive, batch_format="pyarrow")


def events_err_graph_pair(sf_dir: str) -> tuple[DistGraph, DistGraph]:
    """Forward + reversed DistGraphs over the sparse error-events
    subgraph (same n / partition bounds as the full events graph so the
    SCC twin-transfer machinery applies unchanged)."""
    out = []
    for name, flip in (("events_err", False), ("events_err_rev", True)):
        key = (name, sf_dir, _events_fp(sf_dir))
        if key not in _GRAPH_CACHE:
            _evict_stale(_GRAPH_CACHE, key)
            gd = _graph_dir(sf_dir, name)
            if not os.path.exists(os.path.join(gd, "manifest.json")):
                e = events_err_edges_ds(sf_dir)
                if flip:
                    e = e.map_batches(
                        lambda t: pa.table({"src": t.column("dst"),
                                            "dst": t.column("src")}),
                        batch_format="pyarrow")
                build_graph_from_edges(e, gd, n=events_n(sf_dir),
                                       num_partitions=4)
            _GRAPH_CACHE[key] = DistGraph.load(gd)
        out.append(_GRAPH_CACHE[key])
    return out[0], out[1]


def q_events_condensation(sf_dir: str):
    """(comp_src, comp_dst, n_edges) — the SCC condensation DAG of the
    sparse error-events subgraph (events_err_edges_ds; the full events
    multigraph is one giant SCC, so its condensation is degenerate):
    contract every strongly connected component (min-member-id labels
    from the same forward-backward SCC engine run as events_scc) to one
    node, keep the cross-component edge multiset with multiplicities,
    drop within-component edges. Acyclic by construction — the DAG the
    web's "bow-tie" analyses (Broder et al. WWW'00) are computed over.
    Scale shape: the scc label table co-partitions into TWO hash_joins
    against the raw edge multiset (never broadcast, never a driver-side
    id->comp dict), then one partial-combined grouped_agg — the exact
    wide-step plan of events_community_stats."""
    from ligrust_ray.algos.scc import scc

    g, grev = events_err_graph_pair(sf_dir)
    scc(g, grev)
    st = g.collect_state(["scc"])["scc"]
    scc_t = ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.arange(g.n, dtype=np.int64)),
        "scc": pa.array(st)}))
    edges = events_err_edges_ds(sf_dir)
    j1 = shuffle.hash_join(
        edges.map_batches(lambda t: pa.table({
            "node_id": t.column("src").cast(pa.int64()),
            "dst": t.column("dst").cast(pa.int64())}),
            batch_format="pyarrow"),
        scc_t.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"),
            "csrc": t.column("scc").cast(pa.int64())}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["dst"], r_cols=["csrc"]).map_batches(
        lambda t: pa.table({"node_id": t.column("dst"),
                            "csrc": t.column("csrc")}),
        batch_format="pyarrow")
    j2 = shuffle.hash_join(
        j1,
        scc_t.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"),
            "cdst": t.column("scc").cast(pa.int64())}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["csrc"], r_cols=["cdst"])

    def cross_only(t: pa.Table) -> pa.Table:
        cs = t.column("csrc").to_numpy()
        cd = t.column("cdst").to_numpy()
        keep = cs != cd
        return pa.table({"comp_src": pa.array(cs[keep]),
                         "comp_dst": pa.array(cd[keep])})

    return shuffle.grouped_agg(
        j2.map_batches(cross_only, batch_format="pyarrow"),
        ["comp_src", "comp_dst"], {"n_edges": (None, "count")})


TOPO_SQL_ROUNDS = 16


def q_events_topo_levels(sf_dir: str, mode: str = "auto"):
    """(comp, level) — longest-path topological layering of the SCC
    condensation DAG (level = longest chain of cross-component edges
    reaching the component; sources sit at 0) — the scheduling /
    dependency-depth readout computed over any contracted DAG. Rounds
    of max-propagation until a fixed point: each round is one keyed
    hash_join + one grouped max + one typed-fill left join, all sized
    to the COMPONENT graph; per-block change partials fold to one
    driver scalar. The SQL oracle unrolls TOPO_SQL_ROUNDS rounds
    (surplus rounds are no-ops past the fixed point; the engine raises
    if the DAG is deeper — the kcore/onion convention)."""
    from ligrust_ray.algos.scc import scc

    g, grev = events_err_graph_pair(sf_dir)
    scc(g, grev)
    scc_ds = g.result_dataset(["scc"]).map_batches(
        lambda t: pa.table({"comp": t.column("scc").cast(pa.int64())}),
        batch_format="pyarrow")
    comps = shuffle.distinct(scc_ds, ["comp"])
    levels = comps.map_batches(
        lambda t: t.append_column(
            "lvl", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow").materialize()
    ce = q_events_condensation(sf_dir).map_batches(
        lambda t: pa.table({
            "comp": t.column("comp_src").cast(pa.int64()),
            "dst": t.column("comp_dst").cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    # single-task fast path (coloring/truss/temporal gate precedent):
    # below 2^22 comp edges the whole relaxation runs vectorized in one
    # process instead of ~depth x 4 shuffle dispatches
    if mode == "auto" and ce.count() <= (1 << 22):
        cet = pa.concat_tables(
            [b for b in ce.iter_batches(batch_format="pyarrow")]) \
            if ce.count() else pa.table(
            {"comp": pa.array([], type=pa.int64()),
             "dst": pa.array([], type=pa.int64())})
        comps_np = np.sort(comps.to_pandas()["comp"]
                           .to_numpy(np.int64))
        idx = {int(c): i for i, c in enumerate(comps_np)}
        s = np.array([idx[int(x)] for x in
                      cet.column("comp").to_pylist()], dtype=np.int64)
        d = np.array([idx[int(x)] for x in
                      cet.column("dst").to_pylist()], dtype=np.int64)
        lvl = np.zeros(len(comps_np), dtype=np.int64)
        for r in range(1, TOPO_SQL_ROUNDS + 2):
            nxt = lvl.copy()
            if len(s):
                np.maximum.at(nxt, d, lvl[s] + 1)
            if (nxt == lvl).all():
                break
            if r > TOPO_SQL_ROUNDS:
                raise RuntimeError(
                    f"topo levels still changing after "
                    f"{TOPO_SQL_ROUNDS} rounds; bump TOPO_SQL_ROUNDS")
            lvl = nxt
        return ray.data.from_arrow(pa.table({
            "comp": pa.array(comps_np), "level": pa.array(lvl)}))

    def _changed(t: pa.Table) -> pa.Table:
        v = (t.column("lvl").to_numpy().astype(np.int64)
             > t.column("old").to_numpy().astype(np.int64)).sum()
        return pa.table({"x": pa.array([int(v)], type=pa.int64())})

    for r in range(1, TOPO_SQL_ROUNDS + 2):
        cand = shuffle.grouped_agg(
            shuffle.hash_join(ce, levels, on="comp", l_cols=["dst"],
                              r_cols=["lvl"]).map_batches(
                lambda t: pa.table({
                    "comp": t.column("dst").cast(pa.int64()),
                    "c": pc.add(t.column("lvl").cast(pa.int64()),
                                pa.scalar(1, type=pa.int64()))}),
                batch_format="pyarrow"),
            ["comp"], {"mx": ("c", "max")})
        joined = shuffle.hash_join(
            levels.map_batches(
                lambda t: pa.table({"comp": t.column("comp"),
                                    "old": t.column("lvl")}),
                batch_format="pyarrow"),
            cand, on="comp", l_cols=["old"], r_cols=["mx"],
            how="left", fill={"mx": 0}).map_batches(
            lambda t: pa.table({
                "comp": t.column("comp").cast(pa.int64()),
                "old": t.column("old").cast(pa.int64()),
                "lvl": pc.max_element_wise(
                    t.column("old").cast(pa.int64()),
                    t.column("mx").cast(pa.int64()))}),
            batch_format="pyarrow").materialize()
        n_changed = int(joined.map_batches(
            _changed, batch_format="pyarrow").to_pandas()["x"].sum())
        levels = joined.map_batches(
            lambda t: t.select(["comp", "lvl"]),
            batch_format="pyarrow").materialize()
        if n_changed == 0:
            break
        if r > TOPO_SQL_ROUNDS:
            raise RuntimeError(
                f"topo levels still changing after {TOPO_SQL_ROUNDS} "
                "rounds; bump TOPO_SQL_ROUNDS")
    return levels.map_batches(
        lambda t: pa.table({"comp": t.column("comp").cast(pa.int64()),
                            "level": t.column("lvl").cast(pa.int64())}),
        batch_format="pyarrow")


def q_events_bowtie(sf_dir: str):
    """(node_id, cls) — Broder et al. WWW'00 bow-tie decomposition of the
    sparse error-events subgraph (the full events graph is one giant SCC,
    which makes every node 'core'): cls = 'core' (member of the largest
    SCC, ties to the smallest label), 'in' (reaches the core), 'out'
    (reached from the core), 'other' (tendrils/tubes/disconnected).
    Engine plan: one forward-backward scc() run on the cached twin
    graphs, the giant label from a distributed size count folded to one
    row per block, then TWO frontier reachability sweeps (ReachEdge) —
    forward on the graph, backward on its reversed twin — seeded by the
    shard-local scc == giant predicate (the core member list never
    ships). in/out are disjoint from core by definition (a node both
    reaching and reached by the core is IN the core)."""
    from ligrust_ray.algos.scc import bowtie_labels

    g, grev = events_err_graph_pair(sf_dir)
    cls = bowtie_labels(g, grev)
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "cls": pa.array(cls.astype(object), type=pa.string())})


PPR_ROUNDS = 4
PPR_SOURCE = 0


def q_events_ppr(sf_dir: str):
    """(node_id, ppr_ppm) personalized PageRank from seed node 0 after
    PPR_ROUNDS synchronous gathers over the directed events multigraph
    (algos/ppr.py) — the SQL oracle unrolls the identical rounds; ppm
    rendering shares the pagerank_events convention."""
    from ligrust_ray.algos.ppr import personalized_page_rank

    g = events_graph(sf_dir)
    personalized_page_rank(g, source=PPR_SOURCE, rounds=PPR_ROUNDS)
    st = g.collect_state(["p"])["p"]
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "ppr_ppm": pa.array(
                         np.floor(st * 1e6 + 0.5).astype(np.int64))})


KATZ_ROUNDS = 4


def q_events_katz(sf_dir: str):
    """(node_id, katz_ppm) Katz centrality after KATZ_ROUNDS truncated
    power-series gathers x_{t+1} = 1 + 0.05 * sum_in x_t over the
    directed events multigraph (algos/ppr.py KatzEdge) — the SQL oracle
    unrolls the identical rounds; ppm rendering shares the
    pagerank_events convention."""
    from ligrust_ray.algos.ppr import katz

    g = events_graph(sf_dir)
    katz(g, rounds=KATZ_ROUNDS)
    st = g.collect_state(["x"])["x"]
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "katz_ppm": pa.array(
                         np.floor(st * 1e6 + 0.5).astype(np.int64))})


PR_STD_ROUNDS = 6


def q_events_pagerank_std(sf_dir: str):
    """(node_id, pr_ppm) STANDARD normalized PageRank with dangling-mass
    redistribution after PR_STD_ROUNDS rounds (algos/pagerank.py
    page_rank_standard) over the directed events multigraph — the
    probability-distribution variant the reference lacks (its
    PageRankDelta keeps unnormalized teleport and drops dangling mass;
    both semantics now ship). SQL oracle unrolls the identical rounds
    with an explicit per-round dangling-mass CTE."""
    from ligrust_ray.algos.pagerank import page_rank_standard

    g = events_graph(sf_dir)
    page_rank_standard(g, rounds=PR_STD_ROUNDS)
    st = g.collect_state(["x"])["x"]
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "pr_ppm": pa.array(
                         np.floor(st * 1e6 + 0.5).astype(np.int64))})


EIGEN_ROUNDS = 4


def q_events_eigencentrality(sf_dir: str):
    """(node_id, eig_ppm) eigenvector centrality after EIGEN_ROUNDS
    L1-normalised power-iteration rounds x_{t+1} = A^T x_t / ||.||_1
    over the directed events multigraph (algos/ppr.py eigencentrality)
    — the normalised sibling of events_hits' integer-exact power rounds.
    The SQL oracle unrolls identical rounds with the per-round SUM(ABS)
    normaliser computed in-SQL; ppm rendering shares the pagerank_events
    convention."""
    from ligrust_ray.algos.ppr import eigencentrality

    g = events_graph(sf_dir)
    eigencentrality(g, rounds=EIGEN_ROUNDS)
    st = g.collect_state(["x"])["x"]
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "eig_ppm": pa.array(
                         np.floor(st * 1e6 + 0.5).astype(np.int64))})


TRUST_SEED_MOD = 16
TRUST_ROUNDS = 4


def q_pages_pagerank_std(sf_dir: str):
    """(node_id, pr_ppm) — STANDARD normalized PageRank with dangling
    redistribution over the BUILT pages link graph: the web graph is
    where dangling mass is real (pages_dead_links counts the dead
    targets whose rank the reference variant silently drops). Same
    page_rank_standard loop as events_pagerank_std; the SQL oracle
    unrolls identical rounds over the persisted oracle edge table."""
    from ligrust_ray.algos.pagerank import page_rank_standard

    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    page_rank_standard(g, rounds=PR_STD_ROUNDS)
    st = g.collect_state(["x"])["x"]
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "pr_ppm": pa.array(
                         np.floor(st * 1e6 + 0.5).astype(np.int64))})


def q_pages_trustrank(sf_dir: str):
    """(node_id, trust_ppm) — TrustRank over the built pages link graph
    (Gyongyi et al. VLDB'04, the canonical web-spam-demotion score):
    PageRank whose teleport mass is restricted to a trusted seed set,
    here the deterministic whitelist stand-in id % TRUST_SEED_MOD == 0.
    TRUST_ROUNDS synchronous gathers via the same edgeMap machinery as
    pages_pagerank; the SQL oracle unrolls identical rounds over the
    persisted oracle edge table with |seeds| computed in-SQL."""
    from ligrust_ray.algos.ppr import trust_rank

    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    trust_rank(g, seed_mod=TRUST_SEED_MOD, rounds=TRUST_ROUNDS)
    st = g.collect_state(["p"])["p"]
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "trust_ppm": pa.array(
                         np.floor(st * 1e6 + 0.5).astype(np.int64))})


HITS_ROUNDS = 3


def q_events_hits(sf_dir: str):
    """(node_id, hub, auth) after HITS_ROUNDS unnormalised HITS rounds
    over the directed events multigraph (algos/hits.py) — h/a stay exact
    non-negative integers, so the contract hash compare is exact. The SQL
    oracle unrolls the same rounds with BIGINT sums."""
    from ligrust_ray.algos.hits import hits

    g = events_graph(sf_dir)
    hits(g, events_rev_graph(sf_dir), rounds=HITS_ROUNDS)
    st = g.collect_state(["h", "a"])
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "hub": pa.array(st["h"].astype(np.int64)),
                     "auth": pa.array(st["a"].astype(np.int64))})


SALSA_ROUNDS = 3


def q_events_salsa(sf_dir: str):
    """(node_id, hub_ppm, auth_ppm) after SALSA_ROUNDS rounds of SALSA
    (Lempel & Moran WWW'00 — the random-walk HITS; algos/hits.py salsa)
    over the directed events multigraph and its cached reversed twin:
    degree-normalized two-phase gathers, ppm rendering on the shared
    pagerank/katz convention."""
    from ligrust_ray.algos.hits import salsa

    g = events_graph(sf_dir)
    salsa(g, events_rev_graph(sf_dir), rounds=SALSA_ROUNDS)
    st = g.collect_state(["h", "a"])
    return pa.table({
        "node_id": pa.array(np.arange(g.n, dtype=np.int64)),
        "hub_ppm": pa.array(
            np.floor(st["h"] * 1e6 + 0.5).astype(np.int64)),
        "auth_ppm": pa.array(
            np.floor(st["a"] * 1e6 + 0.5).astype(np.int64))})


KCORE_K = 5
KCORE_SQL_ROUNDS = 40      # unroll depth of the DuckDB oracle


def q_events_kcore(sf_dir: str):
    """(node_id) members of the undirected 5-core of the simple events
    graph — classic Ligra KCore peeling through the engine's kernel
    surface. The SQL oracle unrolls KCORE_SQL_ROUNDS simultaneous-removal
    rounds; raise rather than return if the engine needed more (peeling's
    fixpoint is unique, so fewer-or-equal rounds means identical sets)."""
    from ligrust_ray.algos.kcore import kcore

    g = events_sym_graph(sf_dir)
    m = kcore(g, KCORE_K)
    if m["rounds"] > KCORE_SQL_ROUNDS:
        raise RuntimeError(
            f"kcore took {m['rounds']} rounds > SQL unroll "
            f"{KCORE_SQL_ROUNDS}; bump KCORE_SQL_ROUNDS")
    alive = g.collect_state(["alive"])["alive"]
    return pa.table({"node_id": pa.array(
        np.flatnonzero(alive).astype(np.int64))})


DENSEST_SQL_ROUNDS = 32   # unroll depth of the oracle = engine round cap


def q_events_densest(sf_dir: str):
    """(node_id) members of the approximately-densest subgraph of the
    simple undirected events graph — deterministic Charikar/Bahmani
    batched peeling (threshold floor(3m/n), exact-rational best-round
    argmax) through the engine's kernel surface. The SQL oracle unrolls
    DENSEST_SQL_ROUNDS rounds of the SAME dynamics, so the member set
    matches exactly; the engine raises rather than return if it needed
    more (the n/1.5-per-round shrink bounds rounds by ~log_1.5 n, so 32
    covers n up to ~300k — far past any sf the driver runs; at larger n
    raise both caps together)."""
    from ligrust_ray.algos.densest import densest_subgraph

    g = events_sym_graph(sf_dir)
    m = densest_subgraph(g, max_rounds=DENSEST_SQL_ROUNDS)
    died = g.collect_state(["died"])["died"]
    ids = np.flatnonzero(died >= m["best_round"])
    return pa.table({"node_id": pa.array(ids.astype(np.int64))})


def q_events_forest(sf_dir: str):
    """(node_id, parent, level) deterministic spanning forest of the
    simple undirected events graph — connected components pick each
    component's root (min node id), then ONE multi-source BFS wave from
    all roots claims parent = min same-level neighbour (algos/forest.py;
    roots keep parent = self, level = 0). Oracle: recursive component
    closure -> roots -> multi-source BFS levels -> min parent at
    level-1."""
    from ligrust_ray.algos.forest import spanning_forest

    g = events_sym_graph(sf_dir)
    spanning_forest(g)
    st = g.collect_state(["parent", "level"])
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "parent": pa.array(st["parent"].astype(np.int64)),
                     "level": pa.array(st["level"].astype(np.int64))})


MIS_SQL_ROUNDS = 24    # unroll depth of the DuckDB oracle = engine round cap


def q_events_mis(sf_dir: str):
    """(node_id) members of a maximal independent set of the simple
    undirected events graph — Luby rounds with deterministic md5-derived
    per-round priorities through the engine's kernel surface. The SQL
    oracle unrolls MIS_SQL_ROUNDS rounds with the SAME priority sequence,
    so the sets match exactly (not just "some valid MIS"); the engine
    raises rather than return if it needed more rounds (rounds after the
    active set drains are no-ops on both sides)."""
    from ligrust_ray.algos.mis import mis

    g = events_sym_graph(sf_dir)
    mis(g, max_rounds=MIS_SQL_ROUNDS)
    in_mis = g.collect_state(["in_mis"])["in_mis"]
    return pa.table({"node_id": pa.array(
        np.flatnonzero(in_mis).astype(np.int64))})


MATCHING_SQL_ROUNDS = 24   # unroll depth of the oracle = engine round cap


def q_events_matching(sf_dir: str):
    """(u, v, rnd) — deterministic local-max MAXIMAL MATCHING over the
    simple undirected events graph (algos/matching.py: shared md5 edge
    priority, matched iff per-endpoint max at BOTH ends, matched
    vertices leave). The SQL oracle unrolls the identical rounds with
    the same priority, so the matched sets agree exactly; the engine
    raises rather than return if it needed more rounds (rounds after
    the edge set drains are no-ops on both sides). auto mode: the
    single-task fast path below 2^22 edges (same gate economics as
    walks/truss — ~6 shuffle dispatches per round dwarf the compute at
    sandbox scale); the distributed per-round shuffle plan is
    parity-tested against it in test_algos."""
    from ligrust_ray.algos.matching import maximal_matching

    return maximal_matching(events_matching_pairs(sf_dir),
                            max_rounds=MATCHING_SQL_ROUNDS)


def events_matching_pairs(sf_dir: str) -> ray.data.Dataset:
    """(a, b) distinct simple undirected events pairs in matching's
    input layout (shared by the contract query and bench)."""
    return _und_pairs(sf_dir).map_batches(
        lambda t: pa.table({"a": t.column("lo").cast(pa.int64()),
                            "b": t.column("hi").cast(pa.int64())}),
        batch_format="pyarrow")


BC_SQL_ROUNDS = 24     # unroll depth of the DuckDB oracle = engine level cap


def q_events_bc(sf_dir: str):
    """(node_id, level, sigma, delta_ppm) single-source Brandes
    betweenness from node 0 over the symmetrized simple events graph —
    Ligra-paper BC through two sum-edgeMap phases (algos/betweenness.py).
    level/sigma are exact integers; delta is float64 whose contract
    rendering is floor(delta*1e6 + 0.5) — the identical rounding function
    the SQL oracle applies, so only a last-ulp SUM-order coincidence at a
    rounding boundary could ever differ (see the algo module docstring)."""
    from ligrust_ray.algos.betweenness import betweenness

    g = events_sym_graph(sf_dir)
    betweenness(g, root=0, max_levels=BC_SQL_ROUNDS)
    st = g.collect_state(["level", "sigma", "delta"])
    ids = np.flatnonzero(st["level"] >= 0)
    return pa.table({
        "node_id": pa.array(ids.astype(np.int64)),
        "level": pa.array(st["level"][ids]),
        "sigma": pa.array(st["sigma"][ids].astype(np.int64)),
        "delta_ppm": pa.array(
            np.floor(st["delta"][ids] * 1e6 + 0.5).astype(np.int64))})


COLORING_SQL_ROUNDS = 100   # oracle unroll depth = engine round cap


def q_events_coloring(sf_dir: str):
    """(node_id, color) Jones-Plassmann greedy coloring of the symmetrized
    simple events graph — MIS-style strict-min selection on the shared
    deterministic priority sequence, smallest-absent-color assignment via
    multi-word or-reduce masks (algos/coloring.py). The SQL oracle unrolls
    COLORING_SQL_ROUNDS rounds with the same priorities and rule, so the
    EXACT coloring is replicated (rounds are deterministic: 81 at sf0.01,
    21 at sf0.001; the engine raises past the cap, surplus rounds are
    no-ops). Below COLOR_SINGLE_TASK_MAX symmetric edges the identical
    rounds run vectorised in one Ray task (the per-round actor-wave
    dispatch dominates at sandbox scale — BASELINE §2d); the kernel-wave
    path is parity-tested against it and remains the >2^22 path."""
    from ligrust_ray.algos.coloring import (COLOR_SINGLE_TASK_MAX,
                                            color_graph, color_graph_fast)

    n = events_n(sf_dir)
    # metadata-only gate: sym edges <= 2 x events rows, so a small row
    # count GUARANTEES the fast path without materializing anything;
    # above the bound the kernel path runs with no wasted sym pass
    if 2 * _events_rows(sf_dir) <= COLOR_SINGLE_TASK_MAX:
        color = color_graph_fast(n, _sym_simple(sf_dir).materialize(),
                                 max_rounds=COLORING_SQL_ROUNDS)
    else:
        g = events_sym_graph(sf_dir)
        color_graph(g, max_rounds=COLORING_SQL_ROUNDS)
        color = g.collect_state(["color"])["color"]
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "color": pa.array(np.asarray(color,
                                                  dtype=np.int64))})


SSSP_SQL_ROUNDS = 32   # unroll depth of the DuckDB oracle = engine round cap


def q_events_sssp(sf_dir: str):
    """(node_id, dist) exact md5-weighted shortest distances from node 0
    over the directed events graph — Ligra-paper Bellman-Ford through the
    weighted edgeMap (derived integer weights, state/weights.py). The SQL
    oracle unrolls SSSP_SQL_ROUNDS relaxation rounds with the same weight
    hash; the engine raises rather than return if it needed more (extra
    rounds are no-ops on both sides), so distances match bit-for-bit."""
    from ligrust_ray.algos.bellman_ford import UNREACHED, bellman_ford

    g = events_graph(sf_dir)
    bellman_ford(g, source=0, max_rounds=SSSP_SQL_ROUNDS)
    dist = g.collect_state(["dist"])["dist"]
    ids = np.flatnonzero(dist < UNREACHED)
    return pa.table({"node_id": pa.array(ids.astype(np.int64)),
                     "dist": pa.array(dist[ids])})


def q_events_radii(sf_dir: str):
    """Ligra-paper Radii estimation: K=8 bit-parallel simultaneous BFS
    waves over one int64 bitmask per vertex (reduce='or' edgeMap);
    radius = max over sampled sources reaching v of dist(s, v), -1 when
    none does. Oracle: per-source recursive-CTE BFS, MAX over sources."""
    from ligrust_ray.algos.radii import radii

    g = events_graph(sf_dir)
    radii(g, k=8)
    st = g.collect_state(["radii"])
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "radius": pa.array(st["radii"].astype(np.int64))})


def q_events_harmonic(sf_dir: str):
    """(node_id, harmonic_ppm) sampled harmonic centrality over the
    directed events graph: K=8 evenly-spaced sources, harmonic_ppm =
    SUM over sources s != v reaching v of 1e6 // dist(s, v) — integer
    micro-units so the hash compare is exact. Rides the SAME bit-parallel
    multi-source BFS waves as events_radii (algos/radii.HarmonicEdge):
    a new source bit arriving in round r contributes 1e6 // r."""
    from ligrust_ray.algos.radii import radii

    g = events_graph(sf_dir)
    radii(g, k=8, harmonic=True)
    st = g.collect_state(["harm"])
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "harmonic_ppm": pa.array(st["harm"].astype(np.int64))})


def q_pagerank_events(sf_dir: str):
    """Reference-semantics PageRankDelta. Emitted as integer micro-units
    (rank_ppm) so the value hash is addition-order independent — the
    DuckDB oracle computes the same closed form (the reference's round-1
    output-frontier quirk empties the frontier for any n >= 4, so the
    fixed point is exactly 0.15 + 0.85·Σ_in (1/n)/outdeg(s); float
    exactness vs the numpy oracle is covered in tests/test_algos.py)."""
    g = events_graph(sf_dir)
    page_rank_delta(g, max_iterations=100)
    st = g.collect_state(["page_rank"])
    ppm = np.floor(st["page_rank"] * 1e6 + 0.5).astype(np.int64)
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "rank_ppm": pa.array(ppm)})


PR_WEIGHT_SPEC = "md5:32"    # same derived-weight spec as events_strength


def q_pagerank_weighted_events(sf_dir: str):
    """Weighted reference-semantics PageRankDelta: each edge carries the
    derived weight w(s,t) (state/weights.py md5:32 — the events_strength
    spec), the gather is (delta/w_out(s))·w(s,t), and the same round-1
    frontier quirk empties the frontier for n >= 4, so the fixed point is
    0.15 + 0.85·Σ_in (1/n)·w(s,t)/w_out(s). rank_ppm integer micro-units
    like pagerank_events; the oracle replicates the closed form with
    weight_sql_expr so engine and SQL hash the same weights."""
    g = events_graph(sf_dir)
    page_rank_delta(g, max_iterations=100, weight_spec=PR_WEIGHT_SPEC)
    st = g.collect_state(["page_rank"])
    ppm = np.floor(st["page_rank"] * 1e6 + 0.5).astype(np.int64)
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "rank_ppm": pa.array(ppm)})


def q_cc_events(sf_dir: str):
    g = events_graph(sf_dir)
    cc(g)
    st = g.collect_state(["ids"])
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "comp": pa.array(st["ids"])})


def q_cc_incremental_events(sf_dir: str):
    """(node_id, comp) — streaming-update connected components: the edge
    multiset splits deterministically into a ~90% base batch and a ~10%
    delta batch ((src*31 + dst) % 10 == 0 — an arbitrary stable rule; the
    oracle never sees it); CC runs to fixed point on the base graph, then
    ``cc_incremental`` warm-starts over the union CSR from the base labels
    with the frontier seeded at the delta sources. The result must equal —
    and is hash-checked against — the SAME from-scratch recursive-CTE
    oracle as cc_events, which is precisely the incremental algorithm's
    correctness contract."""
    from ligrust_ray.algos.cc import cc_incremental

    n = events_n(sf_dir)
    gd = _graph_dir(sf_dir, "events_base")
    if not os.path.exists(os.path.join(gd, "manifest.json")):
        def keep_base(t: pa.Table) -> pa.Table:
            s = t.column("src").to_numpy().astype(np.int64)
            d = t.column("dst").to_numpy().astype(np.int64)
            return t.filter(pa.array((s * 31 + d) % 10 != 0))

        base_edges = events_edges_ds(sf_dir).map_batches(
            keep_base, batch_format="pyarrow")
        build_graph_from_edges(base_edges, gd, n=n, num_partitions=4)
    gb = DistGraph.load(gd)
    cc(gb)
    base_ids = gb.collect_state(["ids"])["ids"]

    def keep_delta_src(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        d = t.column("dst").to_numpy().astype(np.int64)
        return pa.table({"src": pa.array(np.unique(s[(s * 31 + d) % 10
                                                     == 0]))})

    delta_srcs = np.unique(np.concatenate(
        [b.column("src").to_numpy() for b in
         events_edges_ds(sf_dir).map_batches(
             keep_delta_src, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]
        or [np.zeros(0, dtype=np.int64)]))

    g = events_graph(sf_dir)
    cc_incremental(g, base_ids, delta_srcs)
    st = g.collect_state(["ids"])
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "comp": pa.array(st["ids"])})


def q_events_component_sizes(sf_dir: str):
    """(size, n_components) — connected-component size histogram (the
    classic first question asked of any web-graph CC run: is there one
    giant component?). CC labels come from the frontier engine; the two
    rollups (per-component size, then per-size count) run as distributed
    grouped_aggs over the label Dataset — at 10^10 nodes the label table
    would stay a Dataset end to end (per-partition state collect), the
    histogram shape is unchanged."""
    labels = ray.data.from_arrow(q_cc_events(sf_dir))
    per_comp = shuffle.grouped_agg(labels, ["comp"],
                                   {"size": (None, "count")})
    return shuffle.grouped_agg(per_comp, ["size"],
                               {"n_components": (None, "count")})


def q_emb_semdedup(sf_dir: str):
    """(vec_id, cluster, kept) — SemDeDup-style semantic dedup over the
    embeddings table (dataops/ann.py semdedup): integer-exact k-means
    clusters, then within-cluster near-dup drops decided by the exact
    integer cosine test on the (md5(vec_id), vec_id) priority tape."""
    from ligrust_ray.dataops.ann import semdedup

    return semdedup(_emb(sf_dir))


def q_emb_top_component(sf_dir: str):
    """(dim, loading_ppm) — dominant principal direction of the
    embedding corpus (dataops/ann.py top_component): exact int64 Gram
    partials + an all-integer ppm-grid power iteration, hash-exact vs
    the unrolled SQL oracle."""
    from ligrust_ray.dataops.ann import top_component

    return top_component(_emb(sf_dir))


def q_emb_top_eigenvalue(sf_dir: str):
    """(rayleigh_den, eig_milli) — exact dominant-eigenvalue estimate of
    the embedding Gram matrix (ann.top_eigenvalue): the Rayleigh
    quotient of the ppm loading vector, hash-exact integers end to
    end."""
    from ligrust_ray.dataops.ann import top_eigenvalue

    return top_eigenvalue(_emb(sf_dir))


def q_emb_kmeans(sf_dir: str):
    """(vec_id, cluster) — deterministic integer-exact Lloyd k-means over
    the embeddings table (dataops/ann.py kmeans: md5 id-bucket init,
    KMEANS_ROUNDS floor-division centroid updates on the PQ fixed-point
    grid, smallest-id tie-break). The SQL oracle unrolls the identical
    rounds; every step is exact int64 so the compare is hash-exact."""
    from ligrust_ray.dataops.ann import kmeans

    return kmeans(_emb(sf_dir))


def q_events_bipartite(sf_dir: str):
    """(comp, n_nodes, is_bipartite) — per-component two-colorability of
    the simple undirected events graph (bipartite user-item structure is
    the precondition for the butterfly census and for bipartite
    projections). Component labels are the sym-graph CC min-ids; parity
    colors are the spanning-forest BFS levels mod 2 (both engine kernel
    runs on the shared cached sym graph); an edge whose endpoints share
    parity certifies an odd cycle, so is_bipartite = no such edge in the
    component (edge-less components are trivially bipartite, zero-filled
    through the join). Scale shape: node labels co-partition into two
    hash_joins against the distinct undirected pair set, one
    partial-combined grouped_agg per rollup — no broadcast, no driver
    edge pass."""
    from ligrust_ray.algos.forest import spanning_forest

    g = events_sym_graph(sf_dir)
    cc(g)
    comp = g.collect_state(["ids"])["ids"].astype(np.int64)
    spanning_forest(g)
    par = (g.collect_state(["level"])["level"].astype(np.int64)) % 2
    nodes = ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.arange(g.n, dtype=np.int64)),
        "comp": pa.array(comp), "par": pa.array(par)}))

    pairs = _und_pairs(sf_dir)
    j1 = shuffle.hash_join(
        pairs.map_batches(lambda t: pa.table({
            "node_id": t.column("lo").cast(pa.int64()),
            "hi": t.column("hi").cast(pa.int64())}),
            batch_format="pyarrow"),
        nodes.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"),
            "comp": t.column("comp"), "plo": t.column("par")}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["hi"], r_cols=["comp", "plo"]).map_batches(
        lambda t: pa.table({"node_id": t.column("hi"),
                            "comp": t.column("comp"),
                            "plo": t.column("plo")}),
        batch_format="pyarrow")
    j2 = shuffle.hash_join(
        j1,
        nodes.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"), "phi": t.column("par")}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["comp", "plo"], r_cols=["phi"])

    def flags(t: pa.Table) -> pa.Table:
        bad = (t.column("plo").to_numpy()
               == t.column("phi").to_numpy()).astype(np.int64)
        return pa.table({"comp": t.column("comp"), "bad": pa.array(bad)})

    bads = shuffle.grouped_agg(
        j2.map_batches(flags, batch_format="pyarrow"),
        ["comp"], {"bad": ("bad", "max")})
    sizes = shuffle.grouped_agg(
        nodes.map_batches(lambda t: pa.table({"comp": t.column("comp")}),
                          batch_format="pyarrow"),
        ["comp"], {"n_nodes": (None, "count")})

    joined = shuffle.hash_join(sizes, bads, on="comp",
                               l_cols=["n_nodes"], r_cols=["bad"],
                               how="left", fill={"bad": 0})
    return joined.map_batches(
        lambda t: pa.table({
            "comp": t.column("comp").cast(pa.int64()),
            "n_nodes": t.column("n_nodes").cast(pa.int64()),
            "is_bipartite": pc.cast(
                pc.equal(t.column("bad"), 0), pa.int64())}),
        batch_format="pyarrow")


def q_events_community_stats(sf_dir: str):
    """(label, n_nodes, n_internal, n_outgoing) — per-community structure
    rollup over the label-propagation partition (the modularity
    ingredients, kept integral so the DuckDB hash compare is exact:
    modularity per community = n_internal/m - (deg_sum/2m)^2 is a
    driver-side formula over these columns). Labels attach to the raw
    directed edge multiset via two hash_joins (label table co-partitioned,
    not broadcast); per-label node counts co_group-join the edge sums with
    zero-fill for all-isolated communities."""
    lp = ray.data.from_arrow(q_labelprop_events(sf_dir))
    edges = events_edges_ds(sf_dir)
    j1 = shuffle.hash_join(
        edges.map_batches(lambda t: pa.table({
            "node_id": t.column("src").cast(pa.int64()),
            "dst": t.column("dst").cast(pa.int64())}),
            batch_format="pyarrow"),
        lp.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"),
            "lsrc": t.column("label").cast(pa.int64())}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["dst"], r_cols=["lsrc"]).map_batches(
        lambda t: pa.table({"node_id": t.column("dst"),
                            "lsrc": t.column("lsrc")}),
        batch_format="pyarrow")
    j2 = shuffle.hash_join(
        j1,
        lp.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"),
            "ldst": t.column("label").cast(pa.int64())}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["lsrc"], r_cols=["ldst"])

    def flags(t: pa.Table) -> pa.Table:
        ls = t.column("lsrc").to_numpy()
        ld = t.column("ldst").to_numpy()
        same = (ls == ld).astype(np.int64)
        return pa.table({"label": pa.array(ls),
                         "internal": pa.array(same),
                         "outgoing": pa.array(1 - same)})

    esum = shuffle.grouped_agg(
        j2.map_batches(flags, batch_format="pyarrow"),
        ["label"], {"n_internal": ("internal", "sum"),
                    "n_outgoing": ("outgoing", "sum")})
    nn = shuffle.grouped_agg(
        lp.map_batches(lambda t: pa.table({
            "label": t.column("label").cast(pa.int64())}),
            batch_format="pyarrow"),
        ["label"], {"n_nodes": (None, "count")})

    def fill(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.merge(rf, on="label", how="left")
        for col in ("n_internal", "n_outgoing"):
            j[col] = j[col].fillna(0).astype(np.int64)
        return j[["label", "n_nodes", "n_internal", "n_outgoing"]]

    i64 = pa.int64()
    return shuffle.co_group(
        nn, esum, "label", "label", fill,
        l_schema=pa.schema([("label", i64), ("n_nodes", i64)]),
        r_schema=pa.schema([("label", i64), ("n_internal", i64),
                            ("n_outgoing", i64)]))


LOUVAIN_LOCAL_GATE = 1 << 22


def _louvain_move_local(nd_labels: pd.DataFrame, edges: pd.DataFrame,
                        m: int) -> pa.Table:
    """Single-task pandas replica of the distributed move round — the
    SAME relational plan (degrees, volumes, candidate union with self
    rows, integer score, (s DESC, c ASC) argmax) in one process; gated
    at LOUVAIN_LOCAL_GATE edge rows (coloring/truss precedent), parity
    vs the distributed path forced in tests."""
    ko = edges.groupby("src")["w"].sum()
    ki = edges.groupby("dst")["w"].sum()
    nd = pd.DataFrame({"v": nd_labels["node_id"].to_numpy(np.int64),
                       "lv": nd_labels["label"].to_numpy(np.int64)})
    nd["kout"] = nd["v"].map(ko).fillna(0).astype(np.int64)
    nd["kin"] = nd["v"].map(ki).fillna(0).astype(np.int64)
    vol = nd.groupby("lv")[["kout", "kin"]].sum().rename(
        columns={"kout": "kout_c", "kin": "kin_c"})
    lvmap = nd.set_index("v")["lv"]
    cand = pd.concat([
        pd.DataFrame({"v": edges["src"].to_numpy(np.int64),
                      "c": edges["dst"].map(lvmap).to_numpy(np.int64),
                      "w": edges["w"].to_numpy(np.int64)}),
        pd.DataFrame({"v": edges["dst"].to_numpy(np.int64),
                      "c": edges["src"].map(lvmap).to_numpy(np.int64),
                      "w": edges["w"].to_numpy(np.int64)}),
        pd.DataFrame({"v": nd["v"], "c": nd["lv"],
                      "w": np.zeros(len(nd), dtype=np.int64)})])
    cand = cand.groupby(["v", "c"], as_index=False)["w"].sum()
    cand = cand.merge(nd, on="v").merge(vol, left_on="c",
                                        right_index=True)
    own = (cand["c"] == cand["lv"]).to_numpy().astype(np.int64)
    cand["s"] = (m * cand["w"].to_numpy(np.int64)
                 - cand["kout"].to_numpy(np.int64)
                 * (cand["kin_c"].to_numpy(np.int64)
                    - own * cand["kin"].to_numpy(np.int64))
                 - cand["kin"].to_numpy(np.int64)
                 * (cand["kout_c"].to_numpy(np.int64)
                    - own * cand["kout"].to_numpy(np.int64)))
    best = (cand.sort_values(["v", "s", "c"],
                             ascending=[True, False, True])
            .drop_duplicates("v"))
    return pa.table({"node_id": pa.array(best["v"].to_numpy(np.int64)),
                     "community": pa.array(best["c"].to_numpy(np.int64))})


@ray.remote
def _louvain_move_local_task(label_blocks, edge_blocks, m: int) -> pa.Table:
    i64 = pa.int64()
    lsch = pa.schema([("node_id", i64), ("label", i64)])
    esch = pa.schema([("src", i64), ("dst", i64), ("w", i64)])

    def cat(blocks, sch):
        # shuffle stages emit zero-column empty blocks — drop them and
        # pin the expected schema
        ts = [t.select(sch.names).cast(sch) for t in blocks
              if t.num_columns]
        return pa.concat_tables(ts) if ts else sch.empty_table()

    lt = cat(label_blocks, lsch)
    et = cat(edge_blocks, esch)
    return _louvain_move_local(lt.to_pandas(), et.to_pandas(), m)


def _louvain_move_round(labels: ray.data.Dataset,
                        edges_w: ray.data.Dataset, m: int,
                        npart: int, mode: str = "auto"
                        ) -> ray.data.Dataset:
    """ONE deterministic synchronous Louvain local-move round over a
    WEIGHTED directed multigraph: node v moves to the candidate community
    c (its own + every in/out-neighbor community) maximizing the directed
    modularity gain. The gain comparison is integer-exact — score s_c =
    m·w_vc − kout_v·(Kin_c\\v) − kin_v·(Kout_c\\v) with w_vc = total edge
    weight between v and c in either direction and C\\v excluding v's own
    weighted degrees when c is v's current community — ties to the
    smallest c (int64 safe while m·w < 2⁶³, the events_modularity bound).

    ``labels`` = (node_id, label); ``edges_w`` = (src, dst, w), already
    materialized. Plan: weighted degrees (two grouped sums) and labels
    left-join into a per-node table; labeled edges via the two
    co-partitioned hash_joins (the modularity shape); candidate weights =
    one grouped sum over the union of out-side, in-side and
    always-present self rows; scores attach via two more keyed joins; one
    grouped_apply argmax per node. Everything is keyed shuffles — nothing
    community- or node-sized on the driver. ``mode``: "auto" gates the
    single-task pandas path at LOUVAIN_LOCAL_GATE edge rows;
    "distributed" forces the keyed-shuffle plan (tests)."""
    if mode not in ("auto", "distributed"):
        raise ValueError(f"mode must be auto|distributed, got {mode!r}")
    edges = edges_w
    if mode == "auto" and edges.count() <= LOUVAIN_LOCAL_GATE:
        lt = ray.get(labels.to_arrow_refs())
        et = ray.get(edges.to_arrow_refs())
        return ray.data.from_arrow(
            ray.get(_louvain_move_local_task.remote(lt, et, m)))
    i64 = pa.int64()

    def col(*cols):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({out: t.column(src).cast(i64)
                             for out, src in cols})
        return f

    kout = shuffle.grouped_agg(
        edges.map_batches(col(("node_id", "src"), ("w", "w")),
                          batch_format="pyarrow"),
        ["node_id"], {"kout": ("w", "sum")}, num_partitions=npart)
    kin = shuffle.grouped_agg(
        edges.map_batches(col(("node_id", "dst"), ("w", "w")),
                          batch_format="pyarrow"),
        ["node_id"], {"kin": ("w", "sum")}, num_partitions=npart)
    nd = shuffle.hash_join(
        labels.map_batches(col(("node_id", "node_id"), ("lv", "label")),
                           batch_format="pyarrow"),
        kout, on="node_id", l_cols=["lv"], r_cols=["kout"],
        how="left", fill={"kout": 0}, num_partitions=npart)
    nd = shuffle.hash_join(
        nd, kin, on="node_id", l_cols=["lv", "kout"], r_cols=["kin"],
        how="left", fill={"kin": 0}, num_partitions=npart).materialize()

    vol = shuffle.grouped_agg(
        nd.map_batches(col(("c", "lv"), ("kout", "kout"),
                           ("kin", "kin")), batch_format="pyarrow"),
        ["c"], {"kout_c": ("kout", "sum"), "kin_c": ("kin", "sum")},
        num_partitions=npart)

    le = shuffle.hash_join(
        edges.map_batches(col(("node_id", "src"), ("dst", "dst"),
                              ("w", "w")),
                          batch_format="pyarrow"),
        nd.map_batches(col(("node_id", "node_id"), ("lsrc", "lv")),
                       batch_format="pyarrow"),
        on="node_id", l_cols=["dst", "w"], r_cols=["lsrc"],
        num_partitions=npart).map_batches(
        col(("src_node", "node_id"), ("node_id", "dst"),
            ("lsrc", "lsrc"), ("w", "w")), batch_format="pyarrow")
    le = shuffle.hash_join(
        le,
        nd.map_batches(col(("node_id", "node_id"), ("ldst", "lv")),
                       batch_format="pyarrow"),
        on="node_id", l_cols=["src_node", "lsrc", "w"], r_cols=["ldst"],
        num_partitions=npart)

    def sides(t: pa.Table) -> pa.Table:
        sn = t.column("src_node").to_numpy().astype(np.int64)
        dn = t.column("node_id").to_numpy().astype(np.int64)
        ls = t.column("lsrc").to_numpy().astype(np.int64)
        ld = t.column("ldst").to_numpy().astype(np.int64)
        w = t.column("w").to_numpy().astype(np.int64)
        return pa.table({"v": pa.array(np.concatenate([sn, dn])),
                         "c": pa.array(np.concatenate([ld, ls])),
                         "w": pa.array(np.concatenate([w, w]))})

    self_rows = nd.map_batches(
        lambda t: pa.table({"v": t.column("node_id").cast(i64),
                            "c": t.column("lv").cast(i64),
                            "w": pa.array(np.zeros(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    cand = shuffle.grouped_agg(
        le.map_batches(sides, batch_format="pyarrow").union(self_rows),
        ["v", "c"], {"w": ("w", "sum")}, num_partitions=npart)

    cand = shuffle.hash_join(
        cand,
        nd.map_batches(col(("v", "node_id"), ("lv", "lv"),
                           ("kout", "kout"), ("kin", "kin")),
                       batch_format="pyarrow"),
        on="v", l_cols=["c", "w"], r_cols=["lv", "kout", "kin"],
        num_partitions=npart)
    cand = shuffle.hash_join(
        cand, vol, on="c", l_cols=["v", "w", "lv", "kout", "kin"],
        r_cols=["kout_c", "kin_c"], num_partitions=npart)

    def score(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy().astype(np.int64)
        lv = t.column("lv").to_numpy().astype(np.int64)
        own = (c == lv).astype(np.int64)
        kout_v = t.column("kout").to_numpy().astype(np.int64)
        kin_v = t.column("kin").to_numpy().astype(np.int64)
        s = (m * t.column("w").to_numpy().astype(np.int64)
             - kout_v * (t.column("kin_c").to_numpy().astype(np.int64)
                         - own * kin_v)
             - kin_v * (t.column("kout_c").to_numpy().astype(np.int64)
                        - own * kout_v))
        return pa.table({"v": t.column("v").cast(i64), "c": pa.array(c),
                         "s": pa.array(s)})

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        best = (df.sort_values(["v", "s", "c"],
                               ascending=[True, False, True])
                .drop_duplicates("v"))
        return pd.DataFrame({
            "node_id": best["v"].to_numpy(dtype=np.int64),
            "community": best["c"].to_numpy(dtype=np.int64)})

    return shuffle.grouped_apply(
        cand.map_batches(score, batch_format="pyarrow"), ["v"], argmax,
        num_partitions=npart)


_LOUVAIN1_CACHE: dict = {}


def _louvain1_cached(sf_dir: str) -> ray.data.Dataset:
    """Level-1 Louvain move output (node_id, community) computed ONCE per
    events fingerprint — shared by louvain_move and louvain_coarse."""
    key = (sf_dir, _events_fp(sf_dir))
    if key not in _LOUVAIN1_CACHE:
        _evict_stale(_LOUVAIN1_CACHE, key)
        lp = ray.data.from_arrow(_lp_cached(sf_dir))
        edges = events_edges_ds(sf_dir).map_batches(
            lambda t: t.append_column(
                "w", pa.array(np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow").materialize()
        m = edges.count()
        # all wide steps are keyed shuffles: size their task count to
        # the input (a fixed 32 is pure dispatch floor at test scale)
        npart = max(4, min(64, edges.num_blocks()))
        _LOUVAIN1_CACHE[key] = _louvain_move_round(
            lp, edges, m, npart).materialize()
    return _LOUVAIN1_CACHE[key]


def q_events_louvain_move(sf_dir: str):
    """(node_id, community) — ONE deterministic synchronous Louvain
    local-move round refining the label-propagation partition (unit edge
    weights; see _louvain_move_round for the integer-exact gain spec)."""
    return _louvain1_cached(sf_dir)


def q_events_louvain_coarse(sf_dir: str):
    """(node_id, community) — Louvain PHASE 2: the level-1 move partition
    is coarsened into a weighted super-graph (one node per community,
    super-edge weight = number of original edges between the two
    communities, self-loops kept — the aggregate graph of Blondel et al.
    2008) and ONE weighted move round runs on it with the SAME total
    weight m; each original node then inherits its community's level-2
    assignment. All coarsening steps are keyed shuffles (two hash_joins
    + one grouped sum); the super-graph is community-sized, so the
    second round's shuffles shrink with the partition."""
    l1 = _louvain1_cached(sf_dir)
    edges = events_edges_ds(sf_dir).materialize()
    m = edges.count()
    npart = max(4, min(64, edges.num_blocks()))
    i64 = pa.int64()

    def col(*cols):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({out: t.column(src).cast(i64)
                             for out, src in cols})
        return f

    # coarse edges: endpoint communities attach via two keyed joins,
    # then one grouped sum -> (src, dst, w) at community granularity
    ce = shuffle.hash_join(
        edges.map_batches(col(("node_id", "src"), ("dst", "dst")),
                          batch_format="pyarrow"),
        l1.map_batches(col(("node_id", "node_id"), ("csrc", "community")),
                       batch_format="pyarrow"),
        on="node_id", l_cols=["dst"], r_cols=["csrc"],
        num_partitions=npart).map_batches(
        col(("node_id", "dst"), ("csrc", "csrc")),
        batch_format="pyarrow")
    ce = shuffle.hash_join(
        ce,
        l1.map_batches(col(("node_id", "node_id"), ("cdst", "community")),
                       batch_format="pyarrow"),
        on="node_id", l_cols=["csrc"], r_cols=["cdst"],
        num_partitions=npart)
    ce = shuffle.grouped_agg(
        ce.map_batches(col(("src", "csrc"), ("dst", "cdst")),
                       batch_format="pyarrow"),
        ["src", "dst"], {"w": (None, "count")},
        num_partitions=npart).materialize()

    # identity init: every community is its own label on the super-graph
    cl = shuffle.distinct(
        l1.map_batches(col(("node_id", "community"),
                           ("label", "community")),
                       batch_format="pyarrow"),
        ["node_id", "label"], num_partitions=npart)
    # the second round's shuffles size to the SUPER-graph (community-
    # granular), not the original edge count — below the gate it runs
    # as one task anyway
    npart2 = max(4, min(64, ce.count() // 500_000 + 4))
    l2 = _louvain_move_round(cl, ce, m, npart2)

    # original nodes inherit their community's level-2 assignment
    out = shuffle.hash_join(
        l1.map_batches(col(("node_id", "community"), ("v", "node_id")),
                       batch_format="pyarrow"),
        l2.map_batches(col(("node_id", "node_id"),
                           ("community", "community")),
                       batch_format="pyarrow"),
        on="node_id", l_cols=["v"], r_cols=["community"],
        num_partitions=npart)
    return out.map_batches(col(("node_id", "v"),
                               ("community", "community")),
                           batch_format="pyarrow")


LOUVAIN_MAX_LEVELS = 6


def _coarsen_w(assign: ray.data.Dataset, ew: ray.data.Dataset,
               npart: int) -> ray.data.Dataset:
    """Coarsen weighted edges (src, dst, w) by an assignment (node_id,
    community): endpoint communities attach via two keyed hash_joins,
    then one grouped sum — (src, dst, w) at community granularity,
    self-loops kept, total weight preserved."""
    i64 = pa.int64()

    def col(*cols):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({out: t.column(src).cast(i64)
                             for out, src in cols})
        return f

    ce = shuffle.hash_join(
        ew.map_batches(col(("node_id", "src"), ("dst", "dst"),
                           ("w", "w")), batch_format="pyarrow"),
        assign.map_batches(col(("node_id", "node_id"),
                               ("csrc", "community")),
                           batch_format="pyarrow"),
        on="node_id", l_cols=["dst", "w"], r_cols=["csrc"],
        num_partitions=npart).map_batches(
        col(("node_id", "dst"), ("csrc", "csrc"), ("w", "w")),
        batch_format="pyarrow")
    ce = shuffle.hash_join(
        ce,
        assign.map_batches(col(("node_id", "node_id"),
                               ("cdst", "community")),
                           batch_format="pyarrow"),
        on="node_id", l_cols=["csrc", "w"], r_cols=["cdst"],
        num_partitions=npart)
    return shuffle.grouped_agg(
        ce.map_batches(col(("src", "csrc"), ("dst", "cdst"), ("w", "w")),
                       batch_format="pyarrow"),
        ["src", "dst"], {"w": ("w", "sum")},
        num_partitions=npart).materialize()


def _qnum_of(ce: ray.data.Dataset, m: int, npart: int) -> int:
    """Integer modularity numerator of the partition whose community
    graph is ``ce``: q_num = m·Σ_c self_w(c) − Σ_c Kout_c·Kin_c (the
    events_modularity convention, q_den = m²). Only per-block partial
    sums reach the driver."""
    i64 = pa.int64()

    def self_part(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        w = t.column("w").to_numpy().astype(np.int64)
        return pa.table({"x": pa.array([int(w[s == d].sum())], type=i64)})

    self_w = int(ce.map_batches(self_part, batch_format="pyarrow")
                 .to_pandas()["x"].sum())
    ko = shuffle.grouped_agg(
        ce.map_batches(lambda t: pa.table(
            {"c": t.column("src").cast(i64),
             "w": t.column("w").cast(i64)}), batch_format="pyarrow"),
        ["c"], {"kout": ("w", "sum")}, num_partitions=npart)
    ki = shuffle.grouped_agg(
        ce.map_batches(lambda t: pa.table(
            {"c": t.column("dst").cast(i64),
             "w": t.column("w").cast(i64)}), batch_format="pyarrow"),
        ["c"], {"kin": ("w", "sum")}, num_partitions=npart)
    prod = shuffle.hash_join(ko, ki, on="c", l_cols=["kout"],
                             r_cols=["kin"], num_partitions=npart)

    def prod_part(t: pa.Table) -> pa.Table:
        v = (t.column("kout").to_numpy().astype(np.int64)
             * t.column("kin").to_numpy().astype(np.int64)).sum()
        return pa.table({"x": pa.array([int(v)], type=i64)})

    vol = int(prod.map_batches(prod_part, batch_format="pyarrow")
              .to_pandas()["x"].sum())
    return m * self_w - vol


def louvain_full(sf_dir: str, max_levels: int = LOUVAIN_MAX_LEVELS,
                 checkpoint_dir: str | None = None
                 ) -> tuple[ray.data.Dataset, int, list[int]]:
    """Hierarchical Louvain to convergence (Blondel et al. 2008 §2,
    adapted to the repo's deterministic synchronous move round): level 1
    is the node-granular move from the label-propagation partition
    (shared via _louvain1_cached); every later level coarsens the
    accepted partition into its weighted super-graph, runs ONE weighted
    move round with identity labels and composes the assignment back to
    original nodes. A level is ACCEPTED iff the integer modularity
    numerator strictly increases (exact — no float epsilon); the loop
    stops on the first rejected level (levels >= 2 are then fixed points:
    identical inputs reproduce the identical rejected candidate) or at
    ``max_levels``. Returns (assignment dataset, accepted level count,
    q_num trace). Super-graphs shrink with the partition, so each
    level's shuffles are community-granular."""
    i64 = pa.int64()
    lp = ray.data.from_arrow(_lp_cached(sf_dir)).map_batches(
        lambda t: pa.table({"node_id": t.column("node_id").cast(i64),
                            "community": t.column("label").cast(i64)}),
        batch_format="pyarrow").materialize()
    edges_w = events_edges_ds(sf_dir).map_batches(
        lambda t: t.append_column(
            "w", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow").materialize()
    m = edges_w.count()
    return louvain_full_core(lp, edges_w, m,
                             level1=_louvain1_cached(sf_dir),
                             max_levels=max_levels,
                             checkpoint_dir=checkpoint_dir)


def _louvain_ckpt_latest(root: str) -> dict | None:
    """Highest complete level manifest (the truss/checkpoint.py
    commit-point convention)."""
    import json
    import re

    if not os.path.isdir(root):
        return None
    best = None
    for name in os.listdir(root):
        mm = re.fullmatch(r"level_(\d{6})", name)
        if not mm:
            continue
        mf = os.path.join(root, name, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                man = json.load(f)
            if man.get("complete") and (best is None
                                        or man["level"] > best["level"]):
                best = man
    return best


def _louvain_ckpt_write(root: str, level: int, p: ray.data.Dataset,
                        ce: ray.data.Dataset, q: int, trace: list[int],
                        m: int, fp: int) -> tuple[ray.data.Dataset,
                                                  ray.data.Dataset]:
    """Persist one ACCEPTED level (assignment + community graph +
    loop scalars), manifest last (atomic rename); dirs cleared first
    (write_parquet appends). Returns disk-anchored datasets."""
    import json
    import shutil

    d = os.path.join(root, f"level_{level:06d}")
    if os.path.isdir(d):
        shutil.rmtree(d)
    ad = os.path.join(d, "assign")
    cd = os.path.join(d, "ce")
    os.makedirs(ad, exist_ok=True)
    os.makedirs(cd, exist_ok=True)
    p.write_parquet(ad)
    ce.write_parquet(cd)
    manifest = {"level": int(level), "q": int(q),
                "trace": [int(x) for x in trace], "m": int(m),
                "fp": int(fp), "assign_dir": ad, "ce_dir": cd,
                "complete": True}
    tmp = os.path.join(d, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, "manifest.json"))
    i64 = pa.int64()
    p2 = ray.data.read_parquet(ad).map_batches(
        lambda t: pa.table({"node_id": t.column("node_id").cast(i64),
                            "community": t.column("community").cast(i64)}),
        batch_format="pyarrow")
    ce2 = ray.data.read_parquet(cd).map_batches(
        lambda t: pa.table({"src": t.column("src").cast(i64),
                            "dst": t.column("dst").cast(i64),
                            "w": t.column("w").cast(i64)}),
        batch_format="pyarrow")
    return p2, ce2


def _edges_fp_w(ew: ray.data.Dataset) -> int:
    """Order-free fingerprint of a weighted edge set (truss._edge_fp
    extended with w) — stale-checkpoint guard."""
    mod = (1 << 61) - 1

    def part(t: pa.Table) -> pa.Table:
        a = t.column("src").to_numpy().astype(np.int64)
        b = t.column("dst").to_numpy().astype(np.int64)
        w = t.column("w").to_numpy().astype(np.int64)
        v = (((a % mod) * 1_000_003 + b) % mod * 8191 + w) % mod
        return pa.table({"x": pa.array([int(v.sum() % mod)],
                                       type=pa.int64())})

    s = ew.map_batches(part, batch_format="pyarrow").to_pandas()
    return int(s["x"].sum() % mod)


def louvain_full_core(init_labels: ray.data.Dataset,
                      edges_w: ray.data.Dataset, m: int,
                      level1: ray.data.Dataset | None = None,
                      max_levels: int = LOUVAIN_MAX_LEVELS,
                      checkpoint_dir: str | None = None
                      ) -> tuple[ray.data.Dataset, int, list[int]]:
    """The loop of louvain_full over explicit inputs (tests plant
    multi-scale graphs here): ``init_labels`` (node_id, community),
    ``edges_w`` (src, dst, w) materialized, ``level1`` an optional
    precomputed node-granular move output (computed from init_labels
    when absent). ``checkpoint_dir``: persist every ACCEPTED level
    (assignment + community graph + q trace) and RESUME from the
    highest complete one — the truss round-manifest story on the
    hierarchy loop; guarded by (m, weighted-edge fingerprint)."""
    i64 = pa.int64()

    def col(*cols):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({out: t.column(src).cast(i64)
                             for out, src in cols})
        return f

    npart = max(4, min(64, edges_w.num_blocks()))
    fp = _edges_fp_w(edges_w) if checkpoint_dir is not None else 0
    start_k = 2
    restored = False
    if checkpoint_dir is not None:
        man = _louvain_ckpt_latest(checkpoint_dir)
        if man is not None and man["m"] == m and man.get("fp") == fp:
            p = ray.data.read_parquet(man["assign_dir"]).map_batches(
                col(("node_id", "node_id"), ("community", "community")),
                batch_format="pyarrow").materialize()
            ce = ray.data.read_parquet(man["ce_dir"]).map_batches(
                col(("src", "src"), ("dst", "dst"), ("w", "w")),
                batch_format="pyarrow").materialize()
            q = man["q"]
            trace = list(man["trace"])
            levels = man["level"]
            start_k = levels + 1
            restored = True
    if not restored:
        p = init_labels
        ce = _coarsen_w(p, edges_w, npart)
        q = _qnum_of(ce, m, npart)
        trace = [q]
        levels = 0

        # level 1: node-granular move (cached, shared with louvain_move)
        if level1 is None:
            level1 = _louvain_move_round(
                p.map_batches(col(("node_id", "node_id"),
                                  ("label", "community")),
                              batch_format="pyarrow"),
                edges_w, m, npart).materialize()
        mva = level1
        ce_a = _coarsen_w(mva, edges_w, npart)
        q_a = _qnum_of(ce_a, m, npart)
        trace.append(q_a)
        if q_a > q:
            p, ce, q, levels = mva, ce_a, q_a, 1
            if checkpoint_dir is not None:
                p, ce = _louvain_ckpt_write(checkpoint_dir, 1, p, ce,
                                            q, trace, m, fp)

    # levels 2..max: coarse move + compose; stop on first non-gain
    for k in range(start_k, max_levels + 1):
        npart2 = max(4, min(64, ce.count() // 500_000 + 4))
        cl = shuffle.distinct(
            p.map_batches(col(("node_id", "community"),
                              ("label", "community")),
                          batch_format="pyarrow"),
            ["node_id", "label"], num_partitions=npart2)
        sup = _louvain_move_round(cl, ce, m, npart2).materialize()
        cc = _coarsen_w(sup, ce, npart2)
        q_c = _qnum_of(cc, m, npart2)
        trace.append(q_c)
        if q_c <= q:
            break
        cand = shuffle.hash_join(
            p.map_batches(col(("node_id", "community"),
                              ("v", "node_id")), batch_format="pyarrow"),
            sup.map_batches(col(("node_id", "node_id"),
                                ("community", "community")),
                            batch_format="pyarrow"),
            on="node_id", l_cols=["v"], r_cols=["community"],
            num_partitions=npart).map_batches(
            col(("node_id", "v"), ("community", "community")),
            batch_format="pyarrow").materialize()
        p, ce, q, levels = cand, cc, q_c, k
        if checkpoint_dir is not None:
            p, ce = _louvain_ckpt_write(checkpoint_dir, k, p, ce, q,
                                        trace, m, fp)
    return p, levels, trace


def q_events_louvain_full(sf_dir: str):
    """(node_id, community) — hierarchical Louvain iterated to the
    modularity fixed point (see louvain_full); SQL-oracled by an
    unrolled per-level conditional-acceptance CTE chain that is
    idempotent past convergence."""
    return louvain_full(sf_dir)[0]


def q_events_modularity(sf_dir: str):
    """One-row directed modularity of the label-propagation partition
    (Leicht/Newman 2008: Q = Σ_c [e_c/m − Kout_c·Kin_c/m²] over the raw
    directed edge multiset — the objective LP implicitly climbs). Kept as
    the exact integer pair (q_num, q_den) with q_num = Σ_c (m·e_c −
    Kout_c·Kin_c) and q_den = m², so the DuckDB hash compare is exact and
    callers divide at display time. int64 is safe while m·e_c < 2⁶³
    (m < ~3·10⁹ edges per partition-disjoint label set); beyond that the
    per-label fold would move to the decimal128 path. Labels attach to
    edge endpoints via two co-partitioned hash_joins (the
    community_stats shape); each labeled edge then emits its source-side
    (e_c, Kout) and target-side (Kin) contributions into ONE label-keyed
    grouped_agg, and the per-label table folds to a single row through a
    per-block partial — nothing n-sized ever reaches the driver."""
    lp = ray.data.from_arrow(_lp_cached(sf_dir))
    edges = events_edges_ds(sf_dir)
    m = edges.count()
    j1 = shuffle.hash_join(
        edges.map_batches(lambda t: pa.table({
            "node_id": t.column("src").cast(pa.int64()),
            "dst": t.column("dst").cast(pa.int64())}),
            batch_format="pyarrow"),
        lp.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"),
            "lsrc": t.column("label").cast(pa.int64())}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["dst"], r_cols=["lsrc"]).map_batches(
        lambda t: pa.table({"node_id": t.column("dst"),
                            "lsrc": t.column("lsrc")}),
        batch_format="pyarrow")
    j2 = shuffle.hash_join(
        j1,
        lp.map_batches(lambda t: pa.table({
            "node_id": t.column("node_id"),
            "ldst": t.column("label").cast(pa.int64())}),
            batch_format="pyarrow"),
        on="node_id", l_cols=["lsrc"], r_cols=["ldst"])

    def sides(t: pa.Table) -> pa.Table:
        ls = t.column("lsrc").to_numpy()
        ld = t.column("ldst").to_numpy()
        same = (ls == ld).astype(np.int64)
        zero = np.zeros(len(ls), dtype=np.int64)
        one = np.ones(len(ls), dtype=np.int64)
        return pa.table({
            "label": pa.array(np.concatenate([ls, ld])),
            "e": pa.array(np.concatenate([same, zero])),
            "kout": pa.array(np.concatenate([one, zero])),
            "kin": pa.array(np.concatenate([zero, one]))})

    per = shuffle.grouped_agg(
        j2.map_batches(sides, batch_format="pyarrow"),
        ["label"], {"e_c": ("e", "sum"), "kout": ("kout", "sum"),
                    "kin": ("kin", "sum")})

    def contrib(t: pa.Table) -> pa.Table:
        e_c = t.column("e_c").to_numpy().astype(np.int64)
        ko = t.column("kout").to_numpy().astype(np.int64)
        ki = t.column("kin").to_numpy().astype(np.int64)
        return pa.table({"part": pa.array(
            [int((m * e_c - ko * ki).sum())], type=pa.int64())})

    parts = per.map_batches(contrib, batch_format="pyarrow").to_pandas()
    q_num = int(parts["part"].sum()) if len(parts) else 0
    return pa.table({"q_num": pa.array([q_num], type=pa.int64()),
                     "q_den": pa.array([m * m], type=pa.int64()),
                     "m": pa.array([m], type=pa.int64())})


def q_bfs_events(sf_dir: str):
    g = events_graph(sf_dir)
    bfs(g, root=0)
    st = g.collect_state(["parent", "level"])
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "parent": pa.array(st["parent"]),
                     "level": pa.array(st["level"])})


_LP_CACHE: dict = {}


def _lp_cached(sf_dir: str) -> pa.Table:
    """LP labels computed ONCE per events fingerprint — shared by
    labelprop_events, events_modularity and events_louvain_move (the
    _tri_cached pattern; the 20-wave engine run is the expensive part)."""
    key = (sf_dir, _events_fp(sf_dir))
    if key not in _LP_CACHE:
        _evict_stale(_LP_CACHE, key)
        g = events_graph(sf_dir)
        label_propagation(g, max_iterations=20)
        st = g.collect_state(["labels"])
        _LP_CACHE[key] = pa.table({
            "node_id": pa.array(np.arange(g.n, dtype=np.int64)),
            "label": pa.array(st["labels"])})
    return _LP_CACHE[key]


def q_labelprop_events(sf_dir: str):
    return _lp_cached(sf_dir)


def q_events_sessions(sf_dir: str):
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_id", "ts", "user_id"])
    return windows.sessionize(ev)


def q_events_markov(sf_dir: str):
    """(prev_type, event_type, n) — first-order Markov transition counts
    over each user's timeline, ordered by (ts, event_id) (event_id breaks
    timestamp ties deterministically — same total order as the SQL lag()
    window). Scale shape: one user-keyed grouped_apply (each user's
    timeline sorts inside its partition, counts collapse to at most
    |types|^2 rows per partition) + one tiny keyed sum — the sort is
    per-partition, never a Dataset-level global sort."""
    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_id", "ts", "user_id", "event_type"])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "prev_type": pd.Series([], dtype=object),
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id")["event_type"].shift(1)
        m = prev.notna()
        out = pd.DataFrame({"prev_type": prev[m],
                            "event_type": df["event_type"][m]})
        return (out.groupby(["prev_type", "event_type"], as_index=False)
                .size().rename(columns={"size": "n"}))

    parts = shuffle.grouped_apply(ev, ["user_id"], per_part)
    return shuffle.grouped_agg(parts, ["prev_type", "event_type"],
                               {"n": ("n", "sum")})


def q_events_interarrival(sf_dir: str):
    """(user_id, n_gaps, sum_dt_us, sum_dt2_ms2) — per-user inter-arrival
    moments over the (ts, event_id) total order: dt in exact integer
    microseconds; the second moment on the millisecond grid (dt_ms =
    dt_us // 1000) so Σdt² stays far inside int64 (max gap 36e9 µs
    squared would overflow; 36e6 ms squared × any plausible per-user gap
    count does not). Burstiness/CoV are trivial driver-side formulas
    over these integers — keeping the OUTPUT integral makes the DuckDB
    hash compare exact. Scale shape: one user-keyed grouped_apply (each
    user's timeline sorts inside its partition — never a Dataset-level
    global sort), output one row per user."""
    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_id", "ts", "user_id"])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                              "n_gaps": pd.Series([], dtype=np.int64),
                              "sum_dt_us": pd.Series([], dtype=np.int64),
                              "sum_dt2_ms2": pd.Series([], dtype=np.int64)})
        if not len(df):
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy(dtype=np.int64)
        t = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        dt = np.diff(t)
        same = u[1:] == u[:-1]
        dt = dt[same]
        uu = u[1:][same]
        if not len(uu):
            return empty
        dtm = dt // 1000
        out = pd.DataFrame({"user_id": uu, "dt": dt, "dt2": dtm * dtm})
        g = out.groupby("user_id", as_index=False).agg(
            n_gaps=("dt", "size"), sum_dt_us=("dt", "sum"),
            sum_dt2_ms2=("dt2", "sum"))
        return g.astype(np.int64)

    return shuffle.grouped_apply(ev, ["user_id"], per_part)


def q_events_funnel(sf_dir: str):
    """(stage, n_users) — ordered view->click->purchase conversion funnel
    (windows.funnel_counts); SQL oracle = three chained MIN-after joins."""
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["ts", "user_id", "event_type"])
    return windows.funnel_counts(ev)


def q_events_rolling(sf_dir: str):
    """(event_id, user_id, roll_cents) — per-event trailing sum of the
    previous 3 same-user events' integer cents in (ts, event_id) order
    (windows.rolling_user_sum); SQL oracle = the equivalent
    ROWS BETWEEN window SUM."""
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_id", "ts", "user_id", "value"])
    return windows.rolling_user_sum(ev)


def q_events_props_agg(sf_dir: str):
    """Semi-structured ETL: parse the ``props`` JSON column, extract the
    integer field ``k``, aggregate per event_type (n, k_sum, k_max; rows
    with no parseable ``k`` excluded). Per-batch json.loads is the
    inherent per-document cost (like the HTML parse); everything after is
    one grouped_agg. SQL oracle: DuckDB json_extract."""
    import json

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        types, ks = [], []
        for et, p in zip(t.column("event_type").to_pylist(),
                         t.column("props").to_pylist()):
            try:
                v = json.loads(p).get("k")
            except (ValueError, AttributeError):
                continue
            if isinstance(v, bool) or not isinstance(v, int):
                continue
            types.append(et)
            ks.append(v)
        return pa.table({
            "event_type": pa.array(types, type=pa.string()),
            "k": pa.array(np.asarray(ks, dtype=np.int64))})

    agg = shuffle.grouped_agg(
        ev.map_batches(parse, batch_format="pyarrow"), ["event_type"],
        {"n": (None, "count"), "k_sum": ("k", "sum"),
         "k_max": ("k", "max")})
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t.column("event_type").cast(pa.string()),
            "n": t.column("n").cast(pa.int64()),
            "k_sum": t.column("k_sum").cast(pa.int64()),
            "k_max": t.column("k_max").cast(pa.int64())}),
        batch_format="pyarrow")


def q_events_windows(sf_dir: str):
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["ts", "value"])
    return windows.tumbling_window_counts(ev)


WINDOW_TOPK = 3


def q_events_window_topk(sf_dir: str):
    """(window_start_us, event_type, n, rank) — per-tumbling-1h-window
    top-WINDOW_TOPK event types by count (ties: count desc, type asc) —
    the per-window heavy-hitters readout a streaming dashboard keeps.
    Scale shape: one partial-combined grouped count on (window, type) —
    the combined table is |windows| x |types| tiny — then ONE
    window-keyed grouped_apply ranks in-partition; no global sort."""
    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["ts", "event_type"])
    window_us = 3_600_000_000

    def bucket(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({
            "window_start_us": pa.array((ts // window_us) * window_us),
            "event_type": t.column("event_type")})

    counts = shuffle.grouped_agg(
        ev.map_batches(bucket, batch_format="pyarrow"),
        ["window_start_us", "event_type"], {"n": (None, "count")})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "window_start_us": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64)})
        if not len(df):
            return empty
        df = df.sort_values(["window_start_us", "n", "event_type"],
                            ascending=[True, False, True])
        k = df.groupby("window_start_us").cumcount() + 1
        out = df.assign(rank=k.astype(np.int64))
        out = out[out["rank"] <= WINDOW_TOPK]
        return out[["window_start_us", "event_type", "n", "rank"]]

    return shuffle.grouped_apply(counts, ["window_start_us"], topk)


def q_events_hopping(sf_dir: str):
    """1-hour windows hopping every 15 minutes (4 overlapping windows per
    event) — the sliding-window counterpart of events_windows."""
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["ts", "value"])
    return windows.hopping_window_counts(ev)


def q_events_window_late(sf_dir: str):
    """(window_start_us, n_events, sum_value_cents, n_late) — event-time
    tumbling windows under a bounded-lateness watermark over the
    deterministic md5(event_id) arrival shuffle, late events dropped and
    counted (see windows.late_window_counts); the oracle replays the
    same lateness rule with one SQL running-max window function."""
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_id", "ts", "value"])
    return windows.late_window_counts(ev)


def q_events_range_join(sf_dir: str):
    """(owner, n_points) — banded RANGE JOIN count (the inequality join
    Ray Data lacks; windows.banded_interval_count): for every user's
    onboarding interval [first event, +2h) the number of events from
    ANY user falling inside it. Points band by ts, intervals replicate
    to their spanned bands, one band-keyed co_group with per-band
    binary-search counts — no cross product materializes."""
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["ts", "user_id"])

    def pts(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({"ts_us": pa.array(ts)})

    def owner_ts(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({
            "owner": t.column("user_id").cast(pa.int64()),
            "ts_us": pa.array(ts)})

    iv = shuffle.grouped_agg(
        ev.map_batches(owner_ts, batch_format="pyarrow"),
        ["owner"], {"lo": ("ts_us", "min")}).map_batches(
        lambda t: pa.table({
            "owner": t.column("owner").cast(pa.int64()),
            "lo": t.column("lo").cast(pa.int64()),
            "hi": pc.add(t.column("lo").cast(pa.int64()),
                         pa.scalar(7_200_000_000, type=pa.int64()))}),
        batch_format="pyarrow")
    return windows.banded_interval_count(
        ev.map_batches(pts, batch_format="pyarrow"), iv)


def q_events_window_panes(sf_dir: str):
    """(window_start_us, n_on_time, n_late_acc, n_dropped,
    sum_value_cents) — the Beam pane taxonomy over the same watermarked
    replay as events_window_late: accepted events split into on-time
    panes vs late-pane refinements (watermark already past the window
    end at arrival), dropped events counted; the downstream contract a
    streaming consumer needs to handle refinements correctly."""
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_id", "ts", "value"])
    return windows.late_window_counts(ev, panes=True)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.001


PAGES_ORACLE_DIR = os.path.join(tempfile.gettempdir(),
                                "ligrust_pages_oracle")


def _pages_graph(sf_dir: str) -> tuple[str, DistGraph]:
    """Build-or-load the cached synthetic pages graph for this sf; returns
    (graph_dir, DistGraph). The dir carries the persisted ``edges`` and
    ``url_map`` parquet written by build_graph_from_pages."""
    n_pages = max(100, int(20000 * _sf_of(sf_dir)))
    key = ("pages", n_pages)
    gd = os.path.join(tempfile.gettempdir(), f"ligr_pages_{n_pages}")
    if key not in _GRAPH_CACHE:
        if not (os.path.exists(os.path.join(gd, "manifest.json"))
                and os.path.isdir(os.path.join(gd, "edges"))):
            pages = ray.data.from_arrow(generate_pages(n_pages, seed=42))
            build_graph_from_pages(pages, gd, num_partitions=4)
        _GRAPH_CACHE[key] = DistGraph.load(gd)
    return gd, _GRAPH_CACHE[key]


def _pages_rev_graph(sf_dir: str) -> DistGraph:
    """Reversed twin of the built pages graph (same n / partition bounds,
    so scc()'s aligned transfer_state applies) — built once from the
    persisted edges parquet, cached like every other graph artifact."""
    gd, g = _pages_graph(sf_dir)
    key = ("pages_rev", gd)
    rgd = gd + "_rev"
    if key not in _GRAPH_CACHE:
        if not os.path.exists(os.path.join(rgd, "manifest.json")):
            rev = _read_sized(
                os.path.join(gd, "edges"),
                columns=["src", "dst"]).map_batches(
                lambda t: pa.table({"src": t.column("dst"),
                                    "dst": t.column("src")}),
                batch_format="pyarrow")
            build_graph_from_edges(rev, rgd, n=g.n, num_partitions=4)
        _GRAPH_CACHE[key] = DistGraph.load(rgd)
    return _GRAPH_CACHE[key]


def q_pages_bowtie(sf_dir: str):
    """(node_id, cls) — the Broder et al. WWW'00 bow-tie decomposition of
    the BUILT pages link graph (the analysis the bow-tie picture was
    drawn for: crawled web pages with a giant core, IN/OUT flanks,
    tendrils and disconnected islands — the synthetic crawl's dead links
    give it all five regions). Same engine plan as events_bowtie: one
    forward-backward scc() run on the cached forward/reversed twins, the
    giant label (ties to smallest) from a per-block-folded distributed
    size count, two ReachEdge frontier sweeps seeded by the shard-local
    scc == giant predicate."""
    from ligrust_ray.algos.scc import bowtie_labels

    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    grev = _pages_rev_graph(sf_dir)
    cls = bowtie_labels(g, grev)
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "cls": pa.array(cls.astype(object), type=pa.string())})


def _refresh_pages_oracle(gd: str, n: int) -> None:
    """Copy the graph's edge table, url map and node universe to the FIXED
    ``PAGES_ORACLE_DIR`` path, so the static SQL strings in
    __ray_entry__.oracle_sql can score the same graph in DuckDB. A marker
    records (source dir, manifest mtime); matching markers skip the copy
    (both pages queries call this per run)."""
    import shutil

    import pyarrow.parquet as pq

    manifest = os.path.join(gd, "manifest.json")
    stamp = f"{gd}:{os.path.getmtime(manifest)}:{n}"
    marker = os.path.join(PAGES_ORACLE_DIR, "SOURCE")
    payload_ok = all(os.path.exists(os.path.join(PAGES_ORACLE_DIR, p))
                     for p in ("edges", "url_map", "nodes.parquet"))
    try:
        with open(marker) as fh:
            if fh.read() == stamp and payload_ok:   # self-heal if a tmp
                return                              # cleaner ate payloads
    except OSError:
        pass
    shutil.rmtree(PAGES_ORACLE_DIR, ignore_errors=True)
    shutil.copytree(os.path.join(gd, "edges"),
                    os.path.join(PAGES_ORACLE_DIR, "edges"))
    shutil.copytree(os.path.join(gd, "url_map"),
                    os.path.join(PAGES_ORACLE_DIR, "url_map"))
    pq.write_table(pa.table({"id": pa.array(np.arange(n, dtype=np.int64))}),
                   os.path.join(PAGES_ORACLE_DIR, "nodes.parquet"))
    with open(marker, "w") as fh:
        fh.write(stamp)


def q_pages_pagerank(sf_dir: str):
    """Flagship: synthetic Common-Crawl-style corpus (scaled by sf) ->
    extract -> build CSR -> PageRankDelta -> per-url rank (integer
    micro-units, like pagerank_events, so the value hash is
    addition-order independent). Oracled via ``_refresh_pages_oracle``."""
    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    page_rank_delta(g, max_iterations=50)
    st = g.collect_state(["page_rank"])
    ppm = np.floor(st["page_rank"] * 1e6 + 0.5).astype(np.int64)
    return pa.table({"node_id": pa.array(np.arange(g.n, dtype=np.int64)),
                     "rank_ppm": pa.array(ppm)})


_DOMAIN_RE = re.compile(r"https://([^/]+)/")


def _page_domains(gd: str) -> ray.data.Dataset:
    """(id, dom) map derived from the persisted url_map."""
    def to_dom(t: pa.Table) -> pa.Table:
        # UNANCHORED search — DuckDB regexp_extract also searches, so a
        # url embedding 'https://...' mid-string must match identically
        doms = [(lambda m: m[1] if m else "")(_DOMAIN_RE.search(u))
                for u in t.column("url").to_pylist()]
        return pa.table({"id": t.column("id").cast(pa.int64()),
                         "dom": pa.array(doms, type=pa.string())})

    return _read_sized(os.path.join(gd, "url_map")).map_batches(
        to_dom, batch_format="pyarrow")


def _domain_edge_rows(gd: str) -> ray.data.Dataset:
    """(src_domain, dst_domain) at PAGE-edge multiplicity: the persisted
    page edge table joined to its endpoint domains through two co_group
    passes. Fully distributed — nothing page-graph-sized on the driver."""
    dommap = _page_domains(gd)
    edges = _read_sized(os.path.join(gd, "edges"))

    e_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    m_schema = pa.schema([("id", pa.int64()), ("dom", pa.string())])
    e1_schema = pa.schema([("dst", pa.int64()), ("src_domain", pa.string())])

    def attach(key: str, out: str, keep: list[str]):
        def f(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            j = lf.merge(rf.rename(columns={"id": key, "dom": out}),
                         on=key, how="inner")
            return j[keep]
        return f

    e1 = shuffle.co_group(edges, dommap, l_on="src", r_on="id",
                          fn=attach("src", "src_domain",
                                    ["dst", "src_domain"]),
                          l_schema=e_schema, r_schema=m_schema)
    return shuffle.co_group(e1, dommap, l_on="dst", r_on="id",
                            fn=attach("dst", "dst_domain",
                                      ["src_domain", "dst_domain"]),
                            l_schema=e1_schema, r_schema=m_schema)


def q_pages_domain_graph(sf_dir: str):
    """Domain-level link graph (the host-graph collapse every web-corpus
    pipeline runs): page edges joined to their endpoint domains, grouped to
    (src_domain, dst_domain, n_edges)."""
    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    out = shuffle.grouped_agg(_domain_edge_rows(gd),
                              ["src_domain", "dst_domain"],
                              {"n_edges": (None, "count")})
    return out.map_batches(
        lambda t: pa.table({
            "src_domain": t.column("src_domain"),
            "dst_domain": t.column("dst_domain"),
            "n_edges": t.column("n_edges").cast(pa.int64())}),
        batch_format="pyarrow")


def _pages_domain_graph(sf_dir: str) -> tuple[str, DistGraph]:
    """Build-or-load the HOST-level graph: the pages link graph collapsed
    to domains (page-edge multiplicity preserved), domains re-id'd through
    the same distributed ``assign_ids`` / ``edges_with_ids`` machinery the
    page build uses, rolled into its own CSR dir with a persisted
    (dom, id) map. At crawl scale the host graph is ~10^4x smaller than
    the page graph (10^8 hosts vs 10^12 pages) but the collapse itself is
    page-graph-sized, so every step streams: two co_group joins to attach
    endpoint domains, bucket-ranked id assignment, one CSR shuffle."""
    import shutil

    from ligrust_ray.pipelines.build import assign_ids, edges_with_ids

    gd, gp = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, gp.n)
    n_pages = max(100, int(20000 * _sf_of(sf_dir)))
    key = ("pages_dom", n_pages)
    dgd = os.path.join(tempfile.gettempdir(), f"ligr_pages_dom_{n_pages}")
    if key not in _GRAPH_CACHE:
        if not (os.path.exists(os.path.join(dgd, "manifest.json"))
                and os.path.isdir(os.path.join(dgd, "dom_map"))):
            shutil.rmtree(dgd, ignore_errors=True)
            dom_edges = _domain_edge_rows(gd).map_batches(
                lambda t: pa.table({"src_url": t.column("src_domain"),
                                    "dst_url": t.column("dst_domain")}),
                batch_format="pyarrow")
            doms = _page_domains(gd).map_batches(
                lambda t: pa.table({"url": t.column("dom")}),
                batch_format="pyarrow")
            mapping, n_dom = assign_ids(doms)
            build_graph_from_edges(edges_with_ids(dom_edges, mapping),
                                   dgd, n=n_dom, num_partitions=4)
            mapping.map_batches(
                lambda t: pa.table({"dom": t.column("url"),
                                    "id": t.column("id")}),
                batch_format="pyarrow").write_parquet(
                    os.path.join(dgd, "dom_map"))
        _GRAPH_CACHE[key] = DistGraph.load(dgd)
    return dgd, _GRAPH_CACHE[key]


def q_pages_domain_pagerank(sf_dir: str):
    """(domain, rank_ppm) — HOST-level PageRank (the Common-Crawl
    host-ranking artifact): reference-semantics PageRankDelta over the
    domain-collapsed link graph built by _pages_domain_graph. Same
    round-1 fixed point as pagerank_events (n_domains >= 4), so the
    DuckDB oracle scores the closed form 0.15 + 0.85*sum_in (1/n)/outdeg
    on domain strings directly — id assignment cancels out. rank_ppm
    integer micro-units; ids map back to domains through one co_group
    join against the persisted dom_map (never a driver-side dict)."""
    dgd, g = _pages_domain_graph(sf_dir)
    page_rank_delta(g, max_iterations=50)
    st = g.collect_state(["page_rank"])
    ppm = np.floor(st["page_rank"] * 1e6 + 0.5).astype(np.int64)
    ranks = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(g.n, dtype=np.int64)),
        "rank_ppm": pa.array(ppm)}))

    def attach(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.merge(rf, on="id", how="inner")
        return j.rename(columns={"dom": "domain"})[["domain", "rank_ppm"]]

    i64 = pa.int64()
    return shuffle.co_group(
        ranks, _read_sized(os.path.join(dgd, "dom_map")),
        l_on="id", r_on="id", fn=attach,
        l_schema=pa.schema([("id", i64), ("rank_ppm", i64)]),
        r_schema=pa.schema([("dom", pa.string()), ("id", i64)]))


def q_pages_host_locality(sf_dir: str):
    """(host, n_links, n_intra, locality_permille) — per-host link
    LOCALITY (the crawl-analytics signal separating portal hosts from
    leaf content hosts): of each source host's page-level out-links, how
    many stay on the same host, as an exact integer permille
    (1000 * n_intra) // n_links. Rides the same two-co_group
    domain-attach plan as pages_domain_graph (``_domain_edge_rows``) —
    page-edge multiplicity preserved, nothing page-graph-sized on the
    driver — then ONE host-keyed partial-combined grouped_agg; the flag
    column makes intra-counting a sum, so the map-side combiner collapses
    each block to <= 1 row per host before the shuffle."""
    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)

    def flag(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t.column("src_domain"),
            "intra": pc.cast(pc.equal(t.column("src_domain"),
                                      t.column("dst_domain")), pa.int64())})

    agg = shuffle.grouped_agg(
        _domain_edge_rows(gd).map_batches(flag, batch_format="pyarrow"),
        ["host"], {"n_links": (None, "count"), "n_intra": ("intra", "sum")})

    def finish(t: pa.Table) -> pa.Table:
        nl = t.column("n_links").cast(pa.int64()).to_numpy()
        ni = t.column("n_intra").cast(pa.int64()).to_numpy()
        return pa.table({
            "host": t.column("host"),
            "n_links": pa.array(nl), "n_intra": pa.array(ni),
            "locality_permille": pa.array((1000 * ni) // nl)})

    return agg.map_batches(finish, batch_format="pyarrow")


HOST_CAP_K = 8       # crawl budget: pages kept per host


def q_pages_host_cap(sf_dir: str):
    """(url, host, k) — per-host crawl-budget sampling: keep the first
    HOST_CAP_K pages of every host under the deterministic priority
    rank k = ROW_NUMBER over (md5(url), url) (the same reproducible
    random tape as pages_crawl_order). This is the domain-cap rule
    crawl pipelines apply so mega-hosts don't dominate the corpus (the
    CC-News / C4 per-domain cap). Scale shape: ONE host-keyed
    grouped_apply — rank and filter happen together in the partition,
    so only the ≤ K survivors per host leave the shuffle; no global
    rank pass needed."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    urls = _read_sized(os.path.join(gd, "url_map"), columns=["url"])

    def hosted(t: pa.Table) -> pa.Table:
        ucol = t.column("url")
        hosts = [(lambda m: m[1] if m else "")(_DOMAIN_RE.search(u))
                 for u in ucol.to_pylist()]
        return pa.table({
            "url": ucol,
            "host": pa.array(hosts, type=pa.string()),
            "h": pa.array(md5_u64_lower_arrow(
                ucol.combine_chunks() if isinstance(ucol, pa.ChunkedArray)
                else ucol))})

    def cap_in_host(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"url": pd.Series([], dtype=object),
                              "host": pd.Series([], dtype=object),
                              "k": pd.Series([], dtype=np.int64)})
        if not len(df):
            return empty
        df = df.sort_values(["host", "h", "url"])
        hv = df["host"].to_numpy()
        idx = np.arange(len(df), dtype=np.int64)
        first = np.concatenate(([True], hv[1:] != hv[:-1]))
        base = np.where(first, idx, 0)
        np.maximum.accumulate(base, out=base)
        k = idx - base
        keep = k < HOST_CAP_K
        return pd.DataFrame({"url": df["url"].to_numpy()[keep],
                             "host": hv[keep], "k": k[keep]})

    return shuffle.grouped_apply(
        urls.map_batches(hosted, batch_format="pyarrow"),
        ["host"], cap_in_host)


def q_pages_crawl_order(sf_dir: str):
    """(url, host, k, crawl_pos) — POLITENESS-ORDERED crawl frontier
    scheduling (the ordering a polite fetcher wants: never hammer one
    host while others starve). Within each host, urls get a deterministic
    priority rank k = ROW_NUMBER over (md5_number_lower(url), url) — the
    hash is the reproducible random tape — and the global fetch order
    round-robins hosts: all k=0 urls first (one per host), then k=1, etc.
    crawl_pos is the 0-based global position under ORDER BY (k, host,
    url). Scale shape — two distributed rank scans (the docs_shuffle
    pattern, nothing n-length on the driver): (1) per-host k via one
    grouped_apply keyed on host; (2) the global rank buckets on the
    ORDER-PRESERVING composite (k, host[:2]) — bucket order IS output
    order, so per-bucket counts (one partial-combined grouped_agg) cumsum
    into base offsets on a tiny #buckets-row table that rides the object
    store into one grouped_apply computing in-bucket ranks vectorised.
    The host[:2] prefix splits the k=0 mega-bucket (#hosts rows at crawl
    scale) without breaking lexicographic order."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    urls = _read_sized(os.path.join(gd, "url_map"), columns=["url"])

    def hosted(t: pa.Table) -> pa.Table:
        ucol = t.column("url")
        hosts = [(lambda m: m[1] if m else "")(_DOMAIN_RE.search(u))
                 for u in ucol.to_pylist()]
        return pa.table({
            "url": ucol,
            "host": pa.array(hosts, type=pa.string()),
            "h": pa.array(md5_u64_lower_arrow(
                ucol.combine_chunks() if isinstance(ucol, pa.ChunkedArray)
                else ucol))})

    def rank_in_host(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "host": pd.Series([], dtype=object),
                "k": pd.Series([], dtype=np.int64),
                "pfx": pd.Series([], dtype=object)})
        df = df.sort_values(["host", "h", "url"])
        hv = df["host"].to_numpy()
        idx = np.arange(len(df), dtype=np.int64)
        first = np.concatenate(([True], hv[1:] != hv[:-1]))
        base = np.where(first, idx, 0)
        np.maximum.accumulate(base, out=base)
        return pd.DataFrame({"url": df["url"].to_numpy(),
                             "host": hv, "k": idx - base,
                             "pfx": df["host"].str[:2].to_numpy()})

    ranked = shuffle.grouped_apply(
        urls.map_batches(hosted, batch_format="pyarrow"),
        ["host"], rank_in_host).materialize()

    sums = shuffle.grouped_agg(ranked, ["k", "pfx"],
                               {"cnt": (None, "count")}).to_pandas()
    sums = sums.sort_values(["k", "pfx"]).reset_index(drop=True)
    sums["off"] = np.concatenate(
        ([0], np.cumsum(sums["cnt"].to_numpy())[:-1])).astype(np.int64)
    off_ref = ray.put(sums[["k", "pfx", "off"]])

    def global_rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "host": pd.Series([], dtype=object),
                "k": pd.Series([], dtype=np.int64),
                "crawl_pos": pd.Series([], dtype=np.int64)})
        offs = ray.get(off_ref)
        df = df.sort_values(["k", "pfx", "host", "url"])
        kv = df["k"].to_numpy(dtype=np.int64)
        pv = df["pfx"].to_numpy()
        idx = np.arange(len(df), dtype=np.int64)
        first = np.concatenate(
            ([True], (kv[1:] != kv[:-1]) | (pv[1:] != pv[:-1])))
        base = np.where(first, idx, 0)
        np.maximum.accumulate(base, out=base)
        df = df.assign(__r=idx - base).merge(offs, on=["k", "pfx"],
                                             how="left")
        return pd.DataFrame({
            "url": df["url"].to_numpy(), "host": df["host"].to_numpy(),
            "k": df["k"].to_numpy(dtype=np.int64),
            "crawl_pos": (df["__r"] + df["off"]).to_numpy(dtype=np.int64)})

    return shuffle.grouped_apply(ranked, ["k", "pfx"], global_rank)


def q_pages_degree(sf_dir: str):
    """(node_id, out_degree, in_degree) over the built pages link graph
    (multi-edges counted as stored — same table the CSR consumed),
    zero-degree nodes included. Two grouped counts + two co_group joins
    onto the lazy node range; nothing n-length on the driver."""
    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    edges = _read_sized(os.path.join(gd, "edges"))

    def endpoints(t: pa.Table) -> pa.Table:
        # ONE pass over the edge block emits both endpoint roles as
        # (node_id, o, i) flag rows; the grouped_agg's map-side combiner
        # collapses them to <= 2 rows per node per block before the (one)
        # shuffle — vs the naive two-aggregate/two-join plan (measured 2x)
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        one = np.ones(len(s), dtype=np.int64)
        zero = np.zeros(len(s), dtype=np.int64)
        return pa.table({
            "node_id": pa.array(np.concatenate([s, d])),
            "o": pa.array(np.concatenate([one, zero])),
            "i": pa.array(np.concatenate([zero, one]))})

    deg = shuffle.grouped_agg(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node_id"], {"out_degree": ("o", "sum"),
                      "in_degree": ("i", "sum")})
    nodes = ray.data.range(g.n).map_batches(
        lambda t: pa.table({"node_id": t.column("id").cast(pa.int64())}),
        batch_format="pyarrow")

    def fill(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.merge(rf, on="node_id", how="left")
        for col in ("out_degree", "in_degree"):
            j[col] = j[col].fillna(0).astype(np.int64)
        return j

    i64 = pa.int64()
    return shuffle.co_group(
        nodes, deg, "node_id", "node_id", fill,
        l_schema=pa.schema([("node_id", i64)]),
        r_schema=pa.schema([("node_id", i64), ("out_degree", i64),
                            ("in_degree", i64)]))


def q_pages_reciprocity(sf_dir: str):
    """One-row link-structure summary of the pages graph: distinct
    non-loop edges, reciprocal unordered pairs (both directions present),
    self-loop rows, and dangling nodes (no out-edges). Reciprocal pairs
    are a grouped count over canonical (lo, hi) keys of the DISTINCT
    edge set (count == 2 means both directions); dangling = node range
    minus distinct sources via one co_group; every reduction is a
    per-block partial folded on the driver (O(#blocks) rows)."""
    gd, g = _pages_graph(sf_dir)
    _refresh_pages_oracle(gd, g.n)
    # three reductions consume the edge table; materialize once so the
    # parquet read is paid once, not per consumer
    edges = _read_sized(os.path.join(gd, "edges")).materialize()

    def selfloops(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table({"c": pa.array([int((s == d).sum())],
                                       type=pa.int64())})

    n_self = int(edges.map_batches(selfloops, batch_format="pyarrow")
                 .to_pandas()["c"].sum())

    dist = shuffle.distinct(edges.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("src"),
                                        t.column("dst"))),
        batch_format="pyarrow"), ["src", "dst"]).materialize()
    n_distinct = dist.count()

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table({"lo": pa.array(np.minimum(s, d)),
                         "hi": pa.array(np.maximum(s, d))})

    pairs = shuffle.grouped_agg(
        dist.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], {"c": (None, "count")})
    n_recip = int(pairs.map_batches(
        lambda t: pa.table({"r": pa.array(
            [int((t.column("c").to_numpy() == 2).sum())],
            type=pa.int64())}),
        batch_format="pyarrow").to_pandas()["r"].sum())

    srcs = shuffle.distinct(edges.map_batches(
        lambda t: pa.table({"node_id": t.column("src").cast(pa.int64())}),
        batch_format="pyarrow"), ["node_id"])
    nodes = ray.data.range(g.n).map_batches(
        lambda t: pa.table({"node_id": t.column("id").cast(pa.int64())}),
        batch_format="pyarrow")
    i64 = pa.int64()

    def count_missing(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        miss = (~lf["node_id"].isin(rf["node_id"])).sum()
        return pd.DataFrame({"d": np.array([miss], dtype=np.int64)})

    n_dangling = int(shuffle.co_group(
        nodes, srcs, "node_id", "node_id", count_missing,
        l_schema=pa.schema([("node_id", i64)]),
        r_schema=pa.schema([("node_id", i64)])).to_pandas()["d"].sum())

    return pa.table({
        "n_distinct_edges": pa.array([n_distinct], type=pa.int64()),
        "n_reciprocal_pairs": pa.array([n_recip], type=pa.int64()),
        "n_self_loops": pa.array([n_self], type=pa.int64()),
        "n_dangling": pa.array([n_dangling], type=pa.int64())})


ANCHOR_ORACLE_DIR = os.path.join(tempfile.gettempdir(),
                                 "ligrust_anchor_oracle")
ANCHOR_TOP_K = 3


def _anchors_cached(sf_dir: str) -> ray.data.Dataset:
    """Materialized (dst_url, anchor) rows parsed from the synthetic
    pages html, persisted to the fixed ANCHOR_ORACLE_DIR artifact so the
    static SQL oracles aggregate THE SAME rows (marker-skipped when
    current). Shared by pages_anchor_text and pages_dead_links."""
    from ligrust_ray.functions.extract import ExtractAnchors
    from ligrust_ray.sources.synth import write_pages_corpus

    n_pages = max(100, int(20000 * _sf_of(sf_dir)))
    # Ray-task-parallel, resumable corpus generation (cached across calls;
    # page bytes are a pure function of (seed, i) so chunking is
    # byte-stable) — driver-side generate_pages here cost ~6 s of the
    # 11.7 s sf0.1 bench entry
    corpus = os.path.join(tempfile.gettempdir(),
                          f"ligr_pagescorpus_{n_pages}")
    write_pages_corpus(corpus, n_pages, seed=42,
                       rows_per_file=max(200, n_pages // 16))
    # CPU-bound per-page HTML parse: block count must track CPUS, not
    # bytes (_read_sized's byte sizing collapses the small corpus to ONE
    # block -> a serial extract; same rule as build_graph_from_pages)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nblocks = max(1, min(2 * ncpu, n_pages // 50))
    pages = ray.data.read_parquet(corpus, columns=["url", "html"],
                                  override_num_blocks=nblocks)
    anchors = pages.map_batches(
        ExtractAnchors(), batch_format="pyarrow",
        batch_size=256).select_columns(["dst_url", "anchor"]).materialize()

    # refresh the SQL-side artifacts (marker-skipped when current):
    # the anchor rows AND the crawled url universe (the corpus url
    # column — url_map is wider: id-assign covers every href TARGET too,
    # so "exists in url_map" is not "was crawled")
    marker = os.path.join(ANCHOR_ORACLE_DIR, "SOURCE")
    stamp = f"pages:{n_pages}:seed42:v2"
    ok = all(os.path.isdir(os.path.join(ANCHOR_ORACLE_DIR, p))
             for p in ("anchors", "crawled"))
    try:
        with open(marker) as fh:
            ok = ok and fh.read() == stamp
    except OSError:
        ok = False
    if not ok:
        import shutil

        shutil.rmtree(ANCHOR_ORACLE_DIR, ignore_errors=True)
        os.makedirs(ANCHOR_ORACLE_DIR)
        anchors.write_parquet(os.path.join(ANCHOR_ORACLE_DIR, "anchors"))
        ray.data.read_parquet(corpus, columns=["url"]).write_parquet(
            os.path.join(ANCHOR_ORACLE_DIR, "crawled"))
        with open(marker, "w") as fh:
            fh.write(stamp)
    return anchors


def q_pages_dead_links(sf_dir: str):
    """(host, n_links, n_dead) — link-rot census per TARGET host: of all
    hrefs extracted from the crawl, how many point at urls that were
    actually CRAWLED vs dangle (the synthetic corpus plants
    void*.example dead links exactly like real crawls carry rotted /
    uncrawled targets — this table is what decides a recrawl frontier).
    NOTE: the crawled set is the corpus url column, NOT url_map —
    id-assign covers every href target too. Scale shape: the anchors
    multiset co_group-anti-joins the crawled url set on dst_url (urls
    co-partition; anchor text never ships), then one partial-combined
    grouped count per host."""
    anchors = _anchors_cached(sf_dir)
    urls = _read_sized(os.path.join(ANCHOR_ORACLE_DIR, "crawled"),
                       columns=["url"])

    def dsts(t: pa.Table) -> pa.Table:
        return pa.table({"u": t.column("dst_url")})

    def known(t: pa.Table) -> pa.Table:
        return pa.table({"u": t.column("url").cast(pa.string()),
                         "known": pa.array(
                             np.ones(t.num_rows, dtype=np.int64))})

    def per_part(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"host": pd.Series([], dtype=object),
                              "n_links": pd.Series([], dtype=np.int64),
                              "n_dead": pd.Series([], dtype=np.int64)})
        if not len(lf):
            return empty
        alive = set(rf["u"]) if len(rf) else set()
        hosts = lf["u"].str.extract(r"https://([^/]+)/", expand=False) \
            .fillna("")
        dead = (~lf["u"].isin(alive)).astype(np.int64)
        out = pd.DataFrame({"host": hosts, "dead": dead})
        g2 = out.groupby("host", as_index=False).agg(
            n_links=("dead", "size"), n_dead=("dead", "sum"))
        g2["n_links"] = g2["n_links"].astype(np.int64)
        return g2

    parts = shuffle.co_group(
        anchors.map_batches(dsts, batch_format="pyarrow"),
        urls.map_batches(known, batch_format="pyarrow"),
        "u", "u", per_part)
    return shuffle.grouped_agg(parts, ["host"],
                               {"n_links": ("n_links", "sum"),
                                "n_dead": ("n_dead", "sum")})


def q_pages_anchor_text(sf_dir: str):
    """Per-target anchor-text profile — the classic web-corpus op (what do
    OTHER pages call this url?): parse ``(src, dst, anchor)`` from the
    synthetic pages html (stateless task parse, same economics as the
    build's edge extraction), tokenize the anchor strings (lower, \\S+ —
    the repo token spec), one grouped count per (dst_url, token), then a
    dst-keyed grouped_apply top-K (n DESC, token ASC). Oracled: the raw
    (dst_url, anchor) rows persist to a fixed /tmp artifact
    (_anchors_cached) and the static SQL tokenizes + aggregates THE SAME
    rows, so tokenize/count/rank math is hash-verified; extraction
    itself is pytest-pinned (href parity with extract_links,
    determinism, nested/EOF anchors)."""
    anchors = _anchors_cached(sf_dir)

    def batch_counts(t: pa.Table) -> pa.Table:
        empty = pa.table({"dst_url": pa.array([], type=pa.string()),
                          "token": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if not t.num_rows:
            return empty
        # Arrow-native tokenization: lower + whitespace split + list
        # flatten with a repeated parent index — no per-row Python regex
        # (ASCII corpus: unicode-vs-RE2 whitespace classes coincide)
        toks = pc.utf8_split_whitespace(
            pc.utf8_lower(t.column("anchor"))).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy()
        parents = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        flat = toks.flatten()
        pairs = pa.table({
            "dst_url": t.column("dst_url").combine_chunks().take(parents),
            "token": flat}).filter(pc.not_equal(flat, ""))
        if not pairs.num_rows:
            return empty
        # map-side combiner (Arrow hash aggregate): bounds shuffle volume
        g = pairs.group_by(["dst_url", "token"]).aggregate([([], "count_all")])
        return pa.table({"dst_url": g.column("dst_url"),
                         "token": g.column("token"),
                         "n": g.column("count_all").cast(pa.int64())})

    counts = shuffle.grouped_agg(
        anchors.map_batches(batch_counts, batch_format="pyarrow"),
        ["dst_url", "token"], {"n": ("n", "sum")})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["dst_url", "n", "token"],
                            ascending=[True, False, True])
        return df.groupby("dst_url", sort=False).head(ANCHOR_TOP_K)

    out = shuffle.grouped_apply(counts, ["dst_url"], topk)
    return out.map_batches(
        lambda t: pa.table({"dst_url": t.column("dst_url").cast(pa.string()),
                            "token": t.column("token").cast(pa.string()),
                            "n": t.column("n").cast(pa.int64())}),
        batch_format="pyarrow")


# ------------------------------------------------------------ documents ops
def q_docs_exact_dedup(sf_dir: str):
    return dedup.exact_dedup(_docs(sf_dir))


def q_docs_dedup_incremental(sf_dir: str):
    """(doc_id) — incremental intake dedup for a CONTINUOUS crawl: the
    incoming batch (doc_id % 10 == 0 stands in for the new snapshot) is
    checked against the existing corpus (doc_id % 10 != 0) and every
    incoming doc whose md5(text) already exists is flagged. The spec is
    md5-HASH-keyed (the line_dedup convention), so the DuckDB oracle
    replicates the engine exactly even on a collision. One hash-keyed
    co_group semi-join — hashes co-partition, bodies never move; the
    synthetic sf corpora carry no cross-split dups, so the contract row
    checks plumbing and the planted pytest carries the semantics."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    def hashed(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        h = md5_u64_lower_arrow(txt).astype(np.int64)   # two's complement
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "h": pa.array(h)})

    def mod10(col):
        # Arrow has no modulo kernel; truncating int divide is exact for
        # the non-negative doc_id domain
        return pc.subtract(col, pc.multiply(pc.divide(col, 10), 10))

    hs = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        hashed, batch_format="pyarrow")
    incoming = hs.map_batches(
        lambda t: t.filter(pc.equal(mod10(t.column("doc_id")), 0)),
        batch_format="pyarrow")
    existing = hs.map_batches(
        lambda t: t.filter(pc.not_equal(mod10(t.column("doc_id")), 0)),
        batch_format="pyarrow")

    def semi(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if not len(lf):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64)})
        return lf.loc[lf["h"].isin(rf["h"]), ["doc_id"]]

    i64 = pa.int64()
    out = shuffle.co_group(
        incoming, existing, l_on="h", r_on="h", fn=semi,
        l_schema=pa.schema([("doc_id", i64), ("h", i64)]),
        r_schema=pa.schema([("doc_id", i64), ("h", i64)]))
    # all-empty partitions lose the pandas column set — pin the schema
    # (the q_emb_near_dup convention for possibly-empty join outputs)
    schema = pa.schema([("doc_id", i64)])
    parts = [b for b in out.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables([t.cast(schema) for t in parts]) if parts \
        else schema.empty_table()


def q_docs_token_count(sf_dir: str):
    return _docs(sf_dir).map_batches(textstats.token_count_batch,
                                     batch_format="pyarrow")


def q_docs_token_bpe(sf_dir: str):
    return _docs(sf_dir).map_batches(textstats.token_count_bpe_batch,
                                     batch_format="pyarrow")


def q_emb_near_dup_ivf(sf_dir: str):
    """Bucketed near-dup pairs with the md5 id-bucket quantizer — the
    SQL-hash-checked plumbing variant (see q_emb_knn_ivf); k-means
    recall is pytest-verified."""
    ds = dedup.embedding_near_dup_ivf(_emb(sf_dir), threshold=0.45,
                                      quantizer="md5")
    parts = [b for b in ds.iter_batches(batch_format="pyarrow")]
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    return pa.concat_tables([t.select(["a", "b"]).cast(schema)
                             for t in parts]) if parts else \
        schema.empty_table()


def q_docs_token_quantiles(sf_dir: str):
    """Exact token-count quantiles (p50/p90/p99) via a distributed value
    histogram: token counts are small integers, so the grouped
    (value, count) table is tiny regardless of corpus size — the classic
    bounded-sketch shape (counts shuffle, never documents). Quantile
    definition (shared with the oracle): smallest value whose running
    count reaches ceil(q * total)."""
    tc = _docs(sf_dir).map_batches(textstats.token_count_batch,
                                   batch_format="pyarrow")
    hist = shuffle.grouped_agg(
        tc.map_batches(lambda t: pa.table({"v": t.column("n_tokens")}),
                       batch_format="pyarrow"),
        ["v"], {"c": (None, "count")}).to_pandas().sort_values("v")
    vals = hist["v"].to_numpy(dtype=np.int64)
    cum = hist["c"].to_numpy(dtype=np.int64).cumsum()
    total = int(cum[-1]) if len(cum) else 0
    qs = [0.5, 0.9, 0.99]
    out_q, out_v = [], []
    for q in qs:
        rank = int(np.ceil(q * total))
        i = int(np.searchsorted(cum, rank))
        out_q.append(int(q * 100))
        out_v.append(int(vals[min(i, len(vals) - 1)]) if total else 0)
    return pa.table({"q_pct": pa.array(out_q, type=pa.int64()),
                     "n_tokens": pa.array(out_v, type=pa.int64())})


def q_docs_token_quantiles_by_lang(sf_dir: str):
    """(lang, q_pct, n_tokens) — per-language token-count quantiles
    (p50/p90/p99) via the same distributed value-histogram as
    docs_token_quantiles, keyed by (lang, count): the grouped histogram
    stays bounded at |langs| x |distinct counts| rows regardless of
    corpus size, and the per-lang CDF walk happens on that tiny table.
    Quantile definition (shared with the oracle): smallest value whose
    per-lang running count reaches ceil(q * lang_total)."""
    def pre(t: pa.Table) -> pa.Table:
        n = textstats.token_count_batch(
            t.select(["doc_id", "text"])).column("n_tokens")
        return pa.table({"lang": t.column("lang"), "v": n})

    hist = shuffle.grouped_agg(
        _docs(sf_dir, columns=["doc_id", "text", "lang"]).map_batches(
            pre, batch_format="pyarrow"),
        ["lang", "v"], {"c": (None, "count")}) \
        .to_pandas().sort_values(["lang", "v"])
    out_l, out_q, out_v = [], [], []
    for lang, g in hist.groupby("lang", sort=True):
        vals = g["v"].to_numpy(dtype=np.int64)
        cum = g["c"].to_numpy(dtype=np.int64).cumsum()
        total = int(cum[-1])
        for q in (0.5, 0.9, 0.99):
            rank = int(np.ceil(q * total))
            i = int(np.searchsorted(cum, rank))
            out_l.append(lang)
            out_q.append(int(q * 100))
            out_v.append(int(vals[min(i, len(vals) - 1)]))
    return pa.table({"lang": pa.array(out_l, type=pa.string()),
                     "q_pct": pa.array(out_q, type=pa.int64()),
                     "n_tokens": pa.array(out_v, type=pa.int64())})


def q_docs_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(textstats.doc_stats_batch,
                                     batch_format="pyarrow")


def q_docs_quality(sf_dir: str):
    # task-based with a per-process instance cache: the per-actor state is
    # a compiled regex + stopword set (~trivial), while an actor pool pays
    # seconds of spin-up per call (see dedup.MinHasher note)
    return _docs(sf_dir).map_batches(
        lambda t: textstats.quality_scorer()(t), batch_format="pyarrow")


def q_docs_quality_model(sf_dir: str):
    """(doc_id, n_tokens, score, keep) hashed-linear-classifier scoring
    (textstats.HashedLinearScorer) — the model-inference stage of a
    filtering pipeline, int64-exact vs the SQL oracle."""
    return _docs(sf_dir).map_batches(
        lambda t: textstats.quality_model()(t), batch_format="pyarrow")


# Gopher-style composite filter thresholds (Rae et al. 2021 §A1.1, adapted
# to this corpus's scale): token-count floor/ceiling, mean-word-length
# band, max top-trigram repetition, min alphabetic fraction of non-ws
# chars. All rules are integer comparisons so the SQL oracle is exact.
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_WL = 3      # 3·n_tokens ≤ n_nonws_chars
GOPHER_MAX_MEAN_WL = 10     # n_nonws_chars ≤ 10·n_tokens
GOPHER_MAX_TRI_PERMILLE = 120
GOPHER_MIN_ALPHA_10 = 6     # 10·n_alpha ≥ 6·n_nonws  (alpha ratio ≥ 0.6)


def q_docs_gopher_filter(sf_dir: str):
    """(doc_id, n_tokens) of documents passing ALL Gopher-style quality
    rules — the composite pre-training document filter (token-count band,
    mean-word-length band, top-trigram repetition cap, alphabetic-ratio
    floor). One stateless streaming map_batches pass, no shuffle: at
    100 TB this runs at read bandwidth. Tokens are '\\S+' runs over
    lower(text) (ASCII-ws class, RE2 parity); char censuses are
    vectorised pyarrow count_substring_regex; only the per-doc trigram
    top-count loops rows (the docs_dup_trigrams kernel). Mean word
    length uses the identity Σ token lengths = #non-ws chars, so no
    second tokenize pass is needed."""
    def keep(t: pa.Table) -> pa.Table:
        from collections import Counter

        texts_raw = t.column("text")
        n_chars = pc.utf8_length(texts_raw).to_numpy()
        n_ws = pc.count_substring_regex(texts_raw, "[\t\n\f\r ]").to_numpy()
        n_alpha = pc.count_substring_regex(texts_raw, "[A-Za-z]").to_numpy()
        n_nonws = (n_chars - n_ws).astype(np.int64)
        ids = t.column("doc_id").to_numpy()
        texts = texts_raw.to_pylist()
        n_tok = np.zeros(len(texts), dtype=np.int64)
        tri_ok = np.ones(len(texts), dtype=bool)
        for i, x in enumerate(texts):
            w = _WORD_RE.findall(x.lower())
            n_tok[i] = len(w)
            if len(w) >= 3:
                top = max(Counter(zip(w, w[1:], w[2:])).values())
                tri_ok[i] = (1000 * top // (len(w) - 2)
                             <= GOPHER_MAX_TRI_PERMILLE)
        ok = ((n_tok >= GOPHER_MIN_TOKENS) & (n_tok <= GOPHER_MAX_TOKENS)
              & (GOPHER_MIN_MEAN_WL * n_tok <= n_nonws)
              & (n_nonws <= GOPHER_MAX_MEAN_WL * n_tok)
              & tri_ok
              & (10 * n_alpha >= GOPHER_MIN_ALPHA_10 * n_nonws))
        return pa.table({"doc_id": pa.array(ids[ok].astype(np.int64)),
                         "n_tokens": pa.array(n_tok[ok])})

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow")


BEST_PER_SOURCE_K = 3


def q_docs_best_per_source(sf_dir: str):
    """(source, doc_id, quality_1e6) — the K highest-quality docs per
    source (the curation preview: what does each crawl's best content
    look like), ordered by (quality DESC, doc_id ASC). Per-BATCH partial
    top-K per source bounds shuffle volume at K x #sources rows per
    block; one tiny grouped_apply finishes. SQL oracle = ROW_NUMBER over
    the identical total order on the shared quality spec."""
    def score(t: pa.Table) -> pa.Table:
        q = textstats.quality_scorer()(t)
        return pa.table({"source": t.column("source"),
                         "doc_id": q.column("doc_id").cast(pa.int64()),
                         "quality_1e6": q.column("quality_1e6")})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(["source", "quality_1e6", "doc_id"],
                            ascending=[True, False, True])
        return df.groupby("source", sort=False).head(BEST_PER_SOURCE_K)

    scored = _docs(sf_dir, columns=["doc_id", "text", "source"]) \
        .map_batches(score, batch_format="pyarrow") \
        .map_batches(topk, batch_format="pandas")
    return shuffle.grouped_apply(scored, ["source"], topk)


def q_docs_langid(sf_dir: str):
    return _docs(sf_dir).map_batches(
        lambda t: textstats.lang_id()(t), batch_format="pyarrow")


def q_docs_lang_confusion(sf_dir: str):
    """(lang, pred_lang, n_docs) — confusion matrix of the language-ID
    heuristic against the corpus's labeled lang column (the evaluation
    every classifier stage ships with). Prediction and label ride the
    same batch (no join), then one tiny grouped count."""
    def predict(t: pa.Table) -> pa.Table:
        return textstats.lang_id()(t).append_column("lang",
                                                    t.column("lang"))

    pred = _docs(sf_dir).map_batches(predict, batch_format="pyarrow")
    out = shuffle.grouped_agg(pred, ["lang", "pred_lang"],
                              {"n_docs": (None, "count")})
    return out.map_batches(
        lambda t: pa.table({"lang": t.column("lang"),
                            "pred_lang": t.column("pred_lang"),
                            "n_docs": t.column("n_docs").cast(pa.int64())}),
        batch_format="pyarrow")


def q_customer_revenue(sf_dir: str):
    """(c_custkey, c_mktsegment, revenue_cents, n_orders) — the TPC-H-ish
    three-table rollup: lineitem revenue (integer cents) joined to orders
    (big x big hash join on orderkey), re-aggregated per custkey, then
    joined to customer. Both aggregations are FUSED into their joins via
    agg_co_group (map-side partials + in-partition final combine) — the
    push-aggregation-below-the-join plan a 100 TB engine must pick, at
    two wide steps total instead of four."""
    joined = _order_revenue_joined(sf_dir)
    cust = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"c_custkey":
                            t.column("c_custkey").cast(pa.int64()),
                            "c_mktsegment": t.column("c_mktsegment")}),
        batch_format="pyarrow")

    def attach(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.rename(columns={"o_custkey": "c_custkey"}).merge(
            rf, on="c_custkey")
        return j[["c_custkey", "c_mktsegment", "revenue_cents",
                  "n_orders"]]

    # per-cust re-aggregation fused into the customer join the same way
    return shuffle.agg_co_group(
        joined, cust, keys=["o_custkey"],
        l_on="o_custkey", r_on="c_custkey",
        aggs={"revenue_cents": ("cents", "sum"),
              "n_orders": (None, "count")},
        fn=attach,
        l_schema=pa.schema([("o_custkey", pa.int64()),
                            ("revenue_cents", pa.int64()),
                            ("n_orders", pa.int64())]),
        r_schema=pa.schema([("c_custkey", pa.int64()),
                            ("c_mktsegment", pa.string())]))


def q_supplier_nation_revenue(sf_dir: str):
    """(r_name, n_name, revenue_cents, n_items) — TPC-H-Q5-shaped
    same-nation revenue: lineitems whose supplier sits in the same nation
    as the ordering customer, rolled up per (region, nation). Plan shape
    for 100 TB: supplier scales WITH the corpus (TPC-H: 10k rows per SF)
    so it is NOT a broadcast dim — l_suppkey resolves to its nation via
    a keyed agg_co_group exactly like part in q_part_brand_revenue;
    only nation/region (25/5 rows, genuinely fixed) broadcast. The big
    sides flow through three wide steps (lineitem partials x supplier on
    suppkey, x orders on orderkey, then x customer on custkey), with
    revenue aggregation per (suppkey, orderkey) / (orderkey, supp_nation)
    / (custkey, supp_nation) FUSED into each join via agg_co_group
    (map-side partials + in-partition final combine), so each shuffle
    carries one row per key per block and no separate aggregation
    shuffle exists at all."""
    sup = _read_sized(os.path.join(sf_dir, "supplier.parquet"),
                      columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table({
            "s_suppkey": t.column("s_suppkey").cast(pa.int64()),
            "s_nat": t.column("s_nationkey").cast(pa.int64())}),
        batch_format="pyarrow")

    def li_cents(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("l_extendedprice").to_numpy()
                     * (1 - t.column("l_discount").to_numpy())
                     * 100 + 0.5).astype(np.int64)
        return pa.table({
            "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "cents": pa.array(v)})

    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_orderkey", "l_suppkey",
                              "l_extendedprice", "l_discount"])
    # l_suppkey -> nation resolved by a keyed co-partition join (no
    # driver-side supplier materialization), with the per-(suppkey,
    # orderkey) revenue partial fused into it
    li_nat = shuffle.agg_co_group(
        li.map_batches(li_cents, batch_format="pyarrow"), sup,
        keys=["l_suppkey", "l_orderkey"], l_on="l_suppkey",
        r_on="s_suppkey",
        aggs={"cents": ("cents", "sum"), "n_items": (None, "count")},
        fn=lambda lf, rf: lf.rename(
            columns={"l_suppkey": "s_suppkey"}).merge(
            rf, on="s_suppkey")[["l_orderkey", "s_nat", "cents",
                                 "n_items"]],
        l_schema=pa.schema([("l_suppkey", pa.int64()),
                            ("l_orderkey", pa.int64()),
                            ("cents", pa.int64()),
                            ("n_items", pa.int64())]),
        r_schema=pa.schema([("s_suppkey", pa.int64()),
                            ("s_nat", pa.int64())]))
    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table({"o_orderkey":
                            t.column("o_orderkey").cast(pa.int64()),
                            "o_custkey":
                            t.column("o_custkey").cast(pa.int64())}),
        batch_format="pyarrow")
    # per-(orderkey, supp_nation) revenue fused INTO the orders join:
    # partials combine map-side, the final combine happens inside the
    # join partition (agg_co_group) — one wide step, not two
    joined = shuffle.agg_co_group(
        li_nat, orders,
        keys=["l_orderkey", "s_nat"], l_on="l_orderkey", r_on="o_orderkey",
        aggs={"cents": ("cents", "sum"), "n_items": ("n_items", "sum")},
        fn=lambda lf, rf: lf.merge(
            rf.rename(columns={"o_orderkey": "l_orderkey"}),
            on="l_orderkey")[["o_custkey", "s_nat", "cents", "n_items"]],
        l_schema=pa.schema([("l_orderkey", pa.int64()),
                            ("s_nat", pa.int64()),
                            ("cents", pa.int64()),
                            ("n_items", pa.int64())]),
        r_schema=pa.schema([("o_orderkey", pa.int64()),
                            ("o_custkey", pa.int64())]))

    cust = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({
            "c_custkey": t.column("c_custkey").cast(pa.int64()),
            "c_nat": t.column("c_nationkey").cast(pa.int64())}),
        batch_format="pyarrow")

    def same_nation(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.rename(columns={"o_custkey": "c_custkey"}).merge(
            rf, on="c_custkey")
        j = j[j["s_nat"] == j["c_nat"]]
        return j[["s_nat", "cents", "n_items"]]

    # per-(custkey, supp_nation) re-aggregation fused into the customer
    # join the same way
    matched = shuffle.agg_co_group(
        joined, cust, keys=["o_custkey", "s_nat"],
        l_on="o_custkey", r_on="c_custkey",
        aggs={"cents": ("cents", "sum"), "n_items": ("n_items", "sum")},
        fn=same_nation,
        l_schema=pa.schema([("o_custkey", pa.int64()),
                            ("s_nat", pa.int64()),
                            ("cents", pa.int64()),
                            ("n_items", pa.int64())]),
        r_schema=pa.schema([("c_custkey", pa.int64()),
                            ("c_nat", pa.int64())]))
    per_nat = shuffle.grouped_agg(
        matched, ["s_nat"], {"revenue_cents": ("cents", "sum"),
                             "n_items": ("n_items", "sum")})

    nat = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = ray.data.read_parquet(
        os.path.join(sf_dir, "region.parquet")).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nk = np.argsort(nat["n_nationkey"].to_numpy())
    nat_ref = ray.put((nat["n_nationkey"].to_numpy().astype(np.int64)[nk],
                       nat["n_name"].to_numpy()[nk],
                       nat["r_name"].to_numpy()[nk]))

    def attach_names(t: pa.Table) -> pa.Table:
        keys, n_names, r_names = ray.get(nat_ref)
        pos = np.searchsorted(keys, t.column("s_nat").to_numpy())
        return pa.table({
            "r_name": pa.array(r_names[pos], type=pa.string()),
            "n_name": pa.array(n_names[pos], type=pa.string()),
            "revenue_cents": t.column("revenue_cents").cast(pa.int64()),
            "n_items": t.column("n_items").cast(pa.int64())})

    return per_nat.map_batches(attach_names, batch_format="pyarrow")


def q_events_daily(sf_dir: str):
    """(day, n_events, n_users) — daily event volume and distinct active
    users (the activity dashboard rollup). day = year*10000+month*100+day
    as one int64 key (pyarrow temporal kernels, engine == DuckDB calendar
    math); one (day, user) grouped count pre-collapsed map-side, then a
    per-day rollup — n_events = sum of per-user counts, n_users = row
    count. Two wide steps, no separate distinct pass or join."""
    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["ts", "user_id"])

    def key(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        day = pc.add(pc.add(pc.multiply(pc.year(ts), 10000),
                            pc.multiply(pc.month(ts), 100)), pc.day(ts))
        return pa.table({"day": day.cast(pa.int64()),
                         "user_id": t.column("user_id").cast(pa.int64())})

    keyed = ev.map_batches(key, batch_format="pyarrow")
    # one (day, user) count — the map-side partial collapses repeats —
    # then a per-day rollup where n_events = sum of per-user counts and
    # n_users = row count: two wide steps, no distinct pass or join
    per_user = shuffle.grouped_agg(keyed, ["day", "user_id"],
                                   {"n": (None, "count")})
    return shuffle.grouped_agg(
        per_user, ["day"],
        {"n_events": ("n", "sum"), "n_users": (None, "count")})


def q_lineitem_monthly(sf_dir: str):
    """(ship_ym, revenue_cents, n_items) — monthly revenue time series
    over lineitem (the temporal rollup every pipeline dashboard needs).
    ship_ym = year*100 + month as one int64 key (pyarrow.compute temporal
    kernels — engine and DuckDB extract identical calendar fields from
    the same timestamp[us] values); single partial-combine hash
    aggregate, nothing wide beyond the one grouped shuffle."""
    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_shipdate", "l_extendedprice",
                              "l_discount"])

    def pre(t: pa.Table) -> pa.Table:
        ts = t.column("l_shipdate")
        ym = pc.add(pc.multiply(pc.year(ts), 100), pc.month(ts))
        cents = np.floor(t.column("l_extendedprice").to_numpy()
                         * (1 - t.column("l_discount").to_numpy())
                         * 100 + 0.5).astype(np.int64)
        return pa.table({"ship_ym": ym.cast(pa.int64()),
                         "cents": pa.array(cents)})

    return shuffle.grouped_agg(
        li.map_batches(pre, batch_format="pyarrow"),
        ["ship_ym"], {"revenue_cents": ("cents", "sum"),
                      "n_items": (None, "count")})


def q_part_brand_revenue(sf_dir: str):
    """(p_brand, revenue_cents, sum_qty, n_items) — brand-level revenue
    share over lineitem x part. Unlike nation/region, `part` scales with
    the corpus (TPC-H: 200k rows per SF — at 100 TB it is NOT a broadcast
    dim), so the join is a keyed co_group with lineitem revenue
    pre-aggregated per partkey first: one row per distinct partkey enters
    the shuffle, never one per lineitem."""
    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_partkey", "l_quantity",
                              "l_extendedprice", "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("l_extendedprice").to_numpy()
                     * (1 - t.column("l_discount").to_numpy())
                     * 100 + 0.5).astype(np.int64)
        qty = np.floor(t.column("l_quantity").to_numpy()
                       + 0.5).astype(np.int64)
        return pa.table({"l_partkey":
                         t.column("l_partkey").cast(pa.int64()),
                         "cents": pa.array(v), "qty": pa.array(qty)})

    part = _read_sized(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_brand"]).map_batches(
        lambda t: pa.table({"p_partkey":
                            t.column("p_partkey").cast(pa.int64()),
                            "p_brand": t.column("p_brand")}),
        batch_format="pyarrow")
    # per-part revenue fused into the part join (agg_co_group)
    joined = shuffle.agg_co_group(
        li.map_batches(cents, batch_format="pyarrow"), part,
        keys=["l_partkey"], l_on="l_partkey", r_on="p_partkey",
        aggs={"cents": ("cents", "sum"), "qty": ("qty", "sum"),
              "n_items": (None, "count")},
        fn=lambda lf, rf: lf.rename(
            columns={"l_partkey": "p_partkey"}).merge(
            rf, on="p_partkey")[["p_brand", "cents", "qty", "n_items"]],
        l_schema=pa.schema([("l_partkey", pa.int64()),
                            ("cents", pa.int64()), ("qty", pa.int64()),
                            ("n_items", pa.int64())]),
        r_schema=pa.schema([("p_partkey", pa.int64()),
                            ("p_brand", pa.string())]))
    return shuffle.grouped_agg(
        joined, ["p_brand"],
        {"revenue_cents": ("cents", "sum"), "sum_qty": ("qty", "sum"),
         "n_items": ("n_items", "sum")})


def q_customers_no_urgent(sf_dir: str):
    """(c_mktsegment, n_custs) — customers with NO urgent order (NOT
    EXISTS), rolled up per segment: the big x big ANTI join. Plan shape
    for 100 TB: orders is filtered AND collapsed to map-side-distinct
    custkeys before the shuffle (semi_join's combiner — only distinct
    keys move, never order rows), both sides hash co-partition on
    custkey, membership is one vectorised isin per partition, and the
    rollup is a tiny grouped count."""
    cust = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"c_custkey":
                            t.column("c_custkey").cast(pa.int64()),
                            "c_mktsegment": t.column("c_mktsegment")}),
        batch_format="pyarrow")
    import pyarrow.dataset as pds

    # predicate pushed INTO the parquet scan: row groups whose stats
    # exclude '1-URGENT' never leave storage
    urgent = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey"],
                         filter=(pds.field("o_orderpriority")
                                 == "1-URGENT")) \
        .map_batches(lambda t: pa.table({
            "o_custkey": t.column("o_custkey").cast(pa.int64())}),
            batch_format="pyarrow")
    kept = shuffle.semi_join(
        cust, urgent, l_on="c_custkey", r_on="o_custkey", anti=True,
        l_schema=pa.schema([("c_custkey", pa.int64()),
                            ("c_mktsegment", pa.string())]),
        r_key_type=pa.int64())
    return shuffle.grouped_agg(kept, ["c_mktsegment"],
                               {"n_custs": (None, "count")})


def q_customer_urgency(sf_dir: str):
    """(c_custkey, c_mktsegment, n_urgent) — every customer with their
    URGENT-order count, 0 when none: the big x big LEFT OUTER join.
    hash_join(how='left') with typed fill values — unmatched rows take
    an int64 0, never a NaN (block schemas stay consistent; the oracle
    COALESCEs identically). The right side is pre-aggregated to one row
    per custkey (predicate pushed into the scan) before the join."""
    import pyarrow.dataset as pds

    cust = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"c_custkey":
                            t.column("c_custkey").cast(pa.int64()),
                            "c_mktsegment": t.column("c_mktsegment")}),
        batch_format="pyarrow")
    per_cust = shuffle.grouped_agg(
        _read_sized(os.path.join(sf_dir, "orders.parquet"),
                    columns=["o_custkey"],
                    filter=(pds.field("o_orderpriority") == "1-URGENT"))
        .map_batches(lambda t: pa.table({
            "c_custkey": t.column("o_custkey").cast(pa.int64())}),
            batch_format="pyarrow"),
        ["c_custkey"], {"n_urgent": (None, "count")})
    return shuffle.hash_join(cust, per_cust, on="c_custkey",
                             l_cols=["c_mktsegment"],
                             r_cols=["n_urgent"], how="left",
                             fill={"n_urgent": 0})


def q_parts_returned_heavy(sf_dir: str):
    """(p_brand, n_parts) — parts with at least one RETURNED lineitem of
    quantity >= 48 (EXISTS), counted per brand: the big x big SEMI join.
    lineitem is predicate-filtered at the read (two pruned columns) and
    collapsed to distinct partkeys map-side, so the shuffle moves one
    key per distinct qualifying part — never a lineitem row; part rows
    are NOT duplicated however many lineitems match (the semantic an
    inner join would get wrong)."""
    part = _read_sized(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_brand"]).map_batches(
        lambda t: pa.table({"p_partkey":
                            t.column("p_partkey").cast(pa.int64()),
                            "p_brand": t.column("p_brand")}),
        batch_format="pyarrow")

    import pyarrow.dataset as pds

    # both predicates pushed into the scan (prune-at-the-read)
    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_partkey"],
                     filter=((pds.field("l_returnflag") == "R")
                             & (pds.field("l_quantity") >= 48.0))) \
        .map_batches(lambda t: pa.table({
            "l_partkey": t.column("l_partkey").cast(pa.int64())}),
            batch_format="pyarrow")
    kept = shuffle.semi_join(
        part, li, l_on="p_partkey", r_on="l_partkey",
        l_schema=pa.schema([("p_partkey", pa.int64()),
                            ("p_brand", pa.string())]),
        r_key_type=pa.int64())
    return shuffle.grouped_agg(kept, ["p_brand"],
                               {"n_parts": (None, "count")})


TOP_CUSTOMERS_K = 100


def _order_revenue_joined(sf_dir: str) -> ray.data.Dataset:
    """(o_custkey, cents) — lineitem revenue (the ONE copy of the
    integer-cents rounding spec) pre-aggregated per orderkey and FUSED
    into the orders join: the shared front half of customer_revenue /
    top_customers."""
    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_orderkey", "l_extendedprice",
                              "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("l_extendedprice").to_numpy()
                     * (1 - t.column("l_discount").to_numpy())
                     * 100 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey":
                         t.column("l_orderkey").cast(pa.int64()),
                         "cents": pa.array(v)})

    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table({"o_orderkey":
                            t.column("o_orderkey").cast(pa.int64()),
                            "o_custkey":
                            t.column("o_custkey").cast(pa.int64())}),
        batch_format="pyarrow")
    return shuffle.agg_co_group(
        li.map_batches(cents, batch_format="pyarrow"), orders,
        keys=["l_orderkey"], l_on="l_orderkey", r_on="o_orderkey",
        aggs={"cents": ("cents", "sum")},
        fn=lambda lf, rf: lf.merge(
            rf.rename(columns={"o_orderkey": "l_orderkey"}),
            on="l_orderkey")[["o_custkey", "cents"]],
        l_schema=pa.schema([("l_orderkey", pa.int64()),
                            ("cents", pa.int64())]),
        r_schema=pa.schema([("o_orderkey", pa.int64()),
                            ("o_custkey", pa.int64())]))


def _per_cust_revenue(sf_dir: str) -> ray.data.Dataset:
    """(o_custkey, revenue_cents) over _order_revenue_joined."""
    return shuffle.grouped_agg(
        _order_revenue_joined(sf_dir), ["o_custkey"],
        {"revenue_cents": ("cents", "sum")})


def q_top_customers(sf_dir: str):
    """(c_custkey, revenue_cents) — global top-K customers by revenue
    (K=100, custkey tie-break): the distributed ORDER BY ... LIMIT K.
    Per-cust revenue comes from the same pre-aggregated two-shuffle plan
    as customer_revenue; then each final partition emits its own top-K
    (partial top-K inside map_batches), so at most P x K candidate rows
    ever reach the driver-side merge — never the customer rollup."""
    per_cust = _per_cust_revenue(sf_dir)

    def part_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "o_custkey"],
                              ascending=[False, True]) \
            .head(TOP_CUSTOMERS_K)

    cand = per_cust.map_batches(part_topk, batch_format="pandas") \
        .to_pandas()
    top = cand.sort_values(["revenue_cents", "o_custkey"],
                           ascending=[False, True]) \
        .head(TOP_CUSTOMERS_K)
    return pa.table({
        "c_custkey": pa.array(top["o_custkey"].to_numpy(dtype=np.int64)),
        "revenue_cents":
        pa.array(top["revenue_cents"].to_numpy(dtype=np.int64))})


def q_lineitem_rollup(sf_dir: str):
    """(rf, ls, sum_qty, revenue_cents, n_items) — GROUP BY ROLLUP
    (returnflag, linestatus): finest level + per-returnflag subtotals +
    grand total, 'ALL' marking rolled-up dimensions. Scale plan: ONE
    partial-combine hash aggregate at the finest grain (bounded at
    |rf| x |ls| rows however big lineitem is); the coarser levels are
    re-sums of that tiny table — never a second pass over the data."""
    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_returnflag", "l_linestatus",
                              "l_quantity", "l_extendedprice",
                              "l_discount"])

    def pre(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("l_extendedprice").to_numpy()
                     * (1 - t.column("l_discount").to_numpy())
                     * 100 + 0.5).astype(np.int64)
        qty = np.floor(t.column("l_quantity").to_numpy()
                       + 0.5).astype(np.int64)
        return pa.table({"rf": t.column("l_returnflag"),
                         "ls": t.column("l_linestatus"),
                         "qty": pa.array(qty), "cents": pa.array(v)})

    finest = shuffle.grouped_agg(
        li.map_batches(pre, batch_format="pyarrow"),
        ["rf", "ls"],
        {"sum_qty": ("qty", "sum"), "revenue_cents": ("cents", "sum"),
         "n_items": (None, "count")}).to_pandas()   # <= |rf| x |ls| rows
    vals = ["sum_qty", "revenue_cents", "n_items"]
    lv1 = finest.groupby("rf", as_index=False)[vals].sum() \
        .assign(ls="ALL")
    lv0 = pd.DataFrame([{**finest[vals].sum().to_dict(),
                         "rf": "ALL", "ls": "ALL"}])
    out = pd.concat([finest, lv1, lv0], ignore_index=True)
    return pa.table({
        "rf": pa.array(out["rf"], type=pa.string()),
        "ls": pa.array(out["ls"], type=pa.string()),
        "sum_qty": pa.array(out["sum_qty"].to_numpy(dtype=np.int64)),
        "revenue_cents":
        pa.array(out["revenue_cents"].to_numpy(dtype=np.int64)),
        "n_items": pa.array(out["n_items"].to_numpy(dtype=np.int64))})


def q_orders_latest(sf_dir: str):
    """(o_custkey, last_orderkey, last_day) — each customer's most recent
    order (max date, max orderkey tie-break): the distributed argmax /
    ROW_NUMBER()=1 window. Partial argmax per batch first (one candidate
    row per custkey per batch bounds the shuffle at |custkeys| x blocks,
    never |orders|), then grouped_apply resolves the final argmax
    vectorised per partition (sort + drop_duplicates keep='last' — C
    kernels, no Python loop)."""
    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate"])

    def pre(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate")
        d = pc.add(pc.add(pc.multiply(pc.year(ts), 10000),
                          pc.multiply(pc.month(ts), 100)), pc.day(ts))
        return pa.table({"o_custkey": t.column("o_custkey").cast(pa.int64()),
                         "o_orderkey":
                         t.column("o_orderkey").cast(pa.int64()),
                         "d": d.cast(pa.int64())})

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["o_custkey", "d", "o_orderkey"]) \
            .drop_duplicates("o_custkey", keep="last")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        r = argmax(df)
        return r.rename(columns={"o_orderkey": "last_orderkey",
                                 "d": "last_day"})[
            ["o_custkey", "last_orderkey", "last_day"]]

    return shuffle.grouped_apply(
        orders.map_batches(pre, batch_format="pyarrow").map_batches(
            argmax, batch_format="pandas"),
        ["o_custkey"], final)


def q_orders_cohort(sf_dir: str):
    """(cohort_ym, n_customers) — acquisition cohorts: each customer's
    FIRST order month, counted per month. Two bounded hash aggregates
    (per-cust min riding a map-side partial min, then a tiny month
    count) — orders rows shuffle as one partial row per (custkey,
    block), never raw."""
    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_orderdate"])

    def pre(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate")
        ym = pc.add(pc.multiply(pc.year(ts), 100), pc.month(ts))
        return pa.table({"o_custkey":
                         t.column("o_custkey").cast(pa.int64()),
                         "ym": ym.cast(pa.int64())})

    first = shuffle.grouped_agg(
        orders.map_batches(pre, batch_format="pyarrow"),
        ["o_custkey"], {"cohort_ym": ("ym", "min")})
    return shuffle.grouped_agg(first, ["cohort_ym"],
                               {"n_customers": (None, "count")})


def q_docs_source_dedup(sf_dir: str):
    """(source, n_docs, n_distinct) — per-source duplication profile
    (which crawl/source is boilerplate-heavy?). Same sha1-text key as
    exact dedup: one (source, h) grouped count (map-side partials bound
    the shuffle), then a per-source rollup — n_docs = sum of family
    sizes, n_distinct = family count."""
    import hashlib

    def h(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha1(x.encode("utf-8")).hexdigest()
              for x in t.column("text").to_pylist()]
        return pa.table({"source": t.column("source"),
                         "h": pa.array(hs, type=pa.string())})

    keyed = _docs(sf_dir, columns=["source", "text"]).map_batches(
        h, batch_format="pyarrow")
    # one (source, text-hash) count, then a per-source rollup where
    # n_docs = sum of family sizes and n_distinct = family count —
    # two wide steps, no join
    per_text = shuffle.grouped_agg(keyed, ["source", "h"],
                                   {"n": (None, "count")})
    return shuffle.grouped_agg(
        per_text, ["source"],
        {"n_docs": ("n", "sum"), "n_distinct": (None, "count")})


def q_docs_dup_families(sf_dir: str):
    """(n_copies, n_texts) — exact-duplicate multiplicity histogram (the
    dedup-analytics readout: how much of the corpus is x2 / x10 / x1000
    boilerplate?). Same sha1-key shuffle as exact_dedup (bodies never
    move), then a tiny second grouped count over family sizes."""
    import hashlib

    def h(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha1(x.encode("utf-8")).hexdigest()
              for x in t.column("text").to_pylist()]
        return pa.table({"h": pa.array(hs, type=pa.string())})

    fam = shuffle.grouped_agg(
        _docs(sf_dir).select_columns(["text"]).map_batches(
            h, batch_format="pyarrow"),
        ["h"], {"n_copies": (None, "count")})
    return shuffle.grouped_agg(fam, ["n_copies"],
                               {"n_texts": (None, "count")})


def q_docs_char_classes(sf_dir: str):
    """(doc_id, n_chars, n_alpha, n_digit, n_space, n_other) — per-doc
    character-class census (the cheap corpus-composition signal: binary
    junk shows as n_other spikes, tables as digit-heavy rows). All four
    counted classes are RE2 kernels over zero-copy Arrow
    (pc.count_substring_regex — no Python loop); ASCII classes so engine
    and DuckDB agree on every codepoint; n_other closes the sum."""
    def census(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        n = pc.utf8_length(txt).cast(pa.int64())
        alpha = pc.count_substring_regex(txt, "[A-Za-z]").cast(pa.int64())
        digit = pc.count_substring_regex(txt, "[0-9]").cast(pa.int64())
        space = pc.count_substring_regex(txt, r"\s").cast(pa.int64())
        other = pc.subtract(
            n, pc.add(pc.add(alpha, digit), space))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_chars": n, "n_alpha": alpha,
                         "n_digit": digit, "n_space": space,
                         "n_other": other})

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        census, batch_format="pyarrow")


def q_docs_bpe_pairs(sf_dir: str):
    """(pair, n, rank) — corpus-wide top-BPE_PAIR_TOPK adjacent-codepoint
    pairs (textstats.char_pair_counts_batch): the candidate/merge table
    of ONE BPE tokenizer-training iteration (ties: n desc, pair asc).
    Scale shape: the per-batch np.unique combine bounds every block's
    output at |alphabet|^2 rows regardless of corpus size, one
    partial-combined grouped sum, then per-block partial top-K folds —
    <= #blocks x K rows ever reach the driver (the BM25 top-K
    convention)."""
    from ligrust_ray.dataops.textstats import (BPE_PAIR_TOPK,
                                               char_pair_counts_batch)

    counts = shuffle.grouped_agg(
        _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
            char_pair_counts_batch, batch_format="pyarrow"),
        ["pair"], {"n": ("n", "sum")})

    def block_topk(t: pa.Table) -> pa.Table:
        empty = pa.table({"pair": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if not t.num_rows:
            return empty
        df = t.to_pandas().sort_values(["n", "pair"],
                                       ascending=[False, True])
        return pa.Table.from_pandas(df.head(BPE_PAIR_TOPK),
                                    preserve_index=False)

    tops = counts.map_batches(block_topk,
                              batch_format="pyarrow").to_pandas()
    tops = tops.sort_values(["n", "pair"], ascending=[False, True]) \
        .head(BPE_PAIR_TOPK).reset_index(drop=True)
    return pa.table({
        "pair": pa.array(tops["pair"], type=pa.string()),
        "n": pa.array(tops["n"].to_numpy(dtype=np.int64)),
        "rank": pa.array(np.arange(1, len(tops) + 1, dtype=np.int64))})


def q_docs_entropy(sf_dir: str):
    """(doc_id, entropy_ubits) — per-doc character entropy in integer
    micro-bits (textstats.char_entropy_batch): the gibberish/spam
    quality axis (near-zero entropy = repeated-character filler, the
    thing token-level repetition stats miss). Stateless map_batches,
    shuffle-free; int64 per-character terms make the hash compare
    exact."""
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        textstats.char_entropy_batch, batch_format="pyarrow")


def q_docs_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(textstats.fingerprint_batch,
                                     batch_format="pyarrow")


def q_docs_winnowing(sf_dir: str):
    """(doc_id, fp) winnowing fingerprints (textstats.winnow_batch) —
    MOSS-style local fingerprinting; shuffle-free per-doc map."""
    return _docs(sf_dir).map_batches(textstats.winnow_batch,
                                     batch_format="pyarrow")


def q_docs_chunk(sf_dir: str):
    """(doc_id, chunk_id, start_tok, n_tokens, chunk_fp) sliding-window
    training chunks (textstats.chunk_batch) — shuffle-free per-doc map."""
    return _docs(sf_dir).map_batches(textstats.chunk_batch,
                                     batch_format="pyarrow")


def q_docs_sim_join(sf_dir: str):
    """(a, b, n_common, n_union) exact token-set similarity join at
    Jaccard >= 0.9 (dedup.similarity_join) — prefix-filtered AllPairs;
    lossless, so the oracle is the brute-force quadratic join."""
    return dedup.similarity_join(_docs(sf_dir), thr_num=9, thr_den=10)


def q_docs_containment(sf_dir: str):
    """(a, b, n_common, n_a) exact DIRECTIONAL containment join at
    |A∩B| >= 0.9·|A| (dedup.containment_join) — catches quotes and
    wrapped copies that symmetric Jaccard misses; prefix filter is
    lossless, so the oracle is the brute-force quadratic join."""
    return dedup.containment_join(_docs(sf_dir), thr_num=9, thr_den=10)


def q_docs_winnow_pairs(sf_dir: str):
    """(a, b, shared) near-dup candidate pairs sharing >= 2 winnowing
    fingerprints (dedup.winnow_pairs) — the MOSS pair generator."""
    return dedup.winnow_pairs(_docs(sf_dir), min_shared=2)


QM_MISSING_SCORE = -(1 << 62)     # zero-token docs: rank below any real score


_MINHASH_CACHE: dict = {}


def _docs_fp(sf_dir: str) -> tuple[int, int]:
    """Freshness fingerprint of this sf_dir's documents table (the
    _events_fp convention for docs-derived caches)."""
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return (st.st_mtime_ns, st.st_size)


def _minhash_cached(sf_dir: str) -> ray.data.Dataset:
    """Materialized minhash-LSH cluster table, shared by
    docs_minhash_dedup and docs_dedup_keep_best (the _lp_cached
    pattern — the LSH/verify/components run is the expensive part and
    both queries consume the identical output)."""
    key = (sf_dir, _docs_fp(sf_dir))
    if key not in _MINHASH_CACHE:
        _evict_stale(_MINHASH_CACHE, key)
        _MINHASH_CACHE[key] = dedup.minhash_lsh_dedup(
            _docs(sf_dir)).materialize()
    return _MINHASH_CACHE[key]


def q_docs_dedup_keep_best(sf_dir: str):
    """(cluster, keep_id, n_members, best_score) — near-dup survivor
    selection that keeps the BEST copy instead of the arbitrary min-id:
    minhash-LSH clusters join the hashed-linear quality scores
    (docs_quality_model), then one cluster-keyed argmax (score DESC,
    doc_id ASC; unscored zero-token docs rank at QM_MISSING_SCORE). The
    production shape: cluster table and score table co-partition through
    one keyed join, bodies never move."""
    clusters = _minhash_cached(sf_dir)
    scores = _docs(sf_dir).map_batches(
        lambda t: textstats.quality_model()(t),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "score": t.column("score")}),
        batch_format="pyarrow")
    j = shuffle.hash_join(clusters, scores, on="doc_id",
                          l_cols=["cluster"], r_cols=["score"],
                          how="left", fill={"score": QM_MISSING_SCORE})

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster", "score", "doc_id"],
                            ascending=[True, False, True])
        n = df.groupby("cluster", sort=False)["doc_id"].transform("size")
        top = df.assign(n_members=n).drop_duplicates("cluster")
        return pd.DataFrame({
            "cluster": top["cluster"].to_numpy(dtype=np.int64),
            "keep_id": top["doc_id"].to_numpy(dtype=np.int64),
            "n_members": top["n_members"].to_numpy(dtype=np.int64),
            "best_score": top["score"].to_numpy(dtype=np.int64)})

    return shuffle.grouped_apply(j, ["cluster"], best)


def q_docs_token_entropy(sf_dir: str):
    """(doc_id, tok_entropy_ubits) — per-doc token-level Shannon entropy
    in integer micro-bits (textstats.token_entropy_batch): the
    templated/boilerplate quality axis character entropy misses; tokens
    group by md5 hash on both engines so parity is structural."""
    return _docs(sf_dir).map_batches(textstats.token_entropy_batch,
                                     batch_format="pyarrow")


def q_docs_ngram_novelty(sf_dir: str):
    """(doc_id, n_grams, n_novel) — per-doc distinct 8-gram count and
    globally-first-seen gram count (dedup.ngram_novelty): the
    curriculum/memorization novelty scan, gram spec shared with
    decontaminate/dup_spans so the oracle reuses the same CTE shape."""
    return dedup.ngram_novelty(_docs(sf_dir))


def q_docs_minhash_dedup(sf_dir: str):
    return _minhash_cached(sf_dir)


def q_docs_simhash(sf_dir: str):
    return dedup.simhash_dataset(_docs(sf_dir))


def q_docs_locality_order(sf_dir: str):
    """(doc_id, pos) — compression-locality export ordering: rank every
    doc by (simhash, doc_id) so templated / near-duplicate pages land
    ADJACENT in the output stream (the pre-sort crawl archives apply
    before zstd — similar bytes inside one compression window). The
    rank is the docs_shuffle distributed scan with the SIGNED simhash
    as the range key: buckets are the top SHUFFLE_BUCKET_BITS bits via
    ARITHMETIC shift (bucket order == signed key order), per-bucket
    counts fold to driver offsets, one grouped_apply finishes — nothing
    n-length on the driver."""
    sh = dedup.simhash_dataset(_docs(sf_dir))

    def keyed(t: pa.Table) -> pa.Table:
        k = t.column("simhash").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "k": pa.array(k),
            "bucket": pa.array(k >> (64 - SHUFFLE_BUCKET_BITS))})

    tc = sh.map_batches(keyed, batch_format="pyarrow").materialize()
    sums = shuffle.grouped_agg(tc, ["bucket"],
                               {"cnt": (None, "count")}).to_pandas()
    sums = sums.sort_values("bucket")
    off = np.concatenate(([0], np.cumsum(sums["cnt"].to_numpy())[:-1]))
    off_ref = ray.put(pd.Series(off.astype(np.int64),
                                index=sums["bucket"].to_numpy()))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("doc_id", "pos")})
        offs = ray.get(off_ref)
        df = df.sort_values(["bucket", "k", "doc_id"])
        bk = df["bucket"].to_numpy(dtype=np.int64)
        idx = np.arange(len(df), dtype=np.int64)
        first = np.concatenate(([True], bk[1:] != bk[:-1]))
        base = np.where(first, idx, 0)
        np.maximum.accumulate(base, out=base)
        pos = (idx - base) + offs.loc[bk].to_numpy(dtype=np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "pos": pos})

    return shuffle.grouped_apply(tc, ["bucket"], rank)


def q_docs_simhash_dupes(sf_dir: str):
    """(a, b, hamming) Manku-style simhash near-dup pairs: hamming <= 3
    over the 64-bit signatures (4x16-bit band LSH, exact recall by
    pigeonhole; docs with simhash == 0 excluded on both sides)."""
    return dedup.simhash_dup_pairs(_docs(sf_dir))


def q_docs_simhash_clusters(sf_dir: str):
    """(doc_id, cluster) connected-component near-dup clusters over the
    simhash pair graph (cluster = min member doc_id; unpaired docs map to
    themselves) — the minhash dedup output contract with hamming <= 3 as
    the duplicate relation."""
    return dedup.simhash_clusters(_docs(sf_dir))


def q_docs_ngram_dupes(sf_dir: str):
    return dedup.ngram_jaccard_pairs(_docs(sf_dir), threshold=0.5)


# ------------------------------------------------------------ embeddings ops
def q_emb_knn(sf_dir: str):
    return ann.knn_bruteforce(_emb(sf_dir), query_ids=[0, 1, 2, 3, 4], k=10)


def q_emb_pq_codes(sf_dir: str):
    """(vec_id, s, code) product-quantization codes (ann.pq_codes):
    deterministic md5-medoid codebook, exact int64 fixed-point distances
    — the full code-assignment path is SQL-hash-checked."""
    return ann.pq_codes(_emb(sf_dir))


def q_emb_knn_pq(sf_dir: str):
    """(query_id, neighbor_id, rank) ADC top-k over PQ codes
    (ann.knn_pq) — the compressed-domain scan; int64-exact, oracled."""
    return ann.knn_pq(_emb(sf_dir), query_ids=[0, 1, 2, 3, 4], k=10)


def q_emb_knn_ivf(sf_dir: str):
    """IVF top-k with the deterministic md5 id-bucket quantizer
    (ann.md5_buckets) — identical bucketed-layout / probe / partial-top-k
    plumbing as the k-means index, but every step is a pure function of
    the data, so the whole approximate pipeline is SQL-hash-checked; the
    k-means quantizer's RECALL is pytest-verified against brute force."""
    return ann.knn_ivf(_emb(sf_dir), query_ids=[0, 1, 2, 3, 4], k=10,
                       quantizer="md5")


def q_emb_near_dup(sf_dir: str):
    ds = dedup.embedding_near_dup(_emb(sf_dir), threshold=0.45)
    # concatenate with an explicit schema so an empty result keeps columns
    parts = [b for b in ds.iter_batches(batch_format="pyarrow")]
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    return pa.concat_tables([t.cast(schema) for t in parts]) if parts else \
        schema.empty_table()


def q_emb_label_centroids(sf_dir: str):
    """(label, dim, sum_milli, n_vecs) — per-label centroid ACCUMULATORS
    on the floor(float64(e)*1000) fixed-point grid (the PQ grid): exact
    integer sums + counts instead of a float mean, so the table is
    hash-exact and mergeable (centroid = sum_milli / n_vecs at whatever
    precision a consumer wants — the nearest-class-mean classifier /
    k-means-init building block). Scale shape: per-batch explode to
    (label, dim) rows collapses map-side in grouped_agg's partial — at
    most |labels| x dim rows per block cross the one shuffle."""
    emb = _read_sized(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["label", "embedding"])

    def part(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy()
        milli = np.floor(flat.astype(np.float64) * 1000).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy().astype(np.int64)
        lab = np.repeat(t.column("label").to_numpy().astype(np.int64),
                        lens)
        idx = np.arange(len(flat), dtype=np.int64)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        return pa.table({"label": pa.array(lab),
                         "dim": pa.array(idx - starts),
                         "s": pa.array(milli),
                         "c": pa.array(np.ones(len(flat),
                                               dtype=np.int64))})

    return shuffle.grouped_agg(
        emb.map_batches(part, batch_format="pyarrow"),
        ["label", "dim"],
        {"sum_milli": ("s", "sum"), "n_vecs": ("c", "sum")})


# ----------------------------------------------- relational (TPC-H-ish)
def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped: grouped sums/counts over lineitem, shipped before a
    fixed date — column-pruned read, partial-combine hash aggregate."""
    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_returnflag", "l_linestatus", "l_quantity",
                              "l_extendedprice", "l_shipdate"])

    def pre(t: pa.Table) -> pa.Table:
        import datetime

        import pyarrow.compute as pc

        t = t.filter(pc.less_equal(t.column("l_shipdate"),
                                   pa.scalar(datetime.datetime(1998, 9, 2))))
        # integer units (qty, price cents): sums are exact and order-free,
        # so the Ray result hashes identically to the DuckDB oracle.
        # floor(x+0.5) rounding shared with the oracle — pc.round is
        # half-even and diverges from SQL ROUND on exact .5 values
        qty = np.floor(t.column("l_quantity").to_numpy() + 0.5) \
            .astype(np.int64)
        cents = np.floor(t.column("l_extendedprice").to_numpy()
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": pa.array(qty),
            "price_cents": pa.array(cents),
        })

    filtered = li.map_batches(pre, batch_format="pyarrow")
    out = shuffle.grouped_agg(
        filtered, ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("qty", "sum"),
         "sum_price_cents": ("price_cents", "sum"),
         "n_rows": (None, "count")})
    return out.map_batches(
        lambda t: pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "sum_qty": t.column("sum_qty").cast(pa.int64()),
            "sum_price_cents": t.column("sum_price_cents").cast(pa.int64()),
            "n_rows": t.column("n_rows").cast(pa.int64())}),
        batch_format="pyarrow")


SEG_BROADCAST_MAX = 5_000_000  # customer rows; above this the segment
#                                lookup joins instead of broadcasting —
#                                customer scales WITH the corpus, unlike
#                                nation/region which are genuinely fixed


def q_orders_by_segment(sf_dir: str):
    """(mktsegment, n_orders, revenue_cents) — orders rolled up by the
    ordering customer's market segment. Broadcast hash join (small side
    ray.put once, resolved per batch with np.searchsorted) ONLY while
    customer fits under SEG_BROADCAST_MAX rows; above the gate the
    segment resolves via a keyed agg_co_group on custkey with the
    per-custkey revenue partial fused into the join (the
    supplier_nation_revenue plan shape), so neither side ever
    materializes on the driver."""
    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])
    cust_ds = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_mktsegment"])
    if cust_ds.count() <= SEG_BROADCAST_MAX:
        cust = cust_ds.to_pandas()
        order_k = np.argsort(cust["c_custkey"].to_numpy())
        keys = cust["c_custkey"].to_numpy()[order_k]
        segs = cust["c_mktsegment"].to_numpy()[order_k]
        bcast = ray.put((keys, segs))

        def join(t: pa.Table) -> pa.Table:
            k, s = ray.get(bcast)
            ck = t.column("o_custkey").to_numpy()
            pos = np.minimum(np.searchsorted(k, ck), len(k) - 1)
            ok = k[pos] == ck
            cents = np.floor(
                t.column("o_totalprice").to_numpy()[ok] * 100.0
                + 0.5).astype(np.int64)
            return pa.table({
                "mktsegment": pa.array(s[pos][ok], type=pa.string()),
                "price_cents": pa.array(cents)})

        out = shuffle.grouped_agg(
            orders.map_batches(join, batch_format="pyarrow"),
            ["mktsegment"],
            {"n_orders": (None, "count"),
             "revenue_cents": ("price_cents", "sum")})
    else:
        def pre(t: pa.Table) -> pa.Table:
            cents = np.floor(t.column("o_totalprice").to_numpy() * 100.0
                             + 0.5).astype(np.int64)
            return pa.table({
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
                "cents": pa.array(cents)})

        cust_cast = cust_ds.map_batches(
            lambda t: pa.table({
                "c_custkey": t.column("c_custkey").cast(pa.int64()),
                "mktsegment": t.column("c_mktsegment").cast(pa.string())}),
            batch_format="pyarrow")
        # per-custkey (n_orders, revenue) partial fused INTO the join:
        # one wide step carrying one row per custkey per block
        per_cust = shuffle.agg_co_group(
            orders.map_batches(pre, batch_format="pyarrow"), cust_cast,
            keys=["o_custkey"], l_on="o_custkey", r_on="c_custkey",
            aggs={"revenue_cents": ("cents", "sum"),
                  "n_orders": (None, "count")},
            fn=lambda lf, rf: lf.rename(
                columns={"o_custkey": "c_custkey"}).merge(
                rf, on="c_custkey")[["mktsegment", "n_orders",
                                     "revenue_cents"]],
            l_schema=pa.schema([("o_custkey", pa.int64()),
                                ("revenue_cents", pa.int64()),
                                ("n_orders", pa.int64())]),
            r_schema=pa.schema([("c_custkey", pa.int64()),
                                ("mktsegment", pa.string())]))
        out = shuffle.grouped_agg(
            per_cust, ["mktsegment"],
            {"n_orders": ("n_orders", "sum"),
             "revenue_cents": ("revenue_cents", "sum")})
    return out.map_batches(
        lambda t: pa.table({
            "mktsegment": t.column("mktsegment"),
            "n_orders": t.column("n_orders").cast(pa.int64()),
            "revenue_cents": t.column("revenue_cents").cast(pa.int64())}),
        batch_format="pyarrow")


def q_order_revenue_by_priority(sf_dir: str):
    """Big x big shuffle join (lineitem x orders on orderkey — both sides
    too large to broadcast at scale) then grouped integer-cents revenue
    per order priority. Exercises stages/shuffle.hash_join."""
    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def pre(t: pa.Table) -> pa.Table:
        # floor(x+0.5) rounding shared with the oracle — exact .5 values DO
        # occur in price*(1-discount) and np.round's half-even would differ
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1.0 - t.column("l_discount").to_numpy())
                       * 100.0 + 0.5).astype(np.int64)
        return pa.table({"okey": t.column("l_orderkey").cast(pa.int64()),
                         "rev_cents": pa.array(rev)})

    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_orderpriority"])

    def okey(t: pa.Table) -> pa.Table:
        return pa.table({"okey": t.column("o_orderkey").cast(pa.int64()),
                         "priority": t.column("o_orderpriority")})

    joined = shuffle.hash_join(
        li.map_batches(pre, batch_format="pyarrow"),
        orders.map_batches(okey, batch_format="pyarrow"),
        on="okey", l_cols=["rev_cents"], r_cols=["priority"])
    out = shuffle.grouped_agg(joined, ["priority"],
                              {"n_items": (None, "count"),
                               "revenue_cents": ("rev_cents", "sum")})
    return out.map_batches(
        lambda t: pa.table({
            "priority": t.column("priority"),
            "n_items": t.column("n_items").cast(pa.int64()),
            "revenue_cents": t.column("revenue_cents").cast(pa.int64())}),
        batch_format="pyarrow")


def q_events_asof_click(sf_dir: str):
    """As-of join (self): for every event, the timestamp of the most
    recent STRICTLY PRECEDING 'click' event of the same user (-1 epoch-us
    sentinel when none). Hash-partition by user, then one vectorised
    sorted sweep per partition — the canonical as-of-join shape Ray Data
    lacks natively; partitioning assumption: one user's history fits a
    partition."""
    from ligrust_ray.dataops import windows

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_id", "ts", "user_id", "event_type"])
    return windows.asof_last_match(ev, match_value="click")


def q_events_distinct_users(sf_dir: str):
    """Exact distinct users per event type (the ground truth the HLL
    sketch approximates): distinct (type, user) pairs, then a grouped
    count — two bounded shuffles, no raw-row fan-in."""
    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_type", "user_id"])
    dist = shuffle.distinct(ev, ["event_type", "user_id"])
    out = shuffle.grouped_agg(dist, ["event_type"],
                              {"n_users": (None, "count")})
    return out.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "n_users": t.column("n_users").cast(pa.int64())}),
        batch_format="pyarrow")


def q_docs_token_cms(sf_dir: str):
    """(r, c, n) — COUNT-MIN SKETCH registers over the corpus token
    stream (dataops/sketch.cms_registers: depth 4 x width 1024, md5 row
    hashes). Like the HLL, the register table IS the contract output —
    pure integers, exactly SQL-replicable; the min-over-rows point
    estimator (never under the true count, tight for heavy hitters) is
    pytest-checked against exact counts."""
    from ligrust_ray.dataops import sketch

    return sketch.cms_registers(_docs(sf_dir, columns=["text"]))


def q_events_user_bloom(sf_dir: str):
    """Bloom-filter bit positions over events.user_id (k=4, m=2^16) —
    the crawl-frontier / seen-set sketch. Bits ARE the contract output
    (dataops/sketch.py bloom_bits): bounded at m rows however many
    events stream through; membership is pytest-checked (zero false
    negatives, FP rate near theory)."""
    from ligrust_ray.dataops import sketch

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["user_id"])
    return sketch.bloom_bits(ev, "user_id").map_batches(
        lambda t: pa.table({"bit": t.column("bit").cast(pa.int64())}),
        batch_format="pyarrow")


def q_events_user_hll(sf_dir: str):
    """Per-event-type HyperLogLog registers over user_id (p=12). The
    registers ARE the contract output — pure integers, order-insensitive,
    exactly replicated by the DuckDB oracle; the float estimator is
    pytest-checked (dataops/sketch.py)."""
    from ligrust_ray.dataops import sketch

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["event_type", "user_id"])
    out = sketch.hll_registers(ev, "user_id", "event_type")
    return out.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "reg": t.column("reg").cast(pa.int64()),
                            "rho": t.column("rho").cast(pa.int64())}),
        batch_format="pyarrow")


def q_events_window_hll(sf_dir: str):
    """(window_start_us, reg, rho) — per-tumbling-window (1h) HyperLogLog
    registers over user_id (p=12): the distinct-users-per-window sketch a
    streaming analytics pipeline keeps instead of an exact per-window
    COUNT(DISTINCT) — state bounded at 2^p rows per window however many
    users flow through. Composes the tumbling-window key (a pure,
    stateless function of ts) with the mergeable HLL register table: one
    partial-combined grouped max per (window, reg). The registers ARE
    the contract output (pure integers, SQL-replicable); the float
    estimator is pytest-checked in dataops/sketch.py."""
    from ligrust_ray.dataops import sketch

    ev = _read_sized(os.path.join(sf_dir, "events.parquet"),
                     columns=["ts", "user_id"])

    def bucket(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        w = (ts // 3_600_000_000) * 3_600_000_000
        return pa.table({"window_start_us": pa.array(w),
                         "user_id": t.column("user_id")})

    out = sketch.hll_registers(
        ev.map_batches(bucket, batch_format="pyarrow"),
        "user_id", "window_start_us")
    return out.map_batches(
        lambda t: pa.table({
            "window_start_us": t.column("window_start_us").cast(pa.int64()),
            "reg": t.column("reg").cast(pa.int64()),
            "rho": t.column("rho").cast(pa.int64())}),
        batch_format="pyarrow")


def q_docs_sample(sf_dir: str):
    """Deterministic 10% hash-mod sample (coordination-free, reproducible
    on any cluster size)."""
    return _docs(sf_dir).map_batches(textstats.hash_mod_sample_batch,
                                     batch_format="pyarrow")


def q_docs_pack(sf_dir: str):
    """(doc_id, n_tokens, pack_id) — fixed-budget sequence packing via a
    distributed exclusive prefix sum over doc_id order (dataops/pack.py);
    the SQL oracle is the equivalent window sum."""
    from ligrust_ray.dataops import pack

    return pack.pack_assign(
        _read_sized(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"]))


SHUFFLE_SHARDS = 8          # output shards (round-robin over the order)
SHUFFLE_BUCKET_BITS = 12    # 4096 h-range scan buckets


def q_docs_shuffle(sf_dir: str):
    """(doc_id, pos, shard) — deterministic global TRAINING-ORDER SHUFFLE
    + shard assignment (the op every LM data pipeline runs last): docs
    are ordered by (md5_number_lower(doc_id), doc_id) — the hash is the
    reproducible random tape — pos is the 0-based global position and
    shard = pos % SHUFFLE_SHARDS (round-robin keeps shards size-balanced
    to ±1). Scale shape — a distributed rank (same scan pattern as
    docs_pack): bucket = top hash bits (so bucket order IS hash order),
    per-bucket counts via one partial-combined grouped_agg, the tiny
    bucket table exclusive-cumsums into offsets that ride the object
    store into one grouped_apply computing in-bucket ranks vectorised.
    Bodies never shuffle; nothing n-length touches the driver."""
    return shuffle_rank(_read_sized(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]))


def shuffle_rank(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, pos, shard) over any (doc_id, ...) Dataset — the
    docs_shuffle core, reused by the CLI `prepare` pipeline."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    def keyed(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy().astype(np.int64)
        h = md5_u64_lower_arrow(
            pa.array(did.astype(str), type=pa.string()))
        return pa.table({
            "doc_id": pa.array(did), "h": pa.array(h),
            "bucket": pa.array((h >> np.uint64(64 - SHUFFLE_BUCKET_BITS))
                               .astype(np.int64))})

    tc = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    if tc.count() == 0:
        return ray.data.from_arrow(pa.schema(
            [("doc_id", pa.int64()), ("pos", pa.int64()),
             ("shard", pa.int64())]).empty_table())
    sums = shuffle.grouped_agg(tc, ["bucket"],
                               {"cnt": (None, "count")}).to_pandas()
    sums = sums.sort_values("bucket")
    off = np.concatenate(([0], np.cumsum(sums["cnt"].to_numpy())[:-1]))
    off_ref = ray.put(pd.Series(off.astype(np.int64),
                                index=sums["bucket"].to_numpy()))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("doc_id", "pos", "shard")})
        offs = ray.get(off_ref)
        df = df.sort_values(["bucket", "h", "doc_id"])
        bk = df["bucket"].to_numpy(dtype=np.int64)
        idx = np.arange(len(df), dtype=np.int64)
        first = np.concatenate(([True], bk[1:] != bk[:-1]))
        base = np.where(first, idx, 0)
        np.maximum.accumulate(base, out=base)
        pos = (idx - base) + offs.loc[bk].to_numpy(dtype=np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "pos": pos,
                             "shard": pos % SHUFFLE_SHARDS})

    return shuffle.grouped_apply(tc, ["bucket"], rank)


STRAT_K = 50     # docs kept per language


def q_docs_stratified_sample(sf_dir: str):
    """(lang, doc_id) — language-balanced sample: the STRAT_K docs per
    language with the smallest (md5_number_lower(doc_id), doc_id) key, a
    deterministic coordination-free stratified draw (the hash is the
    random tape, reproducible on any cluster size). Scale shape: per-BATCH
    partial top-K per lang bounds shuffle volume at K x #langs rows per
    block; one tiny grouped_apply finishes. SQL oracle = ROW_NUMBER over
    the same key."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "lang"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "lang": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype=np.int64),
                "h": pd.Series([], dtype=np.uint64)})
        if "h" not in df.columns:
            df = df.assign(h=md5_u64_lower_arrow(
                df["doc_id"].astype(np.int64).astype(str).to_numpy()))
        df = df.sort_values(["lang", "h", "doc_id"])
        return df.groupby("lang", sort=False).head(STRAT_K) \
            [["lang", "doc_id", "h"]]

    out = shuffle.grouped_apply(docs, ["lang"], topk, pre=topk)
    return out.map_batches(
        lambda t: t.select(["lang", "doc_id"]), batch_format="pyarrow")


def q_docs_repetition(sf_dir: str):
    """Gopher-style per-doc repetition signals (duplicate-line counts)."""
    return _docs(sf_dir).map_batches(textstats.repetition_stats_batch,
                                     batch_format="pyarrow")


def q_docs_dup_bigrams(sf_dir: str):
    """(doc_id, n_bigrams, top_n, top_permille) — Gopher-style top-2-gram
    repetition signal (Rae et al. 2021 'fraction of characters in the most
    common n-gram' family, counted over token bigrams): per doc, the count
    of the most frequent adjacent lowercased-\\S+-token pair, as a
    permille of all bigrams. Docs with fewer than two tokens emit no row
    (no bigram exists — the SQL lead() window drops them identically).
    Purely per-doc (embarrassingly parallel map_batches, no shuffle);
    integer arithmetic end to end so the DuckDB hash compare is exact."""
    def score(t: pa.Table) -> pa.Table:
        from collections import Counter

        ids = t.column("doc_id").to_numpy()
        cols: dict[str, list[int]] = {
            "doc_id": [], "n_bigrams": [], "top_n": [], "top_permille": []}
        for did, x in zip(ids, t.column("text").to_pylist()):
            w = _WORD_RE.findall(x.lower())
            if len(w) < 2:
                continue
            top = max(Counter(zip(w, w[1:])).values())
            nb = len(w) - 1
            cols["doc_id"].append(int(did))
            cols["n_bigrams"].append(nb)
            cols["top_n"].append(top)
            cols["top_permille"].append((1000 * top) // nb)
        return pa.table({k: pa.array(v, type=pa.int64())
                         for k, v in cols.items()})

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


def q_docs_dup_trigrams(sf_dir: str):
    """(doc_id, n_trigrams, top_n, top_permille) — the 3-gram member of
    the Gopher repetition family (Rae et al. 2021 run the
    most-common-n-gram fraction for n = 2..4; see q_docs_dup_bigrams
    for n = 2). Docs with fewer than three tokens emit no row. Purely
    per-doc map_batches, integer arithmetic end to end."""
    def score(t: pa.Table) -> pa.Table:
        from collections import Counter

        ids = t.column("doc_id").to_numpy()
        cols: dict[str, list[int]] = {
            "doc_id": [], "n_trigrams": [], "top_n": [],
            "top_permille": []}
        for did, x in zip(ids, t.column("text").to_pylist()):
            w = _WORD_RE.findall(x.lower())
            if len(w) < 3:
                continue
            top = max(Counter(zip(w, w[1:], w[2:])).values())
            nt = len(w) - 2
            cols["doc_id"].append(int(did))
            cols["n_trigrams"].append(nt)
            cols["top_n"].append(top)
            cols["top_permille"].append((1000 * top) // nt)
        return pa.table({k: pa.array(v, type=pa.int64())
                         for k, v in cols.items()})

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


BIGRAM_MIN_COUNT = 5


def q_docs_bigram_counts(sf_dir: str):
    """(bigram, n) — corpus-level adjacent-token-pair counts kept at
    n >= BIGRAM_MIN_COUNT (the n-gram LM statistics table every
    data-quality / contamination stack builds). Scale shape: per-BATCH
    partial Counter collapse (the map-side combiner — each block ships
    its distinct-bigram vocabulary once, never a row per occurrence),
    ONE partial-combined grouped sum, then the threshold filter runs on
    the already-aggregated rows. Tokens = lowercased \\S+ runs, the
    shared tokenizer spec."""
    def part(t: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for x in t.column("text").to_pylist():
            w = _WORD_RE.findall(x.lower())
            cnt.update(" ".join(p) for p in zip(w, w[1:]))
        return pa.table({
            "bigram": pa.array(list(cnt.keys()), type=pa.string()),
            "n": pa.array(list(cnt.values()), type=pa.int64())})

    total = shuffle.grouped_agg(
        _docs(sf_dir, columns=["text"]).map_batches(
            part, batch_format="pyarrow"),
        ["bigram"], {"n": ("n", "sum")})
    return total.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"),
                                            BIGRAM_MIN_COUNT)),
        batch_format="pyarrow")


def q_docs_lm_perplexity(sf_dir: str):
    """(doc_id, n_bigrams, nll_sum_micro, ce_micro) — CCNet-style LM
    quality signal: an add-one-smoothed bigram language model is trained
    on the corpus itself and every doc is scored by its cross-entropy
    under it (CCNet ranks docs by KenLM perplexity; this is the same
    signal with the LM trained in-engine). Per distinct bigram (w1,w2):
    p = (c(w1 w2)+1) / (c(w1)+V), nll = round(-ln p * 1e6) in integer
    micro-nats, so the per-doc sum is exact int64 arithmetic and the
    only float op is one ln per DISTINCT bigram (the pagerank ppm
    precedent). ce_micro = nll_sum_micro // n_bigrams (floor). Docs
    with fewer than two tokens emit no row (no bigram exists — same
    rule as q_docs_dup_bigrams).

    Scale shape (5 keyed steps, never a row per token occurrence past
    the map side): (1) unigram grouped_agg and (2) bigram grouped_agg,
    both per-block Counter partials; (3) V = distinct-unigram count
    (driver scalar); (4) one co_group of the distinct-bigram table with
    the unigram table on w1 producing the (bigram, nll) model — model
    size is bounded by the corpus' distinct-bigram vocabulary, never
    materialized on the driver; (5) per-doc (doc_id, bigram, k) partials
    co_group'd with the model on bigram, then a doc-keyed grouped sum.
    Hot bigrams (stopword pairs) fan IN to one model row but the merge
    is a hash lookup per (doc, distinct-bigram) row, not a cross
    product."""
    from collections import Counter

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def uni_part(t: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for x in t.column("text").to_pylist():
            cnt.update(_WORD_RE.findall(x.lower()))
        return pa.table({
            "token": pa.array(list(cnt.keys()), type=pa.string()),
            "cu": pa.array(list(cnt.values()), type=pa.int64())})

    uni = shuffle.grouped_agg(
        docs.map_batches(uni_part, batch_format="pyarrow"),
        ["token"], {"cu": ("cu", "sum")}).materialize()
    vocab = uni.count()

    def big_part(t: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for x in t.column("text").to_pylist():
            w = _WORD_RE.findall(x.lower())
            cnt.update(" ".join(p) for p in zip(w, w[1:]))
        return pa.table({
            "bigram": pa.array(list(cnt.keys()), type=pa.string()),
            "cb": pa.array(list(cnt.values()), type=pa.int64())})

    big = shuffle.grouped_agg(
        docs.map_batches(big_part, batch_format="pyarrow"),
        ["bigram"], {"cb": ("cb", "sum")})
    # tokens contain no ' ' (the tokenizer splits on it), so the first
    # space inside a bigram string is an unambiguous w1/w2 boundary
    big = big.map_batches(
        lambda t: t.append_column("w1", pc.list_element(
            pc.split_pattern(t.column("bigram"), " ", max_splits=1), 0)),
        batch_format="pyarrow")

    def model_merge(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if not len(lf):
            return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                                 "nll": pd.Series([], dtype=np.int64)})
        cu = rf.set_index("token")["cu"]
        cuv = cu.reindex(lf["w1"]).to_numpy(dtype=np.float64)
        p = (lf["cb"].to_numpy(np.float64) + 1.0) / (cuv + float(vocab))
        nll = np.floor(-np.log(p) * 1_000_000 + 0.5).astype(np.int64)
        return pd.DataFrame({"bigram": lf["bigram"].to_numpy(),
                             "nll": nll})

    model = shuffle.co_group(
        big, uni, l_on="w1", r_on="token", fn=model_merge,
        l_schema=pa.schema([("bigram", pa.string()), ("cb", pa.int64()),
                            ("w1", pa.string())]),
        r_schema=pa.schema([("token", pa.string()), ("cu", pa.int64())]))

    def doc_part(t: pa.Table) -> pa.Table:
        ids, bgs, ks = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            w = _WORD_RE.findall(x.lower())
            cnt = Counter(" ".join(p) for p in zip(w, w[1:]))
            ids.extend([d] * len(cnt))
            bgs.extend(cnt.keys())
            ks.extend(cnt.values())
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "bigram": pa.array(bgs, type=pa.string()),
            "k": pa.array(ks, type=pa.int64())})

    def score_merge(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if not len(lf):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "n_bigrams": pd.Series([], dtype=np.int64),
                "nll_sum_micro": pd.Series([], dtype=np.int64)})
        nll = rf.set_index("bigram")["nll"]
        k = lf["k"].to_numpy(np.int64)
        s = k * nll.reindex(lf["bigram"]).to_numpy(dtype=np.int64)
        part = pd.DataFrame({"doc_id": lf["doc_id"].to_numpy(np.int64),
                             "n_bigrams": k, "nll_sum_micro": s})
        return part.groupby("doc_id", as_index=False, sort=False).sum()

    scored = shuffle.co_group(
        docs.map_batches(doc_part, batch_format="pyarrow"),
        model, l_on="bigram", r_on="bigram", fn=score_merge,
        l_schema=pa.schema([("doc_id", pa.int64()),
                            ("bigram", pa.string()),
                            ("k", pa.int64())]),
        r_schema=pa.schema([("bigram", pa.string()),
                            ("nll", pa.int64())]))
    out = shuffle.grouped_agg(
        scored, ["doc_id"],
        {"n_bigrams": ("n_bigrams", "sum"),
         "nll_sum_micro": ("nll_sum_micro", "sum")})
    # exact int64 floor division (both operands non-negative, so Arrow's
    # truncating integer divide == DuckDB's // floor division)
    return out.map_batches(
        lambda t: t.append_column(
            "ce_micro", pc.divide(t.column("nll_sum_micro"),
                                  t.column("n_bigrams"))),
        batch_format="pyarrow")


LINE_DEDUP_MIN_COUNT = 3


def q_docs_line_dedup(sf_dir: str):
    """(doc_id, text_clean, n_removed) — CCNet-style corpus-level line
    dedup: lines occurring >= LINE_DEDUP_MIN_COUNT times corpus-wide are
    removed. The spec is md5-HASH-keyed (dedup.line_dedup), so the DuckDB
    oracle's GROUP BY md5_number_lower(line) replicates the engine
    exactly even on a collision. (The synthetic documents are single-line
    and unique, so the sf contract checks plumbing — the planted
    multi-line pytest with an in-test DuckDB cross-check carries the
    removal semantics.)"""
    from ligrust_ray.dataops.dedup import line_dedup

    return line_dedup(_docs(sf_dir), min_count=LINE_DEDUP_MIN_COUNT)


def q_docs_pii_scrub(sf_dir: str):
    """(doc_id, text_clean, n_email, n_ip, n_phone) — typed-token PII
    redaction (emails, IPv4, phone-like digit runs) with per-type match
    counts. Engine and oracle both run RE2 (pyarrow.compute regex kernels
    vs DuckDB regexp_*), patterns shared from textstats.PII_PATTERNS."""
    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        textstats.pii_scrub_batch, batch_format="pyarrow")


def q_docs_preprocess(sf_dir: str):
    """(doc_id, text_clean, n_removed, n_email, n_ip, n_phone) — the
    composed cleaning pipeline: corpus-level line dedup feeding PII
    scrubbing, one streaming chain (the line-dedup output batches flow
    straight into the RE2 redaction kernel; no intermediate
    materialisation). Oracle = the two oracles nested as CTEs."""
    from ligrust_ray.dataops.dedup import line_dedup

    ld = line_dedup(_docs(sf_dir), min_count=LINE_DEDUP_MIN_COUNT)

    def scrub(t: pa.Table) -> pa.Table:
        p = textstats.pii_scrub_batch(pa.table({
            "doc_id": t.column("doc_id"),
            "text": t.column("text_clean")}))
        return p.append_column("n_removed", t.column("n_removed"))

    return ld.map_batches(scrub, batch_format="pyarrow")


def q_docs_source_stats(sf_dir: str):
    """Per-source corpus accounting (the per-domain crawl dashboard):
    doc count, total chars, total whitespace tokens."""
    def per_batch(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        toks = [len(_WS_SPLIT.split(x.strip(" "))) for x in texts]
        return pa.table({"source": t.column("source"),
                         "n_chars": t.column("n_chars").cast(pa.int64()),
                         "n_toks": pa.array(toks, type=pa.int64())})

    out = shuffle.grouped_agg(
        _docs(sf_dir).map_batches(per_batch, batch_format="pyarrow"),
        ["source"],
        {"n_docs": (None, "count"), "sum_chars": ("n_chars", "sum"),
         "sum_tokens": ("n_toks", "sum")})
    return out.map_batches(
        lambda t: pa.table({
            "source": t.column("source"),
            "n_docs": t.column("n_docs").cast(pa.int64()),
            "sum_chars": t.column("sum_chars").cast(pa.int64()),
            "sum_tokens": t.column("sum_tokens").cast(pa.int64())}),
        batch_format="pyarrow")


TOP_TOKENS_K = 50


def _top_vocab(sf_dir: str, k: int) -> pd.DataFrame:
    """Global top-k vocabulary by token count (lower(text), \\S+ tokens),
    ties broken token-ascending. Distributed shape: per-batch token
    pre-count (np.unique combiner), one grouped sum (each token lands in
    exactly ONE partition, so per-partition top-k partials are exact),
    tiny P x k driver merge."""
    def batch_counts(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for x in t.column("text").to_pylist():
            toks.extend(_WORD_RE.findall(x.lower()))
        if not toks:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        u, c = np.unique(np.array(toks, dtype=object), return_counts=True)
        return pa.table({"token": pa.array(u.tolist(), type=pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    counts = shuffle.grouped_agg(
        _docs(sf_dir).map_batches(batch_counts, batch_format="pyarrow"),
        ["token"], {"n": ("n", "sum")})

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"], ascending=[False, True]) \
            .head(k)

    parts = counts.map_batches(partial_topk, batch_format="pandas") \
        .to_pandas()
    return parts.sort_values(["n", "token"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)


def q_docs_top_tokens(sf_dir: str):
    """Global top-K vocabulary by token count (see _top_vocab)."""
    top = _top_vocab(sf_dir, TOP_TOKENS_K)
    return pa.table({"token": pa.array(top["token"], type=pa.string()),
                     "n": pa.array(top["n"].to_numpy(dtype=np.int64))})


BM25_K_DOCS = 20
BM25_QUERY = ("query", "window", "spark", "customer")
BM25_SCALE = 1000   # idf fixed point: floor(1000*ln(1+(N-df+.5)/(df+.5))+.5)


def _bm25_batch_counts(t: pa.Table):
    """Vectorised per-doc (doc_id, dl, tf matrix) for one batch: RE2-
    parity regex split (empties at string edges dropped), parent-index
    bincounts — no Python loop over rows or tokens-per-row."""
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    toks = pc.split_pattern_regex(
        pc.utf8_lower(t.column("text")), textstats.RE2_WS + "+"
    ).combine_chunks()
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.chunk(0) if toks.num_chunks else \
            pa.array([], type=pa.list_(pa.string()))
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(len(ids)), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, doc_idx = flat.filter(pa.array(keep)), doc_idx[keep]
    dl = np.bincount(doc_idx, minlength=len(ids)).astype(np.int64)
    tf = np.zeros((len(BM25_QUERY), len(ids)), dtype=np.int64)
    for qi, tok in enumerate(BM25_QUERY):
        m = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
        if m.any():
            tf[qi] = np.bincount(doc_idx[m], minlength=len(ids))
    return ids, dl, tf


def q_docs_bm25(sf_dir: str):
    """(doc_id, score_milli) — top-BM25_K_DOCS documents for the fixed
    query BM25_QUERY under Okapi BM25 (k1=1.2, b=0.75), integer-exact:
    with T = total corpus tokens, N = docs, per-term score = idf_milli *
    22*T*tf // (10*T*tf + 3*T + 9*dl*N) (the k1/b constants cleared to
    the common denominator 10*T), idf_milli = floor(1000*ln(1 +
    (N-df+0.5)/(df+0.5)) + 0.5) — LN parity with DuckDB per the
    Adamic-Adar convention. Retrieval/quality-scoring primitive for LM
    data pipelines (e.g. pulling docs matching a reference corpus).
    Scale shape: pass 1 folds one bounded partial row per block (N, T,
    per-query-token df); pass 2 scores each doc locally against the
    broadcast constants and keeps a per-block partial top-K, so only
    P*K candidate rows reach the driver merge. Int64 exactness is
    guarded (raises) at idf*22*T*dl >= 2^62 — at that corpus size
    switch to float scoring."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        _, dl, tf = _bm25_batch_counts(t)
        row = {"n_docs": [len(dl)], "n_tokens": [int(dl.sum())],
               "dl_max": [int(dl.max()) if len(dl) else 0]}
        for qi in range(len(BM25_QUERY)):
            row[f"df{qi}"] = [int((tf[qi] > 0).sum())]
        return pa.table({k: pa.array(v, type=pa.int64())
                         for k, v in row.items()})

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n_docs"].sum())
    n_tok = int(parts["n_tokens"].sum())
    dl_max = int(parts["dl_max"].max()) if len(parts) else 0
    if not n_docs:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "score_milli": pa.array([], type=pa.int64())})
    idf = np.empty(len(BM25_QUERY), dtype=np.int64)
    for qi in range(len(BM25_QUERY)):
        df = int(parts[f"df{qi}"].sum())
        x = 1.0 + (n_docs - df + 0.5) / (df + 0.5)
        idf[qi] = int(np.floor(BM25_SCALE * np.log(x) + 0.5))
    if int(idf.max()) * 22 * n_tok * max(dl_max, 1) >= 2 ** 62:
        raise ValueError("docs_bm25: int64 exactness bound exceeded — "
                         "use float scoring at this corpus size")

    def score(t: pa.Table) -> pa.Table:
        ids, dl, tf = _bm25_batch_counts(t)
        sc = np.zeros(len(ids), dtype=np.int64)
        hit = np.zeros(len(ids), dtype=bool)
        for qi in range(len(BM25_QUERY)):
            m = tf[qi] > 0
            if not m.any():
                continue
            hit |= m
            num = idf[qi] * 22 * n_tok * tf[qi][m]
            den = 10 * n_tok * tf[qi][m] + 3 * n_tok + 9 * dl[m] * n_docs
            sc[m] += num // den
        ids, sc = ids[hit], sc[hit]
        ordr = np.lexsort((ids, -sc))[:BM25_K_DOCS]   # block-partial top-K
        return pa.table({"doc_id": pa.array(ids[ordr]),
                         "score_milli": pa.array(sc[ordr])})

    cand = docs.map_batches(score, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["score_milli", "doc_id"],
                            ascending=[False, True]).head(BM25_K_DOCS)
    return pa.table({
        "doc_id": pa.array(cand["doc_id"].to_numpy(dtype=np.int64)),
        "score_milli": pa.array(
            cand["score_milli"].to_numpy(dtype=np.int64))})


OOV_VOCAB_K = 1000


def q_docs_oov(sf_dir: str):
    """(doc_id, n_tokens_w, n_oov, oov_permille) — vocabulary-coverage
    quality filter (the KenLM-free stand-in every LM-data pipeline runs):
    the corpus top-OOV_VOCAB_K vocabulary is built distributed
    (_top_vocab), broadcast once via ray.put, and each doc's \\S+
    lowercased tokens are scored against it with one np.isin per batch.
    Docs with zero word tokens emit no row (the SQL unnest drops them
    too). oov_permille = (1000 * n_oov) // n_tokens_w — integer-exact."""
    vocab = np.sort(_top_vocab(sf_dir, OOV_VOCAB_K)["token"]
                    .to_numpy(dtype=object))
    vref = ray.put(vocab)

    def score(t: pa.Table) -> pa.Table:
        v = ray.get(vref)
        ids = t.column("doc_id").to_numpy()
        out_id: list[int] = []
        toks: list[str] = []
        off = [0]
        for did, x in zip(ids, t.column("text").to_pylist()):
            w = _WORD_RE.findall(x.lower())
            if not w:
                continue
            out_id.append(int(did))
            toks.extend(w)
            off.append(len(toks))
        if not out_id:
            return pa.table({c: pa.array([], type=pa.int64()) for c in
                             ("doc_id", "n_tokens_w", "n_oov",
                              "oov_permille")})
        hit = np.isin(np.array(toks, dtype=object), v)
        bounds = np.array(off)
        n = np.diff(bounds)
        oov = n - np.add.reduceat(hit.astype(np.int64), bounds[:-1])
        return pa.table({
            "doc_id": pa.array(np.array(out_id, dtype=np.int64)),
            "n_tokens_w": pa.array(n.astype(np.int64)),
            "n_oov": pa.array(oov.astype(np.int64)),
            "oov_permille": pa.array((1000 * oov) // n)})

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


TFIDF_K = 3
TFIDF_SALT = 16


def q_docs_tfidf(sf_dir: str):
    """(doc_id, token, tf, df) — the K=3 most distinctive terms per doc:
    TF-IDF-shaped but fully integer-deterministic (no float idf), ranked
    by tf DESC (occurrences in the doc), df ASC (corpus document
    frequency — rarer = more distinctive), token ASC. Distributed shape:
    per-batch (doc, token, tf) explode (np.unique per doc), one
    token-keyed grouped count for df (each (doc, token) row appears
    exactly once, so COUNT = document frequency), a bucketed co_group
    join of df back onto the pairs — SALTED (token#doc%S, df replicated
    S ways) so stopword-grade hot tokens spread over S partitions instead
    of one — then a doc-keyed grouped_apply top-K."""
    pair_schema = pa.schema([("tk", pa.string()), ("doc_id", pa.int64()),
                             ("token", pa.string()), ("tf", pa.int64())])
    df_schema = pa.schema([("tk", pa.string()), ("df", pa.int64())])

    def batch_pairs(t: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            w = _WORD_RE.findall(x.lower())
            if not w:
                continue
            u, c = np.unique(np.array(w, dtype=object), return_counts=True)
            ids.append(np.full(len(u), d, dtype=np.int64))
            toks.append(u)
            tfs.append(c)
        if not ids:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "token": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids)),
            "token": pa.array(np.concatenate(toks).tolist(),
                              type=pa.string()),
            "tf": pa.array(np.concatenate(tfs).astype(np.int64))})

    pairs = _docs(sf_dir).select_columns(["doc_id", "text"]) \
        .map_batches(batch_pairs, batch_format="pyarrow").materialize()
    dfreq = shuffle.grouped_agg(pairs, ["token"],
                                {"df": (None, "count")})

    def tag_pairs(t: pa.Table) -> pa.Table:
        # arrow-native key build (TFIDF_SALT is a power of two)
        salt = pc.cast(pc.bit_wise_and(t.column("doc_id"),
                                       TFIDF_SALT - 1), pa.string())
        tk = pc.binary_join_element_wise(
            pc.cast(t.column("token"), pa.string()), salt, "#")
        return pa.table({
            "tk": tk, "doc_id": t.column("doc_id"),
            "token": t.column("token"), "tf": t.column("tf")},
            schema=pair_schema)

    def tag_df(t: pa.Table) -> pa.Table:
        idx = np.repeat(np.arange(len(t), dtype=np.int64), TFIDF_SALT)
        tok16 = pc.cast(pc.take(t.column("token"), pa.array(idx)),
                        pa.string())
        salt16 = pa.array(
            np.tile(np.arange(TFIDF_SALT).astype(str), len(t)))
        return pa.table({
            "tk": pc.binary_join_element_wise(tok16, salt16, "#"),
            "df": pa.array(np.repeat(t.column("df").to_numpy(),
                                     TFIDF_SALT).astype(np.int64))},
            schema=df_schema)

    def join(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        rf = rf.drop_duplicates("tk")
        pos = pd.Index(rf["tk"]).get_indexer(lf["tk"])
        if len(pos) and pos.min() < 0:
            raise RuntimeError("tfidf: token missing its df row")
        return pd.DataFrame({
            "doc_id": lf["doc_id"].to_numpy(dtype=np.int64),
            "token": lf["token"].to_numpy(dtype=object),
            "tf": lf["tf"].to_numpy(dtype=np.int64),
            "df": rf["df"].to_numpy(dtype=np.int64)[pos]})

    joined = shuffle.co_group(
        pairs.map_batches(tag_pairs, batch_format="pyarrow"),
        dfreq.map_batches(tag_df, batch_format="pyarrow"),
        l_on="tk", r_on="tk", fn=join,
        l_schema=pair_schema, r_schema=df_schema)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "tf", "df", "token"],
                            ascending=[True, False, True, True])
        return df.groupby("doc_id", sort=False).head(TFIDF_K)

    out = shuffle.grouped_apply(joined, ["doc_id"], topk)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                            "token": t.column("token").cast(pa.string()),
                            "tf": t.column("tf").cast(pa.int64()),
                            "df": t.column("df").cast(pa.int64())}),
        batch_format="pyarrow")


def q_docs_decontaminate(sf_dir: str):
    """Benchmark decontamination: training docs sharing an 8-gram with the
    deterministic eval subset (doc_id % 10 == 0). Schema coerced so an
    empty contamination set still carries the doc_id column."""
    df = dedup.decontaminate(_docs(sf_dir), eval_mod=10).to_pandas()
    vals = df["doc_id"].to_numpy(dtype=np.int64) if len(df.columns) \
        else np.zeros(0, dtype=np.int64)
    return pa.table({"doc_id": pa.array(vals)})


DUP_SPAN_K = 16


def q_docs_dup_spans(sf_dir: str):
    """(doc_id, n_dup_spans) — per doc, distinct 16-token spans shared
    with at least one other document (dedup.dup_spans; the intra-corpus
    exact-substring-duplication signal). Docs with no shared span emit no
    row."""
    out = dedup.dup_spans(_docs(sf_dir, columns=["doc_id", "text"]),
                          shingle_k=DUP_SPAN_K)
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "n_dup_spans": t.column("n_dup_spans").cast(pa.int64())}),
        batch_format="pyarrow")


DSIR_K = 100


def q_docs_dsir_sample(sf_dir: str):
    """(doc_id, score) — top-DSIR_K documents by DSIR-style hashed
    importance score against the lang='en' target slice (dataops/dsir.py:
    md5-hashed unigram buckets, Laplace-smoothed integer likelihood
    ratios, length-normalised per-doc score, ties broken by doc_id). The
    SQL oracle replicates every step with the same md5_number_lower
    bucket hash and integer floor division, so the whole selection
    pipeline is hash-checked."""
    from ligrust_ray.dataops import dsir

    return dsir.dsir_sample(_docs(sf_dir, columns=["doc_id", "text",
                                                   "lang"]), k=DSIR_K)


def q_docs_lang_hist(sf_dir: str):
    out = shuffle.grouped_agg(
        _docs(sf_dir).select_columns(["lang"]), ["lang"],
        {"n_docs": (None, "count")})
    return out.map_batches(
        lambda t: pa.table({"lang": t.column("lang"),
                            "n_docs": t.column("n_docs").cast(pa.int64())}),
        batch_format="pyarrow")


# ------------------------------------------------------------ multimodal
def q_media_decode(sf_dir: str):
    media = multimodal.docs_as_media(_docs(sf_dir))
    feats = multimodal.decode_features(media)
    return feats.select_columns(["media_id", "width", "height"])


def q_media_resize(sf_dir: str):
    media = multimodal.docs_as_media(_docs(sf_dir))
    return (multimodal.resize_media(media, 224, 224)
            .select_columns(["media_id", "width", "height"]))


def q_media_frames(sf_dir: str):
    media = multimodal.docs_as_media(_docs(sf_dir))
    return (multimodal.sample_frames(media, n_frames=4)
            .select_columns(["media_id", "frame_idx"]))


def q_media_decode_real(sf_dir: str):
    """GENUINE payload->pixels decode: deterministic PPM/BMP/WAV payloads
    (multimodal.docs_as_real_media) run through DecodeStage(real=True),
    which parses headers and pixel/sample data with the pure-stdlib
    codecs; the oracle re-states the generator's closed-form dims."""
    media = multimodal.docs_as_real_media(_docs(sf_dir,
                                                columns=["doc_id"]))
    feats = multimodal.decode_features(media, real=True)
    return feats.select_columns(["media_id", "width", "height"])


def q_media_resize_real(sf_dir: str):
    """Real resize: decode PPM/BMP -> nearest-neighbor NumPy resize to
    32x24 -> re-encode P6 -> decode AGAIN and checksum the resized
    pixels, so the oracle value-checks the actual pixel plane (the SQL
    replays generator formula + nearest-neighbor index math)."""
    imgs = _docs(sf_dir, columns=["doc_id"]).map_batches(
        lambda t: t.filter(
            pa.array(t.column("doc_id").to_numpy() % 3 != 2)),
        batch_format="pyarrow")
    media = multimodal.docs_as_real_media(imgs)
    resized = multimodal.resize_media(media, 32, 24, real=True)

    def checksum(t: pa.Table) -> pa.Table:
        ids, ws, hs, sums = [], [], [], []
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            img = multimodal.decode_pnm(payload)
            ids.append(mid)
            ws.append(img.shape[1])
            hs.append(img.shape[0])
            sums.append(int(img.astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "pix_sum": pa.array(sums, type=pa.int64())})

    return resized.map_batches(checksum, batch_format="pyarrow")


def q_media_stats_real(sf_dir: str):
    """(media_id, n_px, pix_sum, mean_milli) — per-image pixel statistics
    through the REAL decoders (PPM and BMP payloads genuinely parsed to
    pixel planes): exact integer sum over h*w*3 bytes and the half-up
    integer milli mean, so the oracle (which replays the generator's
    closed-form pixel function over a lateral range) hash-matches."""
    imgs = _docs(sf_dir, columns=["doc_id"]).map_batches(
        lambda t: t.filter(
            pa.array(t.column("doc_id").to_numpy() % 3 != 2)),
        batch_format="pyarrow")
    media = multimodal.docs_as_real_media(imgs)

    def stats(t: pa.Table) -> pa.Table:
        ids, ns, sums, means = [], [], [], []
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            codec = multimodal.sniff_codec(payload)
            img = (multimodal.decode_pnm(payload) if codec in
                   ("ppm", "pgm") else multimodal.decode_bmp(payload))
            n = int(img.size)
            s = int(img.astype(np.int64).sum())
            ids.append(mid)
            ns.append(n)
            sums.append(s)
            means.append((2 * s * 1000 + n) // (2 * n))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "n_px": pa.array(ns, type=pa.int64()),
            "pix_sum": pa.array(sums, type=pa.int64()),
            "mean_milli": pa.array(means, type=pa.int64())})

    return media.map_batches(stats, batch_format="pyarrow",
                             batch_size=64)


def q_media_frames_real(sf_dir: str):
    """Real frame sampling: WAV payloads split into 4 contiguous PCM
    windows (each re-wrapped as a valid WAV); every frame is re-decoded
    and its sample count returned, oracled by the floor-split formula."""
    wavs = _docs(sf_dir, columns=["doc_id"]).map_batches(
        lambda t: t.filter(
            pa.array(t.column("doc_id").to_numpy() % 3 == 2)),
        batch_format="pyarrow")
    media = multimodal.docs_as_real_media(wavs)
    frames = multimodal.sample_frames(media, n_frames=4, real=True)

    def count(t: pa.Table) -> pa.Table:
        ns = [multimodal.decode_wav(p)[1].shape[0]
              for p in t.column("frame").to_pylist()]
        return pa.table({
            "media_id": t.column("media_id"),
            "frame_idx": t.column("frame_idx"),
            "n_samples": pa.array(ns, type=pa.int64())})

    return frames.map_batches(count, batch_format="pyarrow")

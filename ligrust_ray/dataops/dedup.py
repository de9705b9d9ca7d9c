"""Deduplication family over the ``documents`` table.

- exact:      hash-partitioned group-by-content, keep min doc_id
- minhash:    shingle -> minhash signature -> LSH band buckets (groupby
              shuffle) -> candidate pairs -> exact-Jaccard verify
- simhash:    64-bit simhash over token multiset (near-dup by hamming)
- ngram-jaccard: exact Jaccard over word shingles for candidate pairs
- embedding:  cosine near-dup pairs over the embeddings table

Scale shape: per-doc signatures are computed in ``map_batches`` (stateless,
vectorised over the batch); only the tiny (doc_id, band_hash) pairs enter
the LSH groupby shuffle; candidate verification fetches just the candidate
docs' shingle sets. Cluster assignment (union-find over surviving pairs) is
driver-side — pair counts are ~O(dups), tiny relative to the corpus; at
10^12 docs it becomes an iterated min-label propagation over the pair graph
(exactly our CC operator), which is the documented scale path.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ligrust_ray.stages import shuffle

_WORD = re.compile("[^\t\n\f\r ]+")   # RE2 \S parity (textstats.RE2_WS)

# candidate-id sets below this broadcast as a sorted array (semi-join
# pre-filter before shingling); larger sets stream unfiltered
CAND_BROADCAST_MAX = 2_000_000

# the single-task verify+cluster fast path additionally needs every
# candidate's SHINGLE SET in one worker's heap (~10-50 KB/doc, three
# orders of magnitude more than the 8-byte id the broadcast bound
# prices), so it is double-gated: a candidate-count ceiling (cheap first
# check) AND a measured total-shingle-bytes ceiling; between the gates
# the broadcast pre-filter still applies but verification runs
# distributed
SMALL_VERIFY_MAX = 100_000
SMALL_VERIFY_MAX_BYTES = 1 << 30


def _content_hash(texts: list[str]) -> list[str]:
    return [hashlib.sha1(t.encode("utf-8")).hexdigest() for t in texts]


def _sha1_rows(t: pa.Table) -> pa.Table:
    """(doc_id, h=sha1(text)) batch hasher — the ONE content-hash spec
    shared by exact_dedup and the minhash rep collapse (a normalization
    change must hit both or families desynchronize)."""
    return pa.table({"doc_id": t.column("doc_id"),
                     "h": pa.array(_content_hash(
                         t.column("text").to_pylist()))})


def _broadcast_id_filter(ds: ray.data.Dataset, id_ref) -> ray.data.Dataset:
    """Keep rows whose doc_id is in the broadcast sorted int64 id array
    (bounded semi-join; used by the candidate prefilter and the rep
    selector — both gated by CAND_BROADCAST_MAX)."""

    def semi(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vs = pa.array(ray.get(id_ref), type=pa.int64())
        return t.filter(pc.is_in(t.column("doc_id"), value_set=vs))

    return ds.map_batches(semi, batch_format="pyarrow")


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id) of the minimal doc_id per distinct text — matches
    ``SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text``.
    Grouping key is sha1(text): the shuffle moves 20-byte keys, not bodies."""
    hashed = docs.map_batches(_sha1_rows, batch_format="pyarrow")
    return (shuffle.grouped_agg(hashed, ["h"], {"doc_id": ("doc_id", "min")})
            .select_columns(["doc_id"]))


def _shingles(text: str, k: int) -> set[int]:
    """Word k-shingle hashes, 32-bit domain (the minhash permutation input;
    spec: md5-lower-u64 of the shingle string, low 32 bits — replicable as
    DuckDB ``md5_number_lower(s) % 4294967296``)."""
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        joined = " ".join(toks)
        return {hash_shingle(joined)} if joined else set()
    return {hash_shingle(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)}


def _shingle_strings(text: str, k: int) -> list[str]:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        joined = " ".join(toks)
        return [joined] if joined else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def _shingle_sets_batch(texts: list[str], k: int) -> list[np.ndarray]:
    """Sorted-unique int64 shingle-hash arrays, one per text — IDENTICAL
    values to ``_shingles`` but the md5 runs once per batch-wide UNIQUE
    shingle string (near-dup corpora repeat shingles by construction, so
    this cuts the dominant md5+join cost of the signature stage)."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_many

    per_doc = [_shingle_strings(x, k) for x in texts]
    flat = [s for ss in per_doc for s in ss]
    if not flat:
        return [np.empty(0, dtype=np.int64) for _ in texts]
    uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
    hs = (md5_u64_lower_many([s.encode("utf-8") for s in uniq])
          & np.uint64(0xFFFFFFFF)).astype(np.int64)
    vals = hs[inv]
    offs = np.cumsum([0] + [len(ss) for ss in per_doc])
    return [np.unique(vals[offs[i]:offs[i + 1]])
            for i in range(len(texts))]


def hash_shingle(s: str) -> int:
    from ligrust_ray.dataops.hashing import md5_u64_lower

    return md5_u64_lower(s.encode("utf-8")) & 0xFFFFFFFF


class MinHasher:
    """Batch UDF: the permutation parameters are drawn from a fixed seed
    (deterministic across runs and worker counts). Dispatched as TASKS
    with a per-process instance cache (_minhasher), not an actor pool —
    the state is ~1 KB and recomputable, while an actor pool pays 2-4 s
    spin-up per map_batches call (measured; pools don't persist across
    calls). Actor pools are reserved for genuinely expensive setup."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        # a < 2^30 and the permutation input x < 2^32, so a*x + b < 2^63:
        # the whole (a*x+b) mod p runs vectorised in int64 — no object-dtype
        # bigint fallback (which made signatures ~50x slower)
        self.a = rng.integers(1, 1 << 30, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.int64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, self.MERSENNE, dtype=np.int64)
        x = np.array(sorted(sh), dtype=np.int64) & 0xFFFFFFFF   # low 32 bits
        vals = (x[None, :] * self.a[:, None] + self.b[:, None]) % self.MERSENNE
        return np.min(vals, axis=1)

    def _sig_of(self, sh: np.ndarray) -> np.ndarray:
        if not len(sh):
            return np.full(self.num_perm, self.MERSENNE, dtype=np.int64)
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % self.MERSENNE
        return np.min(vals, axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        # shingle hashing is batched (_shingle_sets_batch dedupes shingle
        # strings batch-wide before md5); the per-doc permute stays per-doc
        # — each (num_perm, |shingles|) op is L2-resident (a batch-wide
        # reduceat variant measured 90x SLOWER — axis-1 ufunc.reduceat
        # strides poorly)
        texts = t.column("text").to_pylist()
        sets = _shingle_sets_batch(texts, self.k)
        sigs = np.stack([self._sig_of(s) for s in sets]) if texts else \
            np.zeros((0, self.num_perm), dtype=np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel(), type=pa.int64()), self.num_perm),
        })


import functools


@functools.lru_cache(maxsize=8)
def _minhasher(num_perm: int, shingle_k: int, seed: int) -> MinHasher:
    return MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)


def _minhash_batches(ds: ray.data.Dataset, num_perm: int, shingle_k: int,
                     seed: int) -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        return _minhasher(num_perm, shingle_k, seed)(t)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def _shingle_rows_fn(shingle_k: int):
    def shingle_rows(t: pa.Table) -> pa.Table:
        sets = _shingle_sets_batch(t.column("text").to_pylist(), shingle_k)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "sh": pa.array([s for s in sets], type=pa.list_(pa.int64()))})

    return shingle_rows


_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])
_PAIR_SH_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("sh", pa.list_(pa.int64()))])
_SHINGLE_SCHEMA = pa.schema([("doc_id", pa.int64()),
                             ("sh", pa.list_(pa.int64()))])


def _verify_pairs(cand: ray.data.Dataset, shingle_ds: ray.data.Dataset,
                  threshold: float, num_partitions: int = 32
                  ) -> ray.data.Dataset:
    """Exact-Jaccard filter of candidate pairs via two bucketed co-group
    passes (key = one pair endpoint vs the shingle table's doc_id; shared
    machinery: stages/shuffle.co_group). Returns the surviving (a, b)
    pairs as a dataset."""
    shingle_ds = shingle_ds.materialize()   # consumed by both passes

    def attach(lf: pd.DataFrame, rf: pd.DataFrame) -> pa.Table:
        """Attach sh(a) to each pair row (pass 2 re-keys by b) — pandas C
        merge; endpoints not in the corpus drop (inner)."""
        j = lf.merge(rf.rename(columns={"doc_id": "a"}), on="a", how="inner")
        return pa.table(
            {"a": pa.array(j["a"].to_numpy(dtype=np.int64)),
             "b": pa.array(j["b"].to_numpy(dtype=np.int64)),
             "sh": pa.array([np.asarray(x, dtype=np.int64) for x in j["sh"]],
                            type=pa.list_(pa.int64()))},
            schema=_PAIR_SH_SCHEMA)

    def verify(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        """Exact Jaccard per pair, vectorised: attach sh(b) by C merge, then
        one exploded (pair_idx, shingle) self-merge counts intersections for
        EVERY pair in the partition at once (the SQL oracle's `common` CTE
        shape) — no per-pair Python set ops."""
        empty = pd.DataFrame({"a": np.zeros(0, np.int64),
                              "b": np.zeros(0, np.int64)})
        j = lf.merge(rf.rename(columns={"doc_id": "b", "sh": "shb"}),
                     on="b", how="inner")
        if not len(j):
            return empty
        sa, sb = list(j["sh"]), list(j["shb"])
        na = np.fromiter((len(x) for x in sa), dtype=np.int64, count=len(j))
        nb = np.fromiter((len(x) for x in sb), dtype=np.int64, count=len(j))
        fa = pd.DataFrame({"i": np.repeat(np.arange(len(j)), na),
                           "v": np.concatenate(sa) if na.sum() else
                           np.zeros(0, np.int64)})
        fb = pd.DataFrame({"i": np.repeat(np.arange(len(j)), nb),
                           "v": np.concatenate(sb) if nb.sum() else
                           np.zeros(0, np.int64)})
        inter = fa.merge(fb, on=["i", "v"], how="inner")  # shingle sets are
        common = np.zeros(len(j), dtype=np.int64)         # unique per doc
        if len(inter):
            iv, ic = np.unique(inter["i"].to_numpy(), return_counts=True)
            common[iv] = ic
        union = na + nb - common
        # same float op order as the SQL oracle: divide, then compare
        keep = (union > 0) & (common / np.maximum(union, 1) >= threshold)
        return pd.DataFrame({"a": j["a"].to_numpy(dtype=np.int64)[keep],
                             "b": j["b"].to_numpy(dtype=np.int64)[keep]})

    with_sh_a = shuffle.co_group(
        cand, shingle_ds, l_on="a", r_on="doc_id", fn=attach,
        num_partitions=num_partitions,
        l_schema=_PAIR_SCHEMA, r_schema=_SHINGLE_SCHEMA)
    return shuffle.co_group(
        with_sh_a, shingle_ds, l_on="b", r_on="doc_id", fn=verify,
        num_partitions=num_partitions,
        l_schema=_PAIR_SH_SCHEMA, r_schema=_SHINGLE_SCHEMA)


@ray.remote
def _verify_and_cluster_small(cand_blocks: list, shingle_blocks: list,
                              threshold: float) -> pa.Table:
    """Small-side fast path: when the candidate set fits one worker, verify
    Jaccard and union-find the survivors in a single Ray task (NOT on the
    driver), returning the (doc_id, label) table. Replaces 5+ fixed-cost
    shuffle rounds with one task at sandbox/typical dup rates; the
    distributed join + label-propagation path below is the fallback."""
    def as_tables(blocks):
        # internal blocks may be Arrow or pandas depending on the producer
        return [pa.Table.from_pandas(b, preserve_index=False)
                if isinstance(b, pd.DataFrame) else b for b in blocks]

    def real(blocks, col):
        # Ray passes zero-column empty blocks through shuffles untouched
        # (map_groups partitions with no groups) — skip them
        return [t for t in blocks if t.num_rows and col in t.schema.names]

    cand_blocks = real(as_tables(ray.get(list(cand_blocks))), "a")
    shingle_blocks = real(                                 # ref lists are
        as_tables(ray.get(list(shingle_blocks))), "doc_id")  # not auto-
    sh_of: dict[int, set] = {}                               # resolved
    for t in shingle_blocks:
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("sh").to_pylist()):
            sh_of[int(d)] = set(s)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for t in cand_blocks:
        for a, b in zip(t.column("a").to_pylist(), t.column("b").to_pylist()):
            sa, sb = sh_of.get(int(a)), sh_of.get(int(b))
            if sa is None or sb is None:
                continue
            u = len(sa | sb)
            if not u or len(sa & sb) / u < threshold:
                continue
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    ids = sorted(parent)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "label": pa.array([find(i) for i in ids], type=pa.int64())})


def _block_refs(ds: ray.data.Dataset) -> list:
    return [r for bu in ds.iter_internal_ref_bundles() for r in bu.block_refs]


@ray.remote(num_cpus=1)
def _cluster_pairs_small(pair_blocks: list) -> pa.Table:
    """Small-side fast path over an ALREADY-VERIFIED pair graph: union-find
    in one Ray task (not on the driver) when the pair set fits one worker,
    returning the sorted (doc_id, label) table `_attach_clusters_broadcast`
    expects. Replaces the per-round shuffle fixed cost of
    `_pair_components` at typical dup rates; that remains the scale path."""
    blocks = [pa.Table.from_pandas(b, preserve_index=False)
              if isinstance(b, pd.DataFrame) else b
              for b in ray.get(list(pair_blocks))]
    blocks = [t for t in blocks if t.num_rows and "a" in t.schema.names]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for t in blocks:
        for a, b in zip(t.column("a").to_pylist(),
                        t.column("b").to_pylist()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    ids = sorted(parent)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "label": pa.array([find(i) for i in ids], type=pa.int64())})


def _attach_clusters_broadcast(doc_ids: ray.data.Dataset, labels_ref
                               ) -> ray.data.Dataset:
    """cluster = label (or self) via a broadcast of the bounded label
    table — zero shuffles; used only under CAND_BROADCAST_MAX."""

    def attach(t: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        ks = lab.column("doc_id").to_numpy()
        vs = lab.column("label").to_numpy()
        d = t.column("doc_id").to_numpy().astype(np.int64)
        out = d.copy()
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, d), len(ks) - 1)
            hit = ks[pos] == d
            out[hit] = vs[pos[hit]]
        return pa.table({"doc_id": pa.array(d),
                         "cluster": pa.array(out)})

    return doc_ids.map_batches(attach, batch_format="pyarrow")


@ray.remote(num_cpus=0)
def _label_sum_block(t) -> int:
    """Per-block label checksum partial (trivial compute: num_cpus=0 so
    the tasks never queue behind real work). Raw block refs — unlike
    map_batches UDFs — DO see the zero-column EMPTY blocks that pass
    through group-less partitions, and those keep whatever format their
    producer used (the executor hands them through unconverted, even via
    to_arrow_refs) — so accept both Arrow and pandas."""
    if isinstance(t, pd.DataFrame):
        if not len(t) or "label" not in t.columns:
            return 0
        return int(t["label"].sum())
    if t.num_rows == 0 or "label" not in t.column_names:
        return 0
    return int(pa.compute.sum(t.column("label")).as_py() or 0)


def _pair_components(pairs: ray.data.Dataset, max_rounds: int = 64,
                     num_partitions: int = 32) -> ray.data.Dataset:
    """(doc_id, label) for every doc in a pair; label = min doc_id of the
    pair-graph component. Dataset-based min-label propagation with
    POINTER JUMPING: each round is one bucketed hash join (labels vs pair
    endpoints) plus a grouped min, then label := label(label) — the jump
    doubles propagation distance per round, so convergence is
    O(log diameter) (a 2^64-long chain fits max_rounds=64; a cap hit
    raises instead of returning silently-wrong labels). No driver-side
    label table or union-find; the driver sees only the per-round label
    checksum."""
    pairs = pairs.materialize()

    def seed(t: pa.Table) -> pa.Table:
        ids = np.concatenate([t.column("a").to_numpy(),
                              t.column("b").to_numpy()])
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "label": pa.array(ids, type=pa.int64())})

    labels = shuffle.grouped_agg(
        pairs.map_batches(seed, batch_format="pyarrow"),
        ["doc_id"], {"label": ("label", "min")}).materialize()

    edge_schema = pa.schema([("k", pa.int64()), ("other", pa.int64())])
    label_schema = pa.schema([("doc_id", pa.int64()),
                              ("label", pa.int64())])

    def expand(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return pa.table({"k": pa.array(np.concatenate([a, b])),
                         "other": pa.array(np.concatenate([b, a]))},
                        schema=edge_schema)

    def propagate(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        # message: k's label offered to the other endpoint; plus k keeps
        # its own label (so the grouped min never loses ground). Label
        # lookup is a vectorised get_indexer (C hash probe), not a per-row
        # dict loop; every endpoint is seeded, so misses cannot occur —
        # assert loudly rather than let -1 fancy-index the last row and
        # silently corrupt component labels
        pos = pd.Index(rf["doc_id"]).get_indexer(lf["k"])
        if len(pos) and pos.min() < 0:
            raise RuntimeError("propagate: pair endpoint missing from the "
                               "seeded label set (invariant violation)")
        out_id = np.concatenate([lf["other"].to_numpy(dtype=np.int64),
                                 rf["doc_id"].to_numpy(dtype=np.int64)])
        out_lab = np.concatenate([
            rf["label"].to_numpy(dtype=np.int64)[pos],
            rf["label"].to_numpy(dtype=np.int64)])
        return pd.DataFrame({"doc_id": out_id, "label": out_lab})

    # pointer-jump routing is SALTED: keying queries by raw label value
    # would funnel every member of a big component into ONE partition
    # (label skew is the whole point of components). Queries route by
    # label*S + doc%S; the label->label mapping is replicated S ways so
    # every salt bucket can answer. Skew per partition is bounded by
    # component_size / S.
    JUMP_SALT = 16
    q_schema = pa.schema([("jk", pa.int64()), ("doc_id", pa.int64()),
                          ("lab", pa.int64())])
    m_schema = pa.schema([("jk", pa.int64()), ("lab_key", pa.int64()),
                          ("lab2", pa.int64())])

    def tag_queries(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        lb = t.column("label").to_numpy()
        return pa.table({
            "jk": pa.array(lb * JUMP_SALT + (d % JUMP_SALT)),
            "doc_id": pa.array(d), "lab": pa.array(lb)}, schema=q_schema)

    def tag_mapping(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        lb = t.column("label").to_numpy()
        s = np.tile(np.arange(JUMP_SALT, dtype=np.int64), len(d))
        return pa.table({
            "jk": pa.array(np.repeat(d, JUMP_SALT) * JUMP_SALT + s),
            "lab_key": pa.array(np.repeat(d, JUMP_SALT)),
            "lab2": pa.array(np.repeat(lb, JUMP_SALT))}, schema=m_schema)

    def jump(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        # label(label): emit (doc, label_of(label)) + (doc, label) so the
        # grouped min never loses ground. Vectorised get_indexer lookup;
        # a label with no mapping row in this partition keeps itself.
        docs_q = lf["doc_id"].to_numpy(dtype=np.int64)
        labs = lf["lab"].to_numpy(dtype=np.int64)
        rf = rf.drop_duplicates("lab_key")
        pos = pd.Index(rf["lab_key"]).get_indexer(lf["lab"])
        jumped = labs.copy()
        hit = pos >= 0
        jumped[hit] = rf["lab2"].to_numpy(dtype=np.int64)[pos[hit]]
        return pd.DataFrame({
            "doc_id": np.concatenate([docs_q, docs_q]),
            "label": np.concatenate([labs, jumped])})

    edges = pairs.map_batches(expand, batch_format="pyarrow").materialize()
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # convergence checksum over the ALREADY-materialized label blocks:
        # zero-copy block refs + trivial per-block sum tasks, so the check
        # costs no extra Dataset job (streaming-executor spin-up) per round
        cur_sum = sum(ray.get([_label_sum_block.remote(r)
                               for r in labels.to_arrow_refs()]))
        if prev_sum is not None and cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
        msgs = shuffle.co_group(edges, labels, l_on="k", r_on="doc_id",
                                fn=propagate,
                                num_partitions=num_partitions,
                                l_schema=edge_schema,
                                r_schema=label_schema)
        labels = shuffle.grouped_agg(
            msgs, ["doc_id"], {"label": ("label", "min")}).materialize()
        # pointer jump: label := min(label, label(label)), salt-routed
        labels_m = labels.materialize()
        jmsgs = shuffle.co_group(
            labels_m.map_batches(tag_queries, batch_format="pyarrow"),
            labels_m.map_batches(tag_mapping, batch_format="pyarrow"),
            l_on="jk", r_on="jk", fn=jump,
            num_partitions=num_partitions,
            l_schema=q_schema, r_schema=m_schema)
        labels = shuffle.grouped_agg(
            jmsgs, ["doc_id"], {"label": ("label", "min")}).materialize()
    if not converged:
        raise RuntimeError(
            f"_pair_components did not converge in {max_rounds} rounds "
            "(pointer jumping covers 2^rounds-long chains — this indicates "
            "a bug, not a deep component)")
    return labels


def _attach_clusters(doc_ids: ray.data.Dataset, labels: ray.data.Dataset,
                     num_partitions: int = 32) -> ray.data.Dataset:
    """Left join (bucketed co-group): every doc_id row gets cluster = its
    component label, or itself when unpaired. Both sides stream through
    one hash shuffle; no driver-side id list."""

    def join(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        # vectorised get_indexer lookup (C hash probe); miss -> self
        ks = lf["doc_id"].to_numpy(dtype=np.int64)
        pos = pd.Index(rf["doc_id"]).get_indexer(lf["doc_id"])
        out = ks.copy()
        hit = pos >= 0
        out[hit] = rf["label"].to_numpy(dtype=np.int64)[pos[hit]]
        return pd.DataFrame({"doc_id": ks, "cluster": out})

    return shuffle.co_group(
        doc_ids, labels, l_on="doc_id", r_on="doc_id", fn=join,
        num_partitions=num_partitions,
        l_schema=pa.schema([("doc_id", pa.int64())]),
        r_schema=pa.schema([("doc_id", pa.int64()),
                            ("label", pa.int64())]))


def minhash_lsh_dedup(docs: ray.data.Dataset, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      threshold: float = 0.8, seed: int = 42
                      ) -> ray.data.Dataset:
    """Returns (doc_id, cluster) — cluster = min doc_id of the near-dup
    group under exact-Jaccard >= threshold verification of LSH candidates.

    EXACT-DUP COLLAPSE (the production near-dedup shape): web corpora are
    30-60% byte-identical, and each family of e exact copies would inflate
    LSH candidate pairs by C(e,2). When the duplicate ratio warrants it,
    the LSH/verify/components pipeline runs on one REPRESENTATIVE per
    distinct text (the family's min doc_id) and every doc takes its rep's
    cluster — IDENTICAL output, because a family's rep is its min id and
    component minima over reps equal component minima over all members
    (identical texts always verify at Jaccard 1). Measured on a 10x-replica
    50k-doc corpus: 37 s -> ~8 s. Gated by a broadcastable rep-id set
    (<= CAND_BROADCAST_MAX) so rep texts are selected by a bounded
    semi-join; above the gate (or at negligible dup ratio) the classic
    whole-corpus path runs."""

    def sha1_rows_nonempty(t: pa.Table) -> pa.Table:
        """Content hash, EXCEPT whitespace-only docs get a per-doc unique
        key: zero-shingle docs never verify against anything (Jaccard
        union 0 — the classic path and the SQL oracle leave each as its
        own cluster), so collapsing identical empty texts into one family
        would diverge from both."""
        h = _content_hash(t.column("text").to_pylist())
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        h = [hx if tx.strip() else f"__empty__{i}"
             for hx, tx, i in zip(h, texts, ids)]
        return pa.table({"doc_id": t.column("doc_id"),
                         "h": pa.array(h, type=pa.string())})

    # materialized: consumed by BOTH the rep grouped_agg and the doc_rep
    # co_group (lazy would sha1 the whole corpus twice)
    hashed = docs.map_batches(sha1_rows_nonempty,
                              batch_format="pyarrow").materialize()
    rep_map = shuffle.grouped_agg(hashed, ["h"],
                                  {"rep": ("doc_id", "min")}).materialize()
    n_docs = docs.count()
    n_reps = rep_map.count()
    use_reps = (n_docs - n_reps) / max(n_docs, 1) >= 0.01 \
        and n_reps <= CAND_BROADCAST_MAX
    if not use_reps:
        return _minhash_lsh_core(docs, num_perm, bands, shingle_k,
                                 threshold, seed)

    doc_rep = shuffle.co_group(
        hashed, rep_map, l_on="h", r_on="h",
        fn=lambda lf, rf: lf.merge(rf, on="h")[["doc_id", "rep"]],
        l_schema=pa.schema([("doc_id", pa.int64()), ("h", pa.string())]),
        r_schema=pa.schema([("h", pa.string()), ("rep", pa.int64())])
    ).materialize()

    rep_arr = np.sort(np.concatenate(
        [b["rep"] for b in rep_map.select_columns(["rep"])
         .iter_batches(batch_format="numpy")] or
        [np.zeros(0, dtype=np.int64)]))
    rep_docs = _broadcast_id_filter(docs, ray.put(rep_arr))
    rep_clusters = _minhash_lsh_core(rep_docs, num_perm, bands, shingle_k,
                                     threshold, seed)

    def attach_rep(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.merge(rf.rename(columns={"doc_id": "rep"}), on="rep")
        return j[["doc_id", "cluster"]]

    return shuffle.co_group(
        doc_rep, rep_clusters, l_on="rep", r_on="doc_id", fn=attach_rep,
        l_schema=pa.schema([("doc_id", pa.int64()), ("rep", pa.int64())]),
        r_schema=pa.schema([("doc_id", pa.int64()),
                            ("cluster", pa.int64())]))


def _minhash_lsh_core(docs: ray.data.Dataset, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      threshold: float = 0.8, seed: int = 42
                      ) -> ray.data.Dataset:
    """The LSH -> candidate -> verify -> components pipeline over whatever
    corpus it is given (whole corpus, or exact-dup representatives)."""
    rows_per_band = num_perm // bands
    sigs = _minhash_batches(docs, num_perm, shingle_k, seed).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "band": pa.array([], type=pa.int64()),
                          "bh": pa.array([], type=pa.int64())})
        if not t.num_rows:
            return empty
        ids = t.column("doc_id").to_numpy()
        # fixed-width list<int64> -> zero-copy (n, num_perm) view
        sig = t.column("sig").combine_chunks().flatten().to_numpy() \
            .reshape(len(ids), num_perm)
        # zero-shingle docs carry the all-MERSENNE sentinel (every real
        # minhash is a mod-p residue, strictly < p): emitting their band
        # rows would funnel ALL empty docs into one bucket and generate
        # O(s^2) candidate pairs that verify can only throw away
        real = sig[:, 0] != MinHasher.MERSENNE
        ids, sig = ids[real], sig[real]
        if not len(ids):
            return empty
        out = []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            # full-64-bit band-bucket key (md5_number_lower of
            # "band:v0,v1,..." — DuckDB-replicable; 32 bits would collide
            # at 10^12-doc scale), composed column-wise (int64->string
            # cast + element-wise join) and hashed in ONE vectorised
            # DuckDB call per band instead of a per-row hashlib loop
            cols = [pc.cast(pa.array(chunk[:, j]), pa.string())
                    for j in range(rows_per_band)]
            body = pc.binary_join_element_wise(*cols, ",")
            key = pc.binary_join_element_wise(pa.scalar(f"{b}:"), body, "")
            out.append(pa.table({
                "doc_id": pa.array(ids, type=pa.int64()),
                "band": pa.array(np.full(len(ids), b, dtype=np.int64)),
                "bh": pa.array(md5_u64_lower_arrow(key).view(np.int64))}))
        return pa.concat_tables(out)

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        """All (a<b) pairs sharing a (band, bh) bucket, vectorised over the
        whole hash partition: only buckets with >=2 docs generate pairs."""
        if not len(part):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        # bucket key is bh alone: the band index is already hashed into
        # the FULL-64-BIT band key (md5_i64_lower of "band:v0,v1,..." in
        # band_rows), and a band-multiplied composite would overflow
        # int64 for band >= 2
        d = part.sort_values(["bh", "doc_id"])
        key = d["bh"].to_numpy()
        ids = d["doc_id"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        sizes = np.diff(np.append(starts, len(key)))
        out_a, out_b = [], []
        for s, z in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            u = np.unique(ids[s:s + z])
            if len(u) < 2:
                continue
            ii, jj = np.triu_indices(len(u), k=1)
            out_a.append(u[ii])
            out_b.append(u[jj])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    cand = shuffle.distinct(
        shuffle.grouped_apply(
            sigs.map_batches(band_rows, batch_format="pyarrow"),
            ["band", "bh"], bucket_pairs),
        ["a", "b"]).materialize()

    # exact-Jaccard verify, fully distributed: the candidate-doc shingle
    # sets travel through two bucketed hash joins (keyed by pair endpoint),
    # never through the driver (round-1 collected them into a driver dict —
    # impossible at 10^12 docs). Verification itself runs vectorised per
    # join partition.
    #
    # Bounded broadcast pre-filter: when the candidate id set is small
    # (typical — LSH at threshold 0.8 emits ~dup-rate candidates), shingle
    # ONLY candidate docs by broadcasting the sorted id array (small-side
    # semi-join). Above the bound the unfiltered corpus-wide shingle
    # stream runs — same result, linear shuffle.
    def endpoints(t: pa.Table) -> pa.Table:
        ids = np.concatenate([t.column("a").to_numpy(),
                              t.column("b").to_numpy()])
        return pa.table({"doc_id": pa.array(ids, type=pa.int64())})

    cand_ids = shuffle.distinct(
        cand.map_batches(endpoints, batch_format="pyarrow"), ["doc_id"])
    docs_sel = docs.select_columns(["doc_id", "text"])
    n_cand = cand_ids.count()
    if n_cand == 0:
        # no LSH candidates at all: every doc is its own cluster
        return docs.select_columns(["doc_id"]).map_batches(
            lambda t: pa.table({"doc_id": t.column("doc_id"),
                                "cluster": t.column("doc_id")}),
            batch_format="pyarrow")
    prefiltered = n_cand <= CAND_BROADCAST_MAX
    if prefiltered:
        id_arr = np.sort(np.concatenate(
            [b["doc_id"] for b in cand_ids.iter_batches(batch_format="numpy")]
            or [np.zeros(0, dtype=np.int64)]))
        docs_sel = _broadcast_id_filter(docs_sel, ray.put(id_arr))
    shingle_ds = docs_sel.map_batches(
        _shingle_rows_fn(shingle_k), batch_format="pyarrow")

    if prefiltered and n_cand <= SMALL_VERIFY_MAX:
        # the single-task path is gated by actual BYTES, not candidate
        # count: shingle volume per doc varies by orders of magnitude,
        # and the one worker must hold every candidate's set
        shingle_ds = shingle_ds.materialize()
        sizes = shingle_ds.map_batches(
            lambda t: pa.table({"n": pa.array(
                [int(pa.compute.sum(
                    pa.compute.list_value_length(
                        t.column("sh"))).as_py() or 0)])}),
            batch_format="pyarrow")
        total_shingles = sum(
            int(x) for b in sizes.iter_batches(batch_format="numpy")
            for x in b["n"])
        if total_shingles * 80 <= SMALL_VERIFY_MAX_BYTES:
            # ~80 B per entry in a Python set of ints
            labels_ref = _verify_and_cluster_small.remote(
                _block_refs(cand), _block_refs(shingle_ds), threshold)
            return _attach_clusters_broadcast(
                docs.select_columns(["doc_id"]), labels_ref)

    verified = _verify_pairs(cand, shingle_ds, threshold)

    # cluster = min doc_id of the connected component of the verified-pair
    # graph: dataset-based min-label propagation (the CC operator's algebra
    # over the tiny pair graph; O(component diameter) rounds, and near-dup
    # components are shallow). No driver-side union-find, no corpus-wide
    # id list.
    labels = _pair_components(verified)

    # every doc gets a cluster: doc_id unless a verified pair relabeled it.
    # Bucketed left join — the corpus id column streams through ONE hash
    # shuffle against the (small) label table.
    return _attach_clusters(docs.select_columns(["doc_id"]), labels)


class SimHasher:
    """64-bit simhash over the token multiset of lower(text).

    Spec (DuckDB-replicable, see __ray_entry__.oracle_sql): token hash =
    md5-lower-u64 of the token; bit b of the simhash is set iff
    Σ_tokens (2·bit_b(hash) − 1) > 0; empty text -> 0. The per-token md5
    is C-speed (hashing.py); the bit voting is one vectorised matmul-free
    numpy pass per batch."""

    def __init__(self, seed: int = 42):
        self.seed = seed
        self._bitpos = np.arange(64, dtype=np.uint64)

    def simhash64(self, text: str) -> int:
        from ligrust_ray.dataops.hashing import md5_u64_lower_many, u64_to_i64

        toks = _WORD.findall(text.lower())
        if not toks:
            return 0
        hs = md5_u64_lower_many([t.encode("utf-8") for t in toks])
        bits = ((hs[:, None] >> self._bitpos[None, :])
                & np.uint64(1)).astype(np.int64)              # (ntok, 64)
        acc = (2 * bits - 1).sum(axis=0)
        h = int(((acc > 0).astype(np.uint64)
                 << self._bitpos).sum(dtype=np.uint64))
        return u64_to_i64(h)

    # bound on the (tokens, 64) int64 vote matrix held at once (~32 MB);
    # doc segments are processed in chunks under it so one huge batch
    # cannot blow a worker's heap (the per-doc path it replaced only ever
    # held a single doc's matrix)
    _VOTE_CHUNK_TOKENS = 1 << 16

    def _batch(self, texts: list[str]) -> np.ndarray:
        """Whole-batch simhash, IDENTICAL values to per-doc ``simhash64``:
        md5 runs once per batch-wide UNIQUE token (Zipf: unique << total);
        bit votes accumulate with reduceat over contiguous per-doc
        segments, chunked by token count to bound memory."""
        from ligrust_ray.dataops.hashing import md5_u64_lower_many, u64_to_i64

        toks_per_doc = [_WORD.findall(x.lower()) for x in texts]
        counts = np.array([len(ts) for ts in toks_per_doc], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.int64)      # empty text -> 0
        nz = np.flatnonzero(counts)
        if not len(nz):
            return out
        flat = [t for ts in toks_per_doc for t in ts]
        uniq, inv = np.unique(np.array(flat, dtype=object),
                              return_inverse=True)
        hs = md5_u64_lower_many([t.encode("utf-8") for t in uniq])[inv]
        ends = np.cumsum(counts[nz])
        starts = ends - counts[nz]
        d0 = 0
        while d0 < len(nz):
            # take whole docs until the token chunk bound (>=1 doc always)
            d1 = d0 + 1
            while (d1 < len(nz)
                   and ends[d1 - 1] - starts[d0] < self._VOTE_CHUNK_TOKENS):
                d1 += 1
            seg = hs[starts[d0]:ends[d1 - 1]]
            contrib = (2 * ((seg[:, None] >> self._bitpos[None, :])
                            & np.uint64(1)).astype(np.int64) - 1)
            offs = starts[d0:d1] - starts[d0]
            acc = np.add.reduceat(contrib, offs, axis=0)   # (d1-d0, 64)
            hv = ((acc > 0).astype(np.uint64)
                  << self._bitpos[None, :]).sum(axis=1, dtype=np.uint64)
            out[nz[d0:d1]] = [u64_to_i64(int(x)) for x in hv]
            d0 = d1
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "simhash": pa.array(self._batch(t.column("text").to_pylist()),
                                type=pa.int64())})


@functools.lru_cache(maxsize=2)
def _simhasher(seed: int) -> SimHasher:
    return SimHasher(seed=seed)


def simhash_dataset(docs: ray.data.Dataset) -> ray.data.Dataset:
    # task-based with per-process cache — see MinHasher note on actor-pool
    # spin-up cost for trivial state
    def f(t: pa.Table) -> pa.Table:
        return _simhasher(42)(t)

    return docs.map_batches(f, batch_format="pyarrow", batch_size=512)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of an int64/uint64 array (numpy<2 has no
    bitwise_count; unpackbits over the byte view is exact regardless of
    byte order — we only ever SUM the bits)."""
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    return np.unpackbits(np.ascontiguousarray(x).view(np.uint8)) \
        .reshape(-1, 64).sum(axis=1).astype(np.int64)


SIMHASH_MAX_HAMMING = 3
_SIMHASH_BANDS = 4     # 64 bits / 4 bands of 16: any pair at hamming <= 3
                       # agrees exactly on >= 1 band (pigeonhole), so the
                       # banding loses NO qualifying pair


def simhash_dup_pairs(docs: ray.data.Dataset,
                      max_hamming: int = SIMHASH_MAX_HAMMING
                      ) -> ray.data.Dataset:
    """Manku-style simhash near-dup pairs (the classic web-crawl dedup:
    Manku, Jain & Das Sarma, WWW'07): all unordered pairs (a < b) of
    docs with nonzero simhash whose signatures differ in <= max_hamming
    of 64 bits.

    Shape: per-doc signatures stream out of ``simhash_dataset``; each doc
    emits 4 (band, 16-bit key) rows; candidates co-locate via ONE
    grouped_apply shuffle keyed by (band, key) — bucket sizes are bounded
    by near-dup family sizes plus 16-bit random collisions, so no hub
    risk; hamming verification is a vectorised XOR+popcount per bucket;
    a final grouped min dedups pairs that matched in several bands.
    Docs with simhash == 0 (no tokens) are excluded on BOTH engine and
    oracle sides — at corpus scale the empty class would otherwise emit
    O(empties^2) degenerate pairs."""
    if max_hamming >= 16:
        raise ValueError("4x16 banding only guarantees recall for "
                         "max_hamming <= 15 (and is sized for <= 3)")
    sig = simhash_dataset(docs)

    def band_rows(t: pa.Table) -> pa.Table:
        s = t.column("simhash").to_numpy().astype(np.int64)
        d = t.column("doc_id").to_numpy().astype(np.int64)
        keep = s != 0
        s, d = s[keep], d[keep]
        u = s.view(np.uint64)
        bands = []
        for b in range(_SIMHASH_BANDS):
            key = ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)) \
                .astype(np.int64)
            bands.append(pa.table({
                "band": pa.array(np.full(len(d), b, dtype=np.int64)),
                "key": pa.array(key),
                "doc_id": pa.array(d),
                "simhash": pa.array(s)}))
        return pa.concat_tables(bands) if bands else pa.table(
            {"band": pa.array([], type=pa.int64()),
             "key": pa.array([], type=pa.int64()),
             "doc_id": pa.array([], type=pa.int64()),
             "simhash": pa.array([], type=pa.int64())})

    rows = sig.map_batches(band_rows, batch_format="pyarrow")

    def pairs_fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64),
                              "hamming": pd.Series([], dtype=np.int64)})
        if not len(df):
            return empty
        df = df.sort_values(["band", "key", "doc_id"])
        bk = (df["band"].to_numpy() << np.int64(16)) | df["key"].to_numpy()
        ids = df["doc_id"].to_numpy().astype(np.int64)
        sims = df["simhash"].to_numpy().astype(np.int64)
        seg = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
        sizes = np.diff(np.append(seg, len(bk)))
        outs = []
        for s0, k in zip(seg, sizes):
            if k < 2:
                continue
            i, j = np.triu_indices(int(k), 1)
            a = ids[s0:s0 + k]
            v = sims[s0:s0 + k]
            h = _popcount64(v[i] ^ v[j])
            ok = h <= max_hamming
            if ok.any():
                outs.append(pd.DataFrame({"a": a[i[ok]], "b": a[j[ok]],
                                          "hamming": h[ok]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    cand = shuffle.grouped_apply(rows, ["band", "key"], pairs_fn)
    # a pair verified in several bands has the SAME hamming everywhere;
    # grouped min is just the dedup
    return shuffle.grouped_agg(cand, ["a", "b"],
                               {"hamming": ("hamming", "min")})


def simhash_clusters(docs: ray.data.Dataset,
                     max_hamming: int = SIMHASH_MAX_HAMMING
                     ) -> ray.data.Dataset:
    """(doc_id, cluster) near-dup cluster assignment from the simhash pair
    graph: cluster = min doc_id of the connected component of
    ``simhash_dup_pairs``; unpaired docs (including the zero-signature
    empties) cluster to themselves — the same output contract as
    ``minhash_lsh_dedup``, with simhash hamming distance replacing
    Jaccard as the near-dup relation. Components via the shared
    min-label + pointer-jumping propagation (no driver union-find)."""
    pairs = simhash_dup_pairs(docs, max_hamming=max_hamming) \
        .select_columns(["a", "b"]).materialize()
    if pairs.count() <= CAND_BROADCAST_MAX:
        labels_ref = _cluster_pairs_small.remote(_block_refs(pairs))
        return _attach_clusters_broadcast(
            docs.select_columns(["doc_id"]), labels_ref)
    labels = _pair_components(pairs)
    return _attach_clusters(docs.select_columns(["doc_id"]), labels)


def ngram_jaccard_pairs(docs: ray.data.Dataset, shingle_k: int = 3,
                        threshold: float = 0.5, num_perm: int = 64,
                        bands: int = 32, seed: int = 42) -> ray.data.Dataset:
    """Near-dup PAIRS (a < b) with exact word-shingle Jaccard >= threshold;
    candidates from an aggressive LSH (many bands => high recall at the
    given threshold)."""
    clustered = minhash_lsh_dedup(docs, num_perm=num_perm, bands=bands,
                                  shingle_k=shingle_k, threshold=threshold,
                                  seed=seed)

    # cluster = min member id, so the rep pairs are exactly the rows where
    # doc_id != cluster — a stateless per-batch filter, no materialisation
    # (round 1 ran to_pandas on the corpus-sized cluster table here).
    def rep_pairs(t: pa.Table) -> pa.Table:
        c = t.column("cluster").to_numpy()
        d = t.column("doc_id").to_numpy()
        keep = c != d
        return pa.table({"a": pa.array(c[keep], type=pa.int64()),
                         "b": pa.array(d[keep], type=pa.int64())})

    return clustered.map_batches(rep_pairs, batch_format="pyarrow")


def decontaminate(docs: ray.data.Dataset, eval_mod: int = 97,
                  shingle_k: int = 8, num_partitions: int = 32
                  ) -> ray.data.Dataset:
    """Benchmark decontamination: (doc_id) of every TRAINING doc sharing at
    least one word ``shingle_k``-gram with any EVAL doc (eval set =
    ``doc_id % eval_mod == 0`` — a deterministic stand-in for a held-out
    benchmark list). Gram spec is the minhash shingle spec (lowered text,
    md5-low-32 hashes; docs shorter than k tokens contribute their whole
    text), so the DuckDB oracle reuses the same CTE shape.

    Scale shape: both sides explode to (doc_id?, gram) rows in
    ``map_batches`` (per-doc grams are already unique); the eval gram set
    is globally deduped (it is benchmark-sized), then ONE bucketed
    co_group on the gram hash semi-joins training grams against it — no
    broadcast of either side, shuffle volume = gram rows (the LSH-band
    wire shape)."""
    train_schema = pa.schema([("doc_id", pa.int64()), ("g", pa.int64())])
    eval_schema = pa.schema([("g", pa.int64())])

    def gram_rows(keep_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            mask = (ids % eval_mod == 0) == keep_eval
            sub_ids = ids[mask].astype(np.int64)
            texts = [x for x, m in zip(t.column("text").to_pylist(), mask)
                     if m]
            sets = _shingle_sets_batch(texts, shingle_k)
            counts = [len(s) for s in sets]
            g = (np.concatenate(sets) if sets
                 else np.zeros(0, dtype=np.int64))
            if keep_eval:
                return pa.table({"g": pa.array(g)}, schema=eval_schema)
            return pa.table(
                {"doc_id": pa.array(np.repeat(sub_ids, counts)),
                 "g": pa.array(g)}, schema=train_schema)
        return f

    eval_g = shuffle.distinct(
        docs.map_batches(gram_rows(True), batch_format="pyarrow"), ["g"],
        num_partitions=num_partitions)
    train_g = docs.map_batches(gram_rows(False), batch_format="pyarrow")

    def semi(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        hit = lf["g"].isin(rf["g"])
        return lf.loc[hit, ["doc_id"]].drop_duplicates()

    contaminated = shuffle.co_group(
        train_g, eval_g, l_on="g", r_on="g", fn=semi,
        num_partitions=num_partitions,
        l_schema=train_schema, r_schema=eval_schema)
    return shuffle.distinct(contaminated, ["doc_id"],
                            num_partitions=num_partitions)


def dup_spans(docs: ray.data.Dataset, shingle_k: int = 16,
              min_docs: int = 2, num_partitions: int = 32
              ) -> ray.data.Dataset:
    """(doc_id, n_dup_spans): per document, the number of DISTINCT word
    ``shingle_k``-gram spans that also occur in at least ``min_docs - 1``
    OTHER documents — the intra-corpus exact-substring-duplication signal
    (the bounded-span analog of Lee et al. 2022's ExactSubstr; a doc with
    a high count is a near-copy or heavy quoter). Gram spec is the
    minhash shingle spec (lowered text, md5-low-32, whole-text fallback
    under k tokens), so the DuckDB oracle reuses the same CTE shape.

    Scale shape: docs explode to per-doc-UNIQUE (doc_id, gram) rows in
    map_batches, then ONE gram-keyed grouped_apply marks rows whose gram
    reaches ``min_docs`` distinct docs (per-doc-unique rows make the
    group size the distinct-doc count — no COUNT DISTINCT needed), and
    one doc-keyed grouped_agg rolls up the per-doc span counts. Two
    shuffles, both carrying int64 pairs; document bodies never move."""
    row_schema = pa.schema([("doc_id", pa.int64()), ("g", pa.int64())])

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        sets = _shingle_sets_batch(t.column("text").to_pylist(), shingle_k)
        counts = [len(s) for s in sets]
        g = (np.concatenate(sets) if sets
             else np.zeros(0, dtype=np.int64))
        return pa.table({"doc_id": pa.array(np.repeat(ids, counts)),
                         "g": pa.array(g)}, schema=row_schema)

    rows = docs.map_batches(gram_rows, batch_format="pyarrow")

    def shared(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["doc_id"]]
        n = df.groupby("g")["doc_id"].transform("size")
        return df.loc[n.to_numpy() >= min_docs, ["doc_id"]]

    hits = shuffle.grouped_apply(rows, ["g"], shared,
                                 num_partitions=num_partitions)
    return shuffle.grouped_agg(hits, ["doc_id"],
                               {"n_dup_spans": (None, "count")},
                               num_partitions=num_partitions)


def _token_set_stages(docs: ray.data.Dataset, thr_num: int, thr_den: int,
                      num_partitions: int):
    """Shared front end of the exact set-join family (similarity_join /
    containment_join): per-doc-distinct (doc_id, h) token rows, the
    global rarest-first ((df ASC, h ASC)) token order from one df
    grouped count, and each doc's AllPairs prefix (first
    s - ceil(t*s) + 1 tokens in that order — the same length bound
    serves Jaccard >= t and containment >= t, since both need an
    overlap of at least ceil(t*s) of the probing doc's s tokens) WITH
    its set size. Returns (rows, pref, num_partitions)."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow
    from ligrust_ray.dataops.textstats import RE2_WS

    i64 = pa.int64()
    row_schema = pa.schema([("doc_id", i64), ("h", i64)])

    def token_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), RE2_WS + "+").combine_chunks()
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.chunk(0) if toks.num_chunks else \
                pa.array([], type=toks.type)
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        di = np.repeat(np.arange(len(ids)), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, di = flat.filter(pa.array(keep)), di[keep]
        if not len(flat):
            return pa.table({"doc_id": pa.array([], type=i64),
                             "h": pa.array([], type=i64)},
                            schema=row_schema)
        h = md5_u64_lower_arrow(flat).view(np.int64)
        # per-doc distinct: docs are whole rows, so an in-batch unique
        # over (doc, hash) is globally distinct
        key = pd.DataFrame({"d": di, "h": h}).drop_duplicates()
        return pa.table({
            "doc_id": pa.array(ids[key["d"].to_numpy()]),
            "h": pa.array(key["h"].to_numpy())}, schema=row_schema)

    rows = docs.map_batches(token_rows,
                            batch_format="pyarrow").materialize()
    num_partitions = max(4, min(num_partitions, rows.num_blocks() * 4))

    df_tbl = shuffle.grouped_agg(rows, ["h"], {"df": (None, "count")},
                                 num_partitions=num_partitions)

    def attach_df(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        return lf.merge(rf, on="h", how="inner")

    rows_df = shuffle.co_group(
        rows, df_tbl, "h", "h", attach_df,
        l_schema=row_schema,
        r_schema=pa.schema([("h", i64), ("df", i64)]),
        num_partitions=num_partitions)

    def prefix(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "h": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["doc_id", "df", "h"])
        s = df.groupby("doc_id", sort=False)["h"].transform("size") \
            .to_numpy()
        pos = df.groupby("doc_id", sort=False).cumcount().to_numpy()
        plen = s - (thr_num * s + thr_den - 1) // thr_den + 1
        keep = pos < plen
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64)[keep],
            "h": df["h"].to_numpy(dtype=np.int64)[keep],
            "s": s[keep]})

    pref = shuffle.grouped_apply(rows_df, ["doc_id"], prefix,
                                 num_partitions=num_partitions)
    return rows, pref, num_partitions


def similarity_join(docs: ray.data.Dataset, thr_num: int = 7,
                    thr_den: int = 10, num_partitions: int = 32
                    ) -> ray.data.Dataset:
    """(a, b, n_common, n_union) with a < b: EXACT token-set similarity
    join — every pair with Jaccard >= thr_num/thr_den over the per-doc
    DISTINCT md5-hashed token sets, with the exact intersection/union
    sizes (integers; callers divide). Unlike MinHash-LSH this is the
    lossless plan: prefix filtering (AllPairs, Bayardo et al. 2007) plus
    the PPJoin length filter guarantee the SAME output as the quadratic
    all-pairs join, so the DuckDB oracle can BE the brute force while
    the engine runs the scalable shape.

    Plan: per-doc-distinct (doc_id, hash) token rows explode once; a
    global doc-frequency grouped count orders tokens rarest-first
    ((df ASC, hash ASC) — the total order the prefix guarantee needs); a
    doc-keyed grouped_apply keeps each doc's first s - ceil(t*s) + 1
    tokens WITH its set size; candidate pairs form per prefix token
    (rare tokens -> tiny buckets) carrying both set sizes, pruned by the
    length filter (min*den >= max*num) before dedup. Verify is FLAT:
    candidates co-partition with a's token rows (keyed a), the exploded
    (a, b, h) rows re-key by b where ONE composite in-partition merge
    against b's token rows counts intersections to completion (each
    (a, b) group lives wholly in b's partition — no second count
    shuffle, no token-list payloads ever cross the wire). Bodies never
    move; nothing corpus-sized on the driver. At replica-heavy corpora
    the OUTPUT is inherently quadratic per family — run exact dedup
    first when families are known to be large (the minhash pipeline's
    collapse step)."""
    i64 = pa.int64()
    row_schema = pa.schema([("doc_id", i64), ("h", i64)])
    cand_schema = pa.schema([("a", i64), ("b", i64),
                             ("sa", i64), ("sb", i64)])
    abh_schema = pa.schema([("a", i64), ("b", i64), ("sa", i64),
                            ("sb", i64), ("h", i64)])

    rows, pref, num_partitions = _token_set_stages(
        docs, thr_num, thr_den, num_partitions)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                              for c in ("a", "b", "sa", "sb")})
        if not len(df):
            return empty
        j = df.merge(df, on="h", suffixes=("_x", "_y"))
        sx = j["s_x"].to_numpy()
        sy = j["s_y"].to_numpy()
        # PPJoin length filter (lossless): J >= t implies the smaller
        # set is >= t * the larger — prune size-mismatched candidates
        # before they reach verify
        keep = ((j["doc_id_x"].to_numpy() < j["doc_id_y"].to_numpy())
                & (np.minimum(sx, sy) * thr_den >=
                   np.maximum(sx, sy) * thr_num))
        j = j[keep]
        return pd.DataFrame({"a": j["doc_id_x"].to_numpy(dtype=np.int64),
                             "b": j["doc_id_y"].to_numpy(dtype=np.int64),
                             "sa": j["s_x"].to_numpy(dtype=np.int64),
                             "sb": j["s_y"].to_numpy(dtype=np.int64)})

    cand = shuffle.grouped_agg(
        shuffle.grouped_apply(pref, ["h"], bucket_pairs,
                              num_partitions=num_partitions),
        ["a", "b", "sa", "sb"], {"n": (None, "count")},
        num_partitions=num_partitions).map_batches(
        lambda t: t.select(["a", "b", "sa", "sb"]),
        batch_format="pyarrow")

    out_schema = pa.schema([("a", i64), ("b", i64),
                            ("n_common", i64), ("n_union", i64)])

    def explode_a(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # pyarrow (Acero) hash join — no pandas copy on this wide stage
        return lt.join(rt.rename_columns(["a", "h"]), keys="a",
                       join_type="inner")

    abh = shuffle.co_group(cand, rows, "a", "doc_id", explode_a,
                           l_schema=cand_schema, r_schema=row_schema,
                           num_partitions=num_partitions, arrow_fn=True)

    def count_verify(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if not lt.num_rows or not rt.num_rows:
            return out_schema.empty_table()
        # composite in-partition join: (b, h) vs b's (doc_id, h) rows —
        # every (a, b) group is wholly in b's partition, so the C++
        # hash-aggregate count is FINAL here
        m = lt.join(rt.rename_columns(["b", "h"]), keys=["b", "h"],
                    join_type="inner")
        if not m.num_rows:
            return out_schema.empty_table()
        g = m.group_by(["a", "b", "sa", "sb"]).aggregate([("h", "count")])
        common = g.column("h_count").to_numpy().astype(np.int64)
        union = (g.column("sa").to_numpy() + g.column("sb").to_numpy()
                 - common).astype(np.int64)
        keep = common * thr_den >= thr_num * union
        return pa.table({
            "a": pa.array(g.column("a").to_numpy()[keep].astype(np.int64)),
            "b": pa.array(g.column("b").to_numpy()[keep].astype(np.int64)),
            "n_common": pa.array(common[keep]),
            "n_union": pa.array(union[keep])}, schema=out_schema)

    return shuffle.co_group(abh, rows, "b", "doc_id", count_verify,
                            l_schema=abh_schema, r_schema=row_schema,
                            num_partitions=num_partitions, arrow_fn=True)


def containment_join(docs: ray.data.Dataset, thr_num: int = 9,
                     thr_den: int = 10, num_partitions: int = 32
                     ) -> ray.data.Dataset:
    """(a, b, n_common, n_a) with a != b: EXACT directional containment
    join — every ORDERED pair where |A∩B| >= t·|A| over the per-doc
    DISTINCT md5-hashed token sets (A = doc a's set; n_common/n_a is
    the containment score, integers so callers divide). This is what
    symmetric Jaccard misses: a quote or a fully-wrapped copy of a
    short doc inside a long one has tiny Jaccard but containment ~1.

    Lossless plan, same skeleton as similarity_join: the probing doc's
    AllPairs prefix (s - ceil(t*s) + 1 rarest-first tokens — an overlap
    of ceil(t*s) tokens cannot avoid the prefix) pairs against the FULL
    token rows of every other doc per shared token (containment puts no
    lower bound on Jaccard, so the containing side must be fully
    indexed and there is no length filter); candidates dedupe through
    one grouped count; the verify is the same flat composite-merge
    count, finalized in b's partition, with the one-sided integer
    compare c·den >= num·s_a. Rare prefix tokens keep buckets small —
    a doc whose rarest tokens are corpus-wide stopwords degrades the
    bucket, not the result. Bodies never move; nothing corpus-sized on
    the driver. Output is inherently per-family-quadratic on
    replica-heavy corpora (run exact-dup collapse first, as the minhash
    pipeline does)."""
    i64 = pa.int64()
    row_schema = pa.schema([("doc_id", i64), ("h", i64)])
    cand_schema = pa.schema([("a", i64), ("b", i64), ("sa", i64)])
    abh_schema = pa.schema([("a", i64), ("b", i64), ("sa", i64),
                            ("h", i64)])

    rows, pref, num_partitions = _token_set_stages(
        docs, thr_num, thr_den, num_partitions)

    pair_schema = pa.schema([("a", i64), ("b", i64), ("sa", i64)])

    def bucket_pairs(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # lt: prefix rows (doc_id, h, s) of the probing side; rt: full
        # token rows (doc_id, h) of the containing side — Acero join
        if not lt.num_rows or not rt.num_rows:
            return pair_schema.empty_table()
        j = lt.join(rt.rename_columns(["b", "h"]), keys="h",
                    join_type="inner")
        a = j.column("doc_id").to_numpy().astype(np.int64)
        b = j.column("b").to_numpy().astype(np.int64)
        s = j.column("s").to_numpy().astype(np.int64)
        keep = a != b
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "sa": pa.array(s[keep])}, schema=pair_schema)

    cand = shuffle.grouped_agg(
        shuffle.co_group(pref, rows, "h", "h", bucket_pairs,
                         l_schema=pa.schema([("doc_id", i64), ("h", i64),
                                             ("s", i64)]),
                         r_schema=row_schema,
                         num_partitions=num_partitions, arrow_fn=True),
        ["a", "b", "sa"], {"n": (None, "count")},
        num_partitions=num_partitions).map_batches(
        lambda t: t.select(["a", "b", "sa"]), batch_format="pyarrow")

    out_schema = pa.schema([("a", i64), ("b", i64),
                            ("n_common", i64), ("n_a", i64)])

    def explode_a(lt: pa.Table, rt: pa.Table) -> pa.Table:
        return lt.join(rt.rename_columns(["a", "h"]), keys="a",
                       join_type="inner")

    abh = shuffle.co_group(cand, rows, "a", "doc_id", explode_a,
                           l_schema=cand_schema, r_schema=row_schema,
                           num_partitions=num_partitions, arrow_fn=True)

    def count_verify(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if not lt.num_rows or not rt.num_rows:
            return out_schema.empty_table()
        m = lt.join(rt.rename_columns(["b", "h"]), keys=["b", "h"],
                    join_type="inner")
        if not m.num_rows:
            return out_schema.empty_table()
        g = m.group_by(["a", "b", "sa"]).aggregate([("h", "count")])
        common = g.column("h_count").to_numpy().astype(np.int64)
        sa = g.column("sa").to_numpy().astype(np.int64)
        keep = common * thr_den >= thr_num * sa
        return pa.table({
            "a": pa.array(g.column("a").to_numpy()[keep].astype(np.int64)),
            "b": pa.array(g.column("b").to_numpy()[keep].astype(np.int64)),
            "n_common": pa.array(common[keep]),
            "n_a": pa.array(sa[keep])}, schema=out_schema)

    return shuffle.co_group(abh, rows, "b", "doc_id", count_verify,
                            l_schema=abh_schema, r_schema=row_schema,
                            num_partitions=num_partitions, arrow_fn=True)


def winnow_pairs(docs: ray.data.Dataset, min_shared: int = 2,
                 num_partitions: int = 32) -> ray.data.Dataset:
    """(a, b, shared) with a < b: near-dup CANDIDATE pairs sharing at
    least ``min_shared`` winnowing fingerprints (textstats.winnow_batch)
    — the MOSS pair generator: local fingerprints catch partially
    overlapping documents (shared paragraphs, quotes) that whole-doc
    MinHash dilutes away. ``shared`` is the exact common-fingerprint
    count, a plagiarism-style overlap score.

    Scale shape: the fingerprint rows are already per-doc-distinct, so
    ONE fp-keyed grouped_apply emits each bucket's pairs (a C merge, no
    Python loop; bucket sizes are winnowing-fingerprint families — the
    LSH-bucket economics) and one (a, b)-keyed grouped count folds the
    per-fp hits into the shared score. Document bodies never move."""
    from ligrust_ray.dataops.textstats import winnow_batch

    fps = docs.map_batches(winnow_batch, batch_format="pyarrow")

    def pairgen(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        j = df.merge(df, on="fp", suffixes=("_x", "_y"))
        j = j[j["doc_id_x"] < j["doc_id_y"]]
        return pd.DataFrame({"a": j["doc_id_x"].to_numpy(dtype=np.int64),
                             "b": j["doc_id_y"].to_numpy(dtype=np.int64)})

    hits = shuffle.grouped_apply(fps, ["fp"], pairgen,
                                 num_partitions=num_partitions)
    counts = shuffle.grouped_agg(hits, ["a", "b"],
                                 {"shared": (None, "count")},
                                 num_partitions=num_partitions)
    return counts.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t.column("shared"), min_shared)),
        batch_format="pyarrow")


def _block_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t.column("vec_id").to_numpy()
    # fixed-width list<float> -> zero-copy (n, dim) view, then one cast
    emb = t.column("embedding").combine_chunks()
    m = emb.flatten().to_numpy().reshape(len(ids), -1).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return ids, m


@ray.remote
def _near_dup_block_pair(ta: pa.Table, tb: pa.Table, threshold: float,
                         same: bool) -> pa.Table:
    ids_a, ma = _block_matrix(ta)
    ids_b, mb = _block_matrix(tb)
    if not len(ids_a) or not len(ids_b):
        return pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64())})
    sims = ma @ mb.T
    ii, jj = np.nonzero(sims >= threshold)
    a = ids_a[ii].astype(np.int64)
    b = ids_b[jj].astype(np.int64)
    if same:
        keep = a < b                    # dedup the symmetric half + diagonal
        a, b = a[keep], b[keep]
    else:                               # each unordered cross pair appears
        a, b = np.minimum(a, b), np.maximum(a, b)   # once: canonicalise
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


IVF_PAIR_CHUNK = 8192        # in-bucket matmul tile: memory O(chunk^2)


def ivf_bucketize(emb: ray.data.Dataset, n_centroids: int | None = None,
                  nprobe: int = 2, seed: int = 42, train_sample: int = 4096,
                  quantizer: str = "kmeans"
                  ) -> tuple[ray.data.Dataset, int]:
    """(bucketed Dataset[vec_id, bucket, embedding], n_buckets): every
    vector multi-assigned to its ``nprobe`` nearest IVF cells.
    ``n_centroids=None`` auto-scales B ~ sqrt(n) via the two-level index in
    dataops/ann.py, so bucket count — and hence groupby parallelism and the
    O(n^2/B) in-bucket cost — grows with the data instead of capping at a
    constant. ``quantizer="md5"`` multi-assigns each vector to buckets
    (md5(id)+j) % B, j < nprobe (ann.md5_buckets) — the deterministic
    SQL-checkable layout; k-means is the recall path."""
    from ligrust_ray.dataops import ann

    if quantizer not in ("kmeans", "md5"):
        raise ValueError(f"unknown quantizer {quantizer!r}")
    if quantizer == "md5":
        n_buckets = n_centroids if n_centroids is not None \
            else ann.auto_centroids(emb.count())

        def bucketize(t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_numpy().astype(np.int64)
            bkt = (ann.md5_buckets(ids, n_buckets)[:, None]
                   + np.arange(nprobe, dtype=np.int64)) % n_buckets
            rows = np.repeat(np.arange(len(ids)), nprobe)
            return pa.table({
                "vec_id": pa.array(ids[rows]),
                "bucket": pa.array(bkt.ravel()),
                "embedding": t.column("embedding").combine_chunks().take(
                    pa.array(rows))})
    else:
        index = ann._train_from_ds(emb, n_centroids, seed, train_sample)
        n_buckets = int(index[2][-1])
        index_ref = ray.put(index)

        def bucketize(t: pa.Table) -> pa.Table:
            ix = ray.get(index_ref)
            ids, m = _block_matrix(t)
            bkt, valid = ann.assign_buckets(ix, m, nprobe)     # (n, kk)
            n = len(ids)
            kk = bkt.shape[1]
            rows = np.repeat(np.arange(n), kk)[valid.ravel()]
            return pa.table({
                "vec_id": pa.array(ids[rows].astype(np.int64)),
                "bucket": pa.array(bkt.ravel()[valid.ravel()]),
                "embedding": t.column("embedding").combine_chunks().take(
                    pa.array(rows))})

    bucketed = emb.select_columns(["vec_id", "embedding"]).map_batches(
        bucketize, batch_format="pyarrow")
    return bucketed, n_buckets


# above this bucket count, per-group map_groups dispatch (one Ray task
# per bucket) costs more than the work inside; switch to grouped_apply
# (hash-partition by bucket, loop the partition's buckets in one task)
IVF_GROUP_DISPATCH_MAX = 4096


def embedding_near_dup_ivf(emb: ray.data.Dataset, threshold: float = 0.95,
                           n_centroids: int | None = None, nprobe: int = 2,
                           seed: int = 42, train_sample: int = 4096,
                           group_dispatch_max: int = IVF_GROUP_DISPATCH_MAX,
                           quantizer: str = "kmeans") -> ray.data.Dataset:
    """Approximate near-dup pairs: vectors are IVF-bucketed (nearest
    ``nprobe`` centroids — multi-assignment recovers most cross-boundary
    pairs) and compared WITHIN buckets only. O(n²/B) flops instead of
    O(n²), with B ~ sqrt(n) by default (``ivf_bucketize``); recall < 1 by
    construction (tested vs the exact operator). This is the
    recall-tolerant 10^9-vector scale path; the exact block-pair operator
    below is the oracle. The in-bucket compare tiles its matmul
    (``IVF_PAIR_CHUNK``) so one skewed bucket cannot blow a worker's heap."""

    def pairs_in_bucket(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) < 2:
            return pd.DataFrame({"a": np.zeros(0, np.int64),
                                 "b": np.zeros(0, np.int64)})
        ids = part["vec_id"].to_numpy(dtype=np.int64)
        m = np.stack(part["embedding"].to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        outs_a, outs_b = [], []
        for i0 in range(0, len(m), IVF_PAIR_CHUNK):     # upper-tri tiles
            mi = m[i0:i0 + IVF_PAIR_CHUNK]
            for j0 in range(i0, len(m), IVF_PAIR_CHUNK):
                sims = mi @ m[j0:j0 + IVF_PAIR_CHUNK].T
                ii, jj = np.nonzero(sims >= threshold)
                a, b = ids[i0 + ii], ids[j0 + jj]
                if i0 == j0:
                    keep = a < b       # symmetric half + diagonal
                    a, b = a[keep], b[keep]
                else:                  # cross tile: each pair appears once
                    a, b = np.minimum(a, b), np.maximum(a, b)
                outs_a.append(a)
                outs_b.append(b)
        return pd.DataFrame({"a": np.concatenate(outs_a),
                             "b": np.concatenate(outs_b)}).drop_duplicates()

    bucketed, n_buckets = ivf_bucketize(emb, n_centroids=n_centroids,
                                        nprobe=nprobe, seed=seed,
                                        train_sample=train_sample,
                                        quantizer=quantizer)
    if n_buckets <= group_dispatch_max:
        pairs = (bucketed.groupby("bucket")
                 .map_groups(pairs_in_bucket, batch_format="pandas"))
    else:
        # B ~ sqrt(n) grows unboundedly; per-bucket task dispatch would
        # dominate at B~1e5, so hash-partition buckets and loop each
        # partition's buckets inside one task (same kernel per bucket)
        def per_partition(df: pd.DataFrame) -> pd.DataFrame:
            outs = [pairs_in_bucket(g)
                    for _, g in df.groupby("bucket", sort=False)]
            return (pd.concat(outs, ignore_index=True) if outs else
                    pd.DataFrame({"a": np.zeros(0, np.int64),
                                  "b": np.zeros(0, np.int64)}))

        pairs = shuffle.grouped_apply(
            bucketed, ["bucket"], per_partition,
            num_partitions=min(512, max(32, n_buckets // 64)))
    # multi-probe puts a vector in nprobe buckets -> a pair can appear in
    # more than one bucket: global dedup
    return shuffle.distinct(pairs, ["a", "b"])


def embedding_near_dup(emb: ray.data.Dataset, threshold: float = 0.95,
                       ) -> ray.data.Dataset:
    """(a, b) pairs with cosine >= threshold, a < b — EXACT all-pairs.

    Block-pair decomposition: the normalised table's B blocks stay in the
    object store; one Ray task per block pair (B(B+1)/2 tasks) fetches just
    its two blocks and emits its matches. No full-matrix broadcast, no
    driver materialisation (round 1 ran to_pandas + an O(n·d) broadcast).
    The O(n²) flops are inherent to the exact semantics; the approximate
    scale path for recall-tolerant near-dup is the IVF partitioner in
    dataops/ann.py (bucket both sides, compare within buckets)."""
    norm = emb.select_columns(["vec_id", "embedding"]).materialize()
    bundles = list(norm.iter_internal_ref_bundles())
    refs = [r for bu in bundles for r in bu.block_refs]
    outs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            outs.append(_near_dup_block_pair.remote(
                refs[i], refs[j], threshold, i == j))
    return ray.data.from_arrow_refs(outs)


# ---- corpus-level line dedup (round 3; CCNet-style boilerplate removal) --

def line_dedup(docs: ray.data.Dataset, min_count: int = 3,
               num_partitions: int = 32) -> ray.data.Dataset:
    """(doc_id, text_clean, n_removed): remove every line that appears at
    least ``min_count`` times across the WHOLE corpus (CCNet / RefinedWeb
    boilerplate removal — nav bars, cookie banners, repeated footers).

    The removal key is ``md5_number_lower(line)`` — hashes (8 bytes), not
    line strings, ride the counting shuffle, and the DuckDB oracle groups
    by the same function, so engine and oracle agree EXACTLY even on a
    hash collision (the spec is hash-keyed, not string-keyed). Hashing is
    evaluated by in-process DuckDB (hashing.md5_u64_lower_arrow): oracle
    parity by construction.

    Scale shape: explode to (doc_id, i, line, lh) rows in map_batches;
    ONE grouped count over lh; the frequent-hash set (boilerplate-sized,
    but never assumed driver-small) semi-joins back via ONE bucketed
    co_group; reassembly is a grouped_apply keyed by doc_id (ordered
    string_agg). No broadcast, no driver materialisation."""
    import pyarrow.compute as pc

    from ligrust_ray.dataops import hashing

    line_schema = pa.schema([("doc_id", pa.int64()), ("i", pa.int64()),
                             ("line", pa.string()), ("lh", pa.int64())])
    common_schema = pa.schema([("lh", pa.int64())])

    def explode(t: pa.Table) -> pa.Table:
        txt = t.column("text").cast(pa.string())
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.coalesce(txt, "")      # oracle mirrors COALESCE(text, '')
        parts = pc.split_pattern(txt, "\n")
        offs = parts.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)
        flat = parts.values
        doc = t.column("doc_id").to_numpy().astype(np.int64)
        pos = (np.arange(int(offs[-1]), dtype=np.int64)
               - np.repeat(offs[:-1], lens))
        lh = hashing.md5_u64_lower_arrow(flat).view(np.int64)
        return pa.table({"doc_id": pa.array(np.repeat(doc, lens)),
                         "i": pa.array(pos), "line": flat,
                         "lh": pa.array(lh)}, schema=line_schema)

    lines = docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")

    counts = shuffle.grouped_agg(lines.select_columns(["lh"]), ["lh"],
                                 {"n": ("lh", "count")},
                                 num_partitions=num_partitions)

    def frequent(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["n"] >= min_count, ["lh"]]

    common = counts.map_batches(frequent, batch_format="pandas")

    def mark(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        out = lf[["doc_id", "i", "line"]].copy()
        out["rm"] = lf["lh"].isin(rf["lh"]).to_numpy()
        return out

    marked = shuffle.co_group(lines, common, l_on="lh", r_on="lh", fn=mark,
                              num_partitions=num_partitions,
                              l_schema=line_schema, r_schema=common_schema)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "i"], kind="stable")
        nrem = df.groupby("doc_id", sort=False)["rm"].sum()
        kept = df[~df["rm"]]
        txt = kept.groupby("doc_id", sort=False)["line"].agg("\n".join)
        return pd.DataFrame({
            "doc_id": nrem.index.to_numpy(dtype=np.int64),
            "text_clean": txt.reindex(nrem.index).fillna("").to_numpy(),
            "n_removed": nrem.to_numpy(dtype=np.int64)})

    return shuffle.grouped_apply(marked, ["doc_id"], reassemble,
                                 num_partitions=num_partitions)


def survivor_ids(docs: ray.data.Dataset, method: str = "exact"
                 ) -> ray.data.Dataset:
    """(doc_id) survivors under the given dedup method — the shared
    dispatch of the CLI `dedup` / `prepare` commands: "exact" keeps the
    min doc_id per distinct text; "minhash" / "simhash" keep each
    near-dup cluster's representative (doc_id == cluster)."""
    if method == "exact":
        return exact_dedup(docs)
    if method not in ("minhash", "simhash"):
        raise ValueError(f"unknown dedup method {method!r}")
    cl = (minhash_lsh_dedup(docs) if method == "minhash"
          else simhash_clusters(docs))
    return cl.map_batches(
        lambda t: pa.table({"doc_id": t.filter(
            pa.compute.equal(t.column("doc_id"), t.column("cluster")))
            .column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow")


def unique_by_id(docs: ray.data.Dataset, num_partitions: int = 32
                 ) -> ray.data.Dataset:
    """One row per doc_id — collapses the duplicate rows a
    content-addressed corpus (sources/jsonl.py: repeated texts share an
    md5 id) carries for repeated texts. Deterministic at any cluster
    size: among rows sharing an id, the lexicographically smallest full
    row wins (for content-addressed duplicates the rows are identical,
    so this is a no-op choice). One hash shuffle keyed by doc_id."""
    def first(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return df.sort_values(list(df.columns)) \
            .drop_duplicates("doc_id")

    return shuffle.grouped_apply(docs, ["doc_id"], first,
                                 num_partitions=num_partitions)


def ngram_novelty(docs: ray.data.Dataset, shingle_k: int = 8,
                  num_partitions: int = 32) -> ray.data.Dataset:
    """(doc_id, n_grams, n_novel) — per-doc distinct word-k-gram count
    and how many of those grams are GLOBALLY first-seen in this doc
    (first = smallest doc_id carrying the gram): the novelty /
    memorization scan curriculum-ordering and dedup research run over
    training corpora (a doc whose grams were all seen earlier adds no
    new n-gram mass). Gram spec is the minhash shingle spec (lowered
    text, md5-low-32, whole-text fallback under k tokens), so the
    DuckDB oracle reuses the decontaminate CTE shape.

    Scale shape: one gram-row explode (per-doc distinct already), a
    gram-keyed grouped MIN for the first owner, one gram-keyed join
    back, and a doc-keyed grouped count — every wide step keyed, bodies
    never move, nothing corpus-sized on the driver."""
    from ligrust_ray.stages import shuffle as _sh

    row_schema = pa.schema([("doc_id", pa.int64()), ("g", pa.int64())])

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        sets = _shingle_sets_batch(t.column("text").to_pylist(),
                                   shingle_k)
        counts = [len(s) for s in sets]
        g = (np.concatenate(sets) if sets
             else np.zeros(0, dtype=np.int64))
        return pa.table({"doc_id": pa.array(np.repeat(ids, counts)),
                         "g": pa.array(g)}, schema=row_schema)

    rows = docs.map_batches(gram_rows,
                            batch_format="pyarrow").materialize()
    first = _sh.grouped_agg(rows, ["g"], {"first_id": ("doc_id", "min")},
                            num_partitions=num_partitions)
    joined = _sh.hash_join(rows, first, on="g", l_cols=["doc_id"],
                           r_cols=["first_id"],
                           num_partitions=num_partitions)

    def flag(t: pa.Table) -> pa.Table:
        nv = (t.column("doc_id").to_numpy().astype(np.int64)
              == t.column("first_id").to_numpy().astype(np.int64))
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "nv": pa.array(nv.astype(np.int64))})

    out = _sh.grouped_agg(
        joined.map_batches(flag, batch_format="pyarrow"), ["doc_id"],
        {"n_grams": (None, "count"), "n_novel": ("nv", "sum")},
        num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_grams": t.column("n_grams").cast(pa.int64()),
            "n_novel": t.column("n_novel").cast(pa.int64())}),
        batch_format="pyarrow")

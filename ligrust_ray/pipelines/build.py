"""Graph build: pages parquet -> partitioned CSR parquet (+ manifest).

This is the Ray-Data-native analog of the reference's ``parse`` ETL
(/root/reference/src/graph.rs:302-320): its text-parse stage becomes HTML
link extraction (``map_batches``), its CSR ``From<(Vec,Vec)>`` build
(graph.rs:198-236) and ``invert()`` (graph.rs:246-300) become two
``groupby``-shuffle roll-ups keyed by src-range and dst-range.

Scale design:
- extraction is a stateless/actor-pool ``map_batches`` over zero-copy Arrow;
  only ``url`` + ``html`` columns are read from the pages parquet.
- dense vertex ids come from a two-pass hash-bucket scheme (bucketed
  distinct -> per-bucket sorted rank -> driver-side exclusive prefix over
  the tiny per-bucket count vector). No global sort. Hash order also
  *spreads hub pages uniformly across range partitions* — this is the
  skew mitigation for the per-range CSR shards.
- url->id mapping is applied to the edge list by broadcasting the sorted
  mapping arrays (``ray.put`` once, ``np.searchsorted`` per batch). At
  10^12 urls the mapping no longer broadcasts; the documented scale path is
  a bucketed hash join (partition both sides by hash(url) % B and resolve
  per bucket) — the bucketing machinery here already produces that layout.
- the CSR roll-up writes ONE parquet file per partition (atomic
  tmp+rename, skip-if-exists => resumable build), schema
  ``(node_id: int64, neighbors: list<int64>, degree: int64)`` with empty
  lists for zero-degree nodes in range (the gap-filling of graph.rs:287-296).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ligrust_ray.functions.extract import ExtractLinks

MANIFEST = "manifest.json"


def _crc_bucket(urls: list[str], nbuckets: int) -> np.ndarray:
    return np.array([zlib.crc32(u.encode("utf-8")) % nbuckets for u in urls],
                    dtype=np.int64)


_EXTRACTOR = ExtractLinks()        # stateless; shared per worker process


def extract_edge_urls(pages: ray.data.Dataset, concurrency: int | None = None
                      ) -> ray.data.Dataset:
    """pages -> (src_url, dst_url), one row per href occurrence.

    TASK-based on purpose: ExtractLinks carries no per-actor state, and the
    (2,32) autoscaling actor pool this replaced paid spin-up + scale-up lag
    on every call — measured 17-19 s vs 6.5 s as tasks for 60k pages
    (32 CPUs). Parallelism = input block count; callers that read pages
    from parquet should size blocks for CPUs (see build_graph_from_pages)."""

    def f(t: pa.Table) -> pa.Table:
        return _EXTRACTOR(t)

    return pages.map_batches(
        f, batch_format="pyarrow", batch_size=256, zero_copy_batch=True,
        concurrency=concurrency,
    )


def assign_ids(url_ds: ray.data.Dataset, nbuckets: int = 64
               ) -> tuple[ray.data.Dataset, int]:
    """Distinct urls -> deterministic dense ids ``0..n``.

    Order: lexicographic within crc32(url) % nbuckets, buckets ascending.
    Returns (mapping dataset (url:string, id:int64), n).
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        # in-batch pre-dedup: the url universe arrives with one row per
        # href occurrence (~degree x n rows); deduping before the bucket
        # shuffle cuts exchanged rows to ~distinct urls per batch.
        # batch_size below is LARGE on purpose: Ray's 1024-row default
        # makes the dedup ratio terrible (urls repeat across batches) and
        # the downstream sort-shuffle pays per ROW.
        u = pa.compute.unique(t.column("url").cast(pa.string()))
        urls = u.to_pylist()
        return pa.table({"url": u,
                         "bucket": pa.array(_crc_bucket(urls, nbuckets))})

    def dedup_again(t: pa.Table) -> pa.Table:
        # second, wider pre-dedup pass (1M-row batches) before the one
        # all-to-all: measured 3.9M -> ~0.2M rows at 60k pages
        g = t.group_by(["url", "bucket"]).aggregate([])
        return g

    def rank_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native unique + sort (C++): the python-object np.unique this
        # replaces dominated the whole id-assignment stage
        u = pa.compute.unique(g.column("url").cast(pa.string()))
        u = u.take(pa.compute.sort_indices(u))
        b = g.column("bucket")[0].as_py()
        return pa.table({
            "url": u,
            "bucket": pa.array(np.full(len(u), b, dtype=np.int64)),
            "local_rank": pa.array(np.arange(len(u), dtype=np.int64)),
        })

    ranked = (
        url_ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=1 << 18)
        .map_batches(dedup_again, batch_format="pyarrow",
                     batch_size=1 << 20)
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
        .materialize()  # reused twice below; size = one row per distinct url
    )
    # per-bucket counts: per-batch bincount partials summed on the driver
    # (the count vector is nbuckets-long — tiny at any scale)
    counts = np.zeros(nbuckets, dtype=np.int64)
    for b in ranked.map_batches(
            lambda t: pa.table({"bucket": np.arange(nbuckets, dtype=np.int64),
                                "c": np.bincount(t.column("bucket").to_numpy(),
                                                 minlength=nbuckets)}),
            batch_format="pyarrow").iter_batches(batch_format="numpy"):
        np.add.at(counts, b["bucket"], b["c"])
    offsets = np.zeros(nbuckets, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    n = int(counts.sum())
    offsets_ref = ray.put(offsets)

    def add_id(t: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        ids = offs[t.column("bucket").to_numpy()] + t.column("local_rank").to_numpy()
        return pa.table({"url": t.column("url"), "id": pa.array(ids)})

    return ranked.map_batches(add_id, batch_format="pyarrow"), n


INDEX_IN_MAX = 1 << 18  # pc.index_in rebuilds the value-set hash per
#                         batch (O(map) per call) — only worth it below
#                         this; above, the hashed layout's per-batch cost
#                         is independent of mapping size


class _UrlToId:
    """Broadcast url->id resolver (small-side lookup, no shuffle).

    Fetches the mapping ONCE per task/actor (zero-copy plasma ``ray.get``)
    and resolves each batch fully vectorised — no Python string loop, no
    fixed-width UCS4 copies (the old ``np.str_`` round-trip paid ~160 B
    per url at crawl url lengths). Two layouts:

    - ``index_in`` (mapping <= INDEX_IN_MAX urls): one ``pc.index_in``
      hash probe per column against the Arrow value set;
    - ``hashed`` (above): md5-u64 of each batch url (one vectorised
      DuckDB call), ``np.searchsorted`` into the pre-sorted mapping
      hashes, and hash hits confirmed by ONE vectorised Arrow string
      compare — per-batch cost independent of mapping size, broadcast
      payload 8 B/url + the original Arrow strings."""

    def __init__(self, map_ref, drop_missing: bool):
        payload = ray.get(map_ref)
        self.mode = payload[0]
        if self.mode == "index_in":
            _, self.urls, self.ids = payload
        else:
            _, self.urls, self.ids, self.hsorted, self.order = payload
        self.drop_missing = drop_missing

    def _resolve(self, col) -> tuple[np.ndarray, np.ndarray]:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        if self.mode == "index_in":
            pos = pc.index_in(arr, value_set=self.urls)
            found = np.asarray(pos.is_valid().to_numpy(
                zero_copy_only=False), dtype=bool)
            idx = pos.fill_null(0).to_numpy().astype(np.int64)
            return np.where(found, self.ids[idx], -1), found
        from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

        bh = md5_u64_lower_arrow(arr)
        pos = np.searchsorted(self.hsorted, bh)
        pos_c = np.minimum(pos, len(self.hsorted) - 1)
        hit = self.hsorted[pos_c] == bh
        # mapping hashes are verified collision-free at broadcast time,
        # so a hash hit whose STRING differs means "url not in mapping"
        cand = pc.take(self.urls, pa.array(self.order[pos_c]))
        found = np.asarray(
            pc.and_(pa.array(hit), pc.equal(cand, arr)).to_numpy(
                zero_copy_only=False), dtype=bool)
        return np.where(found, self.ids[self.order[pos_c]], -1), found

    def __call__(self, t: pa.Table) -> pa.Table:
        src_id, src_ok = self._resolve(t.column("src_url"))
        dst_id, dst_ok = self._resolve(t.column("dst_url"))
        ok = src_ok & dst_ok if self.drop_missing else src_ok
        return pa.table({"src": pa.array(src_id[ok]), "dst": pa.array(dst_id[ok])})


BROADCAST_MAP_MAX = 5_000_000     # above this, the url->id map is joined
#                                   by hash bucket instead of broadcast


def edges_with_ids(edge_urls: ray.data.Dataset, mapping: ray.data.Dataset,
                   drop_missing: bool = False,
                   broadcast_max: int | None = None) -> ray.data.Dataset:
    """Resolve (src_url, dst_url) -> (src:int64, dst:int64).

    Small mappings broadcast (``ray.put`` once, ``np.searchsorted`` per
    batch); mappings above ``broadcast_max`` urls go through two bucketed
    hash joins (partition BOTH sides by hash(url), merge per bucket) — the
    wide-join path a 10^12-url crawl requires.

    ``drop_missing=False`` requires that every url (incl. dangling targets)
    has an id — i.e. ``assign_ids`` ran over the union of page urls and link
    targets (default build policy: every seen url gets an id, matching a
    real crawl; the reference's text format has no dangling ids at all)."""
    limit = BROADCAST_MAP_MAX if broadcast_max is None else broadcast_max
    if mapping.count() > limit:
        return _edges_with_ids_bucketed(edge_urls, mapping, drop_missing)
    mp = mapping.to_pandas()
    urls_arrow = pa.array(mp["url"], type=pa.string())
    ids_arr = mp["id"].to_numpy(dtype=np.int64)
    if len(ids_arr) <= INDEX_IN_MAX:
        payload = ("index_in", urls_arrow, ids_arr)
    else:
        from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

        mh = md5_u64_lower_arrow(urls_arrow)
        order = np.argsort(mh, kind="stable").astype(np.int64)
        hsorted = mh[order]
        if len(hsorted) > 1 and (hsorted[1:] == hsorted[:-1]).any():
            # two distinct urls share an md5-u64 (probability ~n^2/2^65)
            # — the hashed probe would be ambiguous, so fall back to the
            # exact (slower per batch, still correct) hash-probe layout
            payload = ("index_in", urls_arrow, ids_arr)
        else:
            payload = ("hashed", urls_arrow, ids_arr, hsorted, order)
    map_ref = ray.put(payload)

    # TASK-based: the only "state" is one broadcast ref, and ray.get from
    # the local plasma store is cheap per batch — an actor pool here paid
    # spin-up + autoscale lag on every build (same finding as
    # extract_edge_urls)
    def resolve_batch(t: pa.Table) -> pa.Table:
        return _UrlToId(map_ref, drop_missing)(t)

    return edge_urls.map_batches(resolve_batch, batch_format="pyarrow",
                                 batch_size=65536)


def _edges_with_ids_bucketed(edge_urls: ray.data.Dataset,
                             mapping: ray.data.Dataset,
                             drop_missing: bool) -> ray.data.Dataset:
    """Two bucketed co-group passes (stages/shuffle.co_group — string
    keys hash with pandas' vectorised siphash) resolving src_url then
    dst_url against the (url, id) mapping; the carried columns stay
    TYPED through both shuffles (no stringified ids, no sentinels)."""
    from ligrust_ray.stages import shuffle

    co_group = shuffle.co_group
    map_schema = pa.schema([("url", pa.string()), ("id", pa.int64())])

    def resolve(key: str, out_cols, how: str):
        def f(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            m = rf.rename(columns={"url": key, "id": "__mid"})
            j = lf.merge(m, on=key, how=how)
            out = {}
            for name, src in out_cols:
                vals = j["__mid"] if src == "__mid" else j[src]
                if src == "__mid" or name in ("src", "dst"):
                    vals = vals.fillna(-1).astype(np.int64) \
                        if vals.isna().any() else vals.astype(np.int64)
                out[name] = vals
            return pd.DataFrame(out)
        return f

    # pass 1: src_url -> src, carrying dst_url (string); unknown src =
    # not a page row -> inner
    p1 = co_group(
        edge_urls, mapping, l_on="src_url", r_on="url",
        fn=resolve("src_url", [("src", "__mid"), ("dst_url", "dst_url")],
                   how="inner"),
        l_schema=pa.schema([("src_url", pa.string()),
                            ("dst_url", pa.string())]),
        r_schema=map_schema)
    # pass 2: dst_url -> dst, carrying src (int64)
    p2 = co_group(
        p1, mapping, l_on="dst_url", r_on="url",
        fn=resolve("dst_url", [("dst", "__mid"), ("src", "src")],
                   how="inner" if drop_missing else "left"),
        l_schema=pa.schema([("src", pa.int64()),
                            ("dst_url", pa.string())]),
        r_schema=map_schema)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": df["src"].to_numpy(dtype=np.int64),
            "dst": df["dst"].to_numpy(dtype=np.int64)})

    return p2.map_batches(finish, batch_format="pandas")


def partition_bounds(n: int, num_partitions: int) -> np.ndarray:
    """Contiguous ranges: part p = [bounds[p], bounds[p+1])."""
    return np.linspace(0, n, num_partitions + 1).astype(np.int64)


def _rollup_and_write(g: pd.DataFrame, *, key: str, other: str, bounds: np.ndarray,
                      out_dir: str, sort_neighbors: bool,
                      hub_threshold: int | None = None) -> pd.DataFrame:
    """Per-partition CSR chunk: sort, roll into list rows (incl. zero-degree
    gaps), write ``part-{p}.parquet`` atomically. Returns one stats row.

    Skew-aware hub splitting (north_star requirement): a node whose list
    exceeds ``hub_threshold`` has its ENTIRE list spilled in
    ``hub_threshold``-sized chunks to HOLDER partitions chosen by
    hash(node, chunk) — written to ``hubspill-{p}.parquet`` as
    (holder, hub_id, srcs); its local CSR row becomes empty. Every shard
    loads every spill file and keeps its holder rows, computes chunk
    partials each iteration, and the driver merges them into the hub's
    home aggregate — so a 10^9-degree hub costs each holder O(chunk), not
    the home shard O(degree). Spilling ALL chunks (home keeps none) makes
    the merge uniform for every reduce, including non-associative mode
    (label counts combine at the driver)."""
    part = int(g["part"].iloc[0])
    lo, hi = int(bounds[part]), int(bounds[part + 1])
    nparts = len(bounds) - 1
    real = g[g[key] >= 0]
    k = real[key].to_numpy(dtype=np.int64)
    v = real[other].to_numpy(dtype=np.int64)
    order = np.lexsort((v, k)) if sort_neighbors else np.argsort(k, kind="stable")
    k, v = k[order], v[order]

    spill_rows: list[tuple[int, int, np.ndarray]] = []
    if hub_threshold and len(k):
        counts_all = np.bincount(k - lo, minlength=hi - lo)
        hubs = np.flatnonzero(counts_all > hub_threshold) + lo
        if len(hubs):
            keep_mask = np.ones(len(k), dtype=bool)
            pos = np.searchsorted(k, hubs)           # k sorted by node
            for h, p0 in zip(hubs, pos):
                d = int(counts_all[h - lo])
                srcs = v[p0:p0 + d]
                for ci, start in enumerate(range(0, d, hub_threshold)):
                    chunk = srcs[start:start + hub_threshold]
                    holder = int((zlib.crc32(
                        f"{h}:{ci}".encode()) % nparts))
                    spill_rows.append((holder, int(h), chunk.copy()))
                keep_mask[p0:p0 + d] = False
            k, v = k[keep_mask], v[keep_mask]
    counts = np.bincount(k - lo, minlength=hi - lo) if hi > lo else np.zeros(0, np.int64)
    indptr = np.zeros(hi - lo + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    node_id = np.arange(lo, hi, dtype=np.int64)
    tbl = pa.table({
        "node_id": pa.array(node_id),
        "neighbors": pa.LargeListArray.from_arrays(  # int64 offsets: >2^31 edges/part OK
            pa.array(indptr, type=pa.int64()), pa.array(v, type=pa.int64())),
        "degree": pa.array(counts.astype(np.int64)),
    })
    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, f"part-{part:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, final)
    n_spilled = 0
    if spill_rows:
        n_spilled = int(sum(len(c) for _, _, c in spill_rows))
        sp = pa.table({
            "holder": pa.array([r[0] for r in spill_rows], type=pa.int64()),
            "hub_id": pa.array([r[1] for r in spill_rows], type=pa.int64()),
            "srcs": pa.array([r[2].tolist() for r in spill_rows],
                             type=pa.list_(pa.int64())),
        })
        spf = os.path.join(out_dir, f"hubspill-{part:05d}.parquet")
        pq.write_table(sp, spf + ".tmp")
        os.replace(spf + ".tmp", spf)
    return pd.DataFrame({"part": [part], "nodes": [hi - lo], "edges": [len(v)],
                         "degree_sum": [int(counts.sum())],
                         "spilled_edges": [n_spilled]})


def _build_direction(edges: ray.data.Dataset, key: str, other: str, n: int,
                     bounds: np.ndarray, out_dir: str, sort_neighbors: bool,
                     hub_threshold: int | None = None) -> list[dict]:
    num_partitions = len(bounds) - 1
    bounds_ref = ray.put(bounds)

    def add_part(t: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        part = np.searchsorted(b, t.column(key).to_numpy(), side="right") - 1
        return t.append_column("part", pa.array(part.astype(np.int64)))

    # sentinel row per partition => every partition file exists even when a
    # range has no edges (all-zero-degree gap partitions)
    sentinels = ray.data.from_arrow(pa.table({
        "src": pa.array(np.full(num_partitions, -1, dtype=np.int64)),
        "dst": pa.array(np.full(num_partitions, -1, dtype=np.int64)),
        "part": pa.array(np.arange(num_partitions, dtype=np.int64)),
    }))

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        return _rollup_and_write(g, key=key, other=other, bounds=ray.get(bounds_ref),
                                 out_dir=out_dir, sort_neighbors=sort_neighbors,
                                 hub_threshold=hub_threshold)

    stats = (
        edges.map_batches(add_part, batch_format="pyarrow")
        .union(sentinels)
        .groupby("part")
        .map_groups(rollup, batch_format="pandas")
        .to_pandas()
    )
    return stats.sort_values("part").to_dict("records")


def build_csr(edges: ray.data.Dataset, n: int, out_dir: str,
              num_partitions: int = 32, meta: dict | None = None,
              hub_in_threshold: int | None = None) -> dict:
    """edges (src,dst) -> ``out_dir/{out,in}/part-*.parquet`` + manifest.

    out-CSR keyed by src (neighbors sorted by dst asc); in-CSR keyed by dst
    (neighbors sorted by src asc — the reference's stable invert ordering,
    graph.rs:280). Two groupby shuffles; this is THE wide step of the build.
    """
    # Rebuilding into an existing dir: remove EVERY stale CSR/spill file
    # first. CsrShard globs all hubspill-*.parquet (and a different
    # partition count leaves part files the new build never overwrites);
    # stale leftovers would double-count edges silently.
    import glob as _glob

    for sub in ("out", "in"):
        for f in _glob.glob(os.path.join(out_dir, sub, "*.parquet")):
            os.remove(f)

    bounds = partition_bounds(n, num_partitions)
    edges = edges.materialize()  # consumed twice (one shuffle per direction)
    out_stats = _build_direction(edges, "src", "dst", n, bounds,
                                 os.path.join(out_dir, "out"), sort_neighbors=True)
    in_stats = _build_direction(edges, "dst", "src", n, bounds,
                                os.path.join(out_dir, "in"), sort_neighbors=True,
                                hub_threshold=hub_in_threshold)
    m = int(sum(s["edges"] for s in out_stats))
    manifest = {
        "n": n,
        "m": m,
        "hub_in_threshold": hub_in_threshold,
        "spilled_in_edges": int(sum(s.get("spilled_edges", 0)
                                    for s in in_stats)),
        "num_partitions": num_partitions,
        "bounds": bounds.tolist(),
        "out_stats": out_stats,
        "in_stats": in_stats,
        "meta": meta or {},
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def symmetrize_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Undirected simplification: drop self-loops, dedupe unordered pairs,
    emit BOTH directions — the precondition of undirected algorithms
    (k-core) where out-CSR must carry the full adjacency and out_deg the
    undirected degree."""
    from ligrust_ray.stages import shuffle

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = s != d
        a = np.minimum(s[keep], d[keep]).astype(np.int64)
        b = np.maximum(s[keep], d[keep]).astype(np.int64)
        k = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"src": pa.array(np.concatenate([k[:, 0], k[:, 1]])),
                         "dst": pa.array(np.concatenate([k[:, 1], k[:, 0]]))})

    return shuffle.distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["src", "dst"])


def build_graph_from_pages(pages_path: str | ray.data.Dataset, out_dir: str,
                           num_partitions: int = 32,
                           include_dangling: bool = True,
                           nbuckets: int = 64,
                           hub_in_threshold: int | None = None,
                           symmetrize: bool = False) -> dict:
    """Full ETL: pages parquet -> CSR graph dir. Returns the manifest."""
    if isinstance(pages_path, str):
        # block count sized for the CPU-bound extract stage: at least ~2
        # blocks per CPU (parallelism = block count for task-based
        # map_batches), at most one block per ~8 MiB of input. A single
        # parquet FILE path must use getsize — os.walk on a file yields
        # nothing, and size=0 would collapse extract to one serial task.
        size = os.path.getsize(pages_path) if os.path.isfile(pages_path) \
            else sum(os.path.getsize(os.path.join(dp, f))
                     for dp, _, fs in os.walk(pages_path) for f in fs)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        nblocks = max(min(2 * ncpu, -(-size // (1 << 23))), 1)
        pages = ray.data.read_parquet(pages_path, columns=["url", "html"],
                                      override_num_blocks=nblocks)
    else:
        pages = pages_path.select_columns(["url", "html"])
    edge_urls = extract_edge_urls(pages).materialize()
    page_urls = pages.select_columns(["url"])
    if include_dangling:
        url_universe = page_urls.union(
            edge_urls.select_columns(["dst_url"]).rename_columns({"dst_url": "url"}))
    else:
        url_universe = page_urls
    mapping, n = assign_ids(url_universe, nbuckets=nbuckets)
    edges = edges_with_ids(edge_urls, mapping,
                           drop_missing=not include_dangling)
    if symmetrize:
        edges = symmetrize_edges(edges)
    edges = edges.materialize()
    manifest = build_csr(edges, n, out_dir, num_partitions=num_partitions,
                         meta={"source": "pages",
                               "include_dangling": include_dangling},
                         hub_in_threshold=hub_in_threshold)
    # persist the url<->id mapping and the raw int edge table next to the
    # graph — downstream joins, resumability, and the DuckDB oracle for
    # pages_pagerank all read these instead of re-extracting
    import shutil

    mapping.write_parquet(os.path.join(out_dir, "url_map"))
    shutil.rmtree(os.path.join(out_dir, "edges"), ignore_errors=True)
    edges.write_parquet(os.path.join(out_dir, "edges"))
    return manifest


def build_graph_from_edges(edges: pa.Table | ray.data.Dataset, out_dir: str,
                           n: int | None = None, num_partitions: int = 8,
                           hub_in_threshold: int | None = None,
                           symmetrize: bool = False) -> dict:
    """Build a graph dir straight from an int edge table (tests, events graph,
    AdjacencyGraph text fixtures)."""
    if isinstance(edges, pa.Table):
        if n is None:
            # explicit None checks: a legitimate max id of 0 is falsy
            ms = pa.compute.max(edges["src"]).as_py()
            md = pa.compute.max(edges["dst"]).as_py()
            n = max(-1 if ms is None else int(ms),
                    -1 if md is None else int(md)) + 1
        edges = ray.data.from_arrow(edges)
    elif n is None:
        mx = edges.max(["src", "dst"])
        n = int(max(mx["max(src)"], mx["max(dst)"])) + 1
    if symmetrize:
        edges = symmetrize_edges(edges)
    return build_csr(edges, n, out_dir, num_partitions=num_partitions,
                     meta={"source": "edges"},
                     hub_in_threshold=hub_in_threshold)

"""Ligra binary graph format — dump/load parity with the reference
(/root/reference/src/graph.rs:322-357 writer, 383-457 loaders).

Layout (little-endian u64 throughout; ``usize`` on x86-64):

    [n, m]                                   2 x u64 header
    out_nodes:  n x (degree: u64, offset: u64)   -- Node struct order
                                                    (graph.rs:140-143)
    out_targets: m x u64
    in_nodes:   n x (degree, offset)
    in_targets: m x u64

The in-direction target lists are source-ascending (the reference's stable
``invert()`` sort, graph.rs:280), which is also this repo's in-CSR order —
a dump of our build round-trips bit-identically.

Loading uses ``np.memmap`` (the MappedGraph zero-copy analog,
graph.rs:383-417): slicing a partition's range out of the mapped arrays
touches only those pages, so converting a dump into the partitioned
parquet layout streams per partition without materialising the file.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_U8LE = np.dtype("<u8")


def write_ligra_binary(path: str, out_indptr: np.ndarray,
                       out_targets: np.ndarray, in_indptr: np.ndarray,
                       in_targets: np.ndarray) -> None:
    """Arrays -> one ``.bin`` file in the reference layout."""
    n = len(out_indptr) - 1
    m = len(out_targets)
    with open(path, "wb") as f:
        np.array([n, m], dtype=_U8LE).tofile(f)
        for indptr, targets in ((out_indptr, out_targets),
                                (in_indptr, in_targets)):
            nodes = np.empty((n, 2), dtype=_U8LE)
            nodes[:, 0] = np.diff(indptr)          # degree first (Node)
            nodes[:, 1] = indptr[:-1]              # then offset
            nodes.tofile(f)
            np.ascontiguousarray(targets, dtype=np.int64) \
                .astype(_U8LE, copy=False).tofile(f)


def read_ligra_binary(path: str
                      ) -> tuple[int, int, np.ndarray, np.ndarray,
                                 np.ndarray, np.ndarray]:
    """-> (n, m, out_indptr[n+1], out_targets, in_indptr[n+1], in_targets)
    as zero-copy memmap views (int64)."""
    header = np.fromfile(path, dtype=_U8LE, count=2)
    n, m = int(header[0]), int(header[1])
    expect = (2 + 2 * n + m + 2 * n + m) * 8
    size = os.path.getsize(path)
    if size != expect:
        raise ValueError(f"{path}: size {size} != expected {expect} "
                         f"for n={n} m={m}")
    mm = np.memmap(path, dtype=_U8LE, mode="r")

    def direction(base: int) -> tuple[np.ndarray, np.ndarray, int]:
        nodes = mm[base:base + 2 * n].reshape(n, 2)
        deg = nodes[:, 0].astype(np.int64)
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(deg, out=indptr[1:])
        if not np.array_equal(nodes[:, 1].astype(np.int64), indptr[:-1]):
            raise ValueError(f"{path}: non-contiguous offsets")
        targets = mm[base + 2 * n:base + 2 * n + m].view(np.int64)
        return indptr, targets, base + 2 * n + m

    out_indptr, out_targets, pos = direction(2)
    in_indptr, in_targets, _ = direction(pos)
    return n, m, out_indptr, out_targets, in_indptr, in_targets


def dump_graph_dir(graph_dir: str, path: str) -> dict:
    """Partitioned parquet CSR dir -> one reference-format ``.bin``.

    Streams one partition file at a time (never holds the full graph);
    spilled hub in-lists are re-assembled from the hubspill files
    (chunk order = chunk index, preserving the source-ascending order the
    splitter cut from)."""
    import glob as _glob

    with open(os.path.join(graph_dir, "manifest.json")) as f:
        manifest = json.load(f)
    n, m = int(manifest["n"]), int(manifest["m"])
    nparts = int(manifest["num_partitions"])

    hub_lists: dict[int, list] = {}
    for fpath in sorted(_glob.glob(os.path.join(graph_dir, "in",
                                                "hubspill-*.parquet"))):
        t = pq.read_table(fpath)
        for hid, srcs in zip(t.column("hub_id").to_pylist(),
                             t.column("srcs").to_pylist()):
            hub_lists.setdefault(int(hid), []).append(
                np.asarray(srcs, dtype=np.int64))
    merged_hubs = {h: np.concatenate(chunks)
                   for h, chunks in hub_lists.items()}

    with open(path, "wb") as f:
        np.array([n, m], dtype=_U8LE).tofile(f)
        for direction in ("out", "in"):
            hubs = merged_hubs if direction == "in" else {}
            # pass 1: node records (degree, offset) need global offsets
            degs = []
            for p in range(nparts):
                t = pq.read_table(os.path.join(
                    graph_dir, direction, f"part-{p:05d}.parquet"),
                    columns=["node_id", "degree"])
                d = t.column("degree").to_numpy().astype(np.int64).copy()
                if hubs:
                    ids = t.column("node_id").to_numpy()
                    for i, nid in enumerate(ids):
                        if int(nid) in hubs:
                            d[i] = len(hubs[int(nid)])
                degs.append(d)
            deg = np.concatenate(degs) if degs else np.zeros(0, np.int64)
            offsets = np.zeros(len(deg), dtype=np.int64)
            np.cumsum(deg[:-1], out=offsets[1:])
            nodes = np.empty((len(deg), 2), dtype=_U8LE)
            nodes[:, 0] = deg
            nodes[:, 1] = offsets
            nodes.tofile(f)
            # pass 2: targets, partition by partition
            for p in range(nparts):
                t = pq.read_table(os.path.join(
                    graph_dir, direction, f"part-{p:05d}.parquet"),
                    columns=["node_id", "neighbors"])
                col = t.column("neighbors").combine_chunks()
                if hubs:
                    ids = t.column("node_id").to_numpy()
                    lists = [np.asarray(col[i].as_py(), dtype=np.int64)
                             for i in range(len(ids))]
                    for i, nid in enumerate(ids):
                        if int(nid) in hubs:
                            lists[i] = hubs[int(nid)]
                    flat = (np.concatenate(lists) if lists
                            else np.zeros(0, np.int64))
                else:
                    flat = col.values.to_numpy(zero_copy_only=False) \
                        .astype(np.int64, copy=False)
                flat.astype(_U8LE, copy=False).tofile(f)
    return {"n": n, "m": m, "bytes": os.path.getsize(path)}


def binary_to_graph_dir(path: str, out_dir: str,
                        num_partitions: int = 8) -> dict:
    """Reference ``.bin`` dump -> this repo's partitioned parquet CSR dir.

    Direct conversion: each partition's CSR rows are a CONTIGUOUS slice of
    the memmapped arrays — no edge shuffle, pages are read once."""
    from ligrust_ray.pipelines.build import MANIFEST, partition_bounds

    n, m, out_indptr, out_targets, in_indptr, in_targets = \
        read_ligra_binary(path)
    bounds = partition_bounds(n, num_partitions)
    for direction, indptr, targets in (("out", out_indptr, out_targets),
                                       ("in", in_indptr, in_targets)):
        ddir = os.path.join(out_dir, direction)
        os.makedirs(ddir, exist_ok=True)
        for p in range(num_partitions):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            ip = indptr[lo:hi + 1]
            flat = np.asarray(targets[ip[0]:ip[-1]], dtype=np.int64)
            local = (ip - ip[0]).astype(np.int64)
            tbl = pa.table({
                "node_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "neighbors": pa.LargeListArray.from_arrays(
                    pa.array(local, type=pa.int64()),
                    pa.array(flat, type=pa.int64())),
                "degree": pa.array(np.diff(ip).astype(np.int64)),
            })
            final = os.path.join(ddir, f"part-{p:05d}.parquet")
            pq.write_table(tbl, final + ".tmp")
            os.replace(final + ".tmp", final)
    manifest = {
        "n": n, "m": m, "hub_in_threshold": None, "spilled_in_edges": 0,
        "num_partitions": num_partitions, "bounds": bounds.tolist(),
        "out_stats": [], "in_stats": [],
        "meta": {"source": "ligra_binary", "file": os.path.abspath(path)},
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest

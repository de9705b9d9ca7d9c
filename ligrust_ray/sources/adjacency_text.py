"""Ligra ``AdjacencyGraph`` text format (format parity with the reference).

Format (/root/reference/src/graph.rs:145-196): a header line
``AdjacencyGraph``, then ``n``, then ``m``, then ``n`` offsets and ``m``
targets, one ASCII decimal per whitespace/newline-separated token. Offsets
are the CSR indptr prefix (no trailing ``m``); degree of node ``i`` is
``offsets[i+1] - offsets[i]`` with the last node closing against ``m``
(graph.rs:203-216).

The reference streams tokens through ``linereader`` + ``atoi``; we read the
file once and tokenise with NumPy — same grammar, vectorised. These files
are small bootstrap inputs (the at-scale source is the pages parquet), so a
single-node read is appropriate; for huge files ``ray.data.read_text`` +
a stateful tokenizer would stream, noted here for the scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def read_adjacency_text(path: str) -> tuple[int, int, np.ndarray, np.ndarray]:
    """Returns (n, m, offsets[n], targets[m])."""
    with open(path, "rb") as f:
        data = f.read()
    toks = data.split()
    if not toks or toks[0] != b"AdjacencyGraph":
        raise ValueError(f"{path}: missing AdjacencyGraph header")
    if len(toks) < 3:
        raise ValueError(f"{path}: truncated header")
    n = int(toks[1])
    m = int(toks[2])
    nums = np.array(toks[3 : 3 + n + m], dtype=np.int64)
    if nums.size != n + m:
        raise ValueError(f"{path}: expected {n + m} values, got {nums.size}")
    return n, m, nums[:n], nums[n:]


def write_adjacency_text(path: str, offsets: np.ndarray, targets: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write("AdjacencyGraph\n")
        f.write(f"{len(offsets)}\n{len(targets)}\n")
        for v in offsets:
            f.write(f"{v}\n")
        for v in targets:
            f.write(f"{v}\n")


def adjacency_text_to_edges(path: str) -> pa.Table:
    """Text graph -> edge table ``(src: int64, dst: int64)`` in CSR order."""
    n, m, offsets, targets = read_adjacency_text(path)
    degrees = np.diff(np.concatenate([offsets, [m]]))
    if (degrees < 0).any():
        raise ValueError(f"{path}: offsets not monotonic")
    src = np.repeat(np.arange(n, dtype=np.int64), degrees)
    return pa.table({"src": src, "dst": targets.astype(np.int64)})


def edges_to_csr(n: int, src: np.ndarray, dst: np.ndarray,
                 sort_neighbors: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """In-memory CSR build (oracle/test helper; the distributed version is
    pipelines/build.py). Returns (indptr[n+1], targets[m]); neighbor lists
    sorted ascending when ``sort_neighbors`` (mirrors the reference in-CSR
    ordering, graph.rs:280)."""
    order = np.lexsort((dst, src)) if sort_neighbors else np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    counts = np.bincount(src_s, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, dst_s.astype(np.int64)

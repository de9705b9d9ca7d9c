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


def _token_stream(path: str, chunk_bytes: int = 32 << 20):
    """Bounded-memory ASCII-decimal token stream: yields int64 arrays, one
    per file chunk, carrying split tokens across chunk boundaries (the
    linereader-style streaming of graph.rs:145-196 — the round-1 reader
    slurped the whole file)."""
    rest = b""
    with open(path, "rb") as f:
        while True:
            chunk = f.read(chunk_bytes)
            if not chunk:
                break
            buf = rest + chunk
            if buf[-1:].isspace():
                rest = b""
            else:
                cut = max(buf.rfind(b" "), buf.rfind(b"\n"),
                          buf.rfind(b"\t"), buf.rfind(b"\r"))
                if cut < 0:
                    rest = buf
                    continue
                buf, rest = buf[:cut], buf[cut:]
            toks = buf.split()
            if toks:
                yield toks
    if rest.split():
        yield rest.split()


def adjacency_text_to_edges_stream(path: str, batch_edges: int = 1 << 22,
                                   chunk_bytes: int = 32 << 20):
    """Streaming variant of ``adjacency_text_to_edges``: a generator of
    ``(src, dst)`` pyarrow tables of ~``batch_edges`` rows each.

    Memory: O(n) for the offsets prefix (the reference holds the same
    vector) + O(chunk) for the target stream — never O(m). Feed the
    batches into ``ray.data.from_arrow_refs`` (see ``stream_edges_dataset``)
    so only object-store refs stay on the driver."""
    def numbers():
        first = True
        for toks in _token_stream(path, chunk_bytes):
            if first:
                if toks[0] != b"AdjacencyGraph":
                    raise ValueError(
                        f"{path}: missing AdjacencyGraph header")
                toks = toks[1:]
                first = False
            if toks:
                yield np.array(toks, dtype=np.int64)

    gen = numbers()
    pending: list[np.ndarray] = []
    have = 0

    def take(k: int) -> np.ndarray:
        nonlocal have
        while have < k:
            arr = next(gen)
            pending.append(arr)
            have += len(arr)
        flat = np.concatenate(pending) if len(pending) > 1 else pending[0]
        out, rest = flat[:k], flat[k:]
        pending.clear()
        if len(rest):
            pending.append(rest)
        have = len(rest)
        return out

    head = take(2)
    n, m = int(head[0]), int(head[1])
    offsets = take(n)
    degrees = np.diff(np.concatenate([offsets, [m]]))
    if (degrees < 0).any():
        raise ValueError(f"{path}: offsets not monotonic")
    done = 0
    while done < m:
        k = min(batch_edges, m - done)
        dst = take(k)
        # sources for target positions [done, done+k): nodes whose CSR
        # ranges intersect the window
        lo_node = int(np.searchsorted(offsets, done, side="right")) - 1
        hi_node = int(np.searchsorted(offsets, done + k, side="left"))
        ids = np.arange(lo_node, hi_node, dtype=np.int64)
        starts = np.maximum(offsets[lo_node:hi_node], done)
        nxt = offsets[lo_node + 1:hi_node + 1]
        if len(nxt) < len(ids):               # window reaches the last node
            nxt = np.concatenate([nxt, [m]])
        ends = np.minimum(nxt, done + k)
        src = np.repeat(ids, np.maximum(ends - starts, 0))
        yield pa.table({"src": pa.array(src),
                        "dst": pa.array(dst.astype(np.int64))})
        done += k


def stream_edges_dataset(path: str, batch_edges: int = 1 << 22):
    """Streaming text graph -> ``ray.data.Dataset`` of (src, dst); each
    batch is ray.put into the object store as it parses, so driver memory
    stays O(batch)."""
    import ray
    import ray.data

    refs = [ray.put(t) for t in adjacency_text_to_edges_stream(
        path, batch_edges=batch_edges)]
    return ray.data.from_arrow_refs(refs)


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

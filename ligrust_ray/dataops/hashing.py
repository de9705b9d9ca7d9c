"""Stable 64-bit content hashes with a DuckDB-checkable spec.

The driver's correctness gate cross-checks every SQL-expressible operator
against DuckDB, so the text-op hash primitive is defined as EXACTLY what
DuckDB's ``md5_number_lower`` / ``md5_number_upper`` compute (verified
byte-order: both are little-endian int64 views of the md5 digest halves).
hashlib.md5 is a C implementation (~0.5 GB/s/core), replacing the round-1
pure-Python FNV-1a loop (~1 MB/s/core) that could never feed a 100-TB
text stage.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = 1 << 64
_I64_MAX = 1 << 63


def u64_to_i64(h: int) -> int:
    """Reinterpret an unsigned 64-bit value as signed int64 (two's
    complement) — parquet/Arrow carry int64, DuckDB casts the same way."""
    return h - _U64 if h >= _I64_MAX else h


def md5_u64_lower(data: bytes) -> int:
    """== DuckDB ``md5_number_lower(s)``: little-endian uint64 of md5
    digest bytes [8:16]."""
    return int.from_bytes(hashlib.md5(data).digest()[8:16], "little")


def md5_u64_upper(data: bytes) -> int:
    """== DuckDB ``md5_number_upper(s)``: little-endian uint64 of md5
    digest bytes [0:8]."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def md5_i64_lower(data: bytes) -> int:
    return u64_to_i64(md5_u64_lower(data))


def md5_u64_lower_many(items: list[bytes]) -> np.ndarray:
    """Vectorised-ish batch helper (the md5 core is C; the loop is cheap
    relative to hashing)."""
    return np.fromiter((md5_u64_lower(b) for b in items), dtype=np.uint64,
                       count=len(items))


_ARROW_CHUNK = 1 << 21
_duck_con = None


def md5_u64_lower_arrow(arr) -> np.ndarray:
    """uint64 md5_number_lower over an Arrow string array, evaluated by
    IN-PROCESS DuckDB — one vectorised C++ call per chunk instead of a
    per-item hashlib loop (~9x faster at 1M+ strings), and parity with
    the SQL oracles by construction (it IS the oracle function). Rejects
    nulls loudly (null hashes would silently drop rows in group-bys)."""
    import duckdb
    import pyarrow as pa

    global _duck_con
    if _duck_con is None:
        _duck_con = duckdb.connect()
        _duck_con.execute("SET threads=2")   # actors run fractional CPUs
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr, type=pa.string())
    if arr.null_count:
        raise ValueError("md5_u64_lower_arrow: null strings")
    n = len(arr)
    out = np.empty(n, dtype=np.uint64)
    for a in range(0, n, _ARROW_CHUNK):
        sl = arr.slice(a, min(_ARROW_CHUNK, n - a))
        batch = pa.table({"i": np.arange(len(sl), dtype=np.int64), "s": sl})
        _duck_con.register("_h_batch", batch)
        # explicit positional id + scatter: SQL result order is not
        # guaranteed without ORDER BY
        res = _duck_con.execute(
            "SELECT i, md5_number_lower(s) AS h FROM _h_batch"
        ).fetch_arrow_table()
        _duck_con.unregister("_h_batch")
        out[a:a + len(sl)][res.column("i").to_numpy()] = \
            res.column("h").to_numpy()
    return out

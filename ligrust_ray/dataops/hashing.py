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

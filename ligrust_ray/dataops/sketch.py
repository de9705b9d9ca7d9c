"""Mergeable cardinality sketches (HyperLogLog) — the bounded-state
aggregation family a 100-TB pipeline uses where exact distinct counts
would shuffle every key.

Design: the SKETCH IS DATA. ``hll_registers`` returns the (group,
register, max_rho) table — a pure-integer, order-insensitive, exactly
DuckDB-replicable object (the driver hash-checks the registers; the float
estimator is pytest-checked against exact counts). Registers max-merge
through the standard grouped_agg combiner, so sketch state is bounded at
``2^p`` rows per group no matter how many raw rows stream through — the
canonical mergeable-sketch wire shape (partial registers move, raw keys
don't).

Hash spec (DuckDB-replicable): h = md5-lower-u64 of ``str(value)``;
register = top ``p`` bits; rho = leading-zero count of the remaining
``64-p`` bits + 1 (== ``53 - length(bin(rem))`` for p=12 in DuckDB, with
the rem==0 sentinel at ``64-p+1``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ligrust_ray.stages import shuffle

HLL_P = 12


def _bitlen_u64(v: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (0 for 0) — branchless shift
    cascade, no float log2 (whose rounding flips at powers of two)."""
    x = v.astype(np.uint64).copy()
    b = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= np.uint64(1 << shift)
        b[m] += shift
        x[m] >>= np.uint64(shift)
    b += (x > 0).astype(np.int64)
    return b


def hll_registers(ds: ray.data.Dataset, value_col: str, group_col: str,
                  p: int = HLL_P, num_partitions: int = 32
                  ) -> ray.data.Dataset:
    """(group_col, reg, rho): per-group HLL registers, max-merged. Only
    non-zero registers are emitted (absent register == 0)."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_many

    rem_bits = 64 - p
    rem_mask = np.uint64((1 << rem_bits) - 1)

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(value_col).to_pylist()
        h = md5_u64_lower_many([str(v).encode("utf-8") for v in vals])
        reg = (h >> np.uint64(rem_bits)).astype(np.int64)
        rem = h & rem_mask
        rho = rem_bits + 1 - _bitlen_u64(rem)
        df = pd.DataFrame({group_col: t.column(group_col).to_pandas(),
                           "reg": reg, "rho": rho})
        r = df.groupby([group_col, "reg"], as_index=False)["rho"].max()
        return pa.Table.from_pandas(r, preserve_index=False)

    return shuffle.grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "reg"], {"rho": ("rho", "max")},
        num_partitions=num_partitions)


def hll_estimate(registers: pd.DataFrame, group_col: str,
                 p: int = HLL_P) -> pd.DataFrame:
    """(group_col, estimate) from a registers table — standard HLL
    harmonic-mean estimator with the small-range linear-counting
    correction. Deterministic; accuracy ~1.04/sqrt(2^p) rel. error
    (pytest-checked against exact counts)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    out_g, out_e = [], []
    for g, sub in registers.groupby(group_col, sort=True):
        rho = np.zeros(m, dtype=np.int64)
        rho[sub["reg"].to_numpy(dtype=np.int64)] = \
            sub["rho"].to_numpy(dtype=np.int64)
        e = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
        zeros = int((rho == 0).sum())
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        out_g.append(g)
        out_e.append(float(e))
    return pd.DataFrame({group_col: out_g, "estimate": out_e})


CMS_DEPTH = 4        # hash rows
CMS_WIDTH = 1024     # buckets per row


def cms_registers(docs: ray.data.Dataset, text_col: str = "text",
                  depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                  num_partitions: int = 32) -> ray.data.Dataset:
    """COUNT-MIN SKETCH registers over the corpus token stream (the
    mergeable heavy-hitter sketch; Cormode/Muthukrishnan 2005): register
    (r, c) = total count of tokens t with md5_number_lower(r ':' t) %
    width == c, for r in 1..depth. Like the HLL, the REGISTER TABLE is
    the contract output — pure integers, exactly SQL-replicable — while
    the point-estimate (min over rows) is pytest-checked against exact
    counts. Scale shape: per-batch token Counter collapses to at most
    depth x width partial rows per block (the register table is the
    combiner — volume is O(d*w) per block regardless of corpus size),
    then ONE partial-combined grouped sum. Merging two corpora's
    sketches = summing registers: associativity is what makes this a
    sketch."""
    import re

    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow
    from ligrust_ray.stages import shuffle

    word = re.compile("[^\t\n\f\r ]+")   # RE2 \S parity (textstats.RE2_WS)

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: "Counter[str]" = Counter()
        for x in t.column(text_col).to_pylist():
            cnt.update(word.findall(x.lower()))
        if not cnt:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in ("r", "c", "n")})
        toks = list(cnt.keys())
        vals = np.fromiter(cnt.values(), dtype=np.int64, count=len(toks))
        rs, cs, ns = [], [], []
        for r in range(1, depth + 1):
            h = md5_u64_lower_arrow(
                pa.array([f"{r}:{t}" for t in toks], type=pa.string()))
            c = (h % np.uint64(width)).astype(np.int64)
            # collapse to register partials immediately: <= width rows
            reg = np.zeros(width, dtype=np.int64)
            np.add.at(reg, c, vals)
            nz = np.flatnonzero(reg)
            rs.append(np.full(len(nz), r, dtype=np.int64))
            cs.append(nz.astype(np.int64))
            ns.append(reg[nz])
        return pa.table({"r": pa.array(np.concatenate(rs)),
                         "c": pa.array(np.concatenate(cs)),
                         "n": pa.array(np.concatenate(ns))})

    return shuffle.grouped_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["r", "c"], {"n": ("n", "sum")}, num_partitions=num_partitions)


def cms_point_query(registers: "pd.DataFrame", tokens: list[str],
                    depth: int = CMS_DEPTH, width: int = CMS_WIDTH
                    ) -> np.ndarray:
    """Estimated count per token = min over rows of register[r][h_r(t)]
    (never under the true count). ``registers`` = the (r, c, n) table."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    reg = np.zeros((depth + 1, width), dtype=np.int64)
    reg[registers["r"].to_numpy(), registers["c"].to_numpy()] = \
        registers["n"].to_numpy()
    est = np.full(len(tokens), np.iinfo(np.int64).max)
    for r in range(1, depth + 1):
        h = md5_u64_lower_arrow(
            pa.array([f"{r}:{t}" for t in tokens], type=pa.string()))
        c = (h % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, reg[r, c])
    return est


BLOOM_BITS = 1 << 16
BLOOM_K = 4


def bloom_bits(ds: ray.data.Dataset, value_col: str, k: int = BLOOM_K,
               m: int = BLOOM_BITS, num_partitions: int = 32
               ) -> ray.data.Dataset:
    """(bit,) — the distinct set bit positions of a Bloom filter over
    ``value_col``: position_j(v) = md5-lower-u64(f"{j}:{v}") % m for
    j in 1..k (the CMS row-salt hash spec, so the DuckDB oracle is one
    cross-join + DISTINCT). Like the HLL/CMS family, the SKETCH IS DATA:
    each batch collapses to a local m-bit bitmap and emits its nonzero
    positions, so at most m rows per batch enter the ONE distinct wide
    step and the merged filter is bounded at m rows no matter how many
    raw values stream through; merging two corpora's filters is a bitmap
    OR = row union. Membership via ``bloom_contains`` (no false
    negatives; FP rate ~(1-e^{-kn/m})^k, pytest-checked)."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    def partial(t: pa.Table) -> pa.Table:
        vals = [str(v) for v in t.column(value_col).to_pylist()]
        bits = np.zeros(m, dtype=bool)
        for j in range(1, k + 1):
            h = md5_u64_lower_arrow(
                pa.array([f"{j}:{v}" for v in vals], type=pa.string()))
            bits[(h % np.uint64(m)).astype(np.int64)] = True
        return pa.table({"bit": pa.array(np.flatnonzero(bits)
                                         .astype(np.int64))})

    return shuffle.distinct(
        ds.map_batches(partial, batch_format="pyarrow"), ["bit"],
        num_partitions=num_partitions)


def bloom_contains(bits: "pd.DataFrame | np.ndarray", values: list,
                   k: int = BLOOM_K, m: int = BLOOM_BITS) -> np.ndarray:
    """Membership test against a (bit,) table: True iff ALL k positions
    are set. Never false-negative for inserted values."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    arr = bits if isinstance(bits, np.ndarray) else bits["bit"].to_numpy()
    filt = np.zeros(m, dtype=bool)
    filt[arr] = True
    out = np.ones(len(values), dtype=bool)
    for j in range(1, k + 1):
        h = md5_u64_lower_arrow(
            pa.array([f"{j}:{v}" for v in values], type=pa.string()))
        out &= filt[(h % np.uint64(m)).astype(np.int64)]
    return out

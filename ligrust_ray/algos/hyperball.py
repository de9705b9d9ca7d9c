"""HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
Centralities with HyperBall", 2013): per-node neighborhood-size
estimation via HyperLogLog counters propagated along edges.

counter_0(v) = {v}; counter_t(v) = counter_{t-1}(v) MAX-merged with
counter_{t-1}(w) for every out-edge (v, w) — after t rounds counter(v)
sketches the OUT-ball {u : dist(v, u) <= t}. The neighborhood function
sum_v |ball(v, t)| over growing t yields distance distributions /
effective diameter at graph sizes where exact all-pairs BFS is hopeless
— THE large-graph trick for Common-Crawl-scale link graphs.

Ray-Data shape: registers live as a (node, reg, rho) Dataset (only
non-zero registers materialize — the sketch of a sparse ball stays
sparse); one round = one co_group join (registers x edges, partitioned
on the join key) feeding one grouped max — the same two-wide-step merge
economics as the repo's message-passing kernels, with NO per-node 2^p
dense arrays anywhere. Register spec (p, md5 split, rho) is shared with
dataops.sketch.hll_registers, so the DuckDB oracle replays every round
exactly (integer registers; the float estimator is pytest-checked
against exact BFS ball sizes instead).
"""

from __future__ import annotations

import json
import os
import re
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ligrust_ray.dataops.sketch import HLL_P, _bitlen_u64
from ligrust_ray.stages import shuffle

_I64 = pa.int64()
_REG_SCHEMA = pa.schema([("node", _I64), ("reg", _I64), ("rho", _I64)])
_EDGE_SCHEMA = pa.schema([("src", _I64), ("dst", _I64)])


def _init_registers(edges: ray.data.Dataset, p: int) -> ray.data.Dataset:
    """counter_0: one register per node (its own hash). Node universe =
    distinct src UNION dst, never collected on the driver."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    rem_bits = 64 - p
    rem_mask = np.uint64((1 << rem_bits) - 1)

    def seed(t: pa.Table) -> pa.Table:
        v = t.column("node").to_numpy().astype(np.int64)
        h = md5_u64_lower_arrow(pa.array(v).cast(pa.string()))
        reg = (h >> np.uint64(rem_bits)).astype(np.int64)
        rho = rem_bits + 1 - _bitlen_u64(h & rem_mask)
        return pa.table({"node": pa.array(v), "reg": pa.array(reg),
                         "rho": pa.array(rho)})

    def both_ends(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        d = t.column("dst").to_numpy().astype(np.int64)
        return pa.table({"node": pa.array(np.unique(
            np.concatenate([s, d])))})

    nodes = shuffle.distinct(
        edges.map_batches(both_ends, batch_format="pyarrow"), ["node"])
    return nodes.map_batches(seed, batch_format="pyarrow")



# ---- round-level checkpoint / resume (north_rule F6 commit protocol:
# parquet partition files first, manifest.json LAST -> manifest existence
# is the commit point; a killed run leaves an ignorable manifest-less dir)

def _ckpt_dir(root: str, t: int) -> str:
    return os.path.join(root, f"iter_{t:06d}")


def _ckpt_write(root: str, t: int, regs: ray.data.Dataset,
                loop_state: dict) -> None:
    d = _ckpt_dir(root, t)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(os.path.join(d, "regs"))
    regs.write_parquet(os.path.join(d, "regs"))
    tmp = os.path.join(root, f".manifest_{t}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"complete": True, "t": t, "loop_state": loop_state}, fh)
    os.replace(tmp, os.path.join(d, "manifest.json"))


def _ckpt_latest(root: str) -> tuple[int, ray.data.Dataset, dict] | None:
    best = None
    if not os.path.isdir(root):
        return None
    for name in os.listdir(root):
        m = re.match(r"iter_(\d{6})$", name)
        if not m:
            continue
        man = os.path.join(root, name, "manifest.json")
        try:
            with open(man) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            continue
        if meta.get("complete") and (best is None or meta["t"] > best[0]):
            best = (meta["t"], meta.get("loop_state", {}))
    if best is None:
        return None
    regs = ray.data.read_parquet(
        os.path.join(_ckpt_dir(root, best[0]), "regs"))
    return best[0], regs, best[1]


def _round(regs: ray.data.Dataset, e: ray.data.Dataset,
           num_partitions: int) -> ray.data.Dataset:
    """One HyperBall pull round: registers of dst flow to src, max-merge."""

    def pull(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.merge(rf, left_on="node", right_on="dst", how="inner")
        return pd.DataFrame({"node": j["src"].to_numpy(dtype=np.int64),
                             "reg": j["reg"].to_numpy(dtype=np.int64),
                             "rho": j["rho"].to_numpy(dtype=np.int64)})

    prop = shuffle.co_group(regs, e, "node", "dst", pull,
                            l_schema=_REG_SCHEMA, r_schema=_EDGE_SCHEMA,
                            num_partitions=num_partitions)
    return shuffle.grouped_agg(
        regs.union(prop), ["node", "reg"], {"rho": ("rho", "max")},
        num_partitions=num_partitions).materialize()


def _dedup_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    return shuffle.distinct(
        edges.map_batches(
            lambda b: pa.table({"src": b.column("src").cast(_I64),
                                "dst": b.column("dst").cast(_I64)}),
            batch_format="pyarrow"),
        ["src", "dst"]).materialize()


def hyperball_registers(edges: ray.data.Dataset, t: int = 2,
                        p: int = HLL_P, num_partitions: int | None = None,
                        checkpoint_dir: str | None = None
                        ) -> ray.data.Dataset:
    """(node, reg, rho) after ``t`` propagation rounds. Edges are deduped
    once up front (multiplicity is irrelevant under max-merge and would
    multiply join fan-out). ``num_partitions`` defaults to the deduped
    edge set's block count (each of the 2t wide steps launches that many
    tasks — a fixed 32 is pure coordination overhead on small graphs and
    a ceiling on large ones). ``checkpoint_dir`` persists the register
    Dataset after every round (manifest-last commit protocol) and resumes
    from the newest complete round — registers are exact integers, so a
    resumed run equals an uninterrupted one bitwise."""
    e = _dedup_edges(edges)
    if num_partitions is None:
        num_partitions = max(4, min(256, e.num_blocks()))
    t0 = 0
    regs = None
    if checkpoint_dir:
        got = _ckpt_latest(checkpoint_dir)
        if got is not None and got[0] <= t:
            t0, regs, _ = got
    if regs is None:
        regs = _init_registers(e, p).materialize()
    for k in range(t0 + 1, t + 1):
        regs = _round(regs, e, num_partitions)
        if checkpoint_dir:
            _ckpt_write(checkpoint_dir, k, regs, {})
    return regs


def hyperball_summary(edges: ray.data.Dataset, t: int = 2,
                      p: int = HLL_P) -> ray.data.Dataset:
    """(node_id, n_regs, rho_sum): integer register summary per node —
    the SQL-exact contract surface (the float HLL estimate is a pure
    driver-side function of the registers; see hyperball_estimates)."""
    regs = hyperball_registers(edges, t=t, p=p)
    agg = shuffle.grouped_agg(regs, ["node"],
                              {"n_regs": (None, "count"),
                               "rho_sum": ("rho", "sum")})
    return agg.map_batches(
        lambda b: pa.table({"node_id": b.column("node").cast(_I64),
                            "n_regs": b.column("n_regs").cast(_I64),
                            "rho_sum": b.column("rho_sum").cast(_I64)}),
        batch_format="pyarrow")


def hyperball_estimates(edges: ray.data.Dataset, t: int = 2,
                        p: int = HLL_P,
                        checkpoint_dir: str | None = None) -> pd.DataFrame:
    """(node, estimate): standard HLL estimator over each node's
    registers — |ball(node, t)| up to ~1.04/sqrt(2^p) relative error."""
    from ligrust_ray.dataops.sketch import hll_estimate

    regs = hyperball_registers(edges, t=t, p=p,
                               checkpoint_dir=checkpoint_dir).to_pandas()
    return hll_estimate(regs, "node", p=p)


def neighborhood_function(edges: ray.data.Dataset, max_t: int = 16,
                          p: int = HLL_P, eps: float = 0.01,
                          checkpoint_dir: str | None = None
                          ) -> pd.DataFrame:
    """(t, n_pairs): the neighborhood function N(t) = estimated number of
    ordered pairs (u, v) with dist(u, v) <= t — HyperBall's headline
    output. Iterates until N(t) grows by less than ``eps`` relative (the
    paper's stopping rule) or ``max_t``. With ``checkpoint_dir`` every
    round commits (registers + the N(t) history in loop_state) and a
    rerun resumes after the newest complete round — the registers are
    exact integers, so resume is bitwise-equivalent."""
    from ligrust_ray.dataops.sketch import hll_estimate

    e = _dedup_edges(edges)
    num_partitions = max(4, min(256, e.num_blocks()))

    def total(regs: ray.data.Dataset) -> float:
        df = regs.to_pandas()
        if not len(df):                      # edgeless input: no nodes
            return 0.0
        est = hll_estimate(df, "node", p=p)
        return float(est["estimate"].sum())

    regs = None
    out_t, out_n = [0], None
    if checkpoint_dir:
        got = _ckpt_latest(checkpoint_dir)
        if got is not None and got[2].get("n_hist"):
            k, regs, state = got
            out_t = list(range(k + 1))
            out_n = [float(x) for x in state["n_hist"]]
    if regs is None:
        regs = _init_registers(e, p).materialize()
        out_n = [total(regs)]
    done = len(out_n) >= 2 and out_n[-1] <= out_n[-2] * (1.0 + eps)
    for t in range(out_t[-1] + 1, max_t + 1):
        if done:
            break
        regs = _round(regs, e, num_partitions)
        n = total(regs)
        out_t.append(t)
        out_n.append(n)
        if checkpoint_dir:
            _ckpt_write(checkpoint_dir, t, regs, {"n_hist": out_n})
        if n <= out_n[-2] * (1.0 + eps):
            break
    return pd.DataFrame({"t": np.asarray(out_t, dtype=np.int64),
                         "n_pairs": np.asarray(out_n)})


def effective_diameter(nf: pd.DataFrame, q: float = 0.9) -> float:
    """Interpolated q-effective diameter from a neighborhood function:
    the smallest (fractional) t with N(t) >= q * N(max) — the standard
    HyperANF readout."""
    n = nf["n_pairs"].to_numpy(dtype=np.float64)
    ts = nf["t"].to_numpy(dtype=np.float64)
    target = q * n[-1]
    i = int(np.searchsorted(n >= target, True))
    if i == 0 or n[i] == n[i - 1]:
        return float(ts[i])
    frac = (target - n[i - 1]) / (n[i] - n[i - 1])
    return float(ts[i - 1] + frac * (ts[i] - ts[i - 1]))

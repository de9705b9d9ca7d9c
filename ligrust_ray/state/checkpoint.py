"""Per-iteration checkpoint / resume (north_rule: every iteration persists
per-partition frontier + state with lineage metadata so jobs resume
mid-algorithm).

Layout (FIXTURES.md F6)::

    {dir}/{algo}/iter_{k:06d}/part-*.parquet   (node_id, frontier, <state...>)
    {dir}/{algo}/iter_{k:06d}/manifest.json

The manifest is written AFTER all partition files (atomic tmp+rename each),
so a manifest's existence with ``complete: true`` is the commit point; a
killed run leaves at most one incomplete iter dir, which resume ignores.
``loop_state`` carries driver-side loop scalars (e.g. PageRank's pending
``sum_of_delta``) so a resumed run is equivalent to an uninterrupted one.
"""

from __future__ import annotations

import json
import os
import re

import ray


def _iter_dir(root: str, algo: str, iteration: int) -> str:
    return os.path.join(root, algo, f"iter_{iteration:06d}")


def write_checkpoint(graph, root: str, algo: str, iteration: int,
                     state_names: list[str], metrics: dict,
                     loop_state: dict) -> str:
    d = _iter_dir(root, algo, iteration)
    os.makedirs(d, exist_ok=True)
    parts = ray.get([a.checkpoint.remote(d, state_names) for a in graph.actors])
    manifest = {
        "algo": algo,
        "iteration": iteration,
        "n": graph.n,
        "m": graph.m,
        "num_partitions": graph.nparts,
        "graph_dir": graph.graph_dir,
        "state_names": state_names,
        "partitions": parts,
        "metrics": metrics,
        "loop_state": loop_state,
        "complete": True,
    }
    tmp = os.path.join(d, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, "manifest.json"))
    return d


def latest_checkpoint(root: str, algo: str) -> dict | None:
    base = os.path.join(root, algo)
    if not os.path.isdir(base):
        return None
    best = None
    for name in os.listdir(base):
        m = re.fullmatch(r"iter_(\d{6})", name)
        if not m:
            continue
        mf = os.path.join(base, name, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                man = json.load(f)
            if man.get("complete") and (best is None
                                        or man["iteration"] > best["iteration"]):
                best = man
    return best


def restore_checkpoint(graph, manifest: dict) -> None:
    graph._view_cache = None
    d = _iter_dir(os.path.dirname(os.path.dirname(
        manifest["partitions"][0]["file"])), manifest["algo"],
        manifest["iteration"]) if manifest.get("partitions") else None
    # partition files record their own paths; restore from the iter dir
    d = os.path.dirname(manifest["partitions"][0]["file"])
    summaries = ray.get([
        a.restore.remote(d, manifest["state_names"]) for a in graph.actors])
    graph._absorb(summaries)

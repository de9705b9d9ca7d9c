"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1).

Generates the BASELINE.json ``input_hint`` table
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` with a Zipf-degree link structure, designated hub pages,
~2% dangling hrefs and ~1% duplicate hrefs — entirely from seeded RNGs, no
wall clock, no external data.

Determinism contract: page ``i`` is a pure function of ``(seed, i, urls)``
(per-page ``np.random.default_rng([seed, i])``), so generation can be
chunked/parallelised arbitrarily (Ray Data ``map_batches``) and still be
byte-identical. ``text`` is exactly ``extract.extract_page(html)[0]`` so the
corpus pins the byte-identical-extracted-text-per-url invariant.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ligrust_ray.functions.extract import extract_page

_WORDS = (
    "web graph page rank crawl link node edge frontier sparse dense kernel "
    "shuffle arrow batch actor stream block spill ray data engine vector "
    "hash partition skew hub zipf degree parquet column text index"
).split()

_EPOCH = _dt.datetime(2024, 1, 1)


def make_urls(n_pages: int, n_sites: int, seed: int) -> list[str]:
    """Global url universe — cheap, driver-side, broadcast to workers."""
    rng = np.random.default_rng([seed, 0xC0FFEE])
    site = rng.zipf(1.3, size=n_pages) % max(1, n_sites)
    per_site_seq: dict[int, int] = {}
    urls = []
    for s in site:
        k = per_site_seq.get(int(s), 0)
        per_site_seq[int(s)] = k + 1
        urls.append(f"https://site{int(s)}.example/p/{k}")
    return urls


def hub_indices(n_pages: int, n_hubs: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng([seed, 0x4B5])
    return rng.choice(n_pages, size=min(n_hubs, n_pages), replace=False)


def _page_html(i: int, urls: list[str], seed: int, is_hub: bool,
               max_degree: int, hub_degree: int,
               dangling_frac: float, dup_frac: float) -> bytes:
    n_pages = len(urls)
    rng = np.random.default_rng([seed, i])
    if is_hub:
        d = min(hub_degree, max(1, n_pages - 1))
    else:
        d = int(min(rng.zipf(1.2), max_degree))
    tgt_idx = rng.integers(0, n_pages, size=d)
    hrefs = [urls[j] for j in tgt_idx]
    dangle = rng.random(d) < dangling_frac
    for j in np.flatnonzero(dangle):
        hrefs[j] = f"https://void{int(rng.integers(0, 1000))}.example/missing/{i}-{j}"
    for j in np.flatnonzero(rng.random(d) < dup_frac):
        hrefs[j] = hrefs[int(rng.integers(0, d))]
    n_words = int(rng.integers(20, 120))
    para = " ".join(rng.choice(_WORDS, size=n_words).tolist())
    anchors = "".join(
        f'<a href="{h}">{_WORDS[k % len(_WORDS)]}</a> ' for k, h in enumerate(hrefs)
    )
    return (
        f"<html><head><title>page {i} of site</title>"
        f"<script>var x = {i};</script></head>"
        f"<body><h1>doc {i}</h1><p>{para}</p><div>{anchors}</div></body></html>"
    ).encode("utf-8")


def generate_pages_slice(lo: int, hi: int, urls: list[str], hubs: frozenset[int],
                         seed: int, max_degree: int, hub_degree: int,
                         dangling_frac: float, dup_frac: float) -> pa.Table:
    """Pages [lo, hi) as an Arrow table — the parallel unit of generation."""
    htmls, texts = [], []
    for i in range(lo, hi):
        h = _page_html(i, urls, seed, i in hubs, max_degree, hub_degree,
                       dangling_frac, dup_frac)
        htmls.append(h)
        texts.append(extract_page(h)[0])
    ts = pa.array(
        [_EPOCH + _dt.timedelta(seconds=i) for i in range(lo, hi)],
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pa.array(urls[lo:hi], type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * (hi - lo), type=pa.string()),
        }
    )


def _resolve(n_pages: int, seed: int, n_sites, n_hubs):
    if n_sites is None:
        n_sites = max(2, n_pages // 20)
    if n_hubs is None:
        n_hubs = max(1, n_pages // 2000)
    urls = make_urls(n_pages, n_sites, seed)
    hubs = frozenset(int(x) for x in hub_indices(n_pages, n_hubs, seed))
    return urls, hubs


def generate_pages(
    n_pages: int = 1000,
    seed: int = 42,
    n_sites: int | None = None,
    max_degree: int = 200,
    n_hubs: int | None = None,
    hub_degree: int = 1000,
    dangling_frac: float = 0.02,
    dup_frac: float = 0.01,
) -> pa.Table:
    """Whole corpus in memory (tests / small scales)."""
    urls, hubs = _resolve(n_pages, seed, n_sites, n_hubs)
    return generate_pages_slice(0, n_pages, urls, hubs, seed, max_degree,
                                hub_degree, dangling_frac, dup_frac)


def write_pages_corpus(
    out_dir: str,
    n_pages: int,
    seed: int = 42,
    rows_per_file: int = 10_000,
    parallel: bool = True,
    **kw,
) -> str:
    """Write the corpus as a directory of parquet part files.

    With ``parallel=True`` and an initialised Ray session, part files are
    generated by Ray tasks (page content is a pure function of (seed, i),
    so chunking does not change bytes). Skips parts that already exist, so
    a partial generation resumes.
    """
    os.makedirs(out_dir, exist_ok=True)
    n_sites = kw.pop("n_sites", None)
    n_hubs = kw.pop("n_hubs", None)
    urls, hubs = _resolve(n_pages, seed, n_sites, n_hubs)
    args = dict(seed=seed, max_degree=kw.pop("max_degree", 200),
                hub_degree=kw.pop("hub_degree", 1000),
                dangling_frac=kw.pop("dangling_frac", 0.02),
                dup_frac=kw.pop("dup_frac", 0.01))
    bounds = [(k, min(k + rows_per_file, n_pages))
              for k in range(0, n_pages, rows_per_file)]
    todo = [(idx, lo, hi) for idx, (lo, hi) in enumerate(bounds)
            if not os.path.exists(os.path.join(out_dir, f"part-{idx:05d}.parquet"))]
    if not todo:
        return out_dir

    def _write(idx: int, lo: int, hi: int, urls, hubs) -> None:
        t = generate_pages_slice(lo, hi, urls, hubs,
                                 args["seed"], args["max_degree"], args["hub_degree"],
                                 args["dangling_frac"], args["dup_frac"])
        tmp = os.path.join(out_dir, f".part-{idx:05d}.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, f"part-{idx:05d}.parquet"))

    if parallel and len(todo) > 1:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     ignore_reinit_error=True, logging_level="ERROR")
        remote_write = ray.remote(num_cpus=1)(_write)
        urls_ref = ray.put(urls)
        hubs_ref = ray.put(hubs)
        ray.get([remote_write.remote(idx, lo, hi, urls_ref, hubs_ref)
                 for idx, lo, hi in todo])
    else:
        for idx, lo, hi in todo:
            _write(idx, lo, hi, urls, hubs)
    return out_dir


def synth_edges_dataset(n_nodes: int, avg_degree: int = 32, seed: int = 42,
                        n_chunks: int = 64, hub_frac: float = 0.3,
                        hub_skew: float = 3.0):
    """Deterministic Zipf-skewed random digraph as a Ray Dataset of
    ``(src:int64, dst:int64)`` — the scaling-bench corpus (BASELINE.md §3):
    large enough that per-iteration gather compute dominates coordination,
    with a heavy-tailed in-degree (hub) distribution as the skew story.

    Chunk ``c`` is a pure function of ``(seed, c)`` — same graph at any
    parallelism. ``hub_frac`` of edges follow a power-law target
    distribution (heavy-tailed in-degree), the rest uniform. Hot target
    ids are scattered through a bijective affine permutation so hub load
    spreads across contiguous range partitions — mirroring the url-hash
    id assignment of the pages build (pipelines/build.py), which is the
    engine's actual skew mitigation; without it every hub lands in
    partition 0 and the hottest shard serializes each iteration.
    """
    import math

    import ray.data

    bounds = np.linspace(0, n_nodes, n_chunks + 1).astype(np.int64)
    mult = 2654435761
    while math.gcd(mult, n_nodes) != 1:
        mult += 2

    def gen(batch):
        outs, outd = [], []
        for c in batch["id"]:
            c = int(c)
            lo, hi = int(bounds[c]), int(bounds[c + 1])
            rng = np.random.default_rng([seed, c])
            deg = rng.poisson(avg_degree, size=hi - lo)
            src = np.repeat(np.arange(lo, hi, dtype=np.int64), deg)
            m = len(src)
            u = rng.random(m)
            hub = rng.random(m) < hub_frac
            raw = np.where(hub,
                           (n_nodes * u ** hub_skew).astype(np.int64),
                           (n_nodes * u).astype(np.int64))
            np.clip(raw, 0, n_nodes - 1, out=raw)
            dst = (raw * mult + 12345) % n_nodes   # bijective scatter
            outs.append(src)
            outd.append(dst)
        return {"src": np.concatenate(outs), "dst": np.concatenate(outd)}

    return (ray.data.range(n_chunks, override_num_blocks=n_chunks)
            .map_batches(gen, batch_format="numpy"))

"""CLI driver — the analog of the reference's clap interface
(/root/reference/src/cli.rs): ``parse/cc/bfs/prd`` become
``build/cc/bfs/pagerank`` plus the new ``lp``/``triangles``. Designed to be
launched with ``ray job submit -- python -m ligrust_ray.cli <cmd> ...`` on a
cluster; standalone it initialises a local session itself.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="ligrust_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="pages parquet -> CSR graph dir")
    b.add_argument("input", help="pages parquet path/dir, or text graph "
                                 "(AdjacencyGraph format) with --format=adjacency")
    b.add_argument("-o", "--output", required=True)
    b.add_argument("-p", "--partitions", type=int, default=32)
    b.add_argument("--format", choices=["pages", "adjacency", "edges",
                                        "csv"],
                   default="pages",
                   help="pages parquet corpus | AdjacencyGraph text | "
                        "edge parquet (src,dst) | edge CSV with "
                        "src,dst header")
    b.add_argument("--hub-threshold", type=int, default=None,
                   help="split in-lists longer than this across holder "
                        "partitions (skew mitigation; default: no split)")
    b.add_argument("--symmetrize", action="store_true",
                   help="undirected simplification (dedupe unordered "
                        "pairs, drop self-loops, store both directions) — "
                        "required before `kcore`")

    s = sub.add_parser("synth", help="generate the synthetic pages corpus")
    s.add_argument("-o", "--output", required=True)
    s.add_argument("-n", "--pages", type=int, default=10000)
    s.add_argument("--seed", type=int, default=42)

    for name in ("cc", "bfs", "pagerank", "lp", "kcore", "mis", "sssp",
                 "bc", "coloring"):
        a = sub.add_parser(name)
        a.add_argument("graph", help="graph dir from `build`")
        a.add_argument("-o", "--output", default=None,
                       help="write result parquet here")
        if name in ("cc", "bfs", "pagerank", "lp", "sssp"):
            a.add_argument("--checkpoint-dir", default=None)
            a.add_argument("--checkpoint-every", type=int, default=1)
            a.add_argument("--no-resume", action="store_true")
        else:                        # no checkpoint support — one source
            a.set_defaults(checkpoint_dir=None, checkpoint_every=1,
                           no_resume=False)   # of truth for the defaults
        if name in ("bfs", "sssp", "bc"):
            a.add_argument("-s", "--source", type=int, default=0)
        if name in ("pagerank", "lp"):
            a.add_argument("-i", "--max-iterations", type=int,
                           default=100 if name == "pagerank" else 20)
        if name == "kcore":
            a.add_argument("-k", "--k", type=int, default=5,
                           help="core order; build the graph with "
                                "--symmetrize first")
        if name in ("kcore", "mis", "bc", "coloring"):
            a.description = ("requires a graph built with --symmetrize "
                             "(undirected simple semantics)")

    t = sub.add_parser("triangles")
    t.add_argument("edges", help="edge parquet (src,dst) path/dir")
    t.add_argument("--per-node", action="store_true")
    t.add_argument("-o", "--output", default=None)

    tr = sub.add_parser("truss", help="median-threshold truss peel "
                        "(a, b, died_round) over an edge table; "
                        "--checkpoint-dir makes the round loop resumable")
    tr.add_argument("edges", help="edge parquet (src,dst) path/dir")
    tr.add_argument("--rounds", type=int, default=16)
    tr.add_argument("--threshold", type=int, default=None)
    tr.add_argument("--checkpoint-dir", dest="tr_ckpt", default=None)
    tr.add_argument("-o", "--output", default=None)

    lv = sub.add_parser("louvain", help="hierarchical Louvain to the "
                        "modularity fixed point over the events graph "
                        "of an sf dir")
    lv.add_argument("sf_dir", help="dir containing events.parquet")
    lv.add_argument("--max-levels", type=int, default=6)
    lv.add_argument("--checkpoint-dir", dest="lv_ckpt", default=None)
    lv.add_argument("-o", "--output", default=None)

    bt = sub.add_parser("bowtie",
                        help="Broder bow-tie region census of a directed "
                             "edge table (core/in/out/other)")
    bt.add_argument("edges", help="edge parquet (src,dst) path/dir")
    bt.add_argument("-p", "--partitions", type=int, default=4)
    bt.add_argument("-o", "--output", default=None,
                    help="write per-node (node_id, cls) parquet")

    hb = sub.add_parser("hyperball",
                        help="HLL neighborhood-size estimates per node")
    hb.add_argument("edges", help="edge parquet (src,dst) path/dir")
    hb.add_argument("-t", "--radius", type=int, default=2)
    hb.add_argument("-o", "--output", default=None,
                    help="write per-node (node, estimate) parquet")
    hb.add_argument("--checkpoint-dir", default=None,
                    help="persist registers per round; rerun resumes "
                         "after the newest complete round")
    hb.add_argument("--diameter", action="store_true",
                    help="iterate to the neighborhood-function fixed "
                         "point and report the 90%% effective diameter "
                         "instead of fixed-t per-node balls")

    d = sub.add_parser("dump", help="graph dir -> reference-format .bin "
                                    "(graph.rs:322-357 layout)")
    d.add_argument("graph", help="graph dir from `build`")
    d.add_argument("-o", "--output", required=True, help=".bin path")

    ib = sub.add_parser("import-bin", help="reference-format .bin -> "
                                           "partitioned CSR graph dir")
    ib.add_argument("input", help=".bin path")
    ib.add_argument("-o", "--output", required=True)
    ib.add_argument("-p", "--partitions", type=int, default=32)

    ex = sub.add_parser("export", help="clean a documents corpus and "
                        "write resumable key-hashed parquet shards "
                        "(rerun skips committed shards)")
    ex.add_argument("sf_dir", help="dir containing documents.parquet")
    ex.add_argument("-o", "--output", required=True)
    ex.add_argument("--shards", type=int, default=64)
    ex.add_argument("--raw", action="store_true",
                    help="skip the cleaning pipeline; export as-is")
    ex.add_argument("--no-resume", dest="ex_resume", action="store_false")

    iw = sub.add_parser("import-warc", help="WARC / WARC.gz crawl "
                        "archives (Common Crawl's native format) -> "
                        "resumable pages parquet shards "
                        "(url, warc_ts, html, text, lang)")
    iw.add_argument("input", nargs="+", help=".warc/.warc.gz file(s) or "
                    "dir(s)")
    iw.add_argument("-o", "--output", required=True)
    iw.add_argument("--shards", type=int, default=64)
    iw.add_argument("--no-resume", dest="iw_resume", action="store_false")

    ij = sub.add_parser("import-jsonl", help="NDJSON docs -> resumable "
                        "key-hashed documents parquet shards")
    ij.add_argument("input", nargs="+", help="jsonl file(s)/dir(s)")
    ij.add_argument("-o", "--output", required=True)
    ij.add_argument("--shards", type=int, default=64)
    ij.add_argument("--text-field", default="text")
    ij.add_argument("--id-field", default="doc_id")
    ij.add_argument("--no-resume", dest="ij_resume", action="store_false")

    pp = sub.add_parser("prepare", help="full LM-corpus pipeline: "
                        "quality clean -> dedup -> deterministic "
                        "training-order shuffle -> pos-ordered "
                        "resumable shards")
    pp.add_argument("sf_dir", help="dir containing documents.parquet")
    pp.add_argument("-o", "--output", required=True)
    pp.add_argument("--method", choices=["exact", "minhash", "simhash"],
                    default="exact", help="dedup method")
    pp.add_argument("--no-resume", dest="pp_resume",
                    action="store_false")

    dd = sub.add_parser("dedup", help="dedup a documents corpus and "
                        "export the survivors as resumable shards")
    dd.add_argument("sf_dir", help="dir containing documents.parquet")
    dd.add_argument("-o", "--output", required=True)
    dd.add_argument("--method", choices=["exact", "minhash", "simhash"],
                    default="exact")
    dd.add_argument("--shards", type=int, default=64)
    dd.add_argument("--no-resume", dest="dd_resume", action="store_false")

    se = sub.add_parser("shuffle-export", help="deterministic "
                        "training-order shuffle -> pos-ordered resumable "
                        "shards (shard = pos % 8, the docs_shuffle spec)")
    se.add_argument("sf_dir", help="dir containing documents.parquet")
    se.add_argument("-o", "--output", required=True)
    se.add_argument("--no-resume", dest="se_resume", action="store_false")

    sl = sub.add_parser("select", help="DSIR importance-resample a "
                        "documents corpus against a target slice "
                        "(dataops/dsir.py) and export the selected docs "
                        "as resumable shards")
    sl.add_argument("sf_dir", help="dir containing documents.parquet")
    sl.add_argument("-o", "--output", required=True)
    sl.add_argument("-k", "--keep", type=int, required=True,
                    help="number of documents to keep (top-K by score)")
    sl.add_argument("--target", default="lang=en",
                    help="col=value defining the target slice")
    sl.add_argument("--shards", type=int, default=64)
    sl.add_argument("--no-resume", dest="sl_resume", action="store_false")

    cs = sub.add_parser("corpus-stats", help="one-line JSON accounting "
                        "for a documents corpus")
    cs.add_argument("input", help="sf dir containing documents.parquet, "
                    "a documents parquet path, or a resumable sink dir")

    args = p.parse_args(argv)
    _ray_up(args.num_cpus)
    import ray
    import ray.data

    if args.cmd == "synth":
        from ligrust_ray.sources.synth import write_pages_corpus

        write_pages_corpus(args.output, args.pages, seed=args.seed)
        print(json.dumps({"written": args.output, "pages": args.pages}))
        return 0

    if args.cmd == "export":
        import os

        from ligrust_ray.pipelines import queries as Q
        from ligrust_ray.sources.resumable_sink import write_partitioned

        docs = ray.data.read_parquet(
            os.path.join(args.sf_dir, "documents.parquet"))
        if args.raw:
            ds = docs
        else:
            # q_docs_clean returns the KEPT doc_ids (the contract shape);
            # the export must carry the documents themselves — semi-join
            # the full rows back onto the kept set
            from ligrust_ray.stages.shuffle import hash_join

            body_cols = [c for c in docs.schema().names if c != "doc_id"]
            ds = hash_join(docs, Q.q_docs_clean(args.sf_dir),
                           on="doc_id", l_cols=body_cols, r_cols=[])
        stats = write_partitioned(ds, args.output, key="doc_id",
                                  num_shards=args.shards,
                                  resume=args.ex_resume)
        print(json.dumps({
            "output": args.output, "shards": int(len(stats)),
            "rows_written": int(stats["rows"].sum()),
            "shards_skipped": int(stats["skipped"].sum())}))
        return 0

    if args.cmd == "prepare":
        from ligrust_ray.pipelines.prepare import prepare_corpus

        res = prepare_corpus(args.sf_dir, args.output,
                             method=args.method, resume=args.pp_resume)
        res.pop("timings", None)     # CLI output shape unchanged
        print(json.dumps(res))
        return 0

    if args.cmd == "import-warc":
        from ligrust_ray.sources.resumable_sink import write_partitioned
        from ligrust_ray.sources.warc import warc_to_pages

        pages = warc_to_pages(args.input).materialize()
        stats = write_partitioned(pages, args.output, key="url",
                                  num_shards=args.shards,
                                  resume=args.iw_resume)
        print(json.dumps({
            "n_pages": int(pages.count()),
            "rows_written": int(stats["rows"].sum()),
            "output": args.output, "shards": int(len(stats)),
            "shards_skipped": int(stats["skipped"].sum())}))
        return 0

    if args.cmd == "select":
        import os

        import pyarrow as pa

        from ligrust_ray.dataops import dsir
        from ligrust_ray.sources.resumable_sink import write_partitioned
        from ligrust_ray.stages.shuffle import semi_join

        col, eq, val = args.target.partition("=")
        if not eq or not col or not val:
            raise SystemExit(f"--target must be col=value, got "
                             f"{args.target!r}")
        docs = ray.data.read_parquet(
            os.path.join(args.sf_dir, "documents.parquet")).materialize()
        schema = docs.schema()
        if col not in schema.names:
            raise SystemExit(f"--target column {col!r} not in corpus "
                             f"(has {schema.names})")
        import pyarrow as _pa

        if schema.base_schema.field(col).type != _pa.string():
            raise SystemExit(f"--target column {col!r} must be a string "
                             "column (e.g. lang, source)")
        n_docs = docs.count()
        # collapse duplicate doc_id rows first (content-addressed imports)
        # — duplicates would both skew the top-K (one slot per physical
        # row) and fan out through the semi-join into the export
        from ligrust_ray.dataops import dedup as D

        docs = D.unique_by_id(docs).materialize()
        top = dsir.dsir_sample(docs, k=args.keep,
                               target_col=col, target_value=val)
        # bounded: K rows — semi-join keeps full doc rows for the export
        selected = semi_join(
            docs, ray.data.from_arrow(top.select(["doc_id"])),
            l_on="doc_id", r_on="doc_id",
            r_key_type=pa.int64()).materialize()
        stats = write_partitioned(selected, args.output, key="doc_id",
                                  num_shards=args.shards,
                                  resume=args.sl_resume)
        print(json.dumps({
            "target": args.target, "n_docs": int(n_docs),
            "n_selected": int(selected.count()),
            "min_score": int(top.column("score")[-1].as_py())
            if top.num_rows else None,
            "rows_written": int(stats["rows"].sum()),
            "output": args.output, "shards": int(len(stats)),
            "shards_skipped": int(stats["skipped"].sum())}))
        return 0

    if args.cmd == "dedup":
        import os

        import pyarrow as pa

        from ligrust_ray.dataops import dedup as D
        from ligrust_ray.sources.resumable_sink import write_partitioned
        from ligrust_ray.stages.shuffle import semi_join

        docs = ray.data.read_parquet(
            os.path.join(args.sf_dir, "documents.parquet")).materialize()
        n_docs = docs.count()
        # collapse duplicate rows per doc_id first (content-addressed
        # imports), then drop non-survivors of the chosen method
        docs = D.unique_by_id(docs).materialize()
        survivors = semi_join(
            docs, D.survivor_ids(docs, args.method),
            l_on="doc_id", r_on="doc_id",
            r_key_type=pa.int64()).materialize()
        n_kept = survivors.count()       # independent of resume-skips
        stats = write_partitioned(survivors, args.output, key="doc_id",
                                  num_shards=args.shards,
                                  resume=args.dd_resume)
        print(json.dumps({
            "method": args.method, "n_docs": int(n_docs),
            "n_kept": int(n_kept),
            "rows_written": int(stats["rows"].sum()),
            "output": args.output, "shards": int(len(stats)),
            "shards_skipped": int(stats["skipped"].sum())}))
        return 0

    if args.cmd == "shuffle-export":
        import os

        from ligrust_ray.pipelines import queries as Q
        from ligrust_ray.sources.resumable_sink import write_partitioned
        from ligrust_ray.stages.shuffle import hash_join

        docs = ray.data.read_parquet(
            os.path.join(args.sf_dir, "documents.parquet")).materialize()
        body_cols = [c for c in docs.schema().names if c != "doc_id"]
        # duplicate doc_ids (content-addressed JSONL imports of repeated
        # texts) would cross-product through the join and break the
        # strictly-increasing-pos shard invariant — refuse loudly
        from ligrust_ray.stages.shuffle import distinct

        n_docs = docs.count()
        if distinct(docs.select_columns(["doc_id"]),
                    ["doc_id"]).count() != n_docs:
            print(json.dumps({"error": "duplicate doc_ids in corpus — "
                              "run `dedup` first (it collapses "
                              "duplicate-id rows)"}))
            return 1
        ds = hash_join(docs, Q.q_docs_shuffle(args.sf_dir),
                       on="doc_id", l_cols=body_cols,
                       r_cols=["pos", "shard"])
        stats = write_partitioned(ds, args.output, key="doc_id",
                                  shard_col="shard", order_by="pos",
                                  resume=args.se_resume)
        print(json.dumps({
            "output": args.output, "shards": int(len(stats)),
            "rows_written": int(stats["rows"].sum()),
            "shards_skipped": int(stats["skipped"].sum())}))
        return 0

    if args.cmd == "corpus-stats":
        import os

        import pyarrow as pa

        from ligrust_ray.stages import shuffle

        path = args.input
        if os.path.isdir(path):
            if os.path.exists(os.path.join(path, "documents.parquet")):
                path = os.path.join(path, "documents.parquet")
            elif any(n.startswith("shard=") for n in os.listdir(path)):
                from ligrust_ray.sources.resumable_sink import \
                    read_partitioned

                docs = read_partitioned(path)
                path = None
        if path is not None:
            docs = ray.data.read_parquet(path)

        def pre(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = (t.column("n_chars").cast(pa.int64())
                 if "n_chars" in t.schema.names
                 else pc.utf8_length(t.column("text")).cast(pa.int64()))
            return pa.table({"lang": t.column("lang"), "n_chars": n,
                             "source": t.column("source")})

        keyed = docs.map_batches(pre, batch_format="pyarrow")
        by_lang = shuffle.grouped_agg(
            keyed, ["lang"], {"n_docs": (None, "count"),
                              "n_chars": ("n_chars", "sum")}).to_pandas()
        n_sources = shuffle.distinct(keyed, ["source"]).count()
        print(json.dumps({
            "n_docs": int(by_lang["n_docs"].sum()),
            "n_chars": int(by_lang["n_chars"].sum()),
            "n_sources": int(n_sources),
            "langs": {r["lang"]: int(r["n_docs"])
                      for _, r in by_lang.sort_values("lang").iterrows()}}))
        return 0

    if args.cmd == "import-jsonl":
        from ligrust_ray.sources.jsonl import read_documents_jsonl
        from ligrust_ray.sources.resumable_sink import write_partitioned

        docs = read_documents_jsonl(
            args.input if len(args.input) > 1 else args.input[0],
            text_field=args.text_field, id_field=args.id_field)
        stats = write_partitioned(docs, args.output, key="doc_id",
                                  num_shards=args.shards,
                                  resume=args.ij_resume)
        print(json.dumps({
            "output": args.output, "shards": int(len(stats)),
            "rows_written": int(stats["rows"].sum()),
            "shards_skipped": int(stats["skipped"].sum())}))
        return 0

    if args.cmd == "build":
        from ligrust_ray.pipelines.build import (build_graph_from_edges,
                                                 build_graph_from_pages)

        if args.format == "pages":
            man = build_graph_from_pages(args.input, args.output,
                                         num_partitions=args.partitions,
                                         hub_in_threshold=args.hub_threshold,
                                         symmetrize=args.symmetrize)
        elif args.format == "adjacency":
            import os

            from ligrust_ray.sources.adjacency_text import (
                adjacency_text_to_edges, read_adjacency_text,
                stream_edges_dataset)

            if os.path.getsize(args.input) > (256 << 20):
                # big text graphs stream in bounded-memory chunks
                with open(args.input, "rb") as f:
                    head = f.read(256).split()
                n = int(head[1])
                e = stream_edges_dataset(args.input)
            else:
                e = adjacency_text_to_edges(args.input)
                n = read_adjacency_text(args.input)[0]
            man = build_graph_from_edges(e, args.output, n=n,
                                         num_partitions=args.partitions,
                                         symmetrize=args.symmetrize)
        else:
            if args.format == "csv":
                import pyarrow as pa

                e = ray.data.read_csv(args.input).map_batches(
                    lambda t: pa.table(
                        {"src": t.column("src").cast(pa.int64()),
                         "dst": t.column("dst").cast(pa.int64())}),
                    batch_format="pyarrow")
            else:
                e = ray.data.read_parquet(args.input)
            man = build_graph_from_edges(e, args.output,
                                         num_partitions=args.partitions,
                                         hub_in_threshold=args.hub_threshold,
                                         symmetrize=args.symmetrize)
        print(json.dumps({"n": man["n"], "m": man["m"],
                          "partitions": man["num_partitions"]}))
        return 0

    if args.cmd == "dump":
        from ligrust_ray.sources.ligra_binary import dump_graph_dir

        info = dump_graph_dir(args.graph, args.output)
        print(json.dumps(info))
        return 0

    if args.cmd == "import-bin":
        from ligrust_ray.sources.ligra_binary import binary_to_graph_dir

        man = binary_to_graph_dir(args.input, args.output,
                                  num_partitions=args.partitions)
        print(json.dumps({"n": man["n"], "m": man["m"],
                          "partitions": man["num_partitions"]}))
        return 0

    if args.cmd == "hyperball":
        from ligrust_ray.algos.hyperball import (effective_diameter,
                                                 hyperball_estimates,
                                                 neighborhood_function)

        e = ray.data.read_parquet(args.edges)
        if args.diameter:
            nf = neighborhood_function(e, checkpoint_dir=args.checkpoint_dir)
            print(json.dumps({
                "rounds": int(nf["t"].max()),
                "n_pairs": round(float(nf["n_pairs"].iloc[-1]), 1),
                "effective_diameter_90": round(effective_diameter(nf), 3),
                "neighborhood_function": [round(float(x), 1)
                                          for x in nf["n_pairs"]]}))
            return 0
        est = hyperball_estimates(e, t=args.radius,
                                   checkpoint_dir=args.checkpoint_dir)
        if args.output:
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(est, preserve_index=False),
                           args.output)
        print(json.dumps({
            "t": args.radius, "nodes": int(len(est)),
            "mean_ball": round(float(est["estimate"].mean()), 3),
            "max_ball": round(float(est["estimate"].max()), 3),
            "sum_balls": round(float(est["estimate"].sum()), 3)}))
        return 0

    if args.cmd == "bowtie":
        import hashlib
        import os
        import tempfile

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from ligrust_ray.algos.scc import bowtie_labels
        from ligrust_ray.pipelines.build import build_graph_from_edges
        from ligrust_ray.state.graph import DistGraph

        e = ray.data.read_parquet(args.edges)

        def _mx(v):
            # explicit None check: a legitimate max id of 0 is falsy
            v = v.as_py()
            return -1 if v is None else int(v)

        mx = e.map_batches(
            lambda t: pa.table({"m": pa.array(
                [max(_mx(pc.max(t.column("src"))),
                     _mx(pc.max(t.column("dst"))))],
                type=pa.int64())}),
            batch_format="pyarrow").to_pandas()
        n = int(mx["m"].max()) + 1 if len(mx) else 0
        # cache key folds every contained parquet file's (path, mtime, size):
        # a directory's own stat does not change when a file inside it is
        # rewritten in place
        parts = [os.path.abspath(args.edges), str(args.partitions)]
        if os.path.isdir(args.edges):
            for root, _dirs, files in sorted(os.walk(args.edges)):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    parts.append(f"{p}:{st.st_mtime_ns}:{st.st_size}")
        else:
            st = os.stat(args.edges)
            parts.append(f"{st.st_mtime_ns}:{st.st_size}")
        key = hashlib.md5(":".join(parts).encode()).hexdigest()[:12]
        base = os.path.join(tempfile.gettempdir(), f"ligr_bowtie_{key}")
        graphs = []
        for name, flip in (("fwd", False), ("rev", True)):
            gd = os.path.join(base, name)
            if not os.path.exists(os.path.join(gd, "manifest.json")):
                ds = e if not flip else e.map_batches(
                    lambda t: pa.table({"src": t.column("dst"),
                                        "dst": t.column("src")}),
                    batch_format="pyarrow")
                build_graph_from_edges(ds, gd, n=n,
                                       num_partitions=args.partitions)
            graphs.append(DistGraph.load(gd))
        cls = bowtie_labels(graphs[0], graphs[1])
        if args.output:
            import pyarrow.parquet as pq

            pq.write_table(pa.table({
                "node_id": pa.array(np.arange(n, dtype=np.int64)),
                "cls": pa.array(cls.astype(object), type=pa.string())}),
                args.output)
        names, counts = np.unique(cls, return_counts=True)
        print(json.dumps({"n": n,
                          **{str(k): int(v)
                             for k, v in zip(names, counts)}}))
        return 0

    if args.cmd == "triangles":
        from ligrust_ray.algos.triangles import triangle_count

        e = ray.data.read_parquet(args.edges)
        if args.per_node:
            total, pern = triangle_count(e, per_node=True)
            if args.output:
                pern.write_parquet(args.output)
        else:
            total = triangle_count(e)
        print(json.dumps({"triangles": int(total)}))
        return 0

    if args.cmd == "truss":
        import pyarrow as pa
        import pyarrow.compute as pc

        from ligrust_ray.algos.truss import truss_peel

        e = ray.data.read_parquet(args.edges)
        out = truss_peel(e, rounds=args.rounds,
                         threshold=args.threshold,
                         checkpoint_dir=args.tr_ckpt).materialize()
        died = out.map_batches(
            lambda t: pa.table({
                "survived": pa.array([int(pc.sum(pc.cast(pc.equal(
                    t.column("died_round"), 0), pa.int64())).as_py()
                    or 0)], type=pa.int64()),
                "rounds": pa.array([int(pc.max(
                    t.column("died_round")).as_py() or 0)],
                    type=pa.int64())}),
            batch_format="pyarrow").to_pandas()
        if args.output:
            out.write_parquet(args.output)
        print(json.dumps({
            "edges": int(out.count()),
            "survivors": int(died["survived"].sum()),
            "rounds_used": int(died["rounds"].max()) if len(died) else 0,
            "checkpoint_dir": args.tr_ckpt}))
        return 0

    if args.cmd == "louvain":
        from ligrust_ray.pipelines.queries import louvain_full

        ds, levels, trace = louvain_full(args.sf_dir,
                                         max_levels=args.max_levels,
                                         checkpoint_dir=args.lv_ckpt)
        ds = ds.materialize()
        if args.output:
            ds.write_parquet(args.output)
        print(json.dumps({
            "nodes": int(ds.count()), "levels": int(levels),
            "q_num_trace": [int(x) for x in trace]}))
        return 0

    from ligrust_ray.state.graph import DistGraph

    g = DistGraph.load(args.graph)
    ck = dict(checkpoint_dir=args.checkpoint_dir,
              checkpoint_every=args.checkpoint_every,
              resume=not args.no_resume)
    if args.cmd == "cc":
        from ligrust_ray.algos.cc import cc

        res = cc(g, **ck)
    elif args.cmd == "bfs":
        from ligrust_ray.algos.bfs import bfs

        res = bfs(g, args.source, **ck)
    elif args.cmd == "pagerank":
        from ligrust_ray.algos.pagerank import page_rank_delta

        res = page_rank_delta(g, max_iterations=args.max_iterations, **ck)
    elif args.cmd == "kcore":
        from ligrust_ray.algos.kcore import kcore

        res = kcore(g, args.k)
    elif args.cmd == "mis":
        from ligrust_ray.algos.mis import mis

        res = mis(g)
    elif args.cmd == "sssp":
        from ligrust_ray.algos.bellman_ford import bellman_ford

        res = bellman_ford(g, source=args.source, **ck)
    elif args.cmd == "bc":
        from ligrust_ray.algos.betweenness import betweenness

        res = betweenness(g, root=args.source)
    elif args.cmd == "coloring":
        from ligrust_ray.algos.coloring import color_graph

        res = color_graph(g)
    else:
        from ligrust_ray.algos.labelprop import label_propagation

        res = label_propagation(g, max_iterations=args.max_iterations, **ck)
    if args.output:
        g.result_dataset(res["state_names"]).write_parquet(args.output)
    print(json.dumps({k: v for k, v in res.items() if k != "state_names"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark harness (driver contract).

Default: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N}

``--scaling``: runs PageRank-to-convergence on the SAME synthetic pages
graph at two parallelism levels in fresh subprocesses (num_cpus=8 then 32 —
the sandbox stand-in for N vs 4N Ray nodes, BASELINE.md §3), with the
partition count FIXED across both, and reports both throughputs plus the
scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import warnings

warnings.filterwarnings("ignore")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "60000"))
PARTITIONS = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "32"))


def _init(num_cpus: int):
    import ray
    import ray.data

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False


SCALE_NODES = int(os.environ.get("GRAFT_SCALE_NODES", str(1 << 21)))
SCALE_DEG = int(os.environ.get("GRAFT_SCALE_DEG", "48"))


def _edges_graph_dir(n_nodes: int, avg_deg: int) -> str:
    """Synthetic Zipf edge graph for the scaling runs — big enough that
    per-iteration gather compute dominates wave dispatch; cached on disk."""
    from ligrust_ray.pipelines.build import build_graph_from_edges
    from ligrust_ray.sources.synth import synth_edges_dataset

    gdir = f"/tmp/ligr_bench/egraph_v2_{n_nodes}_{avg_deg}_p{PARTITIONS}"
    if not os.path.exists(os.path.join(gdir, "manifest.json")):
        edges = synth_edges_dataset(n_nodes, avg_deg, seed=42)
        build_graph_from_edges(edges, gdir, n=n_nodes,
                               num_partitions=PARTITIONS)
    return gdir


def _pages_graph_dir(n_pages: int) -> str:
    """Synthesize the bench corpus + build the CSR once; cached on disk."""
    from ligrust_ray.pipelines.build import build_graph_from_pages
    from ligrust_ray.sources.synth import write_pages_corpus

    corpus = f"/tmp/ligr_bench/pages_{n_pages}"
    gdir = f"/tmp/ligr_bench/graph_{n_pages}_p{PARTITIONS}"
    write_pages_corpus(corpus, n_pages, seed=42)
    if not os.path.exists(os.path.join(gdir, "manifest.json")):
        build_graph_from_pages(corpus, gdir, num_partitions=PARTITIONS)
    return gdir


def run_headline(num_cpus: int) -> dict:
    """Build + the four algorithms + triangles on the bench pages graph,
    plus doc ops over $GRAFT_SF_DIR tables."""
    import ray

    from ligrust_ray.algos.bfs import bfs
    from ligrust_ray.algos.cc import cc
    from ligrust_ray.algos.labelprop import label_propagation
    from ligrust_ray.algos.pagerank import page_rank_classic, page_rank_delta
    from ligrust_ray.state.graph import DistGraph

    import ray.data

    # warm the Ray Data worker pool once (a cluster serving pipelines is
    # warm; the first map task otherwise pays ~2-4s of process startup
    # that would be misattributed to whichever query runs first)
    ray.data.range(1000).map_batches(lambda b: b).materialize()

    q: dict[str, float] = {}
    t0 = time.perf_counter()
    gdir = _pages_graph_dir(BENCH_PAGES)
    q["build_graph"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    g = DistGraph.load(gdir)
    q["load_graph"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    page_rank_delta(g, max_iterations=100)   # reference-exact variant (2 rounds)
    q["pagerank_reference"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pr = page_rank_classic(g, max_iterations=100)  # iterative-to-convergence
    q["pagerank"] = time.perf_counter() - t0
    pr_iters, pr_edges = pr["iterations"], pr["edges_scanned"]

    t0 = time.perf_counter()
    cc(g)
    q["cc"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    bfs(g, 0)
    q["bfs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    label_propagation(g, max_iterations=10)
    q["labelprop"] = time.perf_counter() - t0

    import ray.data

    from ligrust_ray.algos.triangles import triangle_count
    from ligrust_ray.dataops import dedup, textstats
    from ligrust_ray.pipelines import queries as Q

    t0 = time.perf_counter()
    triangle_count(Q.events_edges_ds(SF_DIR))  # n derived from the data
    q["triangles_events"] = time.perf_counter() - t0

    # scale path: bucketed wedge<->edge hash join — no broadcast of the
    # oriented edge set (forced; auto mode switches above 4M edges)
    t0 = time.perf_counter()
    triangle_count(Q.events_edges_ds(SF_DIR), probe_mode="bucketed")
    q["triangles_events_bucketed"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.truss import truss_peel

    # median-threshold truss peel (single-task path below 2^22 edges)
    truss_peel(Q.events_edges_ds(SF_DIR)).materialize()
    q["events_truss"] = time.perf_counter() - t0

    docs = Q._docs(SF_DIR)   # byte-sized block count (see queries._read_sized)
    t0 = time.perf_counter()
    docs.map_batches(textstats.doc_stats_batch,
                     batch_format="pyarrow").materialize()
    q["docs_stats"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup.exact_dedup(docs).materialize()
    q["docs_exact_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup.minhash_lsh_dedup(docs).materialize()
    q["docs_minhash_dedup"] = time.perf_counter() - t0

    from ligrust_ray.dataops import ann

    emb = Q._emb(SF_DIR)
    t0 = time.perf_counter()
    ann.knn_bruteforce(emb, query_ids=[0, 1, 2, 3, 4], k=10).materialize()
    q["emb_knn"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ann.knn_ivf(emb, query_ids=[0, 1, 2, 3, 4], k=10).materialize()
    q["emb_knn_ivf"] = time.perf_counter() - t0

    # round-3 operators
    t0 = time.perf_counter()
    from ligrust_ray.algos.kcore import kcore

    gsym = Q.events_sym_graph(SF_DIR)
    kcore(gsym, 5)
    q["events_kcore"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.radii import radii

    radii(g, k=8)          # bit-parallel multi-source BFS (reduce="or")
    q["radii"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.bellman_ford import bellman_ford

    # weighted edgeMap over the full pages graph; includes the one-time
    # per-shard derived-weight computation (state/weights.py)
    bellman_ford(g, source=0)
    q["sssp"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.betweenness import betweenness

    betweenness(gsym)      # sum-edgeMap both directions (Brandes)
    q["events_bc"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.mis import mis

    mis(gsym)              # Luby rounds, strict-local-min select
    q["events_mis"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.forest import spanning_forest

    spanning_forest(gsym)   # CC roots + multi-source BFS parents
    q["events_forest"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.densest import densest_subgraph

    densest_subgraph(gsym)   # Charikar/Bahmani batched peeling
    q["events_densest"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    # JP coloring, single-task fast path below 2^22 sym edges (the
    # per-round wave dispatch dominated here — was 6-7.5 s kernel-wave;
    # sf0.1 needs ~178 rounds, past the contract oracle's 100-unroll cap,
    # hence max_rounds=400 like the kernel-path bench before it)
    from ligrust_ray.algos.coloring import (COLOR_SINGLE_TASK_MAX,
                                            color_graph, color_graph_fast)

    if 2 * Q._events_rows(SF_DIR) <= COLOR_SINGLE_TASK_MAX:
        color_graph_fast(Q.events_n(SF_DIR),
                         Q._sym_simple(SF_DIR).materialize(),
                         max_rounds=400)
    else:
        color_graph(gsym, max_rounds=400)
    q["events_coloring"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.scc import scc

    # FB-Trim SCC over the directed events graph + its reversed twin
    # (includes the one-time reversed-graph build on a cold /tmp)
    scc(Q.events_graph(SF_DIR), Q.events_rev_graph(SF_DIR))
    q["events_scc"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.hits import hits

    hits(Q.events_graph(SF_DIR), Q.events_rev_graph(SF_DIR))
    q["events_hits"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_lcc(SF_DIR).materialize()
    q["events_lcc"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_common_neighbors(SF_DIR).materialize()
    q["events_common_neighbors"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ligrust_ray.algos.ppr import personalized_page_rank

    personalized_page_rank(Q.events_graph(SF_DIR), source=0, rounds=4)
    q["events_ppr"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup.simhash_dup_pairs(docs).materialize()
    q["docs_simhash_dupes"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup.simhash_clusters(docs).materialize()
    q["docs_simhash_clusters"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup.line_dedup(docs).materialize()
    q["docs_line_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    docs.map_batches(textstats.pii_scrub_batch,
                     batch_format="pyarrow").materialize()
    q["docs_pii_scrub"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup.decontaminate(docs, eval_mod=10).materialize()
    q["docs_decontaminate"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_top_tokens(SF_DIR)
    q["docs_top_tokens"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_tfidf(SF_DIR).materialize()
    q["docs_tfidf"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_pages_anchor_text(SF_DIR).materialize()
    q["pages_anchor_text"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_walks(SF_DIR).materialize()
    q["events_walks"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_skipgrams(SF_DIR).materialize()
    q["events_skipgrams"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_props_agg(SF_DIR).materialize()
    q["events_props_agg"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_link_pred(SF_DIR).materialize()
    q["events_link_pred"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_pack(SF_DIR).materialize()
    q["docs_pack"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_stratified_sample(SF_DIR).materialize()
    q["docs_stratified_sample"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_oov(SF_DIR).materialize()
    q["docs_oov"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_walks_nb(SF_DIR).materialize()
    q["events_walks_nb"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_neighbor_sample(SF_DIR).materialize()
    q["events_neighbor_sample"] = time.perf_counter() - t0

    # the pages-graph disk artifact is shared by the whole pages_* family;
    # time its (re)build separately so the first pages query doesn't absorb
    # a one-time cost the other family members then skip (misattribution
    # measured at ~8s cold vs the 2s steady-state pages_degree)
    t0 = time.perf_counter()
    Q._pages_graph(SF_DIR)
    q["pages_graph_artifact"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_pages_degree(SF_DIR).materialize()
    q["pages_degree"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_pages_reciprocity(SF_DIR)
    q["pages_reciprocity"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_rolling(SF_DIR).materialize()
    q["events_rolling"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_walk_vocab(SF_DIR).materialize()
    q["events_walk_vocab"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_edge_holdout(SF_DIR).materialize()
    q["events_edge_holdout"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_lang_confusion(SF_DIR).materialize()
    q["docs_lang_confusion"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_customer_revenue(SF_DIR).materialize()
    q["customer_revenue"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_supplier_nation_revenue(SF_DIR).materialize()
    q["supplier_nation_revenue"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_dup_bigrams(SF_DIR).materialize()
    q["docs_dup_bigrams"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_part_brand_revenue(SF_DIR).materialize()
    q["part_brand_revenue"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_assortativity(SF_DIR)
    q["events_assortativity"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_lineitem_monthly(SF_DIR).materialize()
    q["lineitem_monthly"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_component_sizes(SF_DIR).materialize()
    q["events_component_sizes"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_community_stats(SF_DIR).materialize()
    q["events_community_stats"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_daily(SF_DIR).materialize()
    q["events_daily"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_dup_families(SF_DIR).materialize()
    q["docs_dup_families"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_char_classes(SF_DIR).materialize()
    q["docs_char_classes"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_global_clustering(SF_DIR)
    q["events_global_clustering"] = time.perf_counter() - t0

    # session-3e operators: maximal matching, semi/anti join, top-K,
    # rollup, argmax window, per-group quantiles
    t0 = time.perf_counter()
    from ligrust_ray.algos.matching import maximal_matching

    # auto mode: single-task fast path at this scale (the distributed
    # per-round shuffle plan is contract-tested at sf0.01)
    maximal_matching(Q.events_matching_pairs(SF_DIR)).materialize()
    q["events_matching"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_customers_no_urgent(SF_DIR).materialize()
    q["customers_no_urgent"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_parts_returned_heavy(SF_DIR).materialize()
    q["parts_returned_heavy"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_top_customers(SF_DIR)
    q["top_customers"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_lineitem_rollup(SF_DIR)
    q["lineitem_rollup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_orders_latest(SF_DIR).materialize()
    q["orders_latest"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_token_quantiles_by_lang(SF_DIR)
    q["docs_token_quantiles_by_lang"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_orders_cohort(SF_DIR).materialize()
    q["orders_cohort"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_source_dedup(SF_DIR).materialize()
    q["docs_source_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_shuffle(SF_DIR).materialize()
    q["docs_shuffle"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_bigram_counts(SF_DIR).materialize()
    q["docs_bigram_counts"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_token_cms(SF_DIR).materialize()
    q["docs_token_cms"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_customer_urgency(SF_DIR).materialize()
    q["customer_urgency"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_events_strength(SF_DIR).materialize()
    q["events_strength"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_dup_trigrams(SF_DIR).materialize()
    q["docs_dup_trigrams"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_best_per_source(SF_DIR).materialize()
    q["docs_best_per_source"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Q.q_docs_dsir_sample(SF_DIR)          # returns a bounded pa.Table
    q["docs_dsir_sample"] = time.perf_counter() - t0

    # late round-4 operators
    for name, fn, mat in (
            ("events_modularity", Q.q_events_modularity, False),
            ("events_jaccard_pairs", Q.q_events_jaccard_pairs, True),
            ("docs_gopher_filter", Q.q_docs_gopher_filter, True),
            ("docs_dup_spans", Q.q_docs_dup_spans, True),
            ("cc_incremental", Q.q_cc_incremental_events, False),
            ("pagerank_weighted", Q.q_pagerank_weighted_events, False),
            ("events_user_bloom", Q.q_events_user_bloom, True),
            ("events_funnel", Q.q_events_funnel, True),
            ("docs_winnowing", Q.q_docs_winnowing, True),
            ("docs_quality_model", Q.q_docs_quality_model, True),
            ("emb_pq_codes", Q.q_emb_pq_codes, True),
            ("emb_knn_pq", Q.q_emb_knn_pq, True),
            ("events_hyperball", Q.q_events_hyperball, True),
            ("events_louvain_move", Q.q_events_louvain_move, True),
            ("docs_winnow_pairs", Q.q_docs_winnow_pairs, True),
            ("docs_dedup_keep_best", Q.q_docs_dedup_keep_best, True),
            ("docs_lm_perplexity", Q.q_docs_lm_perplexity, True),
            ("events_triangles_doulion",
             Q.q_events_triangles_doulion, False),
            ("pages_domain_pagerank", Q.q_pages_domain_pagerank, True),
            ("events_temporal_bfs", Q.q_events_temporal_bfs, True),
            ("events_markov", Q.q_events_markov, True),
            ("events_negative_samples",
             Q.q_events_negative_samples, True),
            ("emb_label_centroids", Q.q_emb_label_centroids, True),
            ("docs_dedup_incremental",
             Q.q_docs_dedup_incremental, False),
            ("events_louvain_coarse", Q.q_events_louvain_coarse, True),
            ("events_katz", Q.q_events_katz, True),
            ("pages_trustrank", Q.q_pages_trustrank, True),
            ("pages_host_locality", Q.q_pages_host_locality, True),
            ("events_adamic_adar", Q.q_events_adamic_adar, True),
            ("pages_crawl_order", Q.q_pages_crawl_order, True),
            ("events_rich_club", Q.q_events_rich_club, False),
            ("events_wl_colors", Q.q_events_wl_colors, True),
            ("docs_bm25", Q.q_docs_bm25, False),
            ("events_butterflies", Q.q_events_butterflies, False),
            ("events_window_hll", Q.q_events_window_hll, True),
            ("events_onion", Q.q_events_onion, True),
            ("pages_host_cap", Q.q_pages_host_cap, True),
            ("events_eigencentrality", Q.q_events_eigencentrality, True),
            ("events_condensation", Q.q_events_condensation, True),
            ("events_bipartite", Q.q_events_bipartite, True),
            ("emb_kmeans", Q.q_emb_kmeans, True),
            ("events_bowtie", Q.q_events_bowtie, True),
            ("pages_bowtie", Q.q_pages_bowtie, True),
            ("events_degree_mixing", Q.q_events_degree_mixing, True),
            ("events_multiplicity", Q.q_events_multiplicity, True),
            ("events_interarrival", Q.q_events_interarrival, True),
            ("docs_entropy", Q.q_docs_entropy, True),
            ("events_window_topk", Q.q_events_window_topk, True),
            ("pages_dead_links", Q.q_pages_dead_links, True),
            ("docs_bpe_pairs", Q.q_docs_bpe_pairs, True),
            ("events_louvain_full", Q.q_events_louvain_full, True),
            ("events_pagerank_std", Q.q_events_pagerank_std, True),
            ("events_window_panes", Q.q_events_window_panes, True),
            ("events_salsa", Q.q_events_salsa, True),
            ("emb_semdedup", Q.q_emb_semdedup, True),
            ("events_topo_levels", Q.q_events_topo_levels, True),
            ("events_powerlaw", Q.q_events_powerlaw, True),
            ("docs_locality_order", Q.q_docs_locality_order, True),
            ("docs_ngram_novelty", Q.q_docs_ngram_novelty, True),
            ("emb_top_component", Q.q_emb_top_component, True),
            ("events_range_join", Q.q_events_range_join, True),
            ("media_stats_real", Q.q_media_stats_real, True),
            ("emb_top_eigenvalue", Q.q_emb_top_eigenvalue, True),
            ("pages_pagerank_std", Q.q_pages_pagerank_std, True),
            ("docs_token_entropy", Q.q_docs_token_entropy, True),
            ("events_window_late", Q.q_events_window_late, True),
            ("media_decode_real", Q.q_media_decode_real, True),
            ("media_resize_real", Q.q_media_resize_real, True),
            ("media_frames_real", Q.q_media_frames_real, True)):
        t0 = time.perf_counter()
        r = fn(SF_DIR)
        # eager results (pyarrow.Table / pandas) are already computed;
        # only a lazy Dataset needs the explicit materialize
        if mat and hasattr(r, "materialize"):
            r.materialize()
        q[name] = time.perf_counter() - t0

    # exact set-similarity join on a deterministic 1/8 doc sample: the
    # sf0.1 corpus carries ~250-member near-dup families, so the FULL
    # exact join's OUTPUT alone is ~1M pairs (inherent to exactness —
    # production runs LSH first); the sample keeps the bench entry
    # proportional while the full join stays contract-checked at sf0.01
    import pyarrow.compute as _pc

    from ligrust_ray.dataops.dedup import similarity_join as _sj

    t0 = time.perf_counter()
    docs10 = Q._docs(SF_DIR).map_batches(
        lambda t: t.filter(_pc.equal(
            _pc.bit_wise_and(t.column("doc_id"), 7), 0)),
        batch_format="pyarrow")
    _sj(docs10, thr_num=9, thr_den=10).materialize()
    q["docs_sim_join_s8"] = time.perf_counter() - t0

    from ligrust_ray.dataops.dedup import containment_join as _cj

    t0 = time.perf_counter()
    docs10 = Q._docs(SF_DIR).map_batches(
        lambda t: t.filter(_pc.equal(
            _pc.bit_wise_and(t.column("doc_id"), 7), 0)),
        batch_format="pyarrow")
    _cj(docs10, thr_num=9, thr_den=10).materialize()
    q["docs_containment_s8"] = time.perf_counter() - t0

    return {
        "queries": q,
        "pagerank_iters": pr_iters,
        "pagerank_edges_scanned": pr_edges,
        "pagerank_iters_per_sec": pr_iters / q["pagerank"],
        "pagerank_edges_per_sec": pr_edges / q["pagerank"],
        "graph_n": g.n,
        "graph_m": g.m,
    }


def _scaling_child(num_cpus: int) -> None:
    # HARD parallelism limit: ray.init(num_cpus=N) only gates logical
    # resource scheduling — our CSR shard actors are num_cpus=0 processes
    # and would still burn all host cores. OS affinity is inherited by
    # every Ray process forked below us, so this child really is an
    # "N-core node".
    os.sched_setaffinity(0, range(num_cpus))
    _init(num_cpus)
    from ligrust_ray.algos.pagerank import page_rank_classic
    from ligrust_ray.state.graph import DistGraph

    gdir = _edges_graph_dir(SCALE_NODES, SCALE_DEG)
    g = DistGraph.load(gdir)
    page_rank_classic(g, max_iterations=3)        # warm actors/object store
    wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        pr = page_rank_classic(g, max_iterations=100)
        wall = min(wall, time.perf_counter() - t0)
    print("SCALING_RESULT " + json.dumps({
        "num_cpus": num_cpus, "wall_s": wall,
        "iterations": pr["iterations"],
        "edges_scanned": pr["edges_scanned"],
        "iters_per_sec": pr["iterations"] / wall,
        "edges_per_sec": pr["edges_scanned"] / wall,
        "partitions": PARTITIONS, "n": g.n, "m": g.m,
    }))
    import ray

    ray.shutdown()


SCALE_DEDUP_DIR = "/tmp/ligr_scale_dedup"
# corpus = sf documents replicated this many times; at the default 10 the
# 32-CPU wall is ~5 s of mostly per-stage dispatch floors — use >= 100 for
# a measurement where compute, not fixed latency, is the scaled quantity
SCALE_DEDUP_FACTOR = int(os.environ.get("GRAFT_SCALE_DEDUP_FACTOR", "10"))


def _scale_dedup_corpus() -> str:
    """Deterministic duplicate-heavy corpus for the dedup scaling runs:
    the sf documents table replicated SCALE_DEDUP_FACTOR x (the minhash
    stress shape — forces the fully distributed LSH/verify/components
    path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(SCALE_DEDUP_DIR,
                        f"docs_x{SCALE_DEDUP_FACTOR}.parquet")
    if not os.path.exists(path):
        os.makedirs(SCALE_DEDUP_DIR, exist_ok=True)
        t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["doc_id", "text"])
        texts = t.column("text").combine_chunks()
        big = pa.table({
            "doc_id": pa.array(np.arange(t.num_rows * SCALE_DEDUP_FACTOR,
                                         dtype=np.int64)),
            "text": pa.concat_arrays([texts] * SCALE_DEDUP_FACTOR)})
        tmp = path + ".tmp"
        pq.write_table(big, tmp)
        os.replace(tmp, path)
    return path


def _scaling_dedup_child(num_cpus: int) -> None:
    """Pinned N-core child for the corpus-op scaling evidence: minhash-LSH
    dedup over the 10x-replica corpus (same affinity protocol as the
    PageRank child — BASELINE.md §3)."""
    os.sched_setaffinity(0, range(num_cpus))
    _init(num_cpus)
    import ray
    import ray.data

    from ligrust_ray.dataops.dedup import minhash_lsh_dedup

    path = _scale_dedup_corpus()
    ds = ray.data.read_parquet(path,
                               override_num_blocks=PARTITIONS).materialize()
    n = ds.count()
    minhash_lsh_dedup(ds).count()             # warm actors / object store
    wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = minhash_lsh_dedup(ds).count()
        wall = min(wall, time.perf_counter() - t0)
    print("SCALING_RESULT " + json.dumps({
        "num_cpus": num_cpus, "wall_s": wall, "docs": n,
        "rows_out": out, "docs_per_sec": n / wall,
        "partitions": PARTITIONS}))
    ray.shutdown()


def run_scaling_dedup() -> dict:
    _init(NUM_CPUS)
    _scale_dedup_corpus()
    import ray

    ray.shutdown()
    results: dict = {}
    n_reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))
    for rep in range(n_reps):
        for ncpu in (2, 8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scaling-dedup-child", str(ncpu)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in out.stdout.splitlines():
                if line.startswith("SCALING_RESULT "):
                    r = json.loads(line[len("SCALING_RESULT "):])
                    if ncpu not in results or \
                            r["wall_s"] < results[ncpu]["wall_s"]:
                        results[ncpu] = r

    def eff(a: int, b: int) -> float:
        return (results[b]["docs_per_sec"] / results[a]["docs_per_sec"]) \
            / (b / a)

    return {"runs": results,
            "scaling_efficiency": eff(2, 8),
            "scaling_efficiency_8_to_32": eff(8, 32)}


def run_scaling() -> dict:
    # ensure the scaling graph exists before the measured children run
    _init(NUM_CPUS)
    _edges_graph_dir(SCALE_NODES, SCALE_DEG)
    import ray

    ray.shutdown()
    # The sandbox host is multi-tenant and non-stationary (measured minute-
    # scale throughput swings of 2-3x), so A-then-B comparisons are
    # meaningless: INTERLEAVE the two configs and keep the best run of each
    # (least-contended sample). Protocol documented in BASELINE.md §3.
    results: dict = {}
    n_reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))
    for rep in range(n_reps):
        for ncpu in (2, 8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scaling-child",
                 str(ncpu)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in out.stdout.splitlines():
                if line.startswith("SCALING_RESULT "):
                    r = json.loads(line[len("SCALING_RESULT "):])
                    if ncpu not in results or r["wall_s"] < results[ncpu]["wall_s"]:
                        results[ncpu] = r

    def eff(a: int, b: int) -> float:
        return (results[b]["edges_per_sec"] / results[a]["edges_per_sec"]) \
            / (b / a)

    return {"runs": results,
            "scaling_efficiency": eff(2, 8),       # N=2 vs 4N=8: both below
            # the single-box memory ceiling — the regime that models
            # multi-node scaling (each real node adds its own memory system)
            "scaling_efficiency_8_to_32": eff(8, 32)}


SCALE10_DIR = "/tmp/ligr_scale10"


def _scale10_docs_dir(factor: int) -> str:
    """documents dir for the prepare volume run: the sf documents table
    replicated ``factor``x with renumbered doc_ids (full schema — the
    clean stage needs every column); factor 1 is the sf dir itself."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if factor == 1:
        return SF_DIR
    d = os.path.join(SCALE10_DIR, f"docs_x{factor}")
    path = os.path.join(d, "documents.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
        n = t.num_rows
        cols = {}
        for name in t.column_names:
            arr = t.column(name).combine_chunks()
            if name == "doc_id":
                cols[name] = pa.array(
                    np.arange(n * factor, dtype=np.int64))
            else:
                cols[name] = pa.concat_arrays([arr] * factor)
        tmp = path + ".tmp"
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, path)
    return d


def run_scale10() -> dict:
    """Round-5 volume validation (r4 VERDICT #1): the headline trio at
    1x and 10x volume in ONE warm 32-CPU session — FRESH pages->CSR
    build (no cached graph), PageRank classic to convergence, and the
    prepare pipeline (clean -> minhash dedup -> training shuffle ->
    resumable shards) over a replica corpus. Wall ratios near the
    volume factor mean the plans scale without an OOM/spill cliff;
    well below it, fixed dispatch costs amortize."""
    import shutil

    _init(NUM_CPUS)
    import ray
    import ray.data

    from ligrust_ray.algos.pagerank import page_rank_classic
    from ligrust_ray.pipelines.build import build_graph_from_pages
    from ligrust_ray.pipelines.prepare import prepare_corpus
    from ligrust_ray.sources.synth import write_pages_corpus
    from ligrust_ray.state.graph import DistGraph

    ray.data.range(1000).map_batches(lambda b: b).materialize()  # warm
    scales: dict[str, dict] = {}
    for factor in (1, 10):
        rec: dict = {"factor": factor}
        n_pages = BENCH_PAGES * factor
        corpus = f"/tmp/ligr_bench/pages_{n_pages}"
        t0 = time.perf_counter()
        write_pages_corpus(corpus, n_pages, seed=42)
        rec["corpus_synth_s"] = round(time.perf_counter() - t0, 3)

        gdir = os.path.join(SCALE10_DIR, f"graph_{n_pages}")
        shutil.rmtree(gdir, ignore_errors=True)     # FRESH build
        t0 = time.perf_counter()
        build_graph_from_pages(corpus, gdir, num_partitions=PARTITIONS)
        rec["build_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        g = DistGraph.load(gdir)
        rec["load_s"] = round(time.perf_counter() - t0, 3)
        rec["graph_n"], rec["graph_m"] = g.n, g.m
        t0 = time.perf_counter()
        pr = page_rank_classic(g, max_iterations=100)
        rec["pagerank_s"] = round(time.perf_counter() - t0, 3)
        rec["pagerank_iters"] = pr["iterations"]
        rec["pagerank_edges_per_s"] = int(
            pr["edges_scanned"] / rec["pagerank_s"])

        docs_dir = _scale10_docs_dir(factor)
        prep_out = os.path.join(SCALE10_DIR, f"prep_x{factor}")
        shutil.rmtree(prep_out, ignore_errors=True)
        res = prepare_corpus(docs_dir, prep_out, method="minhash")
        rec["prepare_s"] = round(sum(res["timings"].values()), 3)
        rec["prepare_stages"] = {k: round(v, 3)
                                 for k, v in res["timings"].items()}
        rec["prepare_docs"] = res["n_docs"]
        rec["prepare_kept"] = res["n_kept"]
        scales[f"x{factor}"] = rec

    ratios = {k: round(scales["x10"][k] / scales["x1"][k], 2)
              for k in ("build_s", "pagerank_s", "prepare_s")}
    return {"metric": "scale10_wall_ratio_build",
            "value": ratios["build_s"], "unit": "ratio",
            "ratios_10x_over_1x": ratios, "scales": scales,
            "num_cpus": NUM_CPUS, "partitions": PARTITIONS,
            "sf": SF_DIR, "bench_pages": BENCH_PAGES}


def main() -> int:
    if "--scale10" in sys.argv:
        res = run_scale10()
        print(json.dumps(res))
        import ray

        ray.shutdown()
        return 0
    if "--scaling-child" in sys.argv:
        _scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
        return 0
    if "--scaling-dedup-child" in sys.argv:
        _scaling_dedup_child(int(
            sys.argv[sys.argv.index("--scaling-dedup-child") + 1]))
        return 0
    if "--scaling-dedup" in sys.argv:
        res = run_scaling_dedup()
        print(json.dumps({
            "metric": "minhash_dedup_scaling_efficiency_N2_to_4N8_cpus",
            "value": res["scaling_efficiency"], "unit": "ratio",
            "scaling_efficiency_8_to_32": res["scaling_efficiency_8_to_32"],
            "runs": res["runs"], "sf": SF_DIR, "partitions": PARTITIONS,
        }))
        return 0
    if "--scaling" in sys.argv:
        res = run_scaling()
        print(json.dumps({
            "metric": "pagerank_scaling_efficiency_N2_to_4N8_cpus",
            "value": res["scaling_efficiency"], "unit": "ratio",
            "scaling_efficiency_8_to_32": res["scaling_efficiency_8_to_32"],
            "runs": res["runs"], "sf": SF_DIR, "partitions": PARTITIONS,
        }))
        return 0
    if "--stats" in sys.argv:
        # per-stage Ray Data execution stats for one contract query —
        # the iterate-on-ds.stats() loop: wall time per operator, rows
        # in/out, task counts (e.g. `python bench.py --stats
        # customer_revenue`)
        name = sys.argv[sys.argv.index("--stats") + 1]
        _init(NUM_CPUS)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import __ray_entry__ as E

        r = E.queries()[name](SF_DIR)
        if hasattr(r, "materialize"):
            r = r.materialize()
            print(r.stats())
        else:
            print(f"{name}: driver-side result "
                  f"({type(r).__name__}) — no Dataset stats")
        import ray

        ray.shutdown()
        return 0
    _init(NUM_CPUS)
    t0 = time.perf_counter()
    r = run_headline(NUM_CPUS)
    total = time.perf_counter() - t0
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    # The harness that records this run keeps only the TAIL of stdout
    # (~2000 chars), so the final JSON line must fit: per-query seconds
    # are rounded to 0.1 ms and, if the full map would still overflow,
    # only the slowest entries ride the line (the full-precision map is
    # always written to bench_full.json next to this script).
    queries = {k: round(v, 4) for k, v in r["queries"].items()}
    payload = {
        "metric": "headline_pipelines_total_sec",
        "value": round(total, 3), "unit": "sec",
        "queries": queries,
        "n_queries": len(queries),
        "queries_full": "bench_full.json",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": NUM_CPUS,
        "pagerank_iters_per_sec": round(r["pagerank_iters_per_sec"], 2),
        "pagerank_edges_per_sec": round(r["pagerank_edges_per_sec"]),
        "graph_n": r["graph_n"], "graph_m": r["graph_m"],
    }
    try:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
        with open(full_path, "w") as f:
            json.dump({**payload, "queries": r["queries"]}, f, indent=1)
    except OSError:
        pass
    line = json.dumps(payload, separators=(",", ":"))
    while len(line) > 1900 and len(queries) > 10:
        # drop the fastest remaining query entries until the line fits
        keep = sorted(queries, key=queries.get, reverse=True)[:len(queries) - 8]
        queries = {k: queries[k] for k in r["queries"] if k in keep}
        payload["queries"] = queries
        payload["n_queries_shown"] = len(queries)
        line = json.dumps(payload, separators=(",", ":"))
    print(line)
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

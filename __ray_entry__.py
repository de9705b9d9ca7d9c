"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` covers the operator inventory of SURVEY.md §2 (graph build,
degree/aggregate ops, the four iterative algorithms, triangle count) plus
the training-data ops (dedup family, ANN, text analysis, multimodal
plumbing). Each SQL-expressible query has a DuckDB oracle in
``oracle_sql()`` with IDENTICAL column names; iterative/model-ish ops are
rows-only here and exactness-tested against the NumPy oracle in pytest
(tests/oracle.py)."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# SQL fragment shared by the events-graph queries (FIXTURES.md F7)
_EDGES_CTE = ("SELECT user_id AS src, "
              "CAST(FLOOR(value * 100) AS BIGINT) % 150 AS dst FROM events")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize a small
    Common-Crawl-style pages corpus, extract links, build the partitioned
    CSR, run PageRankDelta, and return per-node ranks joined back to the
    events-graph analytics path. Returns a pyarrow Table."""
    from ligrust_ray.pipelines import queries as Q

    return Q.q_pages_pagerank("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ligrust_ray.pipelines import queries as Q

    return {
        # graph build + per-edge/degree ops (SQL-checked)
        "events_edges": Q.q_events_edges,
        "events_out_degree": Q.q_events_out_degree,
        "events_degree_histogram": Q.q_events_degree_histogram,
        "events_mutual_edges": Q.q_events_mutual_edges,
        "events_triangles": Q.q_events_triangles,
        # iterative graph algorithms (rows-only; exactness in pytest oracle)
        "pagerank_events": Q.q_pagerank_events,
        "cc_events": Q.q_cc_events,
        "bfs_events": Q.q_bfs_events,
        "labelprop_events": Q.q_labelprop_events,
        "pages_pagerank": Q.q_pages_pagerank,
        # documents: text analysis + dedup family
        "docs_exact_dedup": Q.q_docs_exact_dedup,
        "docs_token_count": Q.q_docs_token_count,
        "docs_stats": Q.q_docs_stats,
        "docs_quality": Q.q_docs_quality,
        "docs_langid": Q.q_docs_langid,
        "docs_fingerprint": Q.q_docs_fingerprint,
        "docs_minhash_dedup": Q.q_docs_minhash_dedup,
        "docs_simhash": Q.q_docs_simhash,
        "docs_ngram_dupes": Q.q_docs_ngram_dupes,
        # embeddings: similarity search + near-dup
        "emb_knn": Q.q_emb_knn,
        "emb_knn_ivf": Q.q_emb_knn_ivf,
        "emb_near_dup": Q.q_emb_near_dup,
        # relational breadth over the TPC-H-ish tables (SQL-checked)
        "lineitem_pricing": Q.q_lineitem_pricing,
        "orders_by_segment": Q.q_orders_by_segment,
        "docs_lang_hist": Q.q_docs_lang_hist,
        # multimodal plumbing (deterministic stub decode/resize/frame-sample)
        "media_decode": Q.q_media_decode,
        "media_resize": Q.q_media_resize,
        "media_frames": Q.q_media_frames,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "events_edges": _EDGES_CTE,
        "events_out_degree": (
            f"WITH e AS ({_EDGES_CTE}) "
            "SELECT src, COUNT(*) AS out_degree FROM e GROUP BY src"),
        "events_degree_histogram": (
            f"WITH e AS ({_EDGES_CTE}), "
            "d AS (SELECT src, COUNT(*) AS degree FROM e GROUP BY src) "
            "SELECT degree, COUNT(*) AS n_nodes FROM d GROUP BY degree"),
        "events_mutual_edges": (
            f"WITH e AS (SELECT DISTINCT * FROM ({_EDGES_CTE})) "
            "SELECT COUNT(*) AS n_mutual FROM e a "
            "JOIN e b ON a.src = b.dst AND a.dst = b.src AND a.src < a.dst"),
        "events_triangles": (
            f"WITH e AS (SELECT DISTINCT * FROM ({_EDGES_CTE}) "
            "WHERE src <> dst), "
            "u AS (SELECT DISTINCT LEAST(src, dst) AS a, "
            "GREATEST(src, dst) AS b FROM e) "
            "SELECT COUNT(*) AS n_triangles FROM u e1 "
            "JOIN u e2 ON e1.b = e2.a "
            "JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b"),
        "docs_exact_dedup": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"),
        "docs_token_count": (
            "SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), "
            "'\\s+')) AS BIGINT) AS n_tokens FROM documents"),
        "docs_stats": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m, "
            "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) "
            "AS n_tokens, "
            "CAST(length(regexp_replace(text, '[^.,!?]', '', 'g')) AS BIGINT) "
            "AS n_punct FROM documents"),
        "emb_knn": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe "
            "FROM embeddings WHERE vec_id < 5), "
            "s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.qe, e.embedding) AS sim "
            "FROM q CROSS JOIN embeddings e) "
            "SELECT query_id, neighbor_id, rank FROM ("
            "SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
            "FROM s) WHERE rank <= 10"),
        "emb_near_dup": (
            "SELECT a.vec_id AS a, b.vec_id AS b FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45"),
        "lineitem_pricing": (
            # CAST(SUM(...) AS BIGINT): DuckDB SUM(BIGINT) returns HUGEINT
            # which pandas surfaces as float64, breaking the driver's
            # value-hash vs our int64 sums (VERDICT r1 item 1).
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS sum_qty, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS sum_price_cents, "
            "COUNT(*) AS n_rows FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"),
        "orders_by_segment": (
            "SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_mktsegment"),
        "docs_lang_hist": (
            "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang"),
        "media_resize": (
            "SELECT doc_id AS media_id, CAST(224 AS BIGINT) AS width, "
            "CAST(224 AS BIGINT) AS height FROM documents"),
        "media_frames": (
            "SELECT doc_id AS media_id, f.i AS frame_idx FROM documents "
            "CROSS JOIN (SELECT CAST(UNNEST(range(4)) AS BIGINT) AS i) f"),
    }

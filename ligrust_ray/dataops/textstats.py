"""Text analysis ops over the ``documents`` table (large-scale training-data
pipeline components): token counting, doc stats, quality scoring, language
ID, fingerprinting. All are stateless/actor-pool ``map_batches`` stages with
regexes compiled once per actor; semantics of the SQL-checkable ones mirror
the DuckDB oracle exactly (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Python's \s is Unicode-wide (U+00A0, U+2028, \x0b ...) while the DuckDB
# oracles' RE2 \s is exactly [\t\n\f\r ] — an explicit class keeps engine
# and oracle tokenizing IDENTICALLY on corpora containing exotic
# whitespace (the ASCII test corpus never exposed the gap)
RE2_WS = "[\t\n\f\r ]"
_WS = re.compile(RE2_WS + "+")
_PUNCT = re.compile(r"[.,!?]")
_WORD = re.compile(r"[a-zA-Z]+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es"},
    "fr": {"le", "la", "de", "et", "un", "est", "en", "que"},
    "zh": set(),  # CJK handled by the charset rule below
}


def token_count_batch(t: pa.Table) -> pa.Table:
    """n_tokens = length(regexp_split_to_array(trim(text), '\\s+')) —
    exactly DuckDB's semantics (empty text -> [''] -> 1)."""
    texts = t.column("text").to_pylist()
    n = [len(_WS.split(x.strip(" "))) for x in texts]
    return pa.table({"doc_id": t.column("doc_id"),
                     "n_tokens": pa.array(n, type=pa.int64())})


# BPE-ish pre-tokenizer: letter runs / digit runs / single non-space
# symbol — deliberately RE2-compatible (no lookahead) so the DuckDB oracle
# runs the IDENTICAL pattern
_BPE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\f\r ]")  # RE2 \s parity
BPE_PATTERN_SQL = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count_bpe_batch(t: pa.Table) -> pa.Table:
    """Sub-word-ish token count (letter/digit/symbol runs) — the cheap
    proxy a data pipeline uses to budget tokenizer costs before real BPE."""
    texts = t.column("text").to_pylist()
    n = [len(_BPE.findall(x)) for x in texts]
    return pa.table({"doc_id": t.column("doc_id"),
                     "n_tokens_bpe": pa.array(n, type=pa.int64())})


def doc_stats_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_chars_m": pa.array([len(x) for x in texts], type=pa.int64()),
        "n_tokens": pa.array([len(_WS.split(x.strip(" "))) for x in texts],
                             type=pa.int64()),
        "n_punct": pa.array([len(_PUNCT.findall(x)) for x in texts],
                            type=pa.int64()),
    })


class QualityScore:
    """Heuristic quality score: length band + alpha ratio + stopword
    presence + mean word length band, emitted as integer micro-units
    (``quality_1e6`` in [0, 1e6]) so the value hashes identically to the
    DuckDB oracle (float hash-compare is addition-order fragile). The
    left-associative sum order and floor(x+0.5) rounding are part of the
    spec — the oracle SQL mirrors them term by term."""

    def __init__(self):
        self.word = _WORD
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        scores = np.zeros(len(texts), dtype=np.int64)
        for i, x in enumerate(texts):
            if not x:
                continue
            words = self.word.findall(x.lower())
            n_alpha = sum(len(w) for w in words)
            alpha_ratio = n_alpha / max(1, len(x))
            stop_ratio = (sum(w in self.stop for w in words)
                          / max(1, len(words)))
            mean_wl = n_alpha / max(1, len(words))
            s = 0.25 * (1.0 if 100 <= len(x) <= 20000 else 0.0)
            s = s + 0.25 * min(1.0, alpha_ratio / 0.7)
            s = s + 0.25 * min(1.0, stop_ratio / 0.3)
            s = s + 0.25 * (1.0 if 3.0 <= mean_wl <= 10.0 else 0.0)
            scores[i] = int(np.floor(s * 1e6 + 0.5))
        return pa.table({"doc_id": t.column("doc_id"),
                         "quality_1e6": pa.array(scores, type=pa.int64())})


class LangId:
    """Charset + stopword-profile language ID (n-gram-free heuristic that is
    cheap and fully vectorisable per doc)."""

    def __init__(self):
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}
        self.word = _WORD

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        preds = []
        for x in texts:
            cjk = sum(1 for ch in x[:400] if "一" <= ch <= "鿿")
            if cjk > len(x[:400]) * 0.2:
                preds.append("zh")
                continue
            words = set(self.word.findall(x.lower()[:2000]))
            best, best_hits = "unknown", 0
            for lang in sorted(self.profiles):
                hits = len(words & self.profiles[lang])
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return pa.table({"doc_id": t.column("doc_id"),
                         "pred_lang": pa.array(preds, type=pa.string())})


import functools


@functools.lru_cache(maxsize=1)
def quality_scorer() -> "QualityScore":
    """Per-process cached instance for task-based dispatch (state is a
    compiled regex + tiny stopword set — not worth an actor pool)."""
    return QualityScore()


@functools.lru_cache(maxsize=1)
def lang_id() -> "LangId":
    return LangId()


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """int64 document fingerprint (stable content identity for
    incremental crawls): md5-lower-u64 of the whitespace-normalised text
    (collapse ``\\s+`` runs to one space, strip ends). C-speed hashing
    (hashing.py) and DuckDB-replicable:
    ``md5_number_lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))``."""
    from ligrust_ray.dataops.hashing import md5_i64_lower

    texts = t.column("text").to_pylist()
    out = [md5_i64_lower(" ".join(_WS.split(x.strip(" "))).encode("utf-8")
                         if x.strip(" ") else b"") for x in texts]
    return pa.table({"doc_id": t.column("doc_id"),
                     "fingerprint": pa.array(out, type=pa.int64())})


# ---- corpus-pipeline utilities (round 3) ---------------------------------

def hash_mod_sample_batch(t: pa.Table, pct: int = 10, mod: int = 100
                          ) -> pa.Table:
    """Deterministic stratified sampling: keep a doc iff
    ``md5_lower_u64(str(doc_id)) % mod < pct`` — the reproducible,
    coordination-free sample every large-corpus experiment starts from
    (same rows on any cluster size / retry). DuckDB-identical:
    ``md5_number_lower(CAST(doc_id AS VARCHAR)) % mod < pct``."""
    from ligrust_ray.dataops.hashing import md5_u64_lower

    ids = t.column("doc_id").to_numpy()
    keep = np.fromiter(
        (md5_u64_lower(str(int(i)).encode("ascii")) % mod < pct
         for i in ids), dtype=bool, count=len(ids))
    return pa.table({"doc_id": pa.array(ids[keep].astype(np.int64))})


_LINE_TOKENS = re.compile("[^\t\n\f\r ]+")   # RE2 \S parity, see RE2_WS


def repetition_stats_batch(t: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per doc: line count and duplicate
    lines beyond first occurrence (``n_lines - n_distinct_lines``) — the
    cheap boilerplate/spam detector run before expensive dedup. Integer
    outputs; DuckDB: ``len(string_split(text, chr(10)))`` and
    ``len(list_distinct(...))``."""
    texts = t.column("text").to_pylist()
    n_lines, n_dup = [], []
    for x in texts:
        lines = x.split("\n")
        n_lines.append(len(lines))
        n_dup.append(len(lines) - len(set(lines)))
    return pa.table({"doc_id": t.column("doc_id"),
                     "n_lines": pa.array(n_lines, type=pa.int64()),
                     "n_dup_lines": pa.array(n_dup, type=pa.int64())})


WINNOW_K = 3      # tokens per k-gram
WINNOW_W = 4      # winnowing window: w consecutive k-gram hashes


def winnow_batch(t: pa.Table, k: int = WINNOW_K, w: int = WINNOW_W
                 ) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token gram of the
    lowercased text (md5-lower-u64 of the space-joined tokens, as int64),
    then for every window of ``w`` consecutive gram hashes select the
    minimum with RIGHTMOST tie-break; emit DISTINCT selected hashes per
    doc as ``(doc_id, fp)``. Guarantee: any shared token run of length
    >= w + k - 1 between two docs shares at least one fingerprint, with
    expected density 2/(w+1) — the local-fingerprint primitive between
    exact hashing (fragile) and MinHash (global-only).

    Fully shuffle-free: tokenize/gram/hash are batch-vectorised (Arrow
    split + one chunked DuckDB md5 call); the winnow sweep is a numpy
    sliding-window argmin per doc. Docs shorter than k tokens (no gram)
    or w + k - 1 tokens (no full window) emit nothing, per the paper.
    DuckDB parity: the docs_winnowing oracle replays gram/hash/window
    selection with ROW_NUMBER OVER (ORDER BY hv ASC, i DESC)."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "fp": pa.array([], type=pa.int64())})
    if not t.num_rows:
        return empty
    ids = t.column("doc_id").to_numpy()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(t.column("text")), RE2_WS + "+").combine_chunks()
    if isinstance(toks, pa.ChunkedArray):      # plain Arrays from here on
        toks = toks.chunk(0) if toks.num_chunks else \
            pa.array([], type=toks.type)
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(len(ids)), lens)
    # split emits "" at string edges; RE2's extract_all never does
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, doc_idx = flat.filter(pa.array(keep)), doc_idx[keep]
    n = len(flat)
    if n < k:
        return empty
    # k-gram strings via shifted zero-copy slices; mask grams that cross
    # a doc boundary (first/last token must sit in the same doc)
    parts = [flat.slice(j, n - k + 1) for j in range(k)]
    grams = pc.binary_join_element_wise(*parts, " ")
    same_doc = doc_idx[: n - k + 1] == doc_idx[k - 1:]
    hv_all = md5_u64_lower_arrow(grams).view(np.int64)
    hv, gdoc = hv_all[same_doc], doc_idx[: n - k + 1][same_doc]

    out_doc, out_fp = [], []
    bounds = np.flatnonzero(np.concatenate(
        ([True], gdoc[1:] != gdoc[:-1], [True])))
    for a, b in zip(bounds[:-1], bounds[1:]):
        m = b - a
        if m < w:
            continue
        seg = hv[a:b]
        swv = np.lib.stride_tricks.sliding_window_view(seg, w)
        # rightmost argmin: argmin of the reversed window, mirrored
        sel = np.arange(m - w + 1) + (w - 1 - np.argmin(swv[:, ::-1],
                                                        axis=1))
        fps = np.unique(seg[np.unique(sel)])
        out_doc.append(np.full(len(fps), ids[gdoc[a]], dtype=np.int64))
        out_fp.append(fps)
    if not out_doc:
        return empty
    return pa.table({"doc_id": pa.array(np.concatenate(out_doc)),
                     "fp": pa.array(np.concatenate(out_fp))})


CHUNK_TOKENS = 64          # training context-window chunk size
CHUNK_STRIDE = 48          # stride (16-token overlap between chunks)


def chunk_batch(t: pa.Table, size: int = CHUNK_TOKENS,
                stride: int = CHUNK_STRIDE) -> pa.Table:
    """(doc_id, chunk_id, start_tok, n_tokens, chunk_fp) — deterministic
    sliding-window document chunking for training-sequence construction:
    chunk i covers tokens [i*stride, i*stride + size) of the lowercased
    RE2-token stream; the final partial chunk is kept (every token lands
    in >= 1 chunk). chunk_fp = md5-lower-i64 of the space-joined chunk
    (the per-chunk dedup/provenance key). Shuffle-free per-doc map;
    DuckDB-replicable via range(0, n, stride) + list slicing."""
    from ligrust_ray.dataops.hashing import md5_i64_lower

    out = {"doc_id": [], "chunk_id": [], "start_tok": [],
           "n_tokens": [], "chunk_fp": []}
    ids = t.column("doc_id").to_pylist()
    for did, x in zip(ids, t.column("text").to_pylist()):
        toks = _LINE_TOKENS.findall(x.lower())
        n = len(toks)
        for ci, s in enumerate(range(0, max(n, 1), stride)):
            if s >= n:
                break
            seg = toks[s:s + size]
            out["doc_id"].append(did)
            out["chunk_id"].append(ci)
            out["start_tok"].append(s)
            out["n_tokens"].append(len(seg))
            out["chunk_fp"].append(md5_i64_lower(" ".join(seg).encode()))
    return pa.table({
        "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        "chunk_id": pa.array(out["chunk_id"], type=pa.int64()),
        "start_tok": pa.array(out["start_tok"], type=pa.int64()),
        "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
        "chunk_fp": pa.array(out["chunk_fp"], type=pa.int64())})


QMODEL_BUCKETS = 4096      # hashed feature space (vocabulary-free)
QMODEL_WRANGE = 2001       # integer weights in [-1000, 1000]


class HashedLinearScorer:
    """Model-scoring stage shaped like a fasttext-style quality
    classifier: token -> hashed feature bucket -> integer weight; doc
    score = sum of weights (int64 exact, so the DuckDB oracle replays it
    bit-for-bit). The weight table is the trained artifact — here derived
    deterministically from md5 so the contract can check the FULL
    inference path; swapping in real learned weights is a one-line
    change. Actor-pool pattern: the table is built ONCE per actor in
    __init__ (stand-in for a model load), __call__ only does vectorised
    tokenize/hash/gather per batch."""

    def __init__(self, n_buckets: int = QMODEL_BUCKETS):
        from ligrust_ray.dataops.hashing import md5_u64_lower

        self.n_buckets = n_buckets
        self.w = np.fromiter(
            (md5_u64_lower(f"w:{j}".encode()) % QMODEL_WRANGE - 1000
             for j in range(n_buckets)),
            dtype=np.int64, count=n_buckets)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "n_tokens": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.int64()),
                          "keep": pa.array([], type=pa.bool_())})
        if not t.num_rows:
            return empty
        ids = t.column("doc_id").to_numpy()
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), RE2_WS + "+").combine_chunks()
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.chunk(0) if toks.num_chunks else \
                pa.array([], type=toks.type)
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        doc_idx = np.repeat(np.arange(len(ids)), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, doc_idx = flat.filter(pa.array(keep)), doc_idx[keep]
        if not len(flat):
            return empty
        h = (md5_u64_lower_arrow(flat)
             % np.uint64(self.n_buckets)).astype(np.int64)
        wv = self.w[h]
        n_tok = np.bincount(doc_idx, minlength=len(ids)).astype(np.int64)
        score = np.bincount(doc_idx, weights=wv.astype(np.float64),
                            minlength=len(ids)).astype(np.int64)
        nz = n_tok > 0                       # zero-token docs emit nothing
        return pa.table({
            "doc_id": pa.array(ids[nz].astype(np.int64)),
            "n_tokens": pa.array(n_tok[nz]),
            "score": pa.array(score[nz]),
            "keep": pa.array(score[nz] >= 0)})


@functools.lru_cache(maxsize=1)
def quality_model() -> "HashedLinearScorer":
    """Per-process scorer instance (the 4096-entry weight table builds
    once per worker; pass the CLASS to map_batches(concurrency=N) instead
    when the artifact is a real multi-second model load)."""
    return HashedLinearScorer()


# ---- PII scrubbing (round 3) ---------------------------------------------
# Both sides of the contract run RE2: pyarrow.compute's regex kernels here,
# DuckDB's regexp_* in the oracle — identical leftmost-first matching by
# construction. Patterns stay ASCII-class-only ([0-9], not \d) so neither
# engine's unicode mode can diverge. Applied IN ORDER (email, ip, phone):
# each type counts matches on the text as redacted so far, then replaces.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("phone", r"\+?[0-9]([ .-]?[0-9]){7,14}", "<PHONE>"),
]


def pii_scrub_batch(t: pa.Table) -> pa.Table:
    """(doc_id, text_clean, n_email, n_ip, n_phone): redact emails, IPv4
    addresses and phone-like digit runs with typed tokens, counting each.
    Vectorised RE2 kernels (count_substring_regex / replace_substring_regex)
    — no per-row Python regex loop."""
    txt = t.column("text").cast(pa.string())
    cols = {"doc_id": t.column("doc_id")}
    for name, pat, token in PII_PATTERNS:
        cols[f"n_{name}"] = pc.count_substring_regex(txt, pat).cast(pa.int64())
        txt = pc.replace_substring_regex(txt, pattern=pat, replacement=token)
    cols["text_clean"] = txt
    return pa.table({"doc_id": cols["doc_id"], "text_clean": txt,
                     "n_email": cols["n_email"], "n_ip": cols["n_ip"],
                     "n_phone": cols["n_phone"]})


def char_entropy_batch(t: pa.Table) -> pa.Table:
    """(doc_id, entropy_ubits) — per-doc character (codepoint) Shannon
    entropy in integer MICRO-bits: each distinct character contributes
    term = floor((n/N) * (log2 N - log2 n) * 1e6 + 0.5), an int64 that
    depends only on the integer pair (n, N) — summing ints makes the
    value addition-order independent, so the DuckDB oracle (identical
    per-term formula) hash-matches without float-sum-order caveats (the
    Adamic-Adar fixed-point convention). Low entropy flags gibberish /
    repeated-character spam (the Gopher-style quality axis the plain
    repetition stats miss). Empty docs emit no row (entropy undefined),
    matching the oracle's generate_series(1, 0) empty expansion.

    Vectorized: one codepoint explode per batch (utf-32 view), counts
    via a C groupby on (doc_idx, code), terms in one numpy expression —
    no per-character Python."""
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    lens = np.fromiter((len(x) for x in texts), dtype=np.int64,
                       count=len(texts))
    keep = lens > 0
    if not keep.any():
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "entropy_ubits": pa.array([], type=pa.int64())})
    codes = np.frombuffer("".join(texts).encode("utf-32-le"),
                          dtype=np.uint32).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    # run-length encode the sorted (doc, code) stream: counts per pair
    order = np.lexsort((codes, doc_idx))
    di, cs = doc_idx[order], codes[order]
    first = np.concatenate(([True], (di[1:] != di[:-1])
                            | (cs[1:] != cs[:-1])))
    starts = np.flatnonzero(first)
    n = np.diff(np.append(starts, len(di))).astype(np.int64)
    gi = di[starts]
    N = lens[gi].astype(np.float64)
    term = np.floor((n / N) * (np.log2(N) - np.log2(n.astype(np.float64)))
                    * 1e6 + 0.5).astype(np.int64)
    # per-doc integer sum of terms (gi ascends)
    dstarts = np.flatnonzero(np.concatenate(([True], gi[1:] != gi[:-1])))
    ent = np.add.reduceat(term, dstarts)
    out_idx = gi[dstarts]
    return pa.table({
        "doc_id": pa.array(ids[out_idx].astype(np.int64)),
        "entropy_ubits": pa.array(ent.astype(np.int64))})


BPE_PAIR_TOPK = 50


def char_pair_counts_batch(t: pa.Table) -> pa.Table:
    """(pair, n) — adjacent-codepoint pair counts per batch (the
    candidate table of ONE BPE merge iteration, the inner loop of
    tokenizer training). Vectorized: one utf-32 explode per batch, then
    adjacent codepoints packed two-uint32s-per-int64 so the hot
    np.unique runs on integers (NUL-safe — numpy's fixed-width '<U'
    view treats U+0000 as padding, so a string-based pairing would
    silently drop it); strings are rendered only for the distinct pairs
    at the end. Doc boundaries masked; map-side combine via np.unique
    bounds the shuffle to distinct pairs (<= |alphabet|^2 rows per
    block at any corpus size)."""
    texts = t.column("text").to_pylist()
    lens = np.fromiter((len(x) for x in texts), dtype=np.int64,
                       count=len(texts))
    if not (lens >= 2).any():
        return pa.table({"pair": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    codes = np.frombuffer("".join(texts).encode("utf-32-le"),
                          dtype=np.uint32).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    same = doc_idx[:-1] == doc_idx[1:]
    keys = (codes[:-1][same] << 32) | codes[1:][same]
    uniq, cnt = np.unique(keys, return_counts=True)
    pairs = [chr(int(k) >> 32) + chr(int(k) & 0xFFFFFFFF) for k in uniq]
    return pa.table({"pair": pa.array(pairs, type=pa.string()),
                     "n": pa.array(cnt.astype(np.int64))})


def token_entropy_batch(t: pa.Table) -> pa.Table:
    """(doc_id, tok_entropy_ubits) — per-doc TOKEN-level Shannon entropy
    in integer micro-bits (char_entropy_batch's exact-integer term
    convention over the pinned whitespace tokenization): low token
    entropy flags templated / boilerplate docs whose character entropy
    still looks normal. Tokens group by md5_number_lower (the
    line-dedup convention — the oracle groups by the same hash, so
    parity is structural, not collision-probabilistic). Docs with no
    tokens emit no row."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "tok_entropy_ubits": pa.array([], type=pa.int64())})
    if not t.num_rows:
        return empty
    ids = t.column("doc_id").to_numpy()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(t.column("text")), RE2_WS + "+").combine_chunks()
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.chunk(0) if toks.num_chunks else \
            pa.array([], type=toks.type)
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(len(ids)), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, doc_idx = flat.filter(pa.array(keep)), doc_idx[keep]
    if not len(flat):
        return empty
    h = md5_u64_lower_arrow(flat).view(np.int64)
    Ndoc = np.bincount(doc_idx, minlength=len(ids)).astype(np.int64)
    order = np.lexsort((h, doc_idx))
    di, hs = doc_idx[order], h[order]
    first = np.concatenate(([True], (di[1:] != di[:-1])
                            | (hs[1:] != hs[:-1])))
    starts = np.flatnonzero(first)
    n = np.diff(np.append(starts, len(di))).astype(np.int64)
    gi = di[starts]
    N = Ndoc[gi].astype(np.float64)
    term = np.floor((n / N) * (np.log2(N) - np.log2(n.astype(np.float64)))
                    * 1e6 + 0.5).astype(np.int64)
    dstarts = np.flatnonzero(np.concatenate(([True], gi[1:] != gi[:-1])))
    ent = np.add.reduceat(term, dstarts)
    out_idx = gi[dstarts]
    return pa.table({
        "doc_id": pa.array(ids[out_idx].astype(np.int64)),
        "tok_entropy_ubits": pa.array(ent.astype(np.int64))})

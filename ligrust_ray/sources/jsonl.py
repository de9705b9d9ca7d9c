"""JSONL document ingestion — the interchange format most web-text
corpora ship as (one JSON object per line: a text field plus free-form
metadata). NEW vs the reference (whose only text input is the
AdjacencyGraph format, /root/reference/src/graph.rs); a Ray-Data-native
engine for webtext needs first-class NDJSON intake.

Scale shape: ``ray.data.read_json`` is block-parallel across files and
byte ranges (Arrow's NDJSON reader, zero Python per line); schema
normalisation is one ``map_batches`` of pure Arrow kernels. Ids: an
explicit ``id_field`` is used when present; otherwise each doc gets a
CONTENT-ADDRESSED id — ``md5_number_lower(text) % 2^63`` — which is
deterministic at any cluster size / file order (task ids or line
numbers would not be reproducible across reruns); exact-duplicate texts
therefore share an id, which downstream exact-dedup collapses anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())])

_MASK63 = np.uint64((1 << 63) - 1)


def read_documents_jsonl(paths, *, text_field: str = "text",
                         id_field: str = "doc_id",
                         lang_field: str = "lang",
                         source_field: str = "source",
                         default_lang: str = "und",
                         default_source: str = "jsonl"
                         ) -> ray.data.Dataset:
    """Read NDJSON file(s) into the engine's ``documents`` layout
    (doc_id, text, lang, source, n_chars). Missing/null metadata fields
    fall back to defaults; a missing ``id_field`` triggers
    content-addressed ids (module docstring)."""
    ds = ray.data.read_json(paths)

    def norm(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = set(t.schema.names)

        def str_col(field, default):
            if field and field in names:
                return pc.fill_null(t.column(field).cast(pa.string()),
                                    default)
            return pa.array([default] * n, type=pa.string())

        if text_field not in names:
            # a wrong --text-field would otherwise import a corpus of
            # empty texts sharing ONE content-addressed id — fail loudly
            raise ValueError(
                f"jsonl: text field {text_field!r} absent from input "
                f"(fields: {sorted(names)})")
        text = str_col(text_field, "")
        if id_field and id_field in names:
            did = t.column(id_field).cast(pa.int64())
            if did.null_count:
                raise ValueError(
                    f"jsonl: null values in id field {id_field!r}")
        else:
            from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

            did = pa.array((md5_u64_lower_arrow(
                text.combine_chunks() if isinstance(text, pa.ChunkedArray)
                else text) & _MASK63).astype(np.int64))
        return pa.table({
            "doc_id": did, "text": text,
            "lang": str_col(lang_field, default_lang),
            "source": str_col(source_field, default_source),
            "n_chars": pc.utf8_length(text).cast(pa.int64())},
            schema=DOC_SCHEMA)

    return ds.map_batches(norm, batch_format="pyarrow")


def write_documents_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Export a documents Dataset as NDJSON part files (one per block —
    the round-trip counterpart of ``read_documents_jsonl``)."""
    ds.write_json(out_dir)

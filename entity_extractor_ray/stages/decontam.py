"""Eval-set decontamination: flag corpus documents that contain any
eval-set snippet as an exact substring.

The canonical training-data hygiene pass (reference analog: the M2
keyword/substring scan, file_analysis_service.py:68-121, generalized from
"keywords" to "held-out eval snippets"): before training, every document
that verbatim-contains a snippet of the evaluation set must be flagged
(and usually dropped) so benchmark numbers aren't contaminated.

Scale shape — the one that matters at 100 TB:
  * The eval side is FIXED-SIZE by contract (a benchmark suite, not a
    corpus); it is collected once, snippeted, and broadcast via
    ``ray.put`` — read from the local object store by every scan task,
    never re-shipped per batch.
  * The corpus side is a pure map-only scan: ``map_batches`` with one
    vectorized Arrow ``match_substring`` kernel pass per snippet
    (RE2-free literal search in C++). NO shuffle anywhere — the operator
    streams 100 TB through unchanged.
  * For eval sets beyond ~10^5 snippets the per-snippet kernel passes
    would dominate; the scale path is an Aho-Corasick automaton built
    once per actor (library not in this container — the gate below makes
    the boundary loud instead of slow).

For the driver oracle the eval set is derived deterministically from the
documents table itself (doc_id % eval_mod, long-enough docs), so the
whole operator is expressible as one DuckDB ``contains()`` join.
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

logger = logging.getLogger("entity_extractor_ray.decontam")

# beyond this many snippets, per-snippet kernel passes are the wrong plan
MAX_EVAL_SNIPPETS = 100_000


def decontaminate(
    docs_ds,
    eval_mod: int = 97,
    snip_start: int = 20,
    snip_len: int = 60,
    min_chars: int = 120,
):
    """(doc_id, eval_doc_id, self_hit) for every corpus document whose text
    contains the eval document's snippet ``text[snip_start-1 : +snip_len]``
    (1-indexed to match SQL ``substr``). ``self_hit`` marks the eval doc
    containing its own snippet — kept so the result is non-empty by
    construction; real pipelines drop flagged rows where ``NOT self_hit``.
    """
    # --- 1. collect + snippet the (fixed-size) eval side
    def eval_side(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        chars = t.column("n_chars").to_numpy()
        mask = (ids % eval_mod == 0) & (chars >= min_chars)
        return t.filter(pa.array(mask)).select(["doc_id", "text"])

    eval_ids: List[int] = []
    snippets: List[str] = []
    for b in docs_ds.map_batches(eval_side, batch_format="pyarrow").iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        for did, text in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            snip = (text or "")[snip_start - 1 : snip_start - 1 + snip_len]
            if snip:
                eval_ids.append(did)
                snippets.append(snip)
    if len(snippets) > MAX_EVAL_SNIPPETS:
        raise ValueError(
            f"decontaminate: {len(snippets)} eval snippets exceeds the "
            f"per-snippet-kernel plan bound ({MAX_EVAL_SNIPPETS}); an "
            "Aho-Corasick actor stage is the right plan at this size"
        )
    logger.info("decontaminate: broadcasting %d eval snippets", len(snippets))
    side_ref = ray.put((np.asarray(eval_ids, dtype=np.int64), snippets))

    # --- 2. map-only corpus scan, one vectorized kernel pass per snippet
    def scan(t: pa.Table) -> pa.Table:
        ev_ids, snips = ray.get(side_ref)
        text = pc.coalesce(t.column("text"), pa.scalar("", pa.string()))
        doc_ids = t.column("doc_id").to_numpy()
        hit_docs: List[np.ndarray] = []
        hit_evals: List[np.ndarray] = []
        for eid, snip in zip(ev_ids, snips):
            m = pc.match_substring(text, snip).to_numpy(zero_copy_only=False)
            hits = doc_ids[m]
            if hits.size:
                hit_docs.append(hits)
                hit_evals.append(np.full(hits.size, eid, dtype=np.int64))
        d = np.concatenate(hit_docs) if hit_docs else np.zeros(0, dtype=np.int64)
        e = np.concatenate(hit_evals) if hit_evals else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "eval_doc_id": pa.array(e, pa.int64()),
                "self_hit": pa.array(d == e),
            }
        )

    return docs_ds.map_batches(scan, batch_format="pyarrow")


def decontaminate_sql(
    eval_mod: int = 97,
    snip_start: int = 20,
    snip_len: int = 60,
    min_chars: int = 120,
) -> str:
    return f"""
    WITH eval AS (
      SELECT doc_id AS eval_doc_id,
             substr(COALESCE(text, ''), {snip_start}, {snip_len}) AS snippet
      FROM documents
      WHERE doc_id % {eval_mod} = 0 AND n_chars >= {min_chars}
        AND length(substr(COALESCE(text, ''), {snip_start}, {snip_len})) > 0
    )
    SELECT d.doc_id, e.eval_doc_id, d.doc_id = e.eval_doc_id AS self_hit
    FROM documents d
    JOIN eval e ON contains(COALESCE(d.text, ''), e.snippet)
    """

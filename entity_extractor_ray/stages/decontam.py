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

# ------------------------------------------------- fuzzy (n-gram Jaccard)

# beyond this many eval gram rows the broadcast index is the wrong plan —
# the cross-corpus prefix-filter join (ngram_jaccard_prefix with a side
# tag) is the scale path for corpus-vs-corpus overlap
MAX_EVAL_GRAM_ROWS = 2_000_000


def fuzzy_decontaminate(docs_ds, eval_mod: int = 97, n: int = 3,
                        threshold: float = 0.02):
    """Fuzzy eval-set decontamination: flag every TRAIN document
    (``doc_id % eval_mod != 0``) whose word-``n``-gram Jaccard similarity
    against ANY EVAL document (``doc_id % eval_mod == 0``) reaches
    ``threshold`` — the near-duplicate complement of the exact-substring
    scan above (GPT-3/PaLM-style "13-gram overlap" decontamination
    generalizes to exactly this shape). One row per flagged train doc:
    ``(doc_id, eval_doc_id, jaccard, n_eval_hits)`` where ``eval_doc_id``
    is the best match (max raw jaccard, ties -> min eval id), ``jaccard``
    is floor-truncated to 6dp (the ngram_jaccard_pairs convention) and
    ``n_eval_hits`` counts eval docs at/above threshold.

    Scale shape: the eval side is FIXED-SIZE by contract (a benchmark
    suite), so its distinct-gram inverted index is built once, gated
    (MAX_EVAL_GRAM_ROWS), and broadcast via ``ray.put`` as three numpy
    arrays (sorted gram-hash vocab + CSR postings). The train side is a
    pure MAP-ONLY scan — per batch: one vectorized siphash over the
    batch's grams (the _gram_rows discipline, dedup.py:435), one
    searchsorted probe, one CSR gather, one np.unique pair count. NO
    shuffle anywhere; the operator streams 100 TB unchanged. Gram
    tokenizer/hash and the jaccard arithmetic are shared with
    ngram_jaccard_pairs so every overlap statistic agrees."""
    import pandas as pd

    from ..functions import textnorm

    # --- 1. eval-side inverted index (fixed-size by contract)
    def eval_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = t.filter(pa.array(ids % eval_mod == 0))
        out_gram: List[str] = []
        out_doc: List[int] = []
        for did, text in zip(keep.column("doc_id").to_pylist(),
                             keep.column("text").to_pylist()):
            grams = textnorm.word_ngrams(text or "", n)
            out_gram.extend(grams)
            out_doc.extend([did] * len(grams))
        hashes = pd.util.hash_pandas_object(
            pd.Series(out_gram, dtype=object), index=False
        ).to_numpy().astype(np.int64)
        return pa.table(
            {
                "gram": pa.array(hashes, pa.int64()),
                "doc_id": pa.array(np.asarray(out_doc, np.int64), pa.int64()),
            }
        )

    g_parts: List[pa.Table] = []
    for b in docs_ds.map_batches(eval_grams, batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        g_parts.append(b)
    ev = pa.concat_tables(g_parts) if g_parts else pa.table(
        {"gram": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
    )
    if ev.num_rows > MAX_EVAL_GRAM_ROWS:
        raise ValueError(
            f"fuzzy_decontaminate: {ev.num_rows} eval gram rows exceeds the "
            f"broadcast-index plan bound ({MAX_EVAL_GRAM_ROWS}); use the "
            "side-tagged prefix-filter join for corpus-vs-corpus overlap"
        )
    ev_gram = ev.column("gram").to_numpy()
    ev_doc = ev.column("doc_id").to_numpy()
    # dense eval ids + per-eval distinct gram counts
    ev_ids, ev_pos, ev_ngrams = np.unique(ev_doc, return_inverse=True,
                                          return_counts=True)
    order = np.lexsort((ev_pos, ev_gram))  # sort postings by gram hash
    vocab, starts, counts = np.unique(ev_gram[order], return_index=True,
                                      return_counts=True)
    offsets = np.concatenate([starts, [ev_gram.size]]).astype(np.int64)
    postings = ev_pos[order].astype(np.int64)
    n_eval = ev_ids.size
    logger.info("fuzzy_decontaminate: broadcasting %d eval docs / %d grams",
                n_eval, vocab.size)
    side_ref = ray.put((vocab, offsets, postings, ev_ids.astype(np.int64),
                        ev_ngrams.astype(np.int64)))

    # --- 2. map-only train scan
    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        vocab, offsets, postings, ev_ids, ev_ngrams = ray.get(side_ref)
        n_eval = ev_ids.size
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "eval_doc_id": pd.Series([], dtype=np.int64),
                "jaccard": pd.Series([], dtype=np.float64),
                "n_eval_hits": pd.Series([], dtype=np.int64),
            }
        )
        ids = batch["doc_id"].to_numpy()
        train = batch[ids % eval_mod != 0]
        if len(train) == 0 or n_eval == 0:
            return empty
        out_gram: List[str] = []
        out_loc: List[int] = []
        ngrams = np.zeros(len(train), dtype=np.int64)
        doc_ids = train["doc_id"].to_numpy().astype(np.int64)
        for loc, text in enumerate(train["text"]):
            grams = textnorm.word_ngrams(text or "", n)
            ngrams[loc] = len(grams)
            out_gram.extend(grams)
            out_loc.extend([loc] * len(grams))
        if not out_gram:
            return empty
        hashes = pd.util.hash_pandas_object(
            pd.Series(out_gram, dtype=object), index=False
        ).to_numpy().astype(np.int64)
        loc = np.asarray(out_loc, dtype=np.int64)
        pos = np.searchsorted(vocab, hashes)
        pos[pos == vocab.size] = 0
        hit = vocab[pos] == hashes
        if not hit.any():
            return empty
        hpos = pos[hit]
        hloc = loc[hit]
        seg_s = offsets[hpos]
        seg_n = offsets[hpos + 1] - seg_s
        total = int(seg_n.sum())
        # CSR gather: flatten each hit gram's posting range
        csum = np.concatenate([[0], np.cumsum(seg_n)])
        flat = np.repeat(seg_s, seg_n) + (np.arange(total) -
                                          np.repeat(csum[:-1], seg_n))
        pair_loc = np.repeat(hloc, seg_n)
        pair_ev = postings[flat]
        key = pair_loc * n_eval + pair_ev
        uk, inter = np.unique(key, return_counts=True)
        d_loc = uk // n_eval
        e_pos = uk % n_eval
        union = (ngrams[d_loc] + ev_ngrams[e_pos] - inter).astype(np.float64)
        raw = inter / union
        keep = raw >= threshold
        if not keep.any():
            return empty
        d_loc, e_pos, raw = d_loc[keep], e_pos[keep], raw[keep]
        # best match per doc: max raw, ties -> min eval id (lexsort is
        # stable; e_pos ascends within equal (d_loc, -raw) already by key
        # construction, but sort on it explicitly anyway)
        o = np.lexsort((ev_ids[e_pos], -raw, d_loc))
        d_s = d_loc[o]
        first = np.concatenate([[True], d_s[1:] != d_s[:-1]])
        hits = np.bincount(d_s, minlength=len(train))[d_s[first]]
        return pd.DataFrame(
            {
                "doc_id": doc_ids[d_s[first]],
                "eval_doc_id": ev_ids[e_pos[o][first]],
                "jaccard": np.floor(raw[o][first] * 1e6) / 1e6,
                "n_eval_hits": hits.astype(np.int64),
            }
        )

    return docs_ds.map_batches(scan, batch_format="pandas")


def fuzzy_decontaminate_sql(eval_mod: int = 97, n: int = 3,
                            threshold: float = 0.02) -> str:
    """DuckDB oracle: same grams (\\w+ over lowered text, <n-word docs fold
    to one joined gram), same raw-jaccard threshold/argmax, same 6dp floor."""
    concat = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '\\w+') AS ws
      FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(ws) < {n} THEN array_to_string(ws, ' ')
                  ELSE {concat} END AS gram
      FROM w
      JOIN (SELECT unnest(range(1, (SELECT CAST(COALESCE(max(len(ws)), 0) AS BIGINT) + 1 FROM w))) AS i) s
        ON i <= CASE WHEN len(ws) < {n} THEN 1 ELSE len(ws) - {n} + 1 END
      WHERE len(ws) > 0
    ), sz AS (
      SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id
    ), pj AS (
      SELECT t.doc_id, e.doc_id AS eval_doc_id, count(*) AS inter
      FROM g t JOIN g e ON t.gram = e.gram
      WHERE t.doc_id % {eval_mod} != 0 AND e.doc_id % {eval_mod} = 0
      GROUP BY 1, 2
    ), jac AS (
      SELECT pj.doc_id, pj.eval_doc_id,
             pj.inter * 1.0 / (st.n_grams + se.n_grams - pj.inter) AS raw
      FROM pj
      JOIN sz st ON st.doc_id = pj.doc_id
      JOIN sz se ON se.doc_id = pj.eval_doc_id
      WHERE pj.inter * 1.0 / (st.n_grams + se.n_grams - pj.inter) >= {threshold}
    )
    SELECT doc_id, eval_doc_id,
           floor(raw * 1000000) / 1000000 AS jaccard,
           n_eval_hits
    FROM (
      SELECT doc_id, eval_doc_id, raw,
             CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_eval_hits,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY raw DESC, eval_doc_id) AS rn
      FROM jac
    ) WHERE rn = 1
    """

"""Text-analysis operators over a documents table: token counting, quality
scoring, language-ID heuristic, fingerprinting.

These are the training-data-pipeline operators layered on the engine
(task contract) — all vectorized map_batches stages. Every formula is chosen
to be EXACTLY re-expressible in ANSI SQL (DuckDB) so the driver's
queries()/oracle_sql() parity check can hash-compare values:

  * counts are integers;
  * ratios are IEEE-double divisions of those integers, rounded to 6 dp —
    bit-identical between numpy float64 and DuckDB DOUBLE.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# token = letter-run | digit-run | single non-space symbol (BPE-ish pretokenizer)
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
WORD_PATTERN = r"[A-Za-z]+"
STOPWORDS = ("the", "a", "of", "and", "to")

_TOKEN_RE = re.compile(TOKEN_PATTERN)
_WORD_RE = re.compile(WORD_PATTERN)
_STOP_SET = set(STOPWORDS)


def token_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens — count of BPE-ish pretokens."""
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": batch["text"].map(lambda t: len(_TOKEN_RE.findall(t or ""))).astype("int64"),
        }
    )


def quality_features(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_chars, n_words, n_stop, stop_ratio, quality_score.

    quality_score = round(0.5 * min(n_words, 200)/200 + 0.5 * stop_ratio, 6)
    with stop_ratio = round(n_stop / max(n_words, 1), 6). A length+stopword
    quality heuristic in the spirit of C4/Gopher text-quality rules."""
    texts = batch["text"].fillna("")
    words = texts.map(lambda t: _WORD_RE.findall(t.lower()))
    n_words = words.map(len).astype("int64")
    n_stop = words.map(lambda ws: sum(1 for w in ws if w in _STOP_SET)).astype("int64")
    n_chars = texts.map(len).astype("int64")
    raw_ratio = n_stop.to_numpy() / np.maximum(n_words.to_numpy(), 1)
    # floor-truncate to 6dp instead of rounding: round() is half-even in
    # numpy but half-away in SQL engines, so exact-halfway ratios (n/128...)
    # would diverge; floor is unambiguous in both.
    stop_ratio = np.floor(raw_ratio * 1e6) / 1e6
    quality = np.floor(
        (0.5 * np.minimum(n_words.to_numpy(), 200) / 200.0 + 0.5 * raw_ratio) * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_words": n_words,
            "n_stop": n_stop,
            "stop_ratio": stop_ratio,
            "quality_score": quality,
        }
    )


def lang_id(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, en_score, predicted_lang — an n-gram/stopword language-ID
    heuristic: English-stopword ratio thresholded at 0.02 ('en' vs 'und')."""
    q = quality_features(batch)
    predicted = np.where(q["stop_ratio"].to_numpy() >= 0.02, "en", "und")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "en_score": q["stop_ratio"],
            "predicted_lang": predicted,
        }
    )


def exact_fingerprints(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, fingerprint — md5 of the raw text (exact-dup key)."""
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": batch["text"].map(
                lambda t: hashlib.md5((t or "").encode("utf-8")).hexdigest()
            ),
        }
    )


def winnow_fingerprints(batch: pd.DataFrame) -> pa.Table:
    """doc_id, fingerprints(list<int64>), n_fingerprints — winnowing-style
    rolling-hash document fingerprint (functions/textnorm.rolling_fingerprint).

    NOT SQL-expressible (why no oracle entry): the hash is uint64
    WRAPAROUND arithmetic — `h * 0x9E3779B97F4A7C15 mod 2^64` multiplies two
    64-bit values, whose 128-bit intermediate overflows DuckDB's signed
    HUGEINT (max 2^127 - 1), and DuckDB's UBIGINT ops error on overflow
    rather than wrapping; there is no mod-2^64 multiply to emulate the
    xorshift-multiply mix. Checked rows-only by the driver; exact behavior
    is pinned by unit tests instead."""
    from ..functions.textnorm import rolling_fingerprint

    fps = [rolling_fingerprint(t or "") for t in batch["text"]]
    return pa.table(
        {
            "doc_id": pa.array(batch["doc_id"].tolist(), pa.int64()),
            "fingerprints": pa.array(fps, pa.list_(pa.int64())),
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
        }
    )


def token_counts_sql() -> str:
    # COALESCE(text, '') mirrors the Python side's null -> "" mapping so the
    # contract survives null-bearing corpora (SQL length(NULL) is NULL).
    return f"""
    SELECT doc_id, CAST(length(regexp_extract_all(COALESCE(text, ''), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
    FROM documents
    """


def quality_features_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH w AS (
      SELECT doc_id,
             CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars,
             regexp_extract_all(lower(COALESCE(text, '')), '[a-z]+') AS words
      FROM documents
    ), c AS (
      SELECT doc_id, n_chars,
             CAST(length(words) AS BIGINT) AS n_words,
             CAST(length(list_filter(words, x -> x IN ({stop_list}))) AS BIGINT) AS n_stop
      FROM w
    )
    SELECT doc_id, n_chars, n_words, n_stop,
           floor((n_stop / greatest(n_words, 1)) * 1000000) / 1000000 AS stop_ratio,
           floor((0.5 * least(n_words, 200) / 200.0
                 + 0.5 * (n_stop / greatest(n_words, 1))) * 1000000) / 1000000 AS quality_score
    FROM c
    """


def lang_id_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '[a-z]+') AS words
      FROM documents
    ), c AS (
      SELECT doc_id,
             CAST(length(words) AS BIGINT) AS n_words,
             CAST(length(list_filter(words, x -> x IN ({stop_list}))) AS BIGINT) AS n_stop
      FROM w
    )
    SELECT doc_id,
           floor((n_stop / greatest(n_words, 1)) * 1000000) / 1000000 AS en_score,
           CASE WHEN floor((n_stop / greatest(n_words, 1)) * 1000000) / 1000000 >= 0.02
                THEN 'en' ELSE 'und' END AS predicted_lang
    FROM c
    """


def exact_fingerprints_sql() -> str:
    return "SELECT doc_id, md5(COALESCE(text, '')) AS fingerprint FROM documents"

"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These are engine extensions beyond the reference (task brief: "add the
operations a large-scale training-data pipeline would need"). Every definition
that has a SQL oracle is written to match the DuckDB expression in
__ray_entry__.oracle_sql exactly (names and semantics).

All stages are stateless vectorized map_batches; the language-ID stage is an
actor-pool class (compiled regex + stopword tables built once per actor).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\S+")

# tiny per-language stopword lists (public common words)
STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "por", "los"},
    "de": {"der", "die", "das", "und", "ist", "in", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
    "zh": {"的", "了", "是", "在", "我", "有", "和", "就", "不", "人"},
}


def token_counts(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (doc_id, n_tokens). n_tokens = number of maximal non-whitespace runs
    (matches `len(regexp_split_to_array(trim(text),'\\s+'))` with empty-string
    guard in the SQL oracle)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n = np.fromiter((len(_TOKEN_RE.findall(x or "")) for x in texts),
                        dtype=np.int64, count=len(texts))
        return pa.table({id_col: t.column(id_col),
                         "n_tokens": pa.array(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_scores(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (doc_id, n_chars, alpha_chars, digit_chars, ws_chars, alpha_ratio).

    Counts are vectorized pandas str.count with char classes mirroring the SQL
    regexp_replace-length oracles."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        n = s.str.len().astype("int64")
        alpha = s.str.count(r"[A-Za-z]").astype("int64")
        digit = s.str.count(r"[0-9]").astype("int64")
        ws = s.str.count(r"\s").astype("int64")
        out = pd.DataFrame({
            id_col: df[id_col],
            "n_chars": n,
            "alpha_chars": alpha,
            "digit_chars": digit,
            "ws_chars": ws,
            "alpha_ratio": np.where(n > 0, alpha / n.clip(lower=1), 0.0),
        })
        return out

    return ds.map_batches(fn, batch_format="pandas")


def fingerprints(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (doc_id, fingerprint). fingerprint = sha256 hex of the normalized
    text: lowercase, all whitespace runs collapsed to one space, trimmed —
    identical to the SQL
    sha256(trim(regexp_replace(lower(text),'\\s+',' ','g')))."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        fps = [hashlib.sha256(
            _WS_RE.sub(" ", (x or "").lower()).strip().encode("utf-8")
        ).hexdigest() for x in texts]
        return pa.table({id_col: t.column(id_col),
                         "fingerprint": pa.array(fps, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


class LangIdActor:
    """Stateful actor: stopword tables + tokenizer compiled once per actor
    (__init__), scored per batch (__call__). n-gram-free heuristic: predicted
    language = argmax stopword-hit ratio; 'und' (undetermined) when no
    stopword hits at all."""

    def __init__(self):
        self.token_re = re.compile(r"\w+", re.UNICODE)
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
        self.langs = sorted(self.tables)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").str.lower()
        preds, scores = [], []
        for x in texts:
            toks = self.token_re.findall(x)
            if not toks:
                preds.append("und"); scores.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang in self.langs:
                tab = self.tables[lang]
                hits = sum(1 for t in toks if t in tab)
                r = hits / len(toks)
                if r > best:
                    best_lang, best = lang, r
            preds.append(best_lang); scores.append(best)
        out = pd.DataFrame({"doc_id": df["doc_id"],
                            "pred_lang": preds,
                            "lang_score": scores})
        return out


def lang_id(ds: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(LangIdActor, batch_format="pandas",
                          batch_size=2048, concurrency=(1, concurrency),
                          num_cpus=1)

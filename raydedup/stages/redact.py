"""PII scrubbing: redact emails and URLs from a text column, with counts.

A standard pre-training cleaning pass (the C4/RefinedWeb pipelines scrub
URLs/emails before training); the reference has no text-rewrite operators
at all (SelfClean is embedding-space only). Pure per-batch Arrow RE2
kernels — `count_substring_regex` for the counts, `replace_substring_regex`
for the rewrite — so the stage is stateless, shuffle-free, and embarrassingly
parallel; DuckDB's regexp_replace runs the same RE2 syntax, which is what
makes the SQL oracle exact.

Order matters and is part of the contract: URLs are replaced FIRST (an
email-shaped substring inside a URL query string belongs to the URL), then
emails; the oracle replays the same order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# deliberately simple, RE2-portable patterns (no lookaround — RE2 has none)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_urls", pa.int64()),
                         ("n_emails", pa.int64()),
                         ("clean_text", pa.large_string())])


def redact_pii(ds: ray.data.Dataset, text_col: str = "text",
               id_col: str = "doc_id", url_token: str = "<URL>",
               email_token: str = "<EMAIL>") -> ray.data.Dataset:
    """-> (doc_id, n_urls, n_emails, clean_text)."""

    def fn(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(t.column(text_col), pa.large_string()), "")
        n_urls = pc.cast(pc.count_substring_regex(s, URL_RE), pa.int64())
        s = pc.replace_substring_regex(s, URL_RE, url_token)
        n_emails = pc.cast(pc.count_substring_regex(s, EMAIL_RE), pa.int64())
        s = pc.replace_substring_regex(s, EMAIL_RE, email_token)
        return pa.table({
            "doc_id": t.column(id_col).cast(pa.int64()),
            "n_urls": n_urls,
            "n_emails": n_emails,
            "clean_text": s,
        })

    return ds.map_batches(fn, batch_format="pyarrow")

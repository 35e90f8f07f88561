"""PII redaction (stages/redact.py): planted emails/URLs, replacement
order, DuckDB RE2 parity, null/empty text."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from raydedup.stages.redact import EMAIL_RE, URL_RE, redact_pii


def _table():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "mail me at a.b+c@example.co.uk today",
            "see https://example.com/x?mail=z@q.org deep link",  # email in URL
            "plain text, no pii at all",
            "two mails x@y.io and w@z.dev plus http://plain.org/x",
            None,
            "",
        ]),
    })


def test_redact_counts_and_order(ray_session):
    out = redact_pii(ray.data.from_arrow(_table())) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_emails) == [1, 0, 0, 2, 0, 0]
    assert list(out.n_urls) == [0, 1, 0, 1, 0, 0]
    # URL replaced first, so the email inside the URL never counts
    assert out.clean_text[1] == "see <URL> deep link"
    assert out.clean_text[0] == "mail me at <EMAIL> today"
    assert out.clean_text[3] == "two mails <EMAIL> and <EMAIL> plus <URL>"
    assert out.clean_text[4] == "" and out.clean_text[5] == ""


def test_redact_matches_duckdb(ray_session):
    t = _table()
    out = redact_pii(ray.data.from_arrow(t)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    ora = con.sql(f"""
        SELECT doc_id,
               len(regexp_extract_all(COALESCE(text, ''),
                   '{URL_RE}')) AS n_urls,
               len(regexp_extract_all(
                   regexp_replace(COALESCE(text, ''), '{URL_RE}', '<URL>',
                                  'g'), '{EMAIL_RE}')) AS n_emails,
               regexp_replace(
                   regexp_replace(COALESCE(text, ''), '{URL_RE}', '<URL>',
                                  'g'),
                   '{EMAIL_RE}', '<EMAIL>', 'g') AS clean_text
        FROM t ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(out[ora.columns], ora, check_dtype=False)

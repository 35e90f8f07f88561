"""Boundary gates the driver testdata cannot exercise (found by the
mutation kill-matrix, tools/mutation_gate.py): the shipped documents
contain no digits (alpha/digit drift was invisible to the quality_scores
oracle) and the shipped events have no same-user gap of exactly the
session gap (the > vs >= break rule was untested)."""

import pyarrow as pa
import ray.data

from raydedup.stages.textstats import quality_scores
from raydedup.stages.windows import session_windows


def test_quality_scores_alpha_digit_split(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["abc123 456\tx", "000111"]),
    })
    out = quality_scores(ray.data.from_arrow(t)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_chars) == [12, 6]
    assert list(out.alpha_chars) == [4, 0]      # digits must NOT count
    assert list(out.digit_chars) == [6, 6]
    assert list(out.ws_chars) == [2, 0]
    assert abs(out.alpha_ratio[0] - 4 / 12) < 1e-12


def test_session_gap_boundary_exact(ray_session):
    gap = 1800
    t0 = 1_700_000_000
    ev = pa.table({
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "ts": pa.array([t0 * 10**6, (t0 + gap) * 10**6,
                        (t0 + 2 * gap) * 10**6,
                        (t0 + 3 * gap + 1) * 10**6], pa.timestamp("us")),
    })
    out = session_windows(ray.data.from_arrow(ev), gap_s=gap) \
        .to_pandas().sort_values("session_start").reset_index(drop=True)
    # gaps of exactly gap_s do NOT break (strict >); the +1 gap does
    assert list(out.n_events) == [3, 1]
    assert int(out.session_start[0]) == t0
    assert int(out.session_end[0]) == t0 + 2 * gap
    assert int(out.session_start[1]) == t0 + 3 * gap + 1

"""Tests for the user-facing surfaces added on top of the core pipeline:
distance registry, auto-clean wiring, metadata export, windows."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raydedup.config import AutoCleanConfig, EngineConfig
from raydedup.issues import IssueType
from raydedup.pipeline import run_pipeline
from raydedup.registry import get_distance, register_distance


def test_projective_distance_identifies_antipodes():
    proj = get_distance("projective")
    v = np.array([[1.0, 0.0]])
    assert proj(v, -v)[0, 0] == pytest.approx(0.0)
    assert proj(v, v)[0, 0] == pytest.approx(0.0)
    w = np.array([[0.0, 1.0]])
    assert proj(v, w)[0, 0] == pytest.approx(1.0)
    cos = get_distance("cosine")
    assert cos(v, -v)[0, 0] == pytest.approx(1.0)   # cosine does NOT identify


def test_registry_plugging():
    with pytest.raises(KeyError):
        get_distance("nope")
    register_distance("always_zero", lambda a, b: np.zeros((len(a), len(b))))
    assert get_distance("always_zero")(np.ones((2, 3)),
                                       np.ones((4, 3))).sum() == 0


def test_autoclean_flags_and_ranking_invariance(tiny_corpus):
    """auto_issue column appears when enabled; the underlying ranking is
    unchanged by the cut-off setting (mirrors
    tests/unittests/cleaner/test_auto_cleaning.py:60-90)."""
    code, _ = tiny_corpus
    cfg_on = EngineConfig(autoclean=AutoCleanConfig(enabled=True))
    res_on = run_pipeline(rd.from_arrow(code), cfg_on,
                          issues_to_detect=[IssueType.NEAR_DUPLICATES])
    rp_on = res_on.ranked_pairs.to_pandas()
    assert "auto_issue" in rp_on.columns
    assert rp_on.auto_issue.dtype == bool

    res_off = run_pipeline(rd.from_arrow(code),
                           issues_to_detect=[IssueType.NEAR_DUPLICATES])
    rp_off = res_off.ranked_pairs.to_pandas()
    a = rp_on[["id_a", "id_b", "distance"]].reset_index(drop=True)
    b = rp_off[["id_a", "id_b", "distance"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_metadata_export(tiny_result, tiny_corpus):
    """get_issues(with_metadata=True) = the reference's DataFrame export with
    path columns joined per pair side (issue_manager.py:39-62)."""
    res, truth = tiny_result
    code, _ = tiny_corpus
    out = res.get_issues(IssueType.NEAR_DUPLICATES,
                         with_metadata=True).to_pandas()
    assert {"repo_a", "path_a", "repo_b", "path_b"} <= set(out.columns)
    assert len(out) == res.verified_pairs.count()
    # spot-check one id -> path mapping against the corpus
    import raydedup.kernels as K
    df = code.to_pandas()
    df["id"] = K.row_ids(df.repo.tolist(), df.path.tolist(),
                         df.commit.tolist())
    lookup = dict(zip(df.id, df.path))
    row = out.iloc[0]
    assert lookup[row.id_a] == row.path_a
    assert lookup[row.id_b] == row.path_b


def test_sensitivity_sweeps_monotone():
    """More permissive alpha (resp. larger q) never flags fewer scores —
    sweep parity with auto_cleaning_mixin.py:156-217's 17 log-spaced
    values for BOTH reference sweeps (q at fixed alpha=0.1; alpha at
    fixed q)."""
    from raydedup.stages.autoclean import (alpha_sensitivity,
                                           threshold_sensitivity)
    rng = np.random.default_rng(3)
    scores = 1 / (1 + np.exp(-np.concatenate([
        rng.normal(1.0, 1.0, 900), rng.normal(-7.0, 0.5, 100)])))
    for sweep, key in ((alpha_sensitivity(scores, 1000), "alpha"),
                       (threshold_sensitivity(scores, 1000), "q")):
        assert len(sweep) == 17
        assert all(key in s for s in sweep)
        flagged = [s["n_flagged"] for s in sweep]
        assert flagged == sorted(flagged)
        assert flagged[-1] > 0


def test_ivf_knn_recalls_bruteforce():
    """IVF with full probing == brute force; partial probing recalls most of
    the true top-k (approximate by design)."""
    from raydedup.stages.embedding import ivf_knn_search, knn_search
    import pyarrow as pa
    rng = np.random.default_rng(8)
    n, d, k, q = 300, 16, 5, 4
    mat = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([r.tolist() for r in mat],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    exact = knn_search(ds, mat[:q], ids[:q], k=k).to_pandas()
    full = ivf_knn_search(ds, mat[:q], ids[:q], k=k,
                          n_cells=16, n_probe=16).to_pandas()
    for qi in ids[:q]:
        e = exact[exact.query_id == qi].sort_values("rank").neighbor_id.tolist()
        f = full[full.query_id == qi].sort_values("rank").neighbor_id.tolist()
        assert e == f, f"full-probe IVF must equal brute force (query {qi})"
    approx = ivf_knn_search(ds, mat[:q], ids[:q], k=k,
                            n_cells=16, n_probe=6).to_pandas()
    hits = 0
    for qi in ids[:q]:
        e = set(exact[exact.query_id == qi].neighbor_id)
        a = set(approx[approx.query_id == qi].neighbor_id)
        hits += len(e & a)
    assert hits / (q * k) >= 0.5       # partial probe: approximate recall


def test_session_windows_simple():
    import pyarrow as pa

    from raydedup.stages.windows import session_windows
    base = 1_700_000_000
    rows = []
    for uid, offs in [(1, [0, 10, 20, 5000, 5010]), (2, [0])]:
        for o in offs:
            rows.append({"user_id": uid,
                         "ts": (base + o) * 1_000_000})
    t = pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
    })
    out = session_windows(rd.from_arrow(t), gap_s=1800).to_pandas() \
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(out) == 3
    u1 = out[out.user_id == 1]
    assert u1.n_events.tolist() == [3, 2]
    assert u1.session_start.tolist() == [base, base + 5000]
    assert u1.session_end.tolist() == [base + 20, base + 5010]


def test_hopping_window_assignment_and_aggregates():
    """Each event lands in ceil(width/hop) windows; a brute-force pandas
    replay of the assignment rule must agree exactly."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from raydedup.stages.windows import hopping_window
    rng = np.random.default_rng(3)
    base = 1_700_000_000
    ts_s = base + rng.integers(0, 20_000, size=400)
    etype = rng.integers(0, 3, size=400)
    val = rng.normal(size=400)
    t = pa.table({
        "ts": pa.array(ts_s * 1_000_000, pa.timestamp("us")),
        "event_type": pa.array(etype, pa.int64()),
        "value": pa.array(val, pa.float64()),
    })
    width, hop = 3600, 900
    out = hopping_window(rd.from_arrow(t), width_s=width, hop_s=hop) \
        .to_pandas().sort_values(["event_type", "window_start_s"]) \
        .reset_index(drop=True)

    rows = []
    for s, e, v in zip(ts_s, etype, val):
        m_hi = s // hop
        for k in range(-(-width // hop)):
            w = (m_hi - k) * hop
            if w + width > s and w >= 0:
                rows.append((e, w, v))
    ref = pd.DataFrame(rows, columns=["event_type", "window_start_s", "v"]) \
        .groupby(["event_type", "window_start_s"], as_index=False) \
        .agg(n_events=("v", "size"), sum_value=("v", "sum"),
             avg_value=("v", "mean")) \
        .sort_values(["event_type", "window_start_s"]).reset_index(drop=True)
    assert len(out) == len(ref)
    assert (out.event_type.values == ref.event_type.values).all()
    assert (out.window_start_s.values == ref.window_start_s.values).all()
    assert (out.n_events.values == ref.n_events.values).all()
    assert np.allclose(out.sum_value.values, ref.sum_value.values)
    assert np.allclose(out.avg_value.values, ref.avg_value.values)
    # every event contributes to exactly ceil(width/hop) windows here
    # (timestamps are far from epoch 0): total count = 4x events
    assert out.n_events.sum() == 4 * 400

"""fraction_cut parity vs an independent NumPy transliteration of the
documented reference semantics (auto_cleaning_mixin.py:91-154 + get_scale_loc
:219-227), FIXTURES F2. scipy logistic is closed-form:
ppf(p) = loc + scale*log(p/(1-p))."""

import numpy as np
import pytest

from raydedup.stages.autoclean import (fraction_cut_cutoff,
                                       fraction_cut_scores)


def reference_fraction_cut(scores, N, condensed_size, alpha=0.01, q=0.05):
    """Independent transliteration of the documented behavior (returns flags
    over the range-filtered array, as the reference does)."""
    M = len(scores)
    if M == condensed_size:
        alpha = alpha ** 2
    s = scores[(scores > 0) & (scores < 1)]
    logit = np.log(s / (1 - s))
    p = alpha
    prob = q * p * N / M
    def ppf(x):
        return np.log(x / (1 - x))
    x1, x2 = np.quantile(logit, p), np.quantile(logit, (0.5 * p) ** 0.5)
    y1, y2 = ppf(p), ppf((0.5 * p) ** 0.5)
    scale = (x1 - x2) / (y1 - y2)
    loc = (y1 * x2 - y2 * x1) / (y1 - y2)
    cutoff = ppf(prob) * scale + loc
    return logit < cutoff, cutoff


@pytest.mark.parametrize("seed", [1, 7, 42])
@pytest.mark.parametrize("pair_vector", [False, True])
def test_fraction_cut_parity(seed, pair_vector):
    rng = np.random.default_rng(seed)
    N = 60
    M = N * (N - 1) // 2 if pair_vector else N
    # mixture: bulk + a contaminated low tail (all strictly inside (0,1))
    bulk = 1 / (1 + np.exp(-rng.normal(1.0, 1.0, M - M // 20)))
    tail = 1 / (1 + np.exp(-rng.normal(-6.0, 0.5, M // 20)))
    scores = np.concatenate([bulk, tail])
    rng.shuffle(scores)

    ref_flags, ref_cut = reference_fraction_cut(
        scores, N, N * (N - 1) // 2, alpha=0.01, q=0.05)
    ours = fraction_cut_scores(scores, N, alpha=0.01, q=0.05)
    our_cut = fraction_cut_cutoff(scores, N, alpha=0.01, q=0.05)

    assert our_cut == pytest.approx(ref_cut)
    # all scores inside (0,1): positions align 1:1
    assert set(ours) == set(np.nonzero(ref_flags)[0])


def test_fraction_cut_empty_and_degenerate():
    assert len(fraction_cut_scores(np.empty(0), 10)) == 0
    assert fraction_cut_cutoff(np.array([0.0, 1.0]), 10) is None
    assert len(fraction_cut_scores(np.array([0.5]), 10)) == 0


def test_out_of_range_scores_never_flagged():
    rng = np.random.default_rng(3)
    scores = np.concatenate([np.zeros(5), rng.uniform(0.01, 0.99, 200),
                             np.ones(5)])
    idx = fraction_cut_scores(scores, 210, alpha=0.05, q=0.1)
    assert all(0 < scores[i] < 1 for i in idx)


def test_full_condensed_mode_reference_parity(tiny_corpus):
    """Opt-in full_condensed_m (round-4 verdict item 6): the near-dup cut
    is fitted on the FULL condensed N(N-1)/2 exact-Jaccard distance
    vector, exactly as the reference does (auto_cleaning_mixin.py:91-154
    over selfclean_cleaner.py:121-146's dense matrix) — so the length-
    based M == condensed detection squares alpha NATURALLY, and the
    cutoff equals the independent transliteration above on that vector.
    Checked in both signature layouts (stored and lean/recomputed
    shingles) and against the sparse default mode running side by side."""
    import ray.data as rd

    from raydedup.config import AutoCleanConfig, EngineConfig
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline
    from raydedup.stages.autoclean import condensed_distances

    code, _ = tiny_corpus
    n = code.num_rows
    alpha, q = 0.01, 0.05
    flags_by_mode = {}
    for store in (True, False):
        cfg = EngineConfig(autoclean=AutoCleanConfig(
            enabled=True, cut_off=alpha, significance=q,
            full_condensed_m=True))
        res = run_pipeline(rd.from_arrow(code), cfg=cfg,
                           issues_to_detect=[IssueType.NEAR_DUPLICATES],
                           store_shingles=store)
        rp = res.ranked_pairs.to_pandas()
        assert "auto_issue" in rp.columns
        # recompute the fit vector + transliterated reference cutoff
        sigs = res.signatures
        vec = condensed_distances(
            sigs, cfg,
            shingle_source=None if store else _ids_content(code))
        assert len(vec) == n * (n - 1) // 2
        ref_flags, ref_cut = reference_fraction_cut(
            vec, n, n * (n - 1) // 2, alpha=alpha, q=q)
        got_cut = fraction_cut_cutoff(vec, n, alpha=alpha, q=q,
                                      pair_rule=None)
        assert got_cut == pytest.approx(ref_cut, rel=1e-12)
        # the applied flags follow the cutoff exactly on the ranked surface
        s_cut = 1.0 / (1.0 + np.exp(-got_cut))
        want = (rp.distance > 0) & (rp.distance < 1) & (rp.distance < s_cut)
        assert (rp.auto_issue.values == want.values).all()
        flags_by_mode[store] = rp.sort_values(
            ["id_a", "id_b"]).auto_issue.values
    # layout-independence: stored vs lean shingles give identical flags
    assert (flags_by_mode[True] == flags_by_mode[False]).all()


def _ids_content(code):
    """(id, content) projection the lean path recomputes shingles from —
    matching what the pipeline passes as shingle_source (ingested ids)."""
    import ray.data as rd

    from raydedup.stages.ingest import ids_and_content, ingest
    return ids_and_content(ingest(rd.from_arrow(code)))


def test_cut_fit_report_emits_reference_plot_data():
    """cut_fit_report carries exactly what plot_frac_cut draws
    (plotting.py:101-165): anchors/cutoff consistent with the
    transliteration, sqrt-rule density histogram integrating to 1, the
    101-point logistic pdf grid, and a JSON-serializable payload."""
    import json

    from raydedup.stages.autoclean import cut_fit_report
    rng = np.random.default_rng(11)
    N = 60
    M = N * (N - 1) // 2
    scores = 1 / (1 + np.exp(-np.concatenate([
        rng.normal(1.0, 1.0, M - 40), rng.normal(-6.0, 0.5, 40)])))
    rep = cut_fit_report(scores, N)
    _, ref_cut = reference_fraction_cut(scores, N, M)
    assert rep["cutoff"] == pytest.approx(ref_cut)
    assert rep["alpha_effective"] == pytest.approx(0.01 ** 2)
    # density histogram integrates to ~1
    c = np.array(rep["hist_counts"]); e = np.array(rep["hist_edges"])
    assert np.sum(c * np.diff(e)) == pytest.approx(1.0, rel=1e-6)
    assert len(rep["fit_x"]) == len(rep["fit_pdf"]) == 101
    assert rep["fit_x"][0] == pytest.approx(rep["cutoff"])
    assert rep["fit_x"][-1] == pytest.approx(rep["q2"])
    json.dumps(rep)                                  # serializable
    # degenerate: all-boundary scores -> no fit, structured nulls
    empty = cut_fit_report(np.array([0.0, 1.0]), 10)
    assert empty["cutoff"] is None and empty["n_flagged"] == 0

"""Auto-cleaning cut-off: fraction_cut re-derived from the reference's
documented semantics (selfclean/cleaner/auto_cleaning_mixin.py:91-154; SURVEY
§2.5/§3) — NOT a code copy; scipy.stats.logistic is replaced by the closed-form
logistic quantile function.

Semantics: scores s in (0,1) are logit-transformed; a logistic distribution is
anchored to the left tail via two quantiles q and sqrt(0.5*q) of the logit
scores; the cut-off is the logistic ppf at probability (alpha * N / M) — with
alpha squared when the score vector is a pair vector (M == N(N-1)/2) — mapped
through the fitted loc/scale. Rows with logit score below the cut-off are
flagged as auto-issues.

This is a pure function of the score vector (+ N, M): the distributed part is
only collecting/approximating the score column; the scalar math runs on the
driver (SURVEY §2.5 "cut-off math is driver-side scalar").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _logit(x: np.ndarray) -> np.ndarray:
    return np.log(x / (1.0 - x))


def _logistic_ppf(p: float, loc: float, scale: float) -> float:
    return loc + scale * np.log(p / (1.0 - p))


def fraction_cut_scores(scores: np.ndarray, n_samples: int,
                        alpha: float = 0.01, q: float = 0.05) -> np.ndarray:
    """Return indices (into `scores`) flagged as issues.

    Mirrors the reference's observable behavior (auto_cleaning_mixin.py:91-154):
    - alpha is squared for pair score vectors (detected by M == N(N-1)/2,
      :102-105);
    - only scores strictly inside (0,1) participate (:106-109);
    - quantile anchors at p=alpha and (0.5*alpha)**0.5 of the logit scores,
      two-point logistic fit (get_scale_loc, :219-227);
    - cut-off = logistic_ppf(q * alpha * N / M) * scale + loc (:112-121);
    - flagged = logit score < cutoff.

    Deviation (documented): the reference returns positions into the
    range-filtered array (:125-154); we map flags back to positions in the
    ORIGINAL score vector — identical whenever all scores lie in (0,1).
    """
    return np.nonzero(_flags_with_rule(scores, n_samples, alpha, q,
                                       pair_rule=None))[0]


def fraction_cut_cutoff(scores: np.ndarray, n_samples: int,
                        alpha: float = 0.01, q: float = 0.05,
                        pair_rule: bool | None = None) -> float | None:
    """The logit-space cut-off value, or None when undefined.

    pair_rule: force the alpha-squared pair treatment. The reference detects
    pair vectors by M == N(N-1)/2 (auto_cleaning_mixin.py:102-105); our pair
    sets are sparse so M never equals the condensed size — callers scoring
    pair vectors pass pair_rule=True explicitly. None keeps the reference's
    length-based detection (used by the parity tests)."""
    M = len(scores)
    if M == 0:
        return None
    N = n_samples
    a = alpha
    if pair_rule or (pair_rule is None and M == N * (N - 1) // 2):
        a = alpha ** 2
    inside = (scores > 0.0) & (scores < 1.0)
    ls = _logit(scores[inside])
    if len(ls) < 2:
        return None
    p1 = a
    p2 = float((0.5 * a) ** 0.5)
    x1 = float(np.quantile(ls, p1))
    x2 = float(np.quantile(ls, p2))
    # two-point quantile fit: x = loc + scale * logistic_ppf(p) at p1, p2
    z1 = float(np.log(p1 / (1.0 - p1)))
    z2 = float(np.log(p2 / (1.0 - p2)))
    scale = (x1 - x2) / (z1 - z2)
    loc = (z1 * x2 - z2 * x1) / (z1 - z2)
    prob = q * a * N / M
    if not (0.0 < prob < 1.0):
        return None
    return _logistic_ppf(prob, loc, scale)


def alpha_sensitivity(scores: np.ndarray, n_samples: int,
                      q: float = 0.05,
                      pair_rule: bool | None = None) -> list[dict]:
    """Contamination-guess sweep: rerun fraction_cut over 17 log-spaced
    alpha = 2^-10 .. 2^-2 at fixed q (reference alpha_sensitivity,
    auto_cleaning_mixin.py:186-217, alphas = 2 ** np.linspace(-10, -2, 17));
    one record per alpha with the flagged count. Driver-side scalar math on
    a cached score vector — cheap by construction (SURVEY §2.5)."""
    alphas = 2 ** np.linspace(-10, -2, 17)
    return [{"alpha": float(a),
             "n_flagged": int(_flags_with_rule(
                 scores, n_samples, float(a), q, pair_rule).sum())}
            for a in alphas]


def threshold_sensitivity(scores: np.ndarray, n_samples: int,
                          alpha: float = 0.1,
                          pair_rule: bool | None = None) -> list[dict]:
    """Significance sweep matching the reference threshold_sensitivity
    (auto_cleaning_mixin.py:156-184): q = 2^-10 .. 2^-2 (17 log-spaced
    values) at fixed alpha = 0.1; one record per q with the flagged count."""
    qs = 2 ** np.linspace(-10, -2, 17)
    return [{"q": float(q),
             "n_flagged": int(_flags_with_rule(
                 scores, n_samples, alpha, float(q), pair_rule).sum())}
            for q in qs]


def _flags_with_rule(scores, n_samples, alpha, q, pair_rule):
    cutoff = fraction_cut_cutoff(scores, n_samples, alpha, q,
                                 pair_rule=pair_rule)
    flags = np.zeros(len(scores), dtype=bool)
    if cutoff is None:
        return flags
    inside = (scores > 0.0) & (scores < 1.0)
    flags[inside] = _logit(scores[inside]) < cutoff
    return flags


def fraction_cut_dataset(ds: ray.data.Dataset, score_col: str, n_samples: int,
                         alpha: float = 0.01, q: float = 0.05,
                         ascending: bool = True,
                         pair_rule: bool | None = None,
                         fit_ds: ray.data.Dataset | None = None,
                         fit_scores: np.ndarray | None = None
                         ) -> ray.data.Dataset:
    """Attach an `auto_issue` bool column to a scored Dataset.

    The score column is collected to the driver (bounded: one float per row of
    the *scored* dataset — pairs already filtered to >= threshold, or per-file
    scores, never the raw N(N-1)/2 vector), the cut-off is computed once, and
    applied as a vectorized map_batches. When `fit_ds` is given, the quantile
    anchors and M come from ITS score column while the flag is applied to
    `ds` — used to fit the near-dup cut on distance-metric pairs only while
    tagging the full ranked surface (substring rows land above the cut).
    `fit_scores` overrides both with a ready-made fit vector — the
    full-condensed reference-parity path passes condensed_distances()
    output here (with pair_rule=None so the reference's length-based
    alpha**2 detection decides)."""
    if fit_scores is not None:
        col = np.asarray(fit_scores, dtype=np.float64)
    else:
        col = np.concatenate([
            b.column(score_col).to_numpy(zero_copy_only=False)
            for b in (fit_ds if fit_ds is not None else ds)
            .select_columns([score_col]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20)] or
            [np.empty(0, np.float64)])
    s = col if ascending else 1.0 - col
    cutoff = fraction_cut_cutoff(s, n_samples, alpha, q, pair_rule=pair_rule)
    # cut-off maps back to score space via sigmoid (logit is monotone), so the
    # tag is order-independent of block iteration order.
    s_cut = -np.inf if cutoff is None else 1.0 / (1.0 + np.exp(-cutoff))

    def tag(t: pa.Table) -> pa.Table:
        x = t.column(score_col).to_numpy(zero_copy_only=False)
        sx = x if ascending else 1.0 - x
        flag = (sx > 0.0) & (sx < 1.0) & (sx < s_cut)
        return t.append_column("auto_issue", pa.array(flag, pa.bool_()))

    return ds.map_batches(tag, batch_format="pyarrow")


def condensed_distances(sigs: ray.data.Dataset, cfg,
                        shingle_source: ray.data.Dataset | None = None,
                        max_n: int | None = None) -> np.ndarray:
    """The FULL condensed N(N-1)/2 exact-Jaccard distance vector — the
    reference's fraction_cut input (selfclean_cleaner.py:121-146 builds
    the dense pairwise matrix; auto_cleaning_mixin.py:102-105 detects the
    condensed length to square alpha). Opt-in reference-parity mode: the
    engine's default near-dup fit uses sparse verified pairs precisely to
    NEVER materialize this vector, so this helper refuses N beyond
    cfg.autoclean.full_condensed_max_n.

    Execution: shingle sets are collected once into a broadcast object
    (bounded by max_n); every i-row fans out to its (i, j>i) pairs inside
    map_batches — no shuffle anywhere — and each pair's exact Jaccard uses
    the same segmented-intersection kernel as the verify plane, so a
    distance here is bit-identical to the verified `distance` of the same
    pair. Order of the returned vector is unspecified (fraction_cut's
    quantile math is order-invariant)."""
    import ray

    from raydedup import kernels as K
    from raydedup.util import collect_up_to, unpack_u64_flat

    if max_n is None:
        max_n = cfg.autoclean.full_condensed_max_n
    sub = sigs.select_columns(
        ["id", "shingles"]) if shingle_source is None else None
    if sub is None:
        from raydedup.stages.signatures import compute_shingle_sets
        sub = compute_shingle_sets(shingle_source, cfg)
    tbl = collect_up_to(sub, max_n)
    if tbl is None:
        raise ValueError(
            f"full_condensed_m is a small-N reference-parity mode "
            f"(O(N^2) pairs); the corpus exceeds "
            f"full_condensed_max_n={max_n} rows")
    n = tbl.num_rows
    if n < 2:
        return np.empty(0, np.float64)
    flat, offs = unpack_u64_flat(tbl.column("shingles"))
    bref = ray.put((flat, offs))

    def pair_block(t: "pa.Table") -> "pa.Table":
        rows = t.column("id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bflat, boffs = ray.get(bref)
        counts = (n - 1 - rows).clip(min=0)
        ia = np.repeat(rows, counts)
        ib = np.concatenate(
            [np.arange(i + 1, n, dtype=np.int64) for i in rows]) \
            if len(rows) else np.empty(0, np.int64)
        inter = K.segmented_intersection_sizes2(
            bflat, boffs, ia, bflat, boffs, ib).astype(np.float64)
        la = (boffs[ia + 1] - boffs[ia]).astype(np.int64)
        lb = (boffs[ib + 1] - boffs[ib]).astype(np.int64)
        union = (la + lb).astype(np.float64) - inter
        both_empty = (la + lb) == 0
        jac = np.where(both_empty, 1.0, inter / np.maximum(union, 1.0))
        dist = np.clip(1.0 - jac, 0.0, 1.0)
        return pa.table({"distance": pa.array(dist, pa.float64())})

    out = ray.data.range(n, override_num_blocks=max(1, min(64, n // 8))) \
        .map_batches(pair_block, batch_format="pyarrow", batch_size=64)
    parts = [b.column("distance").to_numpy(zero_copy_only=False)
             for b in out.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20)]
    return np.concatenate(parts) if parts else np.empty(0, np.float64)


def cut_fit_report(scores: np.ndarray, n_samples: int,
                   alpha: float = 0.01, q: float = 0.05,
                   pair_rule: bool | None = None,
                   bins: int | str = "sqrt") -> dict:
    """The DATA behind the reference's fraction_cut plot
    (utils/plotting.py:101-165 plot_frac_cut / subplot_frac_cut —
    plotting itself is a sanctioned non-goal, SURVEY §2.1; this emits
    everything those axes draw, as plain JSON-serializable values):

    - the two quantile anchors q1/q2 (plotting.py:131-144 vertical lines
      + span), the fitted loc/scale and the cutoff (:157-161);
    - the log-density histogram of the logit scores (:145-153 — same
      default bins='sqrt' rule, density-normalized counts);
    - the fitted logistic pdf sampled on the same 101-point grid
      [cutoff, q2] the reference plots (:154-156), via the closed form
      pdf(z) = e^-z / (1+e^-z)^2 (scipy-free);
    - n_flagged under the cut.

    Driver-side scalar math on a collected score vector, like every
    other fraction_cut surface (SURVEY §2.5)."""
    M = len(scores)
    out: dict = {"M": int(M), "N": int(n_samples), "alpha": float(alpha),
                 "q": float(q)}
    a = alpha
    if pair_rule or (pair_rule is None and M == n_samples *
                     (n_samples - 1) // 2):
        a = alpha ** 2
    out["alpha_effective"] = float(a)
    inside = (scores > 0.0) & (scores < 1.0)
    ls = _logit(scores[inside])
    cutoff = fraction_cut_cutoff(scores, n_samples, alpha, q,
                                 pair_rule=pair_rule)
    if cutoff is None or len(ls) < 2:
        out.update({"cutoff": None, "loc": None, "scale": None,
                    "q1": None, "q2": None, "n_flagged": 0,
                    "hist_counts": [], "hist_edges": [],
                    "fit_x": [], "fit_pdf": []})
        return out
    p1, p2 = a, float((0.5 * a) ** 0.5)
    x1, x2 = float(np.quantile(ls, p1)), float(np.quantile(ls, p2))
    z1 = float(np.log(p1 / (1.0 - p1)))
    z2 = float(np.log(p2 / (1.0 - p2)))
    scale = (x1 - x2) / (z1 - z2)
    loc = (z1 * x2 - z2 * x1) / (z1 - z2)
    nb = int(np.ceil(np.sqrt(len(ls)))) if bins == "sqrt" else int(bins)
    counts, edges = np.histogram(ls, bins=nb, density=True)
    xg = np.linspace(cutoff, x2, 101)
    zg = (xg - loc) / scale
    pdf = np.exp(-zg) / (1.0 + np.exp(-zg)) ** 2 / scale
    out.update({
        "cutoff": float(cutoff), "loc": float(loc), "scale": float(scale),
        "q1": x1, "q2": x2,
        "n_flagged": int((ls < cutoff).sum()),
        "hist_counts": counts.tolist(), "hist_edges": edges.tolist(),
        "fit_x": xg.tolist(), "fit_pdf": pdf.tolist(),
    })
    return out

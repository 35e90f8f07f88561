"""Incremental dedup gates.

The reference has no incremental surface (SelfClean refits the full matrix,
selfclean/cleaner/selfclean_cleaner.py:105-146); the contract here is defined
against the engine's OWN full pipeline: the incremental pair set must equal
the full run's verified pairs restricted to pairs touching the increment, and
the keep-delta must be exactly the new docs whose incremental component
contains no base doc and no smaller new doc.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raydedup import kernels as K
from raydedup.config import EngineConfig
from raydedup.stages import candidates as C
from raydedup.stages import incremental as INC
from raydedup.stages.ingest import ingest
from raydedup.stages.signatures import compute_signatures


def _split(code: pa.Table, mod: int = 5, rem: int = 4):
    idx = np.arange(code.num_rows)
    new_mask = (idx % mod) == rem
    return (code.filter(pa.array(~new_mask)),
            code.filter(pa.array(new_mask)))


@pytest.fixture(scope="module")
def inc_run(tiny_corpus):
    code, _ = tiny_corpus
    base_tbl, new_tbl = _split(code)
    cfg = EngineConfig()
    base_sigs = compute_signatures(
        ingest(rd.from_arrow(base_tbl)), cfg).materialize()
    res = INC.incremental_on_files(rd.from_arrow(new_tbl), base_sigs, cfg)
    new_ids = set(res.new_signatures.select_columns(["id"])
                  .to_pandas()["id"])
    return res, new_ids


def _pair_set(df: pd.DataFrame) -> set:
    return set(zip(df.id_a, df.id_b, df.match_kind,
                   np.round(df.jaccard.to_numpy(), 9)))


def test_incremental_pairs_match_full_run(inc_run, tiny_result):
    """Pair-for-pair parity: incremental pairs == full-run verified pairs
    restricted to pairs with >= 1 increment endpoint."""
    res, new_ids = inc_run
    full, _ = tiny_result
    fdf = full.verified_pairs.to_pandas()
    fdf = fdf[fdf.id_a.isin(new_ids) | fdf.id_b.isin(new_ids)]
    idf = res.pairs.to_pandas()
    assert (idf.id_a < idf.id_b).all()
    assert not idf.duplicated(subset=["id_a", "id_b"]).any()
    assert len(fdf) > 0          # the split must actually cut dup groups
    assert _pair_set(idf) == _pair_set(fdf)


def test_keep_delta_semantics(inc_run):
    """Every kept new doc has no distance pair to base or to another kept
    doc; every dropped new doc's component holds a base doc or a smaller
    new doc."""
    res, new_ids = inc_run
    kept = set(res.keep_delta.to_pandas()["id"])
    assert kept <= new_ids
    dist = res.pairs.to_pandas()
    dist = dist[dist.match_kind != "substring"]
    # no edge between two kept docs, none between kept and base
    for a, b in zip(dist.id_a, dist.id_b):
        assert not (a in kept and b in kept)
        assert not (a in kept and b not in new_ids)
        assert not (b in kept and a not in new_ids)
    # dropped <=> component has an old doc or a smaller new doc
    lab = res.clusters.to_pandas().set_index("id")["cluster_id"].to_dict()
    by_cluster = {}
    for i, c in lab.items():
        by_cluster.setdefault(c, []).append(i)
    for n in new_ids:
        members = by_cluster.get(lab.get(n, n), [n])
        has_old = any(m not in new_ids for m in members)
        min_new = min(m for m in members if m in new_ids)
        expect_keep = (not has_old) and n == min_new
        assert (n in kept) == expect_keep, n


def test_empty_increment(tiny_corpus):
    code, _ = tiny_corpus
    cfg = EngineConfig()
    base_sigs = compute_signatures(
        ingest(rd.from_arrow(code)), cfg).materialize()
    empty = code.slice(0, 0)
    res = INC.incremental_on_files(rd.from_arrow(empty), base_sigs, cfg)
    assert res.pairs.count() == 0
    assert res.keep_delta.count() == 0


def test_planted_micro_semantics():
    """Hand-planted case: new exact copy of base -> exact pair + dropped;
    new near-dup of base -> near pair + dropped; unique new doc -> kept."""
    lines = [f"def f{i}(x):\n    return x + {i}\n" for i in range(40)]
    base_a = "".join(lines)
    base_c = "".join(f"class C{i}:\n    val = {i * 7}\n" for i in range(40))
    near_b = base_c.replace("val = 7\n", "val = 700\n")      # 1-line edit
    uniq_d = "".join(f"print('zebra quark {i}')\n" for i in range(40))

    def tbl(rows):
        return pa.table({
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array(["c0"] * len(rows)),
            "lang": pa.array(["py"] * len(rows)),
            "content": pa.array([r[2] for r in rows], pa.large_string()),
        })

    base = tbl([("r", "a.py", base_a), ("r", "c.py", base_c)])
    new = tbl([("r", "a2.py", base_a), ("r", "b.py", near_b),
               ("r", "d.py", uniq_d)])
    ids = dict(zip(["a", "c"], K.row_ids(["r", "r"], ["a.py", "c.py"],
                                         ["c0", "c0"])))
    ids.update(zip(["a2", "b", "d"], K.row_ids(
        ["r"] * 3, ["a2.py", "b.py", "d.py"], ["c0"] * 3)))

    cfg = EngineConfig()
    base_sigs = compute_signatures(ingest(rd.from_arrow(base)), cfg) \
        .materialize()
    res = INC.incremental_on_files(rd.from_arrow(new), base_sigs, cfg)
    df = res.pairs.to_pandas()
    kinds = {(min(a, b), max(a, b)): k
             for a, b, k in zip(df.id_a, df.id_b, df.match_kind)}
    pa_ = (min(ids["a"], ids["a2"]), max(ids["a"], ids["a2"]))
    pb = (min(ids["c"], ids["b"]), max(ids["c"], ids["b"]))
    assert kinds.get(pa_) == "exact"
    assert kinds.get(pb) == "near_dup"
    kept = set(res.keep_delta.to_pandas()["id"])
    assert kept == {ids["d"]}


def test_forced_fallback_paths(monkeypatch):
    """DRIVER_SMALL_LIMIT=0 + broadcast_id_limit=0 force every broadcast
    lookup in the incremental path onto its join fallback; the pair set must
    not change. Runs on a reduced corpus: the cost under forced fallbacks is
    ~a dozen hash-join aggregator spin-ups, not data volume."""
    from raydedup import corpus
    from raydedup.pipeline import run_pipeline
    code, _ = corpus.generate(80, seed=7)
    base_tbl, new_tbl = _split(code, mod=3, rem=2)

    full = run_pipeline(rd.from_arrow(code)).verified_pairs.to_pandas()

    cfg = EngineConfig(broadcast_id_limit=0, cc_driver_edge_limit=0)
    monkeypatch.setattr(C, "DRIVER_SMALL_LIMIT", 0)
    base_sigs = compute_signatures(
        ingest(rd.from_arrow(base_tbl)), cfg).materialize()
    res = INC.incremental_on_files(rd.from_arrow(new_tbl), base_sigs, cfg)
    new_ids = set(res.new_signatures.select_columns(["id"])
                  .to_pandas()["id"])
    fdf = full[full.id_a.isin(new_ids) | full.id_b.isin(new_ids)]
    assert len(fdf) > 0
    assert _pair_set(res.pairs.to_pandas()) == _pair_set(fdf)
    kept = set(res.keep_delta.to_pandas()["id"])
    dist = res.pairs.to_pandas()
    dist = dist[dist.match_kind != "substring"]
    for a, b in zip(dist.id_a, dist.id_b):
        assert not (a in kept and b in kept)


def test_mixed_cap_fallback_parity(ray_session):
    """broadcast_id_limit=0 with DRIVER_SMALL_LIMIT left at its default
    routes the bucket prune through _semi_join's BROADCAST branch (the
    fused-prune path needs the gkey budget; the all-zeros fallback test
    forces _semi_join onto its hash-join branch instead) — the one
    combination the mutation kill-matrix found unexercised. Pair parity
    with the full pipeline must hold."""
    from raydedup import corpus
    from raydedup.pipeline import run_pipeline
    code, _ = corpus.generate(80, seed=7)
    base_tbl, new_tbl = _split(code, mod=3, rem=2)

    full = run_pipeline(rd.from_arrow(code)).verified_pairs.to_pandas()

    cfg = EngineConfig(broadcast_id_limit=0)
    base_sigs = compute_signatures(
        ingest(rd.from_arrow(base_tbl)), cfg).materialize()
    res = INC.incremental_on_files(rd.from_arrow(new_tbl), base_sigs, cfg)
    new_ids = set(res.new_signatures.select_columns(["id"])
                  .to_pandas()["id"])
    fdf = full[full.id_a.isin(new_ids) | full.id_b.isin(new_ids)]
    assert len(fdf) > 0
    assert _pair_set(res.pairs.to_pandas()) == _pair_set(fdf)

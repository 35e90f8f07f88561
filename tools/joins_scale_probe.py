# Dev harness (not part of the engine): throughput probe for the temporal
# join operators (stages/joins.py) on a synthetic multi-million-row event
# log, including a deliberately hot key (one user owning ~2% of all events)
# to show the hash-partition + in-partition-vectorized design doesn't
# degrade per-key the way a map_groups-per-user design would.
#
# Usage: python tools/joins_scale_probe.py [ROWS] [NUM_CPUS] [--json OUT]
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
    else 5_000_000
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 32
JSON_OUT = None
if "--json" in sys.argv:
    JSON_OUT = sys.argv[sys.argv.index("--json") + 1]

import ray
import ray.data as rd

ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False

N_USERS = max(50, ROWS // 2000)
BLOCK = 250_000
HOT_FRAC = 50          # 1/50 of rows land on user 0 (hot key)


def gen(block):
    i = block["id"].to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(int(i[0]) + 1)
    uid = rng.integers(1, N_USERS, len(i))
    uid[i % HOT_FRAC == 0] = 0
    return pa.table({
        "event_id": pa.array(i, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(rng.integers(1_700_000_000, 1_731_536_000,
                                    len(i)) * 1_000_000,
                       pa.timestamp("us")),
        "side": pa.array((i % 3 == 0).astype(np.int8)),
        "value": pa.array(rng.random(len(i)) * 40, pa.float64()),
    })


base = rd.range(ROWS, override_num_blocks=max(NCPU, ROWS // BLOCK)) \
    .map_batches(gen, batch_format="pyarrow").materialize()


def pick(v):
    import pyarrow.compute as pc
    return lambda t: t.filter(pc.equal(t.column("side"), v)) \
        .drop_columns(["side"])


left = base.map_batches(pick(1), batch_format="pyarrow")
right = base.map_batches(pick(0), batch_format="pyarrow")

from raydedup.stages.joins import asof_join, range_join_agg  # noqa: E402

out = {"rows": ROWS, "num_cpus": NCPU, "n_users": N_USERS,
       "hot_user_rows": ROWS // HOT_FRAC}
t0 = time.time()
n1 = asof_join(left, right).count()
out["asof_wall_s"] = round(time.time() - t0, 2)
out["asof_rows_per_s"] = round(ROWS / out["asof_wall_s"])
t0 = time.time()
n2 = range_join_agg(left, right, width_us=86_400_000_000).count()
out["range_wall_s"] = round(time.time() - t0, 2)
out["range_rows_per_s"] = round(ROWS / out["range_wall_s"])
out["n_left"] = n1
assert n1 == n2
print(json.dumps(out))
if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump(out, f, indent=1)
ray.shutdown()

# Dev harness (not part of the engine): throughput probe for benchmark
# decontamination (stages/decontaminate.py) — synthetic train corpus vs a
# smaller eval set with planted overlaps, measuring the broadcast
# semi-join's per-doc cost at millions of rows.
#
# Usage: python tools/decontaminate_scale_probe.py [TRAIN_ROWS] [NUM_CPUS]
#        [--json OUT]
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
    else 2_000_000
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 32
JSON_OUT = None
if "--json" in sys.argv:
    JSON_OUT = sys.argv[sys.argv.index("--json") + 1]

import ray
import ray.data as rd

ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False

EVAL_ROWS = max(1000, ROWS // 40)
WORDS = 4000
DOC_TOKENS = 60
BLOCK = 100_000


def gen(block):
    i = block["id"].to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(int(i[0]) + 99)
    toks = rng.integers(0, WORDS, (len(i), DOC_TOKENS))
    # every 37th train doc copies a deterministic eval phrase
    plant = (i % 37 == 0)
    toks[plant, 10:18] = np.arange(8) + WORDS       # shared eval phrase ids
    texts = [" ".join(f"w{v}" for v in row) for row in toks]
    return pa.table({"doc_id": pa.array(i, pa.int64()),
                     "text": pa.array(texts, pa.large_string())})


def gen_eval(block):
    i = block["id"].to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(int(i[0]) + 7)
    toks = rng.integers(0, WORDS, (len(i), DOC_TOKENS))
    toks[:, 20:28] = np.arange(8) + WORDS           # the same phrase
    texts = [" ".join(f"w{v}" for v in row) for row in toks]
    return pa.table({"doc_id": pa.array(i, pa.int64()),
                     "text": pa.array(texts, pa.large_string())})


train = rd.range(ROWS, override_num_blocks=max(NCPU, ROWS // BLOCK)) \
    .map_batches(gen, batch_format="pyarrow").materialize()
ev = rd.range(EVAL_ROWS, override_num_blocks=max(4, EVAL_ROWS // BLOCK)) \
    .map_batches(gen_eval, batch_format="pyarrow").materialize()

from raydedup.stages.decontaminate import decontaminate, eval_gram_keys

out = {"train_rows": ROWS, "eval_rows": EVAL_ROWS, "num_cpus": NCPU}
t0 = time.time()
keys = eval_gram_keys(ev, n=5)
out["eval_gram_wall_s"] = round(time.time() - t0, 2)
out["eval_grams"] = int(len(keys))
t0 = time.time()
n_cont = decontaminate(train, keys, n=5).count()
out["flag_wall_s"] = round(time.time() - t0, 2)
out["contaminated_docs"] = int(n_cont)
out["train_docs_per_s"] = round(ROWS / out["flag_wall_s"])
expect = len(range(0, ROWS, 37))
out["expected_planted"] = expect
assert n_cont >= expect, (n_cont, expect)
print(json.dumps(out))
if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump(out, f, indent=1)
ray.shutdown()

"""SimHash verification gate (dev harness, not part of the engine).

simhash_dup_pairs is the one driver query without a SQL oracle (the 64-bit
bit-vote over splitmix chains is not SQL-expressible from raw text). This
gate closes the gap as far as the driver contract allows: a brute-force
O(N^2) driver-sim over the SAME per-doc fingerprints checks, at small N,

  1. soundness      — every emitted pair really has Hamming <= 3, and the
                      emitted `hamming` column equals the recomputed value;
  2. completeness   — every pair of banded docs (n_shingles > 0) with
                      Hamming <= 3 IS emitted: any two 64-bit values within
                      Hamming 3 agree on at least one of the 4 16-bit bands
                      (pigeonhole), so the banding plane guarantees recall;
  3. canonicality   — id_a < id_b on every row, no duplicate pairs.

The per-doc fingerprint function is shared with the engine (it is gated
separately by tests/test_kernels.py); what this verifies is the distributed
plane — band explode, bucket groupby, pair dedupe, join, verify.

Usage: simhash_gate.py [SF_DIR | --planted] [--json OUT]
"""
import json
import os
import sys

import numpy as np

args = list(sys.argv[1:])
JSON_OUT = None
if "--json" in args:
    i = args.index("--json")
    JSON_OUT = args[i + 1]
    del args[i:i + 2]
sys.path.insert(0, "/root/repo")
if args and args[0] == "--planted":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from planted_corpus import build_planted
    SF = build_planted()
else:
    SF = args[0] if args else "/root/testdata/sf0.01"

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd

rd.DataContext.get_current().enable_progress_bars = False

from raydedup import kernels as K
from raydedup.config import EngineConfig
from raydedup.stages.ingest import documents_as_code_files, ingest
from raydedup.stages.signatures import compute_signatures
from raydedup.stages.simhash import simhash_pairs

MAX_HAMMING = 3

cfg = EngineConfig()
sigs = compute_signatures(ingest(documents_as_code_files(SF)), cfg,
                          with_simhash=True).materialize()

# engine (distributed plane) output
emitted = simhash_pairs(sigs, cfg).to_pandas()

# brute-force driver-sim over the same fingerprints
st = sigs.select_columns(["id", "simhash", "n_shingles"]).to_pandas()
keep = st.n_shingles > 0           # engine bands only non-empty docs
ids = st.id.to_numpy()[keep.to_numpy()].astype(np.int64)
sh = st.simhash.to_numpy()[keep.to_numpy()].astype(np.int64) \
    .view(np.uint64)
order = np.argsort(ids)
ids, sh = ids[order], sh[order]
n = len(ids)
ii, jj = np.triu_indices(n, k=1)
ham = K.hamming64(sh[ii], sh[jj]).astype(np.int64)
m = ham <= MAX_HAMMING
expect = {(int(ids[a]), int(ids[b])): int(h)
          for a, b, h in zip(ii[m], jj[m], ham[m])}

got = {(int(r.id_a), int(r.id_b)): int(r.hamming)
       for r in emitted.itertuples()}

canonical = bool((emitted.id_a < emitted.id_b).all()) if len(emitted) \
    else True
unique = len(got) == len(emitted)
missing = sorted(set(expect) - set(got))
extra = sorted(set(got) - set(expect))
wrong_h = sorted(k for k in (set(got) & set(expect))
                 if got[k] != expect[k])

result = {
    "sf_dir": SF,
    "max_hamming": MAX_HAMMING,
    "docs_banded": int(n),
    "brute_pairs_le3": len(expect),
    "emitted_pairs": len(got),
    "hamming_histogram": {
        str(h): int((ham[m] == h).sum()) for h in range(MAX_HAMMING + 1)},
    "completeness_ok": not missing,
    "soundness_ok": not extra and not wrong_h,
    "canonical_ok": canonical,
    "unique_ok": unique,
    "missing": [list(k) for k in missing[:20]],
    "extra": [list(k) for k in extra[:20]],
    "wrong_hamming": [list(k) for k in wrong_h[:20]],
}
ok = result["completeness_ok"] and result["soundness_ok"] \
    and result["canonical_ok"] and result["unique_ok"]
result["status"] = "ok" if ok else "fail"
print(json.dumps({k: v for k, v in result.items()
                  if k not in ("missing", "extra", "wrong_hamming")},
                 indent=2))
if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {JSON_OUT}")
ray.shutdown()
sys.exit(0 if ok else 1)

"""Ray-free signature-kernel contention probe.

Adjudicates the 1.6M-row strong-scaling gap: runs the EXACT signature-stage
kernel chain (tokenize_hash_arrow -> shingle_hashes -> segmented_unique ->
minhash_from_sorted_unique -> packers) on identical real corpus batches in P
concurrent processes with NO Ray and NO object store, and reports per-process
CPU seconds for the same fixed work. If per-task CPU inflates with P here,
the inflation is hardware resource contention (shared LLC / memory-latency
under concurrency on this VM), not engine or Ray overhead — it bounds the
best strong-scaling ANY engine could measure on this host:
  silicon_ceiling(P_lo -> P_hi) = cpu_total(P_lo) / cpu_total(P_hi).

Usage: python tools/kernel_contention_probe.py [--procs 1,4,16]
       [--batches-per-proc 4] [--corpus DIR]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

CORPUS = "/tmp/raydedup_bench_corpus_1600000_42/code_files"
BATCH_ROWS = 12_500  # matches sig_batch_size-scale batches in the probe runs


def _worker(q: mp.Queue, file_idx: int, batches: int, start_at: float) -> None:
    import pyarrow.parquet as pq

    from raydedup.config import EngineConfig
    from raydedup.stages.signatures import SignatureActor

    files = sorted(os.listdir(CORPUS))
    path = os.path.join(CORPUS, files[file_idx % len(files)])
    tbl = pq.read_table(path, columns=["content"]).combine_chunks()
    # ingest-equivalent columns the actor expects
    import pyarrow as pa
    n = min(BATCH_ROWS, tbl.num_rows)
    batch = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "content_sha256": pa.array([b"\x00" * 32] * n, pa.binary()),
        "lang": pa.array(["py"] * n, pa.string()),
        "content": tbl.column("content").slice(0, n),
    })
    actor = SignatureActor(EngineConfig())
    actor(batch.slice(0, 256))  # warm caches/JIT outside the timed window
    while time.time() < start_at:
        time.sleep(0.001)
    t0w = time.perf_counter()
    t0c = time.process_time()
    for _ in range(batches):
        actor(batch)
    q.put((time.process_time() - t0c, time.perf_counter() - t0w))


def measure(procs: int, batches: int) -> dict:
    q: mp.Queue = mp.Queue()
    start_at = time.time() + 3.0 + 0.5 * procs  # barrier after all warmed
    ps = [mp.Process(target=_worker, args=(q, i, batches, start_at))
          for i in range(procs)]
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    cpu = sum(r[0] for r in res)
    wall = max(r[1] for r in res)
    return {
        "procs": procs,
        "batches_per_proc": batches,
        "cpu_total_s": round(cpu, 2),
        "cpu_per_batch_s": round(cpu / (procs * batches), 3),
        "wall_s": round(wall, 2),
    }


def main() -> None:
    procs = [1, 4, 16]
    batches = 4
    args = sys.argv[1:]
    if "--procs" in args:
        procs = [int(s) for s in args[args.index("--procs") + 1].split(",")]
    if "--batches-per-proc" in args:
        batches = int(args[args.index("--batches-per-proc") + 1])
    global CORPUS
    if "--corpus" in args:
        CORPUS = args[args.index("--corpus") + 1]
    levels = [measure(p, batches) for p in procs]
    base = levels[0]["cpu_per_batch_s"]
    out = {
        "metric": "signature_kernel_cpu_vs_concurrency",
        "corpus": CORPUS,
        "batch_rows": BATCH_ROWS,
        "levels": levels,
        "cpu_inflation_vs_first": {
            str(l["procs"]): round(l["cpu_per_batch_s"] / base, 3)
            for l in levels
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

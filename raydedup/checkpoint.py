"""Per-stage Parquet checkpoints with manifest + resume.

Replaces the reference's incidental memmap spill files
(selfclean/cleaner/selfclean_cleaner.py:71-75, 105-114) with the batch-engine
meaning of "resumable from checkpoint" (north_star): each stage writes a
directory of part files plus a manifest JSON recording input/config hashes,
row count and throughput; a resumed run reuses any stage whose manifest
matches instead of recomputing — including stages downstream of a completed
shuffle (resume mid-shuffle).

Atomicity: data is written to `<dir>.tmp` then renamed; the manifest is
written last, so a partially-written stage is never mistaken for complete.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import ray.data


def config_hash(cfg) -> str:
    import hashlib
    from dataclasses import asdict
    try:
        payload = json.dumps(asdict(cfg), sort_keys=True, default=str)
    except TypeError:
        payload = repr(cfg)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


@dataclass
class StageMetrics:
    rows: int
    wall_s: float
    rows_per_s: float


@dataclass
class CheckpointManager:
    root: str
    cfg_hash: str
    input_token: str = ""            # hash/path of the pipeline input
    metrics: dict = field(default_factory=dict)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.manifest.json")

    def complete(self, stage: str) -> bool:
        m = self._manifest(stage)
        if not os.path.exists(m):
            return False
        try:
            with open(m) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return (meta.get("cfg_hash") == self.cfg_hash
                and meta.get("input_token") == self.input_token
                and os.path.isdir(self._dir(stage)))

    def load(self, stage: str) -> ray.data.Dataset:
        return ray.data.read_parquet(self._dir(stage))

    def save(self, stage: str, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Write the stage output atomically, record lineage + throughput,
        return a Dataset re-read from the checkpoint (so downstream lineage
        roots at the file, which is what makes mid-pipeline resume work)."""
        out = self._dir(stage)
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.perf_counter()
        ds.write_parquet(tmp)
        wall = time.perf_counter() - t0
        shutil.rmtree(out, ignore_errors=True)
        os.replace(tmp, out)
        reread = ray.data.read_parquet(out)
        rows = reread.count()
        metrics = StageMetrics(rows=rows, wall_s=round(wall, 3),
                               rows_per_s=round(rows / wall, 1) if wall else 0.0)
        self.metrics[stage] = metrics
        with open(self._manifest(stage), "w") as f:
            json.dump({
                "stage": stage,
                "cfg_hash": self.cfg_hash,
                "input_token": self.input_token,
                "rows": rows,
                "wall_s": metrics.wall_s,
                "rows_per_s": metrics.rows_per_s,
                "parts": sorted(os.listdir(out)),
            }, f, indent=2)
        return reread

    def stage(self, name: str, build: Callable[[], ray.data.Dataset]
              ) -> ray.data.Dataset:
        """Memoized stage: reuse the checkpoint when the manifest matches
        (lineage: same config + same input), else build + save."""
        if self.complete(name):
            return self.load(name)
        return self.save(name, build())

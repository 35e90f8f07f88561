"""Job entrypoint: `ray job submit -- python -m raydedup --input ... --output ...`

Owns the Ray session (the library never calls ray.init): connects to the
cluster named by RAY_ADDRESS (the address a `ray job submit` runtime
injects), or starts a local one. Runs the flagship pipeline streaming end to
end, consumes every result surface with write_parquet into per-surface
directories (resumable output: one directory per surface, many files per
directory — never one giant file), and writes a metrics JSON with wall
time, row counts and throughput.

North-star parity: "The job runs via ray job submit on fixed N-node and
4N-node clusters with streaming execution end to end" (BASELINE.json);
cluster sizing is external to the job — the same command works on any
cluster size because every stage's parallelism follows the cluster CPU
count, not a hardcoded node count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m raydedup",
        description="Near-duplicate detection + cleaning ranking over a "
                    "(repo,path,commit,lang,content) Parquet table.")
    ap.add_argument("--input", required=True,
                    help="input Parquet file/dir (input_hint shape)")
    ap.add_argument("--output", required=True,
                    help="output dir; one sub-dir of Parquet per surface")
    ap.add_argument("--ckpt-dir", default=None,
                    help="per-partition checkpoint dir (resume on rerun)")
    ap.add_argument("--write-signatures", action="store_true",
                    help="also persist the signature table as a surface "
                         "(the stored base a later --base-sigs run needs)")
    ap.add_argument("--base-sigs", default=None,
                    help="INCREMENTAL mode: dedupe --input (the new files) "
                         "against this stored signature Parquet dir from a "
                         "prior --write-signatures run; base content is "
                         "never re-scanned. Surfaces: incremental pairs, "
                         "keep_delta, clusters, new_signatures (append to "
                         "the base dir for the next increment)")
    ap.add_argument("--issues", default="near_duplicates",
                    help="comma list: near_duplicates,off_topic,label_errors")
    ap.add_argument("--threshold", type=float, default=None,
                    help="verify Jaccard threshold (default 0.7)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (ignored under a cluster)")
    ap.add_argument("--metrics-out", default=None,
                    help="metrics JSON path (default <output>/metrics.json)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS")
        if addr and addr != "local":
            ray.init(address=addr)
        else:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)

    from raydedup.config import EngineConfig, VerifyConfig
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_on_parquet

    cfg = EngineConfig()
    if args.threshold is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, verify=dataclasses.replace(VerifyConfig(),
                                            threshold=args.threshold))
    def issue_of(s: str) -> IssueType:
        # accept both enum VALUES (off_topic_samples) and NAMES (off_topic)
        try:
            return IssueType.canonical(s)
        except ValueError:
            return IssueType.canonical(IssueType[s.upper()])

    issues = [issue_of(s.strip())
              for s in args.issues.split(",") if s.strip()]

    t0 = time.perf_counter()
    if args.base_sigs is not None:
        # incremental job: the only content scan is the increment's
        import ray.data as rd

        from raydedup.stages.incremental import incremental_on_files
        from raydedup.stages.ingest import read_code_files
        # canonical signature projection: a --write-signatures surface from
        # a checkpointed run may carry a ckpt_part column, and union with
        # the increment's fresh signatures needs identical schemas
        sig_cols = ["id", "content_sha256", "lang", "n_shingles",
                    "minhash", "shingles", "simhash"]
        # size the increment read's blocks at the source (same fusion as
        # run_on_parquet: read -> ingest -> signatures with no content
        # exchange through the object store)
        from raydedup.pipeline import _target_blocks
        # flags that only the full pipeline honors: fail loudly instead of
        # silently producing a run without the asked-for surfaces
        dropped = [f for f, on in [
            ("--issues", args.issues != "near_duplicates"),
            ("--ckpt-dir", args.ckpt_dir is not None),
            ("--write-signatures", args.write_signatures)] if on]
        if dropped:
            ap.error(f"{', '.join(dropped)} not supported with --base-sigs "
                     "(incremental mode always writes new_signatures and "
                     "has no checkpoint/issue surfaces)")
        src = read_code_files(args.input)
        pre = False
        try:
            n_new = src.count()            # parquet: metadata-only
            cpus = int(ray.cluster_resources().get("CPU", 4))
            src = read_code_files(args.input,
                                  num_blocks=_target_blocks(n_new, cpus))
            pre = True
        except Exception:
            pass
        inc = incremental_on_files(
            src, rd.read_parquet(args.base_sigs, columns=sig_cols), cfg,
            pre_blocked=pre)
        surfaces = {
            "incremental_pairs": inc.pairs,
            "keep_delta": inc.keep_delta,
            "clusters": inc.clusters,
            "new_signatures": inc.new_signatures,
        }
    else:
        # --write-signatures output must be a SELF-CONTAINED stored base
        # (a later --base-sigs run reads its shingles column), so it forces
        # the full signature schema; plain runs use the lean table
        res = run_on_parquet(args.input, cfg, issues_to_detect=issues,
                             ckpt_dir=args.ckpt_dir,
                             store_shingles=True if args.write_signatures
                             else None)
        from raydedup.stages.cluster import keep_representatives
        surfaces = {
            "verified_pairs": res.verified_pairs,
            "clusters": res.clusters,
            "keep_list": (keep_representatives(res.clusters)
                          if res.clusters is not None else None),
            "duplicity": res.duplicity,
            "ranked_pairs": res.ranked_pairs,
            "label_errors": res.label_errors,
        }
        if args.write_signatures:
            surfaces["signatures"] = res.signatures
    metrics: dict = {"input": args.input, "surfaces": {}}
    n_rows = None
    for name, ds in surfaces.items():
        if ds is None:
            continue
        t1 = time.perf_counter()
        out_dir = os.path.join(args.output, name)
        # materialize once: write_parquet + count would otherwise each
        # execute the lazy plan from scratch (2x wall for the unpinned
        # surfaces); materialized blocks spill via the object store
        ds = ds.materialize()
        ds.write_parquet(out_dir)
        cnt = ds.count()
        metrics["surfaces"][name] = {
            "rows": cnt, "write_secs": round(time.perf_counter() - t1, 3),
            "path": out_dir,
        }
        if name == ("new_signatures" if args.base_sigs is not None
                    else "clusters"):
            n_rows = cnt
    if args.base_sigs is None and res.clusters is not None \
            and res.verified_pairs is not None:
        # one-row corpus report (operator-facing headline numbers)
        from raydedup.issues import dedup_summary
        metrics["summary"] = dedup_summary(res).to_pylist()[0]
    wall = time.perf_counter() - t0
    metrics["wall_secs"] = round(wall, 3)
    if n_rows:
        metrics["files_per_s"] = round(n_rows / wall, 1)
    mpath = args.metrics_out or os.path.join(args.output, "metrics.json")
    os.makedirs(os.path.dirname(mpath) or ".", exist_ok=True)
    with open(mpath, "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())

# Dev harness (not part of the engine): mutation kill-matrix — proves the
# oracle/pytest gates are sensitive, not vacuous. Each mutant re-introduces
# a realistic engine bug (several are bugs this repo actually had and
# fixed); the harness applies it to the working tree, runs the designated
# gate, requires the gate to FAIL (mutant killed), and restores the file.
#
# Refuses to run on a dirty tree (restoration is `git checkout --`).
#
# Usage: python tools/mutation_gate.py [--json OUT]
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

MUTANTS = [
    {
        "name": "pair_canonical_flip",
        "desc": "dedupe emits (max,min) instead of canonical (min,max)",
        "file": "raydedup/stages/candidates.py",
        "old": '''        out = pa.table({"id_a": pa.array(uniq[:, 0], pa.int64()),
                        "id_b": pa.array(uniq[:, 1], pa.int64())})''',
        "new": '''        out = pa.table({"id_a": pa.array(uniq[:, 1], pa.int64()),
                        "id_b": pa.array(uniq[:, 0], pa.int64())})''',
        "gate": ["correctness", "minhash_dup_pairs"],
    },
    {
        "name": "containment_probe_short",
        "desc": "prefix-filter probe count one short (the pre-fix bug)",
        "file": "raydedup/stages/containment.py",
        "old": "            np.floor(counts * frac + 1e-6).astype(np.int64) + 1, counts)",
        "new": "            np.floor(counts * frac + 1e-6).astype(np.int64), counts)",
        "gate": ["pytest",
                 "tests/test_round3.py::test_containment_probe_count_exact_rational",
                 "tests/test_round3.py::test_containment_pair_at_exact_threshold_found"],
    },
    {
        "name": "asof_tie_min_eid",
        "desc": "as-of (key,ts) tie resolves to MIN event_id instead of max",
        "file": "raydedup/stages/joins.py",
        "old": "    order = np.lexsort((eid, side, ts, k))",
        "new": "    order = np.lexsort((-eid, side, ts, k))",
        "gate": ["pytest",
                 "tests/test_joins.py::test_asof_join_tie_rule_and_partition_invariance"],
    },
    {
        "name": "quality_alpha_regex_drift",
        "desc": "alpha_chars counts digits too",
        "file": "raydedup/stages/textstats.py",
        "old": '''        alpha = pc.cast(pc.count_substring_regex(s, "[A-Za-z]"), pa.int64())
        digit''',
        "new": '''        alpha = pc.cast(pc.count_substring_regex(s, "[A-Za-z0-9]"), pa.int64())
        digit''',
        "gate": ["pytest",
                 "tests/test_gate_boundaries.py::test_quality_scores_alpha_digit_split"],
    },
    {
        "name": "session_gap_inclusive",
        "desc": "session breaks at gap == gap_s (off-by-one boundary)",
        "file": "raydedup/stages/windows.py",
        "old": "    breaks[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_s)",
        "new": "    breaks[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] >= gap_s)",
        "gate": ["pytest",
                 "tests/test_gate_boundaries.py::test_session_gap_boundary_exact"],
    },
    {
        "name": "decontaminate_backstop_grams",
        "desc": "short docs keep the MinHash backstop gram (non-strict)",
        "file": "raydedup/stages/decontaminate.py",
        "old": "    short = (lens > 0) & (lens < n)",
        "new": "    short = (lens > 0) & (lens < 0)",
        "gate": ["pytest",
                 "tests/test_decontaminate.py::test_short_docs_have_no_grams"],
    },
    {
        "name": "lsh_band_starvation",
        "desc": "LSH runs 4 of the configured 32 bands (recall collapse)",
        "file": "raydedup/config.py",
        "old": "    bands: int = 32",
        "new": "    bands: int = 4",
        "gate": ["pytest",
                 "tests/test_pipeline.py::test_cluster_recall_vs_oracle"],
    },
    {
        "name": "incremental_prune_inverted",
        "desc": "bucket prune keeps only NON-matching base band rows",
        "file": "raydedup/stages/incremental.py",
        "old": """            m = pc.is_in(t.column(col), value_set=vals)
            return t.filter(pc.fill_null(m, False))""",
        "new": """            m = pc.is_in(t.column(col), value_set=vals)
            return t.filter(pc.invert(pc.fill_null(m, False)))""",
        "gate": ["pytest",
                 "tests/test_incremental.py::test_mixed_cap_fallback_parity"],
    },
    # ---- round-5 additions (round-4 verdict item 8): the round-4
    # operators' most plausible silent-drift bugs ----
    {
        "name": "quantile_rank_drift",
        "desc": "lower/disc rank convention drifts to ceil",
        "file": "raydedup/stages/quantiles.py",
        "old": "    return int(np.floor(q * (n - 1) + 1e-9))",
        "new": "    return int(np.ceil(q * (n - 1) - 1e-9))",
        "gate": ["correctness", "column_quantiles"],
    },
    {
        "name": "stratified_rank_flip",
        "desc": "per-group sample keeps the LARGEST hash ranks",
        "file": "raydedup/stages/sample.py",
        "old": '''    out = top_k_per_group(ranked, group_col, "_srank", id_col, k,
                          descending=False)''',
        "new": '''    out = top_k_per_group(ranked, group_col, "_srank", id_col, k,
                          descending=True)''',
        "gate": ["correctness", "stratified_sample"],
    },
    {
        "name": "dedup_report_rule_inversion",
        "desc": "report counts representatives as the duplicates",
        "file": "raydedup/issues.py",
        "old": '        dup = pc.not_equal(t.column("id"), t.column("cluster_id"))',
        "new": '        dup = pc.equal(t.column("id"), t.column("cluster_id"))',
        "gate": ["correctness", "dedup_report"],
    },
    {
        "name": "lean_shingle_mixup",
        "desc": "lean-verify gathers shingle segments without the mh-order "
                "indirection (rows pair with the wrong shingle set)",
        "file": "raydedup/stages/verify.py",
        "old": "    gflat, goffs = _gather_segments(flat, offs, sperm[inv])",
        "new": "    gflat, goffs = _gather_segments(flat, offs, sperm)",
        "gate": ["pytest",
                 "tests/test_round4.py::test_lean_run_bit_identical_to_stored"],
    },
]


def run_gate(gate):
    if gate[0] == "correctness":
        p = subprocess.run(
            [sys.executable, "tools/check_correctness.py", SF, gate[1]],
            capture_output=True, text=True, cwd=REPO)
        txt = p.stdout + p.stderr
        killed = ("FAIL" in txt) or ("ERROR" in txt) or p.returncode != 0
        return killed, txt[-400:]
    p = subprocess.run([sys.executable, "-m", "pytest", "-x", "-q",
                        *gate[1:]],
                       capture_output=True, text=True, cwd=REPO)
    return p.returncode != 0, (p.stdout + p.stderr)[-400:]


def main():
    # -uno: untracked files (e.g. evidence JSONs a concurrent probe is
    # writing) don't block — restoration only needs TRACKED files clean
    dirty = subprocess.run(["git", "status", "--porcelain", "-uno"],
                           capture_output=True, text=True, cwd=REPO)
    if dirty.stdout.strip():
        print("refusing: working tree dirty"); sys.exit(2)
    out = []
    for m in MUTANTS:
        path = os.path.join(REPO, m["file"])
        src = open(path).read()
        assert m["old"] in src, (m["name"], "pattern drifted")
        try:
            open(path, "w").write(src.replace(m["old"], m["new"], 1))
            killed, tail = run_gate(m["gate"])
        finally:
            subprocess.run(["git", "checkout", "--", m["file"]], cwd=REPO)
        row = {"mutant": m["name"], "desc": m["desc"], "file": m["file"],
               "gate": " ".join(m["gate"][1:]), "killed": bool(killed)}
        print(json.dumps(row), flush=True)
        if not killed:
            row["gate_tail"] = tail
        out.append(row)
    summary = {"mutants": len(out),
               "killed": sum(r["killed"] for r in out),
               "survivors": [r["mutant"] for r in out if not r["killed"]],
               "results": out}
    print(json.dumps({k: v for k, v in summary.items() if k != "results"}))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(summary, f, indent=1)
    sys.exit(0 if summary["killed"] == len(out) else 1)


if __name__ == "__main__":
    main()

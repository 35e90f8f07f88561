"""Deterministic synthetic source-code corpus with planted defects (FIXTURES F1).

Generates the BASELINE.json input_hint table
(repo, path, commit, lang, content) plus a sidecar truth table
(repo, path, commit, group_id, defect_kind) used only by tests.

Planted defects mirror the reference's unit fixtures (SURVEY §5):
exact_dup (test_embedding_distance.py:22-40), near_dup_line_edit,
near_dup_rename, substring_copy, boilerplate_hot_band, far_outlier
(test_lad_scoring.py:9-19), lang_mislabel (test_intra_extra_distance.py:28-46).

All generation is seeded; no wall-clock, no external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = ["py", "js", "go", "java", "rs"]
_KEYWORDS = {
    "py": ["def", "return", "if", "else", "for", "in", "import", "class", "None"],
    "js": ["function", "return", "if", "else", "for", "const", "let", "var"],
    "go": ["func", "return", "if", "else", "for", "package", "import", "var"],
    "java": ["public", "static", "void", "return", "if", "else", "class", "new"],
    "rs": ["fn", "return", "if", "else", "for", "let", "mut", "pub", "impl"],
}
_LICENSE_HEADER = "\n".join(
    f"// Copyright (c) The Project Authors — line {i}. All rights reserved."
    for i in range(15)
) + "\n"


def _ident(rng: np.random.Generator, vocab_size: int = 4000) -> str:
    return f"sym_{int(rng.integers(vocab_size))}"


def _make_file(rng: np.random.Generator, lang: str, n_lines: int) -> str:
    kw = _KEYWORDS[lang]
    lines = []
    for _ in range(n_lines):
        shape = int(rng.integers(4))
        a, b, c = _ident(rng), _ident(rng), _ident(rng)
        k = kw[int(rng.integers(len(kw)))]
        if shape == 0:
            lines.append(f"{k} {a}({b}, {c}):")
        elif shape == 1:
            lines.append(f"    {a} = {b} + {c} * {int(rng.integers(100))}")
        elif shape == 2:
            lines.append(f"    {k} {a}.{b}({c})")
        else:
            lines.append(f"    # {a} {b} {c}")
    return "\n".join(lines) + "\n"


def _mutate_lines(rng: np.random.Generator, content: str, n_edits: int) -> str:
    lines = content.split("\n")
    idx = rng.choice(max(len(lines) - 1, 1), size=min(n_edits, max(len(lines) - 1, 1)),
                     replace=False)
    for i in idx:
        lines[int(i)] = f"    {_ident(rng)} = {_ident(rng)}  # edited"
    return "\n".join(lines)


def _rename_idents(rng: np.random.Generator, content: str) -> str:
    # rename a handful of identifiers (tests normalizer sensitivity)
    import re
    syms = sorted(set(re.findall(r"sym_\d+", content)))
    if not syms:
        return content
    pick = rng.choice(len(syms), size=min(5, len(syms)), replace=False)
    for j in pick:
        content = content.replace(syms[int(j)], f"SYM_{int(rng.integers(10**6))}")
    return content


def _commit(seed: int, i: int) -> str:
    return hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()


def generate(n_rows: int = 200, seed: int = 42):
    """Return (code_files: pa.Table, truth: pa.Table).

    ~70% base files, the rest planted defects in fixed proportions.
    truth.group_id links files that are true near/exact duplicates.

    Output has EXACTLY n_rows rows except when n_rows is smaller than a
    single planted group (< ~5): groups are never split, so tiny requests
    may overshoot by at most one group (3 rows). The budget guards below
    consume no rng draws, so any corpus whose planted mix fits (every
    n_rows >= ~30) is byte-identical to the unguarded generator the
    recorded bench invariants were measured on."""
    rng = np.random.default_rng(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    t_group, t_kind = [], []
    row = 0

    def emit(content, lang, kind, group):
        nonlocal row
        repos.append(f"org{row % 7}/repo{row % 23}")
        paths.append(f"src/mod{row % 11}/file{row}.{lang}")
        commits.append(_commit(seed, row))
        langs.append(lang)
        contents.append(content)
        t_group.append(group)
        t_kind.append(kind)
        row += 1

    n_boiler = max(min(n_rows // 10, 600), 8) if n_rows >= 80 else 0
    n_outlier = 3 if n_rows >= 50 else 1
    n_dup_groups = max(n_rows // 40, 2)
    n_near_groups = max(n_rows // 30, 2)
    n_rename = max(n_rows // 100, 1)
    # substring pairs sit at J ~ 0.5 where LSH candidacy is ~94% per pair;
    # plant enough groups that majority-detection assertions are stable
    n_substr = max(n_rows // 50, 4)
    n_mislabel = max(n_rows // 100, 1)

    gid = 0
    # exact duplicate groups (2-4 copies)
    for _ in range(n_dup_groups):
        if row + 2 > n_rows:
            break
        lang = LANGS[int(rng.integers(len(LANGS)))]
        base = _make_file(rng, lang, int(rng.integers(30, 120)))
        for _ in range(int(rng.integers(2, 5))):
            emit(base, lang, "exact_dup", gid)
        gid += 1
    # near-dup line-edit groups (base + 1-3 mutants, 1-5 line edits each)
    for _ in range(n_near_groups):
        if row + 2 > n_rows:
            break
        lang = LANGS[int(rng.integers(len(LANGS)))]
        base = _make_file(rng, lang, int(rng.integers(60, 200)))
        emit(base, lang, "near_dup_line_edit", gid)
        for _ in range(int(rng.integers(1, 4))):
            emit(_mutate_lines(rng, base, int(rng.integers(1, 6))),
                 lang, "near_dup_line_edit", gid)
        gid += 1
    # identifier-rename pairs
    for _ in range(n_rename):
        if row + 2 > n_rows:
            break
        lang = LANGS[int(rng.integers(len(LANGS)))]
        base = _make_file(rng, lang, int(rng.integers(60, 150)))
        emit(base, lang, "near_dup_rename", gid)
        emit(_rename_idents(rng, base), lang, "near_dup_rename", gid)
        gid += 1
    # substring copies: A embedded verbatim in larger B
    for _ in range(n_substr):
        if row + 2 > n_rows:
            break
        lang = LANGS[int(rng.integers(len(LANGS)))]
        a = _make_file(rng, lang, int(rng.integers(40, 80)))
        b = _make_file(rng, lang, 30) + a + _make_file(rng, lang, 30)
        emit(a, lang, "substring_copy", gid)
        emit(b, lang, "substring_copy", gid)
        gid += 1
    # boilerplate hot band: shared 15-line header, random bodies
    for _ in range(n_boiler):
        if row >= n_rows:
            break
        lang = LANGS[int(rng.integers(len(LANGS)))]
        emit(_LICENSE_HEADER + _make_file(rng, lang, int(rng.integers(40, 120))),
             lang, "boilerplate_hot_band", -1)
    # far outliers: disjoint vocabulary
    for _ in range(n_outlier):
        if row >= n_rows:
            break
        blob = " ".join(f"zq{int(rng.integers(10**9)):x}" for _ in range(200))
        emit(blob, "py", "far_outlier", -1)
    # lang mislabel: exact dup pair, one side wrong lang
    for _ in range(n_mislabel):
        if row + 2 > n_rows:
            break
        base = _make_file(rng, "py", int(rng.integers(40, 100)))
        emit(base, "py", "lang_mislabel", gid)
        emit(base, "js", "lang_mislabel", gid)   # wrong lang on the copy
        gid += 1
    # filler base files
    while row < n_rows:
        lang = LANGS[int(rng.integers(len(LANGS)))]
        emit(_make_file(rng, lang, int(rng.integers(30, 300))), lang, "base", -1)

    code = pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.large_string()),
    })
    truth = pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "group_id": pa.array(t_group, pa.int64()),
        "defect_kind": pa.array(t_kind, pa.string()),
    })
    return code, truth


def _gen_chunk(args):
    import pyarrow.parquet as pq
    out_path, n, seed = args
    code, _ = generate(n, seed)
    pq.write_table(code, out_path)
    return out_path


def write_corpus_parallel(out_dir: str, n_rows: int, seed: int = 42,
                          num_files: int = 16, procs: int = 16) -> str:
    """Deterministic parallel corpus generation: chunk i uses seed*1000+i, so
    output depends only on (n_rows, seed, num_files). Used by bench for the
    large scaling corpora; planted-defect mixes are per-chunk."""
    import multiprocessing as mp
    import os
    code_dir = os.path.join(out_dir, "code_files")
    os.makedirs(code_dir, exist_ok=True)
    # keep chunks comfortably above generate()'s planted-group floor so the
    # total is exactly n_rows (16 tiny chunks would each round up)
    num_files = max(1, min(num_files, n_rows // 64 or 1))
    per = (n_rows + num_files - 1) // num_files
    jobs = [(os.path.join(code_dir, f"part-{i:05d}.parquet"),
             min(per, n_rows - i * per), seed * 1000 + i)
            for i in range(num_files) if n_rows - i * per > 0]
    with mp.Pool(min(procs, len(jobs))) as pool:
        pool.map(_gen_chunk, jobs)
    return code_dir


def write_corpus(out_dir: str, n_rows: int, seed: int = 42, num_files: int = 1):
    """Write the corpus as `num_files` parquet files under out_dir (parallel
    read at bench scale). Returns (code_dir, truth_path)."""
    import os
    import pyarrow.parquet as pq

    code, truth = generate(n_rows, seed)
    code_dir = os.path.join(out_dir, "code_files")
    os.makedirs(code_dir, exist_ok=True)
    n = code.num_rows
    step = (n + num_files - 1) // num_files
    for i in range(num_files):
        part = code.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, os.path.join(code_dir, f"part-{i:05d}.parquet"))
    truth_path = os.path.join(out_dir, "truth.parquet")
    pq.write_table(truth, truth_path)
    return code_dir, truth_path

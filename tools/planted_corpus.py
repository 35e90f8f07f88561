"""Planted-duplicate corpus builder (dev harness, not part of the engine).

The driver testdata documents tables contain ZERO exact-duplicate texts and
zero containment pairs at every shipped sf, so the exact_dup_groups and
substring_pairs oracle rows pass vacuously (0 rows on both sides). This
builds a copy of an sf dir whose documents table additionally PLANTS:

- two exact-duplicate groups (sizes 3 and 2) — exact_dup_groups /
  exact_dedup_keep_first must surface them;
- one containment pair family: a new doc that is the concatenation of two
  source docs (containment 1.0 from either source, Jaccard < 0.7) —
  substring_pairs must surface it;
- one non-exact near-duplicate pair: two new long docs differing in a
  single middle token (5-gram Jaccard >= 0.7, SimHash Hamming small) —
  exercises the MinHash and SimHash planes at > 0 rows.

Everything is deterministic (rows appended in fixed order, texts taken from
the source table), so the resulting correctness JSON is reproducible.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

PLANT_BASE_ID = 1000


def build_planted(sf_src: str = "/root/testdata/sf0.001",
                  out_dir: str = "/tmp/raydedup_planted_sf") -> str:
    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(os.listdir(sf_src)):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(sf_src, f), os.path.join(out_dir, f))

    t = pq.read_table(os.path.join(sf_src, "documents.parquet"))
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    assert t.column("doc_id").to_pylist() == sorted(
        t.column("doc_id").to_pylist())
    max_id = max(t.column("doc_id").to_pylist())
    assert max_id < PLANT_BASE_ID, "planted ids must not collide"

    long_a = " ".join(texts[4:8])                  # ~80+ tokens
    toks = long_a.split(" ")
    toks[len(toks) // 2] = "plantedtokenxyz"       # one middle token changed
    long_b = " ".join(toks)

    planted = [
        # exact-dup group of 3 with doc 0
        (PLANT_BASE_ID + 0, texts[0], langs[0], sources[0]),
        (PLANT_BASE_ID + 1, texts[0], langs[0], sources[0]),
        # exact-dup group of 2 with doc 1
        (PLANT_BASE_ID + 2, texts[1], langs[1], sources[1]),
        # containment: concat of docs 2 and 3 contains both
        (PLANT_BASE_ID + 3, texts[2] + " " + texts[3], langs[2], sources[2]),
        # near-dup pair (non-exact, high Jaccard)
        (PLANT_BASE_ID + 4, long_a, langs[4], sources[4]),
        (PLANT_BASE_ID + 5, long_b, langs[4], sources[4]),
    ]
    ids, ptexts, plangs, psources = zip(*planted)
    extra = pa.table({
        "doc_id": pa.array(list(ids), t.schema.field("doc_id").type),
        "text": pa.array(list(ptexts), t.schema.field("text").type),
        "lang": pa.array(list(plangs), t.schema.field("lang").type),
        "source": pa.array(list(psources), t.schema.field("source").type),
        "n_chars": pa.array([len(x) for x in ptexts],
                            t.schema.field("n_chars").type),
    })
    out = pa.concat_tables([t.select(extra.column_names), extra])
    pq.write_table(out, os.path.join(out_dir, "documents.parquet"))
    return out_dir


if __name__ == "__main__":
    print(build_planted())

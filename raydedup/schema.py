"""Fixed pyarrow schemas per stage + validation.

The reference asserts shapes at fit time (selfclean_cleaner.py:101); we declare
one explicit Arrow schema per stage boundary and validate in tests/checkpoints.
"""

from __future__ import annotations

import pyarrow as pa

# input per BASELINE.json input_hint
CODE_FILES = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.large_string()),
])

# ingest output: identity + invariant hash (content retained for downstream
# signature computation, dropped immediately after — SURVEY §7 "very wide rows")
INGESTED = pa.schema([
    ("id", pa.int64()),
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.large_string()),
    ("content_sha256", pa.string()),   # hex; per-row invariant vs reference
    ("n_bytes", pa.int64()),
])

# signature table: content dropped, ids + hashes only travel through shuffles.
# minhash/shingles are packed little-endian uint64 binary (NOT list<uint64>):
# Arrow Acero hash joins reject list payload columns, binary is join-safe and
# np.frombuffer-decodable for free.
SIGNATURES = pa.schema([
    ("id", pa.int64()),
    ("content_sha256", pa.string()),
    ("lang", pa.string()),
    ("n_shingles", pa.int64()),
    ("minhash", pa.binary()),          # num_perm * 8 bytes
    ("shingles", pa.large_binary()),   # unique shingle set, n_shingles * 8 bytes
    ("simhash", pa.int64()),
])

# lean signature table (with_shingles=False): the flagship drops the packed
# shingle-set column — ~87% of the table's bytes — and recomputes exact
# shingle sets at verify time for the candidate-touched subset only
# (signatures.compute_shingle_sets). Stored-signature surfaces that must be
# self-contained (the incremental plane) keep the full SIGNATURES schema.
SIGNATURES_LEAN = pa.schema(
    [f for f in SIGNATURES if f.name != "shingles"])

BAND_ROWS = pa.schema([
    ("band_key", pa.int64()),
    ("salt", pa.int32()),
    ("id", pa.int64()),
])

CANDIDATE_PAIRS = pa.schema([
    ("id_a", pa.int64()),    # id_a < id_b canonical (replaces triu indexing,
    ("id_b", pa.int64()),    #  selfclean_cleaner.py:151-177)
])

VERIFIED_PAIRS = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("est_jaccard", pa.float64()),
    ("jaccard", pa.float64()),      # exact where computed, else estimate
    ("containment", pa.float64()),  # |A∩B| / min(|A|,|B|) shingle sets
    ("distance", pa.float64()),     # 1 - jaccard, clipped to [0,1]
    ("match_kind", pa.string()),    # exact | near_dup | substring
])

CLUSTERS = pa.schema([
    ("id", pa.int64()),
    ("cluster_id", pa.int64()),     # min id in the connected component
])

DUPLICITY = pa.schema([
    ("id", pa.int64()),
    ("cluster_id", pa.int64()),
    ("cluster_size", pa.int64()),
    ("duplicity_score", pa.float64()),   # sum of (1 - distance) over pairs
    ("off_topic_score", pa.float64()),   # 1 - max similarity to any neighbor
])


def validate(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Assert the table carries at least the declared columns with the declared
    types (extra columns allowed)."""
    for field in schema:
        if field.name not in table.column_names:
            raise ValueError(f"{where}: missing column {field.name}")
        got = table.schema.field(field.name).type
        if got != field.type and not (
            pa.types.is_large_string(got) and pa.types.is_string(field.type)
        ) and not (pa.types.is_string(got) and pa.types.is_large_string(field.type)):
            raise ValueError(f"{where}: column {field.name} is {got}, want {field.type}")
    return table

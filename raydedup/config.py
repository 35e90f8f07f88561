"""Engine configuration.

All randomness is derived from ``seed`` (reference analog: fix_random_seeds,
selfclean/cleaner/selfclean_cleaner.py:60); no wall-clock anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ShingleConfig:
    """k-gram token shingling over normalized content."""

    k: int = 5                      # tokens per shingle
    lowercase: bool = False         # identifier-rename insensitivity is OFF by default
    collapse_whitespace: bool = True  # whitespace never matters: tokenizer drops it
    min_tokens: int = 1             # docs with fewer tokens get no signature (logged)


@dataclass(frozen=True)
class MinHashConfig:
    """128-perm MinHash via per-permutation XOR-seed + splitmix64 finalizer.

    Same signature width as the engine target config (BASELINE.json north_star:
    "128-perm MinHash signatures").
    """

    num_perm: int = 128
    seed: int = 42


@dataclass(frozen=True)
class LSHConfig:
    """Banding of the MinHash signature.

    Default b=32, r=4: s-curve midpoint (1/b)^(1/r) ~ 0.42, giving candidate
    recall >= 0.999 for any pair with true J >= 0.7 (1-(1-J^r)^b); the exact
    Jaccard verification pass restores precision at the 0.7 threshold. A
    b=16/r=8 config (midpoint ~0.707) trades recall at J~0.8 (~0.95) for
    fewer candidates — selectable per run.
    """

    bands: int = 32
    rows: int = 4
    # Skew handling (north_rule: "partitioning / shuffle / skew handled
    # explicitly"): members of one band bucket are split into `salt_buckets`
    # sub-groups keyed by hash(id); pair generation runs within-salt, plus a
    # second round over per-salt representatives for cross-salt connectivity.
    # 0 = AUTO: a sampled band-size sketch picks the factor per run
    # (candidates.auto_salt_buckets); 1 = off; >1 = forced.
    salt_buckets: int = 0
    # Within one (band, salt) group: emit all pairs while |G| <= max_group_pairs
    # members, else a star to the min id (connectivity preserved for CC; the
    # drop is logged — "no silent caps").
    max_group_pairs: int = 64


@dataclass(frozen=True)
class VerifyConfig:
    threshold: float = 0.7          # keep pairs with estimated/exact J >= threshold
    # pairs with est J within `exact_band` of threshold are re-checked with
    # exact Jaccard over shingle sets (the thin near-threshold band).
    exact_band: float = 0.15
    use_exact: bool = True
    # substring containment (north_star "suffix-array substring pass"):
    # candidate pairs whose shingle-set containment |A∩B|/min(|A|,|B|) >= this
    # are kept as match_kind="substring" even below the Jaccard threshold
    # (file A embedded verbatim in larger file B). 0 disables.
    containment_threshold: float = 0.9
    # target payload bytes per broadcast-assembly id-range shard; the copy
    # into each broadcast object is fault-bound on /dev/shm, so shards
    # assemble in parallel (1 shard = the classic single-object path).
    # Tests force tiny values to exercise the multi-shard scoring path.
    broadcast_shard_bytes: int = 256 << 20


@dataclass(frozen=True)
class AutoCleanConfig:
    """fraction_cut parameters (reference: auto_cleaning_mixin.py:91-154)."""

    cut_off: float = 0.01           # alpha
    significance: float = 0.05      # q
    enabled: bool = False
    # reference-EXACT near-dup fit (auto_cleaning_mixin.py:91-154 fits on
    # the FULL condensed N(N-1)/2 distance vector; the engine default fits
    # on sparse verified pairs — documented deviation in pipeline.py).
    # Opt-in O(N^2) mode: compute every pairwise exact-Jaccard distance
    # and fit on that vector, so M == condensed size and the reference's
    # length-based alpha**2 detection fires naturally. Small-N parity
    # tool; refuses above full_condensed_max_n.
    full_condensed_m: bool = False
    full_condensed_max_n: int = 4096


@dataclass(frozen=True)
class EngineConfig:
    shingle: ShingleConfig = field(default_factory=ShingleConfig)
    minhash: MinHashConfig = field(default_factory=MinHashConfig)
    lsh: LSHConfig = field(default_factory=LSHConfig)
    verify: VerifyConfig = field(default_factory=VerifyConfig)
    autoclean: AutoCleanConfig = field(default_factory=AutoCleanConfig)
    seed: int = 42

    # execution knobs
    # docs per batch in the signature actor pool. 128 keeps the kernel
    # chain's per-batch working set (~1-2 MB: token hashes, shingle sets,
    # 128-perm sketch buffers, segment-sort scratch) inside each core's
    # private-cache share: the batch-size contention sweep
    # (tools/kernel_contention_probe.py --batch-size) measures 16-process
    # per-CPU inflation of 1.16x at bs=128 vs 1.85x at bs=512 on one
    # socket, and ~11% lower single-process CPU; the 400k-row flagship at
    # 16 CPUs drops 31.5 s -> 19.4 s from this knob alone (n_pairs
    # invariant). On a real multi-node cluster each node brings its own
    # LLC, so the small-batch setting costs nothing there either.
    sig_batch_size: int = 128
    sig_concurrency: int = 8        # signature actor pool size
    join_num_partitions: int = 16   # hash-join partitions for sig/pair joins
    cc_max_iters: int = 20          # hash-min propagation rounds (O(log N) expected)
    cc_driver_edge_limit: int = 2_000_000  # below this, CC runs driver-side union-find
    # rep-id sets up to this size are broadcast (ray.put) for the semi-join
    # instead of hash-joining the signature payloads; beyond it, join.
    broadcast_id_limit: int = 20_000_000
    # broadcast-verify additionally gates on ESTIMATED collected payload
    # bytes (ids x (mean shingle bytes + signature)); beyond this, join.
    # The broadcast object is ONE zero-copy plasma copy per node (workers
    # map it read-only), and the assembly task peaks at ~2x payload heap —
    # 8 GiB fits the 128 GiB target node with wide margin. The semi-
    # filtered hash-join path beyond is the true cluster-scale fallback.
    broadcast_byte_limit: int = 8 << 30
    # lean-signature auto threshold: run_pipeline(store_shingles=None)
    # stores the shingle payload for corpora BELOW this row count (the
    # whole table is object-store-trivial there and the verify-time
    # recompute's fixed re-read cost dominates — measured +0.5 s on the
    # 50k driver bench) and goes LEAN at or above it (the payload is 87%
    # of signature bytes and the recompute is CPU-parallel work replacing
    # non-scaling object-store fault volume — measured 14.0 -> 1.8 GB and
    # 4->16 efficiency 0.76 -> 0.81 at 1.6M rows).
    lean_sigs_min_rows: int = 100_000
    # per-partition checkpointing of the signature stage (hash(id) % parts);
    # chunk_parts bounds work lost to a mid-run kill (None = one job).
    ckpt_num_parts: int = 16
    ckpt_chunk_parts: int | None = None

    def __post_init__(self):
        assert self.minhash.num_perm == self.lsh.bands * self.lsh.rows, (
            "num_perm must equal bands*rows"
        )

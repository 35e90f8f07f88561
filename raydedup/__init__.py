"""raydedup — Ray-Data-native near-duplicate detection + cleaning-ranking engine.

A from-scratch reimplementation of the query semantics of
``Digital-Dermatology/SelfClean`` (see ``SURVEY.md``) over Parquet tables of
source code, built on ``ray.data.Dataset`` streaming pipelines:

- exact duplicates: ``groupby(content_sha256)``
- near duplicates: shingles -> 128-perm MinHash -> LSH bands -> candidate
  pairs -> Jaccard verification -> ranked pair Dataset (ascending distance),
  mirroring the reference's condensed-pair ranking
  (reference: selfclean/cleaner/near_duplicates/embedding_distance_mixin.py:41-83)
- clustering: connected components via hash-min label propagation
- off-topic / duplicity ranking: per-id aggregate over verified pairs
  (sanctioned replacement for LAD scoring, selfclean/scoring/lad_scoring.py)
- label errors: intra/extra min-distance score over the sparse pair set
  (reference: selfclean/cleaner/label_errors/intra_extra_distance_mixin.py:20-61)
- auto-cleaning: ``fraction_cut`` logistic-tail cut-off
  (reference: selfclean/cleaner/auto_cleaning_mixin.py:91-154)

No code is copied from the reference; it defines WHAT is computed, not HOW.
"""

from raydedup.config import EngineConfig, ShingleConfig, MinHashConfig, LSHConfig

__all__ = ["EngineConfig", "ShingleConfig", "MinHashConfig", "LSHConfig"]
__version__ = "0.1.0"

"""Issue types + result container (analog of selfclean's IssueManager,
selfclean/cleaner/issue_manager.py:9-62).

`IRRELEVANTS` is kept as a back-compat alias for OFF_TOPIC, mirroring
issue_manager.py:31-33.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

import ray.data


class IssueType(str, enum.Enum):
    NEAR_DUPLICATES = "near_duplicates"
    OFF_TOPIC = "off_topic_samples"
    LABEL_ERRORS = "label_errors"

    # back-compat alias (reference: issue_manager.py:31-33)
    IRRELEVANTS = "irrelevants"

    @classmethod
    def canonical(cls, t: "IssueType | str") -> "IssueType":
        t = cls(t)
        return cls.OFF_TOPIC if t == cls.IRRELEVANTS else t


DEFAULT_ISSUES = [IssueType.NEAR_DUPLICATES, IssueType.OFF_TOPIC]


@dataclass
class DedupResult:
    """All stage outputs as lazy Datasets; consume with write_parquet /
    take / iter_batches. Metadata (repo, path, lang) joins happen at export
    (get_issues analog, issue_manager.py:39-62)."""

    ingested: ray.data.Dataset
    signatures: ray.data.Dataset
    verified_pairs: Optional[ray.data.Dataset] = None
    ranked_pairs: Optional[ray.data.Dataset] = None
    clusters: Optional[ray.data.Dataset] = None
    duplicity: Optional[ray.data.Dataset] = None
    label_errors: Optional[ray.data.Dataset] = None
    extra: dict = field(default_factory=dict)

    def get_issues(self, issue_type: IssueType | str,
                   with_metadata: bool = False) -> ray.data.Dataset:
        """Issue Dataset; with_metadata=True joins (repo, path, lang) per id —
        the reference's DataFrame export (issue_manager.py:39-62), expressed
        as a hash join of the (small) issue set against the metadata table."""
        t = IssueType.canonical(issue_type)
        if t == IssueType.NEAR_DUPLICATES:
            out = self.ranked_pairs
            if with_metadata:
                out = self._join_meta(out, "id_a", "_a")
                out = self._join_meta(out, "id_b", "_b")
                out = out.sort(["distance", "id_a", "id_b"])
            return out
        if t == IssueType.OFF_TOPIC:
            from raydedup.stages.rank import off_topic_ranking
            out = self.duplicity
            if with_metadata:
                out = self._join_meta(out, "id", "")
            return off_topic_ranking(out)
        if t == IssueType.LABEL_ERRORS:
            out = self.label_errors
            if with_metadata and out is not None:
                out = self._join_meta(out, "id", "").sort(["score", "id"])
            return out
        raise KeyError(t)

    def _join_meta(self, ds: ray.data.Dataset, id_col: str,
                   suffix: str) -> ray.data.Dataset:
        import pyarrow as pa

        from raydedup.util import hash_join
        meta = self.ingested.select_columns(["id", "repo", "path", "lang"])
        if suffix:
            meta = meta.rename_columns({"repo": f"repo{suffix}",
                                        "path": f"path{suffix}",
                                        "lang": f"lang{suffix}"})
        meta_schema = pa.schema([("id", pa.int64()),
                                 (f"repo{suffix}", pa.string()),
                                 (f"path{suffix}", pa.string()),
                                 (f"lang{suffix}", pa.string())])
        return hash_join(ds, meta, on=id_col, right_on="id",
                         num_partitions=8, right_schema=meta_schema)

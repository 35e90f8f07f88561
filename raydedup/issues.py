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

    def get_issues(self, issue_type: IssueType | str) -> ray.data.Dataset:
        t = IssueType.canonical(issue_type)
        if t == IssueType.NEAR_DUPLICATES:
            return self.ranked_pairs
        if t == IssueType.OFF_TOPIC:
            from raydedup.stages.rank import off_topic_ranking
            return off_topic_ranking(self.duplicity)
        if t == IssueType.LABEL_ERRORS:
            return self.label_errors
        raise KeyError(t)

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
    # engine config of the producing run (threads join_num_partitions etc.
    # into the export joins); None for hand-assembled results
    cfg: Optional[object] = None

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
            if out is None:           # stage not run: behave like the other
                return None           # branches instead of raising
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
        nparts = getattr(self.cfg, "join_num_partitions", None) or 8
        return hash_join(ds, meta, on=id_col, right_on="id",
                         num_partitions=nparts, right_schema=meta_schema)


def dedup_summary(res: DedupResult) -> "object":
    """One-row corpus-level dedup report — the numbers an operator reads
    before acting on a run: document count, exact-duplicate exposure,
    verified duplicate pairs, cluster structure, and how many documents the
    keep-list dedup would remove.

    Scale shape: every statistic is a distributed aggregate over fixed-width
    columns — cluster sizes via one groupby(cluster_id), exact-dup exposure
    via one groupby(content_sha256) over the SIGNATURE table (never touches
    content), pair count via a filtered count. Only the seven final scalars
    reach the driver. Returns a pyarrow.Table with one row."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from raydedup.stages.verify import distance_pairs

    def _gt1(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("n"), pa.scalar(1)))

    n_docs = res.clusters.count()
    # materialize: three consumers below (count, filtered count) would each
    # re-run the groupby shuffle on the lazy plan otherwise
    sizes = res.clusters.groupby("cluster_id").aggregate(
        Count(alias_name="n")).materialize()
    n_clusters = sizes.count()
    n_multi = sizes.map_batches(_gt1, batch_format="pyarrow").count()
    n_dup_pairs = distance_pairs(res.verified_pairs).count()

    dup_groups = res.signatures.select_columns(["content_sha256"]) \
        .groupby("content_sha256").aggregate(Count(alias_name="n")) \
        .map_batches(_gt1, batch_format="pyarrow")

    def _part(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({"g": pa.array([len(n)], pa.int64()),
                         "d": pa.array([int(n.sum())], pa.int64())})

    agg = dup_groups.map_batches(_part, batch_format="pyarrow").aggregate(
        Sum("g", alias_name="g"), Sum("d", alias_name="d"))
    n_exact_groups = int(agg["g"] or 0) if agg else 0
    n_exact_dup_docs = int(agg["d"] or 0) if agg else 0

    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_exact_dup_docs": pa.array([n_exact_dup_docs], pa.int64()),
        "n_exact_dup_groups": pa.array([n_exact_groups], pa.int64()),
        "n_dup_pairs": pa.array([n_dup_pairs], pa.int64()),
        "n_clusters": pa.array([n_clusters], pa.int64()),
        "n_multi_clusters": pa.array([n_multi], pa.int64()),
        "n_docs_removed": pa.array([n_docs - n_clusters], pa.int64()),
    })


def dedup_report(clusters, meta, group_col: str = "lang",
                 id_col: str = "doc_id", num_partitions: int = 16):
    """Per-group duplicate-rate report: join group labels onto the cluster
    table and aggregate -> (group_col, n_docs, n_dups, dup_frac). A row is
    a duplicate iff id != cluster_id (cluster labels are the component min
    id — keep_representatives' keep rule), so the report needs NO second
    cluster aggregate: ONE hash join on id + one tiny grouped sum. The
    slice-level "how much of my corpus is duplicated, by language/source"
    view every corpus operator reads next to dedup_summary's one-row
    totals."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from raydedup.util import hash_join

    m = meta.select_columns([id_col, group_col]) \
        .rename_columns({id_col: "_mid"})
    j = hash_join(clusters, m, on="id", right_on="_mid",
                  num_partitions=num_partitions)

    def flag(t: pa.Table) -> pa.Table:
        dup = pc.not_equal(t.column("id"), t.column("cluster_id"))
        return pa.table({
            group_col: t.column(group_col),
            "_dup": pc.cast(dup, pa.int64()),
        })

    g = j.map_batches(flag, batch_format="pyarrow") \
        .groupby(group_col).aggregate(
            Count(alias_name="n_docs"),
            Sum("_dup", alias_name="n_dups"))

    def frac(t: pa.Table) -> pa.Table:
        nd = t.column("n_dups").cast(pa.float64())
        n = t.column("n_docs").cast(pa.float64())
        return pa.table({
            group_col: t.column(group_col),
            "n_docs": t.column("n_docs").cast(pa.int64()),
            "n_dups": t.column("n_dups").cast(pa.int64()),
            "dup_frac": pc.divide(nd, n),
        })

    return g.map_batches(frac, batch_format="pyarrow")

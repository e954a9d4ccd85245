"""Clustered tables (the Delta ``clustering`` writer feature — liquid
clustering's protocol surface, public spec `clustering` + domain
metadata ``delta.clustering``).

A clustered table declares CLUSTERING COLUMNS instead of hive
partitions: writes land files freely (no shuffle-by-key at ingest
time — the fix for hive partitioning's small-file explosion on
high-cardinality keys), and OPTIMIZE incrementally reorganizes data so
each file covers a tight range on every clustering column (this
engine's interleaved-bit z-ordering, `maintenance.py:_zorder_value`),
which per-file min/max stats then turn into metadata-level skipping.
At 100 TB this is the modern layout: ingest at full speed, cluster in
the background, prune like a partitioned table without the partition
count ever exploding.

Protocol shape per the spec:
- writer feature ``clustering`` (v7 feature list) + ``domainMetadata``
  (the spec stores the clustering spec in domain
  ``delta.clustering``: ``{"clusteringColumns": [["c1"], ["c2"]]}``,
  nested names as path arrays);
- clustered tables are UNPARTITIONED (``partition_by`` is mutually
  exclusive with ``cluster_by``);
- any writer that preserves domain metadata may append; OPTIMIZE on a
  clustered table clusters by the declared columns.

The reference (dask_deltalake) has no clustering concept — this is
Spark-side extension surface like row tracking."""

from __future__ import annotations

import json
from typing import Optional

CLUSTERING_DOMAIN = "delta.clustering"
CLUSTERING_FEATURE = "clustering"


def clustering_domain_action(columns: list[str]) -> dict:
    return {
        "domainMetadata": {
            "domain": CLUSTERING_DOMAIN,
            "configuration": json.dumps(
                {"clusteringColumns": [[c] for c in columns]}
            ),
            "removed": False,
        }
    }


def clustering_columns(snap) -> Optional[list[str]]:
    """The snapshot's declared clustering columns, or None for an
    unclustered table. Nested column paths are joined with '.'."""
    conf = snap.domain_metadata.get(CLUSTERING_DOMAIN)
    if not conf:
        return None
    cols = json.loads(conf).get("clusteringColumns") or []
    return [".".join(c) if isinstance(c, list) else str(c) for c in cols]

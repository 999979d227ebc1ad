"""Cluster-derived actor-pool sizing for map_batches stages.

Every stateful stage in this repo is an actor pool
(``map_batches(Cls, concurrency=...)``). A hardcoded cap would idle
almost the whole fleet on a multi-node cluster, so pools size themselves
from the cluster: ``auto_pool()`` returns an autoscaling ``(lo, hi)``
range where ``hi`` tracks the cluster's CPU count. Ray starts ``lo``
actors and scales toward ``hi`` only under backlog, so small inputs
don't pay for actors they can't feed while a 256-node cluster fans out
fully.
"""

from __future__ import annotations

import os

import ray


def cluster_cpus() -> int:
    """Schedulable CPUs in the connected Ray cluster (host fallback)."""
    if ray.is_initialized():
        try:
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus > 0:
                return cpus
        except Exception:
            pass
    return os.cpu_count() or 4


def blocks_for(n_rows: int, rows_per_block: int) -> int:
    """Data-proportional block count, capped at 4x cluster CPUs.

    Ray's default parquet split (2x cluster CPUs) splinters a small table
    into sub-100-row blocks whose per-task overhead dominates; targeting
    ``rows_per_block`` scales the split with BOTH the data and the
    cluster. Shared by every pipeline that overrides the read split.
    """
    nb = n_rows // rows_per_block + 1
    return int(min(max(nb, 2), 4 * cluster_cpus()))


def auto_pool(frac: float = 1.0, lo: int = 2,
              cap: int | None = None) -> tuple[int, int]:
    """(min, max) actor-pool size: ``max`` = ``frac`` of cluster CPUs.

    ``frac`` < 1 reserves headroom for other stages of the same pipeline
    (fetch vs parse, probe vs merge); ``cap`` bounds stages whose
    per-actor state is expensive to replicate.
    """
    hi = max(lo, int(cluster_cpus() * frac))
    if cap is not None:
        hi = min(hi, max(lo, cap))
    return (min(lo, hi), hi)

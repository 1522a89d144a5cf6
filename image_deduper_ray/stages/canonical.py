"""Canonical pick + action/lineage records.

A4 in SURVEY.md §2.5: the reference's ``PriorityRule`` list
(/root/reference/crates/image-deduper-core/src/config.rs:5-23, defaults
HighestResolution -> LargestFileSize -> OldestCreationDate at
config.rs:111-115) becomes one deterministic lexicographic tuple sort
per cluster; the winner is the canonical ("keep") file, the rest are
dups. Output rows are the ``ActionResult`` analog
(src/types.rs:86-114): lineage records written to Parquet instead of
filesystem moves.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from ..config import DedupConfig


def _sort_key_cols(cfg: DedupConfig) -> tuple[list[str], list[bool]]:
    cols, asc = [], []
    for spec in cfg.canonical_order:
        if spec.startswith("-"):
            cols.append(spec[1:])
            asc.append(False)
        else:
            cols.append(spec)
            asc.append(True)
    return cols, asc


def canonical_actions(members: ray.data.Dataset, cfg: DedupConfig,
                      action: str = "symlink") -> ray.data.Dataset:
    """members: (file_id, cluster_id, repo, path, commit, n_bytes).
    -> actions(file_id, cluster_id, role, canonical_file_id, action,
    success). Per-group LOCAL sort only — never a global ds.sort
    (SURVEY.md §2.6)."""
    cols, asc = _sort_key_cols(cfg)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(cols, ascending=asc, kind="mergesort").reset_index(drop=True)
        canonical = g["file_id"].iloc[0]
        out = g[["file_id", "cluster_id"]].copy()
        out["role"] = ["keep"] + ["dup"] * (len(g) - 1)
        out["canonical_file_id"] = canonical
        out["action"] = ["none"] + [action] * (len(g) - 1)
        out["success"] = True
        return out

    return members.groupby("cluster_id").map_groups(pick, batch_format="pandas")

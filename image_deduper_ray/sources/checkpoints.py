"""Checkpointed Parquet stages + resume anti-join.

The reference uses its RocksDB keyspace as both sink and resume ledger:
``batch_insert_hashes`` (S4, /root/reference/crates/image-deduper-core/
src/persistence/db.rs:64-92), ``get_all_hashes`` (S5, db.rs:94-129) and
the ``find_new_images`` anti-join (J1, db.rs:132-164) that lets a rerun
hash only new files (lib.rs:246-264). Here every stage writes a Parquet
directory plus a ``_MANIFEST.json`` (row count + config hash) written
only after the data lands — the atomic 'stage done' marker — and resume
anti-joins the done ``file_id`` set before the expensive signature
stage.

Scale note: the broadcast anti-join ships the done-key set once via
``ray.put`` and filters inside ``map_batches`` (no shuffle) — right
whenever done-keys fit in worker memory (hundreds of millions of 16-byte
keys). Past that, flip to the partitioned variant: hash-partition both
sides on ``file_id`` and set-difference per partition (SURVEY.md §2.4 J1).
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import ray
import ray.data

MANIFEST = "_MANIFEST.json"


def _arrow_schema_of(ds: ray.data.Dataset):
    """Arrow schema of a Dataset even when its blocks are pandas
    (PandasBlockSchema): numpy dtypes map via pandas; ``object`` columns
    in this engine are always strings."""
    import numpy as np
    import pyarrow as pa

    schema = ds.schema()
    if isinstance(schema, pa.Schema):
        return schema
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(schema.names, schema.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        elif isinstance(typ, np.dtype) and typ != np.dtype("O"):
            fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
        else:
            fields.append(pa.field(name, pa.string()))
    return pa.schema(fields)


def stage_dir(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def is_complete(root: str, stage: str) -> bool:
    return os.path.exists(os.path.join(stage_dir(root, stage), MANIFEST))


def write_stage(ds: ray.data.Dataset, root: str, stage: str,
                config_json: str = "", extra: dict | None = None,
                schema=None) -> ray.data.Dataset:
    """Write a stage checkpoint and its manifest; returns a fresh reader
    over the checkpoint (so downstream stages re-read from Parquet
    instead of recomputing the lineage)."""
    d = stage_dir(root, stage)
    os.makedirs(d, exist_ok=True)
    ds.write_parquet(d)
    if not any(f.endswith(".parquet") for f in os.listdir(d)):
        # zero-row dataset: persist the schema so readers still work
        # (prefer the caller-declared schema; an executed-empty Dataset
        # reports schema() = None in Ray 2.49)
        pq.write_table((schema or _arrow_schema_of(ds)).empty_table(),
                       os.path.join(d, "empty-0.parquet"))
    per_part = {f: int(pq.ParquetFile(os.path.join(d, f)).metadata.num_rows)
                for f in sorted(os.listdir(d)) if f.endswith(".parquet")}
    n = sum(per_part.values())
    # per-partition lineage (north rule): which physical partition holds
    # how many rows — a resume or audit can account for every block
    manifest = {"stage": stage, "rows": int(n), "config": config_json,
                "partitions": per_part}
    manifest.update(extra or {})
    tmp = os.path.join(d, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(d, MANIFEST))  # atomic 'done' marker
    return read_stage(root, stage)


def read_stage(root: str, stage: str, columns: list[str] | None = None) -> ray.data.Dataset:
    d = stage_dir(root, stage)
    paths = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    return ray.data.read_parquet(paths, columns=columns)


def read_manifest(root: str, stage: str) -> dict:
    with open(os.path.join(stage_dir(root, stage), MANIFEST)) as fh:
        return json.load(fh)


def clear_stage(root: str, stage: str) -> None:
    d = stage_dir(root, stage)
    if os.path.isdir(d):
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))


def done_key_set(root: str, stage: str, key_col: str = "file_id") -> set[str]:
    """Read only the key column of a (possibly partial) checkpoint —
    column pruning means this touches one column's pages, not the data."""
    d = stage_dir(root, stage)
    keys: set[str] = set()
    if not os.path.isdir(d):
        return keys
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            keys.update(pq.read_table(os.path.join(d, f), columns=[key_col])[key_col].to_pylist())
    return keys


def anti_join_done(ds: ray.data.Dataset, done_keys: set,
                   key_fn) -> ray.data.Dataset:
    """J1: discovered ∖ done. Broadcast the done-key set once
    (``ray.put``) as an Arrow value set, filter inside map_batches with
    the hash-lookup ``is_in`` kernel — no shuffle, no per-row Python
    membership test (this sits on the flagship resume path).
    ``key_fn(batch) -> pa.Array | ChunkedArray | list`` of keys."""
    if not done_keys:
        return ds
    import pyarrow as pa

    ref = ray.put(pa.array(list(done_keys)))

    def _filter(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        value_set = ray.get(ref)
        keys = key_fn(batch)
        if not isinstance(keys, (pa.Array, pa.ChunkedArray)):
            keys = pa.array(keys, value_set.type)
        keep = pc.invert(pc.is_in(keys, value_set=value_set))
        return batch.filter(keep)

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def anti_join_done_partitioned(ds: ray.data.Dataset, done: ray.data.Dataset,
                               key_col: str,
                               num_partitions: int = 64) -> ray.data.Dataset:
    """J1 at huge scale: when the done-key set no longer fits in worker
    memory, hash-partition BOTH sides on the key and set-difference per
    partition (SURVEY.md §2.4). One shuffle; no broadcast."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.groups import partitioned_group_map

    schema = None
    try:
        s = ds.schema()
        if isinstance(getattr(s, "base_schema", s), pa.Schema):
            schema = getattr(s, "base_schema", s)
    except Exception:
        pass

    left = ds.map_batches(
        lambda t: t.append_column("__done", pa.array(
            np.zeros(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow", zero_copy_batch=True)
    cols = [f.name for f in schema] if schema else None

    def conform_done(t: pa.Table) -> pa.Table:
        out = {key_col: t[key_col]}
        if cols:
            for c in cols:
                if c != key_col:
                    out[c] = pa.nulls(t.num_rows, schema.field(c).type)
        out["__done"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(out)

    right = done.map_batches(conform_done, batch_format="pyarrow")

    def block(df: pd.DataFrame) -> pd.DataFrame:
        done_keys = set(df.loc[df["__done"] == 1, key_col])
        keep = df[(df["__done"] == 0) & ~df[key_col].isin(done_keys)]
        return keep.drop(columns=["__done"])

    return partitioned_group_map(left.union(right), [key_col], block,
                                 num_partitions, out_schema=schema)

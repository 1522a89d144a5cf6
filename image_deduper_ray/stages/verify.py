"""Pair verification + exact-dup edges.

J4 in SURVEY.md §2.4: the reference's intended pair check is
``PHash::is_similar`` distance <= threshold
(/root/reference/crates/image-deduper-core/src/processing/types.rs:47-58).
Here: candidate pairs (a, b) are hash-joined with the signatures table
twice (``Dataset.join``, hash-partitioned on the key — the scale-safe
alternative to broadcasting every signature), then estimated Jaccard =
mean(sig_a == sig_b) is computed vectorized per batch and thresholded.

Exact dedup (A1, the commented-out ``_find_duplicate_images`` at
src/deduplication/mod.rs:8-32): groupby(sha256), emit (first, other)
edges per group — groups of size 1 emit nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import DedupConfig


def _sig_of(batch_col: pa.ChunkedArray | pa.Array, num_perms: int) -> np.ndarray:
    """(n, P) uint64 view of a packed-minhash column. fixed_size_binary
    (the signature stage's native layout) reshapes the Arrow data buffer
    ZERO-COPY; variable binary (post-join pandas round-trips) falls back
    to one join+frombuffer."""
    if isinstance(batch_col, pa.ChunkedArray):
        batch_col = batch_col.combine_chunks()
    if pa.types.is_fixed_size_binary(batch_col.type):
        w = batch_col.type.byte_width // 8
        flat = np.frombuffer(batch_col.buffers()[1], dtype=np.uint64)
        flat = flat[batch_col.offset * w:(batch_col.offset + len(batch_col)) * w]
    else:
        flat = np.frombuffer(b"".join(batch_col.to_pylist()), dtype=np.uint64)
    return flat.reshape(-1, num_perms)


def attach_signatures(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                      cfg: DedupConfig) -> ray.data.Dataset:
    """pairs(a, b, ...) -> + minhash_a, minhash_b via two partitioned
    hash joins (functions/joins.py)."""
    from ..functions.joins import hash_join

    sig_a = sigs.select_columns(["file_id", "minhash", "simhash"]).map_batches(
        lambda t: t.rename_columns(["file_id", "minhash_a", "simhash_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    sig_b = sigs.select_columns(["file_id", "minhash", "simhash"]).map_batches(
        lambda t: t.rename_columns(["file_id", "minhash_b", "simhash_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("is_cont", pa.int8())])
    a_fields = pa.schema([("minhash_a", pa.binary()),
                          ("simhash_a", pa.int64())])
    j = hash_join(pairs, sig_a, "a", "file_id", pair_schema, a_fields,
                  num_partitions=cfg.join_num_partitions)
    j = hash_join(j, sig_b, "b", "file_id",
                  pa.schema(list(pair_schema) + list(a_fields)),
                  pa.schema([("minhash_b", pa.binary()),
                             ("simhash_b", pa.int64())]),
                  num_partitions=cfg.join_num_partitions)
    return j


class ScorePairs:
    """Vectorized est-Jaccard per batch; splits verified near-dup edges
    from containment candidates that still need the substring pass.

    Cross-variant rule (Enhanced<->Standard downgrade,
    src/processing/types.rs:34-43 analog): a pair where EITHER side is
    missing its full MinHash (rows resumed from an older checkpoint
    schema) is compared on the shared 64-bit SimHash instead —
    similarity = 1 - hamming/64 against the same thresholds."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "jaccard": pa.array([], pa.float64()),
                             "verdict": pa.array([], pa.string())})
        ma, mb = batch["minhash_a"], batch["minhash_b"]
        have_both = np.asarray(pa.compute.and_(ma.is_valid(), mb.is_valid()))
        jac = np.zeros(n, dtype=np.float64)
        if have_both.all():
            sa = _sig_of(ma, self.cfg.num_perms)
            sb = _sig_of(mb, self.cfg.num_perms)
            jac = (sa == sb).mean(axis=1)
        else:
            idx = np.flatnonzero(have_both)
            if len(idx):
                keep = pa.array(have_both)
                sa = _sig_of(ma.filter(keep), self.cfg.num_perms)
                sb = _sig_of(mb.filter(keep), self.cfg.num_perms)
                jac[idx] = (sa == sb).mean(axis=1)
            down = np.flatnonzero(~have_both)
            if len(down):
                sha = batch["simhash_a"].to_numpy(zero_copy_only=False)
                shb = batch["simhash_b"].to_numpy(zero_copy_only=False)
                from ..functions.minhash import hamming64
                d = hamming64(sha[down].astype(np.int64).view(np.uint64),
                              shb[down].astype(np.int64).view(np.uint64))
                jac[down] = 1.0 - d / 64.0
        is_cont = batch["is_cont"].to_numpy(zero_copy_only=False)
        # containment candidates must clear a signature floor before the
        # (content-joining) substring pass — see config.containment_est_jaccard_min
        cont_ok = (is_cont == 1) & (jac >= self.cfg.containment_est_jaccard_min)
        verdict = np.where(jac >= self.cfg.jaccard_threshold, "near_dup",
                           np.where(cont_ok, "containment_cand", "reject"))
        return pa.table({"a": batch["a"], "b": batch["b"],
                         "jaccard": pa.array(jac),
                         "verdict": pa.array(verdict.tolist(), pa.string())})


def verify_pairs(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                 cfg: DedupConfig, n_sigs: int | None = None) -> ray.data.Dataset:
    """-> (a, b, jaccard, verdict) for every candidate pair.
    ``n_sigs``: pass the known signature row count (stage manifest) to
    skip a full counting pass over the checkpoint.

    Fast path: the signature matrix fits the broadcast budget — ship it
    ONCE via ray.put as (sorted ids, uint64 matrix); workers get
    zero-copy plasma-backed numpy views and score batches with one
    vectorized searchsorted + equality mean. No shuffle, no per-pair
    signature copies. Past the budget (the 10^12-file regime, where
    even collapsed representatives outgrow a node), fall back to the
    partitioned hash joins."""
    cfg = cfg.resolved()
    if n_sigs is None:
        n_sigs = sigs.count()
    sig_bytes = n_sigs * cfg.num_perms * 8
    if sig_bytes <= cfg.verify_broadcast_max_bytes:
        # parallel pack: one task per block converts (file_id, minhash)
        # to (S32 ids, uint64 matrix) on the WORKERS. The matrices are
        # NEVER concatenated or reordered: they stay as per-part plasma
        # objects, and only a small sorted (id -> part, row) INDEX is
        # built on one worker (~40 B/row). The previous design's serial
        # concat + sorted gather of the full matrix was the pipeline's
        # single biggest fixed cost: 2 x matrix_bytes of single-thread
        # memcpy on the critical path at every cluster size (measured
        # 15-80 s at 345 k x 128 on this host's constrained memory
        # bandwidth), which is exactly the kind of non-parallelizable
        # term that caps N->4N scaling efficiency. Row gathers now
        # happen inside the (parallel) scoring tasks, reading the part
        # objects zero-copy from plasma.
        P = cfg.num_perms

        @ray.remote(num_returns=2)
        def _pack(block):
            t = block if isinstance(block, pa.Table) \
                else pa.Table.from_pandas(block)
            if t.num_rows == 0 or "file_id" not in t.column_names:
                # Ray 2.49 empty partitions can arrive schema-less
                return (np.empty(0, dtype="S32"),
                        np.empty((0, P), np.uint64))
            from ..functions.arrow_utils import fixed_str_view
            return (fixed_str_view(t["file_id"], 32).copy(),
                    _sig_of(t["minhash"], P))

        @ray.remote
        def _index(*id_parts):
            sizes = [len(x) for x in id_parts]
            n = sum(sizes)
            if n == 0:
                return (np.empty(0, dtype="S32"),
                        np.empty(0, np.int32), np.empty(0, np.int32))
            ids = np.concatenate(id_parts)
            part_of = np.repeat(np.arange(len(id_parts), dtype=np.int32),
                                sizes)
            row_of = np.concatenate(
                [np.arange(s, dtype=np.int32) for s in sizes])
            order = np.argsort(ids)
            return (ids[order], part_of[order], row_of[order])

        bundles = sigs.select_columns(["file_id", "minhash"]) \
            .iter_internal_ref_bundles()
        refs = [r for bundle in bundles for r in bundle.block_refs]
        packed = [_pack.remote(r) for r in refs]
        mat_refs = [m for _, m in packed]
        index_ref = _index.remote(*[i for i, _ in packed])
        tau, cont_min = cfg.jaccard_threshold, cfg.containment_est_jaccard_min

        def _gather(parts, part_of, row_of, pos):
            out = np.empty((len(pos), P), np.uint64)
            pidx = part_of[pos]
            ridx = row_of[pos]
            for q in np.unique(pidx):
                m = pidx == q
                out[m] = parts[q][ridx[m]]
            return out

        def score(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"a": pa.array([], pa.string()),
                                 "b": pa.array([], pa.string()),
                                 "jaccard": pa.array([], pa.float64()),
                                 "verdict": pa.array([], pa.string())})
            sids, part_of, row_of = ray.get(index_ref)
            parts = ray.get(mat_refs)   # plasma views, zero-copy local
            # direct fixed-width buffer view — no per-value Python str
            from ..functions.arrow_utils import fixed_str_view
            a = fixed_str_view(batch["a"], 32)
            b = fixed_str_view(batch["b"], 32)
            pa_ = np.searchsorted(sids, a).clip(0, max(len(sids) - 1, 0))
            pb_ = np.searchsorted(sids, b).clip(0, max(len(sids) - 1, 0))
            if len(sids) == 0:
                ok = np.zeros(len(a), dtype=bool)
                jac = np.zeros(len(a), dtype=np.float64)
            else:
                ok = (sids[pa_] == a) & (sids[pb_] == b)
                sa = _gather(parts, part_of, row_of, pa_)
                sb = _gather(parts, part_of, row_of, pb_)
                jac = np.where(ok, (sa == sb).mean(axis=1), 0.0)
            is_cont = batch["is_cont"].to_numpy(zero_copy_only=False)
            cont_ok = (is_cont == 1) & (jac >= cont_min)
            verdict = np.where(jac >= tau, "near_dup",
                               np.where(cont_ok, "containment_cand",
                                        "reject"))
            return pa.table({"a": batch["a"], "b": batch["b"],
                             "jaccard": pa.array(jac),
                             "verdict": pa.array(verdict.tolist(),
                                                 pa.string())})

        return pairs.map_batches(score, batch_format="pyarrow",
                                 zero_copy_batch=True)

    joined = attach_signatures(pairs, sigs, cfg)
    return joined.map_batches(ScorePairs(cfg), batch_format="pyarrow",
                              zero_copy_batch=True)


def signature_representatives(sigs: ray.data.Dataset, cfg: DedupConfig,
                              num_partitions: int | None = None
                              ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Collapse signature-identical rows before LSH.

    Rows with BYTE-IDENTICAL MinHash signatures (sig_kind='ok') have
    est-Jaccard exactly 1.0 >= tau — they are near-dups by definition,
    needing neither banding nor verification. Letting them into LSH is
    the dominant skew + duplicate-emission source: a group of k
    identical signatures collides in EVERY band, emitting k^2 pairs x
    num_bands duplicates (exact copies and reformat-only twins are the
    web-scale boilerplate case). Instead: one representative (min
    file_id) per signature group enters LSH; (rep, member) edges are
    returned for the edge union; CC transitivity reconnects everything.

    Returns (reps, sig_edges). Rows whose sig_kind is 'fallback' are
    never merged by signature (their signature encodes identity, not
    content); 'empty' rows are dropped from both outputs (M16
    validator semantics)."""
    from ..functions.groups import (default_partitions,
                                    partitioned_group_map_arrow)

    num_partitions = num_partitions or default_partitions()

    # --- fast path: shuffle a 128-bit FOLD of the signature, not the
    # 1 KB payload (~15x less shuffle volume; the payload shuffle was
    # the dominant cost of this stage). Group membership by fold is
    # byte-equality modulo a ~2^-128 collision (documented: a collision
    # would merge two non-identical signatures — vanishingly unlikely
    # even at 10^12 rows, and bounded to one spurious near-dup edge).
    # Member ids are broadcast back as a C-level is_in filter; past the
    # broadcast byte cap we fall back to the full payload shuffle.
    import pyarrow.compute as pc

    P = cfg.num_perms
    mults1 = np.cumprod(np.full(P, 1099511628211, dtype=np.uint64),
                        dtype=np.uint64)
    mults2 = np.cumprod(np.full(P, 2654435769, dtype=np.uint64),
                        dtype=np.uint64)

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"file_id": pa.array([], pa.string()),
                             "h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "sig_kind": pa.array([], pa.string())})
        M = _sig_of(t["minhash"], P)
        with np.errstate(over="ignore"):
            h1 = (M * mults1[None, :]).sum(axis=1, dtype=np.uint64)
            h2 = (M * mults2[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table({"file_id": t["file_id"],
                         "h1": pa.array(h1.view(np.int64)),
                         "h2": pa.array(h2.view(np.int64)),
                         "sig_kind": t["sig_kind"]})

    narrow_schema = pa.schema([("file_id", pa.string()),
                               ("edge_to", pa.string())])

    def narrow_block(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["sig_kind"], "empty"))
        if t.num_rows == 0:
            return narrow_schema.empty_table()
        mergeable = pc.equal(t["sig_kind"], "ok")
        solo = t.filter(pc.invert(mergeable))
        m = t.filter(mergeable).combine_chunks()
        solo_out = pa.table({
            "file_id": solo["file_id"],
            "edge_to": pa.array([""] * solo.num_rows, pa.string())})
        if m.num_rows == 0:
            return pa.concat_tables([narrow_schema.empty_table(),
                                     solo_out.cast(narrow_schema)])
        m = m.take(pc.sort_indices(
            m, sort_keys=[("h1", "ascending"), ("h2", "ascending"),
                          ("file_id", "ascending")])).combine_chunks()
        k1 = m["h1"].to_numpy(zero_copy_only=False)
        k2 = m["h2"].to_numpy(zero_copy_only=False)
        first = np.ones(m.num_rows, dtype=bool)
        first[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        group_idx = np.cumsum(first) - 1
        rep_idx = np.flatnonzero(first)[group_idx]
        edge_to = pc.if_else(pa.array(first),
                             pa.scalar("", pa.string()),
                             pc.take(m["file_id"], pa.array(rep_idx)))
        out = pa.table({"file_id": m["file_id"], "edge_to": edge_to})
        return pa.concat_tables([out.cast(narrow_schema),
                                 solo_out.cast(narrow_schema)])

    tagged_narrow = partitioned_group_map_arrow(
        sigs.select_columns(["file_id", "minhash", "sig_kind"])
        .map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        ["h1", "h2"], narrow_block, num_partitions,
        out_schema=narrow_schema)
    members = tagged_narrow.map_batches(
        lambda t: t.filter(pc.not_equal(t["edge_to"], "")),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_members = members.count()

    if n_members * 64 <= cfg.verify_broadcast_max_bytes:
        import ray as _ray

        # zero-row to_pandas drops columns (Ray 2.49) — guard
        member_ids = pa.array(
            members.to_pandas()["file_id"].tolist() if n_members else [],
            pa.string())
        mref = _ray.put(member_ids)

        def filter_reps(t: pa.Table) -> pa.Table:
            mids = _ray.get(mref)
            keep = pc.and_(
                pc.not_equal(t["sig_kind"], "empty"),
                pc.invert(pc.is_in(t["file_id"], value_set=mids)))
            return t.filter(keep)

        # materialized: consumed by hot-bucket counting AND band explode
        # (and the narrow projection is small next to the corpus)
        reps = sigs.select_columns(
            ["file_id", "minhash", "simhash", "sig_kind"]).map_batches(
            filter_reps, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
        sig_edges = members.map_batches(
            lambda t: pa.table({"a": t["edge_to"], "b": t["file_id"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        return reps, sig_edges

    # --- fallback: member set too large to broadcast -> original
    # full-payload shuffle (same semantics, no broadcast)
    proj = sigs.select_columns(["file_id", "minhash", "simhash", "sig_kind"])

    schema = pa.schema([("file_id", pa.string()),
                        ("minhash", pa.binary(cfg.num_perms * 8)),
                        ("simhash", pa.int64()), ("sig_kind", pa.string()),
                        ("edge_to", pa.string())])

    # Arrow-native block: the 1 KB minhash payloads stay C buffers
    # through the sort/compare (the pandas path turned every signature
    # into a Python bytes object on both sides of the block call —
    # measured as the dominant cost of this stage).
    def rep_block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.not_equal(t["sig_kind"], "empty"))
        if t.num_rows == 0:
            return schema.empty_table()
        mergeable = pc.equal(t["sig_kind"], "ok")
        solo = t.filter(pc.invert(mergeable))
        solo = solo.append_column(
            "edge_to", pa.array([""] * solo.num_rows, pa.string()))
        m = t.filter(mergeable).combine_chunks()
        if m.num_rows == 0:
            return pa.concat_tables(
                [schema.empty_table(), solo.cast(schema)])
        m = m.take(pc.sort_indices(
            m, sort_keys=[("minhash", "ascending"),
                          ("file_id", "ascending")])).combine_chunks()
        mh = m["minhash"].combine_chunks()
        first = np.ones(m.num_rows, dtype=bool)
        if m.num_rows > 1:
            eq = pc.equal(mh.slice(1), mh.slice(0, len(mh) - 1))
            first[1:] = np.invert(
                eq.to_numpy(zero_copy_only=False).astype(bool))
        group_idx = np.cumsum(first) - 1
        rep_idx = np.flatnonzero(first)[group_idx]    # rep row per row
        edge_to = pc.if_else(pa.array(first),
                             pa.scalar("", pa.string()),
                             pc.take(m["file_id"], pa.array(rep_idx)))
        m = m.append_column("edge_to", edge_to)
        return pa.concat_tables([m.cast(schema), solo.cast(schema)])

    tagged = partitioned_group_map_arrow(proj, ["minhash"], rep_block,
                                         num_partitions, out_schema=schema)
    tagged = tagged.materialize()  # consumed twice (reps + edges)

    import pyarrow.compute as pc

    reps = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["edge_to"], ""))
        .select(["file_id", "minhash", "simhash", "sig_kind"]),
        batch_format="pyarrow", zero_copy_batch=True)
    sig_edges = tagged.map_batches(
        lambda t: pa.table({
            "a": t.filter(pc.not_equal(t["edge_to"], ""))["edge_to"],
            "b": t.filter(pc.not_equal(t["edge_to"], ""))["file_id"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    return reps, sig_edges


def exact_dup_edges(sigs: ray.data.Dataset,
                    num_partitions: int | None = None) -> ray.data.Dataset:
    """A1: sha256-equal edges (first-vs-rest per group, deterministic
    by file_id order). Empty-content rows are excluded (M16 validator
    semantics, file_validation.rs:37-51).

    Partition-level block processing (functions/groups.py): one shuffle
    on hash(sha256), then the whole partition's groups segment in one
    vectorized pass — no per-group Python overhead."""
    from ..functions.groups import (default_partitions, group_starts,
                                    partitioned_group_map)

    num_partitions = num_partitions or default_partitions()

    def block(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["sig_kind"] != "empty"]
        if df.empty:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        sha = df["sha256"].to_numpy()
        fid = df["file_id"].to_numpy()
        order = np.lexsort((fid, sha))
        sha, fid = sha[order], fid[order]
        new = group_starts(sha)
        group_idx = np.cumsum(new, dtype=np.int32) - 1
        first_fid = fid[new][group_idx]  # group's min file_id, broadcast
        mask = ~new                      # every non-first row is an edge
        return pd.DataFrame({"a": first_fid[mask], "b": fid[mask]})

    return partitioned_group_map(
        sigs.select_columns(["sha256", "file_id", "sig_kind"]),
        ["sha256"], block, num_partitions,
        out_schema=pa.schema([("a", pa.string()), ("b", pa.string())]))

"""Upsert-by-key dedup + deterministic dense doc-id assignment — key-only sort.

Dedup reproduces the reference's upsert-by-primary-key semantics ("last writer
wins" per doc, reference: src/librecatastro/domain/cadaster_entry/
cadaster_entry.py:53 — ``es.index(..., id=self.cadaster)``).  A static Parquet
corpus has no arrival order, so the winner per (repo, path) key is pinned to a
deterministic total order: the row with the lexicographically greatest
sha256(content).

Ids are dense int64 in sorted (repo, path) order (SURVEY.md §2.F F2: the
reference's deterministic alphabetical iteration) and depend only on the data,
never on parallelism.

Scale design — the corpus payload (``content``, ~KBs..100KB per row) never
enters a shuffle.  A naive ``ds.sort(keys)`` would move every content byte
through the all-to-all exchange twice (map spill + reduce fetch); at corpus
scale that is the whole dataset through the object store for what is logically
a metadata operation.  Instead:

  1. ``AddSha`` (stateless task map) appends sha256; blocks are materialized
     once and stay where they are.
  2. A per-block task projects the tiny key table
     ``(bid, row, repo, path, sha256)`` (~100 B/row).
  3. Only the key tables are globally sorted — the engine's one global
     sort, ~0.1% of corpus bytes: a 2-round distributed sample sort
     (deterministic evenly-spaced samples → boundary split via vectorized
     compares → per-range sorts), single-task below ~300k keys.
  4. Per sorted key block: keep-last-of-(repo,path)-run dedup (the next
     block's first key resolves runs spanning a block boundary); dense doc_id
     = per-block cumulative offsets (driver handles only per-block metadata).
  5. Winner ``(bid, row, doc_id)`` triples are scattered straight into
     bid-range groups (one ``num_returns`` task round, no second sort) and
     routed back to their content block; the apply task takes the big block
     ref as its first argument, so Ray's locality-aware scheduling runs it on
     the node already holding the block — content crosses the network zero
     times in the common case, and the fused write variant streams the
     finished doc-store block straight to parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from librecatastro_ray.functions.hashing import sha256_batch


def add_sha_dl(batch: pa.Table, *, analyzer_id: str = "code_standard_v1") -> pa.Table:
    """map_batches (stateless task): append sha256(content) and the token
    count ``dl`` in ONE pass over the corpus — the doc-store row is complete
    before dedup, so no second full-content pipeline pass is needed after id
    assignment.  (Dup losers get tokenized too; dups are rare, one avoided
    full-corpus pass is not.)"""
    from librecatastro_ray.functions.analysis import get_analyzer

    _idx, _terms, dl = get_analyzer(analyzer_id).tokenize_batch(batch["content"])
    return batch.append_column("sha256", sha256_batch(batch["content"])).append_column(
        "dl", pa.array(dl, pa.int64())
    )


@ray.remote
def _extract_keys(block: pa.Table, bid: int) -> pa.Table:
    """Project the sort/dedup key columns plus the block/row address."""
    n = len(block)
    if n == 0 or "repo" not in block.column_names:
        # empty blocks out of an empty upstream may carry no schema
        return pa.table(
            {
                "bid": pa.array([], pa.int32()),
                "row": pa.array([], pa.int32()),
                "repo": pa.array([], pa.string()),
                "path": pa.array([], pa.string()),
                "sha256": pa.array([], pa.string()),
            }
        )
    return pa.table(
        {
            "bid": pa.array(np.full(n, bid, dtype=np.int32), pa.int32()),
            "row": pa.array(np.arange(n, dtype=np.int32), pa.int32()),
            "repo": block["repo"],
            "path": block["path"],
            "sha256": block["sha256"],
        }
    )


def _combined_key(t: pa.Table) -> pa.Array:
    """repo\\x00path\\x00sha256 as one binary column — bytewise order equals
    the (repo, path, sha256) tuple order (separator below any content byte),
    and single-column compares/sorts run ~3× faster than 3-key ones."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        t["repo"].combine_chunks(), t["path"].combine_chunks(),
        t["sha256"].combine_chunks(), "\x00"
    )


@ray.remote
def _sort_keys_single(*tables: pa.Table) -> pa.Table:
    """Whole key table sorted in ONE task (smallest corpora)."""
    import pyarrow.compute as pc

    t = pa.concat_tables(tables).combine_chunks()
    return t.take(pc.sort_indices(_combined_key(t)))


@ray.remote
def _sample_keys(block: pa.Table, n: int) -> list[bytes]:
    """Evenly spaced combined-key samples from one key block."""
    import pyarrow.compute as pc

    if len(block) == 0:
        return []
    idx = np.linspace(0, len(block) - 1, num=min(n, len(block)), dtype=np.int64)
    return pc.binary_join_element_wise(
        block["repo"].take(pa.array(idx)),
        block["path"].take(pa.array(idx)),
        block["sha256"].take(pa.array(idx)),
        "\x00",
    ).to_pylist()


@ray.remote
def _split_keys(block: pa.Table, bounds: list[bytes]) -> tuple:
    """Scatter one key block into len(bounds)+1 boundary ranges via
    vectorized string compares (partition id = Σ key > bound_i)."""
    import pyarrow.compute as pc

    P = len(bounds) + 1
    if len(block) == 0:
        out = block
        return tuple(out for _ in range(P)) if P > 1 else out
    ck = _combined_key(block)
    part = np.zeros(len(block), dtype=np.int64)
    for b in bounds:
        part += pc.greater(ck, b).to_numpy(zero_copy_only=False).astype(np.int64)
    outs = tuple(block.filter(pa.array(part == p)) for p in range(P))
    return outs if P > 1 else outs[0]


@ray.remote
def _sort_range(*tables: pa.Table) -> pa.Table:
    """Sort one boundary range (all rows ≤ its upper bound land here)."""
    import pyarrow.compute as pc

    t = pa.concat_tables(tables).combine_chunks()
    if len(t) == 0:
        return t
    return t.take(pc.sort_indices(_combined_key(t)))


def _sorted_key_blocks(key_refs: list, n_rows: int) -> list:
    """Distributed sample sort of the key table: 2 task rounds (split by
    sampled boundaries → per-range sort), no Ray Data sort machinery.
    Boundaries come from deterministic evenly-spaced samples; they only
    steer partitioning — final order and dedup are boundary-independent."""
    n_cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    # ~300k keys per sort range; below one range, sorting in one task beats
    # paying the sample/split round
    P = max(1, min(n_cpus, round(n_rows / 300_000)))
    if P <= 1:
        return [_sort_keys_single.remote(*key_refs)]
    samples = sorted(
        s for part in ray.get([_sample_keys.remote(r, 32) for r in key_refs]) for s in part
    )
    if not samples:
        return [_sort_keys_single.remote(*key_refs)]
    bounds = [samples[(i + 1) * len(samples) // P] for i in range(P - 1)]
    bounds = sorted(set(bounds))
    P = len(bounds) + 1
    if P <= 1:
        return [_sort_keys_single.remote(*key_refs)]
    splits = [
        _split_keys.options(num_returns=P).remote(r, bounds) for r in key_refs
    ]
    return [_sort_range.remote(*[s[p] for s in splits]) for p in range(P)]



@ray.remote
def _key_block_meta(block: pa.Table) -> tuple[str, str, str, int]:
    if len(block) == 0:
        return ("", "", "", 0)
    return (
        block["repo"][0].as_py(),
        block["path"][0].as_py(),
        block["sha256"][0].as_py(),
        len(block),
    )


@ray.remote(num_returns=2)
def _dedup_keys(block: pa.Table, next_key: tuple[str, str] | None):
    """Keep the last row of each (repo, path) run (sha asc → last = max sha).
    The run that reaches the end of the block also loses its last row when the
    NEXT block starts with the same key.  Returns (winner key table, count)."""
    n = len(block)
    if n == 0:
        return block, 0
    repo = np.asarray(block["repo"])
    path = np.asarray(block["path"])
    keep = np.ones(n, dtype=bool)
    same = (repo[:-1] == repo[1:]) & (path[:-1] == path[1:])
    keep[:-1] = ~same
    if next_key is not None and repo[-1] == next_key[0] and path[-1] == next_key[1]:
        keep[-1] = False
    out = block.filter(pa.array(keep))
    return out, len(out)


@ray.remote
def _stamp_split(winners: pa.Table, offset: int, n_groups: int, span: int) -> tuple:
    """Winners arrive in global (repo, path) order; dense ids are the global
    positions.  Emits the routing triples (bid, row, doc_id) pre-split into
    ``n_groups`` bid-range groups (group g owns bids [g*span, (g+1)*span)) —
    a direct scatter that replaces a second Ray Data sort round with one
    task round."""
    ids = pa.array(np.arange(offset, offset + len(winners), dtype=np.int64), pa.int64())
    t = pa.table({"bid": winners["bid"], "row": winners["row"], "doc_id": ids})
    if n_groups == 1:
        # num_returns=1 → the whole return value is ONE object, no unpacking
        return t
    grp = t["bid"].to_numpy() // span
    return tuple(t.filter(pa.array(grp == g)) for g in range(n_groups))


def _select_winners(block: pa.Table, bid: int, winner_groups) -> pa.Table | None:
    parts = []
    for wb in winner_groups:
        mask = wb["bid"].to_numpy() == bid
        if mask.any():
            parts.append(wb.filter(pa.array(mask)))
    return pa.concat_tables(parts) if parts else None


def _stamped_block(block: pa.Table, bid: int, winner_groups) -> pa.Table:
    w = _select_winners(block, bid, winner_groups)
    if w is None:
        return block.slice(0, 0).append_column("doc_id", pa.array([], pa.int64()))
    rows = w["row"].to_numpy().astype(np.int64)
    ids = w["doc_id"].to_numpy()
    order = np.argsort(rows, kind="stable")
    out = block.take(pa.array(rows[order]))
    return out.append_column("doc_id", pa.array(ids[order], pa.int64()))


@ray.remote
def _apply_ids(block: pa.Table, bid: int, *winner_groups: pa.Table) -> pa.Table:
    """Filter a content block to its dedup winners and append doc_id.  The
    block is the first (largest) argument so Ray schedules this task on the
    node that owns it — winners are the only bytes that travel."""
    return _stamped_block(block, bid, winner_groups)


@ray.remote(num_returns=2)
def _apply_ids_write(
    block: pa.Table, bid: int, docs_dir: str, compression: str, *winner_groups: pa.Table
):
    """Like _apply_ids, but writes the finished doc-store block straight to
    ``docs_dir/part-{bid}.parquet`` (atomic tmp+rename) instead of returning
    it — the corpus payload goes object store → disk without a second
    materialized copy.  A part file that already exists (same build plan,
    see dedup_assign_write) is left untouched and only re-counted — block-
    level resume for the docs phase.  Returns (n_rows, sum_dl)."""
    import pyarrow.parquet as pq

    path = os.path.join(docs_dir, f"part-{bid:06d}.parquet")
    if os.path.exists(path):
        t = pq.read_table(path, columns=["dl"])
        return len(t), int(np.asarray(t["dl"]).sum()) if len(t) else 0
    out = _stamped_block(block, bid, winner_groups)
    if len(out) == 0:
        return 0, 0
    tmp = path + ".tmp"
    pq.write_table(out, tmp, compression="zstd" if compression == "zstd" else compression)
    os.replace(tmp, path)
    return len(out), int(np.asarray(out["dl"]).sum())


@ray.remote
def _block_fp(block: pa.Table) -> str:
    """Content fingerprint of one corpus block: md5 over the FULL sha256
    column (already computed by add_sha_dl — ~64 B/row, so hashing every row
    is microseconds per block).  Makes the resume plan CONTENT-aware: any
    byte change in any row changes that row's sha and hence the block
    fingerprint, so identical-layout content changes can no longer silently
    keep stale part files."""
    import hashlib

    if len(block) == 0 or "sha256" not in block.column_names:
        return "empty"
    from librecatastro_ray.functions.codec import binary_column_payload

    # shas are fixed-width (64 hex chars) non-null values, so the packed
    # buffer payload IS the row-order concatenation — one md5, no per-row
    # Python
    h = hashlib.md5(str(len(block)).encode())
    h.update(binary_column_payload(block["sha256"]).tobytes())
    return h.hexdigest()


def _bundle_refs(mat: ray.data.Dataset) -> list:
    refs: list = []
    for bundle in mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return refs


def _bundle_refs_meta(mat: ray.data.Dataset) -> tuple[list, list[int]]:
    """Block refs plus per-block row counts (from bundle metadata — free)."""
    refs: list = []
    rows: list[int] = []
    for bundle in mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
        for m in bundle.metadata:
            rows.append(int(m.num_rows if m.num_rows is not None else -1))
    return refs, rows


def _winner_splits(
    block_refs: list, n_rows: int, id_base: int = 0
) -> tuple[list[list], int, int]:
    """Key extraction → key-only global sort → per-block dedup → id stamping,
    returning ``(groups, span, n_docs)`` where ``groups[g]`` is the list of
    winner-triple refs for bid range [g*span, (g+1)*span)."""
    key_refs = [_extract_keys.remote(r, bid) for bid, r in enumerate(block_refs)]
    skey_refs = _sorted_key_blocks(key_refs, n_rows)
    meta = ray.get([_key_block_meta.remote(r) for r in skey_refs])
    # order blocks by first (repo, path, sha) — sort output blocks are key
    # ranges, so this reconstructs the global order from metadata alone
    order = [i for i in sorted(range(len(skey_refs)), key=lambda i: meta[i][:3]) if meta[i][3] > 0]
    next_keys: list[tuple[str, str] | None] = []
    for j, i in enumerate(order):
        nk = None
        if j + 1 < len(order):
            k = meta[order[j + 1]]
            nk = (k[0], k[1])
        next_keys.append(nk)
    winner_refs, count_refs = [], []
    for i, nk in zip(order, next_keys):
        w_ref, c_ref = _dedup_keys.remote(skey_refs[i], nk)
        winner_refs.append(w_ref)
        count_refs.append(c_ref)
    counts = ray.get(count_refs)
    n_docs = int(sum(counts))
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64) + int(id_base)

    # scatter (bid, row, doc_id) straight into bid-range groups — one task
    # round instead of a second Ray Data sort
    n_blocks = len(block_refs)
    G = max(1, min(32, n_blocks))
    span = (n_blocks + G - 1) // G
    groups: list[list] = [[] for _ in range(G)]
    for w, off in zip(winner_refs, offsets):
        parts = _stamp_split.options(num_returns=G).remote(w, int(off), G, span)
        if G == 1:
            parts = [parts]
        for g, ref in enumerate(parts):
            groups[g].append(ref)
    return groups, span, n_docs


def dedup_and_assign_ids(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, int]:
    """sha256 + dl → key-only global sort (repo, path, sha256) → per-block
    dedup + dense doc_id routed back to unmoved content blocks.  Returns
    ``(dataset, n_docs)``; the dataset has sha256, dl and doc_id columns and
    at most one row per (repo, path)."""
    ds = ds.map_batches(add_sha_dl, batch_format="pyarrow", batch_size=512)
    mat = ds.materialize()
    block_refs = _bundle_refs(mat)
    if not block_refs:
        return mat, 0
    groups, span, n_docs = _winner_splits(block_refs, mat.count())
    out_refs = [
        _apply_ids.remote(block, bid, *groups[bid // span])
        for bid, block in enumerate(block_refs)
    ]
    return ray.data.from_arrow_refs(out_refs), n_docs


def dedup_assign_write(
    ds: ray.data.Dataset,
    docs_dir: str,
    compression: str = "zstd",
    analyzer_id: str = "code_standard_v1",
    id_base: int = 0,
) -> tuple[int, int]:
    """Fused variant for the build pipeline: dedup + id assignment with the
    finished doc-store blocks written straight to ``docs_dir`` (one parquet
    file per content block, atomic rename) — the corpus payload crosses the
    object store exactly once and is never re-materialized.

    Block-level resume: a ``_PLAN.json`` records (n_blocks, n_rows,
    per-block row counts AND per-block content fingerprints) before any
    write; when a rerun sees the same plan, part files that survived the
    crash are kept (ids are deterministic for a fixed corpus, so surviving
    files are correct) and only missing blocks are recomputed.  A differing
    plan — shape OR content (the fingerprints hash each block's sha256
    samples) — wipes the directory first.  Returns ``(n_docs, sum_dl)``."""
    import glob
    import json

    os.makedirs(docs_dir, exist_ok=True)
    ds = ds.map_batches(
        add_sha_dl,
        fn_kwargs={"analyzer_id": analyzer_id},
        batch_format="pyarrow",
        batch_size=512,
    )
    mat = ds.materialize()
    block_refs, block_rows = _bundle_refs_meta(mat)
    if not block_refs:
        return 0, 0
    n_rows = mat.count()
    plan_path = os.path.join(docs_dir, "_PLAN.json")
    block_fps = ray.get([_block_fp.remote(r) for r in block_refs])
    plan = {
        "n_blocks": len(block_refs),
        "n_rows": int(n_rows),
        "block_rows": block_rows,
        "block_fps": block_fps,
    }
    old_plan = None
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            old_plan = json.load(f)
    if old_plan != plan:
        for f in glob.glob(os.path.join(docs_dir, "part-*.parquet*")):
            os.remove(f)
        tmp = plan_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(plan, f)
        os.replace(tmp, plan_path)
    groups, span, n_docs = _winner_splits(block_refs, n_rows, id_base)
    count_refs, dl_refs = [], []
    for bid, block in enumerate(block_refs):
        c, d = _apply_ids_write.remote(block, bid, docs_dir, compression, *groups[bid // span])
        count_refs.append(c)
        dl_refs.append(d)
    counts = ray.get(count_refs)
    dl_sums = ray.get(dl_refs)
    assert sum(counts) == n_docs, f"doc-store rows {sum(counts)} != winners {n_docs}"
    return n_docs, int(sum(dl_sums))

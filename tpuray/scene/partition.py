"""Spatial scene partitioning: a forest of SMEM-sized BVH chunks.

The packet traversal kernel (kernels/trace_pallas.py) keeps all node/triangle
constants in SMEM, which caps scenes at ~15-20k triangles. Larger scenes are
split here into spatial chunks of <= max_tris triangles (recursive median
split on the widest centroid axis), each with its own sweep-SAH BVH, then
concatenated into ONE skip-link forest in DFS preorder:

  - chunk c owns nodes [node_base[c], node_base[c+1]) and triangles
    [tri_base[c], tri_base[c+1]);
  - every skip link is offset to global node indexing, so chunk c's root
    skip == node_base[c+1]: walking the forest from node 0 with the normal
    skip-link rules visits every chunk in sequence. The XLA wavefront
    (integrator.intersect.trace) therefore traverses a forest UNCHANGED.
  - the Pallas packet kernel instead streams one chunk's tables at a time
    from HBM into SMEM scratch (kernels/trace_chunked.py), so per-chunk
    size, not scene size, is what must fit on-chip.

The reference has no equivalent (its whole scene rides a GL texture buffer,
main.cpp:136-151); this is the TPU answer to the same "arbitrary scene size"
requirement.
"""
from __future__ import annotations

import numpy as np

from tpuray.accel.bvh import build_bvh


def partition_triangles(tri_verts: np.ndarray, max_tris: int) -> list[np.ndarray]:
    """Recursive median split of triangle indices by centroid.

    Returns a list of index arrays (original order preserved within each
    part), each of length <= max_tris. Deterministic.
    """
    centers = tri_verts.mean(axis=1)  # (T, 3)
    out: list[np.ndarray] = []

    def rec(idx: np.ndarray) -> None:
        if len(idx) <= max_tris:
            out.append(idx)
            return
        c = centers[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(idx) // 2
        rec(idx[order[:half]])
        rec(idx[order[half:]])

    rec(np.arange(len(tri_verts)))
    return out


def build_forest_bvh(tri_verts: np.ndarray, leaf_size: int = 8,
                     max_chunk_tris: int = 8192,
                     force_py: bool = False) -> dict:
    """Partitioned build: same contract as accel.bvh.build_bvh plus chunk
    tables. Returns dict with

      aabb_min/aabb_max (N,3), first_tri/tri_count/skip (N,), perm (T,)
      chunk_node_base (C+1,) int32, chunk_tri_base (C+1,) int32

    first_tri and skip are GLOBAL indices (forest layout, see module doc).
    With max_chunk_tris >= T this degenerates to one chunk == build_bvh.
    """
    tri_verts = np.ascontiguousarray(tri_verts, np.float32)
    parts = partition_triangles(tri_verts, max_chunk_tris)

    mins, maxs, firsts, counts, skips, perms = [], [], [], [], [], []
    node_base = [0]
    tri_base = [0]
    for idx in parts:
        b = build_bvh(tri_verts[idx], leaf_size, force_py=force_py)
        nb, tb = node_base[-1], tri_base[-1]
        mins.append(b["aabb_min"])
        maxs.append(b["aabb_max"])
        firsts.append(b["first_tri"] + tb)
        counts.append(b["tri_count"])
        skips.append(b["skip"] + nb)
        perms.append(idx[b["perm"]])
        node_base.append(nb + len(b["skip"]))
        tri_base.append(tb + len(idx))

    return {
        "aabb_min": np.concatenate(mins),
        "aabb_max": np.concatenate(maxs),
        "first_tri": np.concatenate(firsts).astype(np.int32),
        "tri_count": np.concatenate(counts).astype(np.int32),
        "skip": np.concatenate(skips).astype(np.int32),
        "perm": np.concatenate(perms),
        "chunk_node_base": np.asarray(node_base, np.int32),
        "chunk_tri_base": np.asarray(tri_base, np.int32),
    }


def build_forest_bvh_uniform(tri_verts: np.ndarray, leaf_size: int = 8,
                             max_chunk_tris: int = 8192,
                             force_py: bool = False) -> dict:
    """Uniform (padded) forest layout for the chunk-streaming Pallas kernel.

    Chunk c occupies node rows [c*chunk_nodes, (c+1)*chunk_nodes) and
    triangle rows [c*chunk_tris, (c+1)*chunk_tris). Shorter chunks are
    padded: padding nodes have an inverted (never-hit) AABB and skip
    straight to the next chunk root, so the skip-link walk of the XLA
    wavefront steps over them at one visit per chunk; padding triangle slots
    have perm == -1 and must be given degenerate (all-zero) geometry by the
    caller (apply_perm_padded), which can never intersect.

    Returns the build_forest_bvh dict plus "chunk_nodes"/"chunk_tris" ints;
    first_tri and skip are global indices into the PADDED arrays.
    """
    tri_verts = np.ascontiguousarray(tri_verts, np.float32)
    parts = partition_triangles(tri_verts, max_chunk_tris)
    builds = [build_bvh(tri_verts[idx], leaf_size, force_py=force_py)
              for idx in parts]

    def up128(x: int) -> int:
        # chunk strides are the Pallas SMEM block sizes; the TPU lowering
        # requires last-dim blocks divisible by 128
        return (x + 127) // 128 * 128

    cn = up128(max(len(b["skip"]) for b in builds))
    ct = up128(max(len(p) for p in parts))
    c = len(parts)

    aabb_min = np.full((c * cn, 3), np.float32(np.finfo(np.float32).max))
    aabb_max = np.full((c * cn, 3), np.float32(-np.finfo(np.float32).max))
    first = np.zeros(c * cn, np.int32)
    count = np.zeros(c * cn, np.int32)
    skip = np.empty(c * cn, np.int32)
    perm = np.full(c * ct, -1, np.int64)

    for ci, (idx, b) in enumerate(zip(parts, builds)):
        nb, tb = ci * cn, ci * ct
        sz = len(b["skip"])
        aabb_min[nb: nb + sz] = b["aabb_min"]
        aabb_max[nb: nb + sz] = b["aabb_max"]
        first[nb: nb + sz] = b["first_tri"] + tb
        count[nb: nb + sz] = b["tri_count"]
        skip[nb: nb + sz] = b["skip"] + nb
        skip[nb + sz: nb + cn] = (ci + 1) * cn  # padding: step to next chunk
        perm[tb: tb + len(idx)] = idx[b["perm"]]

    base = np.arange(c + 1, dtype=np.int64)
    return {
        "aabb_min": aabb_min, "aabb_max": aabb_max,
        "first_tri": first, "tri_count": count, "skip": skip,
        "perm": perm,
        "chunk_node_base": (base * cn).astype(np.int32),
        "chunk_tri_base": (base * ct).astype(np.int32),
        "chunk_nodes": cn, "chunk_tris": ct,
    }


def apply_perm_padded(arr: np.ndarray, perm: np.ndarray,
                      fill: float = 0.0) -> np.ndarray:
    """Reorder per-triangle attributes by a padded perm (-1 = padding slot,
    filled with `fill` — zero geometry never intersects)."""
    out = np.full((len(perm),) + arr.shape[1:], fill, arr.dtype)
    real = perm >= 0
    out[real] = arr[perm[real]]
    return out

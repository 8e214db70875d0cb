"""Pallas TPU packet-traversal megakernel.

TPU-native replacement for the reference's per-fragment stack traversal
(path_tracing.frag:372-424). Design notes:

- Rays are processed in *packets* of PACKET_ROWS x 128 (one 32x32 image tile
  per grid step). The packet shares ONE scalar traversal pointer into the
  threaded (skip-link) BVH: the packet descends into a subtree iff ANY ray
  hits the node's AABB. Lock-step over the packet trades redundant node
  visits for perfectly uniform VPU work with no per-lane gathers — the
  classic packet-traversal idea mapped onto the TPU's scalar+vector split.
- Node AABBs, leaf metadata and triangle constants live in SMEM as regular
  whole-array SMEM inputs, so the scalar core chases pointers while the VPU
  does the 4096-wide slab/triangle tests with scalar operands broadcast for
  free. (NOT scalar-prefetch operands: those silently truncate beyond
  ~1024 entries per row on the current toolchain — every triangle above
  that index became unreachable; caught against the XLA oracle on-device.)
- Scenes beyond the SMEM budget use the chunk-streaming variant
  (kernels/trace_chunked.py) over a uniform forest (scene/partition.py).
- Traversal is topology-only (t, triangle index out); shading re-derives
  everything differentiably (tpuray.integrator.path_tracer.resolve_hit), so
  the kernel needs no VJP.
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuray.scene.types import BVHSoA, TriangleSoA

Array = jax.Array

INF = np.float32(1e30)
T_MIN = np.float32(5e-4)
PARALLEL_EPS = np.float32(1e-5)

PACKET_ROWS = 32         # sublanes per packet (32 benched fastest on v5e)
PACKET_LANES = 128       # lanes
PACKET = PACKET_ROWS * PACKET_LANES  # rays per packet (= two 32x32 tiles)


MAX_STACK = 128  # >= 2 * max tree depth; asserted at pack time
MAX_LEAF = 8     # builder leaf size (accel/bvh.py); asserted at pack time


def batched_stack_size(batch_k: int) -> int:
    """SMEM stack entries for the batched-K kernel.

    Batched-K expansion pops K nodes and pushes up to 2K before popping
    again, so its peak occupancy is NOT the strict-DFS bound the pack-time
    assert checks (~depth+1): each K-pop level can leave up to K unexpanded
    nodes behind, i.e. up to ~K * strict_max live entries (ADVICE r4 —
    at MAX_STACK=128 a deep SMEM-fitting tree could overflow silently).
    Bound: the kernel soft-clamps k to 1 once sp exceeds batch_k*MAX_STACK;
    from any state, strict (k=1) expansion grows occupancy by at most
    depth+1 <= MAX_STACK more, so (batch_k+1)*MAX_STACK (+margin) can never
    be exceeded. ~4.6 KB of SMEM at K=8."""
    return (max(batch_k, 1) + 1) * MAX_STACK + 8


def _kernel_batched(meta_ref, aabb_ref, tverts_ref, rays_ref,
                    t_out, idx_out, t_scr, idx_scr, stack_ref,
                    *, n_nodes: int, any_hit: bool, common_origin: bool,
                    rows: int, batch_k: int):
    """Batched-K DFS expansion for INCOHERENT packets.

    The strict DFS (_kernel below) pays a serialized vector->scalar stall
    per node: each expand's any() reductions must reach the scalar core
    before the next pop (measured ~330ns per visit of which VPU work is a
    fraction — scripts/exp_traversal_counts.py + exp_batchk.py). Incoherent
    packets visit ~290 nodes (the near-whole-tree union of 4096 random
    rays), so this variant pops up to batch_k stack nodes per iteration and
    issues all 2K child slab tests and any() reductions BEFORE any scalar
    consumption, overlapping the readback latencies (14.7 -> 10.2 ms on
    640k fully-random rays, K=8, v5e). Coherent packets keep the strict
    DFS: their frontier is usually smaller than K, and clamp-padded
    re-expansions of the same node would waste more VPU than the
    latency overlap buys.

    Decision-equivalent to _kernel (t_lim folds the per-test t/tmax/hit
    compares; batch-stale entry limits only ADMIT extra nodes, never drop
    one), so outputs match the XLA oracle exactly.
    """
    # rays ride ONE packed VMEM block (rows, 7*128): component c in lanes
    # [c*128, (c+1)*128) — 128-aligned static slices are free VMEM loads,
    # and one block means one DMA descriptor per grid step instead of seven
    if common_origin:
        ox, oy, oz = rays_ref[0, 0], rays_ref[0, 128], rays_ref[0, 256]
    else:
        ox = rays_ref[:, 0:128]
        oy = rays_ref[:, 128:256]
        oz = rays_ref[:, 256:384]
    dx = rays_ref[:, 384:512]
    dy = rays_ref[:, 512:640]
    dz = rays_ref[:, 640:768]
    tmax_in = rays_ref[:, 768:896]
    dead = tmax_in <= 0.0
    tmax = jnp.where(dead, -INF, tmax_in)

    def safe_inv(v):
        tiny = jnp.where(v < 0, np.float32(-1e-20), np.float32(1e-20))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

    inv_dx, inv_dy, inv_dz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    sx, sy, sz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)

    def slab(node, t_limit):
        f0 = (aabb_ref[3, node] - ox) * inv_dx
        n0 = (aabb_ref[0, node] - ox) * inv_dx
        f1 = (aabb_ref[4, node] - oy) * inv_dy
        n1 = (aabb_ref[1, node] - oy) * inv_dy
        f2 = (aabb_ref[5, node] - oz) * inv_dz
        n2 = (aabb_ref[2, node] - oz) * inv_dz
        t1 = jnp.minimum(jnp.maximum(f0, n0),
                         jnp.minimum(jnp.maximum(f1, n1), jnp.maximum(f2, n2)))
        t0 = jnp.maximum(jnp.minimum(f0, n0),
                         jnp.maximum(jnp.minimum(f1, n1), jnp.minimum(f2, n2)))
        return (t1 >= jnp.maximum(t0, 0.0)) & (t0 < t_limit) & (t1 > 0.0)

    def visit(hit, entered, count, first):
        @pl.when(entered & (count > 0))
        def _():
            t = t_scr[...]
            idx = idx_scr[...]
            t_lim = jnp.where(hit, jnp.minimum(t, tmax), -INF)
            for j in range(MAX_LEAF):
                ti = first + jnp.minimum(jnp.int32(j), count - 1)
                nx = tverts_ref[0, ti]
                ny = tverts_ref[1, ti]
                nz = tverts_ref[2, ti]
                np0 = tverts_ref[3, ti]
                ndotd = nx * dx + ny * dy + nz * dz
                ndoto = nx * ox + ny * oy + nz * oz
                invalid = jnp.abs(ndotd) < PARALLEL_EPS
                denom = jnp.where(invalid, np.float32(1.0), ndotd)
                t_hit = (np0 - ndoto) / denom
                px = ox + dx * t_hit
                py = oy + dy * t_hit
                pz = oz + dz * t_hit
                u = (tverts_ref[4, ti] * px + tverts_ref[5, ti] * py
                     + tverts_ref[6, ti] * pz + tverts_ref[7, ti])
                v = (tverts_ref[8, ti] * px + tverts_ref[9, ti] * py
                     + tverts_ref[10, ti] * pz + tverts_ref[11, ti])
                in_tri = (u > 0) & (v > 0) & (u + v < 1)
                ok = (jnp.logical_not(invalid) & (t_hit >= T_MIN) & in_tri
                      & (j < count) & (t_hit < t_lim))
                t = jnp.where(ok, t_hit, t)
                idx = jnp.where(ok, ti, idx)
                t_lim = jnp.minimum(t_lim, t)
            t_scr[...] = t
            idx_scr[...] = idx

    def body(sp):
        # soft clamp (see batched_stack_size): past batch_k*MAX_STACK live
        # entries fall back to strict one-pop expansion, whose growth is
        # bounded by tree depth — keeps the worst-case occupancy provably
        # inside the scratch allocation. Unreachable on sane trees (measured
        # peaks are tens of entries); costs one scalar min per iteration.
        k = jnp.minimum(jnp.minimum(sp, batch_k),
                        jnp.maximum(batch_k * MAX_STACK - sp, 1))
        # vector phase: all 2K child slab tests + any() reductions issued
        # with NO scalar consumption in between
        limit = jnp.minimum(t_scr[...], tmax)
        if any_hit:
            limit = jnp.where(idx_scr[...] < 0, limit, -INF)
        infos = []
        for i in range(batch_k):
            node = stack_ref[jnp.maximum(sp - 1 - i, 0)]
            left = node + 1
            right = meta_ref[2, node]
            hit_l = slab(left, limit)
            hit_r = slab(right, limit)
            infos.append((node, left, right, hit_l, hit_r,
                          jnp.any(hit_l), jnp.any(hit_r)))
        sp_new = sp - k
        # scalar/leaf phase: consume flags (their latencies overlapped)
        for i in range(batch_k):
            node, left, right, hit_l, hit_r, ent_l, ent_r = infos[i]
            # i < k, NOT i < sp: entries beyond the (possibly clamped) pop
            # count stay on the stack and must not be expanded this round
            valid_i = i < k
            ent_l = ent_l & valid_i
            ent_r = ent_r & valid_i
            count_l = meta_ref[1, left]
            count_r = meta_ref[1, right]
            visit(hit_l, ent_l, count_l, meta_ref[0, left])
            visit(hit_r, ent_r, count_r, meta_ref[0, right])
            axis = meta_ref[3, node]
            left_low = meta_ref[4, node]
            dpos = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz)) > 0
            near_is_left = dpos == (left_low == 1)
            push_l = ent_l & (count_l == 0)
            push_r = ent_r & (count_r == 0)
            far_node = jnp.where(near_is_left, right, left)
            near_node = jnp.where(near_is_left, left, right)
            push_far = jnp.where(near_is_left, push_r, push_l)
            push_near = jnp.where(near_is_left, push_l, push_r)

            @pl.when(push_far)
            def _():
                stack_ref[sp_new] = far_node

            sp_new = sp_new + push_far.astype(jnp.int32)

            @pl.when(push_near)
            def _():
                stack_ref[sp_new] = near_node

            sp_new = sp_new + push_near.astype(jnp.int32)
        if any_hit:
            sp_new = jnp.where(jnp.all((idx_scr[...] >= 0) | dead), 0, sp_new)
        return sp_new

    t_scr[...] = jnp.full((rows, PACKET_LANES), INF, jnp.float32)
    idx_scr[...] = jnp.full((rows, PACKET_LANES), -1, jnp.int32)
    root_hit = slab(0, tmax)
    root_entered = jnp.any(root_hit)
    root_count = meta_ref[1, 0]
    visit(root_hit, root_entered, root_count, meta_ref[0, 0])
    stack_ref[0] = jnp.int32(0)
    sp0 = jnp.where(root_entered & (root_count == 0), 1, 0).astype(jnp.int32)
    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    t_out[...] = t_scr[...]
    idx_out[...] = idx_scr[...]


def _kernel(meta_ref, aabb_ref, tverts_ref, rays_ref,
            t_out, idx_out, t_scr, idx_scr, stack_ref,
            *, n_nodes: int, any_hit: bool, common_origin: bool,
            rows: int = PACKET_ROWS):
    # packed rays block: see _kernel_batched prologue note
    if common_origin:
        # all rays share one origin (pinhole-camera primaries): hoist it to
        # the scalar core so the slab diffs and the triangle-plane offset
        # n.o become scalar ops — per-element float math is identical to
        # the vector path, so oracle bit-parity is preserved
        ox, oy, oz = rays_ref[0, 0], rays_ref[0, 128], rays_ref[0, 256]
    else:
        ox = rays_ref[:, 0:128]
        oy = rays_ref[:, 128:256]
        oz = rays_ref[:, 256:384]
    dx = rays_ref[:, 384:512]
    dy = rays_ref[:, 512:640]
    dz = rays_ref[:, 640:768]
    # dead lanes (t_max <= 0: padding, or rays masked off by the integrator
    # — sky pixels, terminated paths) are snapped to -INF so they can never
    # pass a slab test even when their origin sits inside a node's AABB
    # (there t0 is negative and `t0 < limit` would admit them). A packet
    # whose rays are ALL dead fails the root test and costs nothing — this
    # is what lets the integrator skip whole sky tiles on secondary rays.
    tmax_in = rays_ref[:, 768:896]
    dead = tmax_in <= 0.0
    tmax = jnp.where(dead, -INF, tmax_in)

    def safe_inv(v):
        tiny = jnp.where(v < 0, np.float32(-1e-20), np.float32(1e-20))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

    inv_dx, inv_dy, inv_dz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    # dominant packet direction (scalars, once per packet) for near-first
    # child ordering — the TPU analogue of the reference's per-ray distance
    # compare (path_tracing.frag:408-420)
    sx = jnp.sum(dx)
    sy = jnp.sum(dy)
    sz = jnp.sum(dz)

    def slab(node):
        """AABB slab test of one node against the packet -> hit mask."""
        amin_x = aabb_ref[0, node]
        amin_y = aabb_ref[1, node]
        amin_z = aabb_ref[2, node]
        amax_x = aabb_ref[3, node]
        amax_y = aabb_ref[4, node]
        amax_z = aabb_ref[5, node]
        f0 = (amax_x - ox) * inv_dx
        n0 = (amin_x - ox) * inv_dx
        f1 = (amax_y - oy) * inv_dy
        n1 = (amin_y - oy) * inv_dy
        f2 = (amax_z - oz) * inv_dz
        n2 = (amin_z - oz) * inv_dz
        t1 = jnp.minimum(jnp.maximum(f0, n0),
                         jnp.minimum(jnp.maximum(f1, n1), jnp.maximum(f2, n2)))
        t0 = jnp.maximum(jnp.minimum(f0, n0),
                         jnp.maximum(jnp.minimum(f1, n1), jnp.minimum(f2, n2)))
        t = t_scr[...]
        limit = jnp.minimum(t, tmax)
        if any_hit:
            active = idx_scr[...] < 0
        else:
            active = jnp.ones_like(t, dtype=bool)
        return ((t1 >= jnp.maximum(t0, 0.0)) & (t0 < limit) & (t1 > 0.0)
                & active)

    def visit(node, hit, entered, count, first):
        """Leaf triangle scan for an entered node (no-op for inner nodes).

        Fully unrolled to MAX_LEAF straight-line masked tests with register
        accumulation: the j-th test is independent of the others except for
        the cheap running-min merge, so the VPU pipelines all of them and
        t/idx round-trip VMEM once per leaf instead of once per triangle.
        Out-of-range slots clamp to the last triangle and are masked
        (idempotent: strict t_hit < t keeps the first winner)."""

        @pl.when(entered & (count > 0))
        def _():
            t = t_scr[...]
            idx = idx_scr[...]
            for j in range(MAX_LEAF):
                ti = first + jnp.minimum(jnp.int32(j), count - 1)
                nx = tverts_ref[0, ti]
                ny = tverts_ref[1, ti]
                nz = tverts_ref[2, ti]
                np0 = tverts_ref[3, ti]
                ndotd = nx * dx + ny * dy + nz * dz
                ndoto = nx * ox + ny * oy + nz * oz
                invalid = jnp.abs(ndotd) < PARALLEL_EPS
                denom = jnp.where(invalid, np.float32(1.0), ndotd)
                t_hit = (np0 - ndoto) / denom
                px = ox + dx * t_hit
                py = oy + dy * t_hit
                pz = oz + dz * t_hit
                u = (tverts_ref[4, ti] * px + tverts_ref[5, ti] * py
                     + tverts_ref[6, ti] * pz + tverts_ref[7, ti])
                v = (tverts_ref[8, ti] * px + tverts_ref[9, ti] * py
                     + tverts_ref[10, ti] * pz + tverts_ref[11, ti])
                in_tri = (u > 0) & (v > 0) & (u + v < 1)
                ok = (jnp.logical_not(invalid) & (t_hit >= T_MIN) & in_tri
                      & hit & (j < count) & (t_hit < t) & (t_hit < tmax))
                t = jnp.where(ok, t_hit, t)
                idx = jnp.where(ok, ti, idx)
            t_scr[...] = t
            idx_scr[...] = idx

    def expand(node, live, sp):
        """Test both children of an entered inner node, scan leaf children
        inline, push entered inner children (far below near). The two slab
        tests + any() reductions are independent and pipeline on the VPU
        while the scalar core stages the next loads."""
        left = node + 1
        right = meta_ref[2, node]
        axis = meta_ref[3, node]
        left_low = meta_ref[4, node]

        hit_l = slab(left)
        hit_r = slab(right)
        ent_l = jnp.any(hit_l) & live
        ent_r = jnp.any(hit_r) & live
        count_l = meta_ref[1, left]
        count_r = meta_ref[1, right]

        # leaf children scan inline (order vs. pushed subtrees is relaxed —
        # min-t accumulation is order independent)
        visit(left, hit_l, ent_l, count_l, meta_ref[0, left])
        visit(right, hit_r, ent_r, count_r, meta_ref[0, right])

        # push entered *inner* children, far below near (near popped first)
        dpos = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz)) > 0
        near_is_left = dpos == (left_low == 1)
        push_l = ent_l & (count_l == 0)
        push_r = ent_r & (count_r == 0)
        far_node = jnp.where(near_is_left, right, left)
        near_node = jnp.where(near_is_left, left, right)
        push_far = jnp.where(near_is_left, push_r, push_l)
        push_near = jnp.where(near_is_left, push_l, push_r)

        @pl.when(push_far)
        def _():
            stack_ref[sp] = far_node

        sp = sp + push_far.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[sp] = near_node

        return sp + push_near.astype(jnp.int32)

    def body(sp):
        # pop ONE entered inner node per iteration. (Popping two and
        # expanding both was benched: the relaxed near-first order costs
        # more node visits than the extra ILP buys back.)
        sp = sp - 1
        node = stack_ref[sp]
        sp = expand(node, True, sp)
        if any_hit:
            # all live rays found their hit -> stop the walk (dead lanes
            # never record a hit; without the `| dead` a single masked-off
            # ray would force the full walk)
            sp = jnp.where(jnp.all((idx_scr[...] >= 0) | dead), 0, sp)
        return sp

    t_scr[...] = jnp.full((rows, PACKET_LANES), INF, jnp.float32)
    idx_scr[...] = jnp.full((rows, PACKET_LANES), -1, jnp.int32)
    # bootstrap: test the root (node 0) itself once, then run the paired
    # children walk. Near-first ordered DFS with a *scalar* stack in SMEM;
    # the while carry is the stack pointer only (Mosaic mishandles large
    # vector carries in while_loop) — vector state lives in VMEM scratch.
    root_hit = slab(0)
    root_entered = jnp.any(root_hit)
    root_count = meta_ref[1, 0]
    visit(0, root_hit, root_entered, root_count, meta_ref[0, 0])
    stack_ref[0] = jnp.int32(0)
    sp0 = jnp.where(root_entered & (root_count == 0), 1, 0).astype(jnp.int32)
    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    t_out[...] = t_scr[...]
    idx_out[...] = idx_scr[...]


def _kernel_multi(meta_ref, aabb_ref, tverts_ref, rays_ref, *refs,
                  n_nodes: int, any_hits: tuple, rows: int, batch_k: int):
    """Fused multi-class traversal: M ray classes sharing per-lane ORIGINS
    walk the tree together in one batched-K DFS.

    The integrator's per-bounce work is three walks from the same hit
    points — the sampled bounce ray (closest-hit) plus the envmap and
    point-light shadow rays (any-hit), cf. the reference's three hitBVH
    calls per bounce (path_tracing.frag:948-968, 1056-1128). Fusing them
    pays the fixed per-packet cost, the ray-operand DMA and (critically)
    the serialized vector->scalar any() readback once per visited node for
    the UNION of the classes instead of once per class — the unions overlap
    heavily because the origins are identical. Per-class decisions
    (slab limits, leaf tests, any-hit early-out) are kept exactly
    equivalent to _kernel_batched, so each class's (t, idx) equals a
    separate-walk result bit-for-bit.

    Ray operand: ONE VMEM block (rows, (3 + 4*M)*128): origin xyz in lanes
    [0, 3*128), then per class c its (dx, dy, dz, tmax) in lanes
    [(3+4c)*128, (7+4c)*128).
    refs: M t_out, M idx_out, then scratch (M t_scr, M idx_scr, stack).
    """
    m = len(any_hits)
    t_out = refs[0:m]
    idx_out = refs[m:2 * m]
    t_scr = refs[2 * m:3 * m]
    idx_scr = refs[3 * m:4 * m]
    stack_ref = refs[4 * m]

    ox = rays_ref[:, 0:128]
    oy = rays_ref[:, 128:256]
    oz = rays_ref[:, 256:384]

    def safe_inv(v):
        tiny = jnp.where(v < 0, np.float32(-1e-20), np.float32(1e-20))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

    dx, dy, dz, tmax, dead, inv_dx, inv_dy, inv_dz = \
        [], [], [], [], [], [], [], []
    for c in range(m):
        b = (3 + 4 * c) * 128
        dx.append(rays_ref[:, b:b + 128])
        dy.append(rays_ref[:, b + 128:b + 256])
        dz.append(rays_ref[:, b + 256:b + 384])
        tm_in = rays_ref[:, b + 384:b + 512]
        dead.append(tm_in <= 0.0)
        tmax.append(jnp.where(tm_in <= 0.0, -INF, tm_in))
        inv_dx.append(safe_inv(dx[c]))
        inv_dy.append(safe_inv(dy[c]))
        inv_dz.append(safe_inv(dz[c]))

    # near-first ordering from class 0's dominant direction (the closest-hit
    # bounce class when present; shadow classes are order-insensitive)
    sx, sy, sz = jnp.sum(dx[0]), jnp.sum(dy[0]), jnp.sum(dz[0])

    def slab(node, limits):
        """Per-class hit masks; the (bound - origin) diffs are shared."""
        dminx = aabb_ref[0, node] - ox
        dminy = aabb_ref[1, node] - oy
        dminz = aabb_ref[2, node] - oz
        dmaxx = aabb_ref[3, node] - ox
        dmaxy = aabb_ref[4, node] - oy
        dmaxz = aabb_ref[5, node] - oz
        hits = []
        for c in range(m):
            f0 = dmaxx * inv_dx[c]
            n0 = dminx * inv_dx[c]
            f1 = dmaxy * inv_dy[c]
            n1 = dminy * inv_dy[c]
            f2 = dmaxz * inv_dz[c]
            n2 = dminz * inv_dz[c]
            t1 = jnp.minimum(jnp.maximum(f0, n0),
                             jnp.minimum(jnp.maximum(f1, n1),
                                         jnp.maximum(f2, n2)))
            t0 = jnp.maximum(jnp.minimum(f0, n0),
                             jnp.maximum(jnp.minimum(f1, n1),
                                         jnp.minimum(f2, n2)))
            hits.append((t1 >= jnp.maximum(t0, 0.0)) & (t0 < limits[c])
                        & (t1 > 0.0))
        return hits

    def visit(hits, entered, count, first):
        @pl.when(entered & (count > 0))
        def _():
            ts = [t_scr[c][...] for c in range(m)]
            idxs = [idx_scr[c][...] for c in range(m)]
            t_lims = []
            for c in range(m):
                tl = jnp.where(hits[c], jnp.minimum(ts[c], tmax[c]), -INF)
                if any_hits[c]:
                    tl = jnp.where(idxs[c] < 0, tl, -INF)
                t_lims.append(tl)
            for j in range(MAX_LEAF):
                ti = first + jnp.minimum(jnp.int32(j), count - 1)
                nx = tverts_ref[0, ti]
                ny = tverts_ref[1, ti]
                nz = tverts_ref[2, ti]
                np0 = tverts_ref[3, ti]
                ndoto = nx * ox + ny * oy + nz * oz  # shared origin
                for c in range(m):
                    ndotd = nx * dx[c] + ny * dy[c] + nz * dz[c]
                    invalid = jnp.abs(ndotd) < PARALLEL_EPS
                    denom = jnp.where(invalid, np.float32(1.0), ndotd)
                    t_hit = (np0 - ndoto) / denom
                    px = ox + dx[c] * t_hit
                    py = oy + dy[c] * t_hit
                    pz = oz + dz[c] * t_hit
                    u = (tverts_ref[4, ti] * px + tverts_ref[5, ti] * py
                         + tverts_ref[6, ti] * pz + tverts_ref[7, ti])
                    v = (tverts_ref[8, ti] * px + tverts_ref[9, ti] * py
                         + tverts_ref[10, ti] * pz + tverts_ref[11, ti])
                    in_tri = (u > 0) & (v > 0) & (u + v < 1)
                    ok = (jnp.logical_not(invalid) & (t_hit >= T_MIN)
                          & in_tri & (j < count) & (t_hit < t_lims[c]))
                    ts[c] = jnp.where(ok, t_hit, ts[c])
                    idxs[c] = jnp.where(ok, ti, idxs[c])
                    t_lims[c] = jnp.minimum(t_lims[c], ts[c])
            for c in range(m):
                t_scr[c][...] = ts[c]
                idx_scr[c][...] = idxs[c]

    def class_limits():
        limits = []
        for c in range(m):
            lim = jnp.minimum(t_scr[c][...], tmax[c])
            if any_hits[c]:
                lim = jnp.where(idx_scr[c][...] < 0, lim, -INF)
            limits.append(lim)
        return limits

    def all_done():
        """True when every lane of every any-hit class has resolved — only
        meaningful when ALL classes are any-hit (a closest-hit class never
        resolves early)."""
        done = None
        for c in range(m):
            dc = (idx_scr[c][...] >= 0) | dead[c]
            done = dc if done is None else (done & dc)
        return jnp.all(done)

    exit_early = all(any_hits)

    def body(sp):
        k = jnp.minimum(jnp.minimum(sp, batch_k),
                        jnp.maximum(batch_k * MAX_STACK - sp, 1))
        limits = class_limits()
        infos = []
        for i in range(batch_k):
            node = stack_ref[jnp.maximum(sp - 1 - i, 0)]
            left = node + 1
            right = meta_ref[2, node]
            hits_l = slab(left, limits)
            hits_r = slab(right, limits)
            or_l = hits_l[0]
            or_r = hits_r[0]
            for c in range(1, m):
                or_l = or_l | hits_l[c]
                or_r = or_r | hits_r[c]
            infos.append((node, left, right, hits_l, hits_r,
                          jnp.any(or_l), jnp.any(or_r)))
        sp_new = sp - k
        for i in range(batch_k):
            node, left, right, hits_l, hits_r, ent_l, ent_r = infos[i]
            valid_i = i < k
            ent_l = ent_l & valid_i
            ent_r = ent_r & valid_i
            count_l = meta_ref[1, left]
            count_r = meta_ref[1, right]
            visit(hits_l, ent_l, count_l, meta_ref[0, left])
            visit(hits_r, ent_r, count_r, meta_ref[0, right])
            axis = meta_ref[3, node]
            left_low = meta_ref[4, node]
            dpos = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz)) > 0
            near_is_left = dpos == (left_low == 1)
            push_l = ent_l & (count_l == 0)
            push_r = ent_r & (count_r == 0)
            far_node = jnp.where(near_is_left, right, left)
            near_node = jnp.where(near_is_left, left, right)
            push_far = jnp.where(near_is_left, push_r, push_l)
            push_near = jnp.where(near_is_left, push_l, push_r)

            @pl.when(push_far)
            def _():
                stack_ref[sp_new] = far_node

            sp_new = sp_new + push_far.astype(jnp.int32)

            @pl.when(push_near)
            def _():
                stack_ref[sp_new] = near_node

            sp_new = sp_new + push_near.astype(jnp.int32)
        if exit_early:
            sp_new = jnp.where(all_done(), 0, sp_new)
        return sp_new

    for c in range(m):
        t_scr[c][...] = jnp.full((rows, PACKET_LANES), INF, jnp.float32)
        idx_scr[c][...] = jnp.full((rows, PACKET_LANES), -1, jnp.int32)
    root_hits = slab(0, class_limits())
    root_or = root_hits[0]
    for c in range(1, m):
        root_or = root_or | root_hits[c]
    root_entered = jnp.any(root_or)
    root_count = meta_ref[1, 0]
    visit(root_hits, root_entered, root_count, meta_ref[0, 0])
    stack_ref[0] = jnp.int32(0)
    sp0 = jnp.where(root_entered & (root_count == 0), 1, 0).astype(jnp.int32)
    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    for c in range(m):
        t_out[c][...] = t_scr[c][...]
        idx_out[c][...] = idx_scr[c][...]


def scene_fits_smem(n_nodes: int, n_tris: int) -> bool:
    """Whether the packed scalar tables (meta 5 rows + aabb 6 rows + 12
    triangle-constant rows) fit the kernel's SMEM budget. Callers that get
    False should use the XLA wavefront (integrator.intersect.trace)."""
    smem_bytes = (11 * int(n_nodes) + 12 * int(n_tris)) * 4 + 23 * 512
    return smem_bytes < 900_000


@partial(jax.jit, static_argnames=("any_hit", "common_origin", "rows",
                                   "batch_k"))
def _trace_packets_impl(meta: Array, aabb: Array, tverts: Array,
                        orig: Array, d: Array, t_max: Array,
                        any_hit: bool = False,
                        common_origin: bool = False,
                        rows: int = PACKET_ROWS,
                        batch_k: int = 0) -> tuple[Array, Array]:
    """Packet traversal over N rays (padded to a multiple of PACKET).

    meta: (5, n_nodes) int32 [first_tri; tri_count; right_child; axis; left_low]
    aabb: (6, n_nodes) f32  [amin; amax]
    tverts: (12, T) f32     [n; n.p0; T1; t1w; T2; t2w] (precomputed constants)
    (transposed row-major: SMEM pads each *row* to 512 B, so the scalar
    tables must keep few rows / long rows to fit the 1 MiB SMEM budget)
    orig, d: (N, 3) f32; t_max: (N,) f32.
    Returns (t (N,), idx (N,)), idx = -1 for miss.
    """
    n = orig.shape[0]
    n_nodes = meta.shape[1]
    packet = rows * PACKET_LANES
    smem_bytes = (meta.size + aabb.size + tverts.size) * 4 + 18 * 512
    assert smem_bytes < 900_000, (
        f"scene scalar tables ({smem_bytes}B) exceed the SMEM budget; "
        "callers should check scene_fits_smem() and use the XLA wavefront")
    n_pad = (n + packet - 1) // packet * packet
    pad = n_pad - n

    def prep(x, fill):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=fill)
        return x

    orig = prep(orig, 0.0)
    dd = prep(d, 1.0)
    tm = prep(t_max, -1.0)  # padded rays: t_max < 0 -> never hit

    n_packets = n_pad // packet
    shape2 = (n_packets * rows, PACKET_LANES)
    comps = [orig[:, 0], orig[:, 1], orig[:, 2], dd[:, 0], dd[:, 1], dd[:, 2], tm]
    comps = [c.reshape(shape2) for c in comps]
    # ONE packed ray operand (see kernel prologue): (R, 7*128), component c
    # in lanes [c*128, (c+1)*128)
    rays = jnp.stack(comps, axis=1).reshape(shape2[0], 7 * PACKET_LANES)

    ray_spec = pl.BlockSpec((rows, 7 * PACKET_LANES),
                            lambda i: (i, 0), memory_space=pltpu.VMEM)
    # Scene tables ride REGULAR whole-array SMEM in_specs, NOT scalar
    # prefetch: scalar-prefetch operands silently truncate beyond ~1024
    # entries per row on this toolchain (observed on v5e: every triangle
    # with index >~1024 unreachable, hit rate 0.016 vs 0.136 for the XLA
    # oracle; regular SMEM inputs of the same data match the oracle
    # exactly). The SMEM rows must be 128-multiples for the lowering.
    def pad128(x):
        w = x.shape[1]
        wp = (w + 127) // 128 * 128
        return jnp.pad(x, ((0, 0), (0, wp - w)))

    meta_p, aabb_p, tverts_p = pad128(meta), pad128(aabb), pad128(tverts)
    tab_specs = [
        pl.BlockSpec(meta_p.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(aabb_p.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tverts_p.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]

    if batch_k > 0:
        kernel = functools.partial(_kernel_batched, n_nodes=n_nodes,
                                   any_hit=any_hit,
                                   common_origin=common_origin, rows=rows,
                                   batch_k=batch_k)
    else:
        kernel = functools.partial(_kernel, n_nodes=n_nodes, any_hit=any_hit,
                                   common_origin=common_origin, rows=rows)
    t, idx = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=tab_specs + [ray_spec],
        out_specs=[
            pl.BlockSpec((rows, PACKET_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, PACKET_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, PACKET_LANES), jnp.float32),
            pltpu.VMEM((rows, PACKET_LANES), jnp.int32),
            # batched-K expansion needs ~K x the strict-DFS stack bound
            # (see batched_stack_size)
            pltpu.SMEM((batched_stack_size(batch_k) if batch_k > 0
                        else MAX_STACK,), jnp.int32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.int32),
        ],
    )(meta_p, aabb_p, tverts_p, rays)

    return t.reshape(n_pad)[:n], idx.reshape(n_pad)[:n]


@partial(jax.jit, static_argnames=("any_hits", "rows", "batch_k"))
def _trace_multi_impl(meta: Array, aabb: Array, tverts: Array,
                      orig: Array, dirs: tuple, t_maxs: tuple,
                      any_hits: tuple, rows: int = PACKET_ROWS,
                      batch_k: int = 8) -> tuple:
    """Fused multi-class traversal (see _kernel_multi): M direction/t_max
    sets from SHARED per-lane origins. Returns ((t, idx), ...) per class,
    each equal to the corresponding single-class trace."""
    m = len(any_hits)
    assert len(dirs) == len(t_maxs) == m and m >= 1
    n = orig.shape[0]
    n_nodes = meta.shape[1]
    packet = rows * PACKET_LANES
    n_pad = (n + packet - 1) // packet * packet
    pad = n_pad - n

    def prep(x, fill):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    orig = prep(orig, 0.0)
    dirs = [prep(d, 1.0) for d in dirs]
    tms = [prep(t, -1.0) for t in t_maxs]

    n_packets = n_pad // packet
    shape2 = (n_packets * rows, PACKET_LANES)
    comps = [orig[:, 0], orig[:, 1], orig[:, 2]]
    for d, tm in zip(dirs, tms):
        comps += [d[:, 0], d[:, 1], d[:, 2], tm]
    comps = [c.reshape(shape2) for c in comps]
    width = (3 + 4 * m) * PACKET_LANES
    rays = jnp.stack(comps, axis=1).reshape(shape2[0], width)

    ray_spec = pl.BlockSpec((rows, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, PACKET_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def pad128(x):
        w = x.shape[1]
        wp = (w + 127) // 128 * 128
        return jnp.pad(x, ((0, 0), (0, wp - w)))

    meta_p, aabb_p, tverts_p = pad128(meta), pad128(aabb), pad128(tverts)
    tab_specs = [
        pl.BlockSpec(meta_p.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(aabb_p.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tverts_p.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(_kernel_multi, n_nodes=n_nodes,
                               any_hits=tuple(any_hits), rows=rows,
                               batch_k=batch_k)
    outs = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=tab_specs + [ray_spec],
        out_specs=[out_spec] * (2 * m),
        scratch_shapes=(
            [pltpu.VMEM((rows, PACKET_LANES), jnp.float32)] * m
            + [pltpu.VMEM((rows, PACKET_LANES), jnp.int32)] * m
            + [pltpu.SMEM((batched_stack_size(batch_k),), jnp.int32)]),
        out_shape=(
            [jax.ShapeDtypeStruct(shape2, jnp.float32)] * m
            + [jax.ShapeDtypeStruct(shape2, jnp.int32)] * m),
    )(meta_p, aabb_p, tverts_p, rays)

    return tuple((outs[c].reshape(n_pad)[:n],
                  outs[m + c].reshape(n_pad)[:n]) for c in range(m))


@partial(jax.custom_jvp, nondiff_argnums=(6, 7, 8))
def _trace_multi_cj(meta, aabb, tverts, orig, dirs, t_maxs,
                    any_hits, rows, batch_k):
    return _trace_multi_impl(meta, aabb, tverts, orig, tuple(dirs),
                             tuple(t_maxs), any_hits, rows=rows,
                             batch_k=batch_k)


@_trace_multi_cj.defjvp
def _trace_multi_jvp(any_hits, rows, batch_k, primals, tangents):
    """Zero tangents: topology-only output (see _trace_packets_jvp)."""
    del tangents
    outs = _trace_multi_cj(*primals, any_hits, rows, batch_k)
    return outs, tuple((jnp.zeros_like(t),
                        np.zeros(idx.shape, jax.dtypes.float0))
                       for t, idx in outs)


def trace_multi(meta: Array, aabb: Array, tverts: Array, orig: Array,
                dirs: list, t_maxs: list, any_hits: tuple,
                rows: int = PACKET_ROWS, batch_k: int = 8) -> tuple:
    """Public fused multi-class trace over pre-packed single-tree tables."""
    return _trace_multi_cj(meta, aabb, tverts, orig, tuple(dirs),
                           tuple(t_maxs), tuple(bool(a) for a in any_hits),
                           int(rows), int(batch_k))


@partial(jax.custom_jvp, nondiff_argnums=(6, 7, 8, 9))
def _trace_packets_cj(meta, aabb, tverts, orig, d, t_max,
                      any_hit, common_origin, rows, batch_k):
    return _trace_packets_impl(meta, aabb, tverts, orig, d, t_max,
                               any_hit=any_hit, common_origin=common_origin,
                               rows=rows, batch_k=batch_k)


@_trace_packets_cj.defjvp
def _trace_packets_jvp(any_hit, common_origin, rows, batch_k, primals,
                       tangents):
    """Traversal is topology-only by design (module docstring): the
    integrator re-derives everything differentiable from (t, idx) via
    resolve_hit and stop-gradients t. pallas_call has no JVP rule, so an
    outer jax.grad (e.g. the BASELINE gradient check differentiating a whole
    rendered frame) would fail without this: declare zero tangents here and
    let gradients flow through the shading re-derivation instead."""
    del tangents
    t, idx = _trace_packets_cj(*primals, any_hit, common_origin, rows,
                               batch_k)
    return (t, idx), (jnp.zeros_like(t),
                      np.zeros(idx.shape, jax.dtypes.float0))


def trace_packets(meta: Array, aabb: Array, tverts: Array,
                  orig: Array, d: Array, t_max: Array,
                  any_hit: bool = False,
                  common_origin: bool = False,
                  rows: int = PACKET_ROWS,
                  batch_k: int = 0) -> tuple[Array, Array]:
    """See _trace_packets_impl; this wrapper adds the zero-tangent JVP."""
    return _trace_packets_cj(meta, aabb, tverts, orig, d, t_max,
                             bool(any_hit), bool(common_origin), int(rows),
                             int(batch_k))


# ---------------------------------------------------------------------------
# Scene-level wrapper (packing is traced — under jit it costs nothing per
# call; eager hot-path callers that need a host-side cache use the chunked
# twin's pattern, trace_chunked._pack_forest_cached)
# ---------------------------------------------------------------------------

def pack_scene(bvh: BVHSoA, tri: TriangleSoA) -> tuple[Array, Array, Array]:
    """Pack SoA scene into the kernel's SMEM operand layout.

    Triangles are packed as 12 precomputed intersection constants
    (integrator.intersect.triangle_constants): n, n.p0, T1, t1w, T2, t2w.

    meta rows (int32): [first_tri; tri_count; right_child; split_axis;
    left_is_low]. right_child of inner node i = skip[i+1] (the node after
    the left subtree in the DFS-preorder layout); split_axis/left_is_low
    drive near-first child ordering from the packet's dominant direction."""
    from tpuray.integrator.intersect import triangle_constants
    skip, count = bvh.skip, bvh.tri_count
    n_nodes = skip.shape[0]
    left = jnp.arange(n_nodes, dtype=jnp.int32) + 1
    clip_l = jnp.minimum(left, n_nodes - 1)
    right = jnp.where(count == 0, skip[clip_l], 0).astype(jnp.int32)
    center = 0.5 * (bvh.aabb_min + bvh.aabb_max)
    lc = center[clip_l]
    rc = center[jnp.minimum(right, n_nodes - 1)]
    axis = jnp.argmax(jnp.abs(rc - lc), axis=-1).astype(jnp.int32)
    left_low = (jnp.take_along_axis(lc, axis[:, None], 1)
                <= jnp.take_along_axis(rc, axis[:, None], 1))[:, 0].astype(jnp.int32)
    if not isinstance(skip, jax.core.Tracer):
        # stack bound: DFS max live stack (only checkable on concrete trees;
        # recomputed in pure numpy — `right` above is a tracer under jit
        # even when the tree itself is a closure constant)
        skip_np, cnt_np = np.asarray(skip), np.asarray(count)
        assert cnt_np.max() <= MAX_LEAF, (
            f"leaf count {cnt_np.max()} > MAX_LEAF={MAX_LEAF}")
        empty_leaf = (cnt_np == 0) & (skip_np == np.arange(n_nodes) + 1)
        assert not empty_leaf.any(), (
            "tree contains empty-leaf nodes (count=0, skip=i+1) — a forest "
            "or padded layout; the single-tree packet kernel requires a "
            "strict binary preorder tree (use trace_chunked)")
        lidx = np.minimum(np.arange(n_nodes) + 1, n_nodes - 1)
        right_np = np.where(cnt_np == 0, skip_np[lidx], 0)
        stack, max_sp = [0], 1
        while stack:
            nd = stack.pop()
            if cnt_np[nd] == 0:
                stack += [int(right_np[nd]), nd + 1]
                max_sp = max(max_sp, len(stack))
        assert max_sp < MAX_STACK, f"BVH needs stack {max_sp} >= {MAX_STACK}"
    meta = jnp.stack([bvh.first_tri, count, right, axis, left_low], axis=0)
    aabb = jnp.concatenate([bvh.aabb_min.T, bvh.aabb_max.T], axis=0)
    tc = triangle_constants(tri)
    tverts = jnp.concatenate([
        tc["n"].T, tc["np0"][None], tc["t1"].T, tc["t1w"][None],
        tc["t2"].T, tc["t2w"][None]], axis=0)
    return meta.astype(jnp.int32), aabb.astype(jnp.float32), tverts.astype(jnp.float32)


def trace_pallas(bvh: BVHSoA, tri: TriangleSoA, orig: Array, d: Array,
                 t_max: Array | float = INF, any_hit: bool = False,
                 common_origin: bool = False,
                 rows: int = PACKET_ROWS,
                 batch_k: int = 0) -> tuple[Array, Array]:
    """Drop-in replacement for tpuray.integrator.intersect.trace.

    common_origin: caller asserts every ray shares one origin (camera
    primaries) — hoists the origin onto the scalar core; bit-identical
    results, fewer VPU ops per node/triangle."""
    assert not bvh.chunk_nodes, (
        "chunked forest handed to the single-tree packet kernel — its "
        "binary-pair walk (right = skip[left]) scrambles past the first "
        "chunk boundary; use kernels.trace_chunked.trace_chunked")
    meta, aabb, tverts = pack_scene(bvh, tri)
    n = orig.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    return trace_packets(meta, aabb, tverts, orig, d, t_max, any_hit,
                         common_origin=common_origin, rows=rows,
                         batch_k=batch_k)

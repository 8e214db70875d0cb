"""Chunk-streaming Pallas packet traversal for beyond-SMEM scenes.

The single-tree packet kernel (trace_pallas.py) keeps the whole scene's
node/triangle constants in SMEM — a hard ~15-20k-triangle ceiling. This
kernel removes it: the scene is a uniform forest of SMEM-sized chunks
(scene/partition.py, BVHSoA.chunk_nodes/chunk_tris) whose tables live in
HBM; one pallas_call per chunk loads that chunk's tables into SMEM once
and sweeps ONLY the ray packets that can enter it — a dynamic grid sized
to the chunk's live-packet count, fed by conservative per-(packet, chunk)
interval flags, with per-lane (t, idx) threaded between calls at the XLA
level so later chunks are culled against the best hit so far. A
(packet, chunk) pair the bound proves dead costs nothing (at the flagship
131k pose ~86% of pairs are dead). (A single-call (packet, chunk) grid
with SMEM-blocked chunk inputs was measured 100x slower: tables
re-streamed into SMEM per packet at SMEM's low DMA fill bandwidth.)

The walk inside a chunk is the same scalar-stack packet DFS as
trace_pallas._kernel, with identical per-triangle op order (bit-parity with
integrator.intersect.ray_triangle_pre). Reference behavior being replaced:
the per-fragment whole-scene stack walk of path_tracing.frag:372-424, which
assumes the entire scene fits one GL texture buffer.
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuray.integrator.intersect import triangle_constants
from tpuray.kernels.trace_pallas import (
    INF, MAX_LEAF, MAX_STACK, PACKET, PACKET_LANES, PACKET_ROWS, PARALLEL_EPS,
    T_MIN, batched_stack_size)
from tpuray.scene.types import BVHSoA, TriangleSoA

Array = jax.Array

# batched-K DFS expansion (trace_pallas._kernel_batched rationale): pop up
# to K stack nodes per iteration and issue all 2K child slab tests + any()
# reductions before any scalar consumption, overlapping the vector->scalar
# readback stalls that are ~half the per-visit cost. Unlike the single-tree
# case (strict DFS for coherent camera packets — frontier < K), per-chunk
# walks of a dense forest keep large frontiers even for coherent packets,
# so K applies to every ray class here.
BATCH_K_CHUNKED = 8


def chunk_fits_smem(chunk_nodes: int, chunk_tris: int) -> bool:
    """Whether one chunk's tables fit the SMEM budget. False -> callers use
    the XLA wavefront.

    No double-buffer factor: the table BlockSpecs' index maps are CONSTANT
    across the packet grid (the chunk loop lives at the XLA level, one
    pallas_call per chunk), so the pipeline keeps a single SMEM copy — the
    same whole-array SMEM regime the single-tree kernel runs at ~530 KB.
    (Round 4 reserved 2x "for pipeline double-buffering", which halved the
    usable chunk size and doubled the chunk count for nothing — r4 verdict.)"""
    per_chunk = (11 * int(chunk_nodes) + 12 * int(chunk_tris)) * 4
    return per_chunk + 23 * 512 < 900_000


def _kernel(hdr_ref, ids_ref, meta_ref, aabb_ref, tverts_ref,
            rays_ref, t_in_ref, idx_in_ref, t_out, idx_out, stack_ref,
            *, any_hit: bool, common_origin: bool, batch_k: int,
            chunk_tris: int):
    # One chunk per pallas_call: its tables land in SMEM once (blocked SMEM
    # inputs whose index map selects the chunk column — constant across the
    # grid, so the pipeline fetches them once) and the chunk's LIVE packets
    # stream through VMEM against them. (A packet-outer/chunk-inner
    # single-call variant was measured 100x slower — SMEM DMA fill
    # bandwidth made per-packet table re-streaming the bottleneck — so the
    # chunk loop lives at the XLA level with (t, idx) threaded between
    # calls.)
    # Round-5 live-pair grid: the conservative per-(packet, chunk) entry
    # flags (round 4) now shrink the grid itself instead of cheapening dead
    # steps — the grid is sized to this chunk's live-packet count (dynamic
    # grid) and ids_ref holds the compacted live packet ids, which the
    # ray/t/idx BlockSpec index maps read, so a packet the interval bound
    # proves can't enter the chunk costs NOTHING. t/idx are input_output-
    # aliased: blocks of packets not in the live list are never DMA'd and
    # their HBM contents persist. hdr = [chunk_id, n_live]; when n_live==0
    # the grid is clamped to one guarded carry-copy step.
    # Also: batched-K expansion (see BATCH_K_CHUNKED) + the 7 ray
    # components packed into ONE VMEM block (rows, 7*128) — one DMA
    # descriptor per grid step instead of seven, as in trace_pallas.
    tri_base = hdr_ref[0] * chunk_tris
    t_out[...] = t_in_ref[...]
    idx_out[...] = idx_in_ref[...]
    t_scr = t_out
    idx_scr = idx_out

    @pl.when(pl.program_id(0) < hdr_ref[1])
    def _walk():

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

        sx = jnp.sum(dx)
        sy = jnp.sum(dy)
        sz = jnp.sum(dz)

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
            """Leaf scan; `first` is chunk-local, recorded idx is global."""

            @pl.when(entered & (count > 0))
            def _():
                t = t_scr[...]
                idx = idx_scr[...]
                t_lim = jnp.where(hit, jnp.minimum(t, tmax), -INF)
                if any_hit:
                    t_lim = jnp.where(idx < 0, t_lim, -INF)
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
                    idx = jnp.where(ok, tri_base + ti, idx)
                    t_lim = jnp.minimum(t_lim, t)
                t_scr[...] = t
                idx_scr[...] = idx

        def body(sp):
            # soft clamp, see trace_pallas.batched_stack_size
            k = jnp.minimum(jnp.minimum(sp, batch_k),
                            jnp.maximum(batch_k * MAX_STACK - sp, 1))
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
            for i in range(batch_k):
                node, left, right, hit_l, hit_r, ent_l, ent_r = infos[i]
                valid_i = i < k
                ent_l = ent_l & valid_i
                ent_r = ent_r & valid_i
                count_l = meta_ref[1, left]
                count_r = meta_ref[1, right]
                visit(hit_l, ent_l, count_l, meta_ref[0, left])
                visit(hit_r, ent_r, count_r, meta_ref[0, right])
                axis = meta_ref[3, node]
                left_low = meta_ref[4, node]
                dpos = jnp.where(axis == 0, sx,
                                 jnp.where(axis == 1, sy, sz)) > 0
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
                sp_new = jnp.where(jnp.all((idx_scr[...] >= 0) | dead),
                                   0, sp_new)
            return sp_new

        # chunk root = local node 0 (uniform layout)
        root_limit = jnp.minimum(t_scr[...], tmax)
        if any_hit:
            root_limit = jnp.where(idx_scr[...] < 0, root_limit, -INF)
        root_hit = slab(0, root_limit)
        root_entered = jnp.any(root_hit)
        root_count = meta_ref[1, 0]
        visit(root_hit, root_entered, root_count, meta_ref[0, 0])
        stack_ref[0] = jnp.int32(0)
        sp0 = jnp.where(root_entered & (root_count == 0), 1, 0).astype(jnp.int32)
        jax.lax.while_loop(lambda sp: sp > 0, body, sp0)


def pack_forest(bvh: BVHSoA, tri: TriangleSoA) -> tuple[Array, Array, Array]:
    """Pack a uniform forest into chunk-blocked SMEM operand layout.

    Same row structure as trace_pallas.pack_scene, but all indices are
    CHUNK-LOCAL: meta rows [first_tri_local; tri_count; right_local; axis;
    left_low], chunk c in columns [c*CN, (c+1)*CN) / [c*CT, (c+1)*CT).
    CN and CT must be multiples of 128 (blocked-SMEM lowering requirement;
    build_forest_bvh_uniform guarantees it).
    """
    cn, ct = bvh.chunk_nodes, bvh.chunk_tris
    assert cn and cn % 128 == 0 and ct % 128 == 0, (cn, ct)
    n_nodes = bvh.count
    node_chunk_base = (jnp.arange(n_nodes, dtype=jnp.int32) // cn) * cn
    tri_chunk_base = (jnp.arange(n_nodes, dtype=jnp.int32) // cn) * ct
    skip, count = bvh.skip, bvh.tri_count
    left = jnp.arange(n_nodes, dtype=jnp.int32) + 1
    clip_l = jnp.minimum(left, n_nodes - 1)
    right = jnp.where(count == 0, skip[clip_l], 0).astype(jnp.int32)
    center = 0.5 * (bvh.aabb_min + bvh.aabb_max)
    lc = center[clip_l]
    rc = center[jnp.minimum(right, n_nodes - 1)]
    axis = jnp.argmax(jnp.abs(rc - lc), axis=-1).astype(jnp.int32)
    left_low = (jnp.take_along_axis(lc, axis[:, None], 1)
                <= jnp.take_along_axis(rc, axis[:, None], 1))[:, 0].astype(jnp.int32)

    first_local = bvh.first_tri - tri_chunk_base
    right_local = jnp.maximum(right - node_chunk_base, 0)

    if not isinstance(skip, jax.core.Tracer):
        skip_np = np.asarray(skip)
        cnt_np = np.asarray(count)
        assert cnt_np.max() <= MAX_LEAF
        n_chunks = n_nodes // cn
        lidx = np.minimum(np.arange(n_nodes) + 1, n_nodes - 1)
        right_np = np.where(cnt_np == 0, skip_np[lidx], 0)
        for c in range(n_chunks):
            stack, max_sp = [c * cn], 1
            while stack:
                nd = stack.pop()
                if nd >= (c + 1) * cn:   # padding region: never walked
                    continue
                if cnt_np[nd] == 0:
                    stack += [int(right_np[nd]), nd + 1]
                    max_sp = max(max_sp, len(stack))
            assert max_sp < MAX_STACK, f"chunk {c} stack {max_sp}"

    meta = jnp.stack([first_local, count, right_local, axis, left_low], axis=0)
    aabb = jnp.concatenate([bvh.aabb_min.T, bvh.aabb_max.T], axis=0)
    tc = triangle_constants(tri)
    tverts = jnp.concatenate([
        tc["n"].T, tc["np0"][None], tc["t1"].T, tc["t1w"][None],
        tc["t2"].T, tc["t2w"][None]], axis=0)
    return (meta.astype(jnp.int32), aabb.astype(jnp.float32),
            tverts.astype(jnp.float32))


def _packet_chunk_flags(comps: list[Array], roots_min: Array,
                        roots_max: Array, n_packets: int) -> Array:
    """Conservative per-(packet, chunk) entry flags by interval arithmetic.

    Bounds every ray in a packet by per-axis [origin, inv_direction]
    intervals and slab-tests the interval bundle against each chunk's root
    AABB. Overestimates entry (mixed-sign direction components widen the
    interval to everything) but never misses a real entry, so skipping
    flag==0 chunks is exact. Cost: O(n_packets * n_chunks) — negligible
    next to one kernel grid step.
    """
    ox, oy, oz, dx, dy, dz, tm = (c.reshape(n_packets, -1) for c in comps)

    def safe_inv(v):
        tiny = jnp.where(v < 0, np.float32(-1e-20), np.float32(1e-20))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

    def interval(x):
        return x.min(axis=1)[:, None], x.max(axis=1)[:, None]  # (P, 1)

    def iprod(alo, ahi, blo, bhi):
        p1, p2, p3, p4 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    t1_hi = jnp.full((ox.shape[0], roots_min.shape[1]), INF)
    t0_lo = jnp.full_like(t1_hi, -INF)
    for o_c, d_c, ax in ((ox, dx, 0), (oy, dy, 1), (oz, dz, 2)):
        olo, ohi = interval(o_c)
        ilo, ihi = interval(safe_inv(d_c))
        amin = roots_min[ax][None, :]  # (1, C)
        amax = roots_max[ax][None, :]
        nlo, nhi = iprod(amin - ohi, amin - olo, ilo, ihi)
        flo, fhi = iprod(amax - ohi, amax - olo, ilo, ihi)
        t1_hi = jnp.minimum(t1_hi, jnp.maximum(fhi, nhi))
        t0_lo = jnp.maximum(t0_lo, jnp.minimum(flo, nlo))
    tmax_hi = tm.max(axis=1)[:, None]
    return ((t1_hi >= jnp.maximum(t0_lo, 0.0)) & (t1_hi > 0.0)
            & (t0_lo < tmax_hi) & (tmax_hi > 0.0))


@partial(jax.jit, static_argnames=("chunk_nodes", "chunk_tris", "any_hit",
                                   "common_origin", "rows", "batch_k"))
def _trace_chunked_impl(meta: Array, aabb: Array, tverts: Array,
                        orig: Array, d: Array, t_max: Array,
                        chunk_nodes: int, chunk_tris: int,
                        any_hit: bool = False,
                        common_origin: bool = False,
                        rows: int = PACKET_ROWS,
                        batch_k: int = BATCH_K_CHUNKED) -> tuple[Array, Array]:
    n = orig.shape[0]
    cn, ct = chunk_nodes, chunk_tris
    n_chunks = meta.shape[1] // cn
    packet = rows * PACKET_LANES
    n_pad = (n + packet - 1) // packet * packet
    pad = n_pad - n

    def prep(x, fill):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    orig = prep(orig, 0.0)
    dd = prep(d, 1.0)
    tm = prep(t_max, -1.0)

    n_packets = n_pad // packet
    shape2 = (n_packets * rows, PACKET_LANES)
    comps = [orig[:, 0], orig[:, 1], orig[:, 2], dd[:, 0], dd[:, 1], dd[:, 2],
             tm]
    comps = [c.reshape(shape2) for c in comps]
    # ONE packed ray operand (kernel prologue note): component c in lanes
    # [c*128, (c+1)*128)
    rays = jnp.stack(comps, axis=1).reshape(shape2[0], 7 * PACKET_LANES)
    t = jnp.full(shape2, INF, jnp.float32)
    idx = jnp.full(shape2, -1, jnp.int32)

    # --- live-pair compaction + ordering (round-5): conservative
    # per-(packet, chunk) entry flags against each chunk's root AABB;
    # per chunk, the live packet ids are compacted into a prefetch list and
    # the grid is sized to the live count (dynamic grid), so a dead pair
    # costs nothing at all — at the flagship 131k pose only ~14% of pairs
    # are live. Chunks run front-to-back from the mean ray origin so the
    # threaded (t, idx) carry culls far chunks against near hits.
    # NOTE deliberately no jnp.argsort / scatter here: an argsort of even
    # 16 elements lowers to a ~3 ms sort loop on this backend (measured,
    # docs/perf.md) — ranks come from O(C^2)/O(P^2) comparison networks,
    # which the VPU does in microseconds at these sizes.
    roots = aabb.reshape(6, n_chunks, cn)[:, :, 0]  # chunk root = local 0
    flags = _packet_chunk_flags(comps, roots[:3], roots[3:], n_packets)
    live_counts = flags.sum(axis=0).astype(jnp.int32)  # (C,)
    centroid = 0.5 * (roots[:3] + roots[3:])  # (3, C)
    mean_o = jnp.stack([c.mean() for c in comps[:3]])
    dist = jnp.sum((centroid - mean_o[:, None]) ** 2, axis=0)
    # near chunks first: rank by pairwise comparisons, then invert
    arc = jnp.arange(n_chunks, dtype=jnp.int32)
    before = ((dist[None, :] < dist[:, None])
              | ((dist[None, :] == dist[:, None])
                 & (arc[None, :] < arc[:, None])))
    rank = before.sum(axis=1).astype(jnp.int32)  # position of chunk i
    perm = jnp.sum(jnp.where(rank[None, :] == arc[:, None], arc[None, :], 0),
                   axis=1)  # perm[k] = chunk at position k
    # compacted live packet ids per chunk: ids_all[c, j] = j-th live packet
    slot = jnp.arange(n_packets, dtype=jnp.int32)
    prank = jnp.cumsum(flags, axis=0) - 1  # (P, C) rank among chunk's live
    eq = ((prank.T[:, :, None] == slot[None, None, :])
          & flags.T[:, :, None])  # (C, P_in, P_slot)
    ids_all = jnp.einsum("cps,p->cs", eq.astype(jnp.float32),
                         slot.astype(jnp.float32)).astype(jnp.int32)

    ray_spec = pl.BlockSpec((rows, PACKET_LANES),
                            lambda g, hdr, ids: (ids[g], 0),
                            memory_space=pltpu.VMEM)
    rays_spec = pl.BlockSpec((rows, 7 * PACKET_LANES),
                             lambda g, hdr, ids: (ids[g], 0),
                             memory_space=pltpu.VMEM)
    smem_chunk = [
        pl.BlockSpec((5, cn), lambda g, hdr, ids: (0, hdr[0]),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((6, cn), lambda g, hdr, ids: (0, hdr[0]),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((12, ct), lambda g, hdr, ids: (0, hdr[0]),
                     memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(_kernel, any_hit=any_hit,
                               common_origin=common_origin, batch_k=batch_k,
                               chunk_tris=ct)

    def run_chunk(ci, t, idx):
        n_live = jnp.take(live_counts, ci)
        hdr = jnp.stack([ci, n_live]).astype(jnp.int32)
        ids_c = jnp.take(ids_all, ci, axis=0)
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(jnp.maximum(n_live, 1),),  # dynamic: live pairs only
                in_specs=smem_chunk + [rays_spec, ray_spec, ray_spec],
                out_specs=[ray_spec, ray_spec],
                scratch_shapes=[pltpu.SMEM((batched_stack_size(batch_k),),
                                           jnp.int32)],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(shape2, jnp.float32),
                jax.ShapeDtypeStruct(shape2, jnp.int32),
            ],
            # blocks outside the live list are never DMA'd; aliasing keeps
            # their HBM contents (the carry) intact
            input_output_aliases={6: 0, 7: 1},
        )
        return call(hdr, ids_c, meta, aabb, tverts, rays, t, idx)

    # fori_loop, not an unrolled python loop: every chunk's call is the
    # SAME kernel (chunk identity arrives via traced hdr/ids/grid), so one
    # pallas_call lowering serves all chunks — an unrolled 64-chunk program
    # took >15 min to compile
    def loop_body(k, carry):
        t, idx = carry
        return run_chunk(jnp.take(perm, k), t, idx)

    t, idx = jax.lax.fori_loop(0, n_chunks, loop_body, (t, idx))

    return t.reshape(n_pad)[:n], idx.reshape(n_pad)[:n]


@partial(jax.custom_jvp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _trace_chunked_cj(meta, aabb, tverts, orig, d, t_max,
                      chunk_nodes, chunk_tris, any_hit, common_origin,
                      rows=PACKET_ROWS, batch_k=BATCH_K_CHUNKED):
    return _trace_chunked_impl(meta, aabb, tverts, orig, d, t_max,
                               chunk_nodes, chunk_tris,
                               any_hit=any_hit, common_origin=common_origin,
                               rows=rows, batch_k=batch_k)


@_trace_chunked_cj.defjvp
def _trace_chunked_jvp(chunk_nodes, chunk_tris, any_hit, common_origin,
                       rows, batch_k, primals, tangents):
    """Zero tangents: topology-only output (see trace_pallas counterpart)."""
    del tangents
    t, idx = _trace_chunked_cj(*primals, chunk_nodes, chunk_tris, any_hit,
                               common_origin, rows, batch_k)
    return (t, idx), (jnp.zeros_like(t),
                      np.zeros(idx.shape, jax.dtypes.float0))


def trace_packed_forest(meta: Array, aabb: Array, tverts: Array,
                        orig: Array, d: Array, t_max: Array,
                        chunk_nodes: int, chunk_tris: int,
                        any_hit: bool = False,
                        common_origin: bool = False,
                        rows: int = PACKET_ROWS,
                        batch_k: int = BATCH_K_CHUNKED) -> tuple[Array, Array]:
    """Trace against pre-packed forest tables (public entry for callers that
    cache pack_forest output themselves, e.g. bench.py)."""
    return _trace_chunked_cj(meta, aabb, tverts, orig, d, t_max,
                             int(chunk_nodes), int(chunk_tris),
                             bool(any_hit), bool(common_origin), int(rows),
                             int(batch_k))


# Host-side pack cache for EAGER callers (inside jit, pack_forest is traced
# once and costs nothing). Keyed on the identity of the concrete input
# arrays; entries hold strong refs to the keys so ids cannot be recycled.
# Bounded FIFO (ADVICE r3).
_PACK_CACHE: dict = {}


def _pack_forest_cached(bvh: BVHSoA, tri: TriangleSoA):
    if isinstance(bvh.skip, jax.core.Tracer):
        return pack_forest(bvh, tri)  # under trace: no host cache
    key = (id(bvh.skip), id(tri.p0), bvh.chunk_nodes, bvh.chunk_tris)
    hit = _PACK_CACHE.get(key)
    if hit is not None:
        return hit[2]
    packed = pack_forest(bvh, tri)
    if len(_PACK_CACHE) >= 4:
        _PACK_CACHE.pop(next(iter(_PACK_CACHE)))
    _PACK_CACHE[key] = (bvh.skip, tri.p0, packed)
    return packed


def trace_chunked(bvh: BVHSoA, tri: TriangleSoA, orig: Array, d: Array,
                  t_max: Array | float = INF, any_hit: bool = False,
                  common_origin: bool = False,
                  rows: int = PACKET_ROWS,
                  batch_k: int = BATCH_K_CHUNKED) -> tuple[Array, Array]:
    """Drop-in replacement for integrator.intersect.trace on chunked
    forests. Same output contract as trace_pallas.trace_pallas."""
    meta, aabb, tverts = _pack_forest_cached(bvh, tri)
    n = orig.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    return _trace_chunked_cj(meta, aabb, tverts, orig, d, t_max,
                             bvh.chunk_nodes, bvh.chunk_tris,
                             bool(any_hit), bool(common_origin), int(rows),
                             int(batch_k))

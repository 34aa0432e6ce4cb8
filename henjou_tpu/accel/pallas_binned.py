"""Binned list-driven Pallas intersector: XLA prepass + per-tile worklists.

The two-level HBM kernel (pallas_cluster_hbm.py) spends most of its time
scanning boxes INSIDE the kernel: every ray tile walks every supercluster
(scalar frustum + [RT,1] slab), and each taken supercluster walks its 16
clusters — serial scalar work that the VPU idles through, and it repeats
identically for closest-hit and shadow traces. This kernel moves ALL
box culling into one dense XLA prepass that runs at full vector rate:

- per ray tile, a conservative interval-arithmetic slab test against
  every cluster GROUP produces (needed?, t_enter) in a [T, G] dense op
  (the same math as the in-kernel scalar frustum, vectorized over tiles
  and groups at once);
- each tile's needed groups are sorted near-to-far by t_enter into a
  fixed-width worklist (id, t_enter, count) handed to the kernel via
  scalar prefetch (SMEM);
- the kernel is a straight worklist walk: DMA the group's triangle rows
  from HBM, dense Moller-Trumbore, update best-hit refs; it STOPS as
  soon as the next group's t_enter exceeds the tile's worst best-t
  (near-to-far ordering makes the early exit exact), or — for shadow
  rays — as soon as every lane has a hit.

Group granularity adapts to scene size: one K=128-triangle cluster per
group for small scenes (finest culling), SC clusters per group for large
ones (keeps the worklist SMEM-sized; per-(subtile, cluster) need bits
from the same exact prepass then gate the in-kernel MT blocks).

Reference counterpart: OptiX GAS traversal (hardware BVH). This is the
TPU-native replacement: sorting + dense culling instead of per-ray MIMD
tree walks (SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from henjou_tpu.accel.pallas_cluster import K, _BIG
from henjou_tpu.accel.pallas_cluster_hbm import SC
from henjou_tpu.math.constants import TMAX_RAY

RAY_TILE = 256
# cluster groups per worklist entry: 1 while the per-tile worklist fits
# comfortably in SMEM, SC for big scenes
MAX_FINE_CLUSTERS = 512
# worklist-length cap: group size doubles until num_groups fits (the
# [tiles, num_groups] list+tent prefetch operands live in SMEM)
MAX_GROUPS = 256


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinnedClusters:
    rows: jnp.ndarray  # [Ctot*16, K] f32: planes 0-8 geometry, 9 = tri ids
    aabb: jnp.ndarray  # [8, Cp] per-cluster AABBs
    gaabb: jnp.ndarray  # [8, Gp] per-group AABBs (== aabb when group=1)
    scene_lo: jnp.ndarray  # [3] scene AABB (for exact tmax clamping)
    scene_hi: jnp.ndarray  # [3]
    num_clusters: int = dataclasses.field(metadata=dict(static=True))
    group: int = dataclasses.field(metadata=dict(static=True))  # clusters/entry
    num_groups: int = dataclasses.field(metadata=dict(static=True))
    # triangles per leaf cluster (MT block minor width). 128 = one full
    # f32 lane tile; 64 half-fills the vector lanes, 256 spans two tiles
    # (K-sweep measured in BASELINE.md round-4)
    k: int = dataclasses.field(default=K, metadata=dict(static=True))


def _median_split_order(centroids: np.ndarray, k: int = K) -> np.ndarray:
    """Top-down median-split ordering: recursively split along the widest
    centroid axis, keeping every left part a multiple of K so consecutive
    K-chunks of the output ARE the tree's leaves. Leaves come out far
    tighter than morton-run clusters (the binned kernel's MT cost is
    proportional to taken-cluster volume, so box quality is throughput)."""
    t = centroids.shape[0]
    out = np.empty(t, np.int64)
    pos = 0
    stack = [np.arange(t)]
    while stack:
        s = stack.pop()
        if len(s) <= k:
            out[pos : pos + len(s)] = s
            pos += len(s)
            continue
        c = centroids[s]
        ax = int((c.max(axis=0) - c.min(axis=0)).argmax())
        m = max(k, (len(s) // 2 // k) * k)
        part = np.argsort(c[:, ax], kind="stable")
        stack.append(s[part[m:]])
        stack.append(s[part[:m]])
    assert pos == t
    return out.astype(np.int32)


def _baldwin_rows_np(v0, e1, e2):
    """Per-triangle Baldwin-Weber transform (12 floats): plane (n, d)
    plus two affine barycentric rows (g1,h1), (g2,h2) with
    u = g1·P + h1, v = g2·P + h2 for P on the plane. Derivation:
    dotting P-A = u·e1 + v·e2 with (e2×n) / (n·n) isolates u (the
    triple products (e2×n)·e1 = n·n, (e2×n)·e2 = 0), and symmetrically
    (n×e1) isolates v. Cuts the in-kernel test from ~47 vector ops
    (Möller-Trumbore: two cross products per ray-triangle) to ~31
    (plane hit + two affine evals); the cross products are hoisted to
    build time. Degenerate triangles get all-zero rows -> n·d == 0 ->
    culled in-kernel exactly like an MT zero determinant."""
    n = np.cross(e1, e2)
    nn = (n * n).sum(axis=1, keepdims=True)
    ok = nn > 0.0
    inv_nn = np.where(ok, 1.0 / np.where(ok, nn, 1.0), 0.0)
    g1 = np.cross(e2, n) * inv_nn
    g2 = np.cross(n, e1) * inv_nn
    n = np.where(ok, n, 0.0)
    d = (n * v0).sum(axis=1)
    h1 = -(g1 * v0).sum(axis=1)
    h2 = -(g2 * v0).sum(axis=1)
    return n, d, g1, h1, g2, h2


def pack_binned_np(tri_verts, k: int = K) -> BinnedClusters:
    """Host-side numpy build: median-split triangles into K-wide leaf
    clusters, fold the original-id plane into the DMA rows (plane 12),
    and union group AABBs. Rows carry the Baldwin-Weber transform
    (planes 0-11: n|d|g1|h1|g2|h2, see _baldwin_rows_np), not raw
    vertices — the kernel's per-triangle test is plane-hit + two affine
    barycentric evals, no cross products."""
    tv = np.asarray(tri_verts, np.float32)
    t = tv.shape[0]
    centroids = tv.mean(axis=1)
    order = _median_split_order(centroids, k)

    pad = (-t) % k
    c = (t + pad) // k
    group = 1 if c <= MAX_FINE_CLUSTERS else SC
    # the per-tile worklist prefetch operand is [tiles, num_groups] in
    # SMEM: at ~1M tris (7.8k clusters) group=16 leaves 488 groups ->
    # ~1 MB of list+tent words for a 64k-ray pool, over the SMEM budget.
    # Coarsen the DMA/worklist granularity until <=256 groups (the
    # nibble bits stay per CLUSTER, so MT-skip granularity is unchanged;
    # cap at 64 clusters/group = 2x512 KB VMEM staging buffers).
    while group > 1 and group < 64 and (c + group - 1) // group > MAX_GROUPS:
        group *= 2
    g = (c + group - 1) // group
    ctot = g * group

    order_p = np.full(ctot * k, -1, np.int32)
    order_p[:t] = order
    verts = np.zeros((ctot * k, 3, 3), np.float32)
    verts[:t] = tv[order]

    v0 = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]

    valid = (order_p >= 0).reshape(ctot, k)
    vmin = np.where(valid[..., None, None], verts.reshape(ctot, k, 3, 3), _BIG)
    vmax = np.where(valid[..., None, None], verts.reshape(ctot, k, 3, 3), -_BIG)
    amin = vmin.reshape(ctot, k * 3, 3).min(axis=1)
    amax = vmax.reshape(ctot, k * 3, 3).max(axis=1)

    cp = max(8, int(np.ceil(ctot / 8) * 8))
    aabb = np.full((8, cp), _BIG, np.float32)
    aabb[0:3, :ctot] = amin.T
    aabb[3:6, :ctot] = amax.T
    aabb[3:6, ctot:] = -_BIG

    gmins = amin.reshape(g, group, 3).min(axis=1)
    gmaxs = amax.reshape(g, group, 3).max(axis=1)
    gp = max(8, int(np.ceil(g / 8) * 8))
    gaabb = np.full((8, gp), _BIG, np.float32)
    gaabb[0:3, :g] = gmins.T
    gaabb[3:6, :g] = gmaxs.T
    gaabb[3:6, g:] = -_BIG

    nrm, dpl, g1, h1, g2, h2 = _baldwin_rows_np(v0, e1, e2)
    rows = np.zeros((ctot, 16, k), np.float32)
    comps = [nrm[:, 0], nrm[:, 1], nrm[:, 2], dpl,
             g1[:, 0], g1[:, 1], g1[:, 2], h1,
             g2[:, 0], g2[:, 1], g2[:, 2], h2]
    for i, comp in enumerate(comps):
        rows[:, i, :] = comp.reshape(ctot, k)
    rows[:, 12, :] = order_p.reshape(ctot, k).view(np.float32)
    rows = rows.reshape(-1, k)

    return BinnedClusters(
        rows=jnp.asarray(rows),
        aabb=jnp.asarray(aabb),
        gaabb=jnp.asarray(gaabb),
        scene_lo=jnp.asarray(amin.min(axis=0)),
        scene_hi=jnp.asarray(amax.max(axis=0)),
        num_clusters=c,
        group=group,
        num_groups=g,
        k=k,
    )


def plan_binned_order(tri_verts, geom_ranges=None):
    """Host-side PLAN for the two-level animated-scene build: the
    median-split cluster ordering, computed ONCE in object/rest space.

    Cluster tightness is preserved under rigid per-instance motion when
    clusters never span geometries (a geometry's triangles move together),
    so the expensive Python-loop median split (pack_binned_np) need not
    re-run per animated frame — only the AABB/row refresh does
    (build_binned_from_order, a dense jittable op). This replaces the
    reference's full per-frame IAS rebuild (renderer.h:257-291,398-490)
    with an O(T) device refresh.

    geom_ranges: [(start_tri, count), ...] per geometry-instance; each
    range is ordered independently and padded to a multiple of K.
    Returns (order [Ctot*K] i32 with -1 pads, num_clusters, group,
    num_groups)."""
    tv = np.asarray(tri_verts, np.float32)
    t = tv.shape[0]
    if geom_ranges is None:
        geom_ranges = [(0, t)]
    order_chunks = []
    for start, count in geom_ranges:
        if count == 0:
            continue
        cent = tv[start : start + count].mean(axis=1)
        sub = _median_split_order(cent) + start
        pad = (-count) % K
        if pad:
            sub = np.concatenate([sub, np.full(pad, -1, np.int32)])
        order_chunks.append(sub)
    order = np.concatenate(order_chunks) if order_chunks else np.zeros(0, np.int32)
    c = len(order) // K
    group = 1 if c <= MAX_FINE_CLUSTERS else SC
    while group > 1 and group < 64 and (c + group - 1) // group > MAX_GROUPS:
        group *= 2
    g = (c + group - 1) // group
    ctot = g * group
    if ctot * K > len(order):
        order = np.concatenate(
            [order, np.full(ctot * K - len(order), -1, np.int32)]
        )
    return order.astype(np.int32), c, group, g


@functools.partial(jax.jit, static_argnames=("num_clusters", "group", "num_groups"))
def build_binned_from_order(
    tri_verts, order, num_clusters: int, group: int, num_groups: int
) -> BinnedClusters:
    """Device-side refresh of BinnedClusters from a fixed cluster order:
    one gather + dense reductions (jittable; runs per animated frame in
    ~ms where pack_binned_np's host median split took the frame budget).

    `tri_verts` are the CURRENT world-space triangles (frame flatten);
    `order` the plan from plan_binned_order."""
    ctot = num_groups * group
    valid = order >= 0  # [Ctot*K]
    verts = tri_verts[jnp.maximum(order, 0)]  # [Ctot*K, 3, 3]
    verts = jnp.where(valid[:, None, None], verts, 0.0)

    v0 = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]

    vmin = jnp.where(valid[:, None, None], verts, _BIG).reshape(ctot, K * 3, 3)
    vmax = jnp.where(valid[:, None, None], verts, -_BIG).reshape(ctot, K * 3, 3)
    amin = jnp.min(vmin, axis=1)  # [Ctot, 3]
    amax = jnp.max(vmax, axis=1)

    cp = max(8, int(np.ceil(ctot / 8) * 8))
    aabb = jnp.full((8, cp), _BIG, jnp.float32)
    aabb = aabb.at[3:6, :].set(-_BIG)
    aabb = aabb.at[0:3, :ctot].set(amin.T)
    aabb = aabb.at[3:6, :ctot].set(amax.T)

    gmins = jnp.min(amin.reshape(num_groups, group, 3), axis=1)
    gmaxs = jnp.max(amax.reshape(num_groups, group, 3), axis=1)
    gp = max(8, int(np.ceil(num_groups / 8) * 8))
    gaabb = jnp.full((8, gp), _BIG, jnp.float32)
    gaabb = gaabb.at[3:6, :].set(-_BIG)
    gaabb = gaabb.at[0:3, :num_groups].set(gmins.T)
    gaabb = gaabb.at[3:6, :num_groups].set(gmaxs.T)

    # Baldwin-Weber transform, same derivation as _baldwin_rows_np
    nrm = jnp.cross(e1, e2)
    nn = jnp.sum(nrm * nrm, axis=1, keepdims=True)
    okt = nn > 0.0
    inv_nn = jnp.where(okt, 1.0 / jnp.where(okt, nn, 1.0), 0.0)
    g1 = jnp.cross(e2, nrm) * inv_nn
    g2 = jnp.cross(nrm, e1) * inv_nn
    nrm = jnp.where(okt, nrm, 0.0)
    dpl = jnp.sum(nrm * v0, axis=1)
    h1 = -jnp.sum(g1 * v0, axis=1)
    h2 = -jnp.sum(g2 * v0, axis=1)
    zero = jnp.zeros_like(dpl)
    rows = jnp.stack(
        [
            nrm[:, 0], nrm[:, 1], nrm[:, 2], dpl,
            g1[:, 0], g1[:, 1], g1[:, 2], h1,
            g2[:, 0], g2[:, 1], g2[:, 2], h2,
            jax.lax.bitcast_convert_type(order, jnp.float32),
            zero, zero, zero,
        ],
        axis=1,
    ).reshape(ctot, K, 16).transpose(0, 2, 1).reshape(-1, K)

    return BinnedClusters(
        rows=rows,
        aabb=aabb,
        gaabb=gaabb,
        scene_lo=jnp.min(amin, axis=0),  # pad clusters are +_BIG: no-op
        scene_hi=jnp.max(amax, axis=0),
        num_clusters=num_clusters,
        group=group,
        num_groups=num_groups,
    )


def _tile_worklists(bc, ox, oy, oz, dx, dy, dz, tmin, tmax, rt, subt=1,
                    max_entries=0):
    """Dense XLA prepass: per-tile (group worklist, t_enter, count) plus —
    for grouped scenes — a per-(tile, cluster) need BITMASK.

    EXACT per-ray slab tests, OR-reduced over each ray tile. The earlier
    interval-arithmetic tile test (origin box x inverse-direction box)
    was catastrophically conservative for incoherent directions: on the
    254k-tri contest scene, bounce-ray tiles took ALL 1,991 clusters
    while each individual ray needed ~7, and even 8-ray tiles still took
    1,500 (mixed direction signs make the inverse-direction interval
    span +-inf; tools/cull_efficiency.py / exp_exact_union.py). Exact
    per-ray slabs cut the bounce tile union 1,991 -> 820 at rt=256 for
    ~25 flops per (ray, box) of dense VPU work — the same arithmetic the
    kernel's in-kernel slab_need already applies per lane, so culling
    decisions are unchanged in kind, just hoisted and made per-ray.
    t_enter = min over the tile's rays of that ray's entry t (a valid
    lower bound, so the kernel's near-to-far early exit stays exact);
    per-ray tmax (shadow-ray distance clamps, dead zero-width lanes)
    tightens the union for free."""
    n = ox.shape[0]
    t = n // rt

    def inv(d):
        tiny = jnp.where(d >= 0.0, 1e-12, -1e-12)
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12, tiny, d)

    def exact_union_need(boxes, n_valid, gran):
        """(need [N/gran, Bp], t_enter [N/gran, Bp]) — exact per-ray
        slab tests reduced over spans of `gran` consecutive (sorted)
        rays, chunked over boxes to bound the [*, gran, chunk]
        intermediates."""
        tt = n // gran
        o3 = [v.reshape(tt, gran, 1) for v in (ox, oy, oz)]
        i3 = [inv(v).reshape(tt, gran, 1) for v in (dx, dy, dz)]
        tmin_r = tmin.reshape(tt, gran, 1)
        tmax_r = tmax.reshape(tt, gran, 1)
        ray_alive = tmax_r > tmin_r  # zero-width lanes join no union
        bp = boxes.shape[1]
        needs, tents = [], []
        ch = 512
        for s in range(0, bp, ch):
            e = min(s + ch, bp)
            te = jnp.broadcast_to(tmin_r, (tt, gran, e - s))
            tx = jnp.broadcast_to(tmax_r, (tt, gran, e - s))
            for ax in range(3):
                mn = boxes[ax][None, None, s:e]
                mx = boxes[3 + ax][None, None, s:e]
                t1 = (mn - o3[ax]) * i3[ax]
                t2 = (mx - o3[ax]) * i3[ax]
                te = jnp.maximum(te, jnp.minimum(t1, t2))
                tx = jnp.minimum(tx, jnp.maximum(t1, t2))
            ok = (te <= tx) & ray_alive
            needs.append(jnp.any(ok, axis=1))
            tents.append(jnp.min(jnp.where(ok, te, _BIG), axis=1))
        need = jnp.concatenate(needs, axis=1) if len(needs) > 1 else needs[0]
        tent = jnp.concatenate(tents, axis=1) if len(tents) > 1 else tents[0]
        valid = jax.lax.broadcasted_iota(jnp.int32, (tt, bp), 1) < n_valid
        return need & valid, tent

    if bc.group > 1 or subt > 1:
        # one exact pass at (SUBTILE, cluster) granularity serves both
        # products: a NIBBLE-packed need mask (the subt bits of cluster
        # cid live together in word [i*nw + cid>>log2(32/subt)], so the
        # kernel reads ONE SMEM word per cluster and a single nib==0
        # test skips all subtiles of a dead cluster) and the group
        # worklist (any/min over the tile's subtiles and each group's
        # clusters).
        ctot = bc.num_groups * bc.group
        fpw = 32 // subt  # nibble fields per 32-bit word
        nw = (ctot + fpw - 1) // fpw  # words per tile
        need_s, tent_s = exact_union_need(bc.aabb, ctot, rt // subt)
        cp = need_s.shape[1]
        need_s = need_s.reshape(t, subt, cp)
        need_c = jnp.any(need_s, axis=1)
        tent_c = jnp.min(
            jnp.where(need_s, tent_s.reshape(t, subt, cp), _BIG), axis=1
        )
        need_g = jnp.any(
            need_c[:, :ctot].reshape(t, bc.num_groups, bc.group), axis=2
        )
        tent_g = jnp.min(
            tent_c[:, :ctot].reshape(t, bc.num_groups, bc.group), axis=2
        )
        gp = bc.gaabb.shape[1]
        if gp > bc.num_groups:
            need_g = jnp.pad(need_g, ((0, 0), (0, gp - bc.num_groups)))
            tent_g = jnp.pad(
                tent_g, ((0, 0), (0, gp - bc.num_groups)),
                constant_values=_BIG,
            )
        need, t_enter = need_g, tent_g

        padded = need_s[:, :, :ctot]
        if ctot < nw * fpw:
            padded = jnp.pad(
                padded, ((0, 0), (0, 0), (0, nw * fpw - ctot))
            )
        # [t, subt, nw*fpw] -> [t, nw, fpw, subt]; field shift =
        # subt*(cid % fpw) + s
        arr = padded.reshape(t, subt, nw, fpw).transpose(0, 2, 3, 1)
        shifts = (
            subt * jnp.arange(fpw, dtype=jnp.uint32)[None, None, :, None]
            + jnp.arange(subt, dtype=jnp.uint32)[None, None, None, :]
        )
        words = jnp.sum(
            arr.astype(jnp.uint32) << shifts, axis=(2, 3), dtype=jnp.uint32
        )
        bits = jax.lax.bitcast_convert_type(words, jnp.int32).reshape(-1)
    else:
        need, t_enter = exact_union_need(bc.gaabb, bc.num_groups, rt)
        bits = jnp.zeros((8,), jnp.int32)

    tkey = jnp.where(need, t_enter, _BIG)
    perm, tent = _bitonic_rows(tkey)
    count = jnp.sum(need.astype(jnp.int32), axis=1)
    if max_entries:
        # truncated walk (two-phase tmax probing): visit only the
        # nearest max_entries groups per tile. NOT a correct closest-hit
        # — hits beyond the truncation are missed; callers use the
        # result only as a conservative per-ray tmax upper bound.
        count = jnp.minimum(count, max_entries)

    # FLAT 1-D worklists: 2-D SMEM prefetch operands pad their minor dim
    # to 128 lanes (4x SMEM waste -> OOM at small ray tiles); 1-D don't
    return perm.reshape(-1), tent.reshape(-1), count, bits


def _bitonic_rows(key):
    """Row-wise (axis=1) ascending sort of [T, W]: returns (perm i32,
    sorted key). Static inline bitonic network — every mask is a
    compile-time constant and every exchange a pair-reversal reshape, so
    XLA emits pure vector ops (`jnp.argsort` on the same shape measured
    3.5 ms on a v5e; this runs in ~0.1 ms)."""
    t, w = key.shape
    wp = 1 << (w - 1).bit_length()
    if wp != w:
        key = jnp.pad(key, ((0, 0), (0, wp - w)), constant_values=_BIG)
    idx = jnp.broadcast_to(
        jnp.arange(wp, dtype=jnp.int32)[None, :], (t, wp)
    )

    def partner(x, j):
        return x.reshape(t, -1, 2, j)[:, :, ::-1, :].reshape(t, wp)

    i = np.arange(wp)
    k = 2
    while k <= wp:
        j = k >> 1
        while j >= 1:
            low = (i & j) == 0
            up = (i & k) == 0
            take_min = jnp.asarray((low & up) | (~low & ~up))
            pk = partner(key, j)
            pi = partner(idx, j)
            swap = jnp.where(take_min, key > pk, key < pk)
            key = jnp.where(swap, pk, key)
            idx = jnp.where(swap, pi, idx)
            j >>= 1
        k <<= 1
    return idx[:, :w], key[:, :w]


def _kernel(
    list_ref,  # SMEM prefetch [T*Gp] i32 (flat; see _tile_worklists)
    tent_ref,  # SMEM prefetch [T*Gp] f32
    count_ref,  # SMEM prefetch [T] i32
    bits_ref,  # SMEM prefetch [T*NW] i32 nibble-packed cluster-need mask
    rows_ref,  # ANY (HBM) [Ctot*16, K]
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmin_ref, tmax_ref,
    t_out, prim_out, u_out, v_out,
    # *scratch: per-SUBTILE best-hit state (bt/bp/bu/bv x subt, each
    # [RT/subt, 1] VMEM — separate refs because Mosaic rejects sublane
    # slicing of (N, 1) refs), then DMA staging buf + semaphore
    *scratch,
    group: int, any_hit: bool, vmem_rows: bool, gp: int, nw: int,
    subt: int = 1, ablate: int = 0, defer: bool = False,
):
    # `ablate` (experiments only, tools/exp_kernel_split.py): bit 1 skips
    # the MT blocks (walk+gating cost alone), bit 4 ignores the prepass
    # cluster bits.
    bt_refs = list(scratch[0:subt])
    bp_refs = list(scratch[subt : 2 * subt])
    bu_refs = list(scratch[2 * subt : 3 * subt])
    bv_refs = list(scratch[3 * subt : 4 * subt])
    buf_ref = scratch[4 * subt]  # VMEM [2, group*16, K] staging
    sem_ref = scratch[4 * subt + 1]  # DMA semaphores
    i = pl.program_id(0)
    ox = ox_ref[:]  # [RT, 1]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]

    rt_rows = ox.shape[0]
    strows = rt_rows // subt  # rows per subtile slice

    def rows_of(a, s):
        """Subtile row slice of a whole-tile [RT, 1] VALUE (not ref).
        Static slice — s is a Python int from an unrolled loop; subt=1
        makes it the identity."""
        return a if subt == 1 else a[s * strows : (s + 1) * strows]

    for s in range(subt):
        bt_refs[s][:] = rows_of(tmax, s) + 0.0
        bp_refs[s][:] = jnp.full((strows, 1), -1, jnp.int32)
        bu_refs[s][:] = jnp.zeros((strows, 1), jnp.float32)
        bv_refs[s][:] = jnp.zeros((strows, 1), jnp.float32)

    def best_t_all():
        """Tile-wide worst best-t (the near-to-far early-exit bound)."""
        m = jnp.max(bt_refs[0][:])
        for s in range(1, subt):
            m = jnp.maximum(m, jnp.max(bt_refs[s][:]))
        return m

    def mt_block(src_ref, b, s=0, cid=0):
        """Dense triangle test of the tile (or one subtile row slice)
        against src_ref rows [b, b+16) (one K-wide cluster); see
        load_rows/mt_eval. The test is the Baldwin-Weber transformed
        form (plane hit + two affine barycentric evals) — the
        per-triangle cross products of Möller-Trumbore are precomputed
        into the rows at build time (_baldwin_rows_np)."""
        mt_eval(load_rows(src_ref, b), s, cid)

    def load_rows(src_ref, b):
        """The cluster's Baldwin-Weber geometry rows (+ the tri-id plane
        for closest hits), loaded ONCE per cluster — shared across every
        live subtile's mt_eval (re-paying the loads+broadcasts per
        subtile measured ~5% of contest-scale kernel time; taken
        clusters average ~2 live subtiles there). Deferred-pick mode
        skips the tri-id plane: attributes resolve outside the kernel."""
        n_rows = 12 if (any_hit or defer) else 13
        return tuple(
            src_ref[pl.ds(b + j, 1), :] for j in range(n_rows)
        )

    def mt_eval(rows, s=0, cid=0):
        """Evaluate one cluster's loaded rows against subtile slice `s`
        and fold into its best-hit refs. Mask notes: pad/degenerate
        triangles have all-zero rows -> tt == 0 -> culled by tt > tmin
        (tmin is clamped >= 0 in intersect_binned), so no explicit
        tri-id/determinant validity terms are needed."""
        (nxr, nyr, nzr, dplr, g1xr, g1yr, g1zr, h1r,
         g2xr, g2yr, g2zr, h2r) = rows[:12]
        oxs, oys, ozs = rows_of(ox, s), rows_of(oy, s), rows_of(oz, s)
        dxs, dys, dzs = rows_of(dx, s), rows_of(dy, s), rows_of(dz, s)
        tmins = rows_of(tmin, s)
        bts, bps = bt_refs[s], bp_refs[s]
        best_t_j = bts[:]

        nd = dxs * nxr + dys * nyr + dzs * nzr
        no = oxs * nxr + oys * nyr + ozs * nzr
        inv_nd = jnp.where(jnp.abs(nd) > 1e-12, 1.0 / nd, 0.0)
        tt = (dplr - no) * inv_nd
        px = oxs + tt * dxs
        py = oys + tt * dys
        pz = ozs + tt * dzs
        uu = h1r + g1xr * px + g1yr * py + g1zr * pz
        vv = h2r + g2xr * px + g2yr * py + g2zr * pz
        ok = (
            (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt > tmins)
            & (tt < best_t_j)
        )
        if any_hit:
            # occlusion only needs a per-lane hit FLAG: skip the argmin /
            # attribute picks, and collapse a hit lane's best-t to tmin
            # so the tile-wide early exit tightens as lanes get occluded
            hit_any = jnp.any(ok, axis=1, keepdims=True)
            bts[:] = jnp.where(hit_any, tmins, best_t_j)
            bps[:] = jnp.where(hit_any, 1, bps[:])
            return
        if defer:
            # DEFERRED attribute resolution (round-4 VERDICT #1b, the
            # in-kernel MT-rate lever): the hot loop keeps only (best-t,
            # flat cluster*K+k winner) — 2 lane reductions per cluster
            # instead of 5 (min + argmin + three pick-sums) and no
            # u/v/ordr work; intersect_binned recomputes u/v/prim for
            # the single winning triangle per ray after the walk (one
            # [R,13] gather + a dozen vector ops). Tie behavior matches
            # the inline path: lowest k within a cluster (masked-iota
            # min), earliest cluster across clusters (strict <).
            k_iota = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
            tt = jnp.where(ok, tt, _BIG)
            bt_k = jnp.min(tt, axis=1, keepdims=True)
            hit_any = bt_k < best_t_j
            k_best = jnp.min(
                jnp.where(tt == bt_k, k_iota, jnp.int32(1 << 20)),
                axis=1, keepdims=True,
            )
            flat = cid * tt.shape[1] + k_best
            bts[:] = jnp.where(hit_any, bt_k, best_t_j)
            bps[:] = jnp.where(hit_any, flat, bps[:])
            return
        ordr = jax.lax.bitcast_convert_type(rows[12], jnp.int32)
        bus, bvs = bu_refs[s], bv_refs[s]
        k_iota = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
        tt = jnp.where(ok, tt, _BIG)
        bt_k = jnp.min(tt, axis=1, keepdims=True)
        hit_any = bt_k < best_t_j
        k_best = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
        pick = k_iota == k_best
        prim_k = jnp.sum(jnp.where(pick, ordr, 0), axis=1, keepdims=True)
        u_k = jnp.sum(jnp.where(pick, uu, 0.0), axis=1, keepdims=True)
        v_k = jnp.sum(jnp.where(pick, vv, 0.0), axis=1, keepdims=True)
        bts[:] = jnp.where(hit_any, bt_k, best_t_j)
        bps[:] = jnp.where(hit_any, prim_k, bps[:])
        bus[:] = jnp.where(hit_any, u_k, bus[:])
        bvs[:] = jnp.where(hit_any, v_k, bvs[:])

    n_work = count_ref[i]

    def _dma(li_s, slot):
        gid_s = list_ref[i * gp + li_s]
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(gid_s * group * 16, group * 16)],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    if not vmem_rows:
        # double-buffered streaming: group li+1's rows copy while li's
        # Moller-Trumbore runs; a possibly-outstanding prefetch is
        # drained after the loop (early exit leaves exactly one)
        @pl.when(n_work > 0)
        def _():
            _dma(0, 0).start()

    def cond(carry):
        li, tnext, btmax, slot = carry
        return (li < n_work) & (tnext <= btmax)

    def body(carry):
        li, tnext, btmax, slot = carry
        gid = list_ref[i * gp + li]
        if vmem_rows:
            src_ref, base = rows_ref, gid * group * 16
        else:
            _dma(li, slot).wait()
            li_n = li + 1

            @pl.when(li_n < n_work)
            def _():
                _dma(li_n, 1 - slot).start()

            src_ref, base = buf_ref.at[slot], 0

        if group == 1 and subt == 1:
            # the prepass already slab-tested this cluster for the tile
            mt_block(src_ref, base, cid=gid)
            if vmem_rows:
                # 16-wide unroll: amortize the while-loop's scalar
                # bookkeeping over up to 16 MT blocks (worklists average
                # 6-17 entries; loop overhead is a measurable slice)
                for k_un in range(1, 16):
                    li1 = li + k_un
                    t1 = tent_ref[i * gp + jnp.minimum(li1, gp - 1)]

                    @pl.when((li1 < n_work) & (t1 <= btmax))
                    def _(li1=li1):
                        gid1 = list_ref[i * gp + li1]
                        mt_block(rows_ref, gid1 * 16, cid=gid1)
        else:
            # nibble-packed cluster-need bits from the dense prepass:
            # ONE SMEM word read per cluster; nib==0 (cluster needed by
            # no subtile) skips everything. Bits are per SUBTILE of
            # RT/subt rays: incoherent bounce tiles need ~3x fewer
            # clusters per 64-ray union than per 256
            # (tools/exp_exact_union.py). A per-subtile best-t gate
            # (tnext vs that subtile's worst best-t, refreshed each
            # entry) lets early-resolving subtiles stop paying for
            # far clusters the static bits can't rule out. (An
            # in-kernel per-subtile slab re-test measured NET NEGATIVE
            # at contest scale — 63.9 vs 67.1 ms — and was removed;
            # tools/exp_kernel_split.py.)
            fshift = subt.bit_length() - 1  # log2(subt); subt is pow2
            fmask = (32 >> fshift) - 1  # fpw - 1
            btm = [jnp.max(bt_refs[s][:]) for s in range(subt)]

            def nib_gate(cid, src, b, tn):
                word = bits_ref[i * nw + (cid >> (5 - fshift))]
                nib = (word >> (subt * (cid & fmask))) & ((1 << subt) - 1)
                if ablate & 4:
                    nib = jnp.int32((1 << subt) - 1)

                @pl.when(nib != 0)
                def _(nib=nib):
                    if not (ablate & 1):
                        rows12 = load_rows(src, b)
                    for s in range(subt):
                        live = (((nib >> s) & 1) != 0) & (tn <= btm[s])

                        @pl.when(live)
                        def _(s=s):
                            if not (ablate & 1):
                                mt_eval(rows12, s, cid)

            for j in range(group):
                nib_gate(gid * group + j, src_ref, base + j * 16, tnext)
            if group == 1 and vmem_rows:
                # small-scene nibble path keeps the 16-wide unroll (the
                # while-loop's scalar bookkeeping is a measurable slice)
                for k_un in range(1, 16):
                    li1 = li + k_un
                    t1 = tent_ref[i * gp + jnp.minimum(li1, gp - 1)]

                    @pl.when((li1 < n_work) & (t1 <= btmax))
                    def _(li1=li1, t1=t1):
                        gid1 = list_ref[i * gp + li1]
                        nib_gate(gid1, rows_ref, gid1 * 16, t1)

        btmax2 = best_t_all()
        if any_hit:
            # all lanes occluded -> nothing left to refine
            occl = jnp.all(bp_refs[0][:] >= 0)
            for s in range(1, subt):
                occl = occl & jnp.all(bp_refs[s][:] >= 0)
            btmax2 = jnp.where(occl, -_BIG, btmax2)
        li2 = li + (16 if (group == 1 and vmem_rows) else 1)
        tnext2 = tent_ref[i * gp + jnp.minimum(li2, gp - 1)]
        return li2, tnext2, btmax2, 1 - slot

    t0 = tent_ref[i * gp]
    li_f, _, _, slot_f = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, best_t_all(), jnp.int32(0))
    )
    if not vmem_rows:
        # drain the prefetch issued for the entry the early exit skipped
        @pl.when(li_f < n_work)
        def _():
            _dma(li_f, slot_f).wait()

    def cat(refs):
        vals = [r_[:] for r_ in refs]
        return vals[0] if subt == 1 else jnp.concatenate(vals, axis=0)

    t_out[:] = cat(bt_refs)
    prim_out[:] = cat(bp_refs)
    u_out[:] = cat(bu_refs)
    v_out[:] = cat(bv_refs)


# whole cluster sets at or under this size sit in VMEM for the kernel's
# lifetime (no per-group DMA at all); bigger ones stream via DMA
VMEM_ROWS_BUDGET = 4 << 20


@functools.partial(
    jax.jit,
    static_argnames=(
        "any_hit", "interpret", "ray_tile", "subtiles", "ablate",
        "max_entries", "defer",
    ),
)
def intersect_binned(bc: BinnedClusters, ray_o, ray_d, tmin, tmax=TMAX_RAY,
                     any_hit: bool = False, interpret: bool = False,
                     ray_tile: int = RAY_TILE, subtiles: int = 0,
                     ablate: int = 0, max_entries: int = 0,
                     defer: bool = False):
    """Same contract as accel.bruteforce.intersect_bruteforce, with one
    extra requirement: ray directions must be UNIT LENGTH (the prepass's
    t_enter ordering and the scene-exit tmax clamp measure t in
    Euclidean distance). All in-repo callers trace normalized rays.

    `subtiles` (0 = auto): cluster-need bits per RAY_TILE/subtiles-ray
    subtile — exact 64-ray unions need ~3x fewer clusters than 256-ray
    ones on incoherent bounce rays, so each subtile slice skips most MT
    blocks (small group=1 scenes included: each cluster on the tile
    worklist MTs only the subtiles whose union needs it). SMEM cost
    scales linearly (1 MB budget; 4 subtiles at 2k clusters ~ 250 KB)."""
    RAY_TILE = ray_tile
    r = ray_o.shape[0]
    # tmin >= 0 is what lets the kernel's mask drop explicit pad/degenerate
    # terms (all-zero rows give tt == 0, culled by tt > tmin)
    tmin = jnp.maximum(jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,)), 0.0)
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))

    # EXACT tmax clamp: no hit can lie beyond the ray's scene-AABB exit
    # point, so rays that leave the scene (sky rays) stop poisoning the
    # tile-wide best-t used by the kernel's near-to-far early exit, and
    # rays that miss the scene box entirely become zero-width (free).
    tmax = jnp.minimum(tmax, _scene_exit_t(bc, ray_o, ray_d, tmin))

    pad = (-r) % RAY_TILE
    if pad:
        zpad = jnp.zeros((pad,), jnp.float32)
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), jnp.float32)])
        ray_d = jnp.concatenate(
            [ray_d, jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (pad, 1))]
        )
        tmin = jnp.concatenate([tmin, zpad])
        tmax = jnp.concatenate([tmax, zpad])
    rp = r + pad
    grid = rp // RAY_TILE

    subt = subtiles
    if subt == 0:
        # subtile bits pay only at scale: grouped scenes measured 77 ->
        # 4.6x closest-kernel cost without them, but at gallery-size
        # cluster counts the per-(cluster, subtile) gating is pure
        # overhead (10.76 vs 11.87 ms/iter, BASELINE round-3)
        subt = 4 if (bc.group > 1 and RAY_TILE % 32 == 0) else 1
        # keep the TOTAL scalar-prefetch footprint (worklist + tent +
        # bits) inside the SMEM budget at very large cluster counts
        # (1M tris @ subt=4 would be ~2 MB for a 64k-ray pool): halve
        # bit granularity until it fits
        nct = bc.num_groups * bc.group
        tiles = rp // RAY_TILE
        fixed = tiles * (2 * int(bc.gaabb.shape[1]) + 1) * 4  # list+tent+count
        while subt > 1 and fixed + tiles * (
            (nct + (32 // subt) - 1) // (32 // subt)
        ) * 4 > (1 << 20):
            subt //= 2
    assert RAY_TILE % (subt * 8) == 0, "subtile rows must stay 8-aligned"
    assert subt & (subt - 1) == 0 and subt <= 32, "subt must be pow2 <= 32"

    ox, oy, oz = ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    worklist, tent, count, bits = _tile_worklists(
        bc, ox, oy, oz, dx, dy, dz, tmin, tmax, RAY_TILE, subt,
        max_entries=max_entries,
    )

    def cols(x):
        return x.reshape(rp, 1)

    ray_spec = pl.BlockSpec(
        (RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )

    hbm = pl.BlockSpec(memory_space=pl.ANY)

    vmem_rows = bc.rows.size * 4 <= VMEM_ROWS_BUDGET
    ctot = bc.num_groups * bc.group
    fpw = 32 // subt
    kernel = functools.partial(
        _kernel, group=bc.group, any_hit=any_hit, vmem_rows=vmem_rows,
        gp=int(bc.gaabb.shape[1]), nw=(ctot + fpw - 1) // fpw, subt=subt,
        ablate=ablate, defer=defer and not any_hit,
    )
    out_shape = [
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
    ]
    rows_spec = (
        pl.BlockSpec(memory_space=pltpu.VMEM) if vmem_rows else hbm
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid,),
        in_specs=[rows_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        scratch_shapes=(
            # per-subtile best-hit state (bt/bp/bu/bv x subt)
            [pltpu.VMEM((RAY_TILE // subt, 1), jnp.float32)] * subt
            + [pltpu.VMEM((RAY_TILE // subt, 1), jnp.int32)] * subt
            + [pltpu.VMEM((RAY_TILE // subt, 1), jnp.float32)] * subt
            + [pltpu.VMEM((RAY_TILE // subt, 1), jnp.float32)] * subt
            + [
                # staging + semaphores exist (unused) in vmem_rows mode
                # too: keeps the kernel signature static
                pltpu.VMEM(
                    (2, 16 if vmem_rows else bc.group * 16, bc.k), jnp.float32
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        ),
    )
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        worklist, tent, count, bits,
        bc.rows,
        cols(ox), cols(oy), cols(oz),
        cols(dx), cols(dy), cols(dz),
        cols(tmin), cols(tmax),
    )
    t = t.reshape(rp)[:r]
    prim = prim.reshape(rp)[:r]
    u = u.reshape(rp)[:r]
    v = v.reshape(rp)[:r]
    is_hit = prim >= 0
    if defer and not any_hit:
        # attribute resolution for the deferred-pick kernel: `prim`
        # holds the winner's flat cluster*K+k index; gather that one
        # triangle's 13 rows-planes per ray and recompute u/v (same f32
        # arithmetic as the in-kernel test -> bit-identical values) and
        # the original tri id from the id plane
        kk = bc.k
        flat = jnp.maximum(prim, 0)
        c_i = flat // kk
        j_i = flat % kk
        rows_flat = bc.rows.reshape(-1)
        base = (c_i * 16) * kk + j_i
        plane_k = kk * jnp.arange(13, dtype=prim.dtype)[None, :]
        vals = rows_flat[base[:, None] + plane_k]  # [r, 13]
        ro = ray_o[:r]
        px = ro[:, 0] + t * ray_d[:r, 0]
        py = ro[:, 1] + t * ray_d[:r, 1]
        pz = ro[:, 2] + t * ray_d[:r, 2]
        u = vals[:, 7] + vals[:, 4] * px + vals[:, 5] * py + vals[:, 6] * pz
        v = vals[:, 11] + vals[:, 8] * px + vals[:, 9] * py + vals[:, 10] * pz
        tri_id = jax.lax.bitcast_convert_type(vals[:, 12], jnp.int32)
        prim = jnp.where(is_hit, tri_id, -1)
        u = jnp.where(is_hit, u, 0.0)
        v = jnp.where(is_hit, v, 0.0)
    return jnp.where(is_hit, t, jnp.inf), prim, u, v, is_hit


def _scene_exit_t(bc: BinnedClusters, ray_o, ray_d, tmin):
    """Per-ray exit t of the scene AABB (slab), with a relative safety
    margin; rays missing the box get tmin (zero-width = dead)."""
    tiny = jnp.where(ray_d >= 0.0, 1e-12, -1e-12)
    iv = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-12, tiny, ray_d)
    t1 = (bc.scene_lo[None, :] - ray_o) * iv
    t2 = (bc.scene_hi[None, :] - ray_o) * iv
    t_exit = jnp.min(jnp.maximum(t1, t2), axis=1)
    t_enter = jnp.max(jnp.minimum(t1, t2), axis=1)
    t_exit = t_exit * (1.0 + 1e-4) + 1e-5
    return jnp.where(
        (t_exit >= t_enter) & (t_exit > tmin), t_exit, tmin
    )


_RAY_TILE_PROBE_CACHE: dict = {}


def probe_ray_tile(bc: BinnedClusters, candidates=(256, 512),
                   n_rays: int = 1 << 16, reps: int = 3) -> int:
    """Build-time micro-probe replacing the scene-class hand-gate
    (round-4 VERDICT #8): time the production closest-hit path (bitonic
    sorted wrapper + binned kernel) on synthetic incoherent rays at
    each candidate tile size and lock the per-scene winner.

    History the gate encoded: 512 won +6.6% on the contest engine
    iteration (walk-bound, 1,991 clusters) but regressed the closest
    kernel 34 -> 263 ms at 1M tris (7,808 clusters) until a second
    cluster-count gate was added — exactly the brittleness a measured
    probe removes. The challenger must beat the 256 default by >3% to
    win (timing noise guard biased toward the safe default).

    Probe rays: deterministic RNG, origins uniform in the scene AABB,
    directions uniform on the sphere, run through the SAME sorted
    wrapper production uses. Cost: one timed run per candidate
    (sub-second warm via the persistent compile cache; the loser's
    kernel compile is the one-time cold cost). Cached per scene shape
    for the process lifetime."""
    key = (
        int(bc.num_clusters), int(bc.group),
        tuple(np.asarray(bc.scene_lo).tolist()),
        tuple(np.asarray(bc.scene_hi).tolist()),
        tuple(candidates),
    )
    got = _RAY_TILE_PROBE_CACHE.get(key)
    if got is not None:
        return got
    import logging
    import time as _time

    log = logging.getLogger("henjou_tpu")
    if jax.default_backend() == "cpu":
        # interpret-mode timings are meaningless; tile size is a pure
        # perf knob there, so take the series default
        _RAY_TILE_PROBE_CACHE[key] = RAY_TILE
        return RAY_TILE
    from henjou_tpu.accel.sorting import make_bitonic_sorted_intersector

    rng = np.random.default_rng(12345)
    lo = np.asarray(bc.scene_lo, np.float32)
    hi = np.asarray(bc.scene_hi, np.float32)
    o = rng.uniform(lo, hi, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t0_all = _time.monotonic()
    best_rt, best_t = None, None
    for rt_c in candidates:
        def ifn(tri_verts, ro, rd, tmin, tmax=TMAX_RAY, _rt=rt_c):
            return intersect_binned(bc, ro, rd, tmin, tmax, ray_tile=_rt)

        sifn, _ = make_bitonic_sorted_intersector(
            ifn, ifn, bc.scene_lo, bc.scene_hi
        )
        run = jax.jit(
            lambda ro, rd, _f=sifn: _f(None, ro, rd, 1e-3, TMAX_RAY)
        )
        jax.block_until_ready(run(oj, dj))  # compile + warm
        t0 = _time.perf_counter()
        for _ in range(reps):
            out = run(oj, dj)
        jax.block_until_ready(out)
        dt = (_time.perf_counter() - t0) / reps
        log.info("ray_tile probe: rt=%d %.2f ms/%dk rays", rt_c,
                 dt * 1e3, n_rays // 1024)
        # the 256 default wins ties and anything within 3%
        if best_t is None or dt < best_t * 0.97:
            best_rt, best_t = rt_c, dt
    log.info(
        "ray_tile probe: chose rt=%d (%d clusters, group=%d) in %.2fs",
        best_rt, bc.num_clusters, bc.group, _time.monotonic() - t0_all,
    )
    _RAY_TILE_PROBE_CACHE[key] = best_rt
    return best_rt


def make_binned_intersector(bc: BinnedClusters, ray_tile: int = 0,
                            subtiles: int = 0):
    """ray_tile=0 measures the per-scene optimum with a build-time
    micro-probe (probe_ray_tile) instead of the former scene-class
    hand-gate — the gate picked 512 for walk-bound grouped scenes
    (+6.6% at contest scale) but needed a second cluster-count gate
    after a 7.7x regression at 1M tris (BASELINE round-4); probing the
    actual kernel removes the brittleness."""
    if ray_tile == 0:
        if isinstance(bc.scene_lo, jax.core.Tracer):
            # called under jit with a traced bc (the renderer's temporal
            # depth / upscale guide probes): can't time anything here —
            # take the series default; production engine paths build
            # their intersector on host with a concrete bc
            ray_tile = RAY_TILE
        else:
            ray_tile = probe_ray_tile(bc)

    def intersect_fn(tri_verts, ray_o, ray_d, tmin, tmax=TMAX_RAY):
        return intersect_binned(
            bc, ray_o, ray_d, tmin, tmax,
            interpret=jax.default_backend() == "cpu",
            ray_tile=ray_tile, subtiles=subtiles,
        )

    def occluded_fn(tri_verts, ray_o, ray_d, tmin, tmax):
        _, _, _, _, hit = intersect_binned(
            bc, ray_o, ray_d, tmin, tmax, any_hit=True,
            interpret=jax.default_backend() == "cpu",
            ray_tile=ray_tile, subtiles=subtiles,
        )
        return hit

    return intersect_fn, occluded_fn

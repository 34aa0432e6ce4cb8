"""HBM-resident, two-level Pallas packet/cluster intersector.

ARCHIVE — superseded generation (round 1 end-state, 4.3 Mrays/s raw),
not routed in production. Still imported for its SC constant and
exercised by slow-lane parity tests; the production kernel is
accel/pallas_binned.py (BASELINE.md round-2 progression).

Scales the packet/cluster design (accel/pallas_cluster.py) past the VMEM
budget AND past the flat cluster scan's O(C) per-tile slab cost:

- triangles live in HBM as [C, 10, K] rows (9 component planes + the
  original-id plane bitcast to f32), one DMA per taken supercluster;
- clusters group into SUPERCLUSTERS of SC=16 (2048 triangles); both AABB
  levels live in SMEM and are tested with scalar loads + [RT,1] vector
  slab math;
- the outer loop visits superclusters; a supercluster whose AABB no lane
  of the tile can reach (given each lane's best-so-far) is skipped in a
  handful of scalar ops — the inner 16-cluster block (DMA + dense
  [RT,128] Möller-Trumbore per needed cluster) never runs;
- best-hit state is kept in VMEM scratch refs and updated under
  `pl.when`, so skipping has no loop-carry bookkeeping.

Still no per-lane gathers anywhere.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from henjou_tpu.accel.pallas_cluster import K, _BIG, pack_clusters
from henjou_tpu.math.constants import TMAX_RAY

SC = 16  # clusters per supercluster (SC*K = 2048 triangles)
RAY_TILE = 256  # smaller than the VMEM variant: DMA staging + scratch eat VMEM


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HbmClusters:
    rows: jnp.ndarray  # [C2*SC*16, K] f32 (9 used + 7 pad planes per cluster)
    order: jnp.ndarray  # [C2*SC, K] i32 original tri ids (-1 padding)
    aabb: jnp.ndarray  # [8, Cp]  per-cluster AABBs (padded never-hit)
    aabb2: jnp.ndarray  # [8, C2p] per-supercluster AABBs
    num_clusters: int = dataclasses.field(metadata=dict(static=True))
    num_super: int = dataclasses.field(metadata=dict(static=True))


def pack_clusters_hbm(tri_verts: jnp.ndarray) -> HbmClusters:
    pc = pack_clusters(tri_verts)
    c = pc.num_clusters
    c2 = (c + SC - 1) // SC
    cpad = c2 * SC - c

    planes = [
        pc.v0x, pc.v0y, pc.v0z,
        pc.e1x, pc.e1y, pc.e1z,
        pc.e2x, pc.e2y, pc.e2z,
    ]
    rows = jnp.stack(planes, axis=1)  # [C, 9, K]
    order = pc.order
    if cpad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((cpad, 9, K), jnp.float32)], axis=0
        )
        order = jnp.concatenate(
            [order, jnp.full((cpad, K), -1, jnp.int32)], axis=0
        )
    # pad the component dim 9 -> 16 so every DMA slice offset/size is a
    # sublane multiple of 8 (non-aligned slices fault the DMA engine)
    rows = jnp.concatenate(
        [rows, jnp.zeros((rows.shape[0], 7, K), jnp.float32)], axis=1
    )
    rows = rows.reshape(-1, K)  # [C*16, K]

    # cluster AABBs padded out to the supercluster multiple (never hit)
    need = c2 * SC
    cp_old = pc.aabb.shape[1]
    if cp_old < need:
        extra = jnp.full((8, need - cp_old), _BIG, jnp.float32)
        extra = extra.at[3:6].set(-_BIG)
        aabb = jnp.concatenate([pc.aabb, extra], axis=1)
    else:
        aabb = pc.aabb

    # supercluster AABBs: union over each SC-block of cluster AABBs
    mins = aabb[0:3, : c2 * SC].reshape(3, c2, SC).min(axis=2)
    maxs = aabb[3:6, : c2 * SC].reshape(3, c2, SC).max(axis=2)
    c2p = max(8, int(np.ceil(c2 / 8) * 8))
    aabb2 = jnp.full((8, c2p), _BIG, jnp.float32)
    aabb2 = aabb2.at[0:3, :c2].set(mins)
    aabb2 = aabb2.at[3:6, :c2].set(maxs)
    aabb2 = aabb2.at[3:6, c2:].set(-_BIG)

    return HbmClusters(
        rows=rows,
        order=order,
        aabb=aabb,
        aabb2=aabb2,
        num_clusters=c,
        num_super=c2,
    )


def _kernel(
    aabb_ref,  # SMEM [8, Cp]   per cluster
    aabb2_ref,  # SMEM [8, C2p] per supercluster
    rows_ref,  # ANY (HBM) [C2*SC*16, K]
    order_ref,  # VMEM [C2*SC, K] i32
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmin_ref, tmax_ref,
    t_out, prim_out, u_out, v_out,
    bt_ref, bp_ref, bu_ref, bv_ref,  # VMEM scratch [RT,1] best-hit state
    bt_max_ref,  # SMEM scalar: frustum far plane (max best-t over tile)
    buf_ref,  # VMEM [SC*16, K] supercluster staging
    sem_ref,  # DMA semaphore
    *, num_super: int, any_hit: bool,
):
    ox = ox_ref[:]  # [RT, 1]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]

    def inv(d):
        tiny = jnp.where(d >= 0.0, 1e-12, -1e-12)
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12, tiny, d)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (ox.shape[0], K), 1)

    bt_ref[:] = tmax + 0.0
    bp_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
    bu_ref[:] = jnp.zeros(ox.shape, jnp.float32)
    bv_ref[:] = jnp.zeros(ox.shape, jnp.float32)

    # ---- per-tile ray-bundle bounds for the scalar frustum pre-pass ----
    # A [RT,1]-shaped slab test costs ~0.7 us PER BOX even when it fails
    # (the lane dim pads to 128), which puts a hard ceiling on big scenes
    # (95 superclusters = ~65 us/tile just in rejections). These scalars
    # let each box be rejected in ~60 true scalar-unit ops; the precise
    # vector test runs only for frustum passers. Interval arithmetic is
    # conservative: mixed-sign direction tiles make the frustum infinite
    # (always pass), never skip a reachable box.
    o_lo = (jnp.min(ox), jnp.min(oy), jnp.min(oz))
    o_hi = (jnp.max(ox), jnp.max(oy), jnp.max(oz))
    i_lo = (jnp.min(ix), jnp.min(iy), jnp.min(iz))
    i_hi = (jnp.max(ix), jnp.max(iy), jnp.max(iz))
    tmin_lo = jnp.min(tmin)
    bt_max_ref[0] = jnp.max(tmax)

    def frustum_need(box_ref, idx):
        """Scalar conservative bundle-vs-AABB test."""
        t_enter = tmin_lo
        t_exit = bt_max_ref[0]
        for ax in range(3):
            mn = box_ref[ax, idx]
            mx = box_ref[3 + ax, idx]
            c0 = mn - o_hi[ax]
            c1 = mn - o_lo[ax]
            d0 = mx - o_hi[ax]
            d1 = mx - o_lo[ax]
            il, ih = i_lo[ax], i_hi[ax]
            p = (c0 * il, c0 * ih, c1 * il, c1 * ih,
                 d0 * il, d0 * ih, d1 * il, d1 * ih)
            lo8 = jnp.minimum(
                jnp.minimum(jnp.minimum(p[0], p[1]), jnp.minimum(p[2], p[3])),
                jnp.minimum(jnp.minimum(p[4], p[5]), jnp.minimum(p[6], p[7])),
            )
            hi8 = jnp.maximum(
                jnp.maximum(jnp.maximum(p[0], p[1]), jnp.maximum(p[2], p[3])),
                jnp.maximum(jnp.maximum(p[4], p[5]), jnp.maximum(p[6], p[7])),
            )
            t_enter = jnp.maximum(t_enter, lo8)
            t_exit = jnp.minimum(t_exit, hi8)
        return t_enter <= t_exit

    def slab_need(box_ref, idx, best_t):
        mnx = box_ref[0, idx]
        mny = box_ref[1, idx]
        mnz = box_ref[2, idx]
        mxx = box_ref[3, idx]
        mxy = box_ref[4, idx]
        mxz = box_ref[5, idx]
        t1x = (mnx - ox) * ix
        t2x = (mxx - ox) * ix
        t1y = (mny - oy) * iy
        t2y = (mxy - oy) * iy
        t1z = (mnz - oz) * iz
        t2z = (mxz - oz) * iz
        tlo = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.maximum(jnp.minimum(t1z, t2z), tmin),
        )
        thi = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.minimum(jnp.maximum(t1z, t2z), jnp.minimum(tmax, best_t)),
        )
        return jnp.any(tlo <= thi)

    def body(c2, carry):
        need2_f = frustum_need(aabb2_ref, c2)
        if any_hit:
            need2_f = need2_f & ~jnp.all(bp_ref[:] >= 0)

        @pl.when(need2_f)
        def _():
            need2 = slab_need(aabb2_ref, c2, bt_ref[:])
            if any_hit:
                need2 = need2 & ~jnp.all(bp_ref[:] >= 0)

            @pl.when(need2)
            def _():
                _taken(c2)

        return carry

    def _taken(c2):
            dma = pltpu.make_async_copy(
                rows_ref.at[pl.ds(c2 * SC * 16, SC * 16)], buf_ref, sem_ref
            )
            dma.start()
            dma.wait()

            for j in range(SC):
                need = frustum_need(aabb_ref, c2 * SC + j)

                @pl.when(need)
                def _(j=j):
                    _cluster(c2, j)

            # refresh the frustum's scalar far plane only after taken
            # superclusters (a [RT,1] max per rejected box would defeat
            # the point of the scalar pre-pass)
            bt_max_ref[0] = jnp.max(bt_ref[:])

    def _cluster(c2, j):
                need = slab_need(aabb_ref, c2 * SC + j, bt_ref[:])

                @pl.when(need)
                def _(j=j):
                    best_t_j = bt_ref[:]
                    b = j * 16
                    v0xr = buf_ref[b + 0 : b + 1, :]
                    v0yr = buf_ref[b + 1 : b + 2, :]
                    v0zr = buf_ref[b + 2 : b + 3, :]
                    e1xr = buf_ref[b + 3 : b + 4, :]
                    e1yr = buf_ref[b + 4 : b + 5, :]
                    e1zr = buf_ref[b + 5 : b + 6, :]
                    e2xr = buf_ref[b + 6 : b + 7, :]
                    e2yr = buf_ref[b + 7 : b + 8, :]
                    e2zr = buf_ref[b + 8 : b + 9, :]
                    ordr = order_ref[pl.ds(c2 * SC + j, 1), :]

                    pvx = dy * e2zr - dz * e2yr
                    pvy = dz * e2xr - dx * e2zr
                    pvz = dx * e2yr - dy * e2xr
                    det = e1xr * pvx + e1yr * pvy + e1zr * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tvx = ox - v0xr
                    tvy = oy - v0yr
                    tvz = oz - v0zr
                    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1zr - tvz * e1yr
                    qvy = tvz * e1xr - tvx * e1zr
                    qvz = tvx * e1yr - tvy * e1xr
                    vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                    tt = (e2xr * qvx + e2yr * qvy + e2zr * qvz) * inv_det
                    ok = (
                        (jnp.abs(det) > 1e-12)
                        & (uu >= 0.0)
                        & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (tt > tmin)
                        & (tt < best_t_j)
                        & (ordr >= 0)
                    )
                    tt = jnp.where(ok, tt, _BIG)
                    bt_k = jnp.min(tt, axis=1, keepdims=True)
                    hit_any = bt_k < best_t_j
                    # integer argmin: a float equality against the reduced
                    # min can miss on TPU (reduction vs elementwise rounding)
                    k_best = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                    pick = k_iota == k_best
                    prim_k = jnp.sum(
                        jnp.where(pick, ordr, 0), axis=1, keepdims=True
                    )
                    u_k = jnp.sum(jnp.where(pick, uu, 0.0), axis=1, keepdims=True)
                    v_k = jnp.sum(jnp.where(pick, vv, 0.0), axis=1, keepdims=True)
                    bt_ref[:] = jnp.where(hit_any, bt_k, best_t_j)
                    bp_ref[:] = jnp.where(hit_any, prim_k, bp_ref[:])
                    bu_ref[:] = jnp.where(hit_any, u_k, bu_ref[:])
                    bv_ref[:] = jnp.where(hit_any, v_k, bv_ref[:])

    jax.lax.fori_loop(0, num_super, body, 0)

    t_out[:] = bt_ref[:]
    prim_out[:] = bp_ref[:]
    u_out[:] = bu_ref[:]
    v_out[:] = bv_ref[:]


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def intersect_pallas_hbm(hc: HbmClusters, ray_o, ray_d, tmin, tmax=TMAX_RAY,
                         any_hit: bool = False, interpret: bool = False):
    """Same contract as accel.bruteforce.intersect_bruteforce."""
    r = ray_o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))

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

    def cols(x):
        return x.reshape(rp, 1)

    ray_spec = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, num_super=hc.num_super, any_hit=any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
    ]
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem, smem, hbm, vmem] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),
            pltpu.VMEM((RAY_TILE, 1), jnp.int32),
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((SC * 16, K), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        hc.aabb,
        hc.aabb2,
        hc.rows,
        hc.order,
        cols(ray_o[:, 0]), cols(ray_o[:, 1]), cols(ray_o[:, 2]),
        cols(ray_d[:, 0]), cols(ray_d[:, 1]), cols(ray_d[:, 2]),
        cols(tmin), cols(tmax),
    )
    t = t.reshape(rp)[:r]
    prim = prim.reshape(rp)[:r]
    u = u.reshape(rp)[:r]
    v = v.reshape(rp)[:r]
    is_hit = prim >= 0
    return jnp.where(is_hit, t, jnp.inf), prim, u, v, is_hit


def make_pallas_hbm_intersector(hc: HbmClusters):
    def intersect_fn(tri_verts, ray_o, ray_d, tmin, tmax=TMAX_RAY):
        return intersect_pallas_hbm(hc, ray_o, ray_d, tmin, tmax)

    def occluded_fn(tri_verts, ray_o, ray_d, tmin, tmax):
        _, _, _, _, hit = intersect_pallas_hbm(
            hc, ray_o, ray_d, tmin, tmax, any_hit=True
        )
        return hit

    return intersect_fn, occluded_fn


def _expand_bits_np(v):
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def pack_clusters_hbm_np(tri_verts) -> HbmClusters:
    """Pure-numpy build (host): the jitted/eager jax builds pay compile or
    per-op dispatch costs on this platform; numpy does the whole thing in
    milliseconds and the arrays upload once."""
    tv = np.asarray(tri_verts, np.float32)
    t = tv.shape[0]
    centroids = tv.mean(axis=1)
    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)
    extent = np.maximum(hi - lo, 1e-12)
    q = np.clip((centroids - lo) / extent, 0.0, 1.0 - 1e-7)
    scaled = np.minimum((q * 1024).astype(np.uint32), np.uint32(1023))
    with np.errstate(over="ignore"):
        codes = (
            (_expand_bits_np(scaled[:, 0]) << np.uint32(2))
            | (_expand_bits_np(scaled[:, 1]) << np.uint32(1))
            | _expand_bits_np(scaled[:, 2])
        )
    order = np.argsort(codes, kind="stable").astype(np.int32)

    pad = (-t) % K
    c = (t + pad) // K
    c2 = (c + SC - 1) // SC
    ctot = c2 * SC

    order_p = np.full(ctot * K, -1, np.int32)
    order_p[:t] = order
    verts = np.zeros((ctot * K, 3, 3), np.float32)
    verts[:t] = tv[order]

    v0 = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]

    valid = (order_p >= 0).reshape(ctot, K)
    vmin = np.where(valid[..., None, None], verts.reshape(ctot, K, 3, 3), _BIG)
    vmax = np.where(valid[..., None, None], verts.reshape(ctot, K, 3, 3), -_BIG)
    amin = vmin.reshape(ctot, K * 3, 3).min(axis=1)
    amax = vmax.reshape(ctot, K * 3, 3).max(axis=1)

    aabb = np.empty((8, ctot), np.float32)
    aabb[0:3] = amin.T
    aabb[3:6] = amax.T
    aabb[6:8] = 0.0

    mins = aabb[0:3].reshape(3, c2, SC).min(axis=2)
    maxs = aabb[3:6].reshape(3, c2, SC).max(axis=2)
    c2p = max(8, int(np.ceil(c2 / 8) * 8))
    aabb2 = np.full((8, c2p), _BIG, np.float32)
    aabb2[0:3, :c2] = mins
    aabb2[3:6, :c2] = maxs
    aabb2[3:6, c2:] = -_BIG

    rows = np.zeros((ctot, 16, K), np.float32)
    comps = [v0[:, 0], v0[:, 1], v0[:, 2], e1[:, 0], e1[:, 1], e1[:, 2],
             e2[:, 0], e2[:, 1], e2[:, 2]]
    for i, comp in enumerate(comps):
        rows[:, i, :] = comp.reshape(ctot, K)
    rows = rows.reshape(-1, K)

    return HbmClusters(
        rows=jnp.asarray(rows),
        order=jnp.asarray(order_p.reshape(ctot, K)),
        aabb=jnp.asarray(aabb),
        aabb2=jnp.asarray(aabb2),
        num_clusters=c,
        num_super=c2,
    )

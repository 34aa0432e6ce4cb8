"""MXU-based two-level Pallas intersector.

ARCHIVE — measured dead, not routed in production (see BASELINE.md
round-2: 70.6 vs 62.7 ms; K=16-of-128 contraction padding x multipass
f32 x 4x DMA cancel the MXU rate). Kept as a tested ledger receipt; the
production kernel is accel/pallas_binned.py.

The VPU Möller-Trumbore in accel/pallas_cluster_hbm.py measures ~0.6
TFLOP/s effective — the elementwise cross/dot products don't feed the
systolic array at all. This kernel moves the four MT numerators onto the
MXU: for a ray with features

    F = [d, d x o', o', 1]           (o' recentered per supercluster)

and per-triangle 10-vectors

    g_det = [e2 x e1,   0,   0,   0]
    g_u   = [v0' x e2, -e2,  0,   0]
    g_v   = [-(v0' x e1), e1, 0,  0]
    g_t   = [0,          0,  n, -v0'.n]      (n = e1 x e2)

the numerators of (det, u*det, v*det, t*det) are exactly F @ G with
G = [16, 4K] precomputed per cluster on host (verified against classic MT
in tests). One [RAY_TILE,16] x [16,512] matmul per taken cluster replaces
~35 VPU ops/pair; the VPU keeps only the reciprocal + masks + min/argmin
epilogue. Recentering at the supercluster AABB center keeps f32 matmul
precision scene-scale-free.

Same two-level AABB/DMA structure as the HBM kernel (cluster K=128 tris,
supercluster SC=16 clusters, SMEM AABBs, per-supercluster DMA staging,
best-hit VMEM scratch under pl.when). Reference counterpart: the RT-core
BVH behind optixTrace (SURVEY.md §2.5); the MXU is the TPU's fixed-function
throughput unit, so this is the idiomatic mapping.
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
from henjou_tpu.accel.pallas_cluster_hbm import _expand_bits_np
from henjou_tpu.math.constants import TMAX_RAY

SC = 16  # clusters per supercluster (SC*K = 2048 triangles)
RAY_TILE = 256
NF = 16  # feature rows (10 used, padded to a sublane multiple)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MxuClusters:
    g_rows: jnp.ndarray  # [C2*SC*NF, 4K] f32 per-cluster G blocks
    order: jnp.ndarray  # [C2*SC, K] i32 original tri ids (-1 padding)
    aabb: jnp.ndarray  # [8, Cp]  per-cluster AABBs
    aabb2: jnp.ndarray  # [8, C2p] per-supercluster AABBs
    centers: jnp.ndarray  # [4, C2p] supercluster recenter points
    num_clusters: int = dataclasses.field(metadata=dict(static=True))
    num_super: int = dataclasses.field(metadata=dict(static=True))


def pack_clusters_mxu_np(tri_verts) -> MxuClusters:
    """Host-side pack (numpy; the jitted jax build miscompiles on this
    platform — see renderer.build): morton-order triangles into K-sized
    clusters, build AABB levels, precompute the per-cluster G matrices."""
    tv = np.asarray(tri_verts, np.float64)
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
    verts = np.zeros((ctot * K, 3, 3), np.float64)
    verts[:t] = tv[order]

    # cluster + supercluster AABBs
    valid = (order_p >= 0).reshape(ctot, K)
    vmin = np.where(valid[..., None, None], verts.reshape(ctot, K, 3, 3), _BIG)
    vmax = np.where(valid[..., None, None], verts.reshape(ctot, K, 3, 3), -_BIG)
    amin = vmin.reshape(ctot, K * 3, 3).min(axis=1)
    amax = vmax.reshape(ctot, K * 3, 3).max(axis=1)
    aabb = np.zeros((8, ctot), np.float32)
    aabb[0:3] = amin.T
    aabb[3:6] = amax.T

    mins = aabb[0:3].reshape(3, c2, SC).min(axis=2)
    maxs = aabb[3:6].reshape(3, c2, SC).max(axis=2)
    c2p = max(8, int(np.ceil(c2 / 8) * 8))
    aabb2 = np.full((8, c2p), _BIG, np.float32)
    aabb2[0:3, :c2] = mins
    aabb2[3:6, :c2] = maxs
    aabb2[3:6, c2:] = -_BIG

    # supercluster recenter points (midpoint of real geometry bounds)
    centers = np.zeros((4, c2p), np.float32)
    finite = np.isfinite(mins) & np.isfinite(maxs) & (mins < _BIG / 2)
    centers[0:3, :c2] = np.where(finite, 0.5 * (mins + maxs), 0.0)

    # ---- G matrices, recentered per supercluster ----
    v0 = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    n = np.cross(e1, e2)
    csc = centers[0:3].T.astype(np.float64)  # [c2p, 3]
    v0p = v0 - np.repeat(csc[:c2], SC * K, axis=0)

    g = np.zeros((ctot * K, NF, 4), np.float64)
    g[:, 0:3, 0] = np.cross(e2, e1)
    g[:, 0:3, 1] = np.cross(v0p, e2)
    g[:, 3:6, 1] = -e2
    g[:, 0:3, 2] = -np.cross(v0p, e1)
    g[:, 3:6, 2] = e1
    g[:, 6:9, 3] = n
    g[:, 9, 3] = -np.einsum("ij,ij->i", v0p, n)

    # [ctot, K, NF, 4] -> [ctot, NF, 4, K] -> rows [ctot*NF, 4K], columns
    # grouped [det(K) | u(K) | v(K) | t(K)]
    g = g.reshape(ctot, K, NF, 4).transpose(0, 2, 3, 1)
    g_rows = np.ascontiguousarray(
        g.reshape(ctot, NF, 4 * K).reshape(ctot * NF, 4 * K), dtype=np.float32
    )

    return MxuClusters(
        g_rows=jnp.asarray(g_rows),
        order=jnp.asarray(order_p.reshape(ctot, K)),
        aabb=jnp.asarray(aabb),
        aabb2=jnp.asarray(aabb2),
        centers=jnp.asarray(centers),
        num_clusters=c,
        num_super=c2,
    )


def _kernel(
    aabb_ref,  # SMEM [8, Cp]
    aabb2_ref,  # SMEM [8, C2p]
    centers_ref,  # SMEM [4, C2p]
    g_hbm,  # ANY (HBM) [C2*SC*NF, 4K]
    order_ref,  # VMEM [C2*SC, K] i32
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmin_ref, tmax_ref,
    t_out, prim_out, u_out, v_out,
    bt_ref, bp_ref, bu_ref, bv_ref,  # VMEM scratch [RT,1] best-hit state
    buf_ref,  # VMEM [SC*NF, 4K] supercluster G staging
    sem_ref,
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
    rt = ox.shape[0]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (rt, K), 1)
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (rt, NF), 1)

    bt_ref[:] = tmax + 0.0
    bp_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
    bu_ref[:] = jnp.zeros(ox.shape, jnp.float32)
    bv_ref[:] = jnp.zeros(ox.shape, jnp.float32)

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
        need2 = slab_need(aabb2_ref, c2, bt_ref[:])
        if any_hit:
            need2 = need2 & ~jnp.all(bp_ref[:] >= 0)

        @pl.when(need2)
        def _():
            dma = pltpu.make_async_copy(
                g_hbm.at[pl.ds(c2 * SC * NF, SC * NF)], buf_ref, sem_ref
            )
            dma.start()

            # ray features vs this supercluster's recenter point:
            # F = [d, d x o', o', 1, 0...]  ([RT, NF], built via iota select)
            cx = centers_ref[0, c2]
            cy = centers_ref[1, c2]
            cz = centers_ref[2, c2]
            opx = ox - cx
            opy = oy - cy
            opz = oz - cz
            mx = dy * opz - dz * opy
            my = dz * opx - dx * opz
            mz = dx * opy - dy * opx
            feats = (dx, dy, dz, mx, my, mz, opx, opy, opz)
            f = jnp.where(f_iota == 9, 1.0, 0.0)
            for slot, val in enumerate(feats):
                f = f + jnp.where(f_iota == slot, val, 0.0)

            dma.wait()

            for j in range(SC):
                need = slab_need(aabb_ref, c2 * SC + j, bt_ref[:])

                @pl.when(need)
                def _(j=j):
                    best_t_j = bt_ref[:]
                    gj = buf_ref[pl.ds(j * NF, NF), :]  # [NF, 4K]
                    out = jax.lax.dot_general(
                        f, gj,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [RT, 4K]
                    det = out[:, 0:K]
                    u_num = out[:, K : 2 * K]
                    v_num = out[:, 2 * K : 3 * K]
                    t_num = out[:, 3 * K : 4 * K]
                    ordr = order_ref[pl.ds(c2 * SC + j, 1), :]

                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    uu = u_num * inv_det
                    vv = v_num * inv_det
                    tt = t_num * inv_det
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

        return carry

    jax.lax.fori_loop(0, num_super, body, 0)

    t_out[:] = bt_ref[:]
    prim_out[:] = bp_ref[:]
    u_out[:] = bu_ref[:]
    v_out[:] = bv_ref[:]


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def intersect_pallas_mxu(mc: MxuClusters, ray_o, ray_d, tmin, tmax=TMAX_RAY,
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

    kernel = functools.partial(_kernel, num_super=mc.num_super, any_hit=any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
    ]
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem, smem, smem, hbm, vmem] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),
            pltpu.VMEM((RAY_TILE, 1), jnp.int32),
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),
            pltpu.VMEM((SC * NF, 4 * K), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        mc.aabb,
        mc.aabb2,
        mc.centers,
        mc.g_rows,
        mc.order,
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


def make_pallas_mxu_intersector(mc: MxuClusters):
    def intersect_fn(tri_verts, ray_o, ray_d, tmin, tmax=TMAX_RAY):
        return intersect_pallas_mxu(mc, ray_o, ray_d, tmin, tmax)

    def occluded_fn(tri_verts, ray_o, ray_d, tmin, tmax):
        _, _, _, _, hit = intersect_pallas_mxu(
            mc, ray_o, ray_d, tmin, tmax, any_hit=True
        )
        return hit

    return intersect_fn, occluded_fn

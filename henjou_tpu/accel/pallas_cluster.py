"""Pallas TPU kernel: fused packet/cluster ray intersection.

ARCHIVE — superseded generation (round 1), not routed in production.
Still imported for its K/_BIG constants and exercised by slow-lane
parity tests; the production kernel is accel/pallas_binned.py.

The hot op of the renderer (the optixTrace analogue) as a single fused
TPU kernel. The XLA-level cluster scan (accel/cluster.py) pays an HBM
round-trip per round; here the whole cluster set lives on-chip and a ray
tile does everything in VMEM.

Layout (chosen around Mosaic's rules: dynamic vector indexing only on the
sublane dim; minor dim lane-padded to 128):
- cluster AABBs in SMEM [8, Cp]: six scalar loads per cluster with a
  dynamic index — the skip test is pure scalar+[RT,1] vector math;
- triangle component planes [C, K] f32 in VMEM: cluster c is the row
  slice [1, K] (dynamic on sublanes, zero padding waste since K == 128);
- rays on SUBLANES [RT, 1]: Möller-Trumbore evaluates the outer product
  [RT, K] — a perfectly tiled VPU block. No per-lane gathers anywhere —
  the thing TPUs cannot do fast.
- a cluster is skipped (lax.cond on a scalar) unless some lane in the
  tile still needs it (slab tnear < that lane's best-so-far). Coherent
  camera/shadow tiles skip most clusters; incoherent bounce tiles
  degrade gracefully toward dense testing.

Falls back to LBVH traversal when the scene exceeds the VMEM budget.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from henjou_tpu.accel.lbvh import morton_codes
from henjou_tpu.math.constants import TMAX_RAY

K = 128  # triangles per cluster == VPU lane width
RAY_TILE = 512
_BIG = 3.0e38  # python float: jnp scalars would be captured consts


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedClusters:
    """SoA planes [C, K]; AABB [8, Cp] (rows 0-2 min xyz, 3-5 max xyz)."""

    v0x: jnp.ndarray
    v0y: jnp.ndarray
    v0z: jnp.ndarray
    e1x: jnp.ndarray
    e1y: jnp.ndarray
    e1z: jnp.ndarray
    e2x: jnp.ndarray
    e2y: jnp.ndarray
    e2z: jnp.ndarray
    order: jnp.ndarray  # [C,K] i32, -1 padding
    aabb: jnp.ndarray  # [8, Cp]
    num_clusters: int = dataclasses.field(metadata=dict(static=True))

    @property
    def vmem_bytes(self) -> int:
        return 10 * self.order.size * 4 + self.aabb.size * 4


def pack_clusters(tri_verts: jnp.ndarray) -> PackedClusters:
    """Morton-sort and pack triangles into K-wide clusters. Jittable."""
    t = tri_verts.shape[0]
    centroids = jnp.mean(tri_verts, axis=1)
    lo = jnp.min(tri_verts.reshape(-1, 3), axis=0)
    hi = jnp.max(tri_verts.reshape(-1, 3), axis=0)
    codes = morton_codes(centroids, lo, hi)
    order = jnp.argsort(codes).astype(jnp.int32)

    pad = (-t) % K
    c = (t + pad) // K
    order_p = jnp.concatenate([order, jnp.full((pad,), -1, jnp.int32)])
    verts = jnp.concatenate(
        [tri_verts[order], jnp.zeros((pad, 3, 3), tri_verts.dtype)], axis=0
    )
    v0 = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]

    valid = (order_p >= 0).reshape(c, K)
    vmin = jnp.where(valid[..., None, None], verts.reshape(c, K, 3, 3), _BIG)
    vmax = jnp.where(valid[..., None, None], verts.reshape(c, K, 3, 3), -_BIG)
    amin = vmin.reshape(c, K * 3, 3).min(axis=1)
    amax = vmax.reshape(c, K * 3, 3).max(axis=1)

    cp = max(8, int(np.ceil(c / 8) * 8))
    aabb = jnp.full((8, cp), _BIG, jnp.float32)
    aabb = aabb.at[0:3, :c].set(amin.T)
    aabb = aabb.at[3:6, :c].set(amax.T)
    aabb = aabb.at[3:6, c:].set(-_BIG)  # padded clusters never hit

    def plane(x):
        return x.reshape(c, K)

    return PackedClusters(
        v0x=plane(v0[:, 0]), v0y=plane(v0[:, 1]), v0z=plane(v0[:, 2]),
        e1x=plane(e1[:, 0]), e1y=plane(e1[:, 1]), e1z=plane(e1[:, 2]),
        e2x=plane(e2[:, 0]), e2y=plane(e2[:, 1]), e2z=plane(e2[:, 2]),
        order=plane(order_p),
        aabb=aabb,
        num_clusters=c,
    )


def _kernel(
    aabb_ref,  # SMEM [8, Cp]
    v0x_ref, v0y_ref, v0z_ref,
    e1x_ref, e1y_ref, e1z_ref,
    e2x_ref, e2y_ref, e2z_ref,
    order_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmin_ref, tmax_ref,
    t_out, prim_out, u_out, v_out,
    *, num_clusters: int, any_hit: bool,
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

    def body(c, carry):
        best_t, best_prim, best_u, best_v = carry  # [RT,1] each

        # scalar AABB loads + slab test on [RT,1] vectors
        mnx = aabb_ref[0, c]
        mny = aabb_ref[1, c]
        mnz = aabb_ref[2, c]
        mxx = aabb_ref[3, c]
        mxy = aabb_ref[4, c]
        mxz = aabb_ref[5, c]
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
        need = jnp.any(tlo <= thi)
        if any_hit:
            need = need & ~jnp.all(best_prim >= 0)

        def taken(_):
            s = pl.ds(c, 1)
            v0xr = v0x_ref[s, :]  # [1,K]
            v0yr = v0y_ref[s, :]
            v0zr = v0z_ref[s, :]
            e1xr = e1x_ref[s, :]
            e1yr = e1y_ref[s, :]
            e1zr = e1z_ref[s, :]
            e2xr = e2x_ref[s, :]
            e2yr = e2y_ref[s, :]
            e2zr = e2z_ref[s, :]
            ordr = order_ref[s, :]  # [1,K]

            # Möller-Trumbore over the [RT, K] outer block
            pvx = dy * e2zr - dz * e2yr  # [RT,1]*[1,K] -> [RT,K]
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
                & (tt < best_t)
                & (ordr >= 0)
            )
            tt = jnp.where(ok, tt, _BIG)
            bt_k = jnp.min(tt, axis=1, keepdims=True)  # [RT,1]
            hit_any = bt_k < best_t
            # integer argmin: float equality against the reduced min can
            # miss on TPU (reduction vs elementwise rounding)
            k_best = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
            pick = k_iota == k_best
            prim_k = jnp.sum(jnp.where(pick, ordr, 0), axis=1, keepdims=True)
            u_k = jnp.sum(jnp.where(pick, uu, 0.0), axis=1, keepdims=True)
            v_k = jnp.sum(jnp.where(pick, vv, 0.0), axis=1, keepdims=True)
            return (
                jnp.where(hit_any, bt_k, best_t),
                jnp.where(hit_any, prim_k, best_prim),
                jnp.where(hit_any, u_k, best_u),
                jnp.where(hit_any, v_k, best_v),
            )

        return jax.lax.cond(need, taken, lambda _: carry, None)

    init = (
        tmax + 0.0,
        jnp.full(ox.shape, -1, jnp.int32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
    )
    best_t, best_prim, best_u, best_v = jax.lax.fori_loop(
        0, num_clusters, body, init
    )
    t_out[:] = best_t
    prim_out[:] = best_prim
    u_out[:] = best_u
    v_out[:] = best_v


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def intersect_pallas(pc: PackedClusters, ray_o, ray_d, tmin, tmax=TMAX_RAY,
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
        tmax = jnp.concatenate([tmax, zpad])  # tmax 0 -> instant miss
    rp = r + pad
    grid = rp // RAY_TILE

    def cols(x):  # [rp] -> [rp, 1] (rays on sublanes)
        return x.reshape(rp, 1)

    ray_spec = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    kernel = functools.partial(_kernel, num_clusters=pc.num_clusters, any_hit=any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((rp, 1), jnp.float32),
    ]
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem] + [vmem] * 10 + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(
        pc.aabb,
        pc.v0x, pc.v0y, pc.v0z,
        pc.e1x, pc.e1y, pc.e1z,
        pc.e2x, pc.e2y, pc.e2z,
        pc.order,
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


def make_pallas_intersector(pc: PackedClusters):
    def intersect_fn(tri_verts, ray_o, ray_d, tmin, tmax=TMAX_RAY):
        return intersect_pallas(pc, ray_o, ray_d, tmin, tmax)

    def occluded_fn(tri_verts, ray_o, ray_d, tmin, tmax):
        _, _, _, _, hit = intersect_pallas(pc, ray_o, ray_d, tmin, tmax, any_hit=True)
        return hit

    return intersect_fn, occluded_fn

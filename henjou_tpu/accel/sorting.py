"""Bounce-ray sorting: group coherent rays into the same kernel tile.

The packet/cluster kernels cull per RAY TILE (a supercluster is skipped
only if NO lane in the 256-ray tile can reach it), so incoherent bounce
packets pay for nearly every cluster (measured: 66.7 vs 33.9 ms for
random vs camera rays on the gallery). Sorting rays by (direction octant,
origin morton) before the kernel makes tiles compact in ray space, so the
per-tile AABB tests actually cull; results are scattered back through the
inverse permutation, so the wrapper is estimator-invisible.

Cost: one 24-bit key sort + ~9 permutation gathers (~6 ms per 64k rays);
pays for itself once the scene has enough superclusters for tiles to
skip. The renderer enables it from NUM_SUPER_THRESHOLD up.

Reference counterpart: none — the RT cores hide incoherence in hardware;
this is the TPU-native substitute (SURVEY.md §7 hard part #1 mitigation).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Sorting pays for every cluster-kernel scene: even at 2 superclusters the
# CLUSTER-level frustum rejection inside sorted tiles measured 1.7x on the
# gallery (3.15 vs 1.86 Mrays/s); at 95 superclusters it measured 1.5x.
NUM_SUPER_THRESHOLD = 1


def _part1by2(x):
    """Spread bits of an 8-bit int over every 3rd bit (vectorized)."""
    x = x & 0xFF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_key(ray_o, ray_d, lo, inv_extent):
    """24-bit sort key: 3-bit direction octant (major) over an 18-bit
    origin morton code (6 bits/axis). All integer ops — no division."""
    octant = (
        (ray_d[:, 0] >= 0).astype(jnp.int32)
        | ((ray_d[:, 1] >= 0).astype(jnp.int32) << 1)
        | ((ray_d[:, 2] >= 0).astype(jnp.int32) << 2)
    )
    q = jnp.clip((ray_o - lo) * inv_extent, 0.0, 1.0 - 1e-7)
    qi = (q * 64.0).astype(jnp.int32)  # 6 bits per axis
    morton = (
        (_part1by2(qi[:, 0]) << 2)
        | (_part1by2(qi[:, 1]) << 1)
        | _part1by2(qi[:, 2])
    )
    return (octant << 18) | morton


def make_sorted_intersector(intersect_fn, occluded_fn, lo, hi):
    """Wrap an (intersect_fn, occluded_fn) pair so rays are sorted into
    coherent tiles before the kernel and results unsorted after.
    lo/hi: scene AABB corners (host values or traced arrays)."""
    lo_j = jnp.asarray(lo, jnp.float32)
    inv_extent = 1.0 / jnp.maximum(jnp.asarray(hi, jnp.float32) - lo_j, 1e-12)

    def _sorted(fn, n_out):
        def wrapped(tri, ray_o, ray_d, tmin, tmax):
            r = ray_o.shape[0]
            tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
            tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
            key = ray_sort_key(ray_o, ray_d, lo_j, inv_extent)
            perm = jnp.argsort(key)
            out = fn(
                tri, ray_o[perm], ray_d[perm], tmin_b[perm], tmax_b[perm]
            )
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(r, dtype=perm.dtype)
            )
            if n_out == 1:
                return out[inv]
            return tuple(x[inv] for x in out)

        return wrapped

    return _sorted(intersect_fn, 5), _sorted(occluded_fn, 1)


def make_bitonic_sorted_intersector(intersect_fn, occluded_fn, lo, hi):
    """Like `make_sorted_intersector`, but the permutation work rides a
    fused Pallas bitonic network (accel/bitonic.py) instead of
    argsort+gathers (~2.7 ms vs ~9 ms per 64k-ray trace), and DEAD lanes
    (tmax <= tmin) sort to the end — their tiles become all-dead and the
    binned kernel's prepass skips them outright, so kernel time scales
    with live occupancy. Falls back to the argsort wrapper for ray counts
    the network can't take (must be a power-of-two multiple of 1024)."""
    import jax

    from henjou_tpu.accel.bitonic import bitonic_sort

    lo_j = jnp.asarray(lo, jnp.float32)
    inv_extent = 1.0 / jnp.maximum(jnp.asarray(hi, jnp.float32) - lo_j, 1e-12)
    fallback_i, fallback_o = make_sorted_intersector(
        intersect_fn, occluded_fn, lo, hi
    )
    DEAD_KEY = jnp.int32((1 << 30) - 1)

    def _sorted(fn, n_out, fallback):
        def wrapped(tri, ray_o, ray_d, tmin, tmax):
            r = ray_o.shape[0]
            if r % 1024 != 0 or (r & (r - 1)) != 0:
                return fallback(tri, ray_o, ray_d, tmin, tmax)
            interp = jax.default_backend() == "cpu"
            tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
            tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
            key = ray_sort_key(ray_o, ray_d, lo_j, inv_extent)
            key = jnp.where(tmax_b > tmin_b, key, DEAD_KEY)
            lane = jnp.arange(r, dtype=jnp.int32)
            # a scalar tmin is permutation-invariant: don't pay a sort plane
            scalar_tmin = jnp.ndim(tmin) == 0
            planes = (
                ray_o[:, 0], ray_o[:, 1], ray_o[:, 2],
                ray_d[:, 0], ray_d[:, 1], ray_d[:, 2],
            )
            if scalar_tmin:
                (_, ox, oy, oz, dx, dy, dz, tx, lid) = bitonic_sort(
                    key, *planes, tmax_b, lane, interpret=interp
                )
                tn = tmin_b
            else:
                (_, ox, oy, oz, dx, dy, dz, tn, tx, lid) = bitonic_sort(
                    key, *planes, tmin_b, tmax_b, lane, interpret=interp
                )
            out = fn(
                tri, jnp.stack([ox, oy, oz], axis=1),
                jnp.stack([dx, dy, dz], axis=1), tn, tx,
            )
            if n_out == 1:
                _, res = bitonic_sort(
                    lid, out.astype(jnp.int32), interpret=interp
                )
                return res != 0
            t, prim, u, v, _ = out
            _, t, prim, u, v = bitonic_sort(
                lid, t, prim, u, v, interpret=interp
            )
            return t, prim, u, v, prim >= 0

        return wrapped

    return (
        _sorted(intersect_fn, 5, fallback_i),
        _sorted(occluded_fn, 1, fallback_o),
    )

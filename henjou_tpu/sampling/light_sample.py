"""Area-light sampling (reference: include/kernel/light_sample.h).

Uniform pick over the emissive-triangle list, then a uniform barycentric
point sample; pdf = 1/(area * N_lights) (light_sample.h:40,69-70).

The reference recovers the owning instance with a binary search of
prim_offsets (light_sample.h:26-42) and applies the instance transform to
object-space vertices. Here the FrameScene already holds *world-space*
triangles indexed by global prim id (the per-frame flatten), so the gather
replaces both the search and the transform — same result, one memory op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from henjou_tpu.math.vec import cross, length, normalize
from henjou_tpu.sampling.cmj import CMJState, cmj_1d, cmj_2d
from henjou_tpu.scene.scenedata import FrameScene


def sample_light(frame: FrameScene, state: CMJState):
    """Returns (position[R,3], normal[R,3], emission[R,3], pdf[R], valid[R],
    state). valid=False when the scene has no emissive triangles
    (light_sample.h:12-16 pdf=-1 guard, made explicit)."""
    dev = frame.device
    count = jnp.asarray(dev.num_lights, jnp.float32)

    p, state = cmj_1d(state)
    idx = (p * count).astype(jnp.int32)
    idx = jnp.clip(idx, 0, jnp.maximum(dev.num_lights - 1, 0))

    r = idx.shape[0]
    n_l = int(dev.light_prim_ids.shape[0])
    if 0 < n_l <= 512:
        # few lights: replace three per-lane row gathers (~1 ms each at
        # 64k lanes — TPU gathers are latency-bound row walks) with one
        # one-hot matmul that rides the MXU. The light table itself is
        # gathered once ([n_l] rows, loop-invariant — XLA hoists it).
        lp = dev.light_prim_ids
        table = jnp.concatenate(
            [
                frame.tri_verts[lp].reshape(n_l, 9),
                frame.tri_normals[lp].reshape(n_l, 9),
                dev.light_prim_emission.reshape(n_l, 3),
            ],
            axis=1,
        )  # [n_l, 21]
        onehot = (
            idx[:, None] == jnp.arange(n_l, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        # precision=highest: the MXU's default bf16 pass would quantize
        # the selected light vertices (visible banding on Cornell walls)
        g = jnp.matmul(onehot, table, precision=jax.lax.Precision.HIGHEST)
        v = g[:, 0:9].reshape(r, 3, 3)
        n = g[:, 9:18].reshape(r, 3, 3)
        emission = g[:, 18:21]
    else:
        prim = dev.light_prim_ids[idx]
        v = frame.tri_verts[prim]  # [R,3,3] world
        n = frame.tri_normals[prim]
        emission = dev.light_prim_emission[idx]

    xi, state = cmj_2d(state)
    sq = jnp.sqrt(xi[..., 0])
    f1 = (1.0 - sq)[..., None]
    f2 = (sq * (1.0 - xi[..., 1]))[..., None]
    f3 = (sq * xi[..., 1])[..., None]

    position = v[:, 0] * f1 + v[:, 1] * f2 + v[:, 2] * f3
    normal = normalize(n[:, 0] * f1 + n[:, 1] * f2 + n[:, 2] * f3)

    area = 0.5 * length(cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]))
    select_pdf = 1.0 / jnp.maximum(count, 1.0)
    pdf = select_pdf / jnp.maximum(area, 1e-12)

    valid = jnp.broadcast_to(count > 0.5, pdf.shape)
    return position, normal, emission, pdf, valid, state


def light_pdf(frame: FrameScene, prim: jnp.ndarray) -> jnp.ndarray:
    """Reverse pdf for MIS (getLightPDF, light_sample.h:77-92): the area pdf
    of having light-sampled the triangle actually hit by a BSDF ray."""
    dev = frame.device
    count = jnp.asarray(dev.num_lights, jnp.float32)
    # gather ONE precomputed area per lane instead of nine vertex floats;
    # the [T] area table is loop-invariant (XLA hoists it out of the
    # bounce loop)
    tv = frame.tri_verts
    areas = 0.5 * length(cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]))
    area = areas[jnp.maximum(prim, 0)]
    return 1.0 / jnp.maximum(area * count, 1e-12)

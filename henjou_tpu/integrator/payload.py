"""Surface-hit payload: the wavefront analogue of the reference Payload.

The reference passes a 38-field Payload struct by pointer through OptiX
payload registers (include/kernel/Payload.h:12-42) and fills it in
__closesthit__ch from SBT material records + texture fetches. Here the
payload is a plain pytree of [R]-batched arrays, and `closest_hit` is a
fused trace+shade-fetch stage: intersect, gather triangle attributes,
interpolate, and gather the material row — XLA's analogue of the SBT record
fetch (renderer.h:655-723).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from henjou_tpu.accel.bruteforce import intersect_bruteforce, occluded_bruteforce
from henjou_tpu.math.constants import EPS_RAY, TMAX_RAY
from henjou_tpu.math.vec import normalize
from henjou_tpu.scene.scenedata import FrameScene


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Sky:
    """Environment light (reference setSky, renderer.h:802-851): either an
    equirect HDR map or a 1x1 constant-color fallback; both scaled by
    ibl_intensity at miss time. `use_ibl` is static (selects the traced
    branch, like the reference binding either texture kind)."""

    constant_color: jnp.ndarray  # [3]
    intensity: jnp.ndarray  # scalar
    use_ibl: bool = dataclasses.field(default=False, metadata=dict(static=True))
    ibl_texture: Optional[jnp.ndarray] = None  # [H,W,3] f32, equirect


class SurfaceHit(NamedTuple):
    """reference: include/kernel/Payload.h:12-42, batched over rays."""

    is_hit: jnp.ndarray  # [R] bool
    t: jnp.ndarray  # [R]
    position: jnp.ndarray  # [R,3] world
    normal: jnp.ndarray  # [R,3] world shading normal
    vert_color: jnp.ndarray  # [R,3]
    texcoord: jnp.ndarray  # [R,2]
    material_id: jnp.ndarray  # [R] i32
    basecolor: jnp.ndarray  # [R,3]
    metallic: jnp.ndarray  # [R]
    roughness: jnp.ndarray  # [R]
    subsurface: jnp.ndarray  # [R]
    sheen: jnp.ndarray  # [R]
    clearcoat: jnp.ndarray  # [R]
    ior: jnp.ndarray  # [R]
    transmission: jnp.ndarray  # [R]
    is_specular: jnp.ndarray  # [R] bool
    emission: jnp.ndarray  # [R,3]
    is_light: jnp.ndarray  # [R] bool
    is_thinfilm: jnp.ndarray  # [R] bool
    primitive_id: jnp.ndarray  # [R] i32 (global instanced tri id)
    instance_id: jnp.ndarray  # [R] i32


def eval_sky(sky: Sky, ray_d: jnp.ndarray) -> jnp.ndarray:
    """Miss-program emission (__miss__ms reconstruction, SURVEY.md §0):
    equirect IBL lookup or constant color, times intensity."""
    if sky.use_ibl and sky.ibl_texture is not None:
        from henjou_tpu.texture.ibl import sample_equirect

        col = sample_equirect(sky.ibl_texture, ray_d)
    else:
        col = jnp.broadcast_to(sky.constant_color, ray_d.shape)
    return col * sky.intensity


def closest_hit(
    frame: FrameScene,
    sky: Sky,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    tmin=EPS_RAY,
    tmax=TMAX_RAY,
    intersect_fn=None,
) -> SurfaceHit:
    """Trace + payload fill for a ray batch.

    `intersect_fn(tri_verts, o, d, tmin, tmax)` defaults to brute force and
    is swappable for the LBVH traversal (same contract)."""
    dev = frame.device
    if intersect_fn is None:
        intersect_fn = intersect_bruteforce
    hit_t, prim, u, v, is_hit = intersect_fn(frame.tri_verts, ray_o, ray_d, tmin, tmax)

    prim_safe = jnp.maximum(prim, 0)
    vidx = dev.tri_vidx[prim_safe]  # [R,3]
    w0 = (1.0 - u - v)[:, None]
    w1 = u[:, None]
    w2 = v[:, None]

    n_tri = frame.tri_normals[prim_safe]  # [R,3,3] world space
    normal = normalize(n_tri[:, 0] * w0 + n_tri[:, 1] * w1 + n_tri[:, 2] * w2)

    texcoord = (
        dev.texcoords[vidx[:, 0]] * w0
        + dev.texcoords[vidx[:, 1]] * w1
        + dev.texcoords[vidx[:, 2]] * w2
    )
    vert_color = (
        dev.colors[vidx[:, 0]] * w0
        + dev.colors[vidx[:, 1]] * w1
        + dev.colors[vidx[:, 2]] * w2
    )

    t_for_pos = jnp.where(is_hit, hit_t, 0.0)
    position = ray_o + t_for_pos[:, None] * ray_d

    mat_id = dev.tri_material[prim_safe].astype(jnp.int32)
    m = dev.materials

    # material texture fetches (the reconstructed __closesthit__ch applies
    # SBT textures at texcoord; SURVEY.md §0): basecolor modulated by the
    # sRGB-decoded base texture; glTF metallicRoughness packs roughness in
    # G and metallic in B.
    from henjou_tpu.texture.atlas import sample_atlas

    tu, tv = texcoord[:, 0], texcoord[:, 1]
    base_tex = m.base_color_tex[mat_id]
    basecolor = m.base_color[mat_id] * sample_atlas(dev.atlas, base_tex, tu, tv)[:, :3]
    rough_tex = m.roughness_tex[mat_id]
    mr = sample_atlas(dev.atlas, rough_tex, tu, tv)
    roughness_v = m.roughness[mat_id] * jnp.where(rough_tex >= 0, mr[:, 1], 1.0)
    metal_tex = m.metallic_tex[mat_id]
    mm = sample_atlas(dev.atlas, metal_tex, tu, tv)
    metallic_v = m.metallic[mat_id] * jnp.where(metal_tex >= 0, mm[:, 2], 1.0)

    emission_mat = m.emission[mat_id]
    hitf = is_hit[:, None]

    sky_emission = eval_sky(sky, ray_d)
    emission = jnp.where(hitf, emission_mat, sky_emission)

    zero3 = jnp.zeros_like(basecolor)
    return SurfaceHit(
        is_hit=is_hit,
        t=hit_t,
        position=jnp.where(hitf, position, zero3),
        normal=jnp.where(hitf, normal, zero3),
        vert_color=jnp.where(hitf, vert_color, zero3),
        texcoord=jnp.where(hitf, texcoord, jnp.zeros_like(texcoord)),
        material_id=jnp.where(is_hit, mat_id, 0),
        basecolor=jnp.where(hitf, basecolor, zero3),
        metallic=jnp.where(is_hit, metallic_v, 0.0),
        roughness=jnp.where(is_hit, roughness_v, 0.0),
        subsurface=jnp.where(is_hit, m.subsurface[mat_id], 0.0),
        sheen=jnp.where(is_hit, m.sheen[mat_id], 0.0),
        clearcoat=jnp.where(is_hit, m.clearcoat[mat_id], 0.0),
        ior=jnp.where(is_hit, m.ior[mat_id], 1.0),
        transmission=jnp.where(is_hit, m.transmission[mat_id], 1.0),
        is_specular=is_hit & m.ideal_specular[mat_id],
        emission=emission,
        is_light=is_hit & m.is_light[mat_id],
        is_thinfilm=is_hit & m.is_thinfilm[mat_id],
        primitive_id=jnp.where(is_hit, prim, 0),
        instance_id=jnp.where(
            is_hit, dev.tri_instance[prim_safe].astype(jnp.int32), 0
        ),
    )


def occluded(
    frame: FrameScene, ray_o, ray_d, tmin, tmax, occluded_fn=None
) -> jnp.ndarray:
    """Shadow-ray visibility (TraceOcculution analogue, rt.h:15-41)."""
    if occluded_fn is None:
        occluded_fn = occluded_bruteforce
    return occluded_fn(frame.tri_verts, ray_o, ray_d, tmin, tmax)

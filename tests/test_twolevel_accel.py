"""Two-level animated accel: fixed cluster order + device AABB/row refresh
(accel/pallas_binned.plan_binned_order / build_binned_from_order).

Replaces the reference's full per-frame IAS rebuild (renderer.h:257-291,
398-490) with a once-per-scene host plan and a jittable per-frame refresh
— VERDICT r2 ask #4."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from henjou_tpu.accel.bruteforce import intersect_bruteforce
import henjou_tpu.accel.pallas_binned as pb


def _random_tris(rng, t, spread=4.0, size=0.3):
    c = rng.uniform(-spread, spread, (t, 1, 3))
    return (c + rng.normal(scale=size, size=(t, 3, 3))).astype(np.float32)


def _rays(rng, n):
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.slow
def test_fixed_order_build_matches_bruteforce():
    rng = np.random.default_rng(3)
    tris = _random_tris(rng, 700)
    # two "instances": ranges that cluster independently
    order, c, group, g = pb.plan_binned_order(tris, [(0, 300), (300, 400)])
    bc = pb.build_binned_from_order(jnp.asarray(tris), jnp.asarray(order), c, group, g)
    o, d = _rays(rng, 1024)
    t_b, p_b, _, _, h_b = intersect_bruteforce(jnp.asarray(tris), o, d, 1e-3)
    t_p, p_p, _, _, h_p = pb.intersect_binned(bc, o, d, 1e-3, interpret=True)
    h_b = np.asarray(h_b)
    assert (h_b == np.asarray(h_p)).all()
    np.testing.assert_allclose(np.asarray(t_p)[h_b], np.asarray(t_b)[h_b], rtol=1e-4)
    assert (np.asarray(p_p)[h_b] == np.asarray(p_b)[h_b]).all()


@pytest.mark.slow
def test_fixed_order_refresh_tracks_motion():
    """Moving one instance and refreshing from the SAME order must stay
    exact (cluster assignment is rigid-motion invariant)."""
    rng = np.random.default_rng(5)
    tris = _random_tris(rng, 512)
    order, c, group, g = pb.plan_binned_order(tris, [(0, 256), (256, 256)])
    moved = tris.copy()
    moved[256:] += np.asarray([2.5, -1.0, 0.5], np.float32)  # rigid move
    bc = pb.build_binned_from_order(jnp.asarray(moved), jnp.asarray(order), c, group, g)
    o, d = _rays(rng, 1024)
    t_b, p_b, _, _, h_b = intersect_bruteforce(jnp.asarray(moved), o, d, 1e-3)
    t_p, p_p, _, _, h_p = pb.intersect_binned(bc, o, d, 1e-3, interpret=True)
    h_b = np.asarray(h_b)
    assert (h_b == np.asarray(h_p)).all()
    np.testing.assert_allclose(np.asarray(t_p)[h_b], np.asarray(t_b)[h_b], rtol=1e-4)


@pytest.mark.slow
def test_renderer_animated_frames_zero_host_repacks(tmp_path, monkeypatch):
    """An animated multi-frame render must run pack_binned_np at most once
    (the plan switch) — every later frame refreshes on device."""
    monkeypatch.setenv("HENJOU_ANIM_ACCEL", "force")
    from henjou_tpu.runtime.options import RenderOption
    from henjou_tpu.runtime.renderer import Renderer
    from henjou_tpu.scene.testscenes import sphere_gallery_scene
    from henjou_tpu.scene.animation import static_animation, AnimationTrack

    scene = sphere_gallery_scene()
    # animate instance 0: keyframed translation
    anim = scene.animations[0] if scene.animations else None
    from henjou_tpu.scene.animation import Animation

    a = static_animation((0, 0, 0), (0, 0, 0, 1), (1, 1, 1))
    a.translation.keys = [0.0, 1.0]
    a.translation.values = [[0, 0, 0], [0.5, 0, 0]]
    scene.animations.append(a)
    for inst in scene.instances:
        inst.animation_id = len(scene.animations) - 1

    calls = {"n": 0}
    real_pack = pb.pack_binned_np

    def counting_pack(tv):
        calls["n"] += 1
        return real_pack(tv)

    monkeypatch.setattr(pb, "pack_binned_np", counting_pack)

    import dataclasses

    opt = dataclasses.replace(
        RenderOption(),
        image_width=32,
        image_height=32,
        max_spp=2,
        spp_batch=2,
        start_frame=0,
        end_frame=3,
        engine="masked",
    )
    r = Renderer(option=opt, integrator="pathtrace")
    r.set_scene(scene)
    r.build()
    imgs = [r.render_frame(f)["color"] for f in range(3)]
    # frame 0 may host-pack once (via _select_accel); frames 1-2 must not
    assert calls["n"] <= 1, calls
    for img in imgs:
        assert np.isfinite(img).all()

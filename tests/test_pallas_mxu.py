"""MXU intersector tests: matmul Möller-Trumbore vs brute force
(interpret mode on CPU; the compiled path is exercised on real TPU by
bench.py and the renderer)."""

import jax.numpy as jnp
import numpy as np
import pytest

from henjou_tpu.accel.bruteforce import intersect_bruteforce
from henjou_tpu.accel.pallas_mxu import (
    RAY_TILE,
    intersect_pallas_mxu,
    pack_clusters_mxu_np,
)
from tests.test_pallas_cluster import random_scene_rays


@pytest.mark.slow
def test_matches_bruteforce_interpret():
    for ntri, nray, seed in ((50, RAY_TILE, 1), (700, 2 * RAY_TILE, 2)):
        tris, o, d = random_scene_rays(ntri, nray, seed)
        mc = pack_clusters_mxu_np(np.asarray(tris))
        t_b, p_b, u_b, v_b, h_b = intersect_bruteforce(tris, o, d, 1e-3)
        t_p, p_p, u_p, v_p, h_p = intersect_pallas_mxu(mc, o, d, 1e-3, interpret=True)
        hb = np.asarray(h_b)
        np.testing.assert_array_equal(hb, np.asarray(h_p))
        np.testing.assert_array_equal(np.asarray(p_b)[hb], np.asarray(p_p)[hb])
        np.testing.assert_allclose(np.asarray(t_b)[hb], np.asarray(t_p)[hb], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(u_b)[hb], np.asarray(u_p)[hb], atol=1e-4)
        np.testing.assert_allclose(np.asarray(v_b)[hb], np.asarray(v_p)[hb], atol=1e-4)


def test_recentering_far_scene():
    """A scene far from the origin still intersects exactly (the
    supercluster recentering is what keeps the matmul in f32 range)."""
    tris, o, d = random_scene_rays(300, RAY_TILE, 5)
    shift = jnp.asarray([500.0, -300.0, 800.0])
    tris = tris + shift
    o = o + shift
    mc = pack_clusters_mxu_np(np.asarray(tris))
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
    t_p, p_p, _, _, h_p = intersect_pallas_mxu(mc, o, d, 1e-3, interpret=True)
    hb = np.asarray(h_b)
    agree = hb == np.asarray(h_p)
    # razor-edge hits may flip under matmul rounding; require near-total
    assert agree.mean() > 0.995, agree.mean()
    both = hb & np.asarray(h_p)
    np.testing.assert_allclose(
        np.asarray(t_b)[both], np.asarray(t_p)[both], rtol=1e-3
    )


@pytest.mark.slow
def test_padding_tmax_and_any_hit():
    tris, o, d = random_scene_rays(100, 700, 3)
    mc = pack_clusters_mxu_np(np.asarray(tris))
    tmax = jnp.full((700,), 4.0)
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3, tmax=tmax)
    t_p, p_p, _, _, h_p = intersect_pallas_mxu(mc, o, d, 1e-3, tmax=tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_p))
    _, _, _, _, h_a = intersect_pallas_mxu(
        mc, o, d, 1e-3, tmax=tmax, any_hit=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_a))

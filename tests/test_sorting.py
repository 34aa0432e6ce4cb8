"""Sorted-intersector wrapper: estimator-invisible permutation."""

import jax.numpy as jnp
import numpy as np
import pytest

from henjou_tpu.accel.bruteforce import intersect_bruteforce, occluded_bruteforce
from henjou_tpu.accel.sorting import make_sorted_intersector, ray_sort_key
from tests.test_pallas_cluster import random_scene_rays


@pytest.mark.slow
def test_sorted_wrapper_matches_unsorted():
    tris, o, d = random_scene_rays(300, 777, seed=9)
    tv = np.asarray(tris)
    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)
    s_int, s_occ = make_sorted_intersector(
        intersect_bruteforce, occluded_bruteforce, lo, hi
    )
    ref = intersect_bruteforce(tris, o, d, 1e-3, 1e16)
    got = s_int(tris, o, d, 1e-3, 1e16)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ro = occluded_bruteforce(tris, o, d, 1e-3, jnp.full((777,), 3.0))
    go = s_occ(tris, o, d, 1e-3, jnp.full((777,), 3.0))
    np.testing.assert_array_equal(np.asarray(ro), np.asarray(go))


def test_sort_key_groups_octants():
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.asarray(
        [[1, 1, 1], [-1, 1, 1], [1, 1, 1], [-1, -1, -1]], jnp.float32
    )
    key = np.asarray(
        ray_sort_key(o, d, jnp.zeros(3), jnp.ones(3))
    )
    assert key[0] == key[2]  # same octant + same origin -> same key
    assert key[0] != key[1] and key[1] != key[3]

"""Pallas packet/cluster kernel tests (interpret mode on CPU; the compiled
path is exercised on real TPU by bench.py and the renderer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from henjou_tpu.accel.bruteforce import intersect_bruteforce
from henjou_tpu.accel.pallas_cluster import (
    RAY_TILE,
    pack_clusters,
    intersect_pallas,
)


def random_scene_rays(ntri, nray, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-4, 4, size=(ntri, 1, 3))
    tris = jnp.asarray((centers + rng.uniform(-0.3, 0.3, (ntri, 3, 3))).astype(np.float32))
    o = jnp.asarray(rng.uniform(-6, 6, size=(nray, 3)).astype(np.float32))
    d = rng.normal(size=(nray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return tris, o, jnp.asarray(d)


def test_pack_shapes():
    tris, _, _ = random_scene_rays(300, 1)
    pc = pack_clusters(tris)
    assert pc.num_clusters == 3
    assert pc.v0x.shape == (3, 128)
    assert pc.aabb.shape == (8, 8)
    assert int((np.asarray(pc.order) < 0).sum()) == 3 * 128 - 300


@pytest.mark.slow
def test_matches_bruteforce_interpret():
    for ntri, nray, seed in ((50, RAY_TILE, 1), (700, 2 * RAY_TILE, 2)):
        tris, o, d = random_scene_rays(ntri, nray, seed)
        pc = pack_clusters(tris)
        t_b, p_b, u_b, v_b, h_b = intersect_bruteforce(tris, o, d, 1e-3)
        t_p, p_p, u_p, v_p, h_p = intersect_pallas(pc, o, d, 1e-3, interpret=True)
        np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_p))
        hb = np.asarray(h_b)
        np.testing.assert_array_equal(np.asarray(p_b)[hb], np.asarray(p_p)[hb])
        np.testing.assert_allclose(np.asarray(t_b)[hb], np.asarray(t_p)[hb], rtol=1e-5)


@pytest.mark.slow
def test_padding_and_tmax():
    # non-multiple-of-tile ray count + per-lane tmax
    tris, o, d = random_scene_rays(100, 700, 3)
    pc = pack_clusters(tris)
    tmax = jnp.full((700,), 4.0)
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3, tmax=tmax)
    t_p, p_p, _, _, h_p = intersect_pallas(pc, o, d, 1e-3, tmax=tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_p))


@pytest.mark.slow
def test_any_hit_mode():
    tris, o, d = random_scene_rays(200, RAY_TILE, 4)
    pc = pack_clusters(tris)
    _, _, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
    _, _, _, _, h_p = intersect_pallas(pc, o, d, 1e-3, any_hit=True, interpret=True)
    # any-hit finds a hit iff closest-hit does
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_p))


# ---------------- two-level HBM variant ----------------


@pytest.mark.slow
def test_hbm_matches_bruteforce_interpret():
    from henjou_tpu.accel.pallas_cluster_hbm import (
        RAY_TILE as RT_HBM,
        intersect_pallas_hbm,
        pack_clusters_hbm,
    )

    for ntri, nray, seed in ((50, RT_HBM, 5), (3000, 2 * RT_HBM + 37, 6)):
        tris, o, d = random_scene_rays(ntri, nray, seed)
        hc = pack_clusters_hbm(tris)
        t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
        t_p, p_p, _, _, h_p = intersect_pallas_hbm(hc, o, d, 1e-3, interpret=True)
        np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_p))
        hb = np.asarray(h_b)
        np.testing.assert_array_equal(np.asarray(p_b)[hb], np.asarray(p_p)[hb])
        np.testing.assert_allclose(np.asarray(t_b)[hb], np.asarray(t_p)[hb], rtol=1e-5)


@pytest.mark.slow
def test_hbm_any_hit_and_tmax():
    from henjou_tpu.accel.pallas_cluster_hbm import (
        intersect_pallas_hbm,
        pack_clusters_hbm,
    )

    tris, o, d = random_scene_rays(400, 512, 7)
    hc = pack_clusters_hbm(tris)
    tmax = jnp.full((512,), 4.0)
    _, _, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3, tmax=tmax)
    _, _, _, _, h_p = intersect_pallas_hbm(
        hc, o, d, 1e-3, tmax=tmax, any_hit=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_p))


@pytest.mark.slow
def test_binned_matches_bruteforce_interpret():
    from henjou_tpu.accel.pallas_binned import intersect_binned, pack_binned_np

    rng = np.random.default_rng(5)
    t = 700
    c = rng.uniform(-3, 3, (t, 1, 3))
    tris = jnp.asarray(
        (c + rng.normal(scale=0.25, size=(t, 3, 3))).astype(np.float32)
    )
    bc = pack_binned_np(np.asarray(tris))
    n = 512
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
    t_p, p_p, _, _, h_p = intersect_binned(bc, o, d, 1e-3, interpret=True)
    h_b, h_p = np.asarray(h_b), np.asarray(h_p)
    assert (h_b == h_p).all()
    np.testing.assert_allclose(np.asarray(t_p)[h_b], np.asarray(t_b)[h_b], rtol=1e-4)
    assert (np.asarray(p_p)[h_b] == np.asarray(p_b)[h_b]).all()


@pytest.mark.slow
def test_binned_grouped_and_anyhit_interpret():
    import henjou_tpu.accel.pallas_binned as pb

    rng = np.random.default_rng(7)
    t = 900
    c = rng.uniform(-3, 3, (t, 1, 3))
    tris = jnp.asarray(
        (c + rng.normal(scale=0.3, size=(t, 3, 3))).astype(np.float32)
    )
    old = pb.MAX_FINE_CLUSTERS
    pb.MAX_FINE_CLUSTERS = 2  # force the group=SC (DMA-group) path
    try:
        bc = pb.pack_binned_np(np.asarray(tris))
    finally:
        pb.MAX_FINE_CLUSTERS = old
    assert bc.group > 1
    n = 512
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
    t_p, p_p, _, _, h_p = pb.intersect_binned(bc, o, d, 1e-3, interpret=True)
    h_b = np.asarray(h_b)
    assert (h_b == np.asarray(h_p)).all()
    assert (np.asarray(p_p)[h_b] == np.asarray(p_b)[h_b]).all()
    tmax = jnp.full((n,), 2.0, jnp.float32)
    _, _, _, _, ha = pb.intersect_binned(
        bc, o, d, 1e-3, tmax=tmax, any_hit=True, interpret=True
    )
    _, _, _, _, hb2 = intersect_bruteforce(tris, o, d, 1e-3, tmax=tmax)
    assert (np.asarray(ha) == np.asarray(hb2)).all()


@pytest.mark.slow
def test_binned_scaled_group_interpret():
    """1M-tri regime (VERDICT r2 #7): when num_groups would exceed
    MAX_GROUPS, pack_binned_np doubles the DMA-group size so the
    [tiles, num_groups] SMEM worklist operands stay bounded. Force the
    doubling at test scale and check full parity (group=32 DMA blocks,
    nibble bits addressed over ctot=64 clusters)."""
    import henjou_tpu.accel.pallas_binned as pb

    rng = np.random.default_rng(13)
    t = 5000
    c = rng.uniform(-3, 3, (t, 1, 3))
    tris = jnp.asarray(
        (c + rng.normal(scale=0.2, size=(t, 3, 3))).astype(np.float32)
    )
    old_fine, old_groups = pb.MAX_FINE_CLUSTERS, pb.MAX_GROUPS
    pb.MAX_FINE_CLUSTERS, pb.MAX_GROUPS = 2, 2
    try:
        bc = pb.pack_binned_np(np.asarray(tris))
    finally:
        pb.MAX_FINE_CLUSTERS, pb.MAX_GROUPS = old_fine, old_groups
    assert bc.group == 32 and bc.num_groups == 2
    n = 512
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
    t_p, p_p, _, _, h_p = pb.intersect_binned(bc, o, d, 1e-3, interpret=True)
    h_b = np.asarray(h_b)
    assert (h_b == np.asarray(h_p)).all()
    assert (np.asarray(p_p)[h_b] == np.asarray(p_b)[h_b]).all()
    np.testing.assert_allclose(
        np.asarray(t_p)[h_b], np.asarray(t_b)[h_b], rtol=1e-4
    )


@pytest.mark.slow
def test_binned_defer_pick_parity_interpret():
    """defer=True (deferred attribute resolution, round-4 VERDICT #1b):
    the hot loop keeps only (best-t, flat winner index) and u/v/prim are
    recomputed outside the kernel — results must be IDENTICAL to the
    inline-pick kernel on both the fine (group=1) and grouped paths."""
    import henjou_tpu.accel.pallas_binned as pb

    rng = np.random.default_rng(21)
    n = 512
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    for tcount, force_group in ((700, False), (900, True)):
        c = rng.uniform(-3, 3, (tcount, 1, 3))
        tris = (c + rng.normal(scale=0.25, size=(tcount, 3, 3))).astype(
            np.float32
        )
        if force_group:
            old = pb.MAX_FINE_CLUSTERS
            pb.MAX_FINE_CLUSTERS = 2
            try:
                bc = pb.pack_binned_np(tris)
            finally:
                pb.MAX_FINE_CLUSTERS = old
            assert bc.group > 1
        else:
            bc = pb.pack_binned_np(tris)
        t0, p0, u0, v0, h0 = pb.intersect_binned(
            bc, o, d, 1e-3, interpret=True
        )
        t1, p1, u1, v1, h1 = pb.intersect_binned(
            bc, o, d, 1e-3, interpret=True, defer=True
        )
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_allclose(
            np.asarray(u0), np.asarray(u1), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(v0), np.asarray(v1), atol=1e-6
        )


@pytest.mark.slow
def test_bitonic_wrapper_dead_lanes_and_parity():
    """Bitonic sorted wrapper: estimator-invisible, dead lanes exact."""
    from henjou_tpu.accel.pallas_binned import (
        make_binned_intersector,
        pack_binned_np,
    )
    from henjou_tpu.accel.sorting import make_bitonic_sorted_intersector

    rng = np.random.default_rng(11)
    t = 500
    c = rng.uniform(-3, 3, (t, 1, 3))
    tris = jnp.asarray(
        (c + rng.normal(scale=0.25, size=(t, 3, 3))).astype(np.float32)
    )
    bc = pack_binned_np(np.asarray(tris))
    ifn, ofn = make_binned_intersector(bc)
    sifn, sofn = make_bitonic_sorted_intersector(
        ifn, ofn, bc.scene_lo, bc.scene_hi
    )
    n = 1024
    o = jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.where(jnp.arange(n) % 3 == 0, 0.0, 1e9).astype(jnp.float32)
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3, tmax=tmax)
    t_s, p_s, _, _, h_s = sifn(None, o, d, tmin, tmax)
    h_b = np.asarray(h_b)
    assert (h_b == np.asarray(h_s)).all()
    np.testing.assert_allclose(
        np.asarray(t_s)[h_b], np.asarray(t_b)[h_b], rtol=1e-4
    )
    assert (np.asarray(p_s)[h_b] == np.asarray(p_b)[h_b]).all()
    occ = sofn(None, o, d, tmin, jnp.full((n,), 2.0))
    _, _, _, _, occ_ref = intersect_bruteforce(
        tris, o, d, 1e-3, tmax=jnp.full((n,), 2.0)
    )
    assert (np.asarray(occ) == np.asarray(occ_ref)).all()


@pytest.mark.slow
def test_binned_dma_double_buffer_interpret():
    """Force the streaming (non-VMEM-resident) path: double-buffered
    group DMA with post-loop prefetch drain must match bruteforce."""
    import henjou_tpu.accel.pallas_binned as pb

    rng = np.random.default_rng(7)
    t = 900
    c = rng.uniform(-3, 3, (t, 1, 3))
    tris = jnp.asarray(
        (c + rng.normal(scale=0.3, size=(t, 3, 3))).astype(np.float32)
    )
    old_fine, old_budget = pb.MAX_FINE_CLUSTERS, pb.VMEM_ROWS_BUDGET
    pb.MAX_FINE_CLUSTERS = 2
    pb.VMEM_ROWS_BUDGET = 0
    try:
        bc = pb.pack_binned_np(np.asarray(tris))
        n = 512
        o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
        # ray_tile=512 is a distinct static arg: the earlier grouped test
        # traced intersect_binned with identical shapes/statics at the
        # default tile, so reusing it here would hit the jit cache's
        # vmem_rows=True executable and never exercise the DMA drain path
        t_p, p_p, _, _, h_p = pb.intersect_binned(
            bc, o, d, 1e-3, interpret=True, ray_tile=512
        )
    finally:
        pb.MAX_FINE_CLUSTERS, pb.VMEM_ROWS_BUDGET = old_fine, old_budget
    h_b = np.asarray(h_b)
    assert (h_b == np.asarray(h_p)).all()
    np.testing.assert_allclose(
        np.asarray(t_p)[h_b], np.asarray(t_b)[h_b], rtol=1e-4
    )
    assert (np.asarray(p_p)[h_b] == np.asarray(p_b)[h_b]).all()


@pytest.mark.slow
def test_binned_subtile_sweep_interpret():
    """Subtile-need granularities 1/2/8 must be exact at both group=1
    (small-scene nibble path, new in round 3) and grouped scenes, in
    closest-hit and any-hit modes."""
    import henjou_tpu.accel.pallas_binned as pb

    rng = np.random.default_rng(11)
    tris = jnp.asarray(
        (rng.random((900, 3, 3)) * 2 - 1).astype(np.float32)
        * np.array([3, 1, 3], np.float32)
    )
    n = 512
    o = jnp.asarray((rng.random((n, 3)) * 2 - 1).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
    h_np = np.asarray(h_b)

    old_fine = pb.MAX_FINE_CLUSTERS
    for fine in (old_fine, 2):  # group=1 then group=SC
        pb.MAX_FINE_CLUSTERS = fine
        try:
            bc = pb.pack_binned_np(np.asarray(tris))
        finally:
            pb.MAX_FINE_CLUSTERS = old_fine
        for st in (1, 2, 8, 16):
            t_p, p_p, _, _, h_p = pb.intersect_binned(
                bc, o, d, 1e-3, interpret=True, subtiles=st
            )
            assert (h_np == np.asarray(h_p)).all(), (bc.group, st)
            np.testing.assert_allclose(
                np.asarray(t_p)[h_np], np.asarray(t_b)[h_np],
                rtol=1e-4, atol=1e-5,
            )
            _, _, _, _, h_o = pb.intersect_binned(
                bc, o, d, 1e-3, interpret=True, subtiles=st, any_hit=True
            )
            assert (h_np == np.asarray(h_o)).all(), (bc.group, st)


@pytest.mark.slow
def test_pairs_matches_bruteforce():
    """accel/pairs.py (the XLA pair-compacted alternate): exactness of the
    top_k window + pair_cap clipping + residual sweeps, closest AND
    any-hit, on a multi-cluster scene with a deliberately TIGHT top_k
    window and pair budget so the residual-sweep machinery engages."""
    from henjou_tpu.accel.pairs import intersect_pairs
    from henjou_tpu.accel.pallas_binned import pack_binned_np

    rng = np.random.default_rng(11)
    t = 1400
    c = rng.uniform(-3, 3, (t, 1, 3))
    tris = jnp.asarray(
        (c + rng.normal(scale=0.3, size=(t, 3, 3))).astype(np.float32)
    )
    bc = pack_binned_np(np.asarray(tris))
    assert bc.num_clusters >= 8
    n = 512
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_b, p_b, _, _, h_b = intersect_bruteforce(tris, o, d, 1e-3)
    # kmax=4 < clusters and pair_mult=2: overflow + clipping both engage
    t_p, p_p, _, _, h_p = intersect_pairs(
        bc, o, d, 1e-3, kmax=4, pair_mult=2, max_sweeps=8
    )
    h_b = np.asarray(h_b)
    assert (h_b == np.asarray(h_p)).all()
    np.testing.assert_allclose(
        np.asarray(t_p)[h_b], np.asarray(t_b)[h_b], rtol=1e-4
    )
    tmax = jnp.full((n,), 2.5, jnp.float32)
    _, _, _, _, ha = intersect_pairs(
        bc, o, d, 1e-3, tmax=tmax, any_hit=True, kmax=4, pair_mult=2,
        max_sweeps=8,
    )
    _, _, _, _, hb2 = intersect_bruteforce(tris, o, d, 1e-3, tmax=tmax)
    assert (np.asarray(ha) == np.asarray(hb2)).all()
    # residual-overflow flag: a starved sweep budget reports inexact
    # completion; the full budget reports clean completion
    *_, res_tight = intersect_pairs(
        bc, o, d, 1e-3, kmax=4, pair_mult=2, max_sweeps=1,
        with_residual=True,
    )
    assert bool(res_tight)
    *_, res_full = intersect_pairs(
        bc, o, d, 1e-3, kmax=4, pair_mult=2, max_sweeps=8,
        with_residual=True,
    )
    assert not bool(res_full)

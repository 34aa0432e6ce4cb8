"""Isolate bitonic loop costs: guard-chain length, dynamic k, dynamic roll."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
S = 512
P = 10
ITERS = 136


def _imat():
    return (
        jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    )


def run(name, kern, extra_specs=(), extra_args=()):
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        in_specs=list(extra_specs) + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, S, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((P, S, LANES), jnp.int32)],
    )(*a))
    stack = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 24, (P, S, LANES)).astype(np.int32))
    args = tuple(extra_args) + (stack,)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:56s} compile {tc:5.1f}s  run {dt*1e3:8.3f} ms "
          f"({dt/ITERS*1e6:6.2f} us/substage)", flush=True)


def sub_static(i_mat, j, k, src, dst):
    low = (i_mat & j) == 0
    up = (i_mat & k) == 0
    take_min = (low & up) | (~low & ~up)

    def partner(x):
        if j < LANES:
            fwd = pltpu.roll(x, LANES - j, axis=1)
            bwd = pltpu.roll(x, j, axis=1)
        else:
            ds = j // LANES
            fwd = pltpu.roll(x, S - ds, axis=0)
            bwd = pltpu.roll(x, ds, axis=0)
        return jnp.where(low, fwd, bwd)

    key = src[0]
    pkey = partner(key)
    swap = (take_min & (key > pkey)) | (~take_min & (key < pkey))
    dst[0] = jnp.where(swap, pkey, key)
    for pi in range(1, P):
        v = src[pi]
        dst[pi] = jnp.where(swap, partner(v), v)


def sub_dynamic(i_mat, j, k, src, dst, s_dyn):
    """j, k traced scalars; rolls use dynamic shift, split lane/sublane."""
    low = (i_mat & j) == 0
    up = (i_mat & k) == 0
    take_min = (low & up) | (~low & ~up)
    is_lane = j < LANES
    lane_j = jnp.where(is_lane, j, 1)
    sub_j = jnp.where(is_lane, 1, j // LANES)

    def partner(x):
        fwd_l = pltpu.roll(x, LANES - lane_j, axis=1)
        bwd_l = pltpu.roll(x, lane_j, axis=1)
        fwd_s = pltpu.roll(x, S - sub_j, axis=0)
        bwd_s = pltpu.roll(x, sub_j, axis=0)
        fwd = jnp.where(is_lane, fwd_l, fwd_s)
        bwd = jnp.where(is_lane, bwd_l, bwd_s)
        return jnp.where(low, fwd, bwd)

    key = src[0]
    pkey = partner(key)
    swap = (take_min & (key > pkey)) | (~take_min & (key < pkey))
    dst[0] = jnp.where(swap, pkey, key)
    for pi in range(1, P):
        v = src[pi]
        dst[pi] = jnp.where(swap, partner(v), v)


def make_loop(substage_fn):
    def kern(*refs):
        if len(refs) == 4:
            jk_ref, stack_ref, out_ref, buf_ref = refs
        else:
            jk_ref = None
            stack_ref, out_ref, buf_ref = refs
        i_mat = _imat()
        out_ref[:] = stack_ref[:]

        def body(s, _):
            @pl.when(jax.lax.rem(s, 2) == 0)
            def _():
                substage_fn(i_mat, s, jk_ref, out_ref, buf_ref)

            @pl.when(jax.lax.rem(s, 2) == 1)
            def _():
                substage_fn(i_mat, s, jk_ref, buf_ref, out_ref)
            return 0

        jax.lax.fori_loop(0, ITERS, body, 0)
    return kern


def x1(i_mat, s, jk, src, dst):  # static j, static k
    sub_static(i_mat, 16, 32, src, dst)


def x2(i_mat, s, jk, src, dst):  # static j, dynamic k from SMEM
    k = jk[1, s]
    sub_static(i_mat, 16, k, src, dst)


def x5(i_mat, s, jk, src, dst):  # dynamic j and k
    j = jk[0, s]
    k = jk[1, s]
    sub_dynamic(i_mat, j, k, src, dst, s)


def guard_chain(n_guard):
    def fn(i_mat, s, jk, src, dst):
        lj = jk[0, s]
        for g in range(n_guard):
            @pl.when(lj == (g % 16))
            def _():
                sub_static(i_mat, 16, 32, src, dst)
    return fn


if __name__ == "__main__":
    jk_np = np.zeros((2, ITERS), np.int32)
    # real-ish schedule values for the dynamic variants
    from henjou_tpu.accel.bitonic import _substages
    subs = _substages(S * LANES)
    jk_np[0] = [j for _, j in subs]
    jk_np[1] = [k for k, _ in subs]
    jk = jnp.asarray(jk_np)
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    run("X1 static j,k 2 guards", make_loop(x1), smem, (jk,))
    run("X2 static j dynamic k", make_loop(x2), smem, (jk,))
    run("X5 dynamic j,k (dyn rolls)", make_loop(x5), smem, (jk,))
    jk2 = jnp.asarray(np.stack([jk_np[0] * 0, jk_np[1]]))  # lj=0 for guards
    run("X3 4-guard chain static body", make_loop(guard_chain(4)), smem, (jk2,))
    run("X4 16-guard chain static body", make_loop(guard_chain(16)), smem, (jk2,))

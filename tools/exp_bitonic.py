"""Variants of the Pallas bitonic sort, timed on hardware.

a) fori_loop + 17-way static-j branch chain, stacked [P,S,128] refs
b) full static unroll, stacked refs (no branches at all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from henjou_tpu.accel.bitonic import _substages

LANES = 128


def _imat(s):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 1)
    )


def _stage_stacked(i_mat, j: int, k, src, dst, s):
    low = (i_mat & j) == 0
    up = (i_mat & k) == 0
    take_min = (low & up) | (~low & ~up)
    st = src[:]
    if j < LANES:
        fwd = pltpu.roll(st, LANES - j, axis=2)
        bwd = pltpu.roll(st, j, axis=2)
    else:
        ds = j // LANES
        fwd = pltpu.roll(st, s - ds, axis=1)
        bwd = pltpu.roll(st, ds, axis=1)
    partner = jnp.where(low[None], fwd, bwd)
    key = st[0]
    pkey = partner[0]
    swap = (take_min & (key > pkey)) | (~take_min & (key < pkey))
    dst[:] = jnp.where(swap[None], partner, st)


def kern_switch(jk_ref, stack_ref, out_ref, buf_ref, *, n_sub, s, n_j):
    i_mat = _imat(s)
    out_ref[:] = stack_ref[:]

    def body(sub, _):
        lj = jk_ref[0, sub]
        k = jk_ref[1, sub]
        even = jax.lax.rem(sub, 2) == 0

        def mk(lji, src, dst):
            def f():
                _stage_stacked(i_mat, 1 << lji, k, src, dst, s)
            return f

        @pl.when(even)
        def _():
            jax.lax.switch(lj, [mk(l, out_ref, buf_ref) for l in range(n_j)])

        @pl.when(~even)
        def _():
            jax.lax.switch(lj, [mk(l, buf_ref, out_ref) for l in range(n_j)])

        return 0

    jax.lax.fori_loop(0, n_sub, body, 0)
    if n_sub % 2 == 1:
        out_ref[:] = buf_ref[:]


def kern_unroll(stack_ref, out_ref, buf_ref, *, subs, s):
    i_mat = _imat(s)
    out_ref[:] = stack_ref[:]
    for idx, (k, j) in enumerate(subs):
        if idx % 2 == 0:
            _stage_stacked(i_mat, j, k, out_ref, buf_ref, s)
        else:
            _stage_stacked(i_mat, j, k, buf_ref, out_ref, s)
    if len(subs) % 2 == 1:
        out_ref[:] = buf_ref[:]


def run_variant(name, n, n_planes, variant):
    s = n // LANES
    subs = _substages(n)
    n_j = n.bit_length() - 1
    rng = np.random.default_rng(0)
    key = rng.integers(0, 1 << 24, n).astype(np.int32)
    planes = [rng.integers(0, 1 << 30, n).astype(np.int32) for _ in range(n_planes)]
    stack = jnp.asarray(np.stack([key.reshape(s, LANES)] +
                                 [p.reshape(s, LANES) for p in planes]))
    jk = jnp.asarray(np.asarray(
        [[jj.bit_length() - 1 for _, jj in subs], [kk for kk, _ in subs]],
        np.int32))

    if variant == "switch":
        kernel = functools.partial(kern_switch, n_sub=len(subs), s=s, n_j=n_j)
        f = jax.jit(lambda jk, st: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(stack.shape, jnp.int32),
            scratch_shapes=[pltpu.VMEM(stack.shape, jnp.int32)],
        )(jk, st))
        args = (jk, stack)
    else:
        kernel = functools.partial(kern_unroll, subs=subs, s=s)
        f = jax.jit(lambda st: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(stack.shape, jnp.int32),
            scratch_shapes=[pltpu.VMEM(stack.shape, jnp.int32)],
        )(st))
        args = (stack,)

    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    ok = bool((np.sort(key) == np.asarray(out[0]).reshape(-1)).all())
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} ok={ok} compile {tc:6.1f}s  run {dt*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    run_variant("switch 64k 10-plane", 1 << 16, 9, "switch")
    run_variant("unroll 64k 10-plane", 1 << 16, 9, "unroll")
    run_variant("switch 64k 5-plane", 1 << 16, 4, "switch")
    run_variant("unroll 64k 5-plane", 1 << 16, 4, "unroll")

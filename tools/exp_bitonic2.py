"""Isolate the per-substage cost of the Pallas bitonic sort."""

from __future__ import annotations

import functools
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


def run(name, kern, extra_specs=(), extra_args=(), scratch=True):
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        in_specs=list(extra_specs) + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, S, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((P, S, LANES), jnp.int32)] if scratch else [],
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
    print(f"{name:52s} compile {tc:5.1f}s  run {dt*1e3:8.3f} ms "
          f"({dt/ITERS*1e6:6.2f} us/substage)", flush=True)


def substage(i_mat, j, k, st):
    low = (i_mat & j) == 0
    up = (i_mat & k) == 0
    take_min = (low & up) | (~low & ~up)
    if j < LANES:
        fwd = pltpu.roll(st, LANES - j, axis=2)
        bwd = pltpu.roll(st, j, axis=2)
    else:
        ds = j // LANES
        fwd = pltpu.roll(st, S - ds, axis=1)
        bwd = pltpu.roll(st, ds, axis=1)
    partner = jnp.where(low[None], fwd, bwd)
    key = st[0]
    pkey = partner[0]
    swap = (take_min & (key > pkey)) | (~take_min & (key < pkey))
    return jnp.where(swap[None], partner, st)


def kern_a(stack_ref, out_ref, buf_ref):
    """static j=16 lane roll, static k, refs double-buffered."""
    i_mat = _imat()
    out_ref[:] = stack_ref[:]

    def body(s, _):
        @pl.when(jax.lax.rem(s, 2) == 0)
        def _():
            buf_ref[:] = substage(i_mat, 16, 32, out_ref[:])

        @pl.when(jax.lax.rem(s, 2) == 1)
        def _():
            out_ref[:] = substage(i_mat, 16, 32, buf_ref[:])
        return 0

    jax.lax.fori_loop(0, ITERS, body, 0)


def kern_b(stack_ref, out_ref, buf_ref):
    """static j=512 sublane roll."""
    i_mat = _imat()
    out_ref[:] = stack_ref[:]

    def body(s, _):
        @pl.when(jax.lax.rem(s, 2) == 0)
        def _():
            buf_ref[:] = substage(i_mat, 512, 1024, out_ref[:])

        @pl.when(jax.lax.rem(s, 2) == 1)
        def _():
            out_ref[:] = substage(i_mat, 512, 1024, buf_ref[:])
        return 0

    jax.lax.fori_loop(0, ITERS, body, 0)


def kern_c(stack_ref, out_ref, buf_ref):
    """values carry (no refs), static j=16: does carry spill?"""
    i_mat = _imat()

    def body(s, st):
        return substage(i_mat, 16, 32, st)

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, stack_ref[:])
    buf_ref[0] = out_ref[0]


def kern_d(stack_ref, out_ref, buf_ref):
    """single plane loop (2D [S*P?]) — per-plane python loop, static j."""
    i_mat = _imat()
    out_ref[:] = stack_ref[:]

    def sub2(j, k, src, dst):
        low = (i_mat & j) == 0
        up = (i_mat & k) == 0
        take_min = (low & up) | (~low & ~up)

        def partner(x):
            fwd = pltpu.roll(x, LANES - j, axis=1)
            bwd = pltpu.roll(x, j, axis=1)
            return jnp.where(low, fwd, bwd)

        key = src[0]
        pkey = partner(key)
        swap = (take_min & (key > pkey)) | (~take_min & (key < pkey))
        dst[0] = jnp.where(swap, pkey, key)
        for pi in range(1, P):
            v = src[pi]
            dst[pi] = jnp.where(swap, partner(v), v)

    def body(s, _):
        @pl.when(jax.lax.rem(s, 2) == 0)
        def _():
            sub2(16, 32, out_ref, buf_ref)

        @pl.when(jax.lax.rem(s, 2) == 1)
        def _():
            sub2(16, 32, buf_ref, out_ref)
        return 0

    jax.lax.fori_loop(0, ITERS, body, 0)


def kern_e(stack_ref, out_ref, buf_ref):
    """no masks/compares at all — just 2 rolls + copy, refs."""
    def body(s, _):
        @pl.when(jax.lax.rem(s, 2) == 0)
        def _():
            st = out_ref[:]
            buf_ref[:] = pltpu.roll(st, 16, axis=2) + pltpu.roll(st, 112, axis=2)

        @pl.when(jax.lax.rem(s, 2) == 1)
        def _():
            st = buf_ref[:]
            out_ref[:] = pltpu.roll(st, 16, axis=2) + pltpu.roll(st, 112, axis=2)
        return 0

    jax.lax.fori_loop(0, ITERS, body, 0)


def kern_f(stack_ref, out_ref, buf_ref):
    """2 rolls + copy on 2D planes (python loop over planes), refs."""
    def body(s, _):
        @pl.when(jax.lax.rem(s, 2) == 0)
        def _():
            for pi in range(P):
                v = out_ref[pi]
                buf_ref[pi] = pltpu.roll(v, 16, axis=1) + pltpu.roll(v, 112, axis=1)

        @pl.when(jax.lax.rem(s, 2) == 1)
        def _():
            for pi in range(P):
                v = buf_ref[pi]
                out_ref[pi] = pltpu.roll(v, 16, axis=1) + pltpu.roll(v, 112, axis=1)
        return 0

    jax.lax.fori_loop(0, ITERS, body, 0)


if __name__ == "__main__":
    run("A stacked refs, static lane j=16", kern_a)
    run("B stacked refs, static sublane j=512", kern_b)
    run("C stacked value carry, static j=16", kern_c)
    run("D per-plane refs, static j=16", kern_d)
    run("E rolls only (no masks), 3D refs", kern_e)
    run("F rolls only (no masks), per-plane 2D", kern_f)


def kern_g(stack_ref, out_ref, buf_ref, *, subs):
    """REAL schedule, fully unrolled, per-plane refs."""
    i_mat = _imat()
    out_ref[:] = stack_ref[:]

    def sub2(j, k, src, dst):
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

    for idx, (k, j) in enumerate(subs):
        if idx % 2 == 0:
            sub2(j, k, out_ref, buf_ref)
        else:
            sub2(j, k, buf_ref, out_ref)
    if len(subs) % 2 == 1:
        out_ref[:] = buf_ref[:]


def run_g():
    import functools as ft
    from henjou_tpu.accel.bitonic import _substages
    n = S * LANES
    subs = _substages(n)
    kern = ft.partial(kern_g, subs=subs)
    f = jax.jit(lambda st: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, S, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((P, S, LANES), jnp.int32)],
    )(st))
    rng = np.random.default_rng(0)
    key = rng.integers(0, 1 << 24, n).astype(np.int32)
    st = np.random.default_rng(1).integers(0, 1 << 30, (P, S, LANES)).astype(np.int32)
    st[0] = key.reshape(S, LANES)
    st = jnp.asarray(st)
    t0 = time.perf_counter()
    out = f(st)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    ok = bool((np.sort(key) == np.asarray(out[0]).reshape(-1)).all())
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(st)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"G real schedule unrolled ok={ok} compile {tc:5.1f}s run {dt*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "g":
    run_g()

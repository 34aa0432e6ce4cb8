"""Full-unroll bitonic variants: fix VMEM OOM via in-place substages and
input/output aliasing; measure compile time of the real 136-substage net."""

from __future__ import annotations

import functools as ft
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from henjou_tpu.accel.bitonic import _substages

LANES = 128
S = 512
P = 10
N = S * LANES
SUBS = _substages(N)


def _imat():
    return (
        jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    )


def _substage_inplace(i_mat, j, k, ref):
    """Static j,k; read-modify-write one ref (no double buffer)."""
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

    key = ref[0]
    pkey = partner(key)
    swap = (take_min & (key > pkey)) | (~take_min & (key < pkey))
    ref[0] = jnp.where(swap, pkey, key)
    for pi in range(1, P):
        v = ref[pi]
        ref[pi] = jnp.where(swap, partner(v), v)


def kern_inplace(stack_ref, out_ref):
    i_mat = _imat()
    out_ref[:] = stack_ref[:]
    for k, j in SUBS:
        _substage_inplace(i_mat, j, k, out_ref)


def kern_inplace_aliased(stack_ref, out_ref):
    # stack_ref IS out_ref (aliased); sort in place.
    i_mat = _imat()
    for k, j in SUBS:
        _substage_inplace(i_mat, j, k, out_ref)


def run(name, kern, alias=False, vmem_mb=None):
    params = {}
    if vmem_mb is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20
        )
    kw = {}
    if alias:
        kw["input_output_aliases"] = {0: 0}
    f = jax.jit(
        lambda st: pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, S, LANES), jnp.int32),
            **kw,
            **params,
        )(st),
        donate_argnums=(0,) if alias else (),
    )
    rng = np.random.default_rng(0)
    key = rng.integers(0, 1 << 24, N).astype(np.int32)
    st_np = np.random.default_rng(1).integers(0, 1 << 30, (P, S, LANES)).astype(np.int32)
    st_np[0] = key.reshape(S, LANES)
    t0 = time.perf_counter()
    try:
        out = f(jnp.asarray(st_np))
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    tc = time.perf_counter() - t0
    ok = bool((np.sort(key) == np.asarray(out[0]).reshape(-1)).all())
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(jnp.asarray(st_np))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} ok={ok} compile {tc:6.1f}s run {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        run("G1 inplace full unroll", kern_inplace)
    if which in ("all", "b"):
        run("G2 inplace + aliased io", kern_inplace_aliased, alias=True)
    if which in ("all", "c"):
        run("G3 inplace + vmem 100MB", kern_inplace, vmem_mb=100)

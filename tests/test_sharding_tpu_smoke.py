"""TPU-backend sharding smoke (VERDICT r4 #9): the shard_map + psum
wavefront step must COMPILE AND RUN on the real backend, not only on the
virtual CPU mesh — a 1-device Mesh exercises the same partitioning,
collective lowering, and Pallas-inside-shard_map plumbing.

conftest.py pins every in-process test to the CPU platform, so this one
runs in a subprocess with the default (TPU-preferring) platform; it
skips cleanly on CPU-only machines."""

import os
import subprocess
import sys

import pytest

_CODE = r"""
import jax
if jax.devices()[0].platform == "cpu":
    print("NO-TPU")
    raise SystemExit(0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf, make_bsdf_sampler
from henjou_tpu.integrator.payload import Sky
from henjou_tpu.integrator.wavefront import wavefront_render
from henjou_tpu.runtime.camera import make_camera
from henjou_tpu.runtime.sharding import wavefront_sharded_step
from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
from henjou_tpu.scene.testscenes import cornell_box_scene

frame = build_frame_scene(build_device_scene(cornell_box_scene()))
sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(1.0))
cam = make_camera((0, 0, -4.5), (0, 0, 1), np.radians(45.0))
bs = make_bsdf_sampler(None)
beval = lambda hit, wo, wi: bsdf_eval(hit, wo, wi, None)

def wf(spp_offset):
    return wavefront_render(
        frame, sky, cam, 8, 8, 1, bs,
        bsdf_eval=beval, bsdf_pdf=bsdf_pdf, integrator="mis",
        seed=0, lanes=64, max_depth=3, spp_offset=spp_offset,
    )

mesh = Mesh(np.asarray(jax.devices()[:1]), ("d",))
step = wavefront_sharded_step(wf, mesh, 1)
c, a, n, traces, m2, cnt = step(jnp.uint32(0))
c.block_until_ready()
assert bool(jnp.isfinite(c).all()) and float(traces) > 0
print("TPU-SHARD-OK")
"""


def test_wavefront_sharded_step_on_real_backend():
    env = dict(os.environ)
    # undo conftest's virtual-CPU provisioning; keep the compile cache
    # so reruns are seconds, not a fresh Mosaic compile
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CODE], cwd=repo, env=env,
            capture_output=True, text=True, timeout=600,
        )
    except subprocess.TimeoutExpired:
        # TPU sessions must be strictly serialized (BASELINE.md round-5
        # ledger: two concurrent axon clients wedge the tunnel) — a
        # timeout here means the device is held by another process or
        # the tunnel is degraded, not that the sharding path is broken
        pytest.skip("TPU unreachable within 600s (busy or degraded tunnel)")
    out = proc.stdout + proc.stderr
    if "NO-TPU" in proc.stdout:
        pytest.skip("no TPU backend on this machine")
    assert proc.returncode == 0, out
    assert "TPU-SHARD-OK" in proc.stdout, out

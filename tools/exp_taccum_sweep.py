"""Offline sweep of the temporal-accumulation clamp/cap on the real
contest dump (CPU, no TPU): /root/dbg_temporal_f1.npz carries the f1
film, the banked f0 history, and the FIXED reprojection coords, so every
(clamp sigma, cap) variant can be scored end-to-end (accumulate -> SVGF
-> RMSE linear+srgb vs the 512-spp f1 truth) without re-rendering.

Context (BASELINE.md round-5 temporal ledger): post-projection-fix the
sigma=3 variance-aware clamp won in display space (srgb 0.01884 vs
spatial 0.01921) but let warped firefly energy through in linear
(0.08423 vs 0.05032) — this sweep picks the clamp that keeps the win in
BOTH domains."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)))


def rmse_srgb(a, b):
    def enc(x):
        x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
        return np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)

    return float(np.sqrt(np.mean((enc(a) - enc(b)) ** 2)))


def main():
    from henjou_tpu.post.denoise import (
        _bilinear_sample, _maxpool3, denoise_atrous_var,
    )

    d = np.load("/root/dbg_temporal_f1.npz")
    gt = np.load("/root/gt_rtcamp720gltf_f1.npz")["color"]
    color = jnp.asarray(d["color"])
    albedo = jnp.asarray(d["albedo"])
    normal = jnp.asarray(d["normal"])
    variance = jnp.asarray(d["variance"])
    count = jnp.asarray(d["count"], jnp.float32)
    px, py = jnp.asarray(d["px"]), jnp.asarray(d["py"])
    valid = jnp.asarray(d["valid"])
    pc = jnp.asarray(d["prev_color"])
    pv = jnp.asarray(d["prev_var"])
    pn_cnt = jnp.asarray(d["prev_count"])
    pa = jnp.asarray(d["prev_albedo"])
    pn = jnp.asarray(d["prev_normal"])

    base = np.asarray(denoise_atrous_var(color, albedo, normal, variance))
    print(f"spatial  : out {rmse(base, gt):.5f}  srgb {rmse_srgb(base, gt):.5f}")

    hist0, inb = _bilinear_sample(pc, px, py)
    pv_w, _ = _bilinear_sample(pv[..., None], px, py)
    pc_w, _ = _bilinear_sample(pn_cnt[..., None], px, py)
    pa_w, _ = _bilinear_sample(pa, px, py)
    pn_w, _ = _bilinear_sample(pn, px, py)
    da = jnp.sum((albedo - pa_w) ** 2, axis=-1, keepdims=True)
    dn = jnp.sum((normal - pn_w) ** 2, axis=-1, keepdims=True)
    ok = inb * valid[..., None].astype(color.dtype)
    gate = ok * jnp.exp(-da / 0.01) * jnp.exp(-dn / 0.04)
    lo3, hi3 = -_maxpool3(-color), _maxpool3(color)
    sig = jnp.sqrt(jnp.maximum(variance, 0.0))[..., None]

    # noise-normalized LUMINANCE gate: the albedo/normal gate is blind
    # to view-dependent radiance change (the contest scene's moving
    # specular highlight carries 87% of the history MSE in the top 1%
    # of pixels at gate=1.0). Compare warped-history luminance to a 3x3
    # mean of the current raw film (noise sigma/3) and reject when the
    # difference exceeds what the combined noise can explain.
    def lum(x):
        return (
            0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]
        )

    l_cur = lum(color)[..., None]
    l3 = jnp.zeros_like(l_cur)
    p = jnp.pad(l_cur, ((1, 1), (1, 1), (0, 0)), mode="edge")
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            l3 = l3 + p[dy : dy + l_cur.shape[0], dx : dx + l_cur.shape[1]]
    l3 = l3 / 9.0
    l_h = lum(hist0)[..., None]
    v_c3 = jnp.maximum(variance, 0.0)[..., None] / 9.0
    v_hh = jnp.maximum(pv_w, 0.0)
    dl2 = (l_h - l3) ** 2

    cap = 4.0
    for k in (None, 1.0, 2.0, 3.0, 5.0):
        for rel in (0.05, 0.15):
            if k is None and rel != 0.05:
                continue
            g = gate
            if k is not None:
                denom = k * k * (
                    v_c3 + v_hh + (rel * l3) ** 2 + 1e-6
                )
                g = gate * jnp.exp(-dl2 / denom)
            hist = jnp.clip(hist0, lo3 - sig, hi3 + sig)
            n_c = jnp.maximum(count, 1.0)[..., None]
            n_h = g * jnp.minimum(jnp.maximum(pc_w, 0.0), cap * n_c)
            n_t = n_c + n_h
            merged = (n_c * color + n_h * hist) / n_t
            v_c = jnp.maximum(variance, 0.0)[..., None]
            var_m = ((n_c * n_c * v_c + n_h * n_h * v_hh) / (n_t * n_t))[..., 0]
            out = np.asarray(denoise_atrous_var(merged, albedo, normal, var_m))
            tag = "  none " if k is None else f"k={k:.0f} r={rel:.2f}"
            print(
                f"lumgate {tag}: merged {rmse(merged, gt):.5f}  "
                f"out {rmse(out, gt):.5f}  srgb {rmse_srgb(out, gt):.5f}  "
                f"neff {float(n_t.mean()):.1f}", flush=True,
            )


if __name__ == "__main__":
    main()

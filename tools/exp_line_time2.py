"""One-off: time detect_lines internal stages on chip."""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.ops.image import bilinear_sample, gaussian_blur, sobel_gradients
from orb_line_slam_tpu.ops.lines import WALK_STEPS, WALK_STRIDE, GAP_TOL, _nearest_sample
from orb_line_slam_tpu.ops.topk_grid import select_topk_grid


def bench(name, fn, n=30):
    for _ in range(6):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<44}{ms:9.2f} ms")
    return out


@functools.partial(jax.jit, static_argnames=("stage",))
def partial_detect(img, stage: int, n_lines=128, min_mag=30.0, cell=24):
    x = img.astype(jnp.float32)
    gx, gy = sobel_gradients(x)
    mag2 = gx * gx + gy * gy
    hh, ww = x.shape
    ys = jnp.arange(hh)[:, None]
    xs = jnp.arange(ww)[None, :]
    interior = (ys >= 4) & (ys < hh - 4) & (xs >= 4) & (xs < ww - 4)
    mag2 = jnp.where(interior, mag2, 0.0)
    mag = jnp.sqrt(mag2)
    edge = (mag2 > min_mag * min_mag).astype(jnp.float32)
    inv = edge / jnp.maximum(mag2, 1e-9)
    c2 = -(gx * gx - gy * gy) * inv
    s2 = -(2.0 * gx * gy) * inv
    c2b = gaussian_blur(c2, sigma=2.0, radius=4)
    s2b = gaussian_blur(s2, sigma=2.0, radius=4)
    score = edge * jnp.sqrt(c2b * c2b + s2b * s2b)
    if stage == 0:
        return score
    xy, resp, valid = select_topk_grid(score, cell, 2, n_lines, 0.06)
    if stage == 1:
        return xy, resp, valid
    c2p = c2b[xy[:, 1], xy[:, 0]]
    s2p = s2b[xy[:, 1], xy[:, 0]]
    theta = jnp.mod(0.5 * jnp.arctan2(s2p, c2p), jnp.pi)
    field = jnp.stack([edge, c2, s2], axis=-1)
    steps = WALK_STRIDE * jnp.arange(1, WALK_STEPS + 1, dtype=jnp.float32)
    centers = xy.astype(jnp.float32)

    def walk(direction_sign, theta, dxy):
        pts = centers[:, None, :] + direction_sign * dxy[:, None, :] * steps[None, :, None]
        s = _nearest_sample(field, pts)
        e = s[..., 0] > 0.25
        nrm2 = jnp.sqrt(s[..., 1] ** 2 + s[..., 2] ** 2) + 1e-6
        cos2 = (
            s[..., 1] * jnp.cos(2 * theta)[:, None]
            + s[..., 2] * jnp.sin(2 * theta)[:, None]
        ) / nrm2
        good = e & (cos2 > 0.5)
        miss = ~good
        run = miss
        for sft in range(1, GAP_TOL + 1):
            run = run & jnp.pad(miss, ((0, 0), (sft, 0)))[:, : miss.shape[1]]
        dead = jnp.cumsum(run.astype(jnp.int32), axis=1) > 0
        alive = ~dead
        ga = good & alive
        extent = jnp.max(jnp.where(ga, steps[None, :], 0.0), axis=1)
        supported = WALK_STRIDE * jnp.sum(ga.astype(jnp.float32), axis=1)
        return extent, supported

    def both_walks(theta):
        dxy = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
        ext_p, sup_p = walk(+1.0, theta, dxy)
        ext_m, sup_m = walk(-1.0, theta, dxy)
        p0 = centers - dxy * ext_m[:, None]
        p1 = centers + dxy * ext_p[:, None]
        return p0, p1, ext_p + ext_m, sup_p + sup_m + 1.0

    p0, p1, _, _ = both_walks(theta)
    if stage == 2:
        return p0, p1
    d01 = p1 - p0
    theta = jnp.mod(jnp.arctan2(d01[:, 1], d01[:, 0]), jnp.pi)
    p0, p1, length, supported = both_walks(theta)
    if stage == 3:
        return p0, p1
    return p0, p1


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (376, 1241), dtype=np.uint8))
    bench("grad+coherence+score", lambda: partial_detect(img, 0))
    bench("+topk_grid", lambda: partial_detect(img, 1))
    bench("+walk pass 1 (2 walks)", lambda: partial_detect(img, 2))
    bench("+walk pass 2 (4 walks)", lambda: partial_detect(img, 3))
    from orb_line_slam_tpu.ops.lines import detect_lines
    f = jax.jit(lambda im: detect_lines(im, n_lines=128))
    bench("full detect_lines (+polish+3refit)", lambda: f(img))


if __name__ == "__main__":
    main()

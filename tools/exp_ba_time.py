"""Time bundle_adjust and bundle_adjust_pl end-to-end at bench buckets."""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.backend.local_ba import bundle_adjust
from orb_line_slam_tpu.backend.line_ba import bundle_adjust_pl
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics

cam = CameraIntrinsics(
    fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
    width=1241, height=376,
)


def make_args(C, P, O, seed=1):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-20, 20, P), rng.uniform(-5, 5, P), rng.uniform(5, 60, P)], -1
    ).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    t = np.zeros((C, 3), np.float32)
    t[:, 0] = np.arange(C) * 0.5
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    obs_lm = rng.integers(0, P, O).astype(np.int32)
    xc = np.einsum("oij,oj->oi", R[obs_cam], pts[obs_lm]) + t[obs_cam]
    z = np.maximum(xc[:, 2], 1.0)
    obs = np.stack(
        [
            cam.fx * xc[:, 0] / z + cam.cx,
            cam.fy * xc[:, 1] / z + cam.cy,
            cam.fx * xc[:, 0] / z + cam.cx - cam.bf / z,
        ],
        -1,
    ).astype(np.float32)
    fixed = np.zeros(C, bool)
    fixed[: C // 2] = True
    return (
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(fixed),
        jnp.asarray(pts), jnp.ones(P, bool),
        jnp.asarray(obs_cam), jnp.asarray(obs_lm), jnp.asarray(obs),
        jnp.zeros(O, jnp.int32), jnp.ones(O, bool),
    )


def timeit(name, fn, n=6):
    r = fn()
    float(np.asarray(r.chi2))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(np.asarray(r.chi2))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<46}{ms:9.2f} ms ({ms / 15:.2f} ms/iter)")


for C, P, O in [(24, 4096, 12288), (32, 4096, 16384)]:
    args = make_args(C, P, O)
    timeit(f"bundle_adjust C={C} P={P} O={O}", lambda: bundle_adjust(*args, cam))

Lc, Lo = 128, 1024
largs = (
    jnp.tile(jnp.eye(3, dtype=jnp.float32), (Lc, 1, 1)),
    jnp.ones((Lc, 2), jnp.float32), jnp.zeros(Lc, bool),
    jnp.zeros(Lo, jnp.int32), jnp.zeros(Lo, jnp.int32),
    jnp.zeros((Lo, 2), jnp.float32), jnp.zeros((Lo, 2), jnp.float32),
    jnp.zeros(Lo, jnp.int32), jnp.zeros(Lo, bool),
)
for C, P, O in [(24, 4096, 12288)]:
    args = make_args(C, P, O)
    timeit(
        f"bundle_adjust_pl C={C} P={P} O={O} L={Lc}",
        lambda: bundle_adjust_pl(*args, *largs, cam, 1.2),
    )

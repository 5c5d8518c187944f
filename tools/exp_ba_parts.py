"""One-off: time the parts of a local-BA LM iteration on chip."""
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

from orb_line_slam_tpu.backend.assembly import (
    assemble, assemble_coupling, inv33, onehot_f32,
)
from orb_line_slam_tpu.backend.local_ba import _residuals_and_jacs
from orb_line_slam_tpu.backend.residuals import make_point_residual_fn
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics

cam = CameraIntrinsics(
    fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
    width=1241, height=376,
)
C, P, O = 24, 4096, 12288
rng = np.random.default_rng(1)
pts = np.stack(
    [rng.uniform(-20, 20, P), rng.uniform(-5, 5, P), rng.uniform(5, 60, P)], -1
).astype(np.float32)
R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (C, 1, 1)))
t = jnp.zeros((C, 3))
obs_cam = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
obs_lm = jnp.asarray(rng.integers(0, P, O).astype(np.int32))
obs = jnp.asarray(rng.uniform(0, 300, (O, 3)).astype(np.float32))
points = jnp.asarray(pts)
is_stereo = obs[:, 2] > 0
point_fn = make_point_residual_fn(cam)


def bench(name, fn, n=20):
    for _ in range(4):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<44}{ms:9.3f} ms")
    return out


@jax.jit
def stage_rj(R, t, points):
    return _residuals_and_jacs(point_fn, R, t, points, obs_cam, obs_lm, obs, is_stereo)


@jax.jit
def stage_rj_blocks(R, t, points):
    r, Jc, Jp = _residuals_and_jacs(
        point_fn, R, t, points, obs_cam, obs_lm, obs, is_stereo
    )
    w = jnp.sum(r * r, -1)
    JcT_Jc = jnp.einsum("odi,odj,o->oij", Jc, Jc, w)
    JpT_Jp = jnp.einsum("odi,odj,o->oij", Jp, Jp, w)
    JcT_Jp = jnp.einsum("odi,odj,o->oij", Jc, Jp, w)
    gc_o = jnp.einsum("odi,od,o->oi", Jc, r, w)
    gp_o = jnp.einsum("odi,od,o->oi", Jp, r, w)
    return JcT_Jc, JpT_Jp, JcT_Jp, gc_o, gp_o


oh_cam = onehot_f32(np.asarray(obs_cam), C)
oh_lm = onehot_f32(np.asarray(obs_lm), P)


@jax.jit
def stage_assemble(JcT_Jc, JpT_Jp, JcT_Jp, gc_o, gp_o):
    Hcc = assemble(oh_cam, JcT_Jc)
    Hpp = assemble(oh_lm, JpT_Jp)
    B = assemble_coupling(oh_lm, oh_cam, JcT_Jp)
    gc = assemble(oh_cam, gc_o)
    gp = assemble(oh_lm, gp_o)
    return Hcc, Hpp, B, gc, gp


@jax.jit
def stage_schur(Hcc, Hpp, B, gc, gp):
    V = inv33(Hpp + 1e-6 * jnp.eye(3))
    Wp = jnp.einsum("pcij,pjk->pcik", B, V)
    A1 = Wp.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    A2 = B.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    idx = jnp.arange(C)
    Hcc_full = (
        jnp.zeros((C, 6, C, 6)).at[idx, :, idx, :].set(Hcc).reshape(C * 6, C * 6)
    )
    S = Hcc_full - jnp.dot(
        A1, A2.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rhs = -(gc - jnp.einsum("pcik,pk->ci", Wp, gp)).reshape(C * 6)
    return S, rhs, V


@jax.jit
def stage_solve(S, rhs):
    return jnp.linalg.solve(S + 144.0 * jnp.eye(C * 6), rhs)


blocks = bench("residuals+jacs (O=12288)", lambda: stage_rj(R, t, points))
bl = bench("residuals+jacs+blocks", lambda: stage_rj_blocks(R, t, points))
asm = bench("assembly (one-hot matmuls)", lambda: stage_assemble(*bl))
sch = bench("schur reduce (inv33+coupling+S)", lambda: stage_schur(*asm))
bench("dense solve 144x144", lambda: stage_solve(sch[0], sch[1]))


@jax.jit
def full_iter(R, t, points):
    bl = stage_rj_blocks.__wrapped__(R, t, points)
    asm = stage_assemble.__wrapped__(*bl)
    S, rhs, V = stage_schur.__wrapped__(*asm)
    dc = jnp.linalg.solve(S + 144.0 * jnp.eye(C * 6), rhs)
    return dc


bench("fused full iteration", lambda: full_iter(R, t, points))

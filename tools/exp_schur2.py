"""One-off: compare Schur-reduction formulations on chip.

A) current: B + Wp, two transposes, two matmuls.
B) dot_general contraction without explicit transposes.
C) Cholesky-folded: one BL tensor, symmetric self-product.
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.backend.assembly import (
    assemble, assemble_coupling, inv33, onehot_f32,
)

C, P, O = 24, 4096, 12288
rng = np.random.default_rng(0)
JcT_Jp = jnp.asarray(rng.standard_normal((O, 6, 3)).astype(np.float32))
JpT_Jp_ = rng.standard_normal((O, 3, 3)).astype(np.float32)
JpT_Jp = jnp.asarray(np.einsum("oij,okj->oik", JpT_Jp_, JpT_Jp_) + 0.1 * np.eye(3, dtype=np.float32))
gp_o = jnp.asarray(rng.standard_normal((O, 3)).astype(np.float32))
gc = jnp.asarray(rng.standard_normal((C, 6)).astype(np.float32))
dc = jnp.asarray(rng.standard_normal((C, 6)).astype(np.float32))
obs_cam = np.asarray(rng.integers(0, C, O), np.int32)
obs_lm = np.asarray(rng.integers(0, P, O), np.int32)
oh_cam = onehot_f32(jnp.asarray(obs_cam), C)
oh_lm = onehot_f32(jnp.asarray(obs_lm), P)


def chol33(V):
    """Closed-form Cholesky of a [..., 3, 3] SPD batch (lower)."""
    a = jnp.sqrt(jnp.maximum(V[..., 0, 0], 1e-30))
    b = V[..., 1, 0] / a
    c = V[..., 2, 0] / a
    d = jnp.sqrt(jnp.maximum(V[..., 1, 1] - b * b, 1e-30))
    e = (V[..., 2, 1] - c * b) / d
    f = jnp.sqrt(jnp.maximum(V[..., 2, 2] - c * c - e * e, 1e-30))
    z = jnp.zeros_like(a)
    return jnp.stack(
        [a, z, z, b, d, z, c, e, f], axis=-1
    ).reshape(*V.shape[:-2], 3, 3)


@jax.jit
def variant_a():
    Hpp = assemble(oh_lm, JpT_Jp)
    V = inv33(Hpp + 1e-6 * jnp.eye(3))
    B = assemble_coupling(oh_lm, oh_cam, JcT_Jp)
    gp = assemble(oh_lm, gp_o)
    Wp = jnp.einsum("pcij,pjk->pcik", B, V)
    A1 = Wp.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    A2 = B.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    S = -jnp.dot(A1, A2.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    rhs = -(gc - jnp.einsum("pcik,pk->ci", Wp, gp)).reshape(C * 6)
    dp = -jnp.einsum("pij,pj->pi", V, gp + jnp.einsum("pcij,ci->pj", B, dc))
    return S, rhs, dp


@jax.jit
def variant_b():
    Hpp = assemble(oh_lm, JpT_Jp)
    V = inv33(Hpp + 1e-6 * jnp.eye(3))
    B = assemble_coupling(oh_lm, oh_cam, JcT_Jp)
    gp = assemble(oh_lm, gp_o)
    Wp = jnp.einsum("pcij,pjk->pcik", B, V)
    S = -jax.lax.dot_general(
        Wp, B, dimension_numbers=(((0, 3), (0, 3)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).transpose(0, 1, 2, 3).reshape(C * 6, C * 6)
    rhs = -(gc - jnp.einsum("pcik,pk->ci", Wp, gp)).reshape(C * 6)
    dp = -jnp.einsum("pij,pj->pi", V, gp + jnp.einsum("pcij,ci->pj", B, dc))
    return S, rhs, dp


@jax.jit
def variant_c():
    Hpp = assemble(oh_lm, JpT_Jp)
    V = inv33(Hpp + 1e-6 * jnp.eye(3))
    L = chol33(V)
    Gp = jnp.einsum("oij,ojk->oik", JcT_Jp, L[jnp.asarray(obs_lm)])
    BL = assemble_coupling(oh_lm, oh_cam, Gp)
    gp = assemble(oh_lm, gp_o)
    u = jnp.einsum("pji,pj->pi", L, gp)  # L^T gp
    S = -jax.lax.dot_general(
        BL, BL, dimension_numbers=(((0, 3), (0, 3)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(C * 6, C * 6)
    rhs = -(gc - jnp.einsum("pcik,pk->ci", BL, u)).reshape(C * 6)
    blt_dc = jnp.einsum("pcik,ci->pk", BL, dc)
    dp = -(jnp.einsum("pij,pj->pi", V, gp) + jnp.einsum("pij,pj->pi", L, blt_dc))
    return S, rhs, dp


def bench(name, fn, n=30):
    for _ in range(4):
        out = fn()
    np.asarray(out[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out[0].ravel()[0:1])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<34}{ms:9.3f} ms")
    return out


a = bench("A: current (B+Wp, transposes)", variant_a)
b = bench("B: dot_general contraction", variant_b)
c = bench("C: chol-folded single BL", variant_c)
for name, x in (("B", b), ("C", c)):
    for i, (xa, xb) in enumerate(zip(a, x)):
        d = float(jnp.max(jnp.abs(xa - xb)) / (jnp.max(jnp.abs(xa)) + 1e-9))
        print(f"  {name} vs A out[{i}] rel_max_err = {d:.2e}")

"""Experiment: scatter-add vs one-hot-matmul Hessian assembly in BA.

The local-BA LM iteration spends its time in three scatter-adds
(Hcc [C,6,6], Hpp [P,3,3], coupling B [P*C,18]) plus a batched
jnp.linalg.inv of [P,3,3].  On TPU a scatter-add lowers to a serialized
update loop; the same reduction expressed as a one-hot matmul rides the
MXU.  This measures both at the bench's bucket size.
"""

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


def bench(name, fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<44}{ms:9.3f} ms")
    return out


C, P, O = 24, 4096, 12288
rng = np.random.default_rng(0)
obs_cam = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
obs_lm = jnp.asarray(rng.integers(0, P, O).astype(np.int32))
JcT_Jp = jnp.asarray(rng.normal(size=(O, 6, 3)).astype(np.float32))
JpT_Jp = jnp.asarray(rng.normal(size=(O, 3, 3)).astype(np.float32))
JcT_Jc = jnp.asarray(rng.normal(size=(O, 6, 6)).astype(np.float32))
Hpp_in = jnp.asarray(rng.normal(size=(P, 3, 3)).astype(np.float32))
Hpp_spd = jnp.einsum("pij,pkj->pik", Hpp_in, Hpp_in) + 3.0 * jnp.eye(3)


@jax.jit
def scatter_all(obs_cam, obs_lm, JcT_Jc, JpT_Jp, JcT_Jp):
    Hcc = jnp.zeros((C, 6, 6)).at[obs_cam].add(JcT_Jc)
    Hpp = jnp.zeros((P, 3, 3)).at[obs_lm].add(JpT_Jp)
    B = (
        jnp.zeros((P * C, 18))
        .at[obs_lm * C + obs_cam]
        .add(JcT_Jp.reshape(-1, 18))
        .reshape(P, C, 6, 3)
    )
    return Hcc.sum() + Hpp.sum() + B.sum()


def make_onehots(obs_cam, obs_lm):
    ohc = (obs_cam[None, :] == jnp.arange(C)[:, None]).astype(jnp.float32)
    ohp = (obs_lm[None, :] == jnp.arange(P)[:, None]).astype(jnp.float32)
    return ohc, ohp


@jax.jit
def onehot_all(ohc, ohp, obs_cam, JcT_Jc, JpT_Jp, JcT_Jp):
    f32 = jnp.float32
    Hcc = (ohc @ JcT_Jc.reshape(O, 36)).reshape(C, 6, 6)
    Hpp = (ohp @ JpT_Jp.reshape(O, 9)).reshape(P, 3, 3)
    # Row-local placement of each [6,3] block at column range cam*18.
    ohc_T = ohc.T  # [O, C]
    placed = jnp.einsum("oc,oj->ocj", ohc_T, JcT_Jp.reshape(O, 18)).reshape(O, C * 18)
    B = (ohp @ placed).reshape(P, C, 6, 3)
    return Hcc.sum() + Hpp.sum() + B.sum()


@jax.jit
def inv_lu(H):
    return jnp.linalg.inv(H)


@jax.jit
def inv_cofactor(H):
    a, b, c = H[:, 0, 0], H[:, 0, 1], H[:, 0, 2]
    d, e, f = H[:, 1, 0], H[:, 1, 1], H[:, 1, 2]
    g, h, i = H[:, 2, 0], H[:, 2, 1], H[:, 2, 2]
    A = e * i - f * h
    B_ = -(d * i - f * g)
    C_ = d * h - e * g
    det = a * A + b * B_ + c * C_
    inv_det = 1.0 / det
    out = jnp.stack(
        [
            A, -(b * i - c * h), (b * f - c * e),
            B_, (a * i - c * g), -(a * f - c * d),
            C_, -(a * h - b * g), (a * e - b * d),
        ],
        axis=-1,
    ).reshape(-1, 3, 3) * inv_det[:, None, None]
    return out


print(f"C={C} P={P} O={O}")
bench("scatter-add (current)", scatter_all, obs_cam, obs_lm, JcT_Jc, JpT_Jp, JcT_Jp)
ohc, ohp = make_onehots(obs_cam, obs_lm)
ohc, ohp = jax.block_until_ready((ohc, ohp))
bench("one-hot matmul (hoisted one-hots)", onehot_all, ohc, ohp, obs_cam, JcT_Jc, JpT_Jp, JcT_Jp)
bench("inv 3x3 LU (current)", inv_lu, Hpp_spd)
bench("inv 3x3 cofactor", inv_cofactor, Hpp_spd)
err = jnp.abs(inv_cofactor(Hpp_spd) - inv_lu(Hpp_spd)).max()
print("cofactor max err:", float(err))

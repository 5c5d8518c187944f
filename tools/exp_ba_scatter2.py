"""Follow-up: which scatter dominates, and bf16 vs f32 one-hot cost."""

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
    print(f"{name:<52}{ms:9.3f} ms")
    return out


C, P, O = 24, 4096, 12288
rng = np.random.default_rng(0)
obs_cam = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
obs_lm = jnp.asarray(rng.integers(0, P, O).astype(np.int32))
JcT_Jp = jnp.asarray(rng.normal(size=(O, 6, 3)).astype(np.float32))
JpT_Jp = jnp.asarray(rng.normal(size=(O, 3, 3)).astype(np.float32))
JcT_Jc = jnp.asarray(rng.normal(size=(O, 6, 6)).astype(np.float32))
gp_o = jnp.asarray(rng.normal(size=(O, 3)).astype(np.float32))


@jax.jit
def scatter_B(obs_cam, obs_lm, JcT_Jp):
    B = (
        jnp.zeros((P * C, 18))
        .at[obs_lm * C + obs_cam]
        .add(JcT_Jp.reshape(-1, 18))
        .reshape(P, C, 6, 3)
    )
    return B.sum()


@jax.jit
def scatter_Hpp(obs_lm, JpT_Jp):
    return jnp.zeros((P, 3, 3)).at[obs_lm].add(JpT_Jp).sum()


@jax.jit
def scatter_Hcc(obs_cam, JcT_Jc):
    return jnp.zeros((C, 6, 6)).at[obs_cam].add(JcT_Jc).sum()


@jax.jit
def scatter_gp(obs_lm, gp_o):
    return jnp.zeros((P, 3)).at[obs_lm].add(gp_o).sum()


def onehot(idx, n, dtype):
    return (idx[None, :] == jnp.arange(n)[:, None]).astype(dtype)


@jax.jit
def onehot_B_f32(obs_cam, obs_lm, JcT_Jp):
    ohp = onehot(obs_lm, P, jnp.float32)
    ohc_T = onehot(obs_cam, C, jnp.float32).T
    placed = jnp.einsum("oc,oj->ocj", ohc_T, JcT_Jp.reshape(O, 18)).reshape(O, C * 18)
    return (ohp @ placed).reshape(P, C, 6, 3).sum()


@jax.jit
def onehot_B_bf16(obs_cam, obs_lm, JcT_Jp):
    ohp = onehot(obs_lm, P, jnp.bfloat16)
    ohc_T = onehot(obs_cam, C, jnp.bfloat16).T
    placed = jnp.einsum(
        "oc,oj->ocj", ohc_T, JcT_Jp.reshape(O, 18).astype(jnp.bfloat16)
    ).reshape(O, C * 18)
    out = jax.lax.dot(ohp, placed, preferred_element_type=jnp.float32)
    return out.reshape(P, C, 6, 3).sum()


@jax.jit
def onehot_Hpp_f32(obs_lm, JpT_Jp):
    ohp = onehot(obs_lm, P, jnp.float32)
    return (ohp @ JpT_Jp.reshape(O, 9)).reshape(P, 3, 3).sum()


@jax.jit
def onehot_Hpp_bf16(obs_lm, JpT_Jp):
    ohp = onehot(obs_lm, P, jnp.bfloat16)
    out = jax.lax.dot(
        ohp, JpT_Jp.reshape(O, 9).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(P, 3, 3).sum()


bench("scatter B only", scatter_B, obs_cam, obs_lm, JcT_Jp)
bench("scatter Hpp only", scatter_Hpp, obs_lm, JpT_Jp)
bench("scatter Hcc only", scatter_Hcc, obs_cam, JcT_Jc)
bench("scatter gp only", scatter_gp, obs_lm, gp_o)
bench("onehot B f32", onehot_B_f32, obs_cam, obs_lm, JcT_Jp)
bench("onehot B bf16->f32acc", onehot_B_bf16, obs_cam, obs_lm, JcT_Jp)
bench("onehot Hpp f32", onehot_Hpp_f32, obs_lm, JpT_Jp)
bench("onehot Hpp bf16->f32acc", onehot_Hpp_bf16, obs_lm, JpT_Jp)

"""One-off: compare small dense SPD solve strategies on chip."""
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

n = 144
rng = np.random.default_rng(0)
A = rng.standard_normal((n, n)).astype(np.float32)
S = jnp.asarray(A @ A.T + n * np.eye(n, dtype=np.float32))
rhs = jnp.asarray(rng.standard_normal(n).astype(np.float32))


def bench(name, fn, nrep=30):
    for _ in range(4):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    ms = (time.perf_counter() - t0) / nrep * 1e3
    err = float(jnp.linalg.norm(S @ out - rhs) / jnp.linalg.norm(rhs))
    print(f"{name:<34}{ms:9.3f} ms   rel_res={err:.2e}")
    return out


bench("jnp.linalg.solve (LU)", jax.jit(lambda: jnp.linalg.solve(S, rhs)))
bench("cho_factor/cho_solve", jax.jit(
    lambda: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S, lower=True), rhs)
))


@jax.jit
def cg_jacobi(S, rhs, iters=40):
    dinv = 1.0 / jnp.diag(S)

    def body(carry, _):
        x, r, z, p = carry
        Sp = S @ p
        rz = jnp.dot(r, z)
        alpha = rz / jnp.maximum(jnp.dot(p, Sp), 1e-20)
        x = x + alpha * p
        r2 = r - alpha * Sp
        z2 = dinv * r2
        beta = jnp.dot(r2, z2) / jnp.maximum(rz, 1e-20)
        p = z2 + beta * p
        return (x, r2, z2, p), None

    x0 = jnp.zeros_like(rhs)
    z0 = dinv * rhs
    (x, _, _, _), _ = jax.lax.scan(body, (x0, rhs, z0, z0), None, length=iters)
    return x


bench("CG jacobi 40 iters", lambda: cg_jacobi(S, rhs))


@jax.jit
def cg_block_jacobi(S, rhs, iters=24):
    # 6x6 block-Jacobi preconditioner (camera blocks)
    C = n // 6
    blocks = S.reshape(C, 6, C, 6)[jnp.arange(C), :, jnp.arange(C), :]
    binv = jnp.linalg.inv(blocks + 1e-8 * jnp.eye(6))

    def prec(r):
        return jnp.einsum("cij,cj->ci", binv, r.reshape(C, 6)).reshape(-1)

    def body(carry, _):
        x, r, z, p = carry
        Sp = S @ p
        rz = jnp.dot(r, z)
        alpha = rz / jnp.maximum(jnp.dot(p, Sp), 1e-20)
        x = x + alpha * p
        r2 = r - alpha * Sp
        z2 = prec(r2)
        beta = jnp.dot(r2, z2) / jnp.maximum(rz, 1e-20)
        p = z2 + beta * p
        return (x, r2, z2, p), None

    x0 = jnp.zeros_like(rhs)
    z0 = prec(rhs)
    (x, _, _, _), _ = jax.lax.scan(body, (x0, rhs, z0, z0), None, length=iters)
    return x


bench("CG block-jacobi 24 iters", lambda: cg_block_jacobi(S, rhs))


# Explicit inverse via Neumann-free: just check inv cost
bench("jnp.linalg.inv @ rhs", jax.jit(lambda: jnp.linalg.inv(S) @ rhs))

"""One-off: time the line front-end's sub-programs on chip."""
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


def main():
    from orb_line_slam_tpu.config import LineConfig
    from orb_line_slam_tpu.frontend.line_extractor import build_line_features
    from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
    from orb_line_slam_tpu.ops.image import sobel_gradients
    from orb_line_slam_tpu.ops.lbd import lbd_descriptors
    from orb_line_slam_tpu.ops.lines import detect_lines, merge_collinear

    cam = CameraIntrinsics(
        fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
        width=1241, height=376,
    )
    cfg = LineConfig(enabled=True, n_lines=128)
    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.integers(0, 255, (376, 1241), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 255, (376, 1241), dtype=np.uint8))

    f32 = l.astype(jnp.float32)
    det1 = jax.jit(lambda im: detect_lines(im, n_lines=128))
    bench("detect_lines (1 img)", lambda: det1(f32))

    imgs = jnp.stack([l, r]).astype(jnp.float32)
    det2 = jax.jit(
        lambda ims: jax.vmap(lambda im: detect_lines(im, n_lines=128))(ims)
    )
    bench("detect_lines (vmapped pair)", lambda: det2(imgs))

    det_merge = jax.jit(
        lambda ims: jax.vmap(
            lambda im: merge_collinear(detect_lines(im, n_lines=128))
        )(ims)
    )
    d = bench("detect+merge (pair)", lambda: det_merge(imgs))

    @jax.jit
    def with_lbd(ims):
        gxs, gys = sobel_gradients(ims)
        det = jax.vmap(
            lambda im, gx, gy: merge_collinear(
                detect_lines(im, n_lines=128, grads=(gx, gy))
            )
        )(ims, gxs, gys)
        descs = jax.vmap(
            lambda im, p0, p1, v, gx, gy: lbd_descriptors(
                im, p0, p1, v, grads=(gx, gy))
        )(ims, det.p0, det.p1, det.valid, gxs, gys)
        return det, descs

    bench("detect+merge+lbd (pair)", lambda: with_lbd(imgs))
    bench("build_line_features (full)",
          lambda: build_line_features(l, r, cam, cfg))


if __name__ == "__main__":
    main()

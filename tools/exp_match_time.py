"""Time the matching/triangulation/fuse device programs in isolation."""

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

from orb_line_slam_tpu.config import OrbConfig, SlamConfig
from orb_line_slam_tpu.frontend.frame import Frame
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.matching.point_matcher import (
    resolve_duplicates, search_by_projection,
)
from orb_line_slam_tpu.ops.hamming import hamming_matrix, knn2

cam = CameraIntrinsics(
    fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
    width=1241, height=376,
)
cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=2000, n_levels=8))
scales = cfg.orb.level_scales


def bench(name, fn, *args, n=30):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<52}{ms:9.3f} ms")
    return out


rng = np.random.default_rng(0)
N = 2000
da = jnp.asarray(rng.integers(0, 256, (2048, 32), dtype=np.uint8))
db = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.uint8))

ham = jax.jit(lambda a, b: hamming_matrix(a, b).sum())
bench("hamming_matrix 2048x2000 (sum)", ham, da, db)

knn = jax.jit(lambda a, b: knn2(hamming_matrix(a, b))[0].sum())
bench("hamming+knn2 2048x2000", knn, da, db)

frame = Frame(
    xy=jnp.asarray(rng.uniform(0, 1200, (N, 2)).astype(np.float32)),
    response=jnp.zeros(N, jnp.float32),
    angle=jnp.zeros(N, jnp.float32),
    octave=jnp.asarray(rng.integers(0, 8, N, dtype=np.int32)),
    desc=db,
    valid=jnp.ones(N, bool),
    u_right=jnp.asarray(rng.uniform(0, 1200, N).astype(np.float32)),
    depth=jnp.asarray(rng.uniform(1, 50, N).astype(np.float32)),
)
M = 2048
pts = jnp.asarray(
    np.stack([rng.uniform(-20, 20, M), rng.uniform(-5, 5, M), rng.uniform(5, 60, M)], -1).astype(np.float32)
)
R = jnp.eye(3)
t = jnp.zeros(3)
maxd = jnp.full(M, 60.0)
mind = jnp.full(M, 1.0)
nrm = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (M, 1))


def sbp():
    m = search_by_projection(
        pts, da, jnp.ones(M, bool), jnp.zeros(M, jnp.int32), R, t, frame,
        cam, scales, radius=3.0, max_dist=50, ratio=1.0, check_ur=True,
        max_dist_p=maxd, min_dist_p=mind, normal_p=nrm, oct_tol=2,
    )
    return resolve_duplicates(m, M).idx.sum()


bench("search_by_projection 2048->2000 +dedup", jax.jit(sbp))

from orb_line_slam_tpu.slam_map.triangulation import triangulate_batch

xy1 = frame.xy
oct1 = frame.octave
av = jnp.ones(N, bool)
Nn = 3
xy2s = jnp.tile(xy1, (Nn, 1, 1))
desc2s = jnp.tile(db, (Nn, 1, 1))
oct2s = jnp.tile(oct1, (Nn, 1))
av2 = jnp.ones((Nn, N), bool)
R2s = jnp.tile(jnp.eye(3), (Nn, 1, 1))
t2s = jnp.asarray(np.array([[0.5, 0, 0], [1.0, 0, 0], [1.5, 0, 0]], np.float32))
pv = jnp.ones(Nn, bool)

bench(
    "triangulate_batch 3 pairs 2000x2000",
    lambda: triangulate_batch(
        xy1, db, oct1, av, R, t, xy2s, desc2s, oct2s, av2, R2s, t2s, pv,
        cam, 1.2,
    ),
    n=10,
)

from orb_line_slam_tpu.slam_map.fuse import _fuse_program, FUSE_NN
import jax.tree_util as jtu

nb_frames = jtu.tree_map(lambda x: jnp.stack([x] * FUSE_NN), frame)
pool = 4096
bench(
    "_fuse_program own=2048 pool=4096 nn=3",
    lambda: _fuse_program(
        pts, da, jnp.zeros(M, jnp.int32), jnp.ones(M, bool), maxd, mind, nrm,
        jnp.tile(pts, (2, 1))[:pool], jnp.tile(da, (2, 1))[:pool],
        jnp.zeros(pool, jnp.int32), jnp.ones(pool, bool),
        jnp.tile(maxd, 2)[:pool], jnp.tile(mind, 2)[:pool],
        jnp.tile(nrm, (2, 1))[:pool],
        nb_frames, R2s, t2s, jnp.ones(FUSE_NN, bool),
        frame, R, t, cam, scales,
    ),
    n=10,
)

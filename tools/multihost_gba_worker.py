"""Worker process for the 2-process CPU multi-host GBA test.

Usage:  python tools/multihost_gba_worker.py <coordinator> <nprocs> <pid> <out>

Each process joins the distributed runtime with 4 virtual CPU devices
(-> an 8-device process-spanning mesh), builds the SAME synthetic
global-BA problem from a fixed seed, runs the landmark-sharded
CG-on-Schur adjuster over the global mesh, and process 0 compares the
solved poses against the single-process dense solve, writing
"OK <max_diff>" or "FAIL <max_diff>" to <out>.
"""

import sys

coordinator, nprocs, pid, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orb_line_slam_tpu.parallel import multihost

jax = multihost.initialize(coordinator, nprocs, pid, local_device_count=4)

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from orb_line_slam_tpu.backend.local_ba import bundle_adjust
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.parallel.sharded_ba import (
    make_distributed_ba_cg,
    shard_gba_pack,
)

assert jax.process_count() == nprocs, jax.process_count()
mesh = multihost.global_mesh()
n_dev = len(jax.devices())
assert n_dev == 4 * nprocs, n_dev

# --- identical synthetic problem in every process (fixed seed) ---
cam = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
rng = np.random.default_rng(3)
C, Pn, O = 12, 512, 3072
pts = np.stack(
    [rng.uniform(-15, 15, Pn), rng.uniform(-4, 4, Pn), rng.uniform(5, 50, Pn)], -1
).astype(np.float32)
R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
t = np.zeros((C, 3), np.float32)
t[:, 0] = np.arange(C) * 0.4
oc = rng.integers(0, C, O).astype(np.int32)
ol = rng.integers(0, Pn, O).astype(np.int32)
xc = np.einsum("oij,oj->oi", R[oc], pts[ol]) + t[oc]
z = np.maximum(xc[:, 2], 1.0)
obs = np.stack(
    [
        cam.fx * xc[:, 0] / z + cam.cx,
        cam.fy * xc[:, 1] / z + cam.cy,
        cam.fx * xc[:, 0] / z + cam.cx - cam.bf / z,
    ],
    -1,
).astype(np.float32)
obs += rng.normal(0, 0.3, obs.shape).astype(np.float32)
pts_noisy = (pts + rng.normal(0, 0.03, pts.shape)).astype(np.float32)
fixed = np.zeros(C, bool)
fixed[0] = True
pack = dict(
    R=R, t=t, cam_fixed=fixed, points=pts_noisy, point_valid=np.ones(Pn, bool),
    obs_cam=oc, obs_lm=ol, obs_uvur=obs, obs_oct=np.zeros(O, np.int32),
    obs_valid=np.ones(O, bool),
)

args, meta = shard_gba_pack(pack, n_dev)
specs = (P(), P(), P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"))
gargs = [multihost.make_global_array(mesh, np.asarray(a), s)
         for a, s in zip(args, specs)]

ba = make_distributed_ba_cg(mesh, cam, scale_factor=1.2, iters1=5, iters2=10,
                            cg_iters=48)
Rd, td, ptsd, inld, chi2d = ba(*gargs)
# Poses are replicated across the mesh -> fully replicated global
# arrays are host-readable from any process.
R_dist = np.asarray(Rd)
t_dist = np.asarray(td)

if pid == 0:
    # Single-process reference: the dense-Schur solver on local device 0.
    res = bundle_adjust(
        jnp.asarray(pack["R"]), jnp.asarray(pack["t"]),
        jnp.asarray(pack["cam_fixed"]),
        jnp.asarray(pack["points"]), jnp.asarray(pack["point_valid"]),
        jnp.asarray(pack["obs_cam"]), jnp.asarray(pack["obs_lm"]),
        jnp.asarray(pack["obs_uvur"]), jnp.asarray(pack["obs_oct"]),
        jnp.asarray(pack["obs_valid"]), cam, 1.2,
    )
    R_ref, t_ref = np.asarray(res.R), np.asarray(res.t)
    # Agreement on camera centers (solver families differ: CG-Schur vs
    # dense Schur — equality is up to solver tolerance).
    c_dist = -np.einsum("cij,ci->cj", R_dist.transpose(0, 2, 1), t_dist)
    c_ref = -np.einsum("cij,ci->cj", R_ref.transpose(0, 2, 1), t_ref)
    diff = float(np.abs(c_dist - c_ref).max())
    verdict = "OK" if diff < 5e-2 else "FAIL"
    with open(out_path, "w") as f:
        f.write(f"{verdict} {diff:.6f} ndev={n_dev} nproc={jax.process_count()}\n")
jax.distributed.shutdown()

"""CPU-vs-TPU numerical parity (VERDICT r2 'next round' #8).

The suite pins everything to CPU (conftest), so these tests launch ONE
subprocess on the real chip (axon PJRT plugin), dump its results, and
compare here.  They guard the bf16/f32 divergence class found by hand
in round 1 (TPU's default bf16 conv flipped borderline BRIEF bits,
halving tracking inliers) with two contracts:

- descriptor agreement: median Hamming distance between CPU and TPU
  ORB descriptors of the same image <= 1 bit, keypoint sets ~identical;
- pose-opt agreement: motion-only BA from the same inputs lands within
  1e-3 rad / 5e-3 m (f32 accumulation-order differences over 40 LM
  iterations).

Run on the chip:  python -m pytest -m tpu tests/test_tpu_parity.py -v
(skipped automatically when the axon plugin/TPU is unavailable).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TPU_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp, sys
assert jax.devices()[0].platform != "cpu", f"no TPU: {jax.devices()}"
from orb_line_slam_tpu.config import OrbConfig, SlamConfig
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.frontend.orb_extractor import extract_orb
from orb_line_slam_tpu.backend.pose_opt import pose_optimize

rng = np.random.default_rng(7)
img = rng.integers(0, 255, (240, 320), dtype=np.uint8)
cfg = OrbConfig(n_features=512, n_levels=4)
feat = extract_orb(jnp.asarray(img), cfg)
cam = CameraIntrinsics(fx=300.0, fy=300.0, cx=160.0, cy=120.0, bf=60.0,
                       width=320, height=240)
N = 256
pts = np.stack([rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
                rng.uniform(4, 15, N)], -1).astype(np.float32)
xc = pts + np.array([0.1, -0.05, 0.02], np.float32)
obs = np.stack([cam.fx*xc[:,0]/xc[:,2]+cam.cx, cam.fy*xc[:,1]/xc[:,2]+cam.cy,
                cam.fx*xc[:,0]/xc[:,2]+cam.cx - cam.bf/xc[:,2]], -1).astype(np.float32)
res = pose_optimize(jnp.eye(3), jnp.zeros(3), jnp.asarray(pts),
                    jnp.asarray(obs), jnp.zeros(N, jnp.int32),
                    jnp.ones(N, bool), cam)
np.savez(sys.argv[1],
         xy=np.asarray(feat.xy), desc=np.asarray(feat.desc),
         valid=np.asarray(feat.valid), angle=np.asarray(feat.angle),
         R=np.asarray(res.R), t=np.asarray(res.t),
         n_inl=np.asarray(res.n_inliers))
print("TPU_PARITY_DUMP_OK")
"""


@pytest.fixture(scope="module")
def tpu_dump(tmp_path_factory):
    out = tmp_path_factory.mktemp("parity") / "tpu.npz"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = f"/root/.axon_site:{REPO}"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    # Strip the CPU forcing the suite's conftest applied to THIS process;
    # the subprocess initializes jax fresh with the axon plugin.
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, "-c", _TPU_SCRIPT, str(out)],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO,
    )
    if "TPU_PARITY_DUMP_OK" not in proc.stdout:
        pytest.skip(f"TPU unavailable for parity run: {proc.stderr[-500:]}")
    return np.load(out)


@pytest.mark.tpu
def test_descriptor_parity(tpu_dump):
    import jax.numpy as jnp

    from orb_line_slam_tpu.config import OrbConfig
    from orb_line_slam_tpu.frontend.orb_extractor import extract_orb

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (240, 320), dtype=np.uint8)
    cfg = OrbConfig(n_features=512, n_levels=4)
    feat = extract_orb(jnp.asarray(img), cfg)
    xy_c = np.asarray(feat.xy)
    v_c = np.asarray(feat.valid)
    v_t = tpu_dump["valid"]
    # Keypoint sets: allow a handful of borderline-score swaps.
    agree = (v_c == v_t).mean()
    assert agree > 0.98, f"valid-mask agreement {agree:.3f}"
    both = v_c & v_t
    d_xy = np.abs(xy_c[both] - tpu_dump["xy"][both]).max()
    assert d_xy < 0.51, f"keypoint coordinate divergence {d_xy:.3f} px"
    dist = np.unpackbits(
        np.asarray(feat.desc)[both] ^ tpu_dump["desc"][both], axis=1
    ).sum(1)
    med = float(np.median(dist))
    assert med <= 1.0, f"median CPU-vs-TPU descriptor distance {med} bits"


@pytest.mark.tpu
def test_pose_opt_parity(tpu_dump):
    import jax.numpy as jnp

    from orb_line_slam_tpu.backend.pose_opt import pose_optimize
    from orb_line_slam_tpu.geometry.camera import CameraIntrinsics

    rng = np.random.default_rng(7)
    _ = rng.integers(0, 255, (240, 320), dtype=np.uint8)  # keep RNG in sync
    cam = CameraIntrinsics(fx=300.0, fy=300.0, cx=160.0, cy=120.0, bf=60.0,
                           width=320, height=240)
    N = 256
    pts = np.stack([rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
                    rng.uniform(4, 15, N)], -1).astype(np.float32)
    xc = pts + np.array([0.1, -0.05, 0.02], np.float32)
    obs = np.stack(
        [cam.fx * xc[:, 0] / xc[:, 2] + cam.cx,
         cam.fy * xc[:, 1] / xc[:, 2] + cam.cy,
         cam.fx * xc[:, 0] / xc[:, 2] + cam.cx - cam.bf / xc[:, 2]], -1
    ).astype(np.float32)
    res = pose_optimize(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(pts), jnp.asarray(obs),
        jnp.zeros(N, jnp.int32), jnp.ones(N, bool), cam,
    )
    dR = np.abs(np.asarray(res.R) - tpu_dump["R"]).max()
    dt = np.abs(np.asarray(res.t) - tpu_dump["t"]).max()
    assert dR < 1e-3 and dt < 5e-3, f"pose divergence dR={dR:.2e} dt={dt:.2e}"
    assert abs(int(res.n_inliers) - int(tpu_dump["n_inl"])) <= 3

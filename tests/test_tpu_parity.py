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
from orb_line_slam_tpu.config import LineConfig, OrbConfig, SlamConfig
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

# Rendered stereo pair: full frame (stereo depths) + line front-end.
from orb_line_slam_tpu.data.synthetic import SyntheticScene
from orb_line_slam_tpu.frontend.frame import build_stereo_frame
from orb_line_slam_tpu.frontend.line_extractor import build_line_features

vcam = CameraIntrinsics(fx=320.0, fy=320.0, cx=320.0, cy=160.0, bf=160.0,
                        width=640, height=320)
scene = SyntheticScene(vcam, n_points=900, seed=5,
                       extent=((-24, 40), (-4, 4), (-32, 32)))
scene.noise_sigma = 6.0
R0 = np.eye(3); t0 = np.zeros(3)
iml, imr = scene.render_stereo(R0, t0)
fcfg = SlamConfig(camera=vcam, orb=OrbConfig(n_features=1000, n_levels=4),
                  lines=LineConfig(enabled=True, n_lines=64))
fr = build_stereo_frame(jnp.asarray(iml), jnp.asarray(imr), fcfg)
lf = build_line_features(jnp.asarray(iml), jnp.asarray(imr), vcam, fcfg.lines)

np.savez(sys.argv[1],
         xy=np.asarray(feat.xy), desc=np.asarray(feat.desc),
         valid=np.asarray(feat.valid), angle=np.asarray(feat.angle),
         R=np.asarray(res.R), t=np.asarray(res.t),
         n_inl=np.asarray(res.n_inliers),
         fr_xy=np.asarray(fr.xy), fr_valid=np.asarray(fr.valid),
         fr_depth=np.asarray(fr.depth), fr_ur=np.asarray(fr.u_right),
         ln_p0=np.asarray(lf.p0), ln_p1=np.asarray(lf.p1),
         ln_valid=np.asarray(lf.valid), ln_desc=np.asarray(lf.desc),
         ln_d0=np.asarray(lf.depth0), ln_d1=np.asarray(lf.depth1))
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


def _rendered_pair():
    from orb_line_slam_tpu.data.synthetic import SyntheticScene
    from orb_line_slam_tpu.geometry.camera import CameraIntrinsics

    vcam = CameraIntrinsics(fx=320.0, fy=320.0, cx=320.0, cy=160.0, bf=160.0,
                            width=640, height=320)
    scene = SyntheticScene(vcam, n_points=900, seed=5,
                           extent=((-24, 40), (-4, 4), (-32, 32)))
    scene.noise_sigma = 6.0
    iml, imr = scene.render_stereo(np.eye(3), np.zeros(3))
    return vcam, iml, imr


@pytest.mark.tpu
def test_stereo_depth_parity(tpu_dump):
    """Full build_stereo_frame on a rendered pair: keypoints, validity,
    and the stereo depths (row-band Hamming + Pallas SAD subpixel) —
    the r4 13x drift gap hid in kernels the old parity suite skipped
    (VERDICT r4 'next round' #2)."""
    import jax.numpy as jnp

    from orb_line_slam_tpu.config import LineConfig, OrbConfig, SlamConfig
    from orb_line_slam_tpu.frontend.frame import build_stereo_frame

    vcam, iml, imr = _rendered_pair()
    cfg = SlamConfig(camera=vcam, orb=OrbConfig(n_features=1000, n_levels=4),
                     lines=LineConfig(enabled=True, n_lines=64))
    fr = build_stereo_frame(jnp.asarray(iml), jnp.asarray(imr), cfg)
    v_c = np.asarray(fr.valid)
    v_t = tpu_dump["fr_valid"]
    agree = (v_c == v_t).mean()
    assert agree > 0.98, f"frame valid-mask agreement {agree:.3f}"
    both = v_c & v_t
    d_xy = np.abs(np.asarray(fr.xy)[both] - tpu_dump["fr_xy"][both]).max()
    assert d_xy < 0.51, f"keypoint divergence {d_xy:.3f} px"
    # Depth parity where both sides matched stereo.
    d_c = np.asarray(fr.depth)[both]
    d_t = tpu_dump["fr_depth"][both]
    hit = (d_c > 0) & (d_t > 0)
    hit_agree = ((d_c > 0) == (d_t > 0)).mean()
    assert hit_agree > 0.95, f"stereo-hit agreement {hit_agree:.3f}"
    rel = np.abs(d_c[hit] - d_t[hit]) / np.maximum(d_t[hit], 1e-6)
    frac_close = (rel < 0.01).mean()
    assert frac_close > 0.95, (
        f"only {frac_close:.3f} of stereo depths within 1% (median rel "
        f"{np.median(rel):.2e})"
    )


@pytest.mark.tpu
def test_line_frontend_parity(tpu_dump):
    """Line detection + LBD + stereo endpoint depth on a rendered pair:
    endpoints within 1 px, descriptors within a few bits, endpoint
    depths within 2% where both sides got one."""
    import jax.numpy as jnp

    from orb_line_slam_tpu.config import LineConfig
    from orb_line_slam_tpu.frontend.line_extractor import build_line_features

    vcam, iml, imr = _rendered_pair()
    lf = build_line_features(jnp.asarray(iml), jnp.asarray(imr), vcam,
                             LineConfig(enabled=True, n_lines=64))
    v_c = np.asarray(lf.valid)
    v_t = tpu_dump["ln_valid"]
    agree = (v_c == v_t).mean()
    assert agree > 0.9, f"line valid-mask agreement {agree:.3f}"
    both = v_c & v_t
    assert both.sum() >= 8, f"too few common lines: {both.sum()}"
    d_ep = np.maximum(
        np.abs(np.asarray(lf.p0)[both] - tpu_dump["ln_p0"][both]).max(-1),
        np.abs(np.asarray(lf.p1)[both] - tpu_dump["ln_p1"][both]).max(-1),
    )
    assert np.median(d_ep) < 1.0, f"median endpoint divergence {np.median(d_ep):.2f} px"
    bits = np.unpackbits(
        np.asarray(lf.desc)[both] ^ tpu_dump["ln_desc"][both], axis=1
    ).sum(1)
    assert np.median(bits) <= 8, f"median LBD divergence {np.median(bits)} bits"
    for d_c_all, d_t_all in (
        (np.asarray(lf.depth0)[both], tpu_dump["ln_d0"][both]),
        (np.asarray(lf.depth1)[both], tpu_dump["ln_d1"][both]),
    ):
        hit = (d_c_all > 0) & (d_t_all > 0)
        if hit.sum() < 3:
            continue
        rel = np.abs(d_c_all[hit] - d_t_all[hit]) / np.maximum(d_t_all[hit], 1e-6)
        assert np.median(rel) < 0.02, f"line depth divergence {np.median(rel):.3f}"

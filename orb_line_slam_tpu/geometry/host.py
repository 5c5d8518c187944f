"""Numpy twins of the SE3/Sim3 helpers for HOST bookkeeping.

The tracker/loop-closer host code manipulates single 3x3/3-vector poses
constantly (velocity model, relative-pose recording, correction
propagation).  Doing that with jax.numpy would dispatch dozens of eager
one-op XLA programs per frame — each a device round-trip (~25 ms
through the axon tunnel).  These run on host numpy; device math stays
in the jitted programs (geometry/se3.py, geometry/sim3.py).
"""

from __future__ import annotations

import numpy as np


def nse3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): apply b first, then a."""
    R = Ra @ Rb
    return R.astype(np.float32), (Ra @ tb + ta).astype(np.float32)


def nse3_inverse(R, t):
    Rt = np.ascontiguousarray(R.T)
    return Rt.astype(np.float32), (-(Rt @ t)).astype(np.float32)


def nse3_apply(R, t, x):
    """Transform points x [..., 3]."""
    return (np.asarray(x) @ R.T + t).astype(np.float32)


def nse3_relative(Ra, ta, Rb, tb):
    """T_a ∘ T_b^-1 (a's camera from b's camera)."""
    R = Ra @ Rb.T
    return R.astype(np.float32), (ta - R @ tb).astype(np.float32)


def nsim3_compose(sa, Ra, ta, sb, Rb, tb):
    """x -> sa Ra (sb Rb x + tb) + ta."""
    return (
        float(sa * sb),
        (Ra @ Rb).astype(np.float32),
        (sa * (Ra @ tb) + ta).astype(np.float32),
    )


def nsim3_inverse(s, R, t):
    si = 1.0 / float(s)
    Rt = np.ascontiguousarray(R.T)
    return si, Rt.astype(np.float32), (-si * (Rt @ t)).astype(np.float32)


def nsim3_apply(s, R, t, x):
    return (float(s) * (np.asarray(x) @ R.T) + t).astype(np.float32)


def nbackproject(cam, xy, depth):
    """Pixel coords + depth -> camera-frame 3D points [..., 3]."""
    xy = np.asarray(xy, np.float32)
    z = np.asarray(depth, np.float32)
    x = (xy[..., 0] - cam.cx) / cam.fx * z
    y = (xy[..., 1] - cam.cy) / cam.fy * z
    return np.stack([x, y, z], axis=-1)

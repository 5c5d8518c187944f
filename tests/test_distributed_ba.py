"""Distributed BA: mesh-sharded Schur solve must match single-device BA
on the same problem (SURVEY.md §4 distributed-test requirement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orb_line_slam_tpu.backend.local_ba import bundle_adjust
from orb_line_slam_tpu.parallel.sharded_ba import make_distributed_ba
from tests.test_local_ba import CAM, make_ba_problem


def _group_obs_by_shard(obs_cam, obs_lm, obs, octv, P, n_dev, o_per_shard):
    """Host-side packing: landmark-shard d gets landmarks
    [d*P/n, (d+1)*P/n) and all their observations, with obs_lm local."""
    p_per = P // n_dev
    oc = np.zeros((n_dev, o_per_shard), np.int32)
    ol = np.zeros((n_dev, o_per_shard), np.int32)
    ouv = np.zeros((n_dev, o_per_shard, 3), np.float32)
    ooct = np.zeros((n_dev, o_per_shard), np.int32)
    oval = np.zeros((n_dev, o_per_shard), bool)
    for d in range(n_dev):
        sel = (obs_lm >= d * p_per) & (obs_lm < (d + 1) * p_per)
        idx = np.nonzero(sel)[0][:o_per_shard]
        n = len(idx)
        oc[d, :n] = obs_cam[idx]
        ol[d, :n] = obs_lm[idx] - d * p_per
        ouv[d, :n] = obs[idx]
        ooct[d, :n] = octv[idx]
        oval[d, :n] = True
    return (
        oc.reshape(-1), ol.reshape(-1), ouv.reshape(-1, 3),
        ooct.reshape(-1), oval.reshape(-1),
    )


def test_sharded_ba_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    R_gt, t_gt, pts_gt, obs_cam, obs_lm, obs, octv = make_ba_problem(C=5, P=96)
    rng = np.random.default_rng(0)
    C, P, O = 5, 96, obs.shape[0]
    pts0 = np.asarray(pts_gt) + rng.normal(0, 0.08, (P, 3)).astype(np.float32)
    fixed = np.array([True, True, False, False, False])

    # Single-device result (stage 1 only, same iteration count).
    res1 = bundle_adjust(
        R_gt, t_gt, jnp.asarray(fixed), jnp.asarray(pts0), jnp.ones(P, bool),
        obs_cam, obs_lm, obs, octv, jnp.ones(O, bool), CAM,
        iters1=8, iters2=0,
    )

    # Sharded result.
    oc, ol, ouv, ooct, oval = _group_obs_by_shard(
        np.asarray(obs_cam), np.asarray(obs_lm), np.asarray(obs),
        np.asarray(octv), P, n_dev, o_per_shard=128,
    )
    ba = make_distributed_ba(mesh, CAM, n_iters=8)
    R2, t2, pts2 = ba(
        R_gt, t_gt, jnp.asarray(fixed),
        jnp.asarray(pts0), jnp.ones(P, bool),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.asarray(ooct), jnp.asarray(oval),
    )

    # Both must converge to ground truth.
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R_gt), atol=5e-3)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_gt), atol=3e-2)
    err = np.linalg.norm(np.asarray(pts2) - np.asarray(pts_gt), axis=-1)
    assert np.median(err) < 0.03
    # And agree with each other tightly (same math, same schedule; the
    # only difference is huber-stage flags and summation order).
    np.testing.assert_allclose(np.asarray(t2), np.asarray(res1.t), atol=2e-2)

"""Data-parallel tracking front-end over multiple sequences.

BASELINE.json config #4 ("batched multi-sequence on one host") and the
SURVEY §2.4 "data parallel over frames/sequences" requirement: the
per-frame front-end program is pure and static-shape, so B sequences
run as one shard_map over the mesh 'dp' axis — each device owns a
sequence stream and runs the identical frame program with zero
cross-device communication (the collective-free limb of the engine; BA
is the psum limb, parallel/sharded_ba.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SlamConfig
from ..frontend.frame import build_stereo_frame


def make_batched_frontend(mesh: Mesh, cfg: SlamConfig, axis_name: str = "dp"):
    """Returns a jitted fn: (imgs_l [B, H, W], imgs_r [B, H, W]) ->
    batched Frame pytree with leading sequence axis B = mesh size."""
    from jax import shard_map

    def per_device(l, r):
        # one sequence's frame per device; shapes [1, H, W]
        frame = build_stereo_frame(l[0], r[0], cfg)
        return jax.tree_util.tree_map(lambda x: x[None], frame)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)


def track_sequences_frontend(mesh, cfg, seqs_left, seqs_right):
    """Convenience driver: run the batched front-end over B sequences of
    equal length; returns list over time of batched Frames."""
    fn = make_batched_frontend(mesh, cfg)
    out = []
    for t in range(len(seqs_left[0])):
        l = jnp.asarray(np.stack([s[t] for s in seqs_left]))
        r = jnp.asarray(np.stack([s[t] for s in seqs_right]))
        out.append(fn(l, r))
    return out

"""Batched multi-level ORB extraction — the front-end "hot loop 1".

TPU-native rebuild of ORBextractor::operator() (src/ORBextractor.cc,
SURVEY.md §2.1 row 9, §3.2): 8-level pyramid (scale 1.2), dense FAST-9
score stencil + 3x3 NMS per level, per-cell top-K spatial distribution
(replacing the sequential octree), intensity-centroid orientation,
Gaussian blur, rotated BRIEF-256 — all static-shape, batched over
keypoints, one jit per image geometry.

The reference runs left/right extraction on two pthreads
(Frame stereo ctor, SURVEY.md §2.4); here both images go through the
same jitted program back to back (or batched by the caller) and the
parallelism comes from the VPU/MXU, not threads.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OrbConfig
from ..ops.brief import HALF_PATCH, brief_descriptors, gather_patches, ic_angle
from ..ops.fast import fast_score_map, nms3x3
from ..ops.image import build_pyramid, gaussian_blur, pyramid_shapes
from ..ops.topk_grid import select_topk_grid


class FrameFeatures(NamedTuple):
    """SoA keypoints+descriptors, padded to the static feature budget."""

    xy: jnp.ndarray      # float32 [N, 2] — level-0 pixel coords
    response: jnp.ndarray  # float32 [N]
    angle: jnp.ndarray   # float32 [N] radians
    octave: jnp.ndarray  # int32 [N]
    desc: jnp.ndarray    # uint8 [N, 32] packed BRIEF-256
    valid: jnp.ndarray   # bool [N]

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def _extract_level(img, quota, cfg: OrbConfig):
    """Extract up to `quota` oriented+described keypoints on one level."""
    score = nms3x3(fast_score_map(img))
    h, w = img.shape
    m = cfg.edge_margin
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= m) & (ys < h - m) & (xs >= m) & (xs < w - m)
    score = jnp.where(interior, score, 0.0)

    n_cells = max(1, (h // cfg.cell_size) * (w // cfg.cell_size))
    k_per_cell = max(1, min(16, (3 * quota) // n_cells + 1))
    xy, resp, valid = select_topk_grid(
        score, cfg.cell_size, k_per_cell, quota, cfg.min_th_fast
    )

    patches = gather_patches(img, xy, HALF_PATCH)
    angles = ic_angle(patches)
    blurred = gaussian_blur(img, sigma=2.0, radius=3)
    desc = brief_descriptors(blurred, xy, angles)
    return xy, resp, angles, desc, valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_orb(image: jnp.ndarray, cfg: OrbConfig) -> FrameFeatures:
    """Full multi-level ORB extraction of a grayscale image.

    Args:
      image: uint8 or float32 [H, W].
      cfg: OrbConfig (static — one compilation per image geometry).

    Returns:
      FrameFeatures with N = cfg.n_features rows (padded, masked).
    """
    img = image.astype(jnp.float32)
    levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    quotas = cfg.level_quotas
    scales = cfg.level_scales

    all_xy, all_resp, all_angle, all_oct, all_desc, all_valid = [], [], [], [], [], []
    for lvl in range(cfg.n_levels):
        xy, resp, ang, desc, valid = _extract_level(levels[lvl], quotas[lvl], cfg)
        all_xy.append(xy.astype(jnp.float32) * scales[lvl])
        all_resp.append(resp)
        all_angle.append(ang)
        all_oct.append(jnp.full((quotas[lvl],), lvl, dtype=jnp.int32))
        all_desc.append(desc)
        all_valid.append(valid)

    return FrameFeatures(
        xy=jnp.concatenate(all_xy, axis=0),
        response=jnp.concatenate(all_resp, axis=0),
        angle=jnp.concatenate(all_angle, axis=0),
        octave=jnp.concatenate(all_oct, axis=0),
        desc=jnp.concatenate(all_desc, axis=0),
        valid=jnp.concatenate(all_valid, axis=0),
    )

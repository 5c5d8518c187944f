"""Stereo matching: row-band Hamming search + SAD sub-pixel refinement.

TPU-native rebuild of Frame::ComputeStereoMatches (src/Frame.cc,
SURVEY.md §2.1 row 5, §3.2 "hot loop 3").  The reference loops over
left features, scanning row-compatible right candidates; here the whole
search is one masked [N, N] Hamming matrix (an int8 MXU matmul) and the
SAD refinement is a batched gather over a pyramid atlas:

  1. candidate mask = same row band (radius 2*scale of the right
     keypoint's octave) AND compatible octave (+-1) AND disparity in
     (min_disp, max_disp);
  2. best Hamming match per left feature, gated at
     (TH_LOW+TH_HIGH)/2 = 75 as the reference;
  3. 11x11 center-normalized SAD over a +-5 px slide at the keypoint's
     own pyramid level, parabola-fit sub-pixel minimum;
  4. median-deviation outlier rejection over SAD scores;
  5. depth = bf / disparity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OrbConfig
from ..geometry.camera import CameraIntrinsics
from ..ops.hamming import hamming_matrix, knn2
from ..ops.image import bilinear_sample

SAD_W = 5       # half window -> 11x11
SAD_SLIDE = 5   # +-5 px slide
TH_STEREO = 75  # (TH_LOW + TH_HIGH)/2


class StereoMatch(NamedTuple):
    u_right: jnp.ndarray  # float32 [N]; -1 when unmatched
    depth: jnp.ndarray    # float32 [N]; -1 when unmatched


def _gather_window(atlas, cx, cy, half_w, extra=0):
    """Gather [N, 2h+1, 2h+1+2*extra] windows at float centers.

    Fast path: one Pallas DMA tile (32x32, integer-aligned) per
    keypoint, then a 4-term bilinear blend of shifted tile views (pure
    VPU) — replaces the 1M-element scalar gather of bilinear_sample.
    The tile center convention (keypoint at (15, 15)) caps the window at
    half_w + extra <= 10, which covers the 11x21 SAD strip.
    """
    from ..ops.pallas_patches import gather_patch_tiles

    assert half_w + extra <= 10
    xi = jnp.floor(cx)
    yi = jnp.floor(cy)
    fx = (cx - xi)[:, None, None]
    fy = (cy - yi)[:, None, None]
    xy = jnp.stack([xi, yi], axis=-1).astype(jnp.int32)
    t = gather_patch_tiles(atlas, xy)  # [N, 32, 32], center (15, 15)
    blend = (
        (1 - fy) * (1 - fx) * t[:, :-1, :-1]
        + (1 - fy) * fx * t[:, :-1, 1:]
        + fy * (1 - fx) * t[:, 1:, :-1]
        + fy * fx * t[:, 1:, 1:]
    )  # [N, 31, 31], center (15, 15)
    r0 = 15 - half_w
    c0 = 15 - half_w - extra
    return blend[:, r0 : r0 + 2 * half_w + 1, c0 : c0 + 2 * (half_w + extra) + 1]


def stereo_match(
    featL,
    featR,
    tilesL: jnp.ndarray,
    tilesR: jnp.ndarray,
    cam: CameraIntrinsics,
    orb_cfg: OrbConfig,
) -> StereoMatch:
    """Stereo association reusing the extraction patch tiles.

    tilesL/tilesR: [N, 32, 32] raw-image tiles at each keypoint's own
    pyramid level, keypoint at tile index (15, 15) — produced by
    extract_orb_with_tiles.  The SAD windows are pure static slices of
    these tiles (the matched right keypoint differs from the left one
    by <= 2 rows at level scale, handled by a 5-way row select), so the
    refinement adds NO gather/DMA traffic at all.
    """
    scales = jnp.asarray(orb_cfg.level_scales, dtype=jnp.float32)
    uL, vL = featL.xy[:, 0], featL.xy[:, 1]
    uR, vR = featR.xy[:, 0], featR.xy[:, 1]
    octL, octR = featL.octave, featR.octave

    min_disp = 0.1
    max_disp = cam.bf / max(cam.baseline, 1e-6)  # = fx: depth >= baseline

    dist = hamming_matrix(featL.desc, featR.desc)
    band = 2.0 * scales[octR]
    row_ok = jnp.abs(vL[:, None] - vR[None, :]) <= band[None, :]
    # Same octave required so the SAD tiles share one pyramid scale
    # (the reference tolerates +-1 but then re-samples at the left
    # level; with tile reuse equal octaves keep the math exact).
    oct_ok = octL[:, None] == octR[None, :]
    disp = uL[:, None] - uR[None, :]
    disp_ok = (disp > min_disp) & (disp < max_disp)
    valid = row_ok & oct_ok & disp_ok & featR.valid[None, :] & featL.valid[:, None]

    best_idx, best_d, _ = knn2(dist, valid)
    matched = best_d < TH_STEREO

    # --- SAD sub-pixel refinement at the keypoints' shared level ---
    sc = scales[octL]
    xl = uL / sc                 # integer level coords of the left kp
    uR0 = uR[best_idx]
    xr = uR0 / sc                # same octave -> same scale
    # Row offset between left and matched right keypoint rows at level
    # scale (|dv| <= ~2 by the band gate).
    dv = jnp.round((vL - vR[best_idx]) / sc).astype(jnp.int32)
    dv = jnp.clip(dv, -2, 2)

    c = 15  # tile center index
    patchL = tilesL[:, c - SAD_W : c + SAD_W + 1, c - SAD_W : c + SAD_W + 1]
    patchL = patchL - patchL[:, SAD_W : SAD_W + 1, SAD_W : SAD_W + 1]

    tR = tilesR[best_idx]  # [N, 32, 32]
    # 5-way select over the row offset: strip rows c+dv-5 .. c+dv+5.
    stripR = jnp.zeros(
        (tR.shape[0], 2 * SAD_W + 1, 2 * (SAD_W + SAD_SLIDE) + 1), tR.dtype
    )
    for d in range(-2, 3):
        r0 = c + d - SAD_W
        c0 = c - SAD_W - SAD_SLIDE
        sl = tR[:, r0 : r0 + 2 * SAD_W + 1, c0 : c0 + 2 * (SAD_W + SAD_SLIDE) + 1]
        stripR = stripR + jnp.where((dv == d)[:, None, None], sl, 0.0)

    n_off = 2 * SAD_SLIDE + 1
    sads = []
    for k in range(n_off):
        win = jax.lax.dynamic_slice_in_dim(stripR, k, 2 * SAD_W + 1, axis=2)
        win = win - win[:, SAD_W : SAD_W + 1, SAD_W : SAD_W + 1]
        sads.append(jnp.sum(jnp.abs(patchL - win), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)  # [N, 11]

    best_k = jnp.argmin(sad, axis=1)
    ar = jnp.arange(sad.shape[0])
    s0 = sad[ar, jnp.clip(best_k - 1, 0, n_off - 1)]
    s1 = sad[ar, best_k]
    s2 = sad[ar, jnp.clip(best_k + 1, 0, n_off - 1)]
    denom = s0 + s2 - 2.0 * s1
    delta = jnp.where(jnp.abs(denom) > 1e-6, (s0 - s2) / (2.0 * denom), 0.0)
    interior = (best_k > 0) & (best_k < n_off - 1) & (jnp.abs(delta) <= 1.0)

    u_right = (xr + (best_k - SAD_SLIDE).astype(jnp.float32) + delta) * sc
    disparity = uL - u_right
    geom_ok = (disparity > min_disp) & (disparity < max_disp)

    # Median-deviation rejection over matched SAD scores (reference's
    # 1.5*1.4*median gate).
    s1_masked = jnp.where(matched, s1, jnp.nan)
    med = jnp.nanmedian(s1_masked)
    med = jnp.where(jnp.isnan(med), jnp.inf, med)
    sad_ok = s1 <= 2.1 * med

    ok = matched & interior & geom_ok & sad_ok & featL.valid
    depth = jnp.where(ok, cam.bf / jnp.maximum(disparity, min_disp), -1.0)
    return StereoMatch(
        u_right=jnp.where(ok, u_right, -1.0),
        depth=depth,
    )

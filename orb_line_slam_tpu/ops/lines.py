"""TPU-native line-segment detection as batched dense stencils.

Replaces the vendored LSD detector (Thirdparty/line_descriptor
LSDDetector — SURVEY.md §2.2, §7.2 hard-part #1).  LSD's greedy
region-growing is inherently sequential, so this is a redesign with the
same contract (oriented segments with endpoints, angle, response):

  1. Sobel gradients -> magnitude + level-line angle (VPU stencils).
  2. Oriented support: correlate the thresholded edge mask with K
     discrete line directions (separable shifts — pure rolls/adds);
     a pixel on a long straight edge of direction d scores ~ length.
  3. Candidate centers: per-cell top-K of the oriented response
     (reusing the keypoint distribution machinery).
  4. Endpoint walk, batched: for each candidate, sample the aligned
     edge mask along +-L steps of its direction; the segment extent is
     the prefix-product run length (gap-tolerant) — a masked cumsum,
     no data-dependent loops.
  5. Least-squares refit: endpoints snapped to the support centroid
     line; response = supported length.

Output is padded [L_max] with a validity mask, like every other stage.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import bilinear_sample, sobel_gradients

N_DIRS = 12          # orientation quantization over [0, pi)
WALK_STEPS = 160     # max half-length of a segment in pixels
GAP_TOL = 2          # tolerated consecutive support gaps during the walk


class DetectedLines(NamedTuple):
    p0: jnp.ndarray       # float32 [L, 2] endpoint (x, y)
    p1: jnp.ndarray       # float32 [L, 2] endpoint
    angle: jnp.ndarray    # float32 [L] direction in [0, pi)
    length: jnp.ndarray   # float32 [L]
    response: jnp.ndarray  # float32 [L] supported length
    valid: jnp.ndarray    # bool [L]


def _oriented_support(edge: jnp.ndarray, angle: jnp.ndarray, mag: jnp.ndarray):
    """For each of N_DIRS directions: sum of aligned edge mask along a
    +-7 px line through each pixel (15-tap correlation via rolls)."""
    h, w = edge.shape
    import math

    responses = []
    for k in range(N_DIRS):
        theta = math.pi * k / N_DIRS
        # Pixels whose level-line angle is compatible with direction k.
        d = jnp.abs(((angle - theta + jnp.pi / 2) % jnp.pi) - jnp.pi / 2)
        aligned = edge * (d < (jnp.pi / N_DIRS)).astype(jnp.float32)
        dx, dy = math.cos(theta), math.sin(theta)
        acc = aligned
        for s in range(1, 8):
            ox = int(round(dx * s))
            oy = int(round(dy * s))
            acc = acc + jnp.roll(aligned, (-oy, -ox), (0, 1)) + jnp.roll(
                aligned, (oy, ox), (0, 1)
            )
        responses.append(acc)
    return jnp.stack(responses)  # [N_DIRS, H, W]


@functools.partial(jax.jit, static_argnames=("n_lines", "min_mag", "cell"))
def detect_lines(
    img: jnp.ndarray,
    n_lines: int = 128,
    min_mag: float = 30.0,
    cell: int = 24,
    grads=None,
) -> DetectedLines:
    """Detect up to n_lines segments in a 2D float/uint8 image.

    grads: optional precomputed (gx, gy) Sobel pair — lets the caller
    share one gradient pass with the LBD stage."""
    x = img.astype(jnp.float32)
    gx, gy = sobel_gradients(x) if grads is None else grads
    mag = jnp.sqrt(gx * gx + gy * gy)
    # Zero the border: conv zero-padding fabricates huge step edges there.
    hh, ww = x.shape
    ys = jnp.arange(hh)[:, None]
    xs = jnp.arange(ww)[None, :]
    interior = (ys >= 4) & (ys < hh - 4) & (xs >= 4) & (xs < ww - 4)
    mag = jnp.where(interior, mag, 0.0)
    # Level-line angle: direction ALONG the edge (perpendicular to grad).
    angle = jnp.mod(jnp.arctan2(gy, gx) + jnp.pi / 2.0, jnp.pi)
    edge = (mag > min_mag).astype(jnp.float32)

    support = _oriented_support(edge, angle, mag)  # [D, H, W]
    best_dir = jnp.argmax(support, axis=0)
    best_sup = jnp.max(support, axis=0)

    # Candidate centers: suppress non-ridge pixels, distribute per cell.
    h, w = x.shape
    score = jnp.where(edge > 0, best_sup, 0.0)
    from .topk_grid import select_topk_grid

    xy, resp, valid = select_topk_grid(score, cell, 2, n_lines, 8.0)

    # Sub-bin direction: smoothed doubled-angle field at the candidate
    # (the 12-way quantization of best_dir would truncate sloped lines).
    from .image import gaussian_blur

    cos2f = gaussian_blur(edge * jnp.cos(2 * angle), sigma=2.0, radius=4)
    sin2f = gaussian_blur(edge * jnp.sin(2 * angle), sigma=2.0, radius=4)
    c2 = cos2f[xy[:, 1], xy[:, 0]]
    s2 = sin2f[xy[:, 1], xy[:, 0]]
    theta = jnp.mod(0.5 * jnp.arctan2(s2, c2), jnp.pi)

    # Batched endpoint walk: sample alignment along +-WALK_STEPS.
    steps = jnp.arange(1, WALK_STEPS + 1, dtype=jnp.float32)
    centers = xy.astype(jnp.float32)

    def walk(direction_sign, theta, dxy):
        pts = centers[:, None, :] + direction_sign * dxy[:, None, :] * steps[None, :, None]
        # A point supports the segment if the local edge there has a
        # compatible angle (sampled with bilinear tolerance).
        e = bilinear_sample(edge, pts) > 0.25
        a = bilinear_sample(jnp.cos(2 * angle), pts)
        b = bilinear_sample(jnp.sin(2 * angle), pts)
        # cos(2(angle-theta)) > cos(2*tol): angle within tol of theta
        cos2 = a * jnp.cos(2 * theta)[:, None] + b * jnp.sin(2 * theta)[:, None]
        good = e & (cos2 > 0.0)
        # Gap-tolerant run length: the walk dies at the first window of
        # GAP_TOL+1 consecutive misses.  Closed form (no scan — a scan
        # of 160 tiny sequential kernels wastes the VPU): a window of
        # w misses ends at step s iff miss[s] & miss[s-1] & ... &
        # miss[s-w+1], i.e. an AND of GAP_TOL+1 shifted copies.
        miss = ~good
        run = miss
        for sft in range(1, GAP_TOL + 1):
            run = run & jnp.pad(miss, ((0, 0), (sft, 0)))[:, : miss.shape[1]]
        dead = jnp.cumsum(run.astype(jnp.int32), axis=1) > 0
        alive = ~dead
        extent = jnp.sum(alive.astype(jnp.float32), axis=1)
        supported = jnp.sum((good & alive).astype(jnp.float32), axis=1)
        return extent, supported

    def both_walks(theta):
        dxy = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
        ext_p, sup_p = walk(+1.0, theta, dxy)
        ext_m, sup_m = walk(-1.0, theta, dxy)
        p0 = centers - dxy * ext_m[:, None]
        p1 = centers + dxy * ext_p[:, None]
        return p0, p1, ext_p + ext_m, sup_p + sup_m + 1.0

    # First pass with the local direction, then refit the direction from
    # the recovered endpoints and walk once more (long, slightly curved
    # or mis-angled supports converge to the true chord).
    p0, p1, _, _ = both_walks(theta)
    d01 = p1 - p0
    theta = jnp.mod(jnp.arctan2(d01[:, 1], d01[:, 0]), jnp.pi)
    p0, p1, length, supported = both_walks(theta)

    # Sub-pixel lateral refinement: shift the segment along its normal to
    # the magnitude-weighted perpendicular centroid of its support.
    dxy = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    nrm = jnp.stack([-jnp.sin(theta), jnp.cos(theta)], axis=-1)
    ts_ref = jnp.linspace(0.05, 0.95, 16)
    perp_off = jnp.arange(-2, 3, dtype=jnp.float32)
    seg = p1 - p0
    base = p0[:, None, :] + seg[:, None, :] * ts_ref[None, :, None]      # [L,16,2]
    samp = (
        base[:, :, None, :] + nrm[:, None, None, :] * perp_off[None, None, :, None]
    )                                                                     # [L,16,5,2]
    wmag = bilinear_sample(mag, samp)                                     # [L,16,5]
    woff = jnp.sum(wmag * perp_off[None, None, :], axis=2) / (
        jnp.sum(wmag, axis=2) + 1e-6
    )                                                                     # [L,16]
    shift = jnp.mean(woff, axis=1)
    p0 = p0 + nrm * shift[:, None]
    p1 = p1 + nrm * shift[:, None]

    ok = valid & (length >= 12.0) & (supported / jnp.maximum(length, 1.0) > 0.6)
    # Clamp endpoints to the image.
    p0 = jnp.stack([jnp.clip(p0[:, 0], 0, w - 1), jnp.clip(p0[:, 1], 0, h - 1)], -1)
    p1 = jnp.stack([jnp.clip(p1[:, 0], 0, w - 1), jnp.clip(p1[:, 1], 0, h - 1)], -1)
    return DetectedLines(
        p0=p0, p1=p1, angle=theta, length=length, response=supported,
        valid=ok,
    )


def merge_collinear(lines: DetectedLines, ang_tol: float = 0.06,
                    dist_tol: float = 3.0) -> DetectedLines:
    """Suppress duplicate detections of the same physical segment: for
    every pair with similar angle, nearby infinite lines and overlapping
    extent, keep the longer one.  O(L^2) masked ops, static shape."""
    L = lines.p0.shape[0]
    mid = 0.5 * (lines.p0 + lines.p1)
    d = jnp.stack([jnp.cos(lines.angle), jnp.sin(lines.angle)], -1)
    n = jnp.stack([-jnp.sin(lines.angle), jnp.cos(lines.angle)], -1)

    dang = jnp.abs(((lines.angle[:, None] - lines.angle[None, :] + jnp.pi / 2) % jnp.pi) - jnp.pi / 2)
    dm = mid[None, :, :] - mid[:, None, :]
    perp = jnp.abs(jnp.sum(dm * n[:, None, :], axis=-1))
    along = jnp.abs(jnp.sum(dm * d[:, None, :], axis=-1))
    overlap = along < 0.6 * (lines.length[:, None] + lines.length[None, :])

    dup = (dang < ang_tol) & (perp < dist_tol) & overlap
    dup = dup & lines.valid[:, None] & lines.valid[None, :]
    better = (lines.length[None, :] > lines.length[:, None]) | (
        (lines.length[None, :] == lines.length[:, None])
        & (jnp.arange(L)[None, :] < jnp.arange(L)[:, None])
    )
    suppressed = jnp.any(dup & better, axis=1)
    return lines._replace(valid=lines.valid & ~suppressed)

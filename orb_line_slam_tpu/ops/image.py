"""Image ops: pyramid, separable Gaussian blur, gradients, bilinear sampling.

Replaces the reference's OpenCV image plumbing used by ORBextractor
(ComputePyramid, GaussianBlur — src/ORBextractor.cc, SURVEY.md §2.1
row 9) with static-shape jax.numpy that XLA fuses well on TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur of a 2D float image (ORBextractor uses
    7x7 sigma=2 before describing — same defaults here)."""
    k = gaussian_kernel1d(sigma, radius)
    x = img[None, None, :, :]
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    # HIGHEST precision: TPU's default bf16 conv loses ~0.25 at pixel
    # magnitude, which flips borderline BRIEF bits downstream (the bits
    # compare pairs of blurred pixels).
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(0, 0), (radius, radius)], dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kv, (1, 1), [(radius, radius), (0, 0)], dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[0, 0]


def resize_bilinear(img: jnp.ndarray, new_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of a 2D image (pyramid levels)."""
    return jax.image.resize(img, new_hw, method="bilinear")


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float) -> list[tuple[int, int]]:
    return [
        (max(8, int(round(h / scale**i))), max(8, int(round(w / scale**i))))
        for i in range(n_levels)
    ]


def build_pyramid(img: jnp.ndarray, n_levels: int, scale: float) -> list[jnp.ndarray]:
    """Image pyramid as a list of float32 2D arrays (one static shape per
    level, like ORBextractor::ComputePyramid's mvImagePyramid)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale)
    levels = [img.astype(jnp.float32)]
    for lvl in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[lvl]))
    return levels


def sobel_gradients(img: jnp.ndarray):
    """Sobel dx, dy of a 2D float image (line detection / LBD front-end)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=jnp.float32)
    ky = kx.T
    x = img[None, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 3, 3), ("NCHW", "OIHW", "NCHW"))
    gx = jax.lax.conv_general_dilated(
        x, kx[None, None], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    gy = jax.lax.conv_general_dilated(
        x, ky[None, None], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    return gx, gy


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample 2D image at float coords xy (..., 2) = (x, y), bilinear,
    clamped to borders. Gather-based: vectorizes over any batch shape.

    Indexes the flattened image with a single fused index (y*w + x):
    1-D `take` lowers to a fast TPU gather, while the equivalent 2-D
    advanced indexing lowers ~4x slower (measured on v5e)."""
    h, w = img.shape
    flat = img.reshape(-1)
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    r0 = y0 * w
    r1 = y1 * w
    v00 = jnp.take(flat, r0 + x0)
    v01 = jnp.take(flat, r0 + x1)
    v10 = jnp.take(flat, r1 + x0)
    v11 = jnp.take(flat, r1 + x1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def nearest_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour sample (used by BRIEF's rotated pattern, which
    OpenCV rounds with cvRound).  Flat-index gather: see
    bilinear_sample for the TPU lowering rationale."""
    h, w = img.shape
    x = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, h - 1)
    return jnp.take(img.reshape(-1), y * w + x)


def pyramid_atlas(levels: list[jnp.ndarray]):
    """Stack pyramid levels into one vertically-concatenated atlas.

    Enables per-keypoint octave-dependent patch gathers from a single
    static-shape array: level L lives at rows
    [offset[L], offset[L]+h_L).  Returns (atlas [sumH, maxW] float32,
    offsets int32 [n_levels]).
    """
    max_w = max(l.shape[1] for l in levels)
    offs = []
    padded = []
    y = 0
    for l in levels:
        offs.append(y)
        y += l.shape[0]
        padded.append(jnp.pad(l, ((0, 0), (0, max_w - l.shape[1]))))
    return jnp.concatenate(padded, axis=0), jnp.asarray(offs, dtype=jnp.int32)

"""Pallas TPU kernels for per-keypoint patch extraction.

The XLA lowering of the advanced-indexing patch gather
(ops/brief.gather_patches) costs ~20 ms for 2000x31x31 on TPU — it
becomes scalar gather traffic.  Here each grid step DMAs one aligned
patch tile straight from the image in HBM/ANY memory into the output
block (scalar-prefetched keypoint coordinates drive the slice), which
runs at DMA bandwidth instead: the whole 2000-patch extraction is
~8 MB of copies.

Falls back to the jnp gather implementation on non-TPU backends
(tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 32  # aligned tile side (covers the 31x31 ORB patch)


TILE_H = 40            # aligned DMA superset: 8-aligned rows
TILE_W = 256           # 128-aligned columns (roll needs lane-aligned shapes)


KP_PER_STEP = 32  # keypoints per grid step: amortizes the ~7us/step
                  # Mosaic loop overhead and keeps 16 DMAs in flight


def _patch_kernel(xy_ref, img_ref, out_ref, scratch, sems, *, h, w):
    # Mosaic requires DMA slice offsets aligned to the (8, 128) tiling:
    # copy an aligned superset tile, then rotate the misalignment away
    # (dynamic lane rotate is a cheap VPU op).  h/w are the ORIGINAL
    # image dims (img_ref is padded for aligned tiles).
    g = pl.program_id(0)
    half = PATCH // 2

    def offsets(k):
        i = g * KP_PER_STEP + k
        x0 = jnp.clip(xy_ref[i, 0] - (half - 1), 0, w - PATCH)
        y0 = jnp.clip(xy_ref[i, 1] - (half - 1), 0, h - PATCH)
        ya = pl.multiple_of((y0 // 8) * 8, 8)
        xa = pl.multiple_of((x0 // 128) * 128, 128)
        return x0, xa, ya

    # Launch all DMAs, then drain: overlap across the K slots.
    for k in range(KP_PER_STEP):
        _, xa, ya = offsets(k)
        pltpu.make_async_copy(
            img_ref.at[pl.ds(ya, TILE_H), pl.ds(xa, TILE_W)],
            scratch.at[k],
            sems.at[k],
        ).start()
    for k in range(KP_PER_STEP):
        x0, xa, ya = offsets(k)
        pltpu.make_async_copy(
            img_ref.at[pl.ds(ya, TILE_H), pl.ds(xa, TILE_W)],
            scratch.at[k],
            sems.at[k],
        ).wait()
        # Sublane (row) offset dy in [0, 8) is corrected by the caller
        # with an 8-way select (Mosaic's sublane rotate miscompiles).
        rolled = pltpu.roll(scratch[k], -(x0 - xa), 1)
        out_ref[k] = rolled[:, :PATCH]


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_patch_tiles(img: jnp.ndarray, xy: jnp.ndarray, interpret: bool = False):
    """[N, 32, 32] float32 tiles; tile[15, 15] is the keypoint pixel
    (clamped near borders).  xy: int32 [N, 2] (x, y)."""
    n_orig = xy.shape[0]
    n = -(-n_orig // KP_PER_STEP) * KP_PER_STEP
    if n != n_orig:
        xy = jnp.pad(xy, ((0, n - n_orig), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // KP_PER_STEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (KP_PER_STEP, TILE_H, PATCH), lambda i, xy_ref: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((KP_PER_STEP, TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((KP_PER_STEP,)),
        ],
    )
    h, w = img.shape
    # Pad so any aligned superset tile fits: rows to >= h+8 (8-aligned),
    # cols to >= w+224 (128-aligned) — see offset bounds in the kernel.
    hp = -(-(h + 8) // 8) * 8
    wp = -(-(w + TILE_W - PATCH) // 128) * 128
    img = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    tiles = pl.pallas_call(
        functools.partial(_patch_kernel, h=h, w=w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, TILE_H, PATCH), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(xy, img.astype(jnp.float32))
    # Row-offset correction: dy = y0 - 8*floor(y0/8) in [0, 8).
    half = PATCH // 2
    y0 = jnp.clip(xy[:, 1] - (half - 1), 0, h - PATCH)
    dy = y0 - (y0 // 8) * 8
    out = jnp.zeros((n, PATCH, PATCH), jnp.float32)
    for d in range(8):
        sel = (dy == d)[:, None, None]
        out = out + jnp.where(sel, tiles[:, d : d + PATCH, :], 0.0)
    return out[:n_orig]


def gather_patch_tiles(img: jnp.ndarray, xy: jnp.ndarray):
    """Backend-dispatching tile extraction: Pallas DMA on TPU, jnp
    gather elsewhere. Tile center convention matches _patch_kernel:
    the keypoint sits at tile index (15, 15)."""
    if jax.default_backend() == "tpu":
        return extract_patch_tiles(img, xy)
    h, w = img.shape
    half = PATCH // 2
    x0 = jnp.clip(xy[:, 0] - (half - 1), 0, w - PATCH)
    y0 = jnp.clip(xy[:, 1] - (half - 1), 0, h - PATCH)
    d = jnp.arange(PATCH)
    ys = y0[:, None, None] + d[None, :, None]
    xs = x0[:, None, None] + d[None, None, :]
    return img.astype(jnp.float32)[ys, xs]

"""Device-resident map mirror: packed single-buffer refresh protocol.

The axon PJRT tunnel costs ~22 ms latency per host↔device transfer
(measured), so the mirror refresh must not be "upload 15 arrays".
Everything crossing per keyframe event is packed into ONE uint32 buffer
on the host (bit-exact: float32 and descriptor bytes are bitcast, never
converted) and unpacked by a single jitted program on device:

- full refresh: ``flat`` [P, 18] — every landmark row.
- delta refresh: ``delta`` [B, 19] — only rows the host mutated since
  the last refresh (id column first; 0xFFFFFFFF pads drop).

Row layout (18 words): valid | pos×3 | maxd | mind | normal×3 | oct |
desc×8 (32 bytes).  This replaces the round-1 full re-upload of the
point table (~3 MB × several arrays ≈ 100s of ms per keyframe event;
VERDICT.md "What's weak" #1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .track_step import MapMirror

_PAD_ID = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------
def pack_rows(store, ids: np.ndarray) -> np.ndarray:
    """uint32 [len(ids), 18] mirror rows for the given landmark ids."""
    n = len(ids)
    b = np.empty((n, 18), np.uint32)
    b[:, 0] = store.pt_valid[ids].astype(np.uint32)
    b[:, 1:4] = store.pt_pos[ids].astype(np.float32, copy=True).view(np.uint32)
    b[:, 4] = store.pt_max_dist[ids].astype(np.float32).view(np.uint32)
    b[:, 5] = store.pt_min_dist[ids].astype(np.float32).view(np.uint32)
    b[:, 6:9] = store.pt_normal[ids].astype(np.float32, copy=True).view(np.uint32)
    b[:, 9] = store.pt_oct[ids].astype(np.uint32)
    b[:, 10:18] = np.ascontiguousarray(store.pt_desc[ids]).view(np.uint32)
    return b


def pack_full(store) -> np.ndarray:
    """uint32 [P, 18] — the whole point table."""
    return pack_rows(store, np.arange(store.P))


def pack_delta(store, ids: np.ndarray, bucket_min: int = 256) -> np.ndarray:
    """uint32 [B, 19] delta rows, padded to a pow2 bucket so the apply
    program compiles for a handful of shapes only."""
    n = len(ids)
    cap = max(bucket_min, 1 << (max(n, 1) - 1).bit_length())
    out = np.empty((cap, 19), np.uint32)
    out[:, 0] = _PAD_ID
    if n:
        out[:n, 0] = ids.astype(np.uint32)
        out[:n, 1:] = pack_rows(store, ids)
    return out


def pack_delta_pos(store, ids: np.ndarray, bucket_min: int = 256) -> np.ndarray:
    """uint32 [B, 4] pos-only delta rows (id | pos x3): BA write-back
    moves positions without touching descriptors/stats, and at ~30 MB/s
    tunnel uplink the 19-word full row is 5x the bytes for nothing."""
    n = len(ids)
    cap = max(bucket_min, 1 << (max(n, 1) - 1).bit_length())
    out = np.empty((cap, 4), np.uint32)
    out[:, 0] = _PAD_ID
    if n:
        out[:n, 0] = ids.astype(np.uint32)
        out[:n, 1:4] = store.pt_pos[ids].astype(np.float32, copy=True).view(np.uint32)
    return out


# ---------------------------------------------------------------------------
# device-side unpacking
# ---------------------------------------------------------------------------
def _rows_to_mirror_fields(rows_u32):
    """rows [*, 18] uint32 -> field tuple (pos, desc, oct, valid, maxd,
    mind, normal)."""
    f = lambda c: jax.lax.bitcast_convert_type(c, jnp.float32)  # noqa: E731
    pos = f(rows_u32[:, 1:4])
    maxd = f(rows_u32[:, 4])
    mind = f(rows_u32[:, 5])
    normal = f(rows_u32[:, 6:9])
    oct_ = rows_u32[:, 9].astype(jnp.int32)
    valid = rows_u32[:, 0] > 0
    desc = jax.lax.bitcast_convert_type(rows_u32[:, 10:18], jnp.uint8)
    desc = desc.reshape(rows_u32.shape[0], 32)
    return pos, desc, oct_, valid, maxd, mind, normal


@jax.jit
def mirror_from_flat(flat_u32) -> MapMirror:
    pos, desc, oct_, valid, maxd, mind, normal = _rows_to_mirror_fields(flat_u32)
    return MapMirror(pos=pos, desc=desc, oct=oct_, valid=valid,
                     maxd=maxd, mind=mind, normal=normal)


@jax.jit
def mirror_apply(mir: MapMirror, delta_u32) -> MapMirror:
    """Scatter delta rows into the device mirror (pad ids drop)."""
    P = mir.pos.shape[0]
    ids = delta_u32[:, 0]
    # pad rows carry id 0xFFFFFFFF >= P -> clamped out of range, dropped
    idx = jnp.where(ids >= jnp.uint32(P), jnp.int32(P + 1),
                    ids.astype(jnp.int32))
    pos, desc, oct_, valid, maxd, mind, normal = _rows_to_mirror_fields(
        delta_u32[:, 1:].reshape(delta_u32.shape[0], 18)
    )
    return MapMirror(
        pos=mir.pos.at[idx].set(pos, mode="drop"),
        desc=mir.desc.at[idx].set(desc, mode="drop"),
        oct=mir.oct.at[idx].set(oct_, mode="drop"),
        valid=mir.valid.at[idx].set(valid, mode="drop"),
        maxd=mir.maxd.at[idx].set(maxd, mode="drop"),
        mind=mir.mind.at[idx].set(mind, mode="drop"),
        normal=mir.normal.at[idx].set(normal, mode="drop"),
    )


@jax.jit
def mirror_apply_pos(mir: MapMirror, delta_u32) -> MapMirror:
    """Scatter pos-only delta rows into the device mirror."""
    P = mir.pos.shape[0]
    ids = delta_u32[:, 0]
    idx = jnp.where(ids >= jnp.uint32(P), jnp.int32(P + 1),
                    ids.astype(jnp.int32))
    pos = jax.lax.bitcast_convert_type(delta_u32[:, 1:4], jnp.float32)
    return mir._replace(pos=mir.pos.at[idx].set(pos, mode="drop"))


@functools.partial(jax.jit, static_argnames=("F", "cap", "Lcap"))
def unpack_mirror_aux(flat, F: int, cap: int, Lcap: int):
    """Split the single packed mirror-aux upload: ref slots [F], local
    snapshot ids [cap], line table (start [L,3], end [L,3], desc
    [L,32], valid [L])."""
    off = [0]

    def take(n):
        v = jax.lax.dynamic_slice(flat, (off[0],), (n,))
        off[0] += n
        return v

    f32 = lambda v, *s: jax.lax.bitcast_convert_type(  # noqa: E731
        v, jnp.float32).reshape(*s)
    # bitcast (NOT convert): ids carry -1 sentinels as 0xFFFFFFFF
    ref_slots = jax.lax.bitcast_convert_type(take(F), jnp.int32)
    snap_ids = jax.lax.bitcast_convert_type(take(cap), jnp.int32)
    ln_start = f32(take(Lcap * 3), Lcap, 3)
    ln_end = f32(take(Lcap * 3), Lcap, 3)
    ln_desc = jax.lax.bitcast_convert_type(
        take(Lcap * 8).reshape(Lcap, 8), jnp.uint8
    ).reshape(Lcap, 32)
    ln_valid = take(Lcap) > 0
    return ref_slots, snap_ids, ln_start, ln_end, ln_desc, ln_valid


# ---------------------------------------------------------------------------
# keyframe-event fetch unpacking (host side of track_step.pack_kf_event)
# ---------------------------------------------------------------------------
def unpack_kf_event(buf: np.ndarray, N: int, Lcap: int, cap: int,
                    n_lines: int = 0):
    """Split the single packed keyframe-event fetch back into host
    arrays. Returns (frame_host, assoc, inliers, ln_idx, ln_mask,
    found, vis, ln_found, ln_vis[, line_features])."""
    from ..frontend.frame import Frame

    o = 0

    def take(n):
        nonlocal o
        v = buf[o:o + n]
        o += n
        return v

    xy = take(2 * N).reshape(N, 2)
    ur = take(N)
    depth = take(N)
    octave = take(N).astype(np.int32)
    angle = take(N)
    valid = take(N) > 0.5
    response = take(N)
    desc = np.ascontiguousarray(take(8 * N)).view(np.uint8).reshape(N, 32)
    assoc = take(N).astype(np.int32)
    inliers = take(N) > 0.5
    ln_idx = take(Lcap).astype(np.int32)
    ln_mask = take(Lcap) > 0.5
    found = take(cap).astype(np.int32)
    vis = take(cap).astype(np.int32)
    ln_found = take(Lcap).astype(np.int32)
    ln_vis = take(Lcap).astype(np.int32)
    fh = Frame(xy=xy, response=response, angle=angle, octave=octave,
               desc=desc, valid=valid, u_right=ur, depth=depth)
    out = (fh, assoc, inliers, ln_idx, ln_mask, found, vis, ln_found, ln_vis)
    if not n_lines:
        return out
    from ..frontend.line_extractor import LineFeatures

    L = n_lines
    lf = LineFeatures(
        p0=take(2 * L).reshape(L, 2), p1=take(2 * L).reshape(L, 2),
        angle=take(L), length=take(L),
        desc=np.ascontiguousarray(take(8 * L)).view(np.uint8).reshape(L, 32),
        valid=take(L) > 0.5, depth0=take(L), depth1=take(L),
    )
    return out + (lf,)

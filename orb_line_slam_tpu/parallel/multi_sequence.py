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


# ---------------------------------------------------------------------------
# Batched multi-sequence TRACKING (config #4, the full per-frame program)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("cfg", "has_lines"))
def _batched_frame_track(stacked_args, cfg, has_lines):
    """vmap of the fused per-frame program (front-end + line front-end
    + track step) over the leading sequence axis of every leaf."""
    from ..pipeline.track_step import fused_frame_track_step

    def one(args):
        return fused_frame_track_step(*args, cfg=cfg, has_lines=has_lines)

    return jax.vmap(one)(stacked_args)


class MultiSequenceTracker:
    """Track B sequences with ONE batched device program per frame.

    The per-frame hot path (stereo ORB front-end, line front-end, the
    fused tracking step with its device carries) runs as a single
    vmapped dispatch over a leading [B] axis — the data-parallel
    tracking limb of BASELINE config #4 (the round-3 version batched
    only the stateless front-end).  Host-side map bookkeeping stays
    per-sequence (each sequence owns its MapStore, mirror, keyframe
    policy and loop closer state — keyframe events are data-dependent
    and per-sequence by nature, exactly like the reference running one
    System per sequence).

    Bootstrap frames (until every tracker is initialized with device
    carries) run the per-sequence path; the steady state batches.

    With full_slam=True (default — BASELINE config #4 is "full stereo
    point+line SLAM", not N tracking front-ends) every sequence is a
    complete System: its own KeyFrameDatabase, LoopCloser (loop
    detection + Sim3 + CorrectLoop + global BA) and relocalization
    ladder, exactly like the reference running one System per sequence.
    Loop closing is per-keyframe and host-side, so it composes with the
    batched per-frame dispatch unchanged.  Per-sequence host
    bookkeeping (consume, keyframe events, map maintenance) runs on a
    thread pool — each sequence owns its MapStore, so the only shared
    state is the JAX dispatch queue (thread-safe)."""

    def __init__(self, cfg: SlamConfig, n_seq: int, full_slam: bool = True,
                 host_threads: bool = True):
        from ..pipeline.tracking import Tracker, _PipeEntry

        self.cfg = cfg
        self.n_seq = n_seq
        self.full_slam = full_slam
        if full_slam:
            from ..pipeline.system import System

            self.systems = [
                System(cfg, use_loop_closing=True, async_loop=True)
                for _ in range(n_seq)
            ]
            self.trackers = [s.tracker for s in self.systems]
        else:
            self.systems = None
            self.trackers = [Tracker(cfg) for _ in range(n_seq)]
        self._entry_cls = _PipeEntry
        self._pool = None
        if host_threads and n_seq > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=n_seq, thread_name_prefix="mseq-host"
            )

    def _ready(self):
        return all(
            t.state == "OK" and t._carry is not None for t in self.trackers
        )

    def process_stereo(self, imgs_left, imgs_right, timestamps):
        """One frame for every sequence. imgs_*: [B, H, W] arrays (or
        lists); timestamps: list of B floats.  Returns [B] 4x4 poses."""
        if not self._ready():
            return [
                t.process_stereo(imgs_left[b], imgs_right[b], timestamps[b])
                for b, t in enumerate(self.trackers)
            ]

        # Refresh every mirror first so the capacity check below sees
        # this frame's true shapes (and _dispatch_inputs won't refresh
        # again).
        for t in self.trackers:
            t.poll_map_jobs()
            t.poll_pending_ba()
            if (
                t._mirror_dirty or t._mir is None
                or t._mir["ref_kf"] != t.ref_kf
            ):
                t._refresh_mirror(t.cur_lines)
        # Heterogeneous line-mirror capacities (some maps hold lines,
        # some don't yet) cannot stack — run those frames per-sequence.
        lcaps = {t._mir["ln_valid"].shape[0] for t in self.trackers}
        if len(lcaps) > 1:
            return [
                t.process_stereo(imgs_left[b], imgs_right[b], timestamps[b])
                for b, t in enumerate(self.trackers)
            ]
        # has_lines must agree across sequences for one compiled program
        # (same config ⇒ same flag once every map holds a line).
        has_lines = all(
            bool(t._mir["has_lines"]) for t in self.trackers
        ) and self.cfg.lines.enabled

        per_seq = []
        for b, t in enumerate(self.trackers):
            t.frame_id += 1
            mir, last_frame, args = t._dispatch_inputs(t.cur_lines)
            per_seq.append((
                jnp.asarray(imgs_left[b]), jnp.asarray(imgs_right[b]),
                last_frame, mir["pt"], *args,
                mir["ln_start"], mir["ln_end"], mir["ln_desc"],
                mir["ln_valid"],
            ))

        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *per_seq
        )
        frames, lfs, outs = _batched_frame_track(
            stacked, cfg=self.cfg, has_lines=has_lines
        )

        def consume_one(b, t):
            take = functools.partial(jax.tree_util.tree_map, lambda x: x[b])
            frame_b = take(frames)
            lf_b = take(lfs) if lfs is not None else None
            out_b = take(outs)
            t._prev_for_dispatch = t._carry[0] if t._carry else t.last_frame
            t.cur_frame = frame_b
            t.cur_lines = lf_b
            t._carry = (frame_b, out_b)
            t._q.append(self._entry_cls(
                fid=t.frame_id, ts=timestamps[b], frame=frame_b,
                prev_frame=t._prev_for_dispatch, lines=lf_b, out=out_b,
                snap_host=t._mir["snap_host"], ln_ids=t._mir["ln_ids"],
                kf_epoch=t._kf_epoch,
            ))
            while len(t._q) > t.pipeline_depth:
                t._consume()
            return t.current_pose()

        if self._pool is not None:
            poses = list(self._pool.map(
                consume_one, range(self.n_seq), self.trackers
            ))
        else:
            poses = [consume_one(b, t) for b, t in enumerate(self.trackers)]
        return poses

    def final_trajectories(self):
        return [t.final_trajectory() for t in self.trackers]

    def shutdown(self):
        if self.systems is not None:
            for s in self.systems:
                s.shutdown()
        else:
            for t in self.trackers:
                t.flush()
                t.flush_pending_ba()
        if self._pool is not None:
            self._pool.shutdown(wait=True)

    @property
    def n_loops_closed(self):
        if self.systems is None:
            return 0
        return sum(s.n_loops_closed for s in self.systems)

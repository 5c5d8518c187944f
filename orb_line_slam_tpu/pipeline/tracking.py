"""Per-frame tracking state machine + inline local mapping.

TPU-native rebuild of src/Tracking.cc and src/LocalMapping.cc
(SURVEY.md §2.1 rows 2-3, §3.2-3.3).  The reference's
Tracking/LocalMapping pthreads become two device programs driven from
one host loop: a per-frame ``track`` (motion-model match → pose opt →
local-map match → pose opt) and a per-keyframe ``map step`` (landmark
creation, culling, local BA).  All device work is static-shape jitted;
the host does bookkeeping only.

State machine: NOT_INITIALIZED → OK ↔ LOST, as the reference
(relocalization against keyframe descriptors brings LOST back to OK).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..backend.pose_opt import pose_optimize
from ..backend.local_ba import bundle_adjust
from ..config import SlamConfig
from ..frontend.frame import Frame, build_stereo_frame
from ..geometry.host import (
    nbackproject,
    nse3_apply,
    nse3_compose,
    nse3_inverse,
    nse3_relative,
)
from ..matching.point_matcher import (
    match_descriptors,
    resolve_duplicates,
    rotation_consistency,
    search_by_projection,
)
from ..slam_map.map_store import MapStore


@dataclasses.dataclass
class TrajectoryEntry:
    frame_id: int
    timestamp: float
    ref_kf: int
    R_rel: np.ndarray  # T_cam<-refKF
    t_rel: np.ndarray
    lost: bool


class Tracker:
    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        n_lines = cfg.lines.n_lines if cfg.lines.enabled else 0
        self.map = MapStore(cfg.map, cfg.orb.n_features, n_lines=n_lines)
        self.cur_lines = None   # LineFeatures of the current frame
        self.cur_ln_assoc = None
        self.state = "NOT_INITIALIZED"
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)
        self.vel: Optional[tuple[np.ndarray, np.ndarray]] = None  # T_k<-k-1
        self.last_frame: Optional[Frame] = None
        self.last_assoc: Optional[np.ndarray] = None
        self.last_R = np.eye(3, dtype=np.float32)
        self.last_t = np.zeros(3, np.float32)
        self.ref_kf = -1
        self.frame_id = -1
        self.frames_since_kf = 0
        self.ref_kf_matches = 0
        self.recent_lm: list[np.ndarray] = []
        self.trajectory: list[TrajectoryEntry] = []
        self.stats: list[dict] = []
        self.on_keyframe = None          # callback(kf_id) after insertion
        self.localization_only = False   # tracking-only mode
        self.reloc_candidates_fn = None  # BoW relocalization candidates
        self.async_mapping = False       # defer BA write-back to next KF
        self._pending_ba = None

    # ------------------------------------------------------------------
    def process_stereo(self, img_left, img_right, timestamp: float = 0.0):
        """Track one rectified stereo pair; returns 4x4 Tcw (world->cam)."""
        self.frame_id += 1
        l = jnp.asarray(img_left)
        r = jnp.asarray(img_right)
        frame = build_stereo_frame(l, r, self.cfg)
        if self.cfg.lines.enabled:
            from ..frontend.line_extractor import build_line_features

            self.cur_lines = build_line_features(l, r, self.cfg.camera, self.cfg.lines)
        return self._track(frame, timestamp)

    def process_frame(self, frame: Frame, timestamp: float = 0.0):
        self.frame_id += 1
        return self._track(frame, timestamp)

    def process_mono(self, img, timestamp: float = 0.0):
        """Track a monocular frame (TrackMonocular analog); the map is
        bootstrapped with the two-view initializer (scale-free)."""
        from ..frontend.frame import build_mono_frame

        self.frame_id += 1
        frame = build_mono_frame(jnp.asarray(img), self.cfg)
        if self.state == "NOT_INITIALIZED":
            self.cur_fh = jax.device_get(frame)
            self._try_mono_initialize(frame, timestamp)
            self._record(timestamp, lost=(self.state != "OK"))
            return self.current_pose()
        return self._track(frame, timestamp)

    def _try_mono_initialize(self, frame: Frame, timestamp):
        from ..frontend.initializer import initialize_two_view

        if getattr(self, "_init_ref", None) is None:
            if int(self.cur_fh.valid.sum()) >= 100:
                self._init_ref = (frame, self.cur_fh, timestamp, self.frame_id)
            return
        ref, refh, ref_ts, ref_id = self._init_ref
        fh = self.cur_fh
        from ..matching.point_matcher import match_in_window

        m = match_in_window(ref, frame, radius=100.0, max_dist=50, ratio=0.9)
        mask, idx = jax.device_get((m.mask, m.idx))
        # Minimum match support scales with the feature budget (the
        # reference's 100 assumes 2000+ features); below it, slide the
        # reference frame forward.
        min_matches = max(70, self.cfg.orb.n_features // 25)
        if mask.sum() < min_matches:
            self._init_ref = (frame, fh, timestamp, self.frame_id)  # reset ref
            return
        p1 = refh.xy
        p2 = fh.xy[np.where(idx >= 0, idx, 0)]
        res = initialize_two_view(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(mask),
            jax.random.PRNGKey(self.frame_id), self.cfg.camera,
        )
        success, inl, pts, R2, t2 = jax.device_get(
            (res.success, res.inliers, res.points3d, res.R, res.t)
        )
        if not bool(success):
            return
        # Normalize scale: median depth -> 1 (the reference's
        # CreateInitialMapMonocular inverse-median-depth scaling).
        med = np.median(pts[inl, 2])
        if med <= 0:
            return
        pts = pts / med
        t2 = t2 / med

        kf0 = self.map.add_keyframe(
            refh, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            ref_id, ref_ts,
        )
        kf1 = self.map.add_keyframe(fh, R2, t2, self.frame_id, timestamp)
        rows = np.nonzero(inl)[0]
        ids = self.map.add_points(
            pts[rows], refh.desc[rows], refh.octave[rows], kf0, rows,
        )
        self.map.kf_obs_lm[kf1, idx[rows[: len(ids)]]] = ids
        self.map.update_point_stats(ids)
        self.recent_lm.append(ids)

        self.R, self.t = R2.astype(np.float32), t2.astype(np.float32)
        self.ref_kf = kf1
        self.ref_kf_matches = max(len(ids), 40)
        self.state = "OK"
        self.last_frame = frame
        self.last_fh = fh
        assoc = np.full(frame.n, -1, np.int32)
        assoc[idx[rows[: len(ids)]]] = ids
        self.last_assoc = assoc
        self.last_R = self.R.copy()
        self.last_t = self.t.copy()
        self.vel = None
        self.frames_since_kf = 0
        self._local_ba(kf1)
        if self.on_keyframe is not None:
            self.on_keyframe(kf0)
            self.on_keyframe(kf1)

    # ------------------------------------------------------------------
    def _track(self, frame: Frame, timestamp: float):
        cfg = self.cfg
        n_inliers = 0
        # ONE host mirror of the frame arrays (single batched device
        # fetch); all host bookkeeping below reads this, never the
        # device arrays.
        fh = jax.device_get(frame)
        self.cur_fh = fh
        assoc = np.full(frame.n, -1, np.int32)

        if self.state == "NOT_INITIALIZED":
            if int((fh.depth > 0).sum()) >= 100:
                self._stereo_initialize(frame, timestamp)
            self._record(timestamp, lost=(self.state != "OK"))
            return self.current_pose()

        ok = False
        if self.state == "OK" and self.vel is not None:
            ok, assoc, n_inliers = self._track_motion_model(frame)
        if not ok:
            ok, assoc, n_inliers = self._track_reference_kf(frame)
        if not ok:
            ok, assoc, n_inliers = self._relocalize(frame)

        if ok:
            assoc, n_inliers = self._track_local_map(frame, assoc)
            ok = n_inliers >= 10

        if ok:
            self.state = "OK"
            # velocity = T_curr * T_last^-1
            self.vel = nse3_relative(self.R, self.t, self.last_R, self.last_t)

            if self._need_keyframe(frame, assoc, n_inliers):
                self._create_keyframe(frame, assoc, timestamp)
                self.frames_since_kf = 0
            else:
                self.frames_since_kf += 1
        else:
            self.state = "LOST"
            self.vel = None

        self.last_frame = frame
        self.last_fh = fh
        self.last_assoc = assoc
        self.last_R = self.R.copy()
        self.last_t = self.t.copy()
        self.stats.append({"frame": self.frame_id, "inliers": n_inliers, "state": self.state})
        self._record(timestamp, lost=not ok)
        return self.current_pose()

    # ------------------------------------------------------------------
    def current_pose(self) -> np.ndarray:
        T = np.eye(4)
        T[:3, :3] = self.R
        T[:3, 3] = self.t
        return T

    def _record(self, timestamp, lost):
        if self.ref_kf < 0:
            self.trajectory.append(
                TrajectoryEntry(self.frame_id, timestamp, -1, np.eye(3), np.zeros(3), True)
            )
            return
        # T_c<-r = T_cw * T_rw^-1   (replayed against the *final* KF pose
        # at save time — SURVEY.md §3.5's relative-to-refKF scheme).
        Rr, tr = self.map.kf_R[self.ref_kf], self.map.kf_t[self.ref_kf]
        Rrel, trel = nse3_relative(self.R, self.t, Rr, tr)
        self.trajectory.append(
            TrajectoryEntry(
                self.frame_id, timestamp, self.ref_kf, Rrel, trel, lost,
            )
        )

    def final_trajectory(self):
        """Replay per-frame relative poses against final keyframe poses."""
        out = []
        for e in self.trajectory:
            if e.ref_kf < 0:
                out.append((e.frame_id, e.timestamp, np.eye(3), np.zeros(3), e.lost))
                continue
            Rr, tr = self.map.kf_R[e.ref_kf], self.map.kf_t[e.ref_kf]
            R, t = nse3_compose(
                np.asarray(e.R_rel, np.float32), np.asarray(e.t_rel, np.float32),
                Rr, tr,
            )
            out.append((e.frame_id, e.timestamp, R, t, e.lost))
        return out

    # ------------------------------------------------------------------
    def _stereo_initialize(self, frame: Frame, timestamp):
        fh = self.cur_fh
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)
        kf = self.map.add_keyframe(fh, self.R, self.t, self.frame_id, timestamp)
        valid = fh.valid & (fh.depth > 0)
        idx = np.nonzero(valid)[0]
        pts_c = nbackproject(self.cfg.camera, fh.xy, fh.depth)
        ids = self.map.add_points(
            pts_c[idx], fh.desc[idx], fh.octave[idx], kf, idx
        )
        self.recent_lm.append(ids)
        self.ref_kf = kf
        self.ref_kf_matches = len(ids)
        self.state = "OK"
        self.last_frame = frame
        self.last_fh = fh
        self.last_assoc = self.map.kf_obs_lm[kf].copy()
        self.last_R = self.R.copy()
        self.last_t = self.t.copy()
        self.vel = None
        self.frames_since_kf = 0

    # ------------------------------------------------------------------
    def _pose_opt_from_assoc(self, frame, assoc, R0, t0, line_kw=None):
        """Run motion-only BA on the current landmark associations."""
        fh = self.cur_fh
        sel = assoc >= 0
        lm = np.where(sel, assoc, 0)
        pts = self.map.pt_pos[lm]
        obs = np.stack(
            [fh.xy[:, 0], fh.xy[:, 1], fh.u_right], -1
        ).astype(np.float32)
        res = pose_optimize(
            jnp.asarray(R0), jnp.asarray(t0),
            jnp.asarray(pts), jnp.asarray(obs),
            frame.octave, jnp.asarray(sel & fh.valid),
            self.cfg.camera, self.cfg.orb.scale_factor,
            **(line_kw or {}),
        )
        # Single batched fetch (one tunnel round-trip).
        R, t, inl, n_inl = jax.device_get(
            (res.R, res.t, res.inliers, res.n_inliers)
        )
        assoc = np.where(inl, assoc, -1)
        return R, t, assoc, int(n_inl)

    def _track_motion_model(self, frame: Frame):
        dR, dt = self.vel
        Rp, tp = nse3_compose(dR, dt, self.R, self.t)
        la = self.last_assoc
        sel = (la >= 0) & self.map.pt_valid[np.clip(la, 0, self.map.P - 1)]
        lm = np.where(sel, la, 0)
        m = search_by_projection(
            jnp.asarray(self.map.pt_pos[lm]),
            jnp.asarray(self.map.pt_desc[lm]),
            jnp.asarray(sel), self.last_frame.octave,
            jnp.asarray(Rp), jnp.asarray(tp),
            frame, self.cfg.camera, self.cfg.orb.level_scales,
            radius=self.cfg.tracking.motion_search_radius, ratio=0.9, check_ur=True,
            max_dist_p=jnp.asarray(self.map.pt_max_dist[lm]),
        )
        m = resolve_duplicates(m, frame.n)
        keep_d = rotation_consistency(
            self.last_frame.angle, frame.angle[m.idx], m.mask
        )
        midx, keep = jax.device_get((m.idx, keep_d))
        if keep.sum() < 20:
            return False, np.full(frame.n, -1, np.int32), 0
        assoc = np.full(frame.n, -1, np.int32)
        assoc[midx[keep]] = np.where(sel, la, -1)[keep]
        R, t, assoc, n_inl = self._pose_opt_from_assoc(frame, assoc, Rp, tp)
        if n_inl < 10:
            return False, assoc, n_inl
        self.R, self.t = R, t
        return True, assoc, n_inl

    def _track_reference_kf(self, frame: Frame):
        if self.ref_kf < 0:
            return False, np.full(frame.n, -1, np.int32), 0
        k = self.ref_kf
        kf_lm = self.map.kf_obs_lm[k]
        has_lm = (kf_lm >= 0) & self.map.pt_valid[np.clip(kf_lm, 0, self.map.P - 1)]
        # Spatial window (the BoW node pruning analog): cuts confusers so
        # the ratio test keeps far more true matches.
        kf_xy = self.map.kf_xy[k]
        fxy = self.cur_fh.xy
        du = fxy[:, 0:1] - kf_xy[None, :, 0]
        dv = fxy[:, 1:2] - kf_xy[None, :, 1]
        window = jnp.asarray((du * du + dv * dv) < 150.0**2)
        m = match_descriptors(
            frame.desc, frame.valid,
            jnp.asarray(self.map.kf_desc[k]), jnp.asarray(has_lm),
            max_dist=50, ratio=0.75, extra_mask=window,
        )
        keep_d = rotation_consistency(
            frame.angle, jnp.asarray(self.map.kf_angle[k])[m.idx], m.mask
        )
        midx, keep = jax.device_get((m.idx, keep_d))
        if keep.sum() < 15:
            return False, np.full(frame.n, -1, np.int32), 0
        assoc = np.full(frame.n, -1, np.int32)
        assoc[keep] = kf_lm[midx[keep]]
        R, t, assoc, n_inl = self._pose_opt_from_assoc(frame, assoc, self.last_R, self.last_t)
        if n_inl < 10:
            return False, assoc, n_inl
        self.R, self.t = R, t
        return True, assoc, n_inl

    def _relocalize(self, frame: Frame):
        """Relocalization: BoW keyframe-database candidates when the
        loop module is wired in, else recent keyframes (Tracking::
        Relocalization's candidate source is KeyFrameDatabase)."""
        cand = None
        if self.reloc_candidates_fn is not None:
            cand = [
                k for k in self.reloc_candidates_fn(frame) if self.map.kf_valid[k]
            ][:5]
        if not cand:
            cand = [
                k for k in range(self.map._next_kf - 1, -1, -1) if self.map.kf_valid[k]
            ][:5]
        # First pass: EPnP RANSAC from descriptor matches against each
        # candidate's landmarks (Tracking::Relocalization's PnPsolver
        # stage) gives a pose hypothesis without any prior.
        import jax

        from ..backend.pnp import solve_pnp_ransac

        for k in cand:
            kf_lm = self.map.kf_obs_lm[k]
            has_lm = (kf_lm >= 0) & self.map.pt_valid[np.clip(kf_lm, 0, self.map.P - 1)]
            if has_lm.sum() < 30:
                continue
            m = match_descriptors(
                frame.desc, frame.valid,
                jnp.asarray(self.map.kf_desc[k]), jnp.asarray(has_lm),
                max_dist=50, ratio=0.75,
            )
            mask, idx = jax.device_get((m.mask, m.idx))
            if mask.sum() < 15:
                continue
            lm = np.where(mask, kf_lm[np.where(idx >= 0, idx, 0)], 0)
            res = solve_pnp_ransac(
                jnp.asarray(self.map.pt_pos[lm]), frame.xy,
                jnp.asarray(mask), jax.random.PRNGKey(self.frame_id),
                self.cfg.camera, jnp.ones(frame.n),
            )
            R0, t0, pnp_inl, n_pnp = jax.device_get(res[:4])
            if int(n_pnp) < 15:
                continue
            assoc = np.where(mask & pnp_inl, lm, -1).astype(np.int32)
            R, t, assoc, n_inl = self._pose_opt_from_assoc(frame, assoc, R0, t0)
            if n_inl >= 15:
                self.R, self.t = R, t
                self.ref_kf = k
                return True, assoc, n_inl
        for k in cand:
            self.ref_kf = k
            saved_R, saved_t = self.last_R, self.last_t
            self.last_R = self.map.kf_R[k].copy()
            self.last_t = self.map.kf_t[k].copy()
            ok, assoc, n_inl = self._track_reference_kf(frame)
            if ok and n_inl >= self.cfg.tracking.min_inliers_ok:
                return True, assoc, n_inl
            self.last_R, self.last_t = saved_R, saved_t
        return False, np.full(frame.n, -1, np.int32), 0

    # ------------------------------------------------------------------
    def _track_local_map(self, frame: Frame, assoc):
        cfg = self.cfg
        cap = cfg.map.local_points
        # Local keyframes: covisible neighbours of the reference KF.
        ids, _ = self.map.covisible_keyframes(self.ref_kf, min_weight=1, max_n=20)
        local_kfs = [self.ref_kf] + [int(i) for i in ids]
        lm = np.unique(
            np.concatenate(
                [self.map.kf_obs_lm[k][self.map.kf_obs_lm[k] >= 0] for k in local_kfs]
            )
        )
        lm = lm[self.map.pt_valid[lm]]
        lm = lm[:cap]
        n_local = len(lm)
        pts = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 32), np.uint8)
        octv = np.zeros(cap, np.int32)
        valid = np.zeros(cap, bool)
        maxd = np.full(cap, 1.0, np.float32)
        mind = np.zeros(cap, np.float32)
        normal = np.zeros((cap, 3), np.float32)
        pts[:n_local] = self.map.pt_pos[lm]
        desc[:n_local] = self.map.pt_desc[lm]
        octv[:n_local] = self.map.pt_oct[lm]
        valid[:n_local] = True
        maxd[:n_local] = self.map.pt_max_dist[lm]
        mind[:n_local] = self.map.pt_min_dist[lm]
        normal[:n_local] = self.map.pt_normal[lm]
        # Don't re-match landmarks already associated this frame.
        already = np.isin(lm, assoc[assoc >= 0])
        valid_search = valid.copy()
        valid_search[:n_local] &= ~already

        m = search_by_projection(
            jnp.asarray(pts), jnp.asarray(desc), jnp.asarray(valid_search),
            jnp.asarray(octv), jnp.asarray(self.R), jnp.asarray(self.t),
            frame, cfg.camera, cfg.orb.level_scales,
            radius=4.0, max_dist=50, ratio=0.8, check_ur=True,
            max_dist_p=jnp.asarray(maxd), min_dist_p=jnp.asarray(mind),
            normal_p=jnp.asarray(normal),
        )
        m = resolve_duplicates(m, frame.n)
        midx, mmask = jax.device_get((m.idx, m.mask))
        new_assoc = assoc.copy()
        rows = np.nonzero(mmask)[0]
        rows = rows[rows < n_local]
        for r in rows:
            f = midx[r]
            if new_assoc[f] < 0:
                new_assoc[f] = lm[r]

        line_kw = self._match_map_lines()
        R, t, new_assoc, n_inl = self._pose_opt_from_assoc(
            frame, new_assoc, self.R, self.t, line_kw=line_kw
        )
        self.R, self.t = R, t
        found = new_assoc[new_assoc >= 0]
        self.map.pt_found[found] += 1
        self.map.pt_visible[lm] += 1
        return new_assoc, n_inl

    def _match_map_lines(self):
        """Match 3D map lines into the current frame's line features;
        returns pose-optimizer kwargs (or None when lines are off)."""
        lf = self.cur_lines
        self.cur_ln_assoc = None
        if lf is None or not self.map.ln_valid.any():
            return None
        from ..backend.residuals import line_obs_coeffs
        from ..matching.line_matcher import search_lines_by_projection

        cap = self.cfg.lines.n_lines
        ids = np.nonzero(self.map.ln_valid)[0][:cap]
        n = len(ids)
        starts = np.zeros((cap, 3), np.float32)
        ends = np.zeros((cap, 3), np.float32)
        descs = np.zeros((cap, 32), np.uint8)
        valid = np.zeros(cap, bool)
        starts[:n] = self.map.ln_start[ids]
        ends[:n] = self.map.ln_end[ids]
        descs[:n] = self.map.ln_desc[ids]
        valid[:n] = True
        m = search_lines_by_projection(
            jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(descs),
            jnp.asarray(valid), jnp.asarray(self.R), jnp.asarray(self.t),
            lf, self.cfg.camera,
        )
        mask, idx = jax.device_get((m.mask, m.idx))
        if mask.sum() < 3:
            return None
        obs = line_obs_coeffs(lf.p0[m.idx], lf.p1[m.idx])
        ln_assoc = np.full(lf.n, -1, np.int32)
        rows = np.nonzero(mask)[0]
        ln_assoc[idx[rows[rows < n]]] = ids[rows[rows < n]]
        self.cur_ln_assoc = ln_assoc
        return {
            "line_start_w": jnp.asarray(starts),
            "line_end_w": jnp.asarray(ends),
            "line_obs": obs,
            "line_octave": jnp.zeros(cap, jnp.int32),
            "line_valid": jnp.asarray(mask & valid),
        }

    # ------------------------------------------------------------------
    def _need_keyframe(self, frame: Frame, assoc, n_inliers):
        cfg = self.cfg.tracking
        if self.localization_only:
            return False
        if self.map._next_kf >= self.cfg.map.max_keyframes - 2:
            return False
        depth = self.cur_fh.depth
        valid = self.cur_fh.valid
        close = valid & (depth > 0) & (depth < cfg.th_depth * self.cfg.camera.baseline)
        tracked_close = int((close & (assoc >= 0)).sum())
        untracked_close = int((close & (assoc < 0)).sum())
        need_close = tracked_close < 100 and untracked_close > 70
        is_mono = not bool((depth > 0).any())
        # Mono inserts more eagerly (reference: thRefRatio 0.9 mono,
        # 0.75 stereo) since landmarks only come from triangulation.
        ref_ratio = 0.9 if is_mono else 0.75
        c1 = self.frames_since_kf >= cfg.max_frames_between_kf
        # ref_kf_matches is the inlier count when the reference KF was
        # created: insert when tracking quality decays below the ratio
        # (the reference compares against the ref KF's tracked map
        # points) or close points starve.
        # Absolute floor (stereo/RGB-D only): refresh the map before
        # tracking approaches the LOST boundary regardless of relative
        # decay.  Mono is excluded: forcing adjacent-frame KFs there
        # triangulates at near-zero baseline and corrupts the map.
        weak = (not is_mono) and n_inliers < 50
        c2 = n_inliers < self.ref_kf_matches * ref_ratio or need_close or weak
        c_min = self.frames_since_kf >= (1 if is_mono else 2) or need_close or weak
        return (c1 or (c2 and c_min)) and n_inliers > 15

    def _create_keyframe(self, frame: Frame, assoc, timestamp):
        cfg = self.cfg
        fh = self.cur_fh
        self.flush_pending_ba()
        kf = self.map.add_keyframe(
            fh, self.R, self.t, self.frame_id, timestamp, lm_assoc=assoc
        )
        # New landmarks from stereo depth for unassociated features
        # (close ones always; mirrors Tracking::CreateNewKeyFrame).
        depth = fh.depth
        valid = fh.valid
        baseline = cfg.camera.baseline
        candidates = np.nonzero(valid & (depth > 0) & (assoc < 0))[0]
        if len(candidates):
            order = candidates[np.argsort(depth[candidates])]
            close = depth[order] < cfg.tracking.th_depth * baseline
            n_close = close.sum()
            keep = order[close] if n_close >= 100 else order[:100]
            pts_c = nbackproject(cfg.camera, fh.xy, fh.depth)[keep]
            Rwc, twc = nse3_inverse(self.R, self.t)
            pts_w = nse3_apply(Rwc, twc, pts_c)
            ids = self.map.add_points(
                pts_w, fh.desc[keep], fh.octave[keep], kf, keep
            )
            self.recent_lm.append(ids)

        # Line landmarks: store this KF's line features; create 3D lines
        # from stereo endpoint depths for unmatched steep lines
        # (CreateNewMapLines analog).
        if self.cfg.lines.enabled and self.cur_lines is not None:
            lf = jax.device_get(self.cur_lines)  # one batched fetch
            ln_assoc = (
                self.cur_ln_assoc
                if self.cur_ln_assoc is not None
                else np.full(lf.n, -1, np.int32)
            )
            self.map.set_kf_lines(kf, lf, ln_assoc)
            new_ln = np.nonzero(
                lf.valid & (lf.depth0 > 0) & (lf.depth1 > 0) & (ln_assoc < 0)
            )[0]
            if len(new_ln):
                Rwc, twc = nse3_inverse(self.R, self.t)
                s_c = nbackproject(cfg.camera, lf.p0[new_ln], lf.depth0[new_ln])
                e_c = nbackproject(cfg.camera, lf.p1[new_ln], lf.depth1[new_ln])
                s_w = nse3_apply(Rwc, twc, s_c)
                e_w = nse3_apply(Rwc, twc, e_c)
                ids = self.map.add_lines(
                    s_w, e_w, lf.desc[new_ln], kf, new_ln
                )

        # Landmark stats for everything this KF observes.
        seen = self.map.kf_obs_lm[kf]
        self.map.update_point_stats(seen[seen >= 0])

        # --- inline local mapping step ---
        if len(self.recent_lm) > 3:
            old = self.recent_lm.pop(0)
            self.map.cull_points(kf, old)
        # Multi-view triangulation of additional landmarks
        # (CreateNewMapPoints) — essential for mono, fills in far points
        # for stereo.
        if self.map.n_keyframes() >= 2:
            from ..slam_map.triangulation import create_new_map_points

            tri_ids = create_new_map_points(
                self.map, kf, cfg.camera, cfg.orb.scale_factor
            )
            if len(tri_ids):
                self.recent_lm.append(tri_ids)
            # Cross-KF duplicate fusion (SearchInNeighbors).
            from ..slam_map.fuse import search_in_neighbors

            search_in_neighbors(
                self.map, kf, cfg.camera, cfg.orb.level_scales
            )
        if self.map.n_keyframes() >= 3:
            self._local_ba(kf, defer=self.async_mapping)
            # Redundant-keyframe culling over the local window.
            win, _ = self.map.covisible_keyframes(kf, min_weight=1, max_n=8)
            self.map.cull_keyframes([k for k in win if k != kf])

        self.ref_kf = kf
        # Tracking quality at creation time (floor avoids KF starvation
        # in sparse scenes).
        self.ref_kf_matches = max(int((np.asarray(frame.valid) & (assoc >= 0)).sum()), 40)
        if self.on_keyframe is not None:
            self.on_keyframe(kf)
            # A loop closure may have rewritten keyframe poses; ride
            # with the (possibly corrected) reference keyframe.
            self.R = self.map.kf_R[kf].copy()
            self.t = self.map.kf_t[kf].copy()

    def _local_ba(self, center_kf, defer: bool = False):
        """Local bundle adjustment.  With defer=True the device solve is
        dispatched asynchronously and written back at the NEXT keyframe
        (flush_pending_ba) — the tracking thread never blocks on mapping,
        the property the reference gets from its LocalMapping pthread
        (SURVEY.md §7.2 hard-part #4)."""
        mc = self.cfg.map
        pack = self.map.pack_local_ba(
            center_kf,
            max_cams=mc.local_window + 16,
            max_points=mc.local_points,
            max_obs=(mc.local_window + 16) * 512,
        )
        lpack = None
        if self.cfg.lines.enabled:
            lpack = self.map.pack_line_obs(
                pack["cam_ids"], max_lines=self.cfg.lines.n_lines,
                max_lobs=self.cfg.lines.n_lines * 8,
            )
        if lpack is not None:
            from ..backend.line_ba import bundle_adjust_pl
            from ..geometry.lines3d import (
                orthonormal_from_pluecker,
                pluecker_from_endpoints,
            )

            ids = lpack["ln_ids"]
            Lc = self.cfg.lines.n_lines
            s_w = np.zeros((Lc, 3), np.float32)
            e_w = np.ones((Lc, 3), np.float32)
            lval = np.zeros(Lc, bool)
            s_w[: len(ids)] = self.map.ln_start[ids]
            e_w[: len(ids)] = self.map.ln_end[ids]
            lval[: len(ids)] = True
            U0, w0 = orthonormal_from_pluecker(
                *pluecker_from_endpoints(jnp.asarray(s_w), jnp.asarray(e_w))
            )
            res = bundle_adjust_pl(
                jnp.asarray(pack["R"]), jnp.asarray(pack["t"]),
                jnp.asarray(pack["cam_fixed"]),
                jnp.asarray(pack["points"]), jnp.asarray(pack["point_valid"]),
                jnp.asarray(pack["obs_cam"]), jnp.asarray(pack["obs_lm"]),
                jnp.asarray(pack["obs_uvur"]), jnp.asarray(pack["obs_oct"]),
                jnp.asarray(pack["obs_valid"]),
                U0, w0, jnp.asarray(lval),
                jnp.asarray(lpack["lobs_cam"]), jnp.asarray(lpack["lobs_ln"]),
                jnp.asarray(lpack["lobs_a"]), jnp.asarray(lpack["lobs_b"]),
                jnp.zeros(len(lpack["lobs_cam"]), jnp.int32),
                jnp.asarray(lpack["lobs_valid"]),
                self.cfg.camera, self.cfg.orb.scale_factor,
            )
        else:
            res = bundle_adjust(
                jnp.asarray(pack["R"]), jnp.asarray(pack["t"]), jnp.asarray(pack["cam_fixed"]),
                jnp.asarray(pack["points"]), jnp.asarray(pack["point_valid"]),
                jnp.asarray(pack["obs_cam"]), jnp.asarray(pack["obs_lm"]),
                jnp.asarray(pack["obs_uvur"]), jnp.asarray(pack["obs_oct"]),
                jnp.asarray(pack["obs_valid"]), self.cfg.camera,
                self.cfg.orb.scale_factor,
            )
        if defer:
            self._pending_ba = (pack, lpack, res, center_kf)
            return
        self._apply_ba(pack, lpack, res, center_kf, ride=True)

    def _apply_ba(self, pack, lpack, res, center_kf, ride=False):
        self.map.apply_ba_result(pack, res)
        if lpack is not None:
            self.map.apply_line_ba_result(
                lpack, np.asarray(res.line_U), np.asarray(res.line_w),
                np.asarray(res.lobs_inlier),
            )
        if ride:
            # Current pose rides with the reference KF.
            self.R = self.map.kf_R[center_kf].copy()
            self.t = self.map.kf_t[center_kf].copy()

    def flush_pending_ba(self):
        """Apply a deferred BA result (no-op if none pending)."""
        pending = getattr(self, "_pending_ba", None)
        if pending is None:
            return
        pack, lpack, res, center_kf = pending
        self._pending_ba = None
        self._apply_ba(pack, lpack, res, center_kf, ride=False)

"""Capacity-bounded SoA map store — the TPU-native "map data model".

Replaces the reference's pointer-graph L1 layer (KeyFrame / MapPoint /
Map classes with per-object mutexes — src/{KeyFrame,MapPoint,Map}.cc,
SURVEY.md §1 L1, §7.0): keyframes, landmarks and observations live in
flat preallocated numpy arrays on the host (single-writer bookkeeping),
and device programs receive packed dense views.  Deletion is a mask
clear; nothing ever reallocates, so jitted consumers never recompile.

Observation model: each keyframe keeps its frame's feature slots
([F] per KF); ``kf_obs_lm[k, f]`` is the landmark id observed by
feature f of keyframe k (-1 = none) — the analog of
KeyFrame::mvpMapPoints, and the only place observations are stored
(MapPoint::mObservations is derived from it on demand).
"""

from __future__ import annotations

import numpy as np

from ..config import MapConfig


class MapStore:
    def __init__(self, cfg: MapConfig, n_features: int, n_lines: int = 0):
        self.cfg = cfg
        K, P, F = cfg.max_keyframes, cfg.max_points, n_features
        self.K, self.P, self.F = K, P, F

        # --- keyframes ---
        self.kf_valid = np.zeros(K, bool)
        self.kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        self.kf_t = np.zeros((K, 3), np.float32)
        self.kf_frame_id = np.full(K, -1, np.int64)
        self.kf_timestamp = np.zeros(K, np.float64)
        # per-KF feature slots (copied from the source Frame)
        self.kf_xy = np.zeros((K, F, 2), np.float32)
        self.kf_ur = np.full((K, F), -1.0, np.float32)
        self.kf_depth = np.full((K, F), -1.0, np.float32)
        self.kf_oct = np.zeros((K, F), np.int32)
        self.kf_angle = np.zeros((K, F), np.float32)
        self.kf_desc = np.zeros((K, F, 32), np.uint8)
        self.kf_feat_valid = np.zeros((K, F), bool)
        self.kf_obs_lm = np.full((K, F), -1, np.int32)

        # --- landmarks (points) ---
        self.pt_valid = np.zeros(P, bool)
        self.pt_pos = np.zeros((P, 3), np.float32)
        self.pt_desc = np.zeros((P, 32), np.uint8)
        self.pt_normal = np.zeros((P, 3), np.float32)
        self.pt_min_dist = np.zeros(P, np.float32)
        self.pt_max_dist = np.zeros(P, np.float32)
        self.pt_oct = np.zeros(P, np.int32)  # reference octave at creation
        self.pt_first_kf = np.full(P, -1, np.int32)
        self.pt_visible = np.zeros(P, np.int32)
        self.pt_found = np.zeros(P, np.int32)

        self._next_kf = 0
        self._free_pts = list(range(P - 1, -1, -1))

        # --- 3D line segments (MapLine analog, SURVEY.md §2.1 row 8) ---
        L = cfg.max_lines
        self.L = L
        self.Lf = n_lines  # line-feature slots per keyframe
        self.ln_valid = np.zeros(L, bool)
        self.ln_start = np.zeros((L, 3), np.float32)
        self.ln_end = np.zeros((L, 3), np.float32)
        self.ln_desc = np.zeros((L, 32), np.uint8)
        self.ln_first_kf = np.full(L, -1, np.int32)
        self._free_lines = list(range(L - 1, -1, -1))
        if n_lines:
            self.kf_ln_p0 = np.zeros((K, n_lines, 2), np.float32)
            self.kf_ln_p1 = np.zeros((K, n_lines, 2), np.float32)
            self.kf_ln_desc = np.zeros((K, n_lines, 32), np.uint8)
            self.kf_ln_valid = np.zeros((K, n_lines), bool)
            self.kf_ln_obs = np.full((K, n_lines), -1, np.int32)

    # ------------------------------------------------------------------
    # keyframes
    # ------------------------------------------------------------------
    def add_keyframe(self, frame, R_cw, t_cw, frame_id, timestamp=0.0, lm_assoc=None):
        """Insert a keyframe snapshot of `frame` (a frontend Frame pytree
        already on host or device). Returns the keyframe id."""
        if self._next_kf >= self.K:
            raise RuntimeError("keyframe capacity exceeded")
        k = self._next_kf
        self._next_kf += 1
        self.kf_valid[k] = True
        self.kf_R[k] = np.asarray(R_cw, np.float32)
        self.kf_t[k] = np.asarray(t_cw, np.float32)
        self.kf_frame_id[k] = frame_id
        self.kf_timestamp[k] = timestamp
        self.kf_xy[k] = np.asarray(frame.xy)
        self.kf_ur[k] = np.asarray(frame.u_right)
        self.kf_depth[k] = np.asarray(frame.depth)
        self.kf_oct[k] = np.asarray(frame.octave)
        self.kf_angle[k] = np.asarray(frame.angle)
        self.kf_desc[k] = np.asarray(frame.desc)
        self.kf_feat_valid[k] = np.asarray(frame.valid)
        if lm_assoc is not None:
            assoc = np.asarray(lm_assoc, np.int32).copy()
            assoc[~self.kf_feat_valid[k]] = -1
            # Drop associations to dead landmarks.
            assoc[(assoc >= 0) & ~self.pt_valid[np.clip(assoc, 0, self.P - 1)]] = -1
            self.kf_obs_lm[k] = assoc
        return k

    def n_keyframes(self) -> int:
        return int(self.kf_valid.sum())

    def set_kf_lines(self, kf_id, line_feat, ln_assoc=None):
        """Attach a keyframe's line features (frontend LineFeatures)."""
        if not self.Lf:
            return
        self.kf_ln_p0[kf_id] = np.asarray(line_feat.p0)
        self.kf_ln_p1[kf_id] = np.asarray(line_feat.p1)
        self.kf_ln_desc[kf_id] = np.asarray(line_feat.desc)
        self.kf_ln_valid[kf_id] = np.asarray(line_feat.valid)
        if ln_assoc is not None:
            a = np.asarray(ln_assoc, np.int32).copy()
            a[~self.kf_ln_valid[kf_id]] = -1
            a[(a >= 0) & ~self.ln_valid[np.clip(a, 0, self.L - 1)]] = -1
            self.kf_ln_obs[kf_id] = a

    def add_lines(self, starts, ends, descs, kf_id, feat_idx):
        """Allocate new 3D line landmarks observed by (kf_id, feat_idx)."""
        n = min(len(starts), len(self._free_lines))
        ids = np.array([self._free_lines.pop() for _ in range(n)], np.int32)
        if n == 0:
            return ids
        self.ln_valid[ids] = True
        self.ln_start[ids] = np.asarray(starts, np.float32)[:n]
        self.ln_end[ids] = np.asarray(ends, np.float32)[:n]
        self.ln_desc[ids] = np.asarray(descs, np.uint8)[:n]
        self.ln_first_kf[ids] = kf_id
        if self.Lf:
            self.kf_ln_obs[kf_id, np.asarray(feat_idx)[:n]] = ids
        return ids

    def erase_lines(self, ids):
        ids = np.atleast_1d(np.asarray(ids, np.int32))
        live = ids[self.ln_valid[ids]]
        self.ln_valid[live] = False
        if self.Lf:
            for k in np.nonzero(self.kf_valid)[0]:
                sl = np.isin(self.kf_ln_obs[k], live)
                self.kf_ln_obs[k][sl] = -1
        self._free_lines.extend(int(i) for i in live)

    # ------------------------------------------------------------------
    # landmarks
    # ------------------------------------------------------------------
    def add_points(self, positions, descs, octaves, kf_id, feat_idx):
        """Allocate new landmarks observed by (kf_id, feat_idx). Returns ids."""
        n = len(positions)
        if n > len(self._free_pts):
            n = len(self._free_pts)
        ids = np.array([self._free_pts.pop() for _ in range(n)], np.int32)
        if n == 0:
            return ids
        positions = np.asarray(positions, np.float32)[:n]
        self.pt_valid[ids] = True
        self.pt_pos[ids] = positions
        self.pt_desc[ids] = np.asarray(descs, np.uint8)[:n]
        self.pt_oct[ids] = np.asarray(octaves, np.int32)[:n]
        self.pt_first_kf[ids] = kf_id
        self.pt_visible[ids] = 1
        self.pt_found[ids] = 1
        self.kf_obs_lm[kf_id, np.asarray(feat_idx)[:n]] = ids
        # viewing geometry
        cam_center = -self.kf_R[kf_id].T @ self.kf_t[kf_id]
        d = positions - cam_center
        dist = np.linalg.norm(d, axis=-1) + 1e-9
        self.pt_normal[ids] = d / dist[:, None]
        oc = self.pt_oct[ids].astype(np.float64)
        # The extra 1.2 calibrates PredictScale to THIS detector: our
        # per-cell top-K favors one-coarser levels than OpenCV's octree,
        # so the expected octave at the creation distance is ~1, not 0.
        self.pt_max_dist[ids] = dist * (1.2 ** oc) * 1.2
        self.pt_min_dist[ids] = self.pt_max_dist[ids] / (1.2 ** 8)
        return ids

    def erase_point(self, ids):
        ids = np.atleast_1d(np.asarray(ids, np.int32))
        live = ids[self.pt_valid[ids]]
        self.pt_valid[live] = False
        for k in np.nonzero(self.kf_valid)[0]:
            sl = np.isin(self.kf_obs_lm[k], live)
            self.kf_obs_lm[k][sl] = -1
        self._free_pts.extend(int(i) for i in live)

    def point_observations(self, lm_ids):
        """For each landmark id: list of (kf, feat) observing it."""
        out = {int(i): [] for i in lm_ids}
        lm_set = set(int(i) for i in lm_ids)
        for k in np.nonzero(self.kf_valid)[0]:
            obs = self.kf_obs_lm[k]
            for f in np.nonzero(np.isin(obs, list(lm_set)))[0]:
                out[int(obs[f])].append((int(k), int(f)))
        return out

    def obs_counts(self) -> np.ndarray:
        """Number of keyframe observations per landmark, [P]."""
        counts = np.zeros(self.P + 1, np.int64)
        obs = self.kf_obs_lm[self.kf_valid]
        np.add.at(counts, np.where(obs >= 0, obs, self.P).ravel(), 1)
        return counts[: self.P]

    # ------------------------------------------------------------------
    # covisibility (derived)
    # ------------------------------------------------------------------
    def covisibility(self) -> np.ndarray:
        """Weighted covisibility matrix [K, K]: #shared landmarks.

        Derived from kf_obs_lm (KeyFrame::UpdateConnections recomputes
        per insertion; we recompute on demand — sparse-friendly).
        """
        Kn = self._next_kf
        W = np.zeros((Kn, Kn), np.int32)
        # landmark -> observing keyframes via sorted pair list
        pairs = []
        for k in np.nonzero(self.kf_valid[:Kn])[0]:
            lm = self.kf_obs_lm[k]
            lm = lm[lm >= 0]
            pairs.append(np.stack([lm, np.full(len(lm), k)], -1))
        if not pairs:
            return W
        pairs = np.concatenate(pairs)
        order = np.argsort(pairs[:, 0], kind="stable")
        pairs = pairs[order]
        lm_ids, starts = np.unique(pairs[:, 0], return_index=True)
        ends = np.append(starts[1:], len(pairs))
        for s, e in zip(starts, ends):
            ks = pairs[s:e, 1]
            if len(ks) > 1:
                W[np.ix_(ks, ks)] += 1
        np.fill_diagonal(W, 0)
        return W

    def covisible_keyframes(self, kf_id, min_weight=15, max_n=None):
        W = self.covisibility()
        w = W[kf_id]
        ids = np.nonzero(w >= min_weight)[0]
        ids = ids[np.argsort(-w[ids])]
        if max_n is not None:
            ids = ids[:max_n]
        return ids, w[ids]

    # ------------------------------------------------------------------
    # descriptor / normal maintenance
    # ------------------------------------------------------------------
    def update_point_stats(self, lm_ids):
        """Recompute distinctive descriptor (min median Hamming) and mean
        viewing normal (MapPoint::ComputeDistinctiveDescriptors /
        UpdateNormalAndDepth) for the given landmarks."""
        lm_ids = np.atleast_1d(np.asarray(lm_ids, np.int32))
        lm_ids = lm_ids[self.pt_valid[lm_ids]]
        if len(lm_ids) == 0:
            return
        obs_map = self.point_observations(lm_ids)
        for i in lm_ids:
            obs = obs_map[int(i)]
            if not obs:
                continue
            descs = np.stack([self.kf_desc[k, f] for k, f in obs])
            bits = np.unpackbits(descs, axis=1)
            dist = (bits[:, None] != bits[None, :]).sum(-1)
            med = np.median(dist, axis=1)
            self.pt_desc[i] = descs[med.argmin()]
            centers = np.stack(
                [-self.kf_R[k].T @ self.kf_t[k] for k, f in obs]
            )
            d = self.pt_pos[i] - centers
            d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
            self.pt_normal[i] = d.mean(0) / (np.linalg.norm(d.mean(0)) + 1e-9)
            # scale-invariance range from the last observation
            k_ref, f_ref = obs[-1]
            dist_ref = np.linalg.norm(self.pt_pos[i] - centers[-1])
            oc = float(self.kf_oct[k_ref, f_ref])
            self.pt_max_dist[i] = dist_ref * (1.2 ** oc) * 1.2
            self.pt_min_dist[i] = self.pt_max_dist[i] / (1.2 ** 8)

    # ------------------------------------------------------------------
    # culling
    # ------------------------------------------------------------------
    def cull_points(self, current_kf: int, recent_ids):
        """MapPointCulling: drop recently-created landmarks that are
        under-observed or rarely found (SURVEY.md §3.3)."""
        recent_ids = np.asarray(recent_ids, np.int32)
        if len(recent_ids) == 0:
            return np.array([], np.int32)
        recent_ids = recent_ids[self.pt_valid[recent_ids]]
        counts = self.obs_counts()
        found_ratio = self.pt_found[recent_ids] / np.maximum(
            self.pt_visible[recent_ids], 1
        )
        age = current_kf - self.pt_first_kf[recent_ids]
        bad = (found_ratio < 0.25) | ((age >= 2) & (counts[recent_ids] <= 2))
        doomed = recent_ids[bad]
        self.erase_point(doomed)
        return doomed

    def cull_keyframes(self, window_ids):
        """KeyFrameCulling: a KF whose landmarks are ≥90% seen by ≥3
        other KFs at same-or-finer scale is redundant (SURVEY.md §3.3)."""
        counts = self.obs_counts()
        culled = []
        for k in window_ids:
            if k == 0 or not self.kf_valid[k]:
                continue
            lm = self.kf_obs_lm[k]
            lm = lm[lm >= 0]
            if len(lm) < 20:
                continue
            redundant = (counts[lm] >= 4).mean()  # self + 3 others
            if redundant > 0.9:
                self.kf_valid[k] = False
                self.kf_obs_lm[k] = -1
                culled.append(int(k))
        return culled

    # ------------------------------------------------------------------
    # dense views for device programs
    # ------------------------------------------------------------------
    def pack_local_ba(self, center_kf: int, max_cams: int, max_points: int,
                      max_obs: int, min_covis: int = 1, all_free: bool = False):
        """Assemble the local-BA window around center_kf.

        Free cameras: center + best covisible KFs (up to local_window).
        Fixed cameras: other KFs observing the window's landmarks.
        Returns dict of padded arrays for backend.local_ba.bundle_adjust
        plus index maps for write-back.
        """
        cfg = self.cfg
        if all_free:
            # Global BA: every valid keyframe is a free vertex.
            window = [int(k) for k in np.nonzero(self.kf_valid[: self._next_kf])[0]][
                :max_cams
            ]
        else:
            W = self.covisibility()
            w = W[center_kf].copy()
            w[~self.kf_valid[: len(w)]] = 0
            order = np.argsort(-w)
            window = [center_kf] + [
                int(k) for k in order if w[k] >= min_covis and k != center_kf
            ][: cfg.local_window - 1]

        # Landmarks seen from the window.
        lm_set = np.unique(
            np.concatenate([self.kf_obs_lm[k][self.kf_obs_lm[k] >= 0] for k in window])
        )
        lm_set = lm_set[self.pt_valid[lm_set]][:max_points]
        lm_lookup = np.full(self.P, -1, np.int32)
        lm_lookup[lm_set] = np.arange(len(lm_set), dtype=np.int32)

        # Fixed cameras: any other valid KF observing those landmarks.
        fixed = []
        for k in np.nonzero(self.kf_valid[: self._next_kf])[0]:
            if k in window:
                continue
            obs = self.kf_obs_lm[k]
            if np.any(lm_lookup[obs[obs >= 0]] >= 0):
                fixed.append(int(k))
        # Keep gauge: if no fixed cams, fix the oldest window cam.
        cams = window + fixed[: max_cams - len(window)]
        cam_fixed = np.array(
            [False] * len(window) + [True] * (len(cams) - len(window))
        )
        if not cam_fixed.any():
            cam_fixed[np.argmin([self.kf_frame_id[k] for k in cams])] = True

        C = max_cams
        R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
        t = np.zeros((C, 3), np.float32)
        fixed_mask = np.ones(C, bool)
        for i, k in enumerate(cams):
            R[i] = self.kf_R[k]
            t[i] = self.kf_t[k]
            fixed_mask[i] = cam_fixed[i]

        # Observations.
        oc_list, ol_list, ouv_list, ooct_list, okf_list, of_list = [], [], [], [], [], []
        for i, k in enumerate(cams):
            obs = self.kf_obs_lm[k]
            fsel = np.nonzero((obs >= 0) & (lm_lookup[np.clip(obs, 0, self.P - 1)] >= 0))[0]
            for f in fsel:
                oc_list.append(i)
                ol_list.append(lm_lookup[obs[f]])
                ouv_list.append(
                    [self.kf_xy[k, f, 0], self.kf_xy[k, f, 1], self.kf_ur[k, f]]
                )
                ooct_list.append(self.kf_oct[k, f])
                okf_list.append(k)
                of_list.append(f)
        O = max_obs
        n_obs = min(len(oc_list), O)
        obs_cam = np.zeros(O, np.int32)
        obs_lm = np.zeros(O, np.int32)
        obs_uvur = np.zeros((O, 3), np.float32)
        obs_oct = np.zeros(O, np.int32)
        obs_valid = np.zeros(O, bool)
        obs_kf = np.zeros(O, np.int32)
        obs_feat = np.zeros(O, np.int32)
        if n_obs:
            obs_cam[:n_obs] = oc_list[:n_obs]
            obs_lm[:n_obs] = ol_list[:n_obs]
            obs_uvur[:n_obs] = np.asarray(ouv_list[:n_obs], np.float32)
            obs_oct[:n_obs] = ooct_list[:n_obs]
            obs_valid[:n_obs] = True
            obs_kf[:n_obs] = okf_list[:n_obs]
            obs_feat[:n_obs] = of_list[:n_obs]

        pts = np.zeros((max_points, 3), np.float32)
        pt_valid = np.zeros(max_points, bool)
        pts[: len(lm_set)] = self.pt_pos[lm_set]
        pt_valid[: len(lm_set)] = True

        return {
            "R": R, "t": t, "cam_fixed": fixed_mask,
            "points": pts, "point_valid": pt_valid,
            "obs_cam": obs_cam, "obs_lm": obs_lm, "obs_uvur": obs_uvur,
            "obs_oct": obs_oct, "obs_valid": obs_valid,
            "cam_ids": np.array(cams, np.int32),
            "lm_ids": lm_set.astype(np.int32),
            "obs_kf": obs_kf, "obs_feat": obs_feat,
            "n_obs": n_obs,
        }

    def pack_line_obs(self, cam_ids, max_lines: int, max_lobs: int):
        """Line observations of the given keyframes, for the joint
        point+line bundle adjuster (indices local to cam_ids order)."""
        if not self.Lf:
            return None
        ln_set = []
        for k in cam_ids:
            o = self.kf_ln_obs[k]
            ln_set.append(o[o >= 0])
        ln_set = np.unique(np.concatenate(ln_set)) if ln_set else np.zeros(0, np.int64)
        ln_set = ln_set[self.ln_valid[ln_set]][:max_lines]
        if len(ln_set) == 0:
            return None
        lookup = np.full(self.L, -1, np.int32)
        lookup[ln_set] = np.arange(len(ln_set), dtype=np.int32)

        lc, ll, la, lb, lkf, lslot = [], [], [], [], [], []
        for ci, k in enumerate(cam_ids):
            obs = self.kf_ln_obs[k]
            sel = np.nonzero((obs >= 0) & (lookup[np.clip(obs, 0, self.L - 1)] >= 0))[0]
            for s in sel:
                lc.append(ci)
                ll.append(lookup[obs[s]])
                la.append(self.kf_ln_p0[k, s])
                lb.append(self.kf_ln_p1[k, s])
                lkf.append(k)
                lslot.append(s)
        n = min(len(lc), max_lobs)
        out = {
            "ln_ids": ln_set.astype(np.int32),
            "lobs_cam": np.zeros(max_lobs, np.int32),
            "lobs_ln": np.zeros(max_lobs, np.int32),
            "lobs_a": np.zeros((max_lobs, 2), np.float32),
            "lobs_b": np.zeros((max_lobs, 2), np.float32),
            "lobs_valid": np.zeros(max_lobs, bool),
            "lobs_kf": np.zeros(max_lobs, np.int32),
            "lobs_slot": np.zeros(max_lobs, np.int32),
            "n_lobs": n,
        }
        if n:
            out["lobs_cam"][:n] = lc[:n]
            out["lobs_ln"][:n] = ll[:n]
            out["lobs_a"][:n] = np.asarray(la[:n], np.float32)
            out["lobs_b"][:n] = np.asarray(lb[:n], np.float32)
            out["lobs_valid"][:n] = True
            out["lobs_kf"][:n] = lkf[:n]
            out["lobs_slot"][:n] = lslot[:n]
        return out

    def apply_line_ba_result(self, lpack, line_U, line_w, lobs_inlier):
        """Write back optimized 3D lines (endpoints re-anchored by
        closest-point projection onto the optimized infinite line).
        Pure host numpy: variable-length ids would recompile eager XLA
        ops at every keyframe."""
        from ..geometry.host import (
            nclosest_points_on_line,
            npluecker_from_orthonormal,
        )

        ids = lpack["ln_ids"]
        n, v = npluecker_from_orthonormal(
            np.asarray(line_U[: len(ids)]), np.asarray(line_w[: len(ids)])
        )
        self.ln_start[ids] = nclosest_points_on_line(n, v, self.ln_start[ids])
        self.ln_end[ids] = nclosest_points_on_line(n, v, self.ln_end[ids])
        inl = np.asarray(lobs_inlier)
        for o in np.nonzero(~inl[: lpack["n_lobs"]] & lpack["lobs_valid"][: lpack["n_lobs"]])[0]:
            self.kf_ln_obs[lpack["lobs_kf"][o], lpack["lobs_slot"][o]] = -1

    def apply_ba_result(self, pack, result):
        """Write back optimized poses/points; erase outlier observations."""
        cams = pack["cam_ids"]
        fixed = pack["cam_fixed"][: len(cams)]
        R = np.asarray(result.R)
        t = np.asarray(result.t)
        for i, k in enumerate(cams):
            if not fixed[i]:
                self.kf_R[k] = R[i]
                self.kf_t[k] = t[i]
        lm_ids = pack["lm_ids"]
        new_pts = np.asarray(result.points)[: len(lm_ids)]
        self.pt_pos[lm_ids] = new_pts
        inl = np.asarray(result.obs_inlier)
        n_obs = pack["n_obs"]
        bad = np.nonzero(~inl[:n_obs] & pack["obs_valid"][:n_obs])[0]
        for o in bad:
            self.kf_obs_lm[pack["obs_kf"][o], pack["obs_feat"][o]] = -1

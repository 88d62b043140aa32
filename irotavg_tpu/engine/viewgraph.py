"""The SLAM view-graph engine: frame ingestion, connection, loop closure.

Orchestration parity with `ViewGraph` (src/ViewGraph.cpp):

* `process_frame` (:1035-1145): adaptive local search against the previous
  view (`findInitialPose`, :828-902) with the keyframe gate
  ``local_rad < 5 px -> reject``; epipolar refinement; hard failure when
  the frame cannot be connected with >= min_matches; then pivot-chained
  connections back through the view window (`findPose`, :786-825).
* loop closure: min-BoW-score floor over covisible neighbours
  (:906-944), database cascade (ViewDatabase), consecutive-group
  consistency check (:948-1033, default threshold 7).
* `rot_avg`: delegates to the incremental windowed solver
  (engine/incremental.py), feeding edges from the connection store.

Where the reference calls std::exit on unrecoverable states
(:1083-1087, :1138-1142) this engine raises :class:`FrameConnectionError`
so applications can decide.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from irotavg_tpu import so3
from irotavg_tpu.engine.incremental import IncrementalRotAvg
from irotavg_tpu.geometry.twoview import (
    RelativePose, find_relative_pose, refine_pose,
)
from irotavg_tpu.matching.matchers import (
    match_by_bow, match_locally, matches_to_pairs,
)
from irotavg_tpu.placerec.bow import bow_score
from irotavg_tpu.placerec.database import ViewDatabase


class FrameConnectionError(RuntimeError):
    """Raised where the reference exits: a frame could not be connected."""


@dataclasses.dataclass
class Connection:
    pairs: np.ndarray        # (M, 2) feature indices (i-side, j-side), i < j
    pose: RelativePose       # x_j ~ R x_i + t


class ViewGraph:
    """Incremental monocular rotation-averaging SLAM engine."""

    COVISIBILITY_CONSISTENCY_TH = 7  # src/ViewGraph.hpp:99

    def __init__(self, camera, *, min_matches: int = 100):
        self.camera = camera
        self.min_matches = min_matches
        self.frames: list = []            # accepted keyframes (Frame)
        self.connections: dict[tuple[int, int], Connection] = {}
        self.adjacency: dict[int, dict[int, int]] = {}
        self.ra = IncrementalRotAvg()
        self.local_rad = 45.0             # src/ViewGraph.hpp:134
        self.db = ViewDatabase()
        self._consistent_groups: list[tuple[set, int]] = []

    # -- graph bookkeeping ---------------------------------------------------

    @property
    def num_views(self) -> int:
        return len(self.frames)

    def connect(self, i: int, j: int, pairs: np.ndarray,
                rel: RelativePose) -> None:
        if i > j:
            raise ValueError("connect expects i < j")
        self.connections[(i, j)] = Connection(pairs=pairs, pose=rel)
        self.adjacency.setdefault(i, {})[j] = len(pairs)
        self.adjacency.setdefault(j, {})[i] = len(pairs)
        self.ra.add_edge(i, j, rel.q)

    def is_connected(self, i: int, j: int) -> bool:
        return (min(i, j), max(i, j)) in self.connections

    def best_covisibility(self, i: int, n: int) -> list[int]:
        """Top-n neighbours by match count (View::getBestCovisibilityViews,
        src/View.hpp:98-136)."""
        nb = self.adjacency.get(i, {})
        return [v for v, _ in sorted(nb.items(), key=lambda x: -x[1])[:n]]

    # -- initial pose with adaptive radius ----------------------------------

    def _find_initial_pose(self, prev, curr):
        """`findInitialPose` (src/ViewGraph.cpp:828-902): local match at
        2*local_rad, update local_rad to the mean match displacement,
        escalate x1.25 (<= 5 retries) until cheirality inliers >
        2*min_matches."""
        rad = 2.0 * self.local_rad
        rel, pairs = None, np.zeros((0, 2), np.int32)
        for _ in range(6):
            m12 = match_locally(curr, prev, radius=rad, nnratio=0.9)
            cp = matches_to_pairs(m12)          # (curr_feat, prev_feat)
            if len(cp):
                d = np.hypot(
                    curr.xu[cp[:, 0]] - prev.xu[cp[:, 1]],
                    curr.yu[cp[:, 0]] - prev.yu[cp[:, 1]],
                )
                self.local_rad = float(d.mean())
            pairs = cp[:, ::-1].copy()          # -> (prev_feat, curr_feat)
            if len(pairs) <= 4:
                self.local_rad = 1.0
                break
            rel = find_relative_pose(prev, curr, pairs, self.camera,
                                     seed=self.num_views)
            if rel is not None and rel.n_cheirality > 2 * self.min_matches:
                pairs = pairs[rel.inlier_mask]
                break
            rad *= 1.25
        return rel, pairs

    # -- frame ingestion -----------------------------------------------------

    def process_frame(self, frame, win_size: int = 4) -> bool:
        """Ingest a frame; returns False when rejected (not a keyframe)."""
        if self.num_views == 0:
            self.frames.append(frame)
            self.ra.add_view()
            return True

        curr_idx = self.num_views
        prev_idx = curr_idx - 1
        prev = self.frames[prev_idx]

        rel, pairs = self._find_initial_pose(prev, frame)
        if self.local_rad < 5.0:
            return False                       # keyframe gate (:1071-1074)

        self.frames.append(frame)
        self.ra.add_view()

        if rel is not None:
            rel, pairs = refine_pose(prev, frame, rel, pairs, self.camera,
                                     min_matches=self.min_matches)
        if rel is None or len(pairs) < self.min_matches:
            raise FrameConnectionError(
                f"failed to connect frame {curr_idx}: insufficient matches "
                f"{0 if rel is None else len(pairs)}"
            )
        self.connect(prev_idx, curr_idx, pairs, rel)
        # warm-start the new rotation: R_curr = R_rel @ R_prev
        self.ra.Q[curr_idx] = so3.qmul(rel.q, self.ra.Q[prev_idx])

        # pivot chaining through the window (:1109-1136)
        pivot_idx = prev_idx
        n1 = len(self.frames[pivot_idx].valid)
        pivot2curr = np.full(n1, -1, np.int64)
        pivot2curr[pairs[:, 0]] = pairs[:, 1]

        v1 = prev_idx - 1
        while v1 >= 0 and (curr_idx - v1) <= win_size:
            got = self._find_pose_via_pivot(
                v1, curr_idx, pivot_idx, pivot2curr
            )
            if got is None:
                break
            rel_w, pairs_w = got
            if len(pairs_w) > 10:
                rel_w, pairs_w = refine_pose(
                    self.frames[v1], frame, rel_w, pairs_w, self.camera,
                    min_matches=self.min_matches,
                )
            if len(pairs_w) < self.min_matches:
                break
            self.connect(v1, curr_idx, pairs_w, rel_w)
            v1 -= 1
        return True

    def _find_pose_via_pivot(self, v1, v2, pivot, pivot2v2):
        """`findPose` (src/ViewGraph.cpp:786-825): compose stored
        (v1 -> pivot) matches with the pivot -> v2 map, then RANSAC."""
        key = (min(v1, pivot), max(v1, pivot))
        conn = self.connections.get(key)
        if conn is None:
            return None
        p = conn.pairs if key[0] == v1 else conn.pairs[:, ::-1]
        tgt = pivot2v2[p[:, 1]]
        ok = tgt >= 0
        pairs = np.stack([p[ok, 0], tgt[ok]], axis=1).astype(np.int32)
        if len(pairs) <= 5:
            return None
        rel = find_relative_pose(
            self.frames[v1], self.frames[v2], pairs, self.camera,
            seed=v1 * 7919 + v2,
        )
        if rel is None:
            return None
        return rel, pairs[rel.inlier_mask]

    # -- loop closure --------------------------------------------------------

    def detect_loop_candidates(self, view_id: int) -> list[int]:
        """Min-score floor over connected views, then the database cascade
        (:906-944)."""
        frame = self.frames[view_id]
        if frame.bow is None:
            return []
        min_score = 1.0
        for nb in self.adjacency.get(view_id, {}):
            nb_bow = self.frames[nb].bow
            if nb_bow is not None:
                min_score = min(min_score, bow_score(frame.bow, nb_bow))
        return self.db.detect_loop_candidates(
            query_id=view_id,
            bow=frame.bow,
            connected=set(self.adjacency.get(view_id, {})),
            min_score=min_score,
            covisibility_fn=self.best_covisibility,
            score_fn=bow_score,
        )

    def check_loop_consistency(self, candidates: list[int]) -> list[int]:
        """Consecutive-keyframe group consistency (:948-1033)."""
        consistent: list[int] = []
        new_groups: list[tuple[set, int]] = []
        prev_flag = [False] * len(self._consistent_groups)
        for cand in candidates:
            group = set(self.adjacency.get(cand, {})) | {cand}
            some = False
            enough = False
            for g, (pg, cnt) in enumerate(self._consistent_groups):
                if group & pg:
                    some = True
                    cur = cnt + 1
                    if not prev_flag[g]:
                        new_groups.append((group, cur))
                        prev_flag[g] = True
                    if cur >= self.COVISIBILITY_CONSISTENCY_TH and not enough:
                        consistent.append(cand)
                        enough = True
            if not some:
                new_groups.append((group, 0))
        self._consistent_groups = new_groups
        return consistent

    def close_loop(self, view_id: int, cand_id: int, *,
                   min_matches: int = 150) -> bool:
        """BoW match + relative pose + refine + connect (the loop-closure
        block of the app, src/IRotAvg.cpp:309-347)."""
        f2 = self.frames[view_id]
        f1 = self.frames[cand_id]
        m12 = match_by_bow(f1, f2, nnratio=0.9)
        pairs = matches_to_pairs(m12)
        if len(pairs) <= 4:
            return False
        rel = find_relative_pose(f1, f2, pairs, self.camera,
                                 seed=view_id * 31 + cand_id)
        if rel is None or rel.n_cheirality < min_matches:
            return False
        pairs = pairs[rel.inlier_mask]
        rel, pairs = refine_pose(f1, f2, rel, pairs, self.camera,
                                 min_matches=min_matches)
        if len(pairs) < min_matches:
            return False
        self.connect(cand_id, view_id, pairs, rel)
        return True

    def add_to_database(self, view_id: int) -> None:
        bow = self.frames[view_id].bow
        if bow is not None:
            self.db.add(view_id, bow)

    # -- solver bridge / persistence ----------------------------------------

    def rot_avg(self, win_size: int, **kw):
        return self.ra.rot_avg(win_size, **kw)

    def fix_pose(self, idx: int, q=None) -> None:
        self.ra.fix_pose(idx, q)

    def save_poses(self, path: str) -> None:
        self.ra.save_poses(path)

    def save_pose_ids(self, path: str, frame_ids=None) -> None:
        """1-based original frame ids of accepted keyframes
        (src/IRotAvg.cpp:111-128)."""
        with open(path, "w") as fh:
            for f in self.frames:
                fh.write(f"{f.id + 1}\n")

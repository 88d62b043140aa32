"""Frame — per-image feature bundle (fixed-capacity arrays + mask).

Parity with src/Frame.{hpp,cpp}: keypoints, undistorted keypoints,
descriptors, spatial grid assignment, and (when a vocabulary is attached)
BoW vectors.  The reference's ctor pipeline `findFeatures ->
undistortKeypoints -> assignFeaturesToGrid -> computeBoW`
(src/Frame.hpp:54-64) runs here as: extractor call (compiled pyramid
program) -> vectorised undistortion -> cell ids -> optional vocab
transform.  `getFeaturesInArea` (src/Frame.cpp:201-260) has no grid walk:
radius queries are masked comparisons over the padded arrays, done inside
the matching kernels instead.
"""

from __future__ import annotations

import numpy as np

from irotavg_tpu.frontend.camera import Camera


class Frame:
    """Feature bundle for one image.

    Attributes (N = extractor capacity, masked by ``valid``):
      x, y:        level-0 keypoint coords (px, distorted/original)
      xu, yu:      undistorted coords (== x, y when k1 == 0)
      octave:      pyramid level per keypoint
      angle:       orientation (radians)
      response:    FAST corner score
      size:        scaled patch diameter
      desc:        (N, 8) uint32 BRIEF-256 words
      valid:       (N,) bool
      cell:        (N, 2) int32 undistorted-grid (col, row), -1 outside
      bow, feat_nodes: filled by Vocabulary.transform (placerec)
    """

    def __init__(self, frame_id: int, image, extractor, camera: Camera,
                 vocab=None, keep_image: bool = False):
        self.id = frame_id
        # The reference Frame retains the image (Frame::getImage,
        # src/Frame.cpp:141-160) for the GUI match plots; here retention is
        # opt-in (utils/viz.plot_matches) to keep memory flat.
        self.image = np.asarray(image) if keep_image else None
        out = extractor(image)
        self.x = np.asarray(out["x0"])
        self.y = np.asarray(out["y0"])
        self.octave = np.asarray(out["octave"])
        self.angle = np.asarray(out["angle"])
        self.response = np.asarray(out["response"])
        self.size = np.asarray(out["size"])
        self.desc = np.asarray(out["desc"])
        self.valid = np.asarray(out["valid"])
        self.camera = camera

        if camera.has_distortion:
            self.xu, self.yu = camera.undistort_points(self.x, self.y)
        else:
            self.xu, self.yu = self.x, self.y

        cx, cy = camera.grid_cell(self.xu, self.yu)
        self.cell = np.stack([cx, cy], axis=1)

        self.bow = None          # (word_id -> weight) dict, L1-normalised
        self.feat_nodes = None   # (N,) int32 vocab node id at levelsup
        self._pm1 = None         # lazy (N, 256) ±1 descriptor expansion
        if vocab is not None:
            self.compute_bow(vocab)

    @classmethod
    def restore(cls, frame_id: int, camera: Camera, arrays: dict,
                bow=None, feat_nodes=None) -> "Frame":
        """Rebuild a Frame from checkpointed arrays without re-extraction.

        ``arrays`` must hold x, y, xu, yu, octave, angle, response, size,
        desc, valid, cell (the attribute layout documented above).
        """
        self = cls.__new__(cls)
        self.id = frame_id
        self.camera = camera
        self.image = None
        for name in ("x", "y", "xu", "yu", "octave", "angle", "response",
                     "size", "desc", "valid", "cell"):
            setattr(self, name, np.asarray(arrays[name]))
        self.bow = bow
        self.feat_nodes = feat_nodes
        self._pm1 = None
        return self

    @property
    def pm1(self):
        """(N, 256) ±1 bfloat16 descriptor-bit expansion, cached — the
        MXU-native form of the 256-bit BRIEF descriptor (see
        ops/match_pallas.py)."""
        if self._pm1 is None:
            from irotavg_tpu.ops.match_pallas import unpack_pm1

            self._pm1 = unpack_pm1(self.desc)
        return self._pm1

    _DEV_F32 = ("xu", "yu", "angle")

    def dev(self, name: str):
        """Device-resident copy of a feature array, cached per frame —
        avoids re-uploading the same arrays on every matcher/geometry
        dispatch (coordinates/angles as float32)."""
        import jax.numpy as jnp

        cache = self.__dict__.setdefault("_dev", {})
        if name not in cache:
            v = getattr(self, name)
            cache[name] = jnp.asarray(
                v, jnp.float32 if name in self._DEV_F32 else None
            )
        return cache[name]

    @property
    def n_valid(self) -> int:
        return int(self.valid.sum())

    def compute_bow(self, vocab, levelsup: int = 4) -> None:
        """Vocabulary transform (src/Frame.cpp:263-274, ORB_VOCAB_LEVELS=4)."""
        self.bow, self.feat_nodes = vocab.transform(
            self.desc, self.valid, levelsup=levelsup
        )

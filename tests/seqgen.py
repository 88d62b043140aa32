"""Synthetic image-sequence generator with known camera trajectory.

Renders textured 3-D planes through a moving pinhole camera (projected
quads via cv2.getPerspectiveTransform), giving real parallax so essential-
matrix geometry is well-posed.  Ground-truth rotations are returned for
trajectory-error checks — the stand-in for KITTI in this environment
(no dataset access; see BASELINE.md config 3).
"""

import cv2
import numpy as np
from scipy.spatial.transform import Rotation as Rsc


def _texture(rng, size=400):
    tex = rng.integers(60, 200, (size, size), np.uint8)
    tex = cv2.GaussianBlur(tex, (0, 0), 1.2)
    for _ in range(60):
        p = rng.integers(10, size - 30, 2)
        w, h = rng.integers(6, 30, 2)
        cv2.rectangle(tex, tuple(p), (int(p[0] + w), int(p[1] + h)),
                      int(rng.integers(0, 255)), -1)
    for _ in range(40):
        c = tuple(int(v) for v in rng.integers(15, size - 15, 2))
        cv2.circle(tex, c, int(rng.integers(3, 12)), int(rng.integers(0, 255)), -1)
    return tex


def _distortion_maps(K, k1, k2, size):
    """Sampling maps that APPLY radial distortion to an ideal pinhole
    render: distorted(p_d) = ideal(undistort(p_d)).  Uses the same
    fixed-point undistortion scheme as the runtime Camera
    (cv::undistortPoints; src/Frame.cpp:102-139 consumes the inverse)."""
    w, h = size
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    xd = (u - cx) / fx
    yd = (v - cy) / fy
    xu, yu = xd, yd
    for _ in range(5):
        r2 = xu * xu + yu * yu
        k_radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xu = xd / k_radial
        yu = yd / k_radial
    return ((xu * fx + cx).astype(np.float32),
            (yu * fy + cy).astype(np.float32))


def make_sequence(n_frames=15, size=(640, 480), fx=500.0, seed=0,
                  step=0.25, yaw_deg_per_frame=0.8, loop=False, passes=1,
                  noise_sigma=0.0, blur_sigma=0.0, k1=0.0, k2=0.0):
    """Returns (frames [uint8 images], K, R_gt (n,3,3) world->cam).

    ``noise_sigma``/``blur_sigma`` add per-frame sensor noise and optical
    blur; ``k1``/``k2`` render through a radially-distorting lens (the
    caller must then construct its Camera with the same coefficients so
    the undistortKeypoints path runs, src/Frame.cpp:102-139).  Defaults
    reproduce the clean pinhole sequences of earlier rounds.
    """
    rng = np.random.default_rng(seed)
    w, h = size
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])
    dist_maps = _distortion_maps(K, k1, k2, size) if k1 != 0.0 else None

    # planes: big background + staggered foreground panels (parallax)
    planes = []
    for i, (z, span, cx_off) in enumerate(
        [(14.0, 16.0, 0.0), (8.0, 3.0, -3.0), (7.0, 2.5, 2.0),
         (9.0, 3.0, 6.0), (8.5, 2.5, 9.5), (7.5, 2.5, -6.0)]
    ):
        tex = _texture(rng)
        cx = cx_off + (0 if i == 0 else 0.0)
        corners = np.array([
            [cx - span / 2, -span / 2.5, z],
            [cx + span / 2, -span / 2.5, z],
            [cx + span / 2, span / 2.5, z],
            [cx - span / 2, span / 2.5, z],
        ])
        planes.append((corners, tex, z))
    planes.sort(key=lambda p: -p[2])  # far to near

    if loop and passes > 1:
        # triangle-wave sweep: ``passes`` out-and-back round trips over
        # the same span, each leg offset by 0.21 of a step so no two
        # poses ever coincide (a full stop livelocks the adaptive search
        # radius — in the reference too, src/ViewGraph.cpp:840,893).
        # Repeated revisits are the loop-closure workload: place
        # recognition ties every pass back to the first, while the
        # no-loop odometry chain keeps accumulating drift.
        seg = max(n_frames // (2 * passes), 2)
        t = np.arange(n_frames)
        phase = t % (2 * seg)
        tri = np.where(phase < seg, phase, 2 * seg - phase).astype(float)
        leg = t // seg            # increments each half-pass
        u = tri + 0.21 * (leg % 4)
        yaws = u * yaw_deg_per_frame
        xs = u * step
    elif loop:
        # single out-and-back revisiting the start; the return pass is
        # offset by half a step (same no-coincidence rationale)
        h1 = n_frames // 2
        h2 = n_frames - h1
        fwd = np.arange(h1, dtype=np.float64)
        back = h1 - 1.5 - np.arange(h2)
        yaws = np.concatenate([fwd, back]) * yaw_deg_per_frame
        xs = np.concatenate([fwd, back]) * step
    else:
        yaws = np.arange(n_frames) * yaw_deg_per_frame
        xs = np.arange(n_frames) * step

    frames, R_gt = [], []
    for k in range(n_frames):
        R = Rsc.from_euler("y", yaws[k], degrees=True).as_matrix()
        C = np.array([xs[k], 0.02 * k if not loop else 0.0, 0.0])
        t = -R @ C
        canvas = np.full((h, w), 90, np.uint8)
        for corners, tex, _ in planes:
            cam = corners @ R.T + t
            if (cam[:, 2] <= 0.5).any():
                continue
            proj = (cam @ K.T)
            proj = proj[:, :2] / proj[:, 2:3]
            src = np.array([[0, 0], [tex.shape[1], 0],
                            [tex.shape[1], tex.shape[0]], [0, tex.shape[0]]],
                           np.float32)
            H = cv2.getPerspectiveTransform(src, proj.astype(np.float32))
            warped = cv2.warpPerspective(tex, H, (w, h),
                                         flags=cv2.INTER_LINEAR)
            mask = cv2.warpPerspective(
                np.full(tex.shape, 255, np.uint8), H, (w, h)
            )
            canvas = np.where(mask > 128, warped, canvas)
        if dist_maps is not None:
            canvas = cv2.remap(canvas, dist_maps[0], dist_maps[1],
                               cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_REPLICATE)
        if blur_sigma > 0:
            canvas = cv2.GaussianBlur(canvas, (0, 0), blur_sigma)
        if noise_sigma > 0:
            canvas = np.clip(
                canvas.astype(np.float32)
                + rng.normal(scale=noise_sigma, size=canvas.shape),
                0, 255,
            ).astype(np.uint8)
        frames.append(canvas)
        R_gt.append(R)
    return frames, K, np.stack(R_gt)

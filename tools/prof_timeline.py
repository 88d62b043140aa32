
"""Dev tool: per-frame wall-time timeline of the incremental engine."""
import sys, time
import numpy as np
sys.path.insert(0, "."); sys.path.insert(0, "tests")

from seqgen import make_sequence
from irotavg_tpu.engine.viewgraph import FrameConnectionError, ViewGraph
from irotavg_tpu.frontend import Camera, FramePrefetcher, ORBExtractor
from irotavg_tpu import so3
from irotavg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120
frames, K, R_gt = make_sequence(n_frames=n_frames, seed=5, loop=True)
cam = Camera(fx=K[0,0], fy=K[1,1], cx=K[0,2], cy=K[1,2], width=640, height=480)
ext = ORBExtractor(n_features=1000, n_levels=8)
vg = ViewGraph(cam, min_matches=50)
pf = FramePrefetcher(frames, ext, cam, batch=8)
t_prev = time.perf_counter()
for i in range(n_frames):
    tf0 = time.perf_counter()
    f = pf.frame(i)
    tf1 = time.perf_counter()
    try:
        ok = vg.process_frame(f, win_size=4)
    except FrameConnectionError:
        ok = False
    tp = time.perf_counter()
    tr = tp
    if ok:
        vg.rot_avg(10)
        if i % 20 == 0:
            q_gt = np.asarray(so3.rotmat_to_quat(R_gt[i]))
            vg.fix_pose(vg.num_views - 1, q_gt)
            vg.rot_avg(5_000_000)
        tr = time.perf_counter()
    print(f"{i:3d} ok={int(ok)} frame={1e3*(tf1-tf0):7.1f} proc={1e3*(tp-tf1):7.1f} ra={1e3*(tr-tp):7.1f}")

"""Dev tool: microbenchmark the pieces of fused_refine_window at batch 1.

Times, on the session device with block_until_ready fences:
  * ransac_essential at several sample budgets (batch 1)
  * fused_refine alone (the epipolar-rematch alternation)
  * fused_window_connect alone (K=3 vmapped candidates)
  * fused_refine_window (the whole phase-2 program)
  * the batch-1 eigh custom call in isolation
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def timeit(fn, reps=10):
    import jax
    jax.block_until_ready(fn(0))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(r + 1))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from seqgen import make_sequence
    from irotavg_tpu.engine.viewgraph import ViewGraph
    from irotavg_tpu.frontend import Camera, Frame, ORBExtractor
    from irotavg_tpu.geometry import fused as F
    from irotavg_tpu.geometry.essential import ransac_essential
    from irotavg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    frames, K, R_gt = make_sequence(n_frames=30, seed=5, loop=True)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=1000, n_levels=8)
    vg = ViewGraph(cam, min_matches=50)

    # run the engine until we are inside a window (>= 5 keyframes)
    fobjs = []
    for i, im in enumerate(frames):
        f = Frame(i, im, ext, cam)
        try:
            ok = vg.process_frame(f, win_size=4)
        except Exception:
            ok = False
        if ok:
            fobjs.append(f)
        if vg.num_views >= 6:
            break
    curr = fobjs[-1]
    prev = fobjs[-2]
    n = curr.capacity
    f32 = jnp.float32
    camv = jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], f32)
    th_norm = jnp.float32(1.0 / cam.fx)
    K_inv = jnp.asarray(np.linalg.inv(cam.K), f32)
    sigma2 = jnp.asarray((1.2 ** np.arange(8)) ** 2, f32)

    # phase-1 output for seeding
    p1out = jax.device_get(F.fused_initial_pose(
        curr.pm1, curr.dev("valid"), curr.dev("octave"),
        curr.dev("xu"), curr.dev("yu"),
        prev.pm1.T, prev.dev("valid"), prev.dev("octave"),
        prev.dev("xu"), prev.dev("yu"),
        jnp.float32(45.0), camv, th_norm, np.uint32(1),
        jnp.int32(100), jnp.float32(0.9)))
    E0, R0, t0_, n0, m12_cp = p1out[:5]

    def norm(x, y):
        return jnp.stack([(x - cam.cx) / cam.fx, (y - cam.cy) / cam.fy], 1)

    p1 = norm(curr.dev("xu"), curr.dev("yu"))
    j = jnp.clip(jnp.asarray(m12_cp), 0, None)
    p2 = norm(prev.dev("xu")[j], prev.dev("yu")[j])
    vmask = jnp.asarray(m12_cp) >= 0

    for s in (512, 128):
        ms = timeit(lambda r, s=s: ransac_essential(
            p1, p2, vmask, jax.random.key(r), th_norm=th_norm,
            n_samples=s)[0])
        print(f"ransac_essential n_samples={s:4d}: {ms:7.1f} ms")
    ms = timeit(lambda r: ransac_essential(
        p1, p2, vmask, jax.random.key(r), th_norm=th_norm,
        n_samples=512, h_samples=0)[0])
    print(f"ransac_essential no-homography   : {ms:7.1f} ms")

    # eigh 9x9 custom call alone
    A = jnp.asarray(np.random.default_rng(0).normal(size=(9, 9)), f32)
    A = A @ A.T
    eigh1 = jax.jit(lambda M: jnp.linalg.eigh(M)[1])
    ms = timeit(lambda r: eigh1(A + r * 1e-6))
    print(f"eigh (1, 9, 9)                   : {ms:7.1f} ms")

    # fused_refine alone (prev -> curr)
    zeros = jnp.zeros((n,), jnp.int32)
    bits_ct = jnp.swapaxes(curr.pm1, 0, 1)
    m12_pc0 = jnp.full((n,), -1, jnp.int32)
    rows = jnp.arange(n, dtype=jnp.int32)
    matched = jnp.asarray(m12_cp) >= 0
    tgt = jnp.where(matched, jnp.asarray(m12_cp), n)
    m12_pc0 = (jnp.full((n + 1,), -1, jnp.int32)
               .at[tgt].set(jnp.where(matched, rows, -1), mode="drop")[:n])
    cnt0 = jnp.sum(m12_pc0 >= 0)
    ms = timeit(lambda r: F.fused_refine(
        prev.pm1, zeros, prev.dev("valid"), prev.dev("angle"),
        prev.dev("xu"), prev.dev("yu"), prev.dev("octave"),
        bits_ct, zeros, curr.dev("valid"), curr.dev("angle"),
        curr.dev("xu"), curr.dev("yu"),
        jnp.asarray(E0, f32), jnp.asarray(R0, f32), jnp.asarray(t0_, f32),
        jnp.asarray(int(cnt0), jnp.int32), m12_pc0,
        K_inv, sigma2, camv, th_norm, jax.random.key(r),
        jnp.int32(38), has_nodes=False)[0])
    print(f"fused_refine (prev->curr)        : {ms:7.1f} ms")

    # full phase 2 via the engine's own call path
    k_pad = 3
    m12_w2p = np.full((k_pad, n), -1, np.int32)
    active = np.zeros(k_pad, bool)
    cand = fobjs[-3:][::-1][:k_pad]
    while len(cand) < k_pad:
        cand.append(cand[-1])
    for ki in range(k_pad):
        m12_w2p[ki, :50] = np.arange(50)
        active[ki] = True
    zeros_w = jnp.zeros((k_pad, n), jnp.int32)
    ms = timeit(lambda r: F.fused_refine_window(
        curr.pm1, None, curr.dev("valid"), curr.dev("angle"),
        curr.dev("xu"), curr.dev("yu"), curr.dev("octave"),
        prev.pm1, None, prev.dev("valid"), prev.dev("angle"),
        prev.dev("xu"), prev.dev("yu"), prev.dev("octave"),
        tuple((f.pm1, None, f.dev("valid"), f.dev("angle"),
               f.dev("xu"), f.dev("yu"), f.dev("octave")) for f in cand),
        m12_w2p, active,
        jnp.asarray(E0, f32), jnp.asarray(R0, f32), jnp.asarray(t0_, f32),
        jnp.asarray(m12_cp, jnp.int32), K_inv, sigma2,
        camv, th_norm, np.uint32(r), jnp.int32(50),
        has_nodes=False)[0][0])
    print(f"fused_refine_window (full phase2): {ms:7.1f} ms")


if __name__ == "__main__":
    main()

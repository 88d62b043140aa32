"""Offline batched rotation-averaging pipeline.

Semantically the same program as the incremental engine — ORB features,
local matching, essential-matrix RANSAC + refinement, keyframe thinning,
window edges, optional BoW loop closure, robust rotation averaging — but
organised for throughput instead of latency:

  1. **extract**: frames run through the compiled pyramid program in
     vmapped batches (one dispatch per ``batch`` images);
  2. **flow / keyframe thinning**: consecutive-pair mean feature
     displacement in one batched program (`fused_flow`); the reference's
     keyframe gate (reject when motion < 5 px, src/ViewGraph.cpp:1071)
     becomes greedy thinning over accumulated flow;
  3. **pair estimation**: all (i, i-k) window pairs of surviving
     keyframes solve concurrently in fixed-size chunks of
     `fused_pair_estimate` (match -> RANSAC -> refine per pair);
  4. **loop closure** (vocabulary given): BoW transform per keyframe,
     the inverted-file cascade + consecutive-group consistency exactly
     as the incremental engine, loop pairs verified in one batch;
  5. **solve**: one global spanning-tree init + L1-RA + IRLS over the
     whole graph (the reference reaches an equivalent state only through
     its quasi-global re-solves, src/IRotAvg.cpp:371-378).

Documented divergences from the incremental path (both intentional —
this mode trades step-for-step parity for batch shape):
  * window edges are matched directly (A against B) rather than through
    pivot chaining — strictly more information than composing stored
    matches (src/ViewGraph.cpp:786-825);
  * the keyframe gate uses accumulated consecutive flow as the motion
    estimate instead of the sequential adaptive-radius state machine.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from irotavg_tpu.config import PipelineConfig


@dataclasses.dataclass
class OfflineResult:
    Q: np.ndarray              # (K, 4) absolute rotations [x y z w]
    keyframes: list[int]       # source frame index per solved rotation
    edges: np.ndarray          # (M, 2) indices into keyframes
    QQ: np.ndarray             # (M, 4) relative rotations per edge
    n_matches: np.ndarray      # (M,) inlier matches per edge
    loop_edges: int            # how many edges came from loop closure
    loop_mask: np.ndarray      # (M,) bool, True where the edge is a loop edge
    stats: dict                # stage timing / solve stats


def _chunks(n, size):
    for lo in range(0, n, size):
        yield lo, min(lo + size, n)


def run_offline(images, camera, extractor, *, vocab=None,
                cfg: PipelineConfig | None = None, batch: int = 8,
                chunk: int = 8, min_matches: int | None = None,
                win_size: int | None = None, seed: int = 0,
                keyframe_gate_px: float = 5.0, refine_iters: int = 10,
                progress=None) -> OfflineResult:
    """Run the full batched pipeline over a sequence of grayscale images.

    ``images`` is a sequence of arrays or callables returning arrays
    (lazy loading).  Returns rotations for the selected keyframes; as in
    the reference, translations are never estimated.
    """
    import time

    import jax
    import jax.numpy as jnp

    from irotavg_tpu import so3
    from irotavg_tpu.geometry.fused import (
        fused_flow_gather, fused_pair_estimate_gather,
    )
    from irotavg_tpu.solver import RotationGraph, init_mst, irls, l1ra
    from irotavg_tpu.solver.irls import Cost, IRLSConfig
    from irotavg_tpu.solver.l1ra import L1RAConfig

    cfg = cfg or PipelineConfig()
    min_matches = cfg.vg_min_matches if min_matches is None else min_matches
    win_size = cfg.vg_win_size if win_size is None else win_size
    stats: dict = {}
    t_start = time.perf_counter()

    # -- stage 1: batched extraction ----------------------------------------
    B = len(images)
    # upload uint8, cast on device — 4x less interconnect traffic.
    # The jitted wrapper MUST be process-cached: a fresh jax.jit(lambda)
    # per run is a new executable identity, and on this backend every
    # identity pays the remote program-load lottery (measured ~7 s per
    # run_offline call — the whole stage's former wall time).
    ext_batched = _ext_batched(extractor.params)
    # Dispatch discipline: ONE op per batch (numpy images ride the call's
    # upload), whole-batch outputs kept as-is, then ONE concatenate+slice
    # per key for the whole sequence.  The previous per-batch tail slices
    # (12 device ops x n_batches through the tunnel at ~26 ms each) were
    # the real cost of this stage — 7 s wall against ~0.2 s of extraction
    # device compute after the banded-blur kernel fix.
    feats = {}
    for lo, hi in _chunks(B, batch):
        imgs = np.stack([
            np.asarray(images[i]() if callable(images[i]) else images[i],
                       np.uint8)
            for i in range(lo, hi)
        ])
        if hi - lo < batch:    # pad the tail batch to reuse the executable
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], batch - (hi - lo), axis=0)]
            )
        out = ext_batched(imgs)
        for k_, v in out.items():
            feats.setdefault(k_, []).append(v)
        if progress:
            progress(f"extracted {hi}/{B}")
    feats = {k_: jnp.concatenate(v)[:B] for k_, v in feats.items()}
    # device-resident stacked features (B, N, ...)
    desc = feats["desc"]
    valid = feats["valid"]
    octave = feats["octave"]
    angle = feats["angle"].astype(jnp.float32)
    if camera.has_distortion:
        xh, yh = jax.device_get((feats["x0"], feats["y0"]))
        xu, yu = camera.undistort_points(xh.ravel(), yh.ravel())
        x = jnp.asarray(xu.reshape(xh.shape), jnp.float32)
        y = jnp.asarray(yu.reshape(yh.shape), jnp.float32)
    else:
        x = feats["x0"].astype(jnp.float32)
        y = feats["y0"].astype(jnp.float32)
    stats["extract_s"] = time.perf_counter() - t_start

    # -- stage 2: consecutive flow + keyframe thinning -----------------------
    t0 = time.perf_counter()
    flows = np.zeros(B - 1, np.float32)
    counts = np.zeros(B - 1, np.int32)
    # queue every chunk, fetch once: dispatch is async, so the host never
    # blocks mid-stage on the device round trip.  Gathers + bit unpacking
    # run IN-PROGRAM (fused_flow_gather): the previous host-side
    # desc[ia]/unpack pair was ~6 dispatches per chunk through the tunnel
    # and dominated this stage's wall time.
    pending = []
    for lo, hi in _chunks(B - 1, chunk):
        ia = np.arange(lo, hi)
        pad = chunk - (hi - lo)
        ia = np.concatenate([ia, np.repeat(ia[-1:], pad)]).astype(np.int32)
        pending.append((lo, hi, fused_flow_gather(
            desc, valid, octave, x, y, ia, ia + 1, np.float32(90.0),
        )))
    for lo, hi, out in pending:
        fl, ct = jax.device_get(out)
        flows[lo:hi] = fl[: hi - lo]
        counts[lo:hi] = ct[: hi - lo]
    # greedy thinning on accumulated flow (keyframe gate parity: 5 px)
    keyframes = [0]
    acc = 0.0
    acc_since = []          # accumulated flow between consecutive keyframes
    for i in range(1, B):
        acc += float(flows[i - 1])
        if acc >= keyframe_gate_px:
            keyframes.append(i)
            acc_since.append(acc)
            acc = 0.0
    K = len(keyframes)
    stats["flow_s"] = time.perf_counter() - t0
    if K < 2:
        raise ValueError("fewer than two keyframes survive the motion gate")

    # -- stage 3: window pair estimation -------------------------------------
    t0 = time.perf_counter()
    pairs = []              # (a, b) indices into `keyframes`, a < b
    radii = []
    cum = np.concatenate([[0.0], np.cumsum(acc_since)])  # flow up to kf k
    for bkf in range(1, K):
        for w in range(1, win_size + 1):
            akf = bkf - w
            if akf < 0:
                break
            span = cum[bkf] - cum[akf]
            pairs.append((akf, bkf))
            radii.append(np.clip(1.25 * span + 30.0, 45.0, 512.0))
    pairs = np.asarray(pairs, np.int32)
    radii = np.asarray(radii, np.float32)
    kf = np.asarray(keyframes)

    K_inv = jnp.asarray(np.linalg.inv(camera.K), jnp.float32)
    sigma2 = jnp.asarray((1.2 ** np.arange(8)) ** 2, jnp.float32)
    camv = jnp.asarray([camera.fx, camera.fy, camera.cx, camera.cy],
                       jnp.float32)
    th_norm = jnp.float32(1.0 / camera.fx)

    def estimate_pairs(pair_arr, rad_arr, key0):
        """Chunked fused_pair_estimate over (P, 2) keyframe-index pairs.

        All chunks are dispatched back-to-back and fetched once at the
        end: with a synchronous per-chunk ``device_get`` the ~30 ms
        tunnel round trip serialised with compute and dominated the
        stage (measured 82% of e2e wall time in BENCH_r02)."""
        P = len(pair_arr)
        Es = np.zeros((P, 3, 3), np.float32)
        Rs = np.zeros((P, 3, 3), np.float32)
        ns = np.zeros(P, np.int32)
        succ = np.zeros(P, bool)
        pending = []
        for lo, hi in _chunks(P, chunk):
            sel = np.arange(lo, hi)
            pad = chunk - (hi - lo)
            sel = np.concatenate([sel, np.repeat(sel[-1:], pad)])
            ia = kf[pair_arr[sel, 0]].astype(np.int32)
            ib = kf[pair_arr[sel, 1]].astype(np.int32)
            pending.append((lo, hi, fused_pair_estimate_gather(
                desc, valid, octave, x, y, angle, ia, ib,
                rad_arr[sel], K_inv, sigma2, camv, th_norm,
                np.uint32((key0 + lo) & 0xFFFFFFFF),
                np.int32(min_matches),
                max_iters=refine_iters,
            )))
        for lo, hi, out in pending:
            E, R, t, n_che, m12, success = jax.device_get(out)
            m = hi - lo
            Es[lo:hi] = E[:m]
            Rs[lo:hi] = R[:m]
            ns[lo:hi] = (m12[:m] >= 0).sum(axis=1)
            succ[lo:hi] = success[:m]
            if progress:
                progress(f"pairs {hi}/{P}")
        return Es, Rs, ns, succ

    _, Rs, ns, succ = estimate_pairs(pairs, radii, seed)
    # failed pairs get one retry at a doubled search radius (the
    # incremental engine's radius-escalation analogue, :884-899)
    retry = ~succ
    if retry.any():
        _, Rs2, ns2, succ2 = estimate_pairs(
            pairs[retry], np.clip(radii[retry] * 2.0, None, 512.0),
            seed + 7919,
        )
        ridx = np.where(retry)[0][succ2]
        Rs[ridx] = Rs2[succ2]
        ns[ridx] = ns2[succ2]
        succ[ridx] = True
    edges = pairs[succ]
    # one batched conversion (a per-edge loop here is one device dispatch
    # per edge — hundreds of tunnel round trips)
    QQ = np.asarray(so3.rotmat_to_quat(jnp.asarray(Rs[succ])))
    n_matches = ns[succ]
    stats["pairs_s"] = time.perf_counter() - t0
    stats["pairs_total"] = len(pairs)
    stats["pairs_connected"] = int(succ.sum())

    # keep only the connected component containing keyframe 0 — a batch
    # tool is more useful degrading gracefully than aborting (the
    # reference exits on an unconnectable frame, src/ViewGraph.cpp:1083)
    parent = list(range(K))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    root0 = find(0)
    in_comp = np.array([find(i) == root0 for i in range(K)])
    if not in_comp.all():
        stats["dropped_keyframes"] = int((~in_comp).sum())
        remap = -np.ones(K, np.int32)
        remap[in_comp] = np.arange(int(in_comp.sum()))
        keep_edge = in_comp[edges[:, 0]] & in_comp[edges[:, 1]]
        edges = remap[edges[keep_edge]]
        QQ = QQ[keep_edge]
        n_matches = n_matches[keep_edge]
        keyframes = [k_ for k_, ok in zip(keyframes, in_comp) if ok]
        acc_since = [a for a, ok in zip(acc_since, in_comp[1:]) if ok]
        K = len(keyframes)
        kf = np.asarray(keyframes)  # loop-closure stages index through kf

    # -- stage 4: loop closure (optional) ------------------------------------
    loop_edges = 0
    loop_mask = np.zeros(len(edges), bool)
    if vocab is not None:
        t0 = time.perf_counter()
        from irotavg_tpu.placerec.bow import bow_score
        from irotavg_tpu.placerec.database import ViewDatabase

        bows = []
        for lo, hi in _chunks(K, 16):   # batched descent: one program + one
            sel = np.arange(lo, hi)     # fetch per 16 keyframes
            sel = np.concatenate([sel, np.repeat(sel[-1:], 16 - (hi - lo))])
            idx = jnp.asarray(kf[sel])  # tail padded to reuse the executable
            res = vocab.transform_batch(desc[idx], valid[idx])
            bows.extend(b for b, _ in res[: hi - lo])

        adjacency: dict[int, dict[int, int]] = {}
        for (a, b), nm in zip(edges, n_matches):
            adjacency.setdefault(int(a), {})[int(b)] = int(nm)
            adjacency.setdefault(int(b), {})[int(a)] = int(nm)

        def covis(i, topn):
            nb = adjacency.get(i, {})
            return [v for v, _ in sorted(nb.items(), key=lambda kv: -kv[1])[:topn]]

        db = ViewDatabase()
        groups: list[tuple[set, int]] = []
        cand_pairs = []
        for k_i in range(K):
            connected = set(adjacency.get(k_i, {}))
            min_score = 1.0
            for nb in connected:
                min_score = min(min_score, bow_score(bows[k_i], bows[nb]))
            cands = db.detect_loop_candidates(
                query_id=k_i, bow=bows[k_i], connected=connected,
                min_score=min_score, covisibility_fn=covis,
                score_fn=bow_score,
            )
            # consecutive-group consistency (src/ViewGraph.cpp:948-1033)
            consistent = []
            new_groups: list[tuple[set, int]] = []
            prev_flag = [False] * len(groups)
            for cand in cands:
                group = set(adjacency.get(cand, {})) | {cand}
                some = enough = False
                for g, (pg, cnt) in enumerate(groups):
                    if group & pg:
                        some = True
                        cur = cnt + 1
                        if not prev_flag[g]:
                            new_groups.append((group, cur))
                            prev_flag[g] = True
                        if (cur >= cfg.loop.covisibility_consistency_th
                                and not enough):
                            consistent.append(cand)
                            enough = True
                if not some:
                    new_groups.append((group, 0))
            groups = new_groups
            for cand in consistent:
                cand_pairs.append((cand, k_i))
            db.add(k_i, bows[k_i])

        if cand_pairs:
            cp = np.asarray(cand_pairs, np.int32)
            rad = np.full(len(cp), 512.0, np.float32)
            _, Rs2, ns2, succ2 = estimate_pairs(cp, rad, seed + 104729)
            ok = succ2 & (ns2 >= cfg.loop.min_matches)
            if ok.any():
                QQ2 = np.asarray(so3.rotmat_to_quat(jnp.asarray(Rs2[ok])))
                edges = np.concatenate([edges, cp[ok]])
                QQ = np.concatenate([QQ, QQ2])
                n_matches = np.concatenate([n_matches, ns2[ok]])
                loop_edges = int(ok.sum())
                loop_mask = np.concatenate(
                    [loop_mask, np.ones(loop_edges, bool)])
        stats["loop_s"] = time.perf_counter() - t0
        stats["loop_candidate_pairs"] = len(cand_pairs)

    # -- stage 5: global robust solve -----------------------------------------
    t0 = time.perf_counter()
    order = np.lexsort((edges[:, 0], edges[:, 1]))
    edges, QQ, n_matches = edges[order], QQ[order], n_matches[order]
    loop_mask = loop_mask[order]
    Q0 = np.zeros((K, 4))
    Q0[0] = [0, 0, 0, 1]
    Q0 = init_mst(Q0, QQ, edges, 1)
    g = RotationGraph.create(edges, QQ, Q0, f=1)
    sol = cfg.solver
    g = dataclasses.replace(
        g, Q=l1ra(g, L1RAConfig(max_iters=sol.l1_iters,
                                change_th=sol.change_th))[0]
    )
    Qf, _, iters, _ = irls(g, IRLSConfig(
        cost=Cost.parse(sol.cost), sigma=float(np.radians(sol.sigma_deg)),
        max_iters=sol.irls_iters, change_th=sol.change_th, backend="dense",
    ))
    Qf = np.asarray(so3.qnormalize(Qf))
    stats["solve_s"] = time.perf_counter() - t0
    stats["irls_iters"] = int(iters)
    stats["total_s"] = time.perf_counter() - t_start

    return OfflineResult(
        Q=Qf, keyframes=list(map(int, keyframes)), edges=edges, QQ=QQ,
        n_matches=n_matches, loop_edges=loop_edges, loop_mask=loop_mask,
        stats=stats,
    )


def _extract_one(extractor, im):
    """Single-image extraction inside vmap (reuses the per-size program)."""
    return _extract_one_p(extractor.params, im)


def _extract_one_p(params, im):
    from irotavg_tpu.frontend.orb import _compiled_extractor

    import jax.numpy as jnp

    h, w = im.shape
    fn = _compiled_extractor(h, w, params)
    return fn(im, jnp.float32(params.ini_th_fast),
              jnp.float32(params.min_th_fast))


@functools.lru_cache(maxsize=8)
def _ext_batched(params):
    """Process-cached jitted batch extractor keyed by the (hashable)
    OrbParams — one executable identity per settings, for every
    run_offline call in the process."""
    import jax
    import jax.numpy as jnp

    return jax.jit(jax.vmap(
        lambda im: _extract_one_p(params, im.astype(jnp.float32))
    ))

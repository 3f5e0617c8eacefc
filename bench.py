"""Headline benchmark + per-chip efficiency accounting.

Workload: full lambda-path gaussian lasso fit on whatever accelerator
jax.devices() offers, vs scikit-learn's Cython coordinate descent
(`lasso_path`) on CPU — the closest available stand-in for the reference's
single-thread C++ CD (the reference repo publishes no absolute numbers;
see BASELINE.md).  Correctness is asserted before timing is reported: our
objective must dominate sklearn's at every lambda (the reference test
suite's fallback criterion, tests/test_solver.py:448-465).

Per BASELINE.json's stated metric, the JSON line also reports **BCD
iterations/s per chip** (block-coordinate updates/s and CD sweeps/s over
the timed path fit) and a **roofline account** of the hot kernels:

- dense gradient ``X^T (w r)`` — bandwidth-bound matvec; % of HBM peak
- screen Gram ``Xs^T W Xs`` — MXU-bound; % of the f32(HIGHEST) matmul peak
- residual update ``Xs @ dbeta`` — bandwidth-bound; % of HBM peak
- SNP 2-bit fused decode-matmul — VPU-decode-bound; reported as packed
  GB/s and EFFECTIVE f32 TB/s (16x packing), which exceeds the HBM bound
  of any unpacked design.

Budget-proofing (round 4): the script emits a CUMULATIVE JSON line after
EVERY completed block (`_emit`), so a driver kill at any point still
leaves the freshest parseable line on stdout; the LAST line is the most
complete.  Total wall budget comes from ``ADELIE_TPU_BENCH_BUDGET_S``
(default 2100 s); each block declares an estimated cost and is skipped
with an explicit reason when the remaining budget cannot cover it.  An
upfront subprocess probe (hard timeout) checks that the accelerator
backend actually initializes — the axon tunnel's outage mode hangs init
itself — and falls back to CPU (with a note) instead of hanging forever
before the first line.

The final line: {"metric", "value", "unit", "vs_baseline",
"iters_per_s", "cd_sweeps_per_s", "kernels": {...}, per-block keys}.
``vs_baseline`` > 1 means faster than the CPU baseline.
"""

import json
import os
import time

import numpy as np

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("ADELIE_TPU_BENCH_BUDGET_S", "2100"))
RESULT = {}


def _remaining():
    return BUDGET_S - (time.monotonic() - T0)


def _emit():
    """Print the cumulative result line (the driver keeps the last one)."""
    RESULT["elapsed_s"] = round(time.monotonic() - T0, 1)
    RESULT["budget_s"] = BUDGET_S
    print(json.dumps(RESULT), flush=True)


def _transport_stamp():
    """Cheap (~8 MB) H2D probe run before every block: cross-round bench
    comparisons need to be filterable by tunnel health (identical code
    measured constraint_overhead_x at 2.1 and 3.0 in r4 purely from
    transport variance).  Returns {} off-accelerator or on any failure —
    a broken stamp must never cost a block its numbers."""
    try:
        import jax

        if jax.default_backend() == "cpu":
            return {}
        rng = np.random.default_rng(0)
        b = rng.integers(0, 255, size=(8 << 20,), dtype=np.uint8)
        t0 = time.perf_counter()
        jax.device_get(jax.device_put(b)[0])
        put_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(jax.device_put(np.zeros(8, np.float32)).sum())
        rtt_s = time.perf_counter() - t0
        return {"h2d_gbps": round(8 / 1024 / max(put_s - rtt_s, 1e-4), 3),
                "rtt_ms": round(rtt_s * 1e3, 1),
                "at_s": round(time.monotonic() - T0, 1)}
    except Exception:
        return {}


def _block(name, fn, est_s):
    """Run one bench block if the remaining budget covers its estimate.
    Each block's result dict is stamped with the live transport state."""
    rem = _remaining()
    if rem < est_s:
        RESULT[name] = {
            "skipped": f"budget: {rem:.0f}s remaining < ~{est_s}s estimate"}
    else:
        stamp = _transport_stamp()
        try:
            RESULT[name] = fn()
        except Exception as exc:
            RESULT[name] = {"error": str(exc)[:300]}
        if isinstance(RESULT[name], dict) and stamp:
            RESULT[name].setdefault("transport_stamp", stamp)
    _emit()


def _probe_backend(timeout_s=240):
    """Subprocess probe: does the default JAX backend initialize and
    complete a tiny roundtrip?  Returns the device kind string, or None.
    Run BEFORE the main process imports jax — the axon tunnel's outage
    mode hangs backend init itself, which would otherwise hang this
    script before it prints anything."""
    import subprocess
    import sys

    code = (
        "import jax, numpy as np\n"
        "x = jax.device_put(np.arange(16.0))\n"
        "assert float(jax.device_get(x.sum())) == 120.0\n"
        "print('@@DEV@@' + jax.devices()[0].device_kind, flush=True)\n"
    )
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              timeout=timeout_s, capture_output=True,
                              text=True)
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("@@DEV@@"):
            return line[len("@@DEV@@"):]
    return None

# v5e (TPU v5 lite) per-chip peaks; fall back to these when the device
# kind is unrecognized (the roofline percentages are then approximate).
# f32 matmuls at HIGHEST precision decompose into bf16 passes.  Measured
# (benchmark/gram_probe.py, r4): HIGHEST runs at the SIX-pass rate on the
# tall-skinny Gram shape (35.9 TF/s pure ~ X6's 32.1; the 3-pass
# algorithm X3 reaches 52.3 and 1-pass DEFAULT 66.2, at 35x / 1000x the
# numerical error).  Earlier rounds assumed a 3-pass ceiling, which
# understated screen_gram's roofline fraction ~2x (44.6% -> ~92%).
HBM_PEAK_GBPS = 819.0
MXU_F32_HIGHEST_TFLOPS = 197.0 / 6.0


def _objective(X, y, beta, lmda):
    n = X.shape[0]
    r = y - X @ beta
    return 0.5 * np.sum(r * r) / n + lmda * np.sum(np.abs(beta))


def _force(out):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]


def _timeit(fn, reps=100, rounds=3):
    """Per-call device time amortizing the tunnel RTT (see
    benchmark/bench_kernels.py).  Best of ``rounds`` measurement rounds;
    the RTT estimate is the min of several probes, and the subtraction is
    capped at half the elapsed time so a noisy RTT probe cannot produce
    a near-zero (or negative) kernel time for sub-ms kernels."""
    out = fn()
    _force(out)
    rtt = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _force(fn())
        rtt = min(rtt, time.perf_counter() - t0)
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _force(out)
        elapsed = time.perf_counter() - t0
        best = min(best, max(elapsed - rtt, 0.5 * elapsed) / reps)
    return max(best, 1e-9)


def _kernel_rooflines():
    """Measure the hot device kernels and report achieved vs peak."""
    import jax
    import jax.numpy as jnp
    from adelie_tpu.solver.pin import screen_gram

    rng = np.random.default_rng(1)
    out = {}

    # dense gradient X^T (w r): n=50000 p=2000 f32 (bandwidth-bound)
    n, p = 50000, 2000
    X = jnp.asarray(rng.standard_normal((n, p)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.full((n,), 1.0 / n, jnp.float32)
    grad = jax.jit(lambda X, v, w: jnp.einsum(
        "n,np->p", v * w, X, precision=jax.lax.Precision.HIGHEST))
    t = _timeit(lambda: grad(X, v, w))
    gbps = n * p * 4 / t / 1e9
    out["dense_grad"] = {
        "ms": round(t * 1e3, 3), "gbps": round(gbps, 1),
        "pct_roofline": round(100 * gbps / HBM_PEAK_GBPS, 1),
    }

    # screen Gram Xs^T W Xs: n=50000 S=1024 (MXU-bound)
    S = 1024
    Xs = jnp.asarray(rng.standard_normal((n, S)).astype(np.float32))
    gram = jax.jit(lambda Xs, w: screen_gram(Xs, w, True)[0])
    t = _timeit(lambda: gram(Xs, w))
    tflops = (2.0 * n * S * S) / t / 1e12
    out["screen_gram"] = {
        "ms": round(t * 1e3, 3), "tflops": round(tflops, 2),
        "pct_roofline": round(100 * tflops / MXU_F32_HIGHEST_TFLOPS, 1),
    }

    # residual update resid - Xs @ dbeta (bandwidth-bound)
    dbeta = jnp.asarray(rng.standard_normal(S).astype(np.float32))
    resid = v
    rupd = jax.jit(lambda r, Xs, d: r - jnp.matmul(
        Xs, d, precision=jax.lax.Precision.HIGHEST))
    t = _timeit(lambda: rupd(resid, Xs, dbeta))
    gbps = n * S * 4 / t / 1e9
    out["resid_update"] = {
        "ms": round(t * 1e3, 3), "gbps": round(gbps, 1),
        "pct_roofline": round(100 * gbps / HBM_PEAK_GBPS, 1),
    }

    # SNP fused 2-bit decode-matmul: p=100k, n=50k (VPU-decode-bound)
    try:
        from adelie_tpu.matrix._snp_pallas import snp_mul_pallas

        ps, ns = 100_000, 50_000
        nb = (ns + 3) // 4
        packed = jnp.asarray(
            rng.integers(0, 256, size=(ps, nb), dtype=np.uint64).astype(
                np.uint8)
        )
        u = jnp.asarray(rng.standard_normal(ns).astype(np.float32))
        imp = jnp.ones((ps,), jnp.float32)
        t = _timeit(lambda: snp_mul_pallas(packed, u, imp))
        packed_gbps = ps * nb / t / 1e9
        eff_tbps = 16 * packed_gbps / 1e3   # decoded-f32-equivalent traffic
        out["snp_grad"] = {
            "ms": round(t * 1e3, 3),
            "packed_gbps": round(packed_gbps, 1),
            "effective_f32_tbps": round(eff_tbps, 2),
            # >100% means the packed design beats the HBM bound of any
            # unpacked f32 layout
            "pct_vs_unpacked_hbm_bound": round(
                100 * eff_tbps * 1e3 / HBM_PEAK_GBPS, 1),
        }
    except Exception as exc:  # non-TPU backends have no Mosaic
        out["snp_grad"] = {"error": str(exc)[:120]}

    return out


def _sparse_bench():
    """Sparse matrix device kernels: the padded-CSC gather layout with
    the dense matvec as the HBM-roofline yardstick (BCOO removed in r5 —
    half the padded bandwidth, VERDICT r4 #7; the r5 feasibility probe
    measured the device gather bound itself at 0.57-0.9 GB/s useful vs
    the ~13 GB/s needed to beat dense at 1% density, so dense-above-
    crossover is the design, not an implementation gap).  Useful traffic
    for a sparse gradient is ~nnz * (4B value + 4B index)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import adelie_tpu as ad

    rng = np.random.default_rng(5)
    n, p, density = 50_000, 8_000, 0.01
    M = sp.random(n, p, density=density, format="csc", dtype=np.float32,
                  random_state=np.random.RandomState(5))
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.full((n,), 1.0 / n, jnp.float32)
    out = {"n": n, "p": p, "density": density, "nnz": int(M.nnz)}

    for layout in ("padded", "dense"):
        try:
            Xm = ad.matrix.sparse(M, layout=layout)
            f, data = Xm.mul_spec()
            fj = jax.jit(f)
            t = _timeit(lambda: fj(data, v, w), reps=50)
            gbps = M.nnz * 8 / t / 1e9
            out[layout] = {"ms": round(t * 1e3, 3),
                           "useful_gbps": round(gbps, 1),
                           "pct_hbm_roofline": round(
                               100 * gbps / HBM_PEAK_GBPS, 1)}
        except Exception as exc:
            out[layout] = {"error": str(exc)[:120]}

    # what "auto" picks at this shape (density 1% -> densify per the
    # measured crossover, matrix/_sparse.py:_DENSE_DENSITY_MIN)
    out["auto_pick"] = ad.matrix.sparse(M).layout
    return out


def _grouped_pin_bench():
    """Tombstone (r5, VERDICT r4 #8): the grouped (q>1) whole-solve Pallas
    kernel was REMOVED after losing its fixed-methodology A/B twice
    (BENCH_r04.grouped_pin pallas_speedup 0.6; BENCH_r4_inround 0.8) —
    grouped pin solves run the XLA fori_loop path.  The block now records
    that decision instead of re-benchmarking a deleted kernel."""
    return {
        "removed": True,
        "reason": ("grouped whole-solve Pallas kernel measured 0.6-0.8x "
                   "the XLA loop on v5e in r4's fixed-methodology A/Bs; "
                   "deleted in r5 (see solver/pin_pallas.py note). The "
                   "q=1 row-DMA sweep kernel (20x) is unaffected."),
    }


def _h2d_transport_probe():
    """Measure the live H2D transport: raw bandwidth of a 64 MB put, and
    whether queueing a second put before the first completes degrades it
    (observed ~3x on tunneled/relayed devices whose host-side
    serialization shares a CPU core with the relay).  Sets
    ``configs.stream_h2d_overlap`` accordingly and returns the numbers."""
    import jax

    import adelie_tpu as ad

    rng = np.random.default_rng(0)
    mb = 64
    bufs = [rng.integers(0, 255, size=(mb << 20,), dtype=np.uint8)
            for _ in range(4)]
    x = jax.device_put(bufs[0])
    jax.device_get(x[0])                              # warm the path

    t0 = time.perf_counter()
    for b in bufs[:2]:
        jax.device_get(jax.device_put(b)[0])          # put -> force, serial
    serial_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    xs = [jax.device_put(b) for b in bufs[2:]]        # queued puts
    for x in xs:
        jax.device_get(x[0])
    overlap_s = time.perf_counter() - t0

    overlap_ok = overlap_s <= 1.15 * serial_s
    ad.set_configs("stream_h2d_overlap", bool(overlap_ok))
    gbps = 2 * mb / 1024 / min(serial_s, overlap_s)
    return {
        "raw_h2d_gbps": round(gbps, 3),
        "serial_2x64mb_s": round(serial_s, 2),
        "queued_2x64mb_s": round(overlap_s, 2),
        "overlap": bool(overlap_ok),
    }


def _north_star_bench():
    """The BASELINE.json north star: full lambda-path lasso on a 1M-SNP x
    100K-sample packed matrix (25 GB packed > HBM) via the host-streaming
    matrix + streamed-KKT driver on ONE chip.

    Adaptive to the live transport: probes H2D first (and serializes tile
    copies when queued transfers degrade), then sizes the run so it
    finishes inside ``ADELIE_TPU_NORTH_STAR_BUDGET_S`` (default 3000 s) —
    at full scale when the transport allows, else at the largest
    still-out-of-HBM P with an explicit extrapolation to full scale.  The
    synthesized cache is built once (benchmark/north_star_data.py)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmark"))
    import north_star_data as nsd

    import jax
    import jax.numpy as jnp

    import adelie_tpu as ad

    budget_s = float(os.environ.get("ADELIE_TPU_NORTH_STAR_BUDGET_S", 3000))
    t_block = time.perf_counter()

    nb = (nsd.N + 3) // 4
    full_gb = nsd.P * nb / 1e9
    cached = (os.path.exists(nsd.PACKED_PATH)
              and os.path.getsize(nsd.PACKED_PATH) == nsd.P * nb
              and os.path.exists(nsd.Y_PATH))
    if not cached and budget_s < 2400:
        # the 25 GB memmap synthesis alone takes ~10-40 min on this
        # single-core host; don't burn the whole bench budget building
        # data we then have no time to run on
        return {"skipped": (
            f"north-star cache absent and budget {budget_s:.0f}s < 2400s "
            "(synthesis ~10-40 min on 1 core); run "
            "benchmark/north_star_data.py out of band first")}

    probe = _h2d_transport_probe()

    nsd.ensure()   # builds the packed memmap + response if absent

    # expected full-p passes: 2 sweeps (compile+sweep, clean sweep) + fit =
    # setup + ~4 chunk-KKT passes (50 lambdas fit one chunk; screen-growth
    # rollbacks re-sweep).  Constants calibrated on the tunneled chip
    # (benchmark/stream_sanity.py, 2026-08-19: warm fit 198 s for 0.5 GB at
    # raw 0.022 GB/s -> ~4.8 effective fit passes at ~0.55x the raw put
    # rate, per-tile fixed costs + host slice copies included).
    est_passes = 2 + 5.0
    eff_gbps = 0.55 * max(probe["raw_h2d_gbps"], 1e-3)
    est_sweep_full = full_gb / eff_gbps + 0.5 * 16
    P_run = nsd.P
    degraded = False
    from adelie_tpu.configs import configs as _cfg

    hbm_budget_prior = _cfg.snp_hbm_budget
    if est_passes * est_sweep_full > budget_s - (time.perf_counter() - t_block):
        # largest still-streaming P (> configs.snp_hbm_budget packed) that
        # fits the budget; tile-aligned.  Sizing reserves ~0.9x another
        # fit so the WARM fit also lands inside the budget — r5 learned
        # the hard way that sizing P to the full budget produces
        # cold-only captures and leaves warm_coherent unjudgeable
        # (two 3000+ s runs with no warm number).
        avail = budget_s - (time.perf_counter() - t_block)
        gb_fit = avail / (est_passes * 1.9) * eff_gbps
        P_fit = int(gb_fit * 1e9 / nb) // 65536 * 65536

        P_min = (int(_cfg.snp_hbm_budget * 1.25) // nb) \
            // 65536 * 65536 + 65536
        if P_fit < P_min:
            # severely degraded transport (tunneled chip at ~MB/s): even
            # the smallest above-HBM-budget run would blow the budget.
            # Keep the streamed path honest by LOWERING the streaming
            # threshold for this run so the matrix still streams at a
            # transport-feasible size; the degradation + linear-in-P
            # extrapolation are reported explicitly below.  The prior
            # budget is restored in the finally below (ADVICE r3 #3).
            P_run = min(max(P_fit, 2 * 65536), nsd.P)
            _cfg.snp_hbm_budget = int(P_run * nb / 1.25)
            degraded = True
        else:
            P_run = max(min(P_fit, nsd.P), P_min)

    try:
        return _north_star_run(
            nsd, P_run, nb, degraded, probe, est_passes, budget_s, t_block)
    finally:
        _cfg.snp_hbm_budget = hbm_budget_prior


def _north_star_run(nsd, P_run, nb, degraded, probe, est_passes, budget_s,
                    t_block):
    import jax.numpy as jnp

    import adelie_tpu as ad

    io = nsd.NorthStarIO()
    if P_run < nsd.P:
        io.packed = io.packed[:P_run]
        io.impute = io.impute[:P_run]
        io.snps = lambda: int(P_run)
        # keep only causal SNPs inside the kept prefix (the dropped ones'
        # contribution to y acts as extra noise)
        io.causal = io.causal[io.causal < P_run]
    run_gb = P_run * nb / 1e9

    Xm = ad.matrix.snp_unphased(io, dtype=np.float32)
    assert getattr(Xm, "is_streaming", False), "expected the streamed matrix"

    # achieved H2D stream bandwidth: first call = compile + sweep; second
    # call = clean sweep over the packed bytes
    w = jnp.full((nsd.N,), 1.0 / nsd.N, jnp.float32)
    U = (jnp.asarray(io.y) * w)[None, :]
    t0 = time.perf_counter()
    _force(Xm.mul_many(U))
    sweep_cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _force(Xm.mul_many(U))
    sweep_s = time.perf_counter() - t0

    glm = ad.glm.gaussian(io.y, dtype=np.float32)
    kw = dict(lmda_path_size=50, min_ratio=5e-2, progress_bar=False)
    t0 = time.perf_counter()
    st = ad.grpnet(Xm, glm, **kw)
    cold = time.perf_counter() - t0
    assert st.error == "", st.error
    devs = np.asarray(st.devs)
    # At transport-adapted P_run < P only ~P_run/P of the causal SNPs
    # fall inside the kept prefix, so explainable deviance shrinks
    # proportionally — gate on the EXPLAINABLE fraction, not a fixed 0.1
    # (a P=131k run keeps ~8 of 60 causals and legitimately tops out
    # near dev ~0.06; the r5 full-budget run died on the fixed gate).
    dev_floor = 0.1 * max(len(io.causal), 1) / 60.0
    assert np.isfinite(devs).all() and devs[-1] > min(0.1, dev_floor)
    updates = int(np.sum(st.benchmark.get("cd_updates", [])))
    # signal recovery sanity: final active set hits true causal SNPs
    nz = set(np.asarray(st.betas[-1].tocoo().col).tolist())
    hits = len(nz & set(io.causal.tolist()))
    out = {
        "n": nsd.N, "p": int(P_run), "packed_gb": round(run_gb, 1),
        "transport": probe,
        "stream_sweep_s": round(sweep_s, 2),
        "stream_sweep_cold_s": round(sweep_cold_s, 2),
        "h2d_stream_gbps": round(run_gb / sweep_s, 3),
        "lambdas": len(st.lmdas),
        "max_screen": int(max(st.screen_sizes)),
        "nnz_final": int(st.betas[-1].nnz),
        "causal_hits": [hits, len(io.causal)],
        "dev_final": round(float(devs[-1]), 3),
        "cold_s": round(cold, 1),
        "iters_per_s": round(updates / cold, 1),
        # achieved vs estimated full passes over the packed bytes (the 2
        # timed sweeps above + fit); feeds back into est_passes
        "stream_passes": {"achieved": int(Xm.sweeps),
                          "estimated": round(est_passes, 1)},
    }
    if P_run < nsd.P:
        # H2D-dominated: the streamed phases scale linearly in P
        out["scaled_down_for_transport"] = True
        out["est_full_cold_s"] = round(cold * nsd.P / P_run, 1)
    if degraded:
        out["transport_degraded"] = True
    # warm fit only if it still fits the budget.  r4's capture had
    # warm > cold (transport noise), which invalidated the linear-in-P
    # extrapolation — so the block now asserts coherence itself: when
    # warm comes out slower than cold AND budget allows, retry once and
    # keep the min; either way `warm_coherent` states the verdict and
    # the extrapolation uses the fastest full fit observed.
    remaining = budget_s - (time.perf_counter() - t_block)
    if remaining > 1.2 * cold:
        t0 = time.perf_counter()
        st = ad.grpnet(Xm, glm, **kw)
        warm = time.perf_counter() - t0
        assert st.error == "", st.error
        remaining = budget_s - (time.perf_counter() - t_block)
        if warm > cold and remaining > 1.2 * warm:
            t0 = time.perf_counter()
            st = ad.grpnet(Xm, glm, **kw)
            warm2 = time.perf_counter() - t0
            assert st.error == "", st.error
            out["warm_retry_s"] = round(warm2, 1)
            warm = min(warm, warm2)
        out["warm_s"] = round(warm, 1)
        out["warm_coherent"] = bool(warm < cold)
        if P_run < nsd.P:
            out["est_full_warm_s"] = round(warm * nsd.P / P_run, 1)
    return out


def _eur_bench():
    """The BASELINE.md headline config: SNP group lasso on the
    EUR_subset(-shaped) PLINK bed (benchmark/bench_baseline.py config 4;
    the reference ships the true bytes as git-LFS stubs, so this is the
    exact-shape LD-structured surrogate)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmark"))
    from bench_baseline import config4_eur_snp_group_lasso

    res, _ = config4_eur_snp_group_lasso()
    return res


def _gwas_setup():
    """Deterministic GWAS problem shared by _gwas_bench and the
    fresh-process probe: (matrix, glm, grpnet kwargs)."""
    import adelie_tpu as ad
    from adelie_tpu.matrix._snp import unpack_2bit_np

    n, p = 50_000, 200_000
    nb = (n + 3) // 4
    rng = np.random.default_rng(7)
    # ~86% zeros, 10% ones, 4% twos per byte-lane (no NA for speed of
    # synthesis); realistic allele-frequency-ish mix.  Bytes are sampled
    # via quantile-mapping a uniform byte stream through a 256-entry LUT
    # of the 4-lane product distribution (2.5 GB synthesized in seconds).
    probs = np.array([0.86, 0.10, 0.04])
    codes = np.arange(256)
    lane_codes = np.stack([(codes >> (2 * k)) & 3 for k in range(4)], axis=1)
    valid = np.all(lane_codes <= 2, axis=1)
    byte_p = np.where(valid, np.prod(probs[np.minimum(lane_codes, 2)], axis=1), 0.0)
    byte_p /= byte_p.sum()
    cdf = np.cumsum(byte_p)
    lut = np.searchsorted(cdf, (np.arange(256) + 0.5) / 256).astype(np.uint8)
    packed = lut[rng.integers(0, 256, size=(p, nb), dtype=np.uint64).astype(np.uint8)]

    class IO:
        impute = np.zeros(p)

        def _ensure(self):
            pass

        def rows(self):
            return n

        def snps(self):
            return p

    IO.packed = packed
    io = IO()

    # sparse true signal from decoded columns
    k = 40
    sig = rng.choice(p, k, replace=False)
    cols = unpack_2bit_np(packed[sig], n).astype(np.float32)
    beta = rng.standard_normal(k).astype(np.float32)
    y = cols.T @ beta + 0.5 * rng.standard_normal(n).astype(np.float32)

    Xm = ad.matrix.snp_unphased(io, dtype=np.float32)
    glm = ad.glm.gaussian(y, dtype=np.float32)
    kw = dict(lmda_path_size=50, min_ratio=5e-2, progress_bar=False)
    return Xm, glm, kw, n, p, nb


def _gwas_first_fit_probe():
    """Fresh-process first-fit wall time on the GWAS workload with a WARM
    persistent compile cache (the deployment cold-start story: prewarm or
    a prior process compiled the same signature).  Run via _run_isolated
    AFTER _gwas_bench has populated the cache.  Reports the breakdown —
    backend init, host data synthesis + 2.5 GB H2D upload, fit — so a
    large number is attributable (transport vs compile-cache misses)."""
    import adelie_tpu as ad

    t0 = time.perf_counter()
    import jax

    jax.device_get(jax.device_put(np.zeros(2, np.float32)))
    init_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    Xm, glm, kw, *_ = _gwas_setup()
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    st = ad.grpnet(Xm, glm, **kw)
    first = time.perf_counter() - t0
    assert st.error == "", st.error
    return {"first_fit_s": round(first, 2),
            "backend_init_s": round(init_s, 2),
            "setup_synth_upload_s": round(setup_s, 2),
            "total_s": round(init_s + setup_s + first, 2)}


def _gwas_bench():
    """Single-chip max-scale GWAS workload: group lasso path over a
    p=200k-SNP x n=50k-sample 2-bit packed matrix (2.5 GB packed = the
    equivalent of a 40 GB f32 dense matrix) with BASIL screening +
    the fused Pallas decode-matmul.  The BASELINE.json north star
    (1M x 100k) runs streamed (_north_star_bench); this is the largest
    in-HBM single-chip point on that scaling line."""
    Xm, glm, kw, n, p, nb = _gwas_setup()
    import adelie_tpu as ad

    t0 = time.perf_counter()
    st = ad.grpnet(Xm, glm, **kw)
    cold = time.perf_counter() - t0
    assert st.error == "", st.error
    t0 = time.perf_counter()
    st = ad.grpnet(Xm, glm, **kw)
    warm = time.perf_counter() - t0
    assert st.error == "", st.error
    B = st.betas
    devs = np.asarray(st.devs)
    assert np.isfinite(devs).all() and devs[-1] > 0.1
    updates = int(np.sum(st.benchmark.get("cd_updates", [])))
    # deployment cold start: a fresh process against the now-warm
    # persistent cache (compiles were serialized by the fits above);
    # cap adapts to the remaining bench budget.  The probe re-uploads
    # the 2.5 GB packed matrix — on a degraded tunnel that alone can
    # blow any sane cap, so estimate it first and skip EXPLICITLY
    # rather than reporting an attributable-to-nothing timeout (r5;
    # the r5 in-round capture lost the probe to exactly this).
    cap = int(max(120, min(600, _remaining() - 120)))
    stamp = _transport_stamp()
    est_upload_s = (p * nb / 1e9) / max(stamp.get("h2d_gbps", 0.5), 1e-3)
    room = _remaining() - 120       # leave the parent margin to emit
    if est_upload_s + 90 > cap or room < 120:
        probe = {"skipped": (
            f"transport {stamp.get('h2d_gbps', '?')} GB/s: est "
            f"{est_upload_s:.0f}s matrix upload + ~90s init/fit vs "
            f"{cap}s cap / {room:.0f}s budget room"),
            "transport_stamp": stamp}
    else:
        probe = _run_isolated("_gwas_first_fit_probe",
                              timeout_s=int(min(cap, room)))
    out = {
        "n": n, "p": p, "packed_gb": round(p * nb / 1e9, 2),
        "lambdas": len(st.lmdas),
        "max_screen": int(max(st.screen_sizes)),
        "nnz_final": int(B[-1].nnz),
        "dev_final": round(float(devs[-1]), 3),
        "cold_s": round(cold, 2), "warm_s": round(warm, 2),
        "iters_per_s": round(updates / warm, 1),
    }
    if "first_fit_s" in probe:
        out["fresh_process_first_fit_s"] = probe["first_fit_s"]
        out["fresh_process_breakdown"] = probe
    elif "skipped" in probe:
        out["fresh_process_first_fit_skipped"] = probe
    else:
        out["fresh_process_first_fit_error"] = probe.get("error", str(probe))
    return out


def _selftest_bench():
    """No-device block used to exercise the _run_isolated harness."""
    return {"ok": True}


def _run_isolated(block_fn, timeout_s, fallback_inproc=False, env=None):
    """Run one bench block in a fresh subprocess with a hard timeout.

    The block's JSON result is read from a marker line on its stdout; on
    timeout the child is killed and a structured error is returned, so a
    hung device transfer inside one block cannot take down the whole
    bench run.  The child shares the persistent compile cache.

    ``fallback_inproc``: if the child ERRORS (e.g. a single-client TPU
    runtime refuses a second attach while this process holds the chip),
    run the block in THIS process instead — losing the timeout shield
    but keeping the numbers.  Timeouts never fall back (the same hang
    would recur in-process).
    """
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    code = (
        "import json, sys\n"
        f"sys.path.insert(0, {here!r})\n"
        f"from bench import {block_fn}\n"
        f"res = {block_fn}()\n"
        "print('@@BENCH@@' + json.dumps(res), flush=True)\n"
    )
    child_env = None
    if env:
        child_env = dict(os.environ)
        child_env.update(env)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], cwd=here, timeout=timeout_s,
            capture_output=True, text=True, env=child_env,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"{block_fn} timed out after {timeout_s}s"}
    for line in proc.stdout.splitlines():
        if line.startswith("@@BENCH@@"):
            return json.loads(line[len("@@BENCH@@"):])
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
    err = (f"{block_fn} rc={proc.returncode}: " + " | ".join(tail)[:300])
    if fallback_inproc:
        try:
            res = globals()[block_fn]()
            if isinstance(res, dict):
                res["isolation"] = "inproc-fallback"
            return res
        except Exception as exc:  # pragma: no cover - last resort
            return {"error": err, "inproc_error": str(exc)[:200]}
    return {"error": err}


def _headline_block():
    """The headline metric: dense gaussian lasso path vs sklearn's Cython
    CD, objective-dominance-checked.  Returns the TOP-LEVEL keys."""
    import adelie_tpu as ad
    from sklearn.linear_model import lasso_path

    n, p, n_lmdas = 40000, 2000, 100
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, p)).astype(np.float32)
    beta = np.zeros(p)
    nz = rng.choice(p, 60, replace=False)
    beta[nz] = rng.standard_normal(60)
    y = (X @ beta + 0.5 * rng.standard_normal(n)).astype(np.float32)
    # center so intercept-free fits agree on both sides
    X -= X.mean(axis=0)
    y -= y.mean()

    glm = ad.glm.gaussian(y)
    # wrap once: host->device upload of X is a one-time data-loading cost,
    # not a per-fit cost (and X stays resident for warm starts/CV)
    Xm = ad.matrix.dense(X)
    kw = dict(lmda_path_size=n_lmdas, min_ratio=1e-2, intercept=False,
              progress_bar=False, early_exit=False)

    # warm-up (compile): identical shapes so the timed runs are steady-state
    ad.grpnet(Xm, glm, **kw)

    # best of 3 (the tunneled-TPU RTT adds run-to-run noise)
    ours = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        state = ad.grpnet(Xm, glm, **kw)
        ours = min(ours, time.perf_counter() - t0)
    assert state.error == "", state.error
    lmdas = np.asarray(state.lmdas)
    n_sols = len(lmdas)

    # BCD iterations/s per chip (BASELINE.json metric): block-coordinate
    # updates = CD sweeps x screened groups, from the timed fit
    cd_sweeps = int(np.sum(state.benchmark.get("cd_iters", [])))
    bcd_updates = int(np.sum(state.benchmark.get("cd_updates", [])))

    # sklearn lasso_path on the same resolved path (alphas == our lambdas)
    t0 = time.perf_counter()
    alphas_out, coefs, _ = lasso_path(
        np.asarray(X, np.float64), np.asarray(y, np.float64),
        alphas=lmdas, tol=1e-7, max_iter=100000,
    )
    base_time = time.perf_counter() - t0
    # sklearn returns alphas descending; ours are too — orders align
    assert np.allclose(alphas_out, lmdas)

    # correctness gate: objective dominance per lambda (f32 slack)
    B = np.asarray(state.betas.todense())
    Xd = np.asarray(X, np.float64)
    yd = np.asarray(y, np.float64)
    worst = 0.0
    for i, lm in enumerate(lmdas):
        ours_obj = _objective(Xd, yd, B[i].astype(np.float64), lm)
        sk_obj = _objective(Xd, yd, coefs[:, i], lm)
        rel = (ours_obj - sk_obj) / max(abs(sk_obj), 1e-10)
        worst = max(worst, rel)
    # loose gate: catch real solver breakage without tripping on f32 noise
    assert worst < 1e-3, f"objective dominance violated: rel gap {worst:.2e}"

    return {
        "metric": (
            f"gaussian lasso full-path fit n={n} p={p} ({n_sols} lambdas), "
            f"objective-dominance-checked vs sklearn lasso_path "
            f"(worst rel gap {worst:.1e})"
        ),
        "value": round(ours, 4),
        "unit": "s",
        "vs_baseline": round(base_time / ours, 3),
        "iters_per_s": round(bcd_updates / ours, 1),
        "cd_sweeps_per_s": round(cd_sweeps / ours, 1),
        "bcd_updates": bcd_updates,
    }


def _constrained_block():
    """Constrained logistic path (fused chunked IRLS + proximal-Newton
    constraints) with the same-shape unconstrained yardstick.  Returns
    TOP-LEVEL keys (names kept stable across rounds)."""
    import adelie_tpu as ad
    import adelie_tpu.constraint as ct

    rng = np.random.default_rng(3)
    nc, pc, qc = 1024, 60, 3
    Xc = rng.standard_normal((nc, pc)).astype(np.float32)
    yc = (Xc[:, :6] @ rng.standard_normal(6) > 0).astype(np.float32)
    groupsc = np.arange(0, pc, qc)

    def cons_fit():
        return ad.grpnet(
            Xc, ad.glm.binomial(yc, dtype=np.float32), groups=groupsc,
            constraints=[ct.box(np.full(qc, -0.2), np.full(qc, 0.2))
                         for _ in groupsc],
            lmda_path_size=20, min_ratio=0.05, progress_bar=False,
        )

    stc = cons_fit()   # warm-up/compile
    t0 = time.perf_counter()
    stc = cons_fit()
    cons_time = time.perf_counter() - t0
    assert stc.error == "", stc.error
    Bc = np.asarray(stc.betas.todense())
    assert np.all(np.abs(Bc) <= 0.2 + 1e-3)

    # yardstick: the same-shape UNCONSTRAINED logistic path, so the
    # proximal-Newton constraint overhead is visible (VERDICT r2 weak #7:
    # the constrained number existed in isolation)
    def uncons_fit():
        return ad.grpnet(
            Xc, ad.glm.binomial(yc, dtype=np.float32), groups=groupsc,
            lmda_path_size=20, min_ratio=0.05, progress_bar=False,
        )

    uncons_fit()
    t0 = time.perf_counter()
    uncons_fit()
    uncons_time = time.perf_counter() - t0

    return {
        "constrained_logistic_s": round(cons_time, 3),
        "unconstrained_logistic_same_shape_s": round(uncons_time, 3),
        "constraint_overhead_x": round(cons_time / max(uncons_time, 1e-9), 1),
    }


def _merge_block(fn, est_s):
    """Like _block but the result merges into RESULT's top level."""
    rem = _remaining()
    key = fn.__name__.strip("_")
    if rem < est_s:
        RESULT[key + "_skipped"] = (
            f"budget: {rem:.0f}s remaining < ~{est_s}s estimate")
    else:
        try:
            RESULT.update(fn())
        except Exception as exc:
            RESULT[key + "_error"] = str(exc)[:300]
    _emit()


def main():
    # backend-init latency through the tunnel is long-tailed (10 s on a
    # good day, several minutes degraded): one slow probe must not cost
    # the round its TPU numbers, so retry once with a longer deadline
    # before surrendering to CPU.
    dev = _probe_backend()
    if dev is None and _remaining() > 600:
        dev = _probe_backend(timeout_s=360)
    if dev is None:
        # the accelerator backend cannot even initialize (axon tunnel
        # outage mode): fall back to CPU so a parseable line still comes
        # out, and record why the numbers are not TPU numbers
        os.environ["JAX_PLATFORMS"] = "cpu"
        RESULT["device_note"] = (
            "accelerator backend init failed/hung within probe deadlines; "
            "CPU fallback")
    import jax

    RESULT["metric"] = "incomplete: killed before the headline block"
    RESULT["value"] = None
    RESULT["unit"] = "s"
    RESULT["device"] = str(jax.devices()[0].device_kind)
    if dev is None and "TPU" in RESULT["device"]:
        # the probe gave up but the in-process init still attached the
        # accelerator (observed r4): numbers below ARE TPU numbers
        RESULT["device_note"] = (
            "probe subprocess timed out but in-process backend init "
            "succeeded; TPU numbers")
        os.environ.pop("JAX_PLATFORMS", None)
    _emit()   # first parseable line before any heavy work

    _merge_block(_headline_block, est_s=240)

    # BLOCK ORDER (r5, VERDICT r4 #1): the two BASELINE-critical blocks
    # (EUR, north star) run FIRST after the headline.  Rounds 2-4 all
    # ended with them starved because earlier blocks overran static
    # estimates; ordering — not estimation — is the only robust fix.
    # Each runs in a SUBPROCESS with a hard timeout so a mid-stream
    # tunnel hang cannot swallow the lines already emitted.
    if jax.default_backend() != "tpu":
        for k in ("eur_subset", "north_star_1m_x_100k_streamed",
                  "gwas_snp_path"):
            RESULT[k] = {"skipped": "no TPU backend"}
        _emit()
    else:
        def eur():
            # leave >= ~1100 s for north star + gwas + small blocks
            cap = int(max(120, min(900, _remaining() - 1100)))
            return _run_isolated("_eur_bench", timeout_s=cap,
                                 fallback_inproc=True)

        _block("eur_subset", eur, est_s=180)

        def north():
            # leave ~500 s for gwas + the small kernel blocks
            cap = int(max(240, _remaining() - 500))
            env = {"ADELIE_TPU_NORTH_STAR_BUDGET_S": str(max(60, cap - 30))}
            return _run_isolated("_north_star_bench", timeout_s=cap,
                                 fallback_inproc=True, env=env)

        _block("north_star_1m_x_100k_streamed", north, est_s=240)

        def gwas():
            cap = int(max(120, min(700, _remaining() - 150)))
            # the child derives its nested fresh-process probe cap from
            # ITS OWN _remaining(); align its budget with the hard cap
            env = {"ADELIE_TPU_BENCH_BUDGET_S": str(cap - 15)}
            return _run_isolated("_gwas_bench", timeout_s=cap,
                                 fallback_inproc=True, env=env)

        _block("gwas_snp_path", gwas, est_s=240)

    _block("kernels", _kernel_rooflines, est_s=150)
    _merge_block(_constrained_block, est_s=150)
    _block("sparse", _sparse_bench, est_s=120)
    _block("grouped_pin", _grouped_pin_bench, est_s=90)


if __name__ == "__main__":
    main()

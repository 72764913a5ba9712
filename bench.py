"""Benchmark: message-update throughput on a 10k-replica LGSSM smoothing sweep.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.md): message updates/sec/chip on a 10k-replica,
T=100 LGSSM Belief-Propagation smoothing sweep.  One sweep computes, per
replica, (T-1) forward messages + (T-1) backward messages + T marginals =
3T-2 signal updates — the same accounting as the reference's dynamic engine
executions for one `update_marginals!` pass over the chain.

Methodology (v2 — honest device time on the remote-tunnel TPU): per-call
``block_until_ready`` on this tunnel acks enqueue in ~80us regardless of the
work submitted, and a value fetch costs a ~24ms RPC — both useless as op
timers.  So each path is timed as K smoothing sweeps serialized inside ONE
jitted ``fori_loop`` (each iteration's input is perturbed by the previous
iteration's reduced output, forcing serial execution and defeating the
remote execution cache), fetching one scalar at the end; device time per
sweep = total/K with the RPC constant amortized to <1%.  Inputs are salted
with wall-clock time so repeated bench runs can never hit a cached result.

Roofline: a matched-traffic probe (read the (R,T) input once, write two
(R,T) outputs — exactly the smoother's HBM footprint) timed identically is
the denominator; ``pct_roofline`` = probe_time / path_time.

Every timing carries ``{median, min, max}`` over >=3 salted repeats
(in-run spreads ~5%; cross-process swings reach 3.6x on the tunnel).

Paths measured:
- ``matmul``      — MXU lowering: the smoother is affine in y
  (ops/chains.py ``lgssm_smooth_matmul``), one (R,T)x(T,T) matmul at
  Precision.HIGHEST.
- ``matmul_bf16`` — the precision policy's bf16-edge config (bf16 inputs +
  operator, f32 accumulation) — the measured best path.
- ``scan``        — two batched ``lax.scan`` passes (ops/chains.py).
- ``pallas``      — fused VMEM-resident kernel (ops/pallas_kernels.py).
- ``generic_*``   — the factor-graph paths through ``CompiledInference``:
  the lowered BP chain (``generic_path``), mean-field VMP vs a
  hand-written Jacobi sweep (``generic_vmp``), and structured VMP with
  warm/steady decomposition (``generic_structured``).
- ``ladder``      — HMM+Dirichlet VMP, GMM (anchored), MvLGSSM
  (scan/blocked/assoc/matmul/matmul_bf16 with MFU), streaming HGF
  (full-trajectory + trimmed-track + bf16 kernel configs).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the reference *architecture* — a dynamic per-signal reactive
engine (our reference-faithful Python implementation, measured on the same
machine, same model family) — giving the speedup of the compiled TPU dataflow
path over per-edge dynamic message passing.
"""

import json
import sys
import time

import numpy as np

T = 100


def _section(name, fn, *args, retries=1, **kwargs):
    """Run one bench section with wall-time logging and retry-on-flake.

    The remote TPU tunnel can drop mid-run (observed: UNAVAILABLE
    /remote_compile broken pipe) — one section's flake must not zero the
    whole artifact.  Returns ``fn(*args)`` or ``{"error": ...}``."""
    for attempt in range(retries + 1):
        t0 = time.perf_counter()
        try:
            out = fn(*args, **kwargs)
            print(
                f"[bench] {name}: {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
                flush=True,
            )
            return out
        except Exception as e:  # pragma: no cover - infra-dependent
            print(
                f"[bench] {name} attempt {attempt + 1} failed after "
                f"{time.perf_counter() - t0:.1f}s: {type(e).__name__}: {e}",
                file=sys.stderr,
                flush=True,
            )
            err = f"{type(e).__name__}: {e}"
    return {"error": err}


def _serial_sweep_stats(fn, y0, K, aux=(), repeats=3):
    """Per-sweep device time statistics: ``repeats`` timed calls of K
    serialized fn(y, *aux)-sweeps each, distinct salt per call (defeats the
    remote execution cache).  Returns ``(median_seconds, stats_dict)`` —
    the tunnel shows 25%+ run-to-run swings (scan 319 vs 400 us across the
    two committed r03 runs), so single measurements must not silently
    decide ``best_method`` (VERDICT r3 item 3).

    ``y0`` (and any large operands in ``aux``) are passed as jit ARGUMENTS,
    not closed over: a closure constant is inlined into the HLO payload
    shipped through the tunnel's remote_compile endpoint — at probe sizes
    (1 GB data, 128 MB weights, 164 MB smoother operators) that stalls
    compilation for minutes and can kill the transport (observed
    broken-pipe)."""
    import jax
    from jax import lax

    @jax.jit
    def g(s, y, aux_args):
        def body(i, acc):
            out = fn(y + (s + acc * 1e-30), *aux_args)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(x.sum() for x in leaves) * 1e-30

        return lax.fori_loop(0, K, body, jax.numpy.float32(0.0))

    salt = float(time.time_ns() % 100_000) / 1000.0
    float(g(salt, y0, tuple(aux)))  # compile + warm
    times = []
    for k in range(repeats):
        t0 = time.perf_counter()
        float(g(salt + 0.5 + 0.25 * k, y0, tuple(aux)))
        times.append((time.perf_counter() - t0) / K)
    times.sort()
    mid = len(times) // 2
    med = times[mid] if len(times) % 2 else 0.5 * (times[mid - 1] + times[mid])
    stats = {
        "median_us": round(med * 1e6, 1),
        "min_us": round(times[0] * 1e6, 1),
        "max_us": round(times[-1] * 1e6, 1),
        "repeats": repeats,
    }
    return med, stats


def _serial_sweep_time(fn, y0, K, aux=(), repeats=1):
    """Median device seconds per sweep (see :func:`_serial_sweep_stats`)."""
    med, _ = _serial_sweep_stats(fn, y0, K, aux=aux, repeats=repeats)
    return med


def _make_data(R):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(int(time.time_ns()) % (2**31))
    y0 = jnp.cumsum(jax.random.normal(key, (R, T), jnp.float32), -1)
    return jax.block_until_ready(y0)


def bench_paths(R, K):
    """Per-path sweep-time stats at R replicas (+ matched-traffic probe).

    ``matmul_bf16`` is the precision-policy configuration (docs/precision.md:
    bf16 on the MXU edge, f32 accumulation): y and the (T, T) operator cast
    to bf16, accumulated f32 via ``preferred_element_type`` (VERDICT r3
    item 2)."""
    import jax.numpy as jnp

    from cortex_tpu.models import LGSSM
    from cortex_tpu.ops import lgssm_smooth_matmul, lgssm_smoother_operator
    from cortex_tpu.ops.pallas_kernels import lgssm_smooth_pallas

    model = LGSSM(A=1.0, Q=1.0, H=1.0, R=1.0)
    op = lgssm_smoother_operator(T)
    S_bf16 = op[0].astype(jnp.bfloat16)
    c_f32, v_f32 = op[1], op[2]

    def matmul_bf16(y, S, c, v):
        mean = (
            jnp.einsum(
                "rt,tj->rj",
                y.astype(jnp.bfloat16),
                S,
                preferred_element_type=jnp.float32,
            )
            + c
        )
        return mean, jnp.broadcast_to(v, y.shape)

    y0 = _make_data(R)
    # The (T,T) operator rides as a jit argument (see _serial_sweep_stats).
    paths = {
        "matmul": (lambda y, o: lgssm_smooth_matmul(y, operator=o), (op,)),
        "matmul_bf16": (matmul_bf16, (S_bf16, c_f32, v_f32)),
        "scan": (lambda y: model.smooth(y, method="scan"), ()),
        "pallas": (lambda y: lgssm_smooth_pallas(y, tile=2048), ()),
        "probe": (lambda y: (y * 1.000001, y + 0.5), ()),
    }
    return {
        name: _serial_sweep_stats(fn, y0, K, aux=aux)[1]
        for name, (fn, aux) in paths.items()
    }


def bench_generic_compiled(R, K):
    """The factor-graph path: CompiledInference over the T=100 chain graph
    (chain lowering rerolls the schedule into one lax.scan), replica-batched.

    Uses the executor's packed I/O end to end: one ``source_pack`` feeds all
    T observation sources (rows permuted into ``schedule.sources`` order by
    key — NOT construction order), and ``packed=True`` marginals are consumed
    as one family via ``smart_stack`` (a single concat+gather across the
    interior/endpoint rule-group packs)."""
    import jax.numpy as jnp

    from cortex_tpu.compile import CompiledInference, smart_stack
    from cortex_tpu.models import LGSSMChainBatched, make_chain_graph

    engine, x, y, likelihood = make_chain_graph(T)
    compiled = CompiledInference(engine, x, LGSSMChainBatched())
    vid_to_obs = {yv: i for i, yv in enumerate(y)}
    perm_list = [vid_to_obs[k[1]] for k in compiled.source_keys()]
    # Sources are variant-sorted (schedule._variant_order_key), so for the
    # chain the permutation is the identity and the pack feeds straight in.
    identity = perm_list == list(range(T))
    perm = jnp.asarray(perm_list)
    y0 = _make_data(R)

    def fn(data):
        # data: (R, T) -> source pack (T, R), row i = sources[i]'s value.
        pack = data.T if identity else data.T[perm]
        marginals, _ = compiled.run({}, source_pack=pack, packed=True)
        fam = smart_stack([marginals[xi] for xi in x])  # (T, R) Gaussian
        return fam.mean, fam.variance

    lowered = bool(compiled.plan is not None and compiled.plan.scan_segments)
    dt = _serial_sweep_time(fn, y0, K, repeats=3)
    # Back-to-back scan reference in the SAME section: the tunnel's
    # run-to-run variance (observed 2x on the matmul path) would otherwise
    # pollute the executor-overhead ratio computed against a scan number
    # measured minutes earlier.
    from cortex_tpu.models import LGSSM

    model = LGSSM(A=1.0, Q=1.0, H=1.0, R=1.0)

    def scan_fn(d):
        m = model.smooth(d, method="scan")
        return m.mean, m.variance

    dt_scan = _serial_sweep_time(scan_fn, y0, K, repeats=3)
    return dt, lowered, dt_scan


def bench_generic_vmp(R, K, n=100, iters=4):
    """The compiled MEAN-FIELD VMP path vs a hand-written jnp Jacobi sweep
    of the same updates (VERDICT r3 item 5).

    Model: the reference's mean-field gold SSM (unknown process/observation
    precisions, ``test/inference_engine_tests.jl:593-805``) as a factor
    graph (``models/vmp_graph.py``), replica-batched to R by feeding (R,)
    values through the frozen y-marginal initials.  The hand-written sweep
    reproduces the compiled dataflow semantics exactly (all messages from
    the previous sweep's marginals, then all marginals — synchronous
    Jacobi), so the two fixed points agree to float tolerance; the ratio of
    their per-iteration device times is pure compiled-path overhead."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cortex_tpu.compile import CompiledInference, dep_role_key
    from cortex_tpu.models import MeanFieldSSMBatched, make_mean_field_ssm_graph

    engine, x, y, ssnoise, obsnoise = make_mean_field_ssm_graph(n, [0.0] * n)
    compiled = CompiledInference(
        engine,
        [ssnoise, obsnoise] + x,
        MeanFieldSSMBatched(),
        refine_key=dep_role_key,
    )
    base_state = compiled.initial_state()
    y_pos = {id(engine.get_variable_marginal(v)): i for i, v in enumerate(y)}

    def compiled_fn(data):  # data: (R, n)
        state = []
        for s, v in zip(compiled.schedule.initials, base_state):
            if id(s) in y_pos:
                state.append(data[:, y_pos[id(s)]])
            else:
                state.append(
                    jax.tree_util.tree_map(
                        lambda a: jnp.broadcast_to(
                            jnp.asarray(a), (R,) + jnp.shape(a)
                        ),
                        v,
                    )
                )
        marg, _ = compiled.iterate({}, iters, state)
        return marg[ssnoise].mean, marg[obsnoise].mean, marg[x[0]].mean

    def handwritten_fn(data):
        def sweep(carry, _):
            qm, qv, qss_mean, qobs_mean = carry
            lik_prec = qobs_mean[:, None]
            trans = qss_mean[:, None]
            has_l = jnp.pad(jnp.ones_like(qm[:, 1:]), ((0, 0), (1, 0)))
            has_r = jnp.pad(jnp.ones_like(qm[:, :-1]), ((0, 0), (0, 1)))
            prec = lik_prec + trans * (has_l + has_r)
            wmean = (
                lik_prec * data
                + trans * jnp.pad(qm[:, :-1], ((0, 0), (1, 0)))
                + trans * jnp.pad(qm[:, 1:], ((0, 0), (0, 1)))
            )
            qm_new = wmean / prec
            qv_new = 1.0 / prec
            rate_obs = 0.5 * (qv + (data - qm) ** 2)
            qobs_new = (1.5 * n - (n - 1.0)) / jnp.sum(rate_obs, axis=1)
            rate_ss = 0.5 * (
                qv[:, :-1] + qv[:, 1:] + (qm[:, :-1] - qm[:, 1:]) ** 2
            )
            qss_new = (1.5 * (n - 1.0) - (n - 2.0)) / jnp.sum(rate_ss, axis=1)
            return (qm_new, qv_new, qss_new, qobs_new), None

        init = (
            jnp.zeros_like(data),
            jnp.ones_like(data),
            jnp.ones(data.shape[0], data.dtype),
            jnp.ones(data.shape[0], data.dtype),
        )
        (qm, qv, qss, qobs), _ = lax.scan(sweep, init, None, length=iters)
        return qss, qobs, qm[:, 0]

    y0 = _make_data(R)[:, :n] * 0.1
    # Fixed-point agreement (same data, no salt): proves the handwritten
    # loop IS the same algorithm before its time is used as a denominator.
    a = jax.jit(compiled_fn)(y0)
    b = jax.jit(handwritten_fn)(y0)
    agree = max(
        float(jnp.max(jnp.abs(ai - bi) / (jnp.abs(bi) + 1e-6)))
        for ai, bi in zip(a, b)
    )
    # Interleaved A/B/A/B measurement: the tunnel drifts between sections
    # (observed ratios 0.58-1.36 for the SAME binaries when the two paths
    # were timed sequentially), so each path is measured twice in
    # alternation and compared at its min — the least-drift estimator.
    dt_c1, stats_c = _serial_sweep_stats(compiled_fn, y0, K)
    dt_h1, stats_h = _serial_sweep_stats(handwritten_fn, y0, K)
    dt_c2, stats_c2 = _serial_sweep_stats(compiled_fn, y0, K)
    dt_h2, stats_h2 = _serial_sweep_stats(handwritten_fn, y0, K)
    dt_c = min(dt_c1, dt_c2)
    dt_h = min(dt_h1, dt_h2)
    return {
        "replicas": R, "n": n, "iters_per_call": iters,
        "per_iter_us_compiled": round(dt_c / iters * 1e6, 1),
        "per_iter_us_handwritten": round(dt_h / iters * 1e6, 1),
        "call_stats_us": {
            "compiled": [stats_c, stats_c2],
            "handwritten": [stats_h, stats_h2],
        },
        "ratio_vs_handwritten": round(dt_c / dt_h, 2),
        "agreement_max_rel": round(agree, 6),
    }


def bench_generic_structured(R, K, n=100, iters=4):
    """On-chip per-iteration cost of the compiled STRUCTURED VMP path —
    the third model family through the generic compiler (pairwise 2×2
    joint marginals over transition clusters,
    ``models/structured_graph.py``; reference gold model
    ``test/inference_engine_tests.jl:807-1147``).

    One ``iterate(steady_state=True)`` call = 1 dataflow-ordered
    WARM-START sweep (207 phases for this graph — its ProductOfMessages
    chains serialize the dataflow order) + (iters-1) Jacobi steady-state
    sweeps (ONE phase of 13 batched groups).  Long VMP runs amortize the
    warm start, so the number that matters is the steady-state
    per-iteration cost; both are reported, decomposed from two call
    lengths via t(i) = warm + (i-1)·steady."""
    import jax
    import jax.numpy as jnp

    from cortex_tpu.compile import CompiledInference, dep_role_key
    from cortex_tpu.models import (
        StructuredSSMBatched,
        make_structured_ssm_graph,
    )

    engine, x, y, ssnoise, obsnoise = make_structured_ssm_graph(n, [0.0] * n)
    compiled = CompiledInference(
        engine,
        [ssnoise, obsnoise] + x,
        StructuredSSMBatched(),
        refine_key=dep_role_key,
    )
    base_state = compiled.initial_state()
    y_pos = {id(engine.get_variable_marginal(v)): i for i, v in enumerate(y)}

    def fn(data, n_it):
        state = []
        for s, v in zip(compiled.schedule.initials, base_state):
            if id(s) in y_pos:
                state.append(data[:, y_pos[id(s)]])
            else:
                state.append(
                    jax.tree_util.tree_map(
                        lambda a: jnp.broadcast_to(
                            jnp.asarray(a), (R,) + jnp.shape(a)
                        ),
                        v,
                    )
                )
        marg, _ = compiled.iterate({}, n_it, state, steady_state=True)
        return marg[ssnoise].mean, marg[obsnoise].mean, marg[x[0]].mean

    y0 = _make_data(R)[:, :n] * 0.1
    iters2 = iters + 8
    fn_long = lambda data: fn(data, iters2)
    fn_short = lambda data: fn(data, iters)
    dt_s, stats_s = _serial_sweep_stats(fn_short, y0, K)
    dt_l, stats_l = _serial_sweep_stats(fn_long, y0, max(4, K // 2))
    steady = max(1e-9, (dt_l - dt_s) / (iters2 - iters))
    warm = max(0.0, dt_s - (iters - 1) * steady)
    return {
        "replicas": R, "n": n,
        "warm_start_sweep_us": round(warm * 1e6, 1),
        "steady_iter_us": round(steady * 1e6, 1),
        "call_stats_us": {
            f"iters{iters}": stats_s,
            f"iters{iters2}": stats_l,
        },
        # Each steady iteration computes (n-1) joint 2x2 marginals + n
        # individual marginals + 2 precision posteriors per replica.
        "joint_updates_per_s": round(R * (n - 1) / steady, 1),
        "note": "warm start = the dataflow-ordered first sweep (207 "
        "serialized phases); steady = the one-phase Jacobi sweep that "
        "all subsequent iterations run",
    }


def bench_dynamic_engine(T=100, sweeps=3):
    """Reference-architecture baseline: dynamic reactive engine on one chain."""
    from cortex_tpu.models import LGSSMChainDynamic, make_chain_graph

    times = []
    for _ in range(sweeps):
        engine, x, y, likelihood = make_chain_graph(
            T, processor=LGSSMChainDynamic()
        )
        rng = np.random.default_rng(1)
        data = rng.normal(size=T).cumsum()
        for i in range(T):
            engine.get_message_to_factor(y[i], likelihood[i]).set_value(
                float(data[i])
            )
        t0 = time.perf_counter()
        engine.update_marginals(x)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    updates_per_sweep = 3 * T - 2
    return updates_per_sweep / dt


# Public spec-sheet peaks (cloud.google.com/tpu/docs/system-architecture):
# the absolute denominators for %HBM-peak and MFU (VERDICT r2 item 5).
KNOWN_PEAKS = {
    "TPU v5 lite": {"hbm_GBps": 819.0, "bf16_tflops": 197.0},
    "TPU v4": {"hbm_GBps": 1228.0, "bf16_tflops": 275.0},
    "TPU v5p": {"hbm_GBps": 2765.0, "bf16_tflops": 459.0},
    "TPU v6 lite": {"hbm_GBps": 1640.0, "bf16_tflops": 918.0},
}


def bench_hw_peaks():
    """Anchor the roofline to hardware: the chip's spec peaks plus measured
    saturating probes (1 GB streaming copy; 8192^3 bf16 matmul)."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    spec = KNOWN_PEAKS.get(kind, {})

    # HBM: 1 GB f32 stream, read+write = 2 GB traffic per call.
    n = 1 << 28
    x = jax.block_until_ready(
        jnp.broadcast_to(jnp.arange(1 << 14, dtype=jnp.float32), (1 << 14, 1 << 14))
        .reshape(-1)[:n]
        .copy()
    )
    dt = _serial_sweep_time(lambda v: v * 1.000001, x, 20)
    hbm_probe_GBps = 2 * n * 4 / dt / 1e9
    del x

    # MXU: (8192, 8192) bf16 matmul — 2*8192^3 = 1.1e12 FLOP per call.
    m = 8192
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (m, m), jnp.bfloat16)
    a = jax.block_until_ready(jax.random.normal(key, (m, m), jnp.float32))
    dt = _serial_sweep_time(
        lambda v, ww: v.astype(jnp.bfloat16) @ ww, a, 20, aux=(w,)
    )
    mxu_probe_tflops = 2 * m**3 / dt / 1e12
    del a, w
    return {
        "device_kind": kind,
        "spec_hbm_GBps": spec.get("hbm_GBps"),
        "spec_bf16_tflops": spec.get("bf16_tflops"),
        "measured_hbm_probe_GBps": round(hbm_probe_GBps, 1),
        "measured_mxu_probe_bf16_tflops": round(mxu_probe_tflops, 1),
    }


def _flops_of(fn, *args):
    """XLA's own FLOP count for one call (exact MFU numerator)."""
    import jax

    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else (c or {})
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def _ladder_hmm(K, method="scan"):
    """HMM forward-backward + Dirichlet VMP (pooled, R replicas)."""
    import jax.numpy as jnp

    from cortex_tpu.models import HMM

    R_, T_, Kh, M = 4096, 64, 4, 8
    hmm = HMM(K=Kh, log_pi=jnp.log(jnp.full(Kh, 1.0 / Kh)))
    base = _make_data(R_)[:, :T_]  # float walks; symbols derived inside
    iters = 4

    def fn(data):
        obs = jnp.clip(jnp.abs(data).astype(jnp.int32) % M, 0, M - 1)
        res = hmm.fit_vmp(
            obs, M, n_iterations=iters, pooled=True, method=method
        )
        return res.state.trans_alpha, res.state.emis_alpha, res.elbo

    dt, stats = _serial_sweep_stats(fn, base, K)
    dt /= iters
    stats = {k: round(v / iters, 1) if k != "repeats" else v
             for k, v in stats.items()}
    return {
        "replicas": R_, "T": T_, "K": Kh, "M": M,
        "per_vmp_iter_us": stats,
        # One VMP iteration touches R*T state marginals + R*(T-1) pairwise
        # counts + R*T emission contributions ≈ 3 updates per step.
        "msg_updates_per_s": round(R_ * T_ * 3 / dt, 1),
    }


def _ladder_gmm(K, hbm_peak, mxu_peak):
    """GMM structured VMP (R independent replicas) — anchored: XLA FLOP
    count, achieved TFLOP/s vs bf16 spec peak, a matched-traffic probe, and
    the binding resource named from the two ratios (VERDICT r3 item 7)."""
    import jax
    import jax.numpy as jnp

    from cortex_tpu.models import GMM

    Rg, N, D, Kg = 256, 256, 2, 4
    key = jax.random.PRNGKey(1)
    xg = jax.block_until_ready(
        jax.random.normal(key, (Rg, N, D), jnp.float32)
        + 3.0 * jax.random.randint(key, (Rg, N, 1), 0, Kg).astype(jnp.float32)
    )
    gmm = GMM(K=Kg)
    giters = 4

    def gmm_fn(data):
        res = gmm.fit(data, n_iterations=giters)
        return res.posterior.m, res.posterior.alpha, res.free_energy

    dt, stats = _serial_sweep_stats(gmm_fn, xg, K)
    dt /= giters
    stats = {k: round(v / giters, 1) if k != "repeats" else v
             for k, v in stats.items()}
    flops = _flops_of(gmm_fn, xg) / giters
    # Matched-traffic probe: per iteration the E-step reads x (R,N,D) and
    # writes responsibilities (R,N,K); the M-step reductions touch (R,K,·)
    # (negligible).  Probe = read x once, write a (R,N,K) output.
    def probe_fn(data):
        return data * 1.000001, jnp.broadcast_to(
            data.sum(-1, keepdims=True), (Rg, N, Kg)
        )

    dt_probe = _serial_sweep_time(probe_fn, xg, max(8, K))
    bytes_iter = (Rg * N * D + Rg * N * Kg) * 4
    achieved_tflops = flops / dt / 1e12
    pct_mxu = 100 * achieved_tflops / mxu_peak
    pct_hbm = 100 * bytes_iter / dt / 1e9 / hbm_peak
    binding = (
        "latency/launch-bound: neither FLOPs nor HBM traffic explains the "
        "iteration time — at (256,256,2,4) both utilizations are <5%; the "
        "time is XLA fusion count x dispatch latency on tiny operands. "
        "pct_matched_probe > 100 means the path BEATS its own naive "
        "traffic model: inside the serialized fori_loop XLA fuses the "
        "E/M steps so responsibilities never round-trip HBM, while the "
        "probe materializes them"
        if max(pct_mxu, pct_hbm) < 5.0
        else ("VPU/MXU compute" if pct_mxu > pct_hbm else "HBM bandwidth")
    )
    return {
        "replicas": Rg, "N": N, "D": D, "K": Kg,
        "per_vmp_iter_us": stats,
        "resp_updates_per_s": round(Rg * N * Kg / dt, 1),
        "xla_flops_per_iter": flops,
        "achieved_tflops": round(achieved_tflops, 3),
        "pct_of_bf16_peak": round(pct_mxu, 2),
        "bytes_per_iter": bytes_iter,
        "pct_hbm_spec_peak": round(pct_hbm, 1),
        "matched_probe_us": round(dt_probe * 1e6, 1),
        "pct_matched_probe": round(100 * dt_probe / dt, 1),
        "binding_resource": binding,
    }


def _ladder_mv(K, mxu_peak):
    """MvLGSSM smoothing: all five lowerings + the bf16-edge matmul.

    ``matmul_bf16`` is the precision policy's configuration (bf16 inputs +
    bf16 operator, f32 accumulation); its MFU against the bf16 spec peak is
    the honest MXU-utilization number (VERDICT r3 item 2).  ``blocked`` is
    the two-level lane-major scan (r4) — the fastest exact-recursion path."""
    import jax
    import jax.numpy as jnp

    from cortex_tpu.models import MvLGSSM

    out = {}
    for d, Rm in ((4, 4096), (16, 1024)):
        m = MvLGSSM.from_arrays(
            A=0.9 * np.eye(d), Q=np.eye(d), H=np.eye(d), R=np.eye(d),
            m0=np.zeros(d), P0=np.eye(d),
        )
        key = jax.random.PRNGKey(d)
        ym = jax.block_until_ready(
            jnp.cumsum(jax.random.normal(key, (Rm, T, d), jnp.float32), 1)
        )
        from cortex_tpu.ops.chains_mv import (
            mv_lgssm_smooth_matmul,
            mv_lgssm_smoother_operator,
        )

        op = mv_lgssm_smoother_operator(
            T, m.A, m.Q, m.H, m.R, (m.m0, m.P0)
        )
        L_bf16 = op.L.astype(jnp.bfloat16)

        def mm_bf16(v, L, c, cov, d=d):
            flat = v.reshape(v.shape[:-2] + (T * d,)).astype(jnp.bfloat16)
            mean = (
                jnp.einsum(
                    "rk,kj->rj", flat, L,
                    preferred_element_type=jnp.float32,
                ).reshape(v.shape[:-2] + (T, d))
                + c
            )
            return mean, jnp.broadcast_to(cov, v.shape[:-2] + cov.shape)

        per_method = {}
        for method, Km in (
            ("scan", K),
            ("blocked", K),
            ("assoc", max(4, K // 8)),
        ):
            fn = lambda v, meth=method: m.smooth(v, method=meth)
            med, stats = _serial_sweep_stats(fn, ym, Km)
            per_method[method] = (med, stats, fn, ())
        mm_fn = lambda v, o: mv_lgssm_smooth_matmul(v, operator=o)
        med, stats = _serial_sweep_stats(mm_fn, ym, K, aux=(op,))
        per_method["matmul"] = (med, stats, mm_fn, (op,))
        med, stats = _serial_sweep_stats(
            mm_bf16, ym, K, aux=(L_bf16, op.c, op.cov)
        )
        per_method["matmul_bf16"] = (med, stats, mm_bf16, (L_bf16, op.c, op.cov))

        best_method = min(per_method, key=lambda k: per_method[k][0])
        dt, _, best_fn, best_aux = per_method[best_method]
        flops = _flops_of(best_fn, ym, *best_aux)
        dt_bf16 = per_method["matmul_bf16"][0]
        flops_bf16 = _flops_of(mm_bf16, ym, L_bf16, op.c, op.cov)
        out[f"d{d}"] = {
            "replicas": Rm, "T": T,
            "sweep_us": {k: v[1] for k, v in per_method.items()},
            "best_method": best_method,
            "xla_flops_per_sweep": flops,
            "achieved_tflops": round(flops / dt / 1e12, 2),
            "mfu_pct_of_bf16_peak": round(100 * flops / dt / 1e12 / mxu_peak, 2),
            "mfu_pct_bf16_edge_path": round(
                100 * flops_bf16 / dt_bf16 / 1e12 / mxu_peak, 2
            ),
            "note": "matmul_bf16 = the precision policy's bf16-edge config "
            "(bf16 operator+inputs, f32 accumulation; accuracy delta in "
            "docs/precision_results.json); blocked = two-level lane-major "
            "scan; assoc kept for the record (flat O(T log T) network)",
        }
    return out


def _ladder_hgf(K, hbm_peak):
    """Streaming HGF filtering: full-trajectory and trimmed-track kernel
    configs (opt-in tracks, VERDICT r3 item 6).  ``pct_hbm_peak`` is
    computed per config with that config's own traffic."""
    import jax
    import jax.numpy as jnp

    from cortex_tpu.models import HGF
    from cortex_tpu.ops.pallas_hgf import hgf_filter_pallas

    Rh, Th = 65536, 256
    key = jax.random.PRNGKey(9)
    uh = jax.block_until_ready(
        jnp.cumsum(0.1 * jax.random.normal(key, (Rh, Th), jnp.float32), -1)
    )
    hgf = HGF()

    def all5(method):
        def fn(data):
            final, traj = hgf.filter(data, method=method)
            return final, traj.mu1, traj.mu2
        return fn

    def filter_only(data):
        final, _ = hgf.filter(data, method="pallas", tracks=())
        return final

    def mu_bf16(data):
        final, tr = hgf_filter_pallas(
            data, tracks=("mu1", "mu2"), track_dtype=jnp.bfloat16
        )
        return final, tr

    # (config, fn, f32-equivalent buffer count for traffic accounting)
    configs = {
        "scan": (all5("scan"), 6.0),
        "pallas": (all5("pallas"), 6.0),
        "pallas_filter_only": (filter_only, 1.0),
        "pallas_mu_bf16": (mu_bf16, 2.0),  # 1 f32 read + 2 bf16 writes
    }
    out_cfg = {}
    meds = {}
    for name, (fn, bufs) in configs.items():
        med, stats = _serial_sweep_stats(fn, uh, K)
        meds[name] = med
        stats["pct_hbm_peak"] = round(
            100 * bufs * Rh * Th * 4 / med / 1e9 / hbm_peak, 1
        )
        out_cfg[name] = stats
    dt = meds["pallas_filter_only"]
    return {
        "replicas": Rh, "T": Th,
        "sweep_us": out_cfg,
        "best_method": min(meds, key=meds.get),
        # Headline = the streaming-filtering configuration (final state
        # only); trajectory configs are reported above.
        "obs_per_s": round(Rh * Th / dt, 1),
        "pct_hbm_peak": out_cfg["pallas_filter_only"]["pct_hbm_peak"],
        "note": "trimmed-track configs are serial-recursion compute-bound, "
        "not HBM-bound: T sequential VPU steps per tile put the floor at "
        "~grid*T*(chain_depth) cycles, so pct_hbm_peak is the binding "
        "metric only for the full-trajectory configs",
    }


def bench_ladder(peaks, K=40):
    """On-chip device times for the rest of the BASELINE.md model ladder:
    HMM+Dirichlet VMP, GMM structured VMP, MvLGSSM (d=4,16; MFU), streaming
    HGF.  Same serialized-fori_loop methodology as the primary metric.

    Each family runs in its own section: one family's failure (a tunnel
    flake or a worker-crashing kernel) must not lose the others — and the
    HMM pallas variant (the one kernel that has crashed the remote worker)
    runs LAST, after every other number is banked."""
    hbm_peak = (
        peaks.get("spec_hbm_GBps")
        or peaks.get("measured_hbm_probe_GBps")
        or KNOWN_PEAKS["TPU v5 lite"]["hbm_GBps"]
    )
    mxu_peak = (
        peaks.get("spec_bf16_tflops")
        or peaks.get("measured_mxu_probe_bf16_tflops")
        or KNOWN_PEAKS["TPU v5 lite"]["bf16_tflops"]
    )
    out = {
        "hmm": _section("ladder.hmm_scan", _ladder_hmm, K, "scan", retries=0),
        "gmm": _section(
            "ladder.gmm", _ladder_gmm, K, hbm_peak, mxu_peak, retries=0
        ),
        "mv_lgssm": _section("ladder.mv", _ladder_mv, K, mxu_peak, retries=0),
        "hgf": _section("ladder.hgf", _ladder_hgf, K, hbm_peak, retries=0),
    }
    hmm_pallas = _section(
        "ladder.hmm_pallas", _ladder_hmm, K, "pallas", retries=0
    )
    if isinstance(out["hmm"], dict) and "error" not in out["hmm"]:
        variants = {
            "scan": out["hmm"]["per_vmp_iter_us"],
            "pallas": hmm_pallas.get("per_vmp_iter_us", hmm_pallas.get("error")),
        }
        out["hmm"]["per_vmp_iter_us"] = variants
        timed = [
            v["median_us"] for v in variants.values() if isinstance(v, dict)
        ]
        if timed:
            best = min(timed) * 1e-6
            h = out["hmm"]
            h["msg_updates_per_s"] = round(
                h["replicas"] * h["T"] * 3 / best, 1
            )
    else:
        out["hmm_pallas"] = hmm_pallas
    return out


def main():
    replicas = 10_000
    peaks = _section("hw_peaks", bench_hw_peaks)
    if "error" in peaks:
        peaks = {"device_kind": "unknown", **peaks}
    primary = _section("paths_10k", bench_paths, replicas, 400, retries=2)
    if "error" in primary:
        # Primary metric is non-negotiable: emit an explicit failure line
        # rather than dying with a traceback mid-artifact.
        print(
            json.dumps(
                {
                    "metric": "lgssm_10k_replica_message_updates_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "msg_updates/s",
                    "vs_baseline": 0.0,
                    "detail": {"error": primary["error"], "hardware": peaks},
                }
            )
        )
        return
    scale = _section("paths_100k", bench_paths, 100_000, 100, retries=1)
    generic = _section(
        "generic_compiled", bench_generic_compiled, replicas, 200, retries=1
    )
    if isinstance(generic, dict):
        generic_dt, generic_lowered, generic_scan_dt = None, False, None
    else:
        generic_dt, generic_lowered, generic_scan_dt = generic
    generic_vmp = _section(
        "generic_vmp", bench_generic_vmp, replicas, 40, retries=1
    )
    generic_structured = _section(
        "generic_structured", bench_generic_structured, replicas, 4, retries=1
    )
    # MFU numerator for the matmul path — computed BEFORE the ladder, whose
    # kernels have crashed the remote worker and taken the backend with them.
    try:
        from cortex_tpu.ops import lgssm_smooth_matmul, lgssm_smoother_operator

        op = lgssm_smoother_operator(T)
        mm_flops = _flops_of(
            lambda y: lgssm_smooth_matmul(y, operator=op), _make_data(replicas)
        )
    except Exception:  # pragma: no cover - infra-dependent
        mm_flops = 0.0
    ladder = bench_ladder(peaks)

    probe = primary.pop("probe")["median_us"] * 1e-6
    scale_failed = "error" in scale
    if scale_failed:
        scale_err = scale["error"]
        scale, probe_100k, dt100k = {}, None, None
    else:
        probe_100k = scale.pop("probe")["median_us"] * 1e-6
        dt100k = min(s["median_us"] for s in scale.values()) * 1e-6
    best = min(primary, key=lambda k: primary[k]["median_us"])
    dt = primary[best]["median_us"] * 1e-6
    updates_per_sweep = replicas * (3 * T - 2)
    updates_per_s = updates_per_sweep / dt
    baseline_updates_per_s = bench_dynamic_engine(T)

    hbm_peak = (
        peaks.get("spec_hbm_GBps")
        or peaks.get("measured_hbm_probe_GBps")
        or KNOWN_PEAKS["TPU v5 lite"]["hbm_GBps"]
    )
    mxu_peak = (
        peaks.get("spec_bf16_tflops")
        or peaks.get("measured_mxu_probe_bf16_tflops")
        or KNOWN_PEAKS["TPU v5 lite"]["bf16_tflops"]
    )
    bytes_per_sweep = 3 * replicas * T * 4  # read y once, write mean+var
    result = {
        "metric": "lgssm_10k_replica_message_updates_per_sec_per_chip",
        "value": round(updates_per_s, 1),
        "unit": "msg_updates/s",
        "vs_baseline": round(updates_per_s / baseline_updates_per_s, 2),
        "detail": {
            "replicas": replicas,
            "T": T,
            "best_path": best,
            "sweeps_per_sec": round(1.0 / dt, 2),
            "sweep_device_us": primary,
            "sweep_device_us_100k_replicas": (
                {"error": scale_err} if scale_failed else scale
            ),
            "msg_updates_per_s_100k_replicas": (
                None
                if scale_failed
                else round(100_000 * (3 * T - 2) / dt100k, 1)
            ),
            "hardware": peaks,
            "roofline": {
                "bytes_per_sweep": bytes_per_sweep,
                "matched_traffic_probe_us": round(probe * 1e6, 1),
                "probe_GBps": round(bytes_per_sweep / probe / 1e9, 1),
                "pct_matched_probe_best": round(100.0 * probe / dt, 1),
                "pct_hbm_spec_peak_best": round(
                    100.0 * bytes_per_sweep / dt / 1e9 / hbm_peak, 1
                ),
                "mfu_pct_matmul_path": round(
                    100.0
                    * mm_flops
                    / (primary["matmul"]["median_us"] * 1e-6)
                    / 1e12
                    / mxu_peak,
                    2,
                ),
                "mfu_pct_matmul_bf16_path": round(
                    100.0
                    * mm_flops
                    / (primary["matmul_bf16"]["median_us"] * 1e-6)
                    / 1e12
                    / mxu_peak,
                    2,
                ),
                "regime_10k": "latency/launch-bound (12MB footprint; the "
                "matched probe itself runs far below HBM peak at this size)",
                "probe_note": "pct_matched_probe ~100% means the path "
                "matches an ideal copy of its own traffic; the residual "
                "gap to spec peak at 100k is the PROBE's own inefficiency "
                "at a 120 MB footprint (the 1 GB hw_peaks probe comes "
                "closer), not path headroom",
                "probe_us_100k": (
                    None if scale_failed else round(probe_100k * 1e6, 1)
                ),
                "pct_matched_probe_best_100k": (
                    None
                    if scale_failed
                    else round(100.0 * probe_100k / dt100k, 1)
                ),
                "pct_hbm_spec_peak_best_100k": (
                    None
                    if scale_failed
                    else round(
                        100.0 * (3 * 100_000 * T * 4) / dt100k / 1e9 / hbm_peak,
                        1,
                    )
                ),
            },
            "generic_path": (
                {
                    "sweep_device_us": round(generic_dt * 1e6, 1),
                    "chain_lowered_to_scan": generic_lowered,
                    "scan_same_section_us": round(generic_scan_dt * 1e6, 1),
                    "ratio_vs_scan": round(generic_dt / generic_scan_dt, 2),
                    "ratio_vs_best_handwritten": round(generic_dt / dt, 2),
                    "gap_decomposition": "ratio_vs_scan is executor overhead "
                    "on the same O(T) algorithm; the remaining gap to the "
                    "matmul path is algorithmic (affine-in-y (R,T)x(T,T) "
                    "operator, O(T^2)/replica, scalar-LGSSM-specific; see "
                    "docs/benchmarks.md for the measured T-crossover)",
                }
                if generic_dt is not None
                else generic
            ),
            "generic_vmp": generic_vmp,
            "generic_structured": generic_structured,
            "ladder": ladder,
            "methodology": "K serialized sweeps per jit call (fori_loop, "
            "output-fed), time-salted inputs, scalar fetch; amortizes the "
            "~80us enqueue-ack and ~24ms fetch RPC of the remote TPU tunnel",
            "erratum_r01": "BENCH_r01 numbers (35 GUPS headline) were remote-"
            "execution-cache artifacts (~7x inflated); r02+ use this "
            "cache-defeating methodology and supersede them",
            "baseline": "dynamic per-signal reactive engine (reference "
            "architecture), msg_updates/s",
            "baseline_value": round(baseline_updates_per_s, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

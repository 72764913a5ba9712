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

Paths measured:
- ``matmul``  — MXU lowering: the smoother is affine in y (ops/chains.py
  ``lgssm_smooth_matmul``), one (R,T)x(T,T) matmul at Precision.HIGHEST.
- ``scan``    — two batched ``lax.scan`` passes (ops/chains.py).
- ``pallas``  — fused VMEM-resident kernel (ops/pallas_kernels.py).
- ``generic`` — the actual factor-graph path: ``CompiledInference`` over the
  T=100 chain graph with chain lowering (compile/lowering.py), replica-
  batched; proves the framework's generic compiler reaches hand-written
  performance (VERDICT r1 item 1).

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


def _serial_sweep_time(fn, y0, K, aux=()):
    """Device seconds per fn(y, *aux)-sweep: K serialized sweeps per call.

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
    t0 = time.perf_counter()
    float(g(salt + 0.5, y0, tuple(aux)))
    return (time.perf_counter() - t0) / K


def _make_data(R):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(int(time.time_ns()) % (2**31))
    y0 = jnp.cumsum(jax.random.normal(key, (R, T), jnp.float32), -1)
    return jax.block_until_ready(y0)


def bench_paths(R, K):
    """Sweep seconds per path at R replicas (+ matched-traffic probe)."""
    import jax.numpy as jnp

    from cortex_tpu.models import LGSSM
    from cortex_tpu.ops import lgssm_smooth_matmul, lgssm_smoother_operator
    from cortex_tpu.ops.pallas_kernels import lgssm_smooth_pallas

    model = LGSSM(A=1.0, Q=1.0, H=1.0, R=1.0)
    op = lgssm_smoother_operator(T)
    y0 = _make_data(R)
    # The (T,T) operator rides as a jit argument (see _serial_sweep_time).
    paths = {
        "matmul": (lambda y, o: lgssm_smooth_matmul(y, operator=o), (op,)),
        "scan": (lambda y: model.smooth(y, method="scan"), ()),
        "pallas": (lambda y: lgssm_smooth_pallas(y, tile=2048), ()),
        "probe": (lambda y: (y * 1.000001, y + 0.5), ()),
    }
    return {
        name: _serial_sweep_time(fn, y0, K, aux=aux)
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
    dt = _serial_sweep_time(fn, y0, K)
    # Back-to-back scan reference in the SAME section: the tunnel's
    # run-to-run variance (observed 2x on the matmul path) would otherwise
    # pollute the executor-overhead ratio computed against a scan number
    # measured minutes earlier.
    from cortex_tpu.models import LGSSM

    model = LGSSM(A=1.0, Q=1.0, H=1.0, R=1.0)

    def scan_fn(d):
        m = model.smooth(d, method="scan")
        return m.mean, m.variance

    dt_scan = _serial_sweep_time(scan_fn, y0, K)
    return dt, lowered, dt_scan


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

    dt = _serial_sweep_time(fn, base, K) / iters
    return {
        "replicas": R_, "T": T_, "K": Kh, "M": M,
        "per_vmp_iter_us": round(dt * 1e6, 1),
        # One VMP iteration touches R*T state marginals + R*(T-1) pairwise
        # counts + R*T emission contributions ≈ 3 updates per step.
        "msg_updates_per_s": round(R_ * T_ * 3 / dt, 1),
    }


def _ladder_gmm(K):
    """GMM structured VMP (R independent replicas)."""
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

    dt = _serial_sweep_time(gmm_fn, xg, K) / giters
    return {
        "replicas": Rg, "N": N, "D": D, "K": Kg,
        "per_vmp_iter_us": round(dt * 1e6, 1),
        "resp_updates_per_s": round(Rg * N * Kg / dt, 1),
    }


def _ladder_mv(K, mxu_peak):
    """MvLGSSM smoothing (MXU path; MFU against bf16 spec peak)."""
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
        per_method = {}
        for method, Km in (("scan", K), ("assoc", max(4, K // 8))):
            fn = lambda v, meth=method: m.smooth(v, method=meth)
            per_method[method] = (_serial_sweep_time(fn, ym, Km), fn, ())
        mm_fn = lambda v, o: mv_lgssm_smooth_matmul(v, operator=o)
        per_method["matmul"] = (
            _serial_sweep_time(mm_fn, ym, K, aux=(op,)),
            mm_fn,
            (op,),
        )
        best_method = min(per_method, key=lambda k: per_method[k][0])
        dt, best_fn, best_aux = per_method[best_method]
        flops = _flops_of(best_fn, ym, *best_aux)
        out[f"d{d}"] = {
            "replicas": Rm, "T": T,
            "sweep_us": {k: round(v[0] * 1e6, 1) for k, v in per_method.items()},
            "best_method": best_method,
            "xla_flops_per_sweep": flops,
            "achieved_tflops": round(flops / dt / 1e12, 2),
            "mfu_pct_of_bf16_peak": round(100 * flops / dt / 1e12 / mxu_peak, 2),
            "note": "f32 compute; MFU denominator is the bf16 spec peak; "
            "assoc trades 2x combine work for O(log T) depth (pays off "
            "time-sharded, not single-chip)",
        }
    return out


def _ladder_hgf(K, hbm_peak):
    """Streaming HGF filtering."""
    import jax
    import jax.numpy as jnp

    from cortex_tpu.models import HGF

    Rh, Th = 65536, 256
    key = jax.random.PRNGKey(9)
    uh = jax.block_until_ready(
        jnp.cumsum(0.1 * jax.random.normal(key, (Rh, Th), jnp.float32), -1)
    )
    hgf = HGF()

    def hgf_fn(method):
        def fn(data):
            final, traj = hgf.filter(data, method=method)
            return final, traj.mu1, traj.mu2
        return fn

    us = {
        m: _serial_sweep_time(hgf_fn(m), uh, K) for m in ("scan", "pallas")
    }
    dt = min(us.values())
    bytes_traffic = (1 + 5) * Rh * Th * 4  # read u, write 5-track trajectory
    return {
        "replicas": Rh, "T": Th,
        "sweep_us": {m: round(v * 1e6, 1) for m, v in us.items()},
        "best_method": min(us, key=us.get),
        "obs_per_s": round(Rh * Th / dt, 1),
        "pct_hbm_peak": round(100 * bytes_traffic / dt / 1e9 / hbm_peak, 1),
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
        "gmm": _section("ladder.gmm", _ladder_gmm, K, retries=0),
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
        timed = [v for v in variants.values() if isinstance(v, (int, float))]
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

    probe = primary.pop("probe")
    scale_failed = "error" in scale
    if scale_failed:
        scale_err = scale["error"]
        scale, probe_100k, dt100k = {}, None, None
    else:
        probe_100k = scale.pop("probe")
        dt100k = min(scale.values())
    best = min(primary, key=primary.get)
    dt = primary[best]
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
            "sweep_device_us": {k: round(v * 1e6, 1) for k, v in primary.items()},
            "sweep_device_us_100k_replicas": (
                {"error": scale_err}
                if scale_failed
                else {k: round(v * 1e6, 1) for k, v in scale.items()}
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
                    100.0 * mm_flops / primary["matmul"] / 1e12 / mxu_peak, 2
                ),
                "regime_10k": "latency/launch-bound (12MB footprint; the "
                "matched probe itself runs far below HBM peak at this size)",
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

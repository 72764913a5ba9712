"""Chain-length crossover: matmul vs scan vs pallas as T grows.

The matmul smoothing path exploits the smoother being affine in y: one
(R,T)x(T,T) MXU matmul, O(T^2) FLOPs *per replica* and an O(T^2) operator
resident in HBM — unbeatable at small T, necessarily losing to the O(T)
recursion paths once T is large enough.  This measures where (fixed total
element count R*T, so HBM traffic is constant across rows; only the
algorithmic term moves) — the committed decomposition VERDICT r2 item 1
asks for, and the regime evidence for keeping the fused pallas kernel
(it is the fastest O(T) path on-chip).

Writes ``CROSSOVER.json`` at the repo root.
Usage: python benchmarks/crossover_bench.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REPO = pathlib.Path(__file__).resolve().parents[1]
TOTAL = 1_000_000  # R * T held fixed


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from cortex_tpu.models import LGSSM
    from cortex_tpu.ops import lgssm_smooth_matmul, lgssm_smoother_operator
    from cortex_tpu.ops.pallas_kernels import lgssm_smooth_pallas

    model = LGSSM(A=1.0, Q=1.0, H=1.0, R=1.0)
    rows = []
    for T_ in (100, 400, 1600, 6400):
        R_ = TOTAL // T_
        key = jax.random.PRNGKey(T_)
        y0 = jax.block_until_ready(
            jnp.cumsum(jax.random.normal(key, (R_, T_), jnp.float32), -1)
        )
        op = lgssm_smoother_operator(T_)
        K = max(10, 40_000 // T_)
        tile = min(2048, max(256, R_))
        # The (T,T) operator rides as a jit argument: closed-over it would be
        # inlined into the remote_compile HLO payload (164MB at T=6400).
        paths = {
            "matmul": (
                lambda y, o: lgssm_smooth_matmul(y, operator=o),
                (op,),
            ),
            "scan": (lambda y: model.smooth(y, method="scan"), ()),
            "pallas": (lambda y: lgssm_smooth_pallas(y, tile=tile), ()),
        }
        row = {"T": T_, "replicas": R_, "sweep_us": {}}
        for name, (fn, aux) in paths.items():
            try:
                dt = bench._serial_sweep_time(fn, y0, K, aux=aux, repeats=3)
                row["sweep_us"][name] = round(dt * 1e6, 1)
            except Exception as e:  # pragma: no cover - shape/VMEM limits
                row["sweep_us"][name] = f"error: {type(e).__name__}"
        timed = [
            (v, k) for k, v in row["sweep_us"].items() if isinstance(v, float)
        ]
        row["best"] = min(timed)[1] if timed else None
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "metric": "lgssm_chain_length_crossover",
        "fixed_total_elements": TOTAL,
        "platform": jax.devices()[0].platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "rows": rows,
    }
    (REPO / "CROSSOVER.json").write_text(json.dumps(out, indent=1))
    print(f"-> {REPO / 'CROSSOVER.json'}", file=sys.stderr)


if __name__ == "__main__":
    main()

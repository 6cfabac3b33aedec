"""Real-TPU validation + timing of the temporal-blocking K-sweep kernel."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from neptune_tpu.ir import Bounds, F32, NeptuneBuilder, TempType
from neptune_tpu.passes import compile_ir

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def build(n):
    b = NeptuneBuilder()
    bounds = Bounds.of((0, 0), (n, n))
    tt = TempType("float32", bounds)
    fn = b.make_opdef("jac", "nonlinear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply(
        [fn.body.args[0]], Bounds.of((1, 1), (n - 1, n - 1))
    )
    b.push_block(body)
    u = body.args[2]
    acc = b.mul(b.access(u, (0, 0)), b.constant(0.6, F32))
    for off in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        acc = b.add(acc, b.mul(b.access(u, off), b.constant(0.1, F32)))
    b.yield_(acc)
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()
    return b.module


def timed(fn, x, reps):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda _, u: fn(u), x)

    y = loop(x)
    _ = float(jnp.sum(y))  # warm-up + compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        y = loop(x)
        _ = float(jnp.sum(y))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("device:", jax.devices()[0])
    cm = compile_ir(build(N), backend="auto")
    from neptune_tpu.lowering import pallas_multisweep as pm

    d = pm.best_depth(cm.module, "jac", K)
    assert d is not None, "fused kernel ineligible"
    plan = pm.sweeps_plan(cm.module, "jac", d)
    print(f"N={N} K={K} depth={d} slab={plan['slab']} win={plan['win']} "
          f"hp={plan['hp']}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)

    fused = cm.sweeps("jac", K)
    one = cm.opdef("jac")

    # correctness on the real chip
    y_f = np.asarray(jax.jit(fused)(x))
    y_r = x
    oj = jax.jit(one)
    for _ in range(K):
        y_r = oj(y_r)
    y_r = np.asarray(y_r)
    dev = np.abs(y_f - y_r).max()
    print(f"max |fused - {K}x single| = {dev:.3e}")
    assert dev < 1e-4, "fused kernel diverges on TPU"

    # timing: R1/R2 fused calls (each = K sweeps), slope removes overhead
    r1, r2 = 4, 12
    t1 = timed(fused, x, r1)
    t2 = timed(fused, x, r2)
    dt = (t2 - t1) / (r2 - r1)  # seconds per fused call
    gcell = N * N * K / dt / 1e9
    print(f"fused: {dt*1e3:.3f} ms per {K}-sweep call -> {gcell:.1f} Gcell/s")

    t1 = timed(one, x, r1 * K)
    t2 = timed(one, x, r2 * K)
    dts = (t2 - t1) / ((r2 - r1) * K)
    print(
        f"single-sweep loop: {dts*1e3:.3f} ms/sweep -> "
        f"{N*N/dts/1e9:.1f} Gcell/s; speedup {dts*K/dt:.2f}x"
    )


if __name__ == "__main__":
    main()

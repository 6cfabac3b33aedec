"""Fused VMEM-resident CG kernel tests (interpret mode on CPU; measured
~2x over the XLA while_loop path on v5e at 128^2-512^2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.config import config
from neptune_tpu.solvers import cg
from neptune_tpu.solvers.fused import FusionError, fused_cg, supported


@pytest.fixture(autouse=True)
def fresh():
    ntp.reset_context()
    config.pallas_interpret = True
    yield
    config.pallas_interpret = False
    ntp.reset_context()


def make_poisson(n=64, name="poisson"):
    @ntp.linear_op_def(
        bounds=([0, 0], [n, n]), interior=([1, 1], [n - 1, n - 1]),
        dtype="float32", name=name,
    )
    def poisson(u):
        return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

    return poisson


class TestFusedCG:
    def test_matches_standard_cg(self):
        make_poisson()
        cm = ntp.get_context().compiled()
        b = jnp.asarray(
            np.random.default_rng(0).standard_normal((64, 64)).astype(np.float32)
        )
        solve = fused_cg(cm.module, "poisson", tol=1e-5, maxiter=2000, interpret=True)
        x, iters, rn = solve(b)
        mv = cm.opdef("poisson")
        x_std, info = cg(mv, b, tol=1e-5, maxiter=2000)
        # same algorithm, same arithmetic order -> same iteration count and
        # closely matching solutions
        assert int(iters) == int(info.iters)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_std), atol=1e-4)
        assert float(jnp.linalg.norm(b - mv(x))) < 1e-4 * 64

    def test_jacobi_preconditioned(self):
        make_poisson()
        cm = ntp.get_context().compiled()
        b = jnp.asarray(
            np.random.default_rng(1).standard_normal((64, 64)).astype(np.float32)
        )
        inv_diag = jnp.where(
            jnp.asarray(True), 1.0, 1.0
        )  # placeholder replaced below
        # diagonal of the poisson operator with identity boundary rows
        d = np.full((64, 64), 4.0, np.float32)
        d[0, :] = d[-1, :] = d[:, 0] = d[:, -1] = 1.0
        solve = fused_cg(
            cm.module, "poisson", tol=1e-5, maxiter=2000,
            inv_diag=jnp.asarray(1.0 / d), interpret=True,
        )
        x, iters, rn = solve(b)
        mv = cm.opdef("poisson")
        assert float(jnp.linalg.norm(b - mv(x))) < 1e-4 * 64

    def test_composite_operator_inlines(self):
        # ac_A-style: wrapper calling another linear opdef via apply_linear
        n = 64

        @ntp.linear_op_def(
            bounds=([0, 0], [n, n]), interior=([1, 1], [n - 1, n - 1]),
            dtype="float32", name="lap_in",
        )
        def lap_in(u):
            return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

        ctx = ntp.get_context()
        b = ctx.builder
        from neptune_tpu.ir import TempType, Bounds

        tt = TempType("float32", Bounds.of([0, 0], [n, n]))
        fn = b.make_opdef("shifted", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        lapx = b.apply_linear("lap_in", [fn.body.args[0]])
        op, body = b.start_apply([fn.body.args[0], lapx], tt.bounds)
        b.push_block(body)
        from neptune_tpu.ir import F32

        x0 = b.access(body.args[2], [0, 0])
        l0 = b.access(body.args[3], [0, 0])
        b.yield_(b.add(x0, b.mul(b.constant(0.1, F32), l0)))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        ctx.bump()

        cm = ctx.compiled()
        bb = jnp.asarray(
            np.random.default_rng(2).standard_normal((n, n)).astype(np.float32)
        )
        solve = fused_cg(cm.module, "shifted", tol=1e-5, maxiter=2000, interpret=True)
        x, iters, rn = solve(bb)
        mv = cm.opdef("shifted")
        assert float(jnp.linalg.norm(bb - mv(x))) < 1e-4 * n

    def test_supported_gates(self):
        make_poisson(name="ok64")
        cm = ntp.get_context().compiled()
        tt = cm.module.lookup("ok64").ftype.inputs[0]
        assert supported(cm.module, "ok64", tt)

        # f64 not supported
        @ntp.linear_op_def(bounds=([0, 0], [16, 16]), name="f64op")
        def f64op(u):
            return 2.0 * u[0, 0]

        cm2 = ntp.get_context().compiled()
        tt2 = cm2.module.lookup("f64op").ftype.inputs[0]
        assert not supported(cm2.module, "f64op", tt2)

    def test_executor_auto_fusion_interpret(self):
        # solve_linear automatically takes the fused path when eligible
        config.backend = "auto"
        p = make_poisson(name="autofuse")
        H = ntp.assemble_matrix(p)
        b = np.random.default_rng(3).standard_normal((64, 64)).astype(np.float32)
        x = np.asarray(
            ntp.solve_linear(H, b, solver="cg", tol=1e-5, max_iters=2000)
        )
        mv = ntp.get_context().compiled().opdef("autofuse")
        assert float(jnp.linalg.norm(jnp.asarray(b) - mv(x))) < 1e-4 * 64

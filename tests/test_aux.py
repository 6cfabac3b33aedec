"""Auxiliary subsystem tests: solver observability, checkpointing, config."""

import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(autouse=True)
def fresh():
    ntp.reset_context()
    yield
    ntp.reset_context()


class TestVerboseReporting:
    def test_ksp_line_printed(self, capfd):
        # parity with PETSc's post-KSPSolve convergence printout
        # (NeptunePETScRuntime.cpp:345-359)
        @ntp.linear_op_def(bounds=([0], [32]), interior=([1], [31]))
        def lap(u):
            return 2.0 * u[0] - u[-1] - u[1]

        H = ntp.assemble_matrix(lap)
        b = np.random.default_rng(0).standard_normal(32)
        ntp.solve_linear(H, b, solver="bicgstab", tol=1e-10, max_iters=500, verbose=True)
        out = capfd.readouterr().out + capfd.readouterr().err
        assert "KSP(bicgstab)" in out
        assert "converged=True" in out

    def test_snes_line_printed(self, capfd):
        def residual(u):
            return u[0] * u[0] * u[0] + u[0] - 2.0

        ntp.solve_nonlinear(residual, np.zeros(8), tol=1e-12, verbose=True)
        out = capfd.readouterr().out + capfd.readouterr().err
        assert "SNES" in out

    def test_silent_by_default(self, capfd):
        @ntp.linear_op_def(bounds=([0], [16]), interior=([1], [15]))
        def lap(u):
            return 2.0 * u[0] - u[-1] - u[1]

        ntp.solve_linear(
            ntp.assemble_matrix(lap), np.ones(16), solver="bicgstab", tol=1e-8
        )
        out = capfd.readouterr().out
        assert "KSP" not in out


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "state.npz"
        u = np.random.default_rng(1).standard_normal((8, 8))
        q = np.random.default_rng(2).standard_normal((8, 8))
        save_checkpoint(p, {"u": u, "q": q}, step=42, time=4.2, meta={"dt": 0.1})
        fields, meta = load_checkpoint(p)
        np.testing.assert_array_equal(fields["u"], u)
        np.testing.assert_array_equal(fields["q"], q)
        assert meta == {"step": 42, "time": 4.2, "dt": 0.1}

    def test_atomic_overwrite(self, tmp_path):
        p = tmp_path / "state.npz"
        save_checkpoint(p, {"u": np.zeros(4)}, step=1)
        save_checkpoint(p, {"u": np.ones(4)}, step=2)
        fields, meta = load_checkpoint(p)
        assert meta["step"] == 2
        np.testing.assert_array_equal(fields["u"], np.ones(4))


class TestSimulationDriver:
    def test_checkpoint_resume(self, tmp_path):
        from neptune_tpu.utils.driver import SimulationDriver
        import jax.numpy as jnp

        def step(state):
            return {"u": state["u"] + 1.0}

        p = tmp_path / "sim.npz"
        d = SimulationDriver(step, p, checkpoint_every=10)
        init = {"u": np.zeros(4)}
        state, n = d.run(init, 25)
        assert n == 25
        np.testing.assert_array_equal(state["u"], 25.0)

        # a fresh driver resumes from the checkpoint, not from init
        d2 = SimulationDriver(step, p, checkpoint_every=10)
        state2, n2 = d2.run(init, 40)
        assert n2 == 40
        np.testing.assert_array_equal(state2["u"], 40.0)

    def test_walltime_budget_stops_early(self, tmp_path):
        import time as _t

        from neptune_tpu.utils.driver import SimulationDriver

        def slow_step(state):
            return {"u": state["u"] + 1.0}

        p = tmp_path / "sim2.npz"
        d = SimulationDriver(slow_step, p, checkpoint_every=1)

        # wrap to burn wall time per chunk
        orig = d._chunk_runner

        def wrapped(n):
            f = orig(n)

            def run(s):
                _t.sleep(0.05)
                return f(s)

            return run

        d._chunk_runner = wrapped
        state, n = d.run({"u": np.zeros(2)}, 1000, walltime_budget_s=0.2)
        assert 0 < n < 1000  # stopped early, after a checkpoint
        # and the checkpoint matches the reported step
        from neptune_tpu.utils.checkpoint import load_checkpoint

        _, meta = load_checkpoint(p)
        assert meta["step"] == n

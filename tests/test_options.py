"""Per-solve runtime options — the reference's PETSc options-string escape
hatch (`NeptunePETScRuntime.cpp:139-150, 284-298, 1465-1472`) rebuilt as a
validated options dict/string on solve_linear / solve_nonlinear /
time_advance, with env-var defaults (NEPTUNE_KSP_OPTIONS / NEPTUNE_SNES_OPTIONS).
"""

import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.solvers import krylov
from neptune_tpu.utils.options import (
    LINEAR_OPTION_KEYS,
    NONLINEAR_OPTION_KEYS,
    env_defaults,
    linear_option_kwargs,
    nonlinear_option_kwargs,
    parse_options,
)


def poisson_1d(n=32, dtype="float64"):
    ntp.reset_context()

    @ntp.linear_op_def(
        bounds=([0], [n]), interior=([1], [n - 1]), dtype=dtype
    )
    def A(u):
        return 2.0 * u[0] - u[-1] - u[1]

    return A


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_dict_and_string_forms():
    want = {"restart": 50, "atol": 1e-12}
    assert parse_options({"restart": 50, "atol": 1e-12}, LINEAR_OPTION_KEYS) == want
    assert parse_options("restart=50 atol=1e-12", LINEAR_OPTION_KEYS) == want
    assert parse_options("restart=50,atol=1e-12", LINEAR_OPTION_KEYS) == want
    assert parse_options("-restart 50 -atol 1e-12", LINEAR_OPTION_KEYS) == want


def test_parse_rejects_unknown_and_bad_values():
    with pytest.raises(ValueError, match="unknown option"):
        parse_options({"bogus": 1}, LINEAR_OPTION_KEYS)
    with pytest.raises(ValueError, match="bad value"):
        parse_options({"restart": "many"}, LINEAR_OPTION_KEYS)
    with pytest.raises(ValueError, match="cannot parse"):
        parse_options("restart 50", LINEAR_OPTION_KEYS)


def test_option_kwargs_routing():
    kw = linear_option_kwargs("gmres", {"restart": 40, "divtol": 1e4})
    assert kw == {"restart": 40, "divtol": 1e4}
    with pytest.raises(ValueError, match="restart"):
        linear_option_kwargs("cg", {"restart": 40})
    assert nonlinear_option_kwargs("newton", {"max_step": 0.5}) == {"max_step": 0.5}
    with pytest.raises(ValueError, match="picard"):
        nonlinear_option_kwargs("newton", {"damping": 0.5})
    with pytest.raises(ValueError, match="damping"):
        nonlinear_option_kwargs("picard", {"max_step": 0.5})


def test_env_defaults(monkeypatch):
    monkeypatch.setenv("NEPTUNE_KSP_OPTIONS", "divtol=1e6")
    monkeypatch.setenv("NEPTUNE_SNES_OPTIONS", "max_step=2.0")
    assert env_defaults("linear") == {"divtol": 1e6}
    assert env_defaults("nonlinear") == {"max_step": 2.0}
    monkeypatch.delenv("NEPTUNE_KSP_OPTIONS")
    assert env_defaults("linear") == {}


def test_env_defaults_scoped_to_applicable_solver(monkeypatch):
    """A global restart= default must not poison a cg solve (PETSc's
    options DB ignores inapplicable options); it still reaches gmres.
    Explicit per-op options stay strict."""
    from neptune_tpu.utils.options import (
        linear_option_kwargs,
        merged_linear_options,
        merged_nonlinear_options,
    )

    monkeypatch.setenv("NEPTUNE_KSP_OPTIONS", "restart=50 atol=1e-9")
    assert merged_linear_options(None, "cg") == {"atol": 1e-9}
    assert merged_linear_options(None, "gmres") == {
        "restart": 50, "atol": 1e-9
    }
    assert merged_linear_options(None, "direct") == {}
    # the scoped merge composes with strict validation without raising
    assert linear_option_kwargs("cg", merged_linear_options(None, "cg")) == {
        "atol": 1e-9
    }
    # explicit per-op options are NOT scoped away — still strict
    with pytest.raises(ValueError, match="restart"):
        linear_option_kwargs("cg", merged_linear_options({"restart": 9}, "cg"))

    monkeypatch.setenv("NEPTUNE_SNES_OPTIONS", "damping=0.9 max_step=2.0")
    assert merged_nonlinear_options(None, "picard") == {"damping": 0.9}
    assert merged_nonlinear_options(None, "newton") == {"max_step": 2.0}


def test_env_default_does_not_poison_cg_solve(monkeypatch):
    """End-to-end: NEPTUNE_KSP_OPTIONS=restart=... with a cg solve_linear
    used to raise at lowering time."""
    import neptune_tpu as ntp

    monkeypatch.setenv("NEPTUNE_KSP_OPTIONS", "restart=50")
    ntp.reset_context()
    n = 24

    @ntp.linear_op_def(
        bounds=([0], [n]), interior=([1], [n - 1]), name="lap_env"
    )
    def lap_env(u):
        return 2.0 * u[0] - u[-1] - u[1]

    H = ntp.assemble_matrix(lap_env)
    b = np.zeros(n)
    b[1:-1] = np.random.default_rng(0).standard_normal(n - 2)
    x = ntp.solve_linear(H, b, solver="cg", tol=1e-10, max_iters=500)
    r = np.asarray(ntp.get_context().compiled().opdef("lap_env")(x)) - b
    assert np.linalg.norm(r) < 1e-8
    ntp.reset_context()


# ---------------------------------------------------------------------------
# krylov-level semantics
# ---------------------------------------------------------------------------


def _spd_matvec():
    rng = np.random.default_rng(3)
    B = rng.standard_normal((12, 12))
    A = B @ B.T + 12 * np.eye(12)
    return (lambda x: A @ x), A


def test_atol_floor_allows_loose_absolute_convergence():
    matvec, A = _spd_matvec()
    b = np.full(12, 1e-14)
    # rtol alone would demand ||r|| <= tol*||b|| ~ 1e-20; atol floors it
    x, info = krylov.cg(matvec, b, tol=1e-10, atol=1e-8, maxiter=100)
    assert bool(info.converged)
    assert int(info.iters) <= 2


def test_divtol_halts_iteration_when_residual_above_bound():
    # divtol bound below the initial residual: the solver must stop
    # immediately and report non-convergence (PETSc KSP_DIVERGED_DTOL)
    matvec, A = _spd_matvec()
    b = np.ones(12)
    x, info = krylov.cg(matvec, b, tol=1e-12, maxiter=500, divtol=1e-12)
    assert not bool(info.converged)
    assert int(info.iters) == 0
    # same problem without divtol converges fine
    x, info = krylov.cg(matvec, b, tol=1e-12, maxiter=500)
    assert bool(info.converged)


def test_gmres_divtol_and_restart_still_converge():
    matvec, A = _spd_matvec()
    b = np.ones(12)
    x, info = krylov.gmres(matvec, b, tol=1e-10, restart=5, divtol=1e8, maxiter=200)
    assert bool(info.converged)
    assert np.allclose(A @ np.asarray(x), b, atol=1e-8)


# ---------------------------------------------------------------------------
# IR + executor threading
# ---------------------------------------------------------------------------


def test_solve_linear_options_through_ir():
    n = 32
    A = poisson_1d(n)
    H = ntp.assemble_matrix(A)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    x = ntp.solve_linear(
        H, b, solver="gmres", tol=1e-11, max_iters=400,
        options={"restart": 10, "atol": 1e-12, "divtol": 1e7},
    )
    got = np.asarray(ntp.get_context().compiled().opdef("A")(x))
    want = b.copy()
    assert np.allclose(got[1:-1], want[1:-1], atol=1e-8)


def test_solve_linear_options_string_form():
    n = 32
    A = poisson_1d(n)
    H = ntp.assemble_matrix(A)
    b = np.ones(n)
    x = ntp.solve_linear(H, b, solver="gmres", tol=1e-10, max_iters=400,
                         options="-restart 15 -atol 1e-13")
    assert np.isfinite(np.asarray(x)).all()


def test_solve_linear_rejects_unknown_option():
    n = 16
    A = poisson_1d(n)
    H = ntp.assemble_matrix(A)
    with pytest.raises(ValueError, match="unknown option"):
        ntp.solve_linear(H, np.ones(n), options={"nope": 1})


def test_options_attr_appears_in_ir_and_roundtrips():
    from neptune_tpu.ir import Bounds, NeptuneBuilder, TempType, F64
    from neptune_tpu.ir.parser import parse_module

    n = 8
    b = NeptuneBuilder()
    tt = TempType("float64", Bounds.of([0], [n]))
    fn = b.make_opdef("L", "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], Bounds.of([1], [n - 1]))
    b.push_block(body)
    b.yield_(b.access(body.args[1], [0]))
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    f = b.make_function("run", "func", [tt], [tt])
    b.push_block(f.body)
    A = b.assemble_matrix("L")
    x = b.solve_linear(A, f.body.args[0], solver="gmres",
                       options={"restart": 7, "divtol": 1e5})
    b.return_([x])
    b.pop_block()

    from neptune_tpu.ir.printer import print_module

    text = print_module(b.module)
    assert "options = {divtol = " in text and "restart = 7" in text
    m2 = parse_module(text)
    op2 = [o for o in m2.lookup("run").body.ops if o.name == "neptune.solve_linear"]
    assert op2[0].attrs["options"] == {"restart": 7, "divtol": 1e5}


def test_time_advance_options_threaded(monkeypatch):
    # divtol small enough to abort the (convergent) solve immediately would
    # change the answer; use a huge one and assert identical behavior
    n = 24
    ntp.reset_context()

    @ntp.linear_op_def(
        bounds=([0], [n]), interior=([1], [n - 1]), dtype="float64"
    )
    def heatA(u):
        return u[0] - 0.1 * (u[-1] - 2.0 * u[0] + u[1])

    u0 = np.linspace(0, 1, n)
    u_ref = ntp.time_advance(u0, 0.1, "implicit_linear", system=heatA,
                             solver="gmres", tol=1e-11, max_iters=200)
    u_opt = ntp.time_advance(u0, 0.1, "implicit_linear", system=heatA,
                             solver="gmres", tol=1e-11, max_iters=200,
                             options={"restart": 12, "divtol": 1e9})
    assert np.allclose(np.asarray(u_ref), np.asarray(u_opt), atol=1e-9)


def test_nonlinear_options_max_step():
    n = 16
    ntp.reset_context()

    def residual(u):
        return u[0] * u[0] * u[0] + u[0] - 1.0

    u0 = ntp.temp(np.full(n, 10.0))
    x = ntp.solve_nonlinear(residual, u0, tol=1e-10, max_iters=80,
                            options={"max_step": 1.0, "line_search": True})
    r = np.asarray(x) ** 3 + np.asarray(x) - 1.0
    assert np.abs(r).max() < 1e-8


def test_env_default_options_used(monkeypatch):
    monkeypatch.setenv("NEPTUNE_KSP_OPTIONS", "divtol=1e9")
    n = 24
    A = poisson_1d(n)
    H = ntp.assemble_matrix(A)
    x = ntp.solve_linear(H, np.ones(n), solver="gmres", tol=1e-10, max_iters=300)
    assert np.isfinite(np.asarray(x)).all()

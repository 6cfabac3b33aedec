"""Periodic (torus) boundary support: with periodic=True, out-of-domain
accesses are *specified* to wrap, and every backend must agree exactly with
the NumPy roll oracle (previously wrap was unspecified behavior that only the
jnp path happened to implement)."""

import shutil

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


def oracle(x):
    # upwind-ish periodic advection: u - 0.1*(u - u[i-1, j]) + 0.05*u[i, j+1]
    return x - 0.1 * (x - np.roll(x, 1, axis=0)) + 0.05 * np.roll(x, -1, axis=1)


def build(backend, name, dtype="float64"):
    config.backend = backend
    ntp.reset_context()

    @ntp.nonlinear_op_def(
        bounds=([0, 0], [64, 128]), dtype=dtype, periodic=True, name=name
    )
    def adv(u):
        return u[0, 0] - 0.1 * (u[0, 0] - u[-1, 0]) + 0.05 * u[0, 1]

    return adv


class TestPeriodic:
    def test_jnp_matches_roll_oracle(self):
        x = np.random.default_rng(0).standard_normal((64, 128))
        y = np.asarray(build("jnp", "a")(x))
        np.testing.assert_allclose(y, oracle(x), atol=1e-14)

    def test_pallas_matches_roll_oracle(self):
        config.pallas_interpret = True
        x = np.random.default_rng(1).standard_normal((64, 128)).astype(np.float32)
        y = np.asarray(build("pallas", "b", dtype="float32")(x))
        np.testing.assert_allclose(y, oracle(x.astype(np.float64)), atol=1e-5)

    def test_pallas_multislab_periodic(self, monkeypatch):
        # wrap across *slab* boundaries: force multiple slabs so the modular
        # block index maps are exercised (clamped maps would silently break
        # the torus at the domain edge)
        from neptune_tpu.lowering import pallas_backend

        monkeypatch.setattr(pallas_backend, "_VMEM_BUDGET", 64 * 1024)
        config.pallas_interpret = True
        x = np.random.default_rng(2).standard_normal((128, 128)).astype(np.float32)

        config.backend = "pallas"
        ntp.reset_context()

        @ntp.nonlinear_op_def(
            bounds=([0, 0], [128, 128]), dtype="float32", periodic=True
        )
        def adv(u):
            return u[-1, 0] + 2.0 * u[1, 0] + u[0, -1]

        y = np.asarray(adv(x))
        xe = x.astype(np.float64)
        expected = np.roll(xe, 1, 0) + 2.0 * np.roll(xe, -1, 0) + np.roll(xe, 1, 1)
        np.testing.assert_allclose(y, expected, atol=1e-5)

    @pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")
    def test_native_matches_roll_oracle(self):
        build("jnp", "padv")
        from neptune_tpu.ir import NeptuneBuilder

        ctx = ntp.get_context()
        b = ctx.builder
        fn = ctx.module.lookup("padv")
        entry = b.make_function(
            "main", "func", list(fn.ftype.inputs), list(fn.ftype.results)
        )
        b.push_block(entry.body)
        out = b.apply_nonlinear("padv", list(entry.body.args))
        b.return_([out])
        b.pop_block()

        from neptune_tpu.runtime import compile_native

        nm = compile_native(ctx.module)
        x = np.random.default_rng(3).standard_normal((64, 128))
        y = nm.function("main")(x)
        np.testing.assert_allclose(y, oracle(x), atol=1e-12)

    def test_periodic_simulation_conserves_mass(self):
        # advection on a torus conserves the integral exactly (up to fp)
        build("jnp", "cons")
        mv = ntp.get_context().compiled().opdef("cons")
        x = np.random.default_rng(4).standard_normal((64, 128))
        total0 = x.sum()
        y = x
        for _ in range(10):
            y = np.asarray(mv(y))
        # the operator sums coefficients to 1 - 0.1 + 0.1 + 0.05 per cell...
        # mass scales by (1 + 0.05) per step only through the +0.05 term;
        # check against the oracle instead of strict conservation
        z = x.copy()
        for _ in range(10):
            z = oracle(z)
        np.testing.assert_allclose(y, z, atol=1e-12)

"""Parser round-trip + neptune-opt CLI tests (the reference's lit/FileCheck
tier, `test/mlir_tests/` + `test/CMakeLists.txt:31-44`, as pytest)."""

import subprocess
import sys

import numpy as np
import pytest

import programs
from neptune_tpu.ir import print_module, verify_and_annotate
from neptune_tpu.ir.parser import ParseError, parse_module
from neptune_tpu.passes import compile_ir
from neptune_tpu.tools.opt import main as opt_main


ALL_PROGRAMS = [
    programs.build_allen_cahn_implicit_linear,
    programs.build_allen_cahn_nonlinear,
    programs.build_bs_program,
]


class TestParserRoundTrip:
    @pytest.mark.parametrize("build", ALL_PROGRAMS)
    def test_print_parse_print_fixpoint(self, build):
        m = build()
        verify_and_annotate(m)
        d1 = print_module(m)
        d2 = print_module(parse_module(d1))
        assert d1 == d2

    def test_parsed_module_executes(self):
        m = parse_module(print_module(programs.build_allen_cahn_implicit_linear()))
        cm = compile_ir(m)
        uin = np.sin(np.linspace(0, np.pi, 16))
        out = np.asarray(cm.function("entry")(np.zeros(16), uin))
        oracle = programs.allen_cahn_implicit_linear_oracle(uin)
        np.testing.assert_allclose(out, oracle, atol=1e-10)

    def test_lex_error_reported_with_line(self):
        with pytest.raises(ParseError, match="line"):
            parse_module("module @m {\n  $garbage\n}")


class TestOptCLI:
    def _write(self, tmp_path, build=programs.build_allen_cahn_implicit_linear):
        m = build()
        p = tmp_path / "prog.ntir"
        p.write_text(print_module(m))
        return str(p)

    def test_verify_and_print(self, tmp_path, capsys):
        path = self._write(tmp_path)
        assert opt_main([path]) == 0
        out = capsys.readouterr().out
        assert "neptune.linear_opdef @ac_lap" in out
        assert "structure_key_hash" in out  # verify-annotate ran

    def test_pipeline_rewrites_time_advance(self, tmp_path, capsys):
        path = self._write(tmp_path)
        assert opt_main([path, "--pipeline"]) == 0
        out = capsys.readouterr().out
        assert "neptune.time_advance" not in out
        assert "neptune.solve_linear" in out

    def test_dump_all_stages(self, tmp_path, capsys):
        path = self._write(tmp_path)
        assert opt_main([path, "--dump-all"]) == 0
        out = capsys.readouterr().out
        assert "IR after input" in out
        assert "IR after verify-annotate" in out
        assert "IR after high-level-convertion" in out

    def test_invalid_ir_rejected(self, tmp_path, capsys):
        # the negative-test contract (reference
        # test/mlir_tests/solve-linear-invalid-system.mlir): verifier errors
        # exit non-zero with a diagnostic
        bad = """module @m {
  neptune.linear_opdef @sq : (temp<f64, [0,8), cell>) -> (temp<f64, [0,8), cell>) {
    ^(%0: temp<f64, [0,8), cell>):
    %1 = neptune.apply(%0) {bounds = [0,8), num_inputs = 1} : temp<f64, [0,8), cell>
      {
        ^(%2: index, %3: temp<f64, [0,8), cell>):
        %4 = neptune.access %3[0] : f64
        %5 = arith.mul(%4, %4) : f64
        neptune.yield(%5)
      }
    neptune.return(%1)
  }
}
"""
        p = tmp_path / "bad.ntir"
        p.write_text(bad)
        assert opt_main([str(p)]) == 1
        err = capsys.readouterr().err
        assert "linearity" in err or "mul" in err

    def test_jaxpr_dump(self, tmp_path, capsys):
        path = self._write(tmp_path)
        assert opt_main([path, "--jaxpr", "entry"]) == 0
        out = capsys.readouterr().out
        assert "jaxpr of @entry" in out
        assert "while" in out  # the Krylov loop is visible

    def test_plan_dump(self, tmp_path, capsys):
        # --plan uses a topology-only AbstractMesh: planning a 16-device
        # layout must work regardless of how many devices this host has
        path = self._write(tmp_path)
        assert opt_main([path, "--plan", "16"]) == 0
        out = capsys.readouterr().out
        assert "sharded plan of @ac_lap on mesh 16" in out
        assert "sharded plan of @ac_A on mesh 16" in out
        assert "route: " in out
        assert "halo (verified reach):" in out

    def test_plan_bad_mesh(self, tmp_path, capsys):
        path = self._write(tmp_path)
        assert opt_main([path, "--plan", "4xq"]) == 1
        assert "bad --plan mesh" in capsys.readouterr().err

    def test_output_file(self, tmp_path):
        path = self._write(tmp_path)
        outp = tmp_path / "out.ntir"
        assert opt_main([path, "--pipeline", "-o", str(outp)]) == 0
        text = outp.read_text()
        assert "neptune.assemble_matrix" in text
        # the emitted IR re-parses
        parse_module(text)


class TestOptRun:
    def test_run_jax_and_native_agree(self, tmp_path, capsys):
        # smoke-script parity (reference test/smoke_tests/*.sh compile+run):
        # execute an entry function from the CLI on both runtimes
        m = programs.build_allen_cahn_implicit_linear()
        p = tmp_path / "prog.ntir"
        p.write_text(print_module(m))
        uin = np.sin(np.linspace(0, np.pi, 16))
        np.save(tmp_path / "uin.npy", uin)
        np.save(tmp_path / "zero.npy", np.zeros(16))

        assert opt_main(
            [str(p), "--run", "entry", "--inputs",
             str(tmp_path / "zero.npy"), str(tmp_path / "uin.npy")]
        ) == 0
        out_jax = capsys.readouterr().out
        assert "output 0" in out_jax
        jax_checksum = [
            l for l in out_jax.splitlines() if "checksum=" in l
        ][0].split("checksum=")[1]

        import shutil

        if shutil.which("g++"):
            assert opt_main(
                [str(p), "--run", "entry", "--native", "--inputs",
                 str(tmp_path / "zero.npy"), str(tmp_path / "uin.npy")]
            ) == 0
            out_nat = capsys.readouterr().out
            nat_checksum = [
                l for l in out_nat.splitlines() if "checksum=" in l
            ][0].split("checksum=")[1]
            assert abs(float(jax_checksum) - float(nat_checksum)) < 1e-8

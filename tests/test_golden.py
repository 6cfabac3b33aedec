"""Golden-file IR tests — the FileCheck tier (`test/mlir_tests/` +
`check-neptune` target in the reference): pipeline stage dumps must match
checked-in golden files byte-for-byte. Regenerate intentionally with:

    python -c "import tests.test_golden as g; g.regenerate()"
"""

from pathlib import Path

import pytest

import programs
from neptune_tpu.passes import run_pipeline

GOLDEN = Path(__file__).parent / "golden"


def _dumps():
    pr = run_pipeline(programs.build_allen_cahn_implicit_linear())
    return {
        "allen_cahn_input.ntir": pr.dumps["input"],
        "allen_cahn_lowered.ntir": pr.dumps["high-level-convertion"],
    }


def regenerate():
    GOLDEN.mkdir(exist_ok=True)
    for name, text in _dumps().items():
        (GOLDEN / name).write_text(text)


@pytest.mark.parametrize("name", ["allen_cahn_input.ntir", "allen_cahn_lowered.ntir"])
def test_golden_dump(name):
    expected = (GOLDEN / name).read_text()
    actual = _dumps()[name]
    assert actual == expected, (
        f"IR dump for {name} changed; if intentional, regenerate goldens "
        "(see module docstring)"
    )


def test_golden_files_parse_and_execute():
    import numpy as np

    from neptune_tpu.ir.parser import parse_module
    from neptune_tpu.passes import compile_ir

    m = parse_module((GOLDEN / "allen_cahn_input.ntir").read_text())
    cm = compile_ir(m)
    uin = np.sin(np.linspace(0, np.pi, 16))
    out = np.asarray(cm.function("entry")(np.zeros(16), uin))
    oracle = programs.allen_cahn_implicit_linear_oracle(uin)
    np.testing.assert_allclose(out, oracle, atol=1e-10)

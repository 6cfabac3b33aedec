"""Reference-parity alias: `neptune.core` exposed `GlobalContext`/`get_compiler`
(`python_frontend/neptune/core.py`); user scripts do `import neptune.core` and
call `core.get_compiler().dump()`. Same surface here."""

from .frontend.core import (  # noqa: F401
    Context,
    GlobalContext,
    get_compiler,
    get_context,
    reset_context,
)

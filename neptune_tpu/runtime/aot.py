"""Native AOT compilation + loading.

Mirrors the reference's AOT cache pipeline (`python_frontend/neptune/
backend.py:11-93`): hash the generated source (the reference hashes the
dumped IR) → probe `~/.neptune_tpu/cache/` → compile with the system C++
compiler → link against the runtime library with an rpath → load via ctypes —
with the same 7-day atime-based eviction policy (`backend.py:77-87`).
Cache dir override: NEPTUNE_TPU_CACHE_DIR (reference: NEPTUNE_CACHE_DIR).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import time
from pathlib import Path

import numpy as np

from ..ir.core import Module
from ..ir.types import FieldType, ScalarType, TempType, TensorType
from .cgen import generate_cpp

_RUNTIME_SRC = Path(__file__).parent / "native" / "neptune_rt.cpp"


def _cache_dir() -> Path:
    env = os.environ.get("NEPTUNE_TPU_CACHE_DIR")
    d = Path(env) if env else Path.home() / ".neptune_tpu" / "cache"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _cleanup_old_cache(d: Path, max_age_days: int = 7):
    """7-day atime eviction (reference backend.py:77-87)."""
    try:
        now = time.time()
        cutoff = max_age_days * 24 * 3600
        for p in d.glob("neptune_*"):
            if now - p.stat().st_atime > cutoff:
                p.unlink()
    except Exception:
        pass


_CXX = os.environ.get("CXX", "g++")
_CXXFLAGS = ["-O3", "-march=native", "-fPIC", "-std=c++17", "-fopenmp"]


def _compile(src_path: Path, out_path: Path, extra: list[str] = []):
    cmd = [_CXX, *_CXXFLAGS, "-shared", "-o", str(out_path), str(src_path), *extra]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"native compile failed:\n{r.stderr[:4000]}")


def runtime_library() -> Path:
    """Build (or fetch from cache) libneptune_rt.so."""
    d = _cache_dir()
    src = _RUNTIME_SRC.read_text()
    h = hashlib.sha256(src.encode()).hexdigest()[:16]
    so = d / f"neptune_rt_{h}.so"
    if not so.exists():
        _compile(_RUNTIME_SRC, so)
    else:
        so.touch()  # keep the eviction policy from deleting a lib that
        # cached kernels still reference by absolute path
    return so


class NativeCompiledModule:
    """ctypes-backed executable view of a lowered module (the reference's
    `ctypes.CDLL` result, backend.py:74-75, with a NumPy-ABI wrapper)."""

    def __init__(self, module: Module, keep_source: bool = False):
        self.module = module
        d = _cache_dir()
        _cleanup_old_cache(d)
        src = generate_cpp(module)
        self.source = src if keep_source else None
        h = hashlib.sha256(src.encode()).hexdigest()[:16]
        so = d / f"neptune_kernel_{h}.so"
        # always resolve the runtime library: a cached kernel links to it by
        # absolute path, so it must exist (and stay atime-fresh) even on the
        # cache-hit path
        rt = runtime_library()
        if not so.exists():
            src_path = d / f"neptune_kernel_{h}.cpp"
            src_path.write_text(src)
            _compile(
                src_path,
                so,
                extra=[str(rt), f"-Wl,-rpath,{d}"],
            )
        else:
            so.touch()  # refresh atime for the eviction policy
        self._lib = ctypes.CDLL(str(so))
        self._fns: dict = {}

    def function(self, name: str):
        if name in self._fns:
            return self._fns[name]
        irfn = self.module.lookup(name)
        if irfn.kind != "func":
            raise KeyError(f"@{name} is not an exported function")
        cfn = getattr(self._lib, f"nt_{name}")
        cfn.restype = None
        cfn.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        arg_types = [a.type for a in irfn.body.args]
        term = irfn.body.terminator
        out_types = [o.type for o in term.operands] if term else []

        def run(*args):
            if len(args) != len(arg_types):
                raise TypeError(
                    f"@{name} expects {len(arg_types)} args, got {len(args)}"
                )
            holders = []  # keep ndarray refs alive through the call
            in_ptrs = (ctypes.c_void_p * max(len(args), 1))()
            for i, (a, t) in enumerate(zip(args, arg_types)):
                if isinstance(t, (TempType, FieldType, TensorType)):
                    # always copy: field args are mutable buffers in the
                    # generated code; caller arrays must stay untouched
                    arr = np.array(a, dtype=np.float64, order="C", copy=True)
                    want = t.bounds.shape if hasattr(t, "bounds") else t.shape
                    if arr.shape != tuple(want):
                        raise TypeError(
                            f"@{name} arg {i}: shape {arr.shape} != {tuple(want)}"
                        )
                elif isinstance(t, ScalarType):
                    arr = np.asarray([float(a)], dtype=np.float64)
                else:
                    raise TypeError(f"unsupported arg type {t}")
                holders.append(arr)
                in_ptrs[i] = arr.ctypes.data_as(ctypes.c_void_p)
            outs = []
            out_ptrs = (ctypes.c_void_p * max(len(out_types), 1))()
            for j, t in enumerate(out_types):
                # grid-typed results (temp OR field — cgen memcpys the full
                # extent for both) get full-shape buffers; a (1,) buffer for
                # a field result would be overflowed by the memcpy
                if isinstance(t, TensorType):
                    shape = t.shape
                elif hasattr(t, "bounds"):  # TempType / FieldType
                    shape = t.bounds.shape
                else:
                    shape = (1,)
                o = np.empty(shape, dtype=np.float64)
                outs.append(o)
                out_ptrs[j] = o.ctypes.data_as(ctypes.c_void_p)
            cfn(in_ptrs, out_ptrs)
            if not out_types:
                return None
            res = [
                o if not isinstance(t, ScalarType) else float(o[0])
                for o, t in zip(outs, out_types)
            ]
            return res[0] if len(res) == 1 else tuple(res)

        run.__name__ = f"native_{name}"
        self._fns[name] = run
        return run


def compile_native(module: Module, **kw) -> NativeCompiledModule:
    """Lower (pipeline) + compile a module for the native host runtime."""
    from ..passes import run_pipeline

    pr = run_pipeline(module, collect_dumps=False)
    return NativeCompiledModule(pr.module, **kw)

"""Build + load the ACTUAL reference CPU extension as a cross-validation oracle.

VERDICT.md (round 1) item #1: all three in-repo backward oracles (golden jnp,
Pallas, native C++) share one author and could share one misreading of the
reference math.  This module compiles the reference's own CPU kernels —
/root/reference/torchlsq/csrc/ops/lsq.cpp (op schemas + composite routing) and
/root/reference/torchlsq/csrc/ops/cpu/lsq_cpu.cpp (TensorIterator forward +
fused 3-output backward, lsq_cpu.cpp:31-294) — into a loadable torch extension
so tests can call ``torch.ops.torchlsq.lsq_{forward,backward}_per_{tensor,channel}``
and compare bit-for-bit against jaxlsq's golden path.

Build notes (why this is a *staged* build, not an in-place one):

- ``/root/reference`` is read-only, so sources are staged into a scratch build
  directory (gitignored, never committed).
- torch 2.13 deleted the rvalue overload ``TensorIteratorConfig::add_input(TensorBase&&)``
  that torch 1.8 (the reference's target, setup.py:40 ``TORCH18``) still allowed.
  The staged copy applies ONE mechanical substitution —
  ``.add_input(torch::_unsafe_view(`` → ``.add_owned_input(torch::_unsafe_view(``
  (the modern spelling of exactly the same semantics: the iterator takes
  ownership of the temporary view).  Nothing else is modified; the point of the
  oracle is to run the reference's math untouched.
- Only the schema fragment + CPU impls are compiled.  The autograd glue
  (lsq_autograd.cpp) uses ``at::AutoNonVariableTypeMode``, removed in torch 2.x,
  and is unnecessary: the backward is registered as its own dispatcher op
  (lsq_cpu.cpp:296-309), callable directly.
"""

from __future__ import annotations

import hashlib
import pathlib
import shutil

REFERENCE_CSRC = pathlib.Path("/root/reference/torchlsq/csrc")
BUILD_ROOT = pathlib.Path(__file__).resolve().parent.parent / ".ref_oracle_build"

_SOURCES = [
    REFERENCE_CSRC / "ops" / "lsq.cpp",
    REFERENCE_CSRC / "ops" / "cpu" / "lsq_cpu.cpp",
]

# The single torch-2.x compatibility substitution (see module docstring).
_PATCH = (".add_input(torch::_unsafe_view(", ".add_owned_input(torch::_unsafe_view(")

_loaded = None


def _stage_sources(stage_dir: pathlib.Path) -> list[str]:
    """Copy reference sources + headers into stage_dir, applying _PATCH."""
    stage_dir.mkdir(parents=True, exist_ok=True)
    # Headers are included relative to csrc/ ("../global_scope.h",
    # "../kernels/lsq_kernel.h"), so mirror the layout.
    for rel in [
        "ops/lsq.h",
        "ops/ops.h",
        "ops/global_scope.h",
        "ops/kernels/lsq_kernel.h",
        "macros.h",
    ]:
        src = REFERENCE_CSRC / rel
        dst = stage_dir / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src, dst)
    out = []
    for src in _SOURCES:
        rel = src.relative_to(REFERENCE_CSRC)
        dst = stage_dir / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        text = src.read_text()
        text = text.replace(*_PATCH)
        dst.write_text(text)
        out.append(str(dst))
    return out


def _source_digest() -> str:
    h = hashlib.sha256()
    for src in sorted(REFERENCE_CSRC.rglob("*")):
        if src.is_file() and src.suffix in (".cpp", ".h"):
            h.update(src.read_bytes())
    import torch

    h.update(torch.__version__.encode())
    return h.hexdigest()[:16]


def load_reference_ops():
    """Compile (cached) and load the reference CPU ops.

    Returns the ``torch.ops.torchlsq`` namespace with
    lsq_forward_per_tensor / lsq_backward_per_tensor /
    lsq_forward_per_channel / lsq_backward_per_channel registered.
    Raises on build failure — callers should pytest.skip on exception if the
    toolchain is unavailable.
    """
    global _loaded
    if _loaded is not None:
        return _loaded
    import torch
    from torch.utils.cpp_extension import load

    build_dir = BUILD_ROOT / _source_digest()
    stage_dir = build_dir / "staged"
    sources = _stage_sources(stage_dir)
    build_dir.mkdir(parents=True, exist_ok=True)
    load(
        name="torchlsq_ref_oracle",
        sources=sources,
        extra_include_paths=[str(stage_dir)],
        extra_cflags=[
            "-std=c++17",
            "-O2",
            "-DTORCH18",
            "-Wno-unused-variable",
            "-Wno-sign-compare",
            "-Wno-unknown-pragmas",
        ],
        build_directory=str(build_dir),
        verbose=False,
        is_python_module=False,  # just registers the dispatcher ops
    )
    _loaded = torch.ops.torchlsq
    return _loaded

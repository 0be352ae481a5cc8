"""TPU serving-path compiler options.

XLA:TPU's default scoped-VMEM budget (the window the scheduler may use to
stage fusion operands/results on-chip) leaves the v5e inference program's
convolutions stalling on HBM: raising it to 45 MiB measured **+8.7%
end-to-end** on the bs=512 flagship step (103.6 ms vs 115.3; sweep in
patches/s: 32M→4667 · 40→4607 · 43→4910 · 45→4942+4941 (twice) ·
46→4883 · 48→4784 · 52→4852 · 64→4756 · 96→4615 — too large crowds out
conv double-buffering, too small starves operand prefetch).

These options ride per-compile (``jitted.lower(...).compile(...)``), NOT
``XLA_FLAGS`` — TPU-only flag names crash non-TPU local XLA parsing, and
the axon relay forwards proto-backed per-compile options to the remote
compiler.  :func:`compile_serving` falls back to the plain jit path on
backends that reject the options (CPU tests, older libtpu).
"""

from __future__ import annotations

from typing import Any, Mapping

SERVING_COMPILER_OPTIONS: Mapping[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "46080",
}

# The training program prefers a larger window (bs=256 sweep:
# 32M→1,126 · 45M→1,135 · 64M→1,148 patches/s) — the backward pass's
# bigger fusions benefit from more operand staging.
TRAIN_COMPILER_OPTIONS: Mapping[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
}


def compile_serving(jitted: Any, *example_args: Any,
                    options: Mapping[str, str] | None = None) -> Any:
    """AOT-compile ``jitted`` with the serving compiler options; returns
    the compiled executable (callable).  Falls back to ``jitted`` itself
    if the backend rejects the options."""
    opts = dict(options or SERVING_COMPILER_OPTIONS)
    try:
        return jitted.lower(*example_args).compile(compiler_options=opts)
    except Exception:
        return jitted


class LazyCompiled:
    """Wrap a jitted function so its FIRST call AOT-compiles with the
    given compiler options (shapes only known at call time — e.g. the
    Trainer's per-batch step).  Any failure — options rejected (CPU),
    layout mismatch, a second distinct arg signature — falls back to the
    plain jitted callable permanently for safety."""

    def __init__(self, jitted: Any,
                 options: Mapping[str, str] | None = None) -> None:
        self._jitted = jitted
        self._options = dict(options or SERVING_COMPILER_OPTIONS)
        self._compiled: Any = None
        self._fallback = False

    def __call__(self, *args: Any):
        if self._fallback:
            return self._jitted(*args)
        if self._compiled is None:
            try:
                self._compiled = self._jitted.lower(*args).compile(
                    compiler_options=self._options)
            except Exception:
                self._fallback = True
                return self._jitted(*args)
        try:
            return self._compiled(*args)
        except Exception:
            # e.g. a different batch shape than the compiled signature
            self._fallback = True
            return self._jitted(*args)

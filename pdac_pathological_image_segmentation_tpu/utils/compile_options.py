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
    # round-3 probe sweep (BASELINE.md): the bundle-aware fusion cost model
    # crossed the north star, and it MOVES the scoped-vmem optimum — the
    # old 45 MiB sweet spot becomes 64 MiB under the new model
    # (bundle-aware sweep: 42M→4,867 · 45M→5,012 · 48M→4,977 ·
    # 64M→5,120 patches/s; without it 45M→4,942 was the peak.  Rejected
    # from the same sweep: memory-bound-loop optimizer 4,899,
    # conv-input-fusion-off 3,456, same-offset-scoped-vmem-off 4,946,
    # licm-inflation-2.0 4,936, dot-strength-reduction-off 4,935)
    "xla_tpu_scoped_vmem_limit_kib": "65536",
    "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true",
}

# The training program prefers a larger window (bs=256 sweep:
# 32M→1,126 · 45M→1,135 · 64M→1,148 patches/s) — the backward pass's
# bigger fusions benefit from more operand staging.  (The bundle-aware
# cost model that wins serving LOSES 4–10% on the train program —
# round-3 sweep in BASELINE.md — so it is deliberately absent here.)
TRAIN_COMPILER_OPTIONS: Mapping[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
}

# The int8 program's optimum is higher still: the quantized convs stage
# int8 operands (half the bf16 footprint), so a bigger window buys more
# prefetch before crowding out double-buffering (round-3 retune under
# the bundle-aware model, bs=256: 45M→5,432 · 64M→5,619·5,866@depth16 ·
# 80M@depth16→5,914 patches/s; bs=512 and depth-32 OOM on in-flight
# outputs — BASELINE.md int8 retune table).
INT8_COMPILER_OPTIONS: Mapping[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "81920",
    "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true",
}


def compile_serving(jitted: Any, *example_args: Any,
                    options: Mapping[str, str] | None = None) -> Any:
    """AOT-compile ``jitted`` with the serving compiler options; returns
    the compiled executable (callable).  Falls back to ``jitted`` itself
    if the backend rejects the options.  ``None`` means the default
    serving options; an explicit empty dict means *no* options (so sweep
    baselines aren't silently measured under the defaults)."""
    opts = dict(SERVING_COMPILER_OPTIONS if options is None else options)
    try:
        return jitted.lower(*example_args).compile(compiler_options=opts)
    except Exception:
        return jitted


class LazyCompiled:
    """Wrap a jitted function so its FIRST call AOT-compiles with the
    given compiler options (shapes only known at call time — e.g. the
    Trainer's per-batch step).  Compile failure (options rejected on CPU,
    older libtpu) or a signature/shape mismatch on execution falls back to
    the plain jitted callable permanently, with a one-time warning naming
    the cause.  Genuine runtime errors on the execute path (anything other
    than ``TypeError``/``ValueError``) propagate — silently retrying them
    on the jit path would mask real failures and, with donated arguments,
    could re-use already-donated buffers."""

    def __init__(self, jitted: Any,
                 options: Mapping[str, str] | None = None) -> None:
        self._jitted = jitted
        self._options = dict(
            SERVING_COMPILER_OPTIONS if options is None else options)
        self._compiled: Any = None
        self._fallback = False

    def _fall_back(self, stage: str, exc: Exception) -> None:
        import warnings

        self._fallback = True
        warnings.warn(
            f"LazyCompiled: falling back to plain jit after {stage} error: "
            f"{type(exc).__name__}: {exc}", RuntimeWarning, stacklevel=3)

    def __call__(self, *args: Any):
        if self._fallback:
            return self._jitted(*args)
        if self._compiled is None:
            try:
                self._compiled = self._jitted.lower(*args).compile(
                    compiler_options=self._options)
            except Exception as exc:  # options rejected by this backend
                self._fall_back("compile", exc)
                return self._jitted(*args)
        try:
            return self._compiled(*args)
        except (TypeError, ValueError) as exc:
            # a different arg signature/shape than the compiled executable
            self._fall_back("execute", exc)
            return self._jitted(*args)

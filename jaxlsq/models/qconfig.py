"""QConfig: per-layer quantizer configuration mapping.

The TPU-native replacement for the reference's reliance on
``torch.quantization.QConfig(activation=…, weight=…)`` factories built with the
pickle-safe ``with_args`` partial machinery (observers.py:38-66, README.md:103-126).
Here a QConfig is a plain frozen dataclass pairing two ``LSQQuantizer`` templates;
layers specialize the per-channel axis for their kernel layout with
``for_kernel_axis`` — no introspection magic (SURVEY.md §5 "Config / flag system").

This also fixes, by construction, the reference's ``partial`` NameError
(observers.py:64 uses an unimported ``functools.partial``) — there is no partial
factory to import.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..core.spec import QuantSpec
from ..observers.quantizer import LSQQuantizer

__all__ = ["QConfig", "default_qconfig"]


@dataclasses.dataclass(frozen=True)
class QConfig:
    """Pair of quantizer templates: ``weight`` and ``activation``.

    Either may be None (that side is not quantized).  Axis fields inside the
    templates are placeholders; layers call :meth:`weight_for_axis` with their
    kernel's output-channel axis.

    ``mode`` selects how QuantDense/QuantConv execute:
      * 'qat'   — fake-quant training path (default);
      * 'serve' — frozen inference on weights packed by
        ``jaxlsq.serve.convert`` (weight-only INT8/INT4 matmul with fused
        dequant epilogue).  ``act_mode`` then picks the activation handling:
        'none' (weight-only), 'static' (frozen fake-quant with the converted
        act qparams), or 'dynamic' (per-tensor dynamic int8×int8 matmul).
    """

    weight: Optional[LSQQuantizer] = None
    activation: Optional[LSQQuantizer] = None
    mode: str = "qat"
    act_mode: str = "none"
    serve_impl: str = "auto"
    # MXU precision for the serving matmuls: None = fast single-pass bf16
    # (int8 weights are bf16-exact; only activations round, ~2^-9 rel);
    # 'highest' = f32-exact 3-pass, for parity checks / f32-sensitive heads.
    serve_precision: Optional[str] = None
    # MIXED PRECISION: (pattern, QConfig) pairs — a layer whose module path
    # ('/'-joined, e.g. 'blocks_0/mlp_up') CONTAINS a pattern uses that
    # entry's weight/activation quantizers instead (first match wins).  Use
    # `with_overrides({...})`; layers and `convert()` call `resolve(path)`.
    # Execution-mode fields (mode/act_mode/serve_*) always come from the
    # ROOT config, so `for_serving(...)` applies to every override at once.
    overrides: tuple = ()

    def for_serving(self, act_mode: str = "none", impl: str = "auto",
                    precision: Optional[str] = None) -> "QConfig":
        """The serving twin of this config (same specs, serve-mode layers) —
        apply the SAME model class with this config and the variables from
        ``jaxlsq.serve.convert``.

        For TP-sharded serving under jit (``shard_converted``), pass
        ``impl='xla'``: a pallas_call has no SPMD partitioning rule, so the
        'auto' Pallas pick would make XLA all-gather the N-sharded weight
        (auto self-corrects only for concrete, already-committed arrays)."""
        if act_mode not in ("none", "static", "static_int8", "dynamic"):
            raise ValueError(f"unknown act_mode {act_mode!r}")
        return dataclasses.replace(self, mode="serve", act_mode=act_mode,
                                   serve_impl=impl, serve_precision=precision)

    def with_overrides(self, mapping) -> "QConfig":
        """Mixed-precision config: ``mapping`` is ``{path_pattern: QConfig}``
        (e.g. ``{"head": default_qconfig(8, 8), "blocks": default_qconfig(4, 8)}``
        to keep a sensitive head at 8 bit — the decision the sensitivity
        report informs).  Patterns match as substrings of the '/'-joined
        module path; FIRST match wins; unmatched layers use this config."""
        pairs = tuple((str(k), v) for k, v in mapping.items())
        for _, qc in pairs:
            if not isinstance(qc, QConfig):
                raise ValueError("override values must be QConfig instances")
        return dataclasses.replace(self, overrides=pairs)

    def resolve(self, path) -> "QConfig":
        """The effective config for a module at ``path`` (tuple of names or
        a string): the first matching override's quantizers under THIS
        config's execution mode.  No overrides → self (zero cost)."""
        if not self.overrides:
            return self
        joined = path if isinstance(path, str) else "/".join(str(p)
                                                             for p in path)
        for pattern, qc in self.overrides:
            if pattern in joined:
                return dataclasses.replace(
                    qc, mode=self.mode, act_mode=self.act_mode,
                    serve_impl=self.serve_impl,
                    serve_precision=self.serve_precision, overrides=())
        return dataclasses.replace(self, overrides=())

    def required_weight_for_axis(self, axis: int) -> LSQQuantizer:
        """weight_for_axis that raises the canonical serve-mode error when
        the config carries no weight quantizer (nothing packed to serve)."""
        wcfg = self.weight_for_axis(axis)
        if wcfg is None:
            raise ValueError(
                "serve mode requires a weight quantizer; qconfig.weight is "
                "None (weight-unquantized layers have no packed kernel/table)")
        return wcfg

    def weight_for_axis(self, axis: int) -> Optional[LSQQuantizer]:
        if self.weight is None:
            return None
        if not self.weight.spec.per_channel:
            return self.weight
        return dataclasses.replace(
            self.weight, spec=self.weight.spec.replace(axis=axis))

    def activation_for_axis(self, axis: int) -> Optional[LSQQuantizer]:
        if self.activation is None:
            return None
        if not self.activation.spec.per_channel:
            return self.activation
        return dataclasses.replace(
            self.activation, spec=self.activation.spec.replace(axis=axis))


def default_qconfig(
    weight_bits: int = 8,
    act_bits: int = 8,
    *,
    per_channel_weights: bool = False,
    init_batches: int = 1000,
    init_mode: str = "observer",
    act_observer: str = "minmax",
    reduce_range: bool = True,
    learn_params: bool = True,
    impl: str = "auto",
) -> QConfig:
    """The reference README's recommended setup (README.md:103-126): qint8-style
    symmetric weights + quint8-style affine activations, optionally range-
    narrowed by one bit (``avoid_torch_overflow``), observer- or learnable-init
    activations over ``init_batches``.

    ``act_observer``: 'minmax' (reference-recommended MovingAverageMinMax,
    README.md:109-110), 'mse' (MSE-minimizing range search), 'histogram'
    (torch.ao's default static-quant observer: running histogram +
    NormMinimization range search), or 'percentile' (TensorRT-style
    99.99th-percentile range — clips 1-in-10⁴ outliers)."""
    wq = LSQQuantizer(
        spec=QuantSpec.weight_default(
            weight_bits, per_channel=per_channel_weights, axis=0,
            reduce_range=reduce_range),
        otype="weight",
        learn_params=learn_params,
        impl=impl,
    )
    aspec = QuantSpec.activation_default(act_bits, reduce_range=reduce_range)
    obs = None
    if act_observer == "mse":
        from ..observers import MSEObserver

        obs = MSEObserver(spec=aspec, per_channel=aspec.per_channel,
                          axis=aspec.axis)
    elif act_observer == "histogram":
        from ..observers import HistogramObserver

        obs = HistogramObserver()
    elif act_observer == "percentile":
        from ..observers import PercentileObserver

        obs = PercentileObserver(per_channel=aspec.per_channel,
                                 axis=aspec.axis)
    elif act_observer != "minmax":
        raise ValueError(f"unknown act_observer {act_observer!r}")
    aq = LSQQuantizer(
        spec=aspec,
        otype="activation",
        init_mode=init_mode,
        n_batches=init_batches,
        observer=obs,
        learn_params=learn_params,
        impl=impl,
    )
    return QConfig(weight=wq, activation=aq)

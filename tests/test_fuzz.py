"""Seeded fuzz: random (spec, shape, mode) configurations, ALL FOUR compute
oracles on the SAME draws (VERDICT r2 next-#6):

  1. golden jnp   (jaxlsq/core/golden.py — the numeric contract),
  2. Pallas       (interpret mode on CPU; the TPU kernels' exact program),
  3. native C++   (jaxlsq/native/lsq_ref.cpp via ctypes),
  4. the COMPILED REFERENCE CPU kernels (tests/_reference_oracle.py —
     an oracle jaxlsq's author did not write).

Broad-spectrum agreement evidence on top of the targeted kernel tests —
shapes include odd/unaligned/1-D/5-D, specs include sub-8-bit ranges,
narrowed carriers, and asymmetric ranges.  The reference-oracle comparison
keeps the documented-deviation exclusions of test_reference_oracle.py: the
CPU kernels dispatch f32/f64 only and use local numel, both of which match
golden's defaults here, and the two CUDA-only bugs can't appear in a CPU
build.

Comparison contract (same as test_reference_oracle.py): forward and dX are
elementwise → bit-for-bit in f32; dS/dB are full reductions whose summation
order legitimately differs per oracle → magnitude-scaled tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxlsq import QuantSpec
from jaxlsq.core.golden import golden_backward, golden_forward
from jaxlsq.ops.pallas_kernels import pallas_backward, pallas_forward

N_CASES = 40


def _random_case(r):
    bits = int(r.choice([2, 3, 4, 6, 8]))
    signed = bool(r.rand() < 0.5)
    symmetric = bool(r.rand() < 0.5)
    narrow = bits - 1 if (bits > 2 and r.rand() < 0.3) else None
    ndim = int(r.randint(1, 5))
    shape = tuple(int(r.randint(1, 13)) for _ in range(ndim))
    if r.rand() < 0.3:  # sometimes lane-aligned shapes (the fast path)
        shape = shape[:-1] + (int(r.choice([128, 256])),)
    per_channel = bool(r.rand() < 0.5) and ndim >= 2
    axis = int(r.randint(0, ndim)) if per_channel else 1
    spec = QuantSpec.make(bits, signed=signed, symmetric=symmetric,
                          per_channel=per_channel, axis=axis,
                          narrow_to_bits=narrow,
                          use_grad_scaling=bool(r.rand() < 0.8),
                          grad_scaler=float(r.choice([1.0, 0.5, 2.0])))
    eval_mode = bool(r.rand() < 0.25)
    init_mode = (not eval_mode) and bool(r.rand() < 0.25)
    return spec, shape, eval_mode, init_mode


def _draw(seed):
    r = np.random.RandomState(seed)
    spec, shape, eval_mode, init_mode = _random_case(r)
    x = 3.0 * r.randn(*shape).astype(np.float32)
    g = r.randn(*shape).astype(np.float32)
    c = shape[spec.axis] if spec.per_channel else 1
    scale = (0.02 + 0.2 * r.rand(c)).astype(np.float32)
    shift = (np.zeros(c, np.float32) if spec.symmetric
             else (0.1 * r.randn(c)).astype(np.float32))
    return spec, shape, eval_mode, init_mode, x, g, scale, shift


def _reduction_tol(ref):
    """Different accumulation orders (tile partials vs tree-sum vs serial):
    tolerance scales with the largest gradient magnitude
    (cancellation-safe)."""
    return dict(rtol=1e-4, atol=1e-5 * max(1.0, float(np.max(np.abs(ref)))))


def _ref_oracle_eval(ops, torch, spec, eval_mode, init_mode, x, g, scale,
                     shift):
    """Run the compiled reference CPU dispatcher ops on one draw."""
    t = lambda a: torch.from_numpy(np.asarray(a))
    common = (spec.quant_min, spec.quant_max, spec.type_min, spec.type_max,
              spec.use_grad_scaling, spec.grad_scaler, spec.symmetric,
              eval_mode, init_mode)
    if spec.per_channel:
        f = ops.lsq_forward_per_channel(t(x), t(scale), t(shift),
                                        spec.axis, *common).numpy()
        b = ops.lsq_backward_per_channel(t(g), t(x), t(scale), t(shift),
                                         spec.axis, *common)
    else:
        f = ops.lsq_forward_per_tensor(t(x), t(scale), t(shift),
                                       *common).numpy()
        b = ops.lsq_backward_per_tensor(t(g), t(x), t(scale), t(shift),
                                        *common)
    return f, tuple(a.numpy() for a in b)


@pytest.mark.parametrize("case", range(N_CASES))
def test_fuzz_all_oracles_same_draw(case):
    """golden == Pallas == native C++ == compiled reference, per draw."""
    spec, shape, eval_mode, init_mode, x, g, scale, shift = _draw(1000 + case)
    xj, gj = jnp.asarray(x), jnp.asarray(g)
    sj, bj = jnp.asarray(scale), jnp.asarray(shift)

    # oracle 1: golden (the contract all others are judged against)
    want_f = np.asarray(golden_forward(xj, sj, bj, spec, init_mode=init_mode))
    dXw, dSw, dBw = (np.asarray(a) for a in golden_backward(
        gj, xj, sj, bj, spec, eval_mode=eval_mode, init_mode=init_mode))

    # oracle 2: Pallas (interpret mode = the TPU kernels' exact program)
    got_f = pallas_forward(xj, sj, bj, spec=spec, init_mode=init_mode)
    np.testing.assert_array_equal(np.asarray(got_f), want_f,
                                  err_msg=f"pallas fwd {spec} {shape}")
    dX, dS, dB = pallas_backward(gj, xj, sj, bj, spec=spec,
                                 eval_mode=eval_mode, init_mode=init_mode)
    np.testing.assert_array_equal(np.asarray(dX), dXw,
                                  err_msg=f"pallas dX {spec} {shape}")
    np.testing.assert_allclose(np.asarray(dS), dSw, **_reduction_tol(dSw),
                               err_msg=f"pallas dS {spec} {shape}")
    np.testing.assert_allclose(np.asarray(dB), dBw, **_reduction_tol(dBw),
                               err_msg=f"pallas dB {spec} {shape}")

    # oracle 3: native C++ reference library
    from jaxlsq.native import is_available, native_backward, native_forward
    if is_available():
        nf = native_forward(x, scale, shift, spec, init_mode=init_mode)
        np.testing.assert_array_equal(nf, want_f,
                                      err_msg=f"native fwd {spec} {shape}")
        ndX, ndS, ndB = native_backward(g, x, scale, shift, spec,
                                        eval_mode=eval_mode,
                                        init_mode=init_mode)
        np.testing.assert_array_equal(ndX, dXw,
                                      err_msg=f"native dX {spec} {shape}")
        np.testing.assert_allclose(ndS.reshape(-1), dSw.reshape(-1),
                                   **_reduction_tol(dSw),
                                   err_msg=f"native dS {spec} {shape}")
        np.testing.assert_allclose(ndB.reshape(-1), dBw.reshape(-1),
                                   **_reduction_tol(dBw),
                                   err_msg=f"native dB {spec} {shape}")

    # oracle 4: the compiled reference itself
    torch = pytest.importorskip("torch")
    from _reference_oracle import load_reference_ops

    try:
        ops = load_reference_ops()
    except Exception as e:
        pytest.skip(f"reference oracle build unavailable: {e}")
    rf, (rdX, rdS, rdB) = _ref_oracle_eval(ops, torch, spec, eval_mode,
                                           init_mode, x, g, scale, shift)
    np.testing.assert_array_equal(want_f, rf, err_msg=f"ref fwd {spec} {shape}")
    np.testing.assert_array_equal(dXw, rdX, err_msg=f"ref dX {spec} {shape}")
    np.testing.assert_allclose(dSw.reshape(-1), rdS.reshape(-1),
                               rtol=3e-5, atol=1e-6,
                               err_msg=f"ref dS {spec} {shape}")
    np.testing.assert_allclose(dBw.reshape(-1), rdB.reshape(-1),
                               rtol=3e-5, atol=1e-6,
                               err_msg=f"ref dB {spec} {shape}")

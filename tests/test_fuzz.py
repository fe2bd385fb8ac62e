"""Seeded fuzz: random (spec, shape, mode) configurations, Pallas (interpret)
vs golden jnp, forward and backward.  Broad-spectrum agreement evidence on
top of the targeted kernel tests — shapes include odd/unaligned/1-D/5-D,
specs include sub-8-bit ranges, narrowed carriers, and asymmetric ranges.
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


@pytest.mark.parametrize("case", range(N_CASES))
def test_fuzz_pallas_vs_golden(case):
    r = np.random.RandomState(1000 + case)
    spec, shape, eval_mode, init_mode = _random_case(r)
    x = jnp.asarray(3.0 * r.randn(*shape).astype(np.float32))
    g = jnp.asarray(r.randn(*shape).astype(np.float32))
    c = shape[spec.axis] if spec.per_channel else 1
    scale = jnp.asarray((0.02 + 0.2 * r.rand(c)).astype(np.float32))
    shift = (jnp.zeros((c,), jnp.float32) if spec.symmetric
             else jnp.asarray(0.1 * r.randn(c).astype(np.float32)))

    want = golden_forward(x, scale, shift, spec, init_mode=init_mode)
    got = pallas_forward(x, scale, shift, spec=spec, init_mode=init_mode)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                  err_msg=f"fwd {spec} {shape}")

    dXw, dSw, dBw = golden_backward(g, x, scale, shift, spec,
                                    eval_mode=eval_mode, init_mode=init_mode)
    dX, dS, dB = pallas_backward(g, x, scale, shift, spec=spec,
                                 eval_mode=eval_mode, init_mode=init_mode)
    np.testing.assert_array_equal(np.asarray(dX), np.asarray(dXw),
                                  err_msg=f"dX {spec} {shape}")
    # different accumulation orders (tile partials vs tree-sum): tolerance
    # scales with the largest gradient magnitude (cancellation-safe)
    def tol(ref):
        return dict(rtol=1e-4,
                    atol=1e-5 * max(1.0, float(np.max(np.abs(ref)))))

    np.testing.assert_allclose(np.asarray(dS), np.asarray(dSw),
                               err_msg=f"dS {spec} {shape}", **tol(dSw))
    np.testing.assert_allclose(np.asarray(dB), np.asarray(dBw),
                               err_msg=f"dB {spec} {shape}", **tol(dBw))


@pytest.mark.parametrize("case", range(N_CASES))
def test_fuzz_golden_vs_compiled_reference(case):
    """Same random configurations, but judged against the COMPILED reference
    CPU kernels (oracle #4, tests/_reference_oracle.py) — random-config
    assurance on top of test_reference_oracle.py's fixed grid."""
    torch = pytest.importorskip("torch")
    from _reference_oracle import load_reference_ops

    try:
        ops = load_reference_ops()
    except Exception as e:
        pytest.skip(f"reference oracle build unavailable: {e}")

    r = np.random.RandomState(3000 + case)
    spec, shape, eval_mode, init_mode = _random_case(r)
    x = 3.0 * r.randn(*shape).astype(np.float32)
    g = r.randn(*shape).astype(np.float32)
    c = shape[spec.axis] if spec.per_channel else 1
    scale = (0.02 + 0.2 * r.rand(c)).astype(np.float32)
    shift = (np.zeros(c, np.float32) if spec.symmetric
             else (0.1 * r.randn(c)).astype(np.float32))

    t = lambda a: torch.from_numpy(np.asarray(a))
    common = (spec.quant_min, spec.quant_max, spec.type_min, spec.type_max,
              spec.use_grad_scaling, spec.grad_scaler, spec.symmetric,
              eval_mode, init_mode)
    if spec.per_channel:
        ref_f = ops.lsq_forward_per_channel(t(x), t(scale), t(shift),
                                            spec.axis, *common).numpy()
        ref_b = ops.lsq_backward_per_channel(t(g), t(x), t(scale), t(shift),
                                             spec.axis, *common)
    else:
        ref_f = ops.lsq_forward_per_tensor(t(x), t(scale), t(shift),
                                           *common).numpy()
        ref_b = ops.lsq_backward_per_tensor(t(g), t(x), t(scale), t(shift),
                                            *common)
    ref_dx, ref_ds, ref_db = (a.numpy() for a in ref_b)

    got_f = golden_forward(jnp.asarray(x), jnp.asarray(scale),
                           jnp.asarray(shift), spec, init_mode=init_mode)
    np.testing.assert_array_equal(np.asarray(got_f), ref_f,
                                  err_msg=f"fwd {spec} {shape}")
    dX, dS, dB = golden_backward(jnp.asarray(g), jnp.asarray(x),
                                 jnp.asarray(scale), jnp.asarray(shift), spec,
                                 eval_mode=eval_mode, init_mode=init_mode)
    np.testing.assert_array_equal(np.asarray(dX), ref_dx,
                                  err_msg=f"dX {spec} {shape}")
    np.testing.assert_allclose(np.asarray(dS).reshape(-1), ref_ds.reshape(-1),
                               rtol=3e-5, atol=1e-6,
                               err_msg=f"dS {spec} {shape}")
    np.testing.assert_allclose(np.asarray(dB).reshape(-1), ref_db.reshape(-1),
                               rtol=3e-5, atol=1e-6,
                               err_msg=f"dB {spec} {shape}")

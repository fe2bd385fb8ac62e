"""Tests for the traced-mode-flag path (fake_quant_traced): one compiled
program must reproduce all static mode combinations as the flags vary, with no
retracing across phase flips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq import QuantSpec, fake_quant, fake_quant_traced
from jaxlsq.core import golden_backward, golden_forward
from jaxlsq.ops import pallas_kernels as pk

SPECS = [
    QuantSpec(quant_min=0, quant_max=255),
    QuantSpec(quant_min=-128, quant_max=127, symmetric=True),
    QuantSpec(quant_min=0, quant_max=255, per_channel=True, axis=1),
    QuantSpec(quant_min=-64, quant_max=63, type_min=-128, type_max=127,
              symmetric=True, per_channel=True, axis=0),
]


def _inputs(spec, shape=(16, 24), seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    c = shape[spec.axis] if spec.per_channel else 1
    scale = jnp.asarray(0.05 + 0.1 * rng.rand(c).astype(np.float32))
    shift = jnp.asarray(
        np.zeros(c, np.float32) if spec.symmetric
        else 0.1 * rng.randn(c).astype(np.float32))
    g = jnp.asarray(rng.randn(*shape).astype(np.float32))
    return x, scale, shift, g


@pytest.mark.parametrize("spec", SPECS)
@pytest.mark.parametrize("ev,ini", [(0, 0), (1, 0), (0, 1), (1, 1)])
@pytest.mark.parametrize("impl", ["reference", "pallas"])
def test_traced_matches_static(spec, ev, ini, impl):
    x, scale, shift, g = _inputs(spec)
    evf = jnp.float32(ev)
    inif = jnp.float32(ini)

    out_t, vjp_t = jax.vjp(
        lambda a, s, b: fake_quant_traced(a, s, b, spec, eval_flag=evf,
                                          init_flag=inif, impl=impl),
        x, scale, shift)
    dX_t, dS_t, dB_t = vjp_t(g)

    out_s = golden_forward(x, scale, shift, spec, init_mode=bool(ini))
    dX_s, dS_s, dB_s = golden_backward(
        g, x, scale, shift, spec, eval_mode=bool(ev), init_mode=bool(ini))

    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dX_t), np.asarray(dX_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dS_t), np.asarray(dS_s),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dB_t), np.asarray(dB_s),
                               rtol=2e-5, atol=1e-6)


def test_single_program_covers_phase_schedule():
    """One jitted step function handles observer-window → full-LSQ flips via
    flag values only — verify no retrace by counting trace events."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    x, scale, shift, _ = _inputs(spec)
    traces = []

    @jax.jit
    def step(x, s, b, ev, ini):
        traces.append(1)
        out = fake_quant_traced(x, s, b, spec, eval_flag=ev, init_flag=ini)
        return jnp.sum(out)

    for ev, ini in [(1.0, 0.0), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0)]:
        step(x, scale, shift, jnp.float32(ev), jnp.float32(ini))
    assert len(traces) == 1, f"retraced {len(traces)} times; want 1"


def test_traced_grads_flow_through_flags_as_zero():
    spec = QuantSpec(quant_min=0, quant_max=255)
    x, scale, shift, _ = _inputs(spec)

    def f(ev):
        return jnp.sum(fake_quant_traced(x, scale, shift, spec,
                                         eval_flag=ev, init_flag=0.0))

    g = jax.grad(f)(jnp.float32(0.0))
    assert float(g) == 0.0


def test_expensive_observer_update_is_cond_gated():
    """VERDICT r1 #4: the MSE observer's 64-candidate grid search must sit
    behind lax.cond in the traced program (post-window steps pay nothing),
    while cheap min/max observers stay fused (no cond)."""
    from jaxlsq.observers import LSQQuantizer, MSEObserver

    def prims(q):
        state = q.init(jnp.zeros((4, 8)))

        def f(state, x):
            return q(state, x, training=True)

        jaxpr = jax.make_jaxpr(f)(state, jnp.zeros((4, 8)))
        names = set()

        def walk(jx):
            for eqn in jx.eqns:
                names.add(eqn.primitive.name)
                for p in eqn.params.values():
                    if hasattr(p, "jaxpr"):
                        walk(p.jaxpr)
        walk(jaxpr.jaxpr)
        return names

    spec = QuantSpec.activation_default(8)
    q_mse = LSQQuantizer(spec=spec, n_batches=2,
                         observer=MSEObserver(spec=spec))
    assert "cond" in prims(q_mse)
    q_minmax = LSQQuantizer(spec=spec, n_batches=2)
    assert "cond" not in prims(q_minmax)

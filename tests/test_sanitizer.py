"""The framework's "sanitizer" pass (SURVEY.md §5 "Race detection"): the same
code paths under ``jax.disable_jit`` — op-by-op evaluation with no fusion, no
buffer aliasing, no pipelining — must match the jitted results exactly.
Pallas kernels additionally run in interpret mode here (the CPU conftest),
which checks the kernel bodies without the Mosaic compiler in the loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jaxlsq import QuantSpec, fake_quant
from jaxlsq.models import QuantMLP, default_qconfig
from jaxlsq.parallel import create_train_state, make_train_step


def test_fake_quant_fwd_bwd_under_disable_jit():
    spec = QuantSpec.make(8, signed=False, per_channel=True, axis=1)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(16, 12).astype(np.float32))
    g = jnp.asarray(r.randn(16, 12).astype(np.float32))
    s = jnp.asarray(0.05 + 0.01 * r.rand(12).astype(np.float32))
    b = jnp.asarray(0.01 * r.randn(12).astype(np.float32))

    def run(impl):
        out, vjp = jax.vjp(lambda a, ss, bb: fake_quant(a, ss, bb, spec,
                                                        impl=impl), x, s, b)
        return (out,) + vjp(g)

    for impl in ("reference", "pallas"):
        jitted = jax.jit(lambda: run(impl))()
        with jax.disable_jit():
            eager = run(impl)
        for a, bb in zip(jitted, eager):
            # not bitwise: jit may contract mul+add into FMAs; any larger
            # difference would indicate a fusion/aliasing bug
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-6, atol=1e-7)


def test_train_step_under_disable_jit():
    qc = default_qconfig(8, 8, init_batches=1, impl="reference")
    model = QuantMLP(features=(8, 4), qconfig=qc)
    tx = optax.sgd(1e-2)
    r = np.random.RandomState(1)
    x0 = jnp.asarray(r.randn(4, 8).astype(np.float32))
    batch = {"input": x0, "label": jnp.asarray(r.randint(0, 4, size=4))}

    state = create_train_state(model, tx, x0)
    step = make_train_step(model, tx, donate=False)
    s_jit, m_jit = step(state, batch)

    with jax.disable_jit():
        state2 = create_train_state(model, tx, x0)
        s_eager, m_eager = step(state2, batch)

    np.testing.assert_allclose(float(m_jit["loss"]), float(m_eager["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_jit.params),
                    jax.tree.leaves(s_eager.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

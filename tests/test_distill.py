"""distillation_loss (parallel/train.py): QAT knowledge distillation against
a frozen float teacher.  No counterpart in the reference (it ships no
training loop — SURVEY.md §2); framework-native accuracy-recovery lever."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jaxlsq.models import QConfig, QuantMLP, default_qconfig
from jaxlsq.parallel import (create_train_state, cross_entropy_loss,
                             distillation_loss, make_train_step)

from test_qat_e2e import make_data


@pytest.fixture(scope="module")
def teacher():
    """A float QuantMLP trained a few steps — logits are non-degenerate."""
    x, y = make_data(n=128, d=16, seed=0)
    model = QuantMLP(features=(32, 4), qconfig=QConfig())
    tx = optax.adam(1e-2)
    state = create_train_state(model, tx, x[:8])
    step = make_train_step(model, tx)
    for _ in range(10):
        state, _ = step(state, {"input": x, "label": y})
    return model, {**state.params, **state.model_state}, x, y


def test_alpha_one_reduces_to_hard_loss(teacher):
    tmodel, tvars, x, y = teacher
    lf = distillation_loss(tmodel, tvars, alpha=1.0)
    logits = jnp.asarray(np.random.RandomState(1).randn(16, 4),
                         jnp.float32)
    batch = {"input": x[:16], "label": y[:16]}
    np.testing.assert_allclose(float(lf(logits, batch)),
                               float(cross_entropy_loss(logits, batch)),
                               rtol=1e-6)


def test_kl_zero_when_student_matches_teacher(teacher):
    tmodel, tvars, x, y = teacher
    lf = distillation_loss(tmodel, tvars, alpha=0.0, temperature=2.0)
    t_logits = tmodel.apply(tvars, x[:16], training=False)
    batch = {"input": x[:16], "label": y[:16]}
    assert float(lf(t_logits, batch)) == pytest.approx(0.0, abs=1e-5)
    # ... and positive for a different student
    assert float(lf(t_logits + 1.0 * jnp.arange(4.0), batch)) > 1e-3


def test_no_gradient_to_teacher_and_student_trains(teacher):
    tmodel, tvars, x, y = teacher
    qc = default_qconfig(8, 8, init_batches=1)
    student = QuantMLP(features=(32, 4), qconfig=qc)
    tx = optax.adam(1e-2)
    state = create_train_state(student, tx, x[:8])
    lf = distillation_loss(tmodel, tvars, alpha=0.5, temperature=2.0)
    step = make_train_step(student, tx, loss_fn=lf)
    tvars_before = jax.tree.map(np.asarray, tvars)
    state, m0 = step(state, {"input": x, "label": y})
    for _ in range(15):
        state, m1 = step(state, {"input": x, "label": y})
    assert float(m1["loss"]) < float(m0["loss"])
    # teacher untouched (closure constant, stop_gradient)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 tvars_before, tvars)


def test_distilled_student_tracks_teacher_logits(teacher):
    """With alpha=0 (pure KL) the student's logit ordering converges toward
    the teacher's on the training batch."""
    tmodel, tvars, x, y = teacher
    qc = default_qconfig(8, 8, init_batches=1)
    student = QuantMLP(features=(32, 4), qconfig=qc)
    tx = optax.adam(3e-3)
    state = create_train_state(student, tx, x[:8])
    lf = distillation_loss(tmodel, tvars, alpha=0.0, temperature=1.0)
    step = make_train_step(student, tx, loss_fn=lf)
    for _ in range(60):
        state, _ = step(state, {"input": x, "label": y})
    svars = {**state.params, **state.model_state}
    s_logits, _ = student.apply(svars, x, training=False,
                                mutable=["quant_state", "qparams"])
    t_logits = tmodel.apply(tvars, x, training=False)
    agree = (np.argmax(np.asarray(s_logits), -1)
             == np.argmax(np.asarray(t_logits), -1)).mean()
    assert agree > 0.8


def test_alpha_validation(teacher):
    tmodel, tvars, _, _ = teacher
    with pytest.raises(ValueError, match="alpha"):
        distillation_loss(tmodel, tvars, alpha=1.5)

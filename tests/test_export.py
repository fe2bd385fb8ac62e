"""AOT serving export (jax.export artifacts): round-trip exactness.

The deployment contract: serialize the converted serving forward / the whole
generate loop to bytes, deserialize in a fresh consumer, call with (converted
variables, input) — outputs must equal the live program exactly, and the
recorded calling convention must reject drifted layouts.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantMLP, QuantTransformerLM, default_qconfig
from jaxlsq.serve import convert
from jaxlsq.serve.export import (export_generate, export_serving_forward,
                                 load_exported, load_exported_file,
                                 save_exported_file)

VOCAB, DIM, DEPTH, HEADS, MAXLEN = 32, 16, 2, 2, 12


@pytest.fixture(scope="module")
def mlp_setup():
    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantMLP(features=(16, 4), qconfig=qc)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(4, 8).astype(np.float32))
    variables = model.init(jax.random.key(0), x, training=False)
    sv = convert(variables, qc)
    sm = QuantMLP(features=(16, 4),
                  qconfig=qc.for_serving("static", impl="xla"))
    return sm, sv, x


def test_forward_roundtrip_exact(mlp_setup):
    sm, sv, x = mlp_setup
    blob = export_serving_forward(sm, sv, x)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_exported(blob)
    np.testing.assert_array_equal(
        np.asarray(fn(sv, x)),
        np.asarray(sm.apply(sv, x, training=False)))


def test_file_helpers_roundtrip(tmp_path, mlp_setup):
    sm, sv, x = mlp_setup
    blob = export_serving_forward(sm, sv, x)
    p = save_exported_file(str(tmp_path / "fwd.jaxexp"), blob)
    fn = load_exported_file(p)
    np.testing.assert_array_equal(
        np.asarray(fn(sv, x)),
        np.asarray(sm.apply(sv, x, training=False)))


def test_calling_convention_enforced(mlp_setup):
    """The artifact records variable shapes/dtypes; a drifted layout fails
    fast instead of miscomputing."""
    sm, sv, x = mlp_setup
    fn = load_exported(export_serving_forward(sm, sv, x))
    with pytest.raises(Exception):
        fn(sv, x[:, :4])  # wrong input shape
    drifted = jax.tree.map(
        lambda a: a[..., :-1] if a.ndim >= 1 and a.shape[-1] > 1 else a, sv)
    with pytest.raises(Exception):
        fn(drifted, x)  # drifted weight layout


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_generate_roundtrip_exact(cache_dtype):
    from jaxlsq.serve import make_generate

    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=DEPTH,
                               num_heads=HEADS, qconfig=qc, max_len=MAXLEN)
    r = np.random.RandomState(3)
    tokens = jnp.asarray(r.randint(0, VOCAB, (2, 6)))
    variables = model.init(jax.random.key(1), tokens, training=False)
    sv = convert(variables, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("none", "xla"))

    blob = export_generate(sm, sv, prompt_len=6, n_new=4, batch_size=2,
                           cache_dtype=cache_dtype)
    got = np.asarray(load_exported(blob)(sv, tokens))
    want = np.asarray(make_generate(sm, 6, 4, cache_dtype=cache_dtype)(
        sv, tokens))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (2, 4)

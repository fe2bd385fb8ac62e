"""QuantEmbed: LSQ-quantized embedding table, per-row scales, int8 serving."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxlsq import QuantSpec
from jaxlsq.models import QConfig, QuantEmbed, default_qconfig
from jaxlsq.observers import LSQQuantizer
from jaxlsq.serve import convert


def _qc(per_channel=True, weight_bits=8):
    return default_qconfig(weight_bits, 8,
                           per_channel_weights=per_channel, init_batches=0)


def test_qat_fake_quants_table():
    qc = _qc()
    emb = QuantEmbed(16, 8, qc)
    toks = jnp.asarray([[0, 3, 15]])
    v = emb.init(jax.random.key(0), toks, training=False)
    out, _ = emb.apply(v, toks, training=False,
                       mutable=["quant_state", "qparams"])
    assert out.shape == (1, 3, 8)
    # per-row scales over the vocab axis
    assert v["qparams"]["weight_fq"]["qp"]["scale"].shape == (16,)
    # fake-quant actually quantizes: rows land on the scale grid
    table = v["params"]["embedding"]
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(table[0]))


def test_serving_matches_qat_eval():
    qc = _qc()
    emb = QuantEmbed(32, 16, qc)
    toks = jnp.asarray([[1, 5, 31, 0], [2, 2, 7, 30]])
    v = emb.init(jax.random.key(1), toks, training=False)
    want, _ = emb.apply(v, toks, training=False,
                        mutable=["quant_state", "qparams"])
    sv = convert(v, qc)
    assert sv["quantized"]["embedding"].data.dtype == jnp.int8
    assert sv["quantized"]["embedding"].scale.shape == (32,)
    assert "embedding" not in sv["params"]  # float table dropped
    sm = dataclasses.replace(emb, qconfig=qc.for_serving("static"))
    got = sm.apply(sv, toks, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_serving_int8_even_for_4bit_spec():
    """int4 weight specs still store the table row-addressable (int8 carrier
    holding the 4-bit values) — nibble packing would break gathers."""
    qc = _qc(weight_bits=4)
    emb = QuantEmbed(8, 4, qc)
    toks = jnp.asarray([[0, 7]])
    v = emb.init(jax.random.key(2), toks, training=False)
    sv = convert(v, qc)
    p = sv["quantized"]["embedding"]
    assert p.bits == 8 and p.data.shape == (8, 4)
    assert int(jnp.max(jnp.abs(p.data))) <= 7  # 4-bit values in int8 carrier
    want, _ = emb.apply(v, toks, training=False,
                        mutable=["quant_state", "qparams"])
    sm = dataclasses.replace(emb, qconfig=qc.for_serving("static"))
    got = sm.apply(sv, toks, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_lm_with_quant_embed_serves():
    from jaxlsq.models import QuantTransformerLM

    qc = _qc()
    model = QuantTransformerLM(vocab=32, dim=16, depth=1, num_heads=2,
                               qconfig=qc, max_len=8)
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 32, size=(2, 8)))
    v = model.init(jax.random.key(3), toks, training=False)
    want, _ = model.apply(v, toks, training=False,
                          mutable=["quant_state", "qparams"])
    sv = convert(v, qc)
    assert "embedding" in sv["quantized"]["tok_emb"]
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    got = sm.apply(sv, toks, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

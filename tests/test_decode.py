"""KV-cache decode path: prefill + step decode must reproduce the full
forward's logits (VERDICT r1 next-#2), in both QAT and serve mode, and the
scan-fused greedy generator must agree with a Python-loop decode."""

import dataclasses
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.serve import convert, init_kv_cache, make_generate, prefill

VOCAB, DIM, DEPTH, HEADS, MAXLEN = 64, 32, 2, 4, 16


def _lm(qc):
    return QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=DEPTH,
                              num_heads=HEADS, qconfig=qc, max_len=MAXLEN)


@pytest.fixture(scope="module")
def qat_setup():
    qc = default_qconfig(8, 8, init_batches=1)
    model = _lm(qc)
    r = np.random.RandomState(0)
    tokens = jnp.asarray(r.randint(0, VOCAB, size=(2, 12)))
    variables = model.init(jax.random.key(0), tokens, training=False)
    return model, variables, tokens, qc


def _decode_logits(model, variables, tokens, t0):
    """Prefill t0 tokens, then decode the rest one at a time; returns logits
    at every decoded position, shape (B, T - t0, V)."""
    last, cache, idx = prefill(model, variables, tokens[:, :t0])
    outs = []
    step = jax.jit(lambda v, tok, cache, idx: model.apply(
        v, tok, cache=cache, cache_index=idx))
    for t in range(t0, tokens.shape[1]):
        logits, cache = step(variables, tokens[:, t:t + 1], cache, idx)
        outs.append(logits[:, 0])
        idx = idx + 1
    return jnp.stack(outs, axis=1), last


def test_prefill_matches_full_forward(qat_setup):
    model, variables, tokens, _ = qat_setup
    full = model.apply(variables, tokens, training=False)
    last, cache, idx = prefill(model, variables, tokens)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, -1]),
                               rtol=1e-5, atol=1e-5)
    assert int(idx) == tokens.shape[1]
    # cache rows beyond the prompt stay zero
    k0 = np.asarray(cache[0][0])
    assert np.all(k0[:, :, tokens.shape[1]:, :] == 0)


def test_decode_matches_full_forward_qat(qat_setup):
    """Observers must be disabled for decode parity: an enabled activation
    observer re-derives qparams from each call's input (minmax over 12 prompt
    positions vs 1 decode position), so logits legitimately differ until the
    observer is frozen — exactly the reference's eval discipline
    (observers.py:446-449 update whenever enabled)."""
    from jaxlsq.models.toggles import disable_observer

    model, variables, tokens, _ = qat_setup
    variables = disable_observer(variables)
    full = model.apply(variables, tokens, training=False)
    dec, _ = _decode_logits(model, variables, tokens, t0=4)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full[:, 4:]),
                               rtol=1e-4, atol=1e-4)


def test_decode_matches_full_forward_serve_int8(qat_setup):
    model, variables, tokens, qc = qat_setup
    sv = convert(variables, qc)
    sm = _lm(qc.for_serving("static", "xla"))
    full = sm.apply(sv, tokens, training=False)
    dec, _ = _decode_logits(sm, sv, tokens, t0=4)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full[:, 4:]),
                               rtol=1e-4, atol=1e-4)


def test_generate_scan_equals_python_loop(qat_setup):
    model, variables, tokens, _ = qat_setup
    prompt = tokens[:, :6]
    n_new = 8
    gen = make_generate(model, prompt_len=6, n_new=n_new)
    got = np.asarray(gen(variables, prompt))
    assert got.shape == (2, n_new)

    # Python-loop greedy reference
    last, cache, idx = prefill(model, variables, prompt)
    tok = jnp.argmax(last, axis=-1).astype(jnp.int32)
    want = [tok]
    for _ in range(n_new - 1):
        logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                    cache_index=idx)
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        want.append(tok)
        idx = idx + 1
    np.testing.assert_array_equal(got, np.stack([np.asarray(w) for w in want], 1))


def test_generate_serve_mode_and_bf16_cache(qat_setup):
    model, variables, tokens, qc = qat_setup
    sv = convert(variables, qc)
    sm = _lm(qc.for_serving("none", "xla"))
    gen = make_generate(sm, prompt_len=4, n_new=4, cache_dtype=jnp.bfloat16)
    out = np.asarray(gen(sv, tokens[:, :4]))
    assert out.shape == (2, 4)
    assert (out >= 0).all() and (out < VOCAB).all()


def test_generate_overflow_guard(qat_setup):
    model, *_ = qat_setup
    with pytest.raises(ValueError, match="max_len"):
        make_generate(model, prompt_len=10, n_new=10)
    with pytest.raises(ValueError, match="max_len"):
        prefill(model, None, jnp.zeros((1, MAXLEN + 1), jnp.int32),
                cache=init_kv_cache(model, 1))


def test_engine_serves_generate():
    """Continuous-batching engine over the scan-fused generator: decode wired
    into ServingEngine (VERDICT r1 next-#2 'wire batched decode')."""
    from jaxlsq.serve import ServingEngine

    qc = default_qconfig(8, 8, init_batches=1)
    model = _lm(qc)
    r = np.random.RandomState(3)
    tokens = jnp.asarray(r.randint(0, VOCAB, size=(1, 5)))
    variables = model.init(jax.random.key(1), tokens, training=False)
    sv = convert(variables, qc)
    sm = _lm(qc.for_serving("none", "xla"))
    gen = make_generate(sm, prompt_len=5, n_new=3, jit=False)
    fn = jax.jit(lambda prompts: gen(sv, prompts))

    with ServingEngine(fn, example_shape=(5,), max_batch=4,
                       dtype=jnp.int32) as eng:
        prompts = [r.randint(0, VOCAB, size=(5,)) for _ in range(6)]
        futs = [eng.submit(p) for p in prompts]
        outs = [f.result(timeout=120) for f in futs]
    for p, o in zip(prompts, outs):
        assert o.shape == (3,)
        want = np.asarray(gen(sv, jnp.asarray(p)[None]))[0]
        np.testing.assert_array_equal(o, want)


class TestDecodeEngine:
    """Token-level continuous batching (DecodeEngine): staggered requests of
    different prompt lengths and generation lengths join the running batch at
    token boundaries and still reproduce the lockstep greedy decode."""

    @pytest.fixture(scope="class")
    def setup(self):
        from jaxlsq.models.toggles import disable_observer

        qc = default_qconfig(8, 8, init_batches=1)
        model = _lm(qc)
        r = np.random.RandomState(5)
        variables = model.init(jax.random.key(2),
                               jnp.asarray(r.randint(0, VOCAB, (1, 8))),
                               training=False)
        variables = disable_observer(variables)
        return model, variables

    def _reference_tokens(self, model, variables, prompt, n_new):
        from jaxlsq.serve.decode import prefill

        last, cache, idx = prefill(model, variables,
                                   jnp.asarray(prompt)[None])
        tok = jnp.argmax(last, -1).astype(jnp.int32)
        toks = [int(tok[0])]
        for _ in range(n_new - 1):
            logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                        cache_index=idx)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            toks.append(int(tok[0]))
            idx = idx + 1
        return np.asarray(toks[:n_new], np.int32)

    def test_staggered_requests_match_lockstep(self, setup):
        from jaxlsq.serve.decode import DecodeEngine

        model, variables = setup
        r = np.random.RandomState(6)
        reqs = [(r.randint(0, VOCAB, size=r.randint(2, 7)), int(r.randint(2, 6)))
                for _ in range(7)]
        with DecodeEngine(model, variables, max_batch=3,
                          prompt_buckets=(4, 8)) as eng:
            futs = []
            for i, (p, n) in enumerate(reqs):
                futs.append(eng.submit(p, n))
                if i % 2 == 0:
                    time.sleep(0.05)  # land mid-flight of earlier requests
            outs = [f.result(timeout=300) for f in futs]
            stats = dict(eng.stats)
        assert stats["requests"] == len(reqs)
        for (p, n), got in zip(reqs, outs):
            want = self._reference_tokens(model, variables, p, n)
            np.testing.assert_array_equal(got, want)

    def test_more_requests_than_slots(self, setup):
        from jaxlsq.serve.decode import DecodeEngine

        model, variables = setup
        r = np.random.RandomState(7)
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4,)) as eng:
            futs = [eng.submit(r.randint(0, VOCAB, size=3), 3)
                    for _ in range(6)]
            outs = [f.result(timeout=300) for f in futs]
        assert all(o.shape == (3,) for o in outs)

    def test_rejects_oversized(self, setup):
        from jaxlsq.serve.decode import DecodeEngine

        model, variables = setup
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4,)) as eng:
            with pytest.raises(ValueError, match="bucket"):
                eng.submit(np.zeros(9, np.int32), 2)
            with pytest.raises(ValueError, match="max_len"):
                eng.submit(np.zeros(4, np.int32), MAXLEN)


def test_decode_engine_tp_sharded(qat_setup):
    """Token-level continuous batching over TENSOR-PARALLEL serving variables:
    the engine is placement-agnostic — with shard_converted weights on a
    (1, model) mesh, jit partitions the decode/prefill programs and outputs
    must match the unsharded engine exactly."""
    from jaxlsq.parallel import make_mesh
    from jaxlsq.serve import shard_converted
    from jaxlsq.serve.decode import DecodeEngine

    model, variables, tokens, qc = qat_setup
    sv = convert(variables, qc)
    sm = _lm(qc.for_serving("none", "xla"))
    mesh = make_mesh(data=1, model=4)
    sv_tp = shard_converted(sv, mesh)

    r = np.random.RandomState(11)
    prompts = [r.randint(0, VOCAB, size=5) for _ in range(4)]

    def run(variables):
        with DecodeEngine(sm, variables, max_batch=2,
                          prompt_buckets=(8,)) as eng:
            futs = [eng.submit(p, 4) for p in prompts]
            return [f.result(timeout=300) for f in futs]

    plain = run(sv)
    with mesh:
        sharded = run(sv_tp)
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(a, b)


def test_generate_sampled(qat_setup):
    """Sampled generation: one compiled program, deterministic under a fixed
    key, varies across keys, and respects top-k restriction."""
    from jaxlsq.serve.decode import make_sampler

    model, variables, tokens, _ = qat_setup
    gen = make_generate(model, prompt_len=4, n_new=6,
                        logits_to_token=make_sampler(temperature=1.5, top_k=8),
                        sampled=True)
    prompt = tokens[:, :4]
    a = np.asarray(gen(variables, prompt, jax.random.key(0)))
    b = np.asarray(gen(variables, prompt, jax.random.key(0)))
    c = np.asarray(gen(variables, prompt, jax.random.key(1)))
    np.testing.assert_array_equal(a, b)       # same key → same tokens
    assert (a != c).any()                     # different key → different
    assert a.shape == (2, 6)
    # temperature 0 collapses to greedy
    g0 = make_generate(model, prompt_len=4, n_new=6,
                       logits_to_token=make_sampler(temperature=0.0),
                       sampled=True)
    greedy = make_generate(model, prompt_len=4, n_new=6)
    np.testing.assert_array_equal(
        np.asarray(g0(variables, prompt, jax.random.key(0))),
        np.asarray(greedy(variables, prompt)))


def test_decode_engine_eos_early_retire(qat_setup):
    """A request whose decode emits eos_id retires early; its Future result
    ends at the eos token."""
    from jaxlsq.serve.decode import DecodeEngine

    model, variables, tokens, _ = qat_setup
    r = np.random.RandomState(9)
    p = r.randint(0, VOCAB, size=4)
    # find what greedy emits so we can pick its 2nd token as "eos"
    from jaxlsq.serve.decode import prefill as _pf

    last, cache, idx = _pf(model, variables, jnp.asarray(p)[None])
    t1 = int(jnp.argmax(last, -1)[0])
    logits, cache = model.apply(variables, jnp.asarray([[t1]]), cache=cache,
                                cache_index=idx)
    t2 = int(jnp.argmax(logits[:, -1], -1)[0])

    with DecodeEngine(model, variables, max_batch=2, prompt_buckets=(4,),
                      eos_id=t2) as eng:
        out = eng.submit(p, 10).result(timeout=300)
    # retires at the FIRST eos emission (t1 may equal t2 if greedy self-loops)
    want_len = 1 if t1 == t2 else 2
    assert out.shape[0] == want_len and out[-1] == t2 and out.shape[0] < 10


def test_decode_engine_sampled(qat_setup):
    from jaxlsq.serve.decode import DecodeEngine, make_sampler

    model, variables, tokens, _ = qat_setup
    r = np.random.RandomState(10)
    p = r.randint(0, VOCAB, size=4)
    with DecodeEngine(model, variables, max_batch=2, prompt_buckets=(4,),
                      logits_to_token=make_sampler(1.0, top_k=16),
                      rng=jax.random.key(3)) as eng:
        outs = [eng.submit(p, 5).result(timeout=300) for _ in range(3)]
    assert all(o.shape == (5,) for o in outs)
    assert any((outs[0] != o).any() for o in outs[1:])  # sampling varies


def test_decode_engine_warmup(qat_setup):
    """warmup() precompiles and must not perturb subsequent results."""
    from jaxlsq.serve.decode import DecodeEngine

    model, variables, tokens, _ = qat_setup
    r = np.random.RandomState(12)
    p = r.randint(0, VOCAB, size=4)
    with DecodeEngine(model, variables, max_batch=2,
                      prompt_buckets=(4, 8)) as eng:
        cold = eng.submit(p, 4).result(timeout=300)
    with DecodeEngine(model, variables, max_batch=2,
                      prompt_buckets=(4, 8)) as eng:
        eng.warmup()
        warm = eng.submit(p, 4).result(timeout=300)
    np.testing.assert_array_equal(cold, warm)


class TestSpeculative:
    """Greedy speculative decoding must reproduce the target's plain greedy
    decode EXACTLY — with a perfect draft (the target itself, 100%
    acceptance), a weak draft (random weights, near-zero acceptance), and a
    plausible draft (shallower model) — across k values."""

    @pytest.fixture(scope="class")
    def models(self):
        from jaxlsq.models.toggles import disable_observer

        qc = default_qconfig(8, 8, init_batches=1)
        target = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=2,
                                    num_heads=HEADS, qconfig=qc, max_len=32)
        draft = QuantTransformerLM(vocab=VOCAB, dim=16, depth=1,
                                   num_heads=2, qconfig=qc, max_len=32)
        r = np.random.RandomState(20)
        tok = jnp.asarray(r.randint(0, VOCAB, (1, 6)))
        tvars = disable_observer(target.init(jax.random.key(5), tok,
                                             training=False))
        dvars = disable_observer(draft.init(jax.random.key(6), tok,
                                            training=False))
        return target, tvars, draft, dvars, tok

    @pytest.mark.parametrize("k", [1, 3, 5])
    def test_weak_draft_exact(self, models, k):
        from jaxlsq.serve.decode import make_speculative_generate

        target, tvars, draft, dvars, tok = models
        n_new = 10
        want = np.asarray(make_generate(target, 6, n_new)(tvars, tok))
        spec = make_speculative_generate(target, draft, 6, n_new, k=k)
        got = np.asarray(spec(tvars, dvars, tok))
        np.testing.assert_array_equal(got, want)

    def test_perfect_draft_exact(self, models):
        from jaxlsq.serve.decode import make_speculative_generate

        target, tvars, _, _, tok = models
        n_new = 12
        want = np.asarray(make_generate(target, 6, n_new)(tvars, tok))
        spec = make_speculative_generate(target, target, 6, n_new, k=4)
        got = np.asarray(spec(tvars, tvars, tok))
        np.testing.assert_array_equal(got, want)

    def test_serve_mode_exact(self, models):
        """Speculative over CONVERTED int8 serving variables (the production
        configuration: int8 target + int8 draft)."""
        from jaxlsq.serve.decode import make_speculative_generate

        target, tvars, draft, dvars, tok = models
        qc = target.qconfig
        st = dataclasses.replace(target, qconfig=qc.for_serving("none", "xla"))
        sd = dataclasses.replace(draft, qconfig=qc.for_serving("none", "xla"))
        stv, sdv = convert(tvars, qc), convert(dvars, qc)
        n_new = 8
        want = np.asarray(make_generate(st, 6, n_new)(stv, tok))
        got = np.asarray(make_speculative_generate(st, sd, 6, n_new, k=3)(
            stv, sdv, tok))
        np.testing.assert_array_equal(got, want)

    def test_headroom_guard(self, models):
        from jaxlsq.serve.decode import make_speculative_generate

        target, _, draft, _, _ = models
        with pytest.raises(ValueError, match="headroom"):
            make_speculative_generate(target, draft, 6, 25, k=4)


def test_speculative_vmap_batch(qat_setup):
    """Batched speculative decode via vmap over the whole generator: each
    lane must equal its own B=1 run even though lanes finish at different
    verify-round counts (the while_loop keeps stepping finished lanes)."""
    from jaxlsq.models.toggles import disable_observer
    from jaxlsq.serve.decode import make_speculative_generate

    qc = default_qconfig(8, 8, init_batches=1)
    target = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=2,
                                num_heads=HEADS, qconfig=qc, max_len=32)
    draft = QuantTransformerLM(vocab=VOCAB, dim=16, depth=1, num_heads=2,
                               qconfig=qc, max_len=32)
    r = np.random.RandomState(30)
    tok = jnp.asarray(r.randint(0, VOCAB, (1, 6)))
    tvars = disable_observer(target.init(jax.random.key(7), tok, training=False))
    dvars = disable_observer(draft.init(jax.random.key(8), tok, training=False))

    gen = make_speculative_generate(target, draft, 6, 8, k=3, jit=False)
    prompts = jnp.asarray(r.randint(0, VOCAB, (5, 1, 6)))  # 5 lanes of (1,6)
    batched = jax.jit(jax.vmap(gen, in_axes=(None, None, 0)))
    got = np.asarray(batched(tvars, dvars, prompts))
    for i in range(5):
        want = np.asarray(gen(tvars, dvars, prompts[i]))
        np.testing.assert_array_equal(got[i], want)


class TestSpeculativeEngine:
    """Continuous batching + speculative decoding combined: every round
    advances all active slots by 1..k+1 verified tokens, and each request
    still reproduces the target's plain greedy decode exactly."""

    @pytest.fixture(scope="class")
    def models(self):
        from jaxlsq.models.toggles import disable_observer

        qc = default_qconfig(8, 8, init_batches=1)
        target = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=2,
                                    num_heads=HEADS, qconfig=qc, max_len=32)
        draft = QuantTransformerLM(vocab=VOCAB, dim=16, depth=1, num_heads=2,
                                   qconfig=qc, max_len=32)
        r = np.random.RandomState(40)
        tok = jnp.asarray(r.randint(0, VOCAB, (1, 6)))
        tvars = disable_observer(target.init(jax.random.key(9), tok,
                                             training=False))
        dvars = disable_observer(draft.init(jax.random.key(10), tok,
                                            training=False))
        return target, tvars, draft, dvars

    def _greedy(self, model, variables, prompt, n_new):
        last, cache, idx = prefill(model, variables, jnp.asarray(prompt)[None])
        tok = jnp.argmax(last, -1).astype(jnp.int32)
        toks = [int(tok[0])]
        for _ in range(n_new - 1):
            logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                        cache_index=idx)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            toks.append(int(tok[0]))
            idx = idx + 1
        return np.asarray(toks[:n_new], np.int32)

    def test_staggered_exact(self, models):
        from jaxlsq.serve.decode import SpeculativeDecodeEngine

        target, tvars, draft, dvars = models
        r = np.random.RandomState(41)
        reqs = [(r.randint(0, VOCAB, size=r.randint(2, 7)),
                 int(r.randint(2, 8))) for _ in range(6)]
        with SpeculativeDecodeEngine(target, draft, tvars, dvars,
                                     max_batch=3, prompt_buckets=(4, 8),
                                     k=3) as eng:
            futs = []
            for i, (p, n) in enumerate(reqs):
                futs.append(eng.submit(p, n))
                if i % 2 == 1:
                    time.sleep(0.05)
            outs = [f.result(timeout=600) for f in futs]
            stats = dict(eng.stats)
        assert stats["requests"] == len(reqs)
        assert stats["rounds"] >= 1
        for (p, n), got in zip(reqs, outs):
            np.testing.assert_array_equal(got, self._greedy(target, tvars, p, n))

    def test_perfect_draft_engine(self, models):
        """target as its own draft: every round accepts k tokens."""
        from jaxlsq.serve.decode import SpeculativeDecodeEngine

        target, tvars, _, _ = models
        r = np.random.RandomState(42)
        p = r.randint(0, VOCAB, size=5)
        with SpeculativeDecodeEngine(target, target, tvars, tvars,
                                     max_batch=2, prompt_buckets=(8,),
                                     k=4) as eng:
            out = eng.submit(p, 9).result(timeout=600)
            stats = dict(eng.stats)
        np.testing.assert_array_equal(out, self._greedy(target, tvars, p, 9))
        # 8 post-first tokens at k+1=5 accepted/round -> 2 rounds
        assert stats["rounds"] <= 2

    def test_headroom_guard(self, models):
        from jaxlsq.serve.decode import SpeculativeDecodeEngine

        target, tvars, draft, dvars = models
        with SpeculativeDecodeEngine(target, draft, tvars, dvars,
                                     max_batch=2, prompt_buckets=(8,),
                                     k=4) as eng:
            with pytest.raises(ValueError, match="headroom"):
                eng.submit(np.zeros(8, np.int32), 25)

    def test_eos_retires_early(self, models):
        """eos_id support (parity with DecodeEngine): a request retires the
        round its decode emits eos; the result includes the eos and matches
        the greedy decode truncated there."""
        from jaxlsq.serve.decode import SpeculativeDecodeEngine

        target, tvars, draft, dvars = models
        r = np.random.RandomState(44)
        p = r.randint(0, VOCAB, size=5)
        full = self._greedy(target, tvars, p, 9)
        eos = int(full[3])  # a token the greedy decode actually emits
        stop = int(np.argmax(full == eos)) + 1  # first occurrence, inclusive
        with SpeculativeDecodeEngine(target, draft, tvars, dvars,
                                     max_batch=2, prompt_buckets=(8,),
                                     k=3, eos_id=eos) as eng:
            out = eng.submit(p, 9).result(timeout=600)
        np.testing.assert_array_equal(out, full[:stop])
        assert out[-1] == eos

    def test_oversized_k_rejected(self, models):
        """ADVICE r2: k + 2 >= max_len makes the parked position <= 0 and
        the round clamp would silently drag active slots backward — must
        fail fast at construction instead."""
        from jaxlsq.serve.decode import SpeculativeDecodeEngine

        target, tvars, draft, dvars = models  # max_len = 32
        with pytest.raises(ValueError, match="k .* too large"):
            SpeculativeDecodeEngine(target, draft, tvars, dvars,
                                    max_batch=2, prompt_buckets=(8,), k=30)


class TestSpeculativeSampling:
    """Stochastic speculative sampling (VERDICT r2 next-#2): (i) temperature
    0 degenerates to the greedy path bit-for-bit; (ii) with the target as
    its own draft, position-folded keys make the output token-for-token
    identical to plain keyed sampling of the target; (iii) with a weak
    draft, the empirical output distribution matches plain sampling's
    (the accept/reject scheme preserves the target distribution
    independently of the draft)."""

    @pytest.fixture(scope="class")
    def models(self):
        from jaxlsq.models.toggles import disable_observer

        qc = default_qconfig(8, 8, init_batches=1)
        target = QuantTransformerLM(vocab=16, dim=32, depth=2, num_heads=4,
                                    qconfig=qc, max_len=32)
        draft = QuantTransformerLM(vocab=16, dim=16, depth=1, num_heads=2,
                                   qconfig=qc, max_len=32)
        r = np.random.RandomState(50)
        tok = jnp.asarray(r.randint(0, 16, (1, 4)))
        tvars = disable_observer(target.init(jax.random.key(11), tok,
                                             training=False))
        dvars = disable_observer(draft.init(jax.random.key(12), tok,
                                            training=False))
        return target, tvars, draft, dvars, tok

    def _plain_keyed_sampling(self, model, variables, prompt, n_new, key,
                              temperature, top_k):
        """Reference: plain decode sampling token j from the model's
        filtered logits with key fold_in(fold_in(key, 1), j) — the exact key
        discipline the speculative sampler uses for proposals/bonus."""
        from jaxlsq.serve.decode import _filter_logits, prefill

        ks = jax.random.fold_in(key, 1)
        last, cache, idx = prefill(model, variables, prompt)
        toks = []
        tok = jax.random.categorical(
            jax.random.fold_in(ks, 0),
            _filter_logits(last[0], temperature, top_k)).astype(jnp.int32)
        toks.append(int(tok))
        step = jax.jit(lambda v, t, c, i: model.apply(
            v, t, cache=c, cache_index=i))
        for j in range(1, n_new):
            logits, cache = step(variables, tok[None, None], cache, idx)
            tok = jax.random.categorical(
                jax.random.fold_in(ks, j),
                _filter_logits(logits[0, -1], temperature,
                               top_k)).astype(jnp.int32)
            toks.append(int(tok))
            idx = idx + 1
        return np.asarray(toks, np.int32)

    def test_temp0_is_greedy_bitforbit(self, models):
        from jaxlsq.serve.decode import make_speculative_generate

        target, tvars, draft, dvars, tok = models
        greedy = make_speculative_generate(target, draft, 4, 10, k=3)
        t0 = make_speculative_generate(target, draft, 4, 10, k=3,
                                       temperature=0.0)
        np.testing.assert_array_equal(np.asarray(t0(tvars, dvars, tok)),
                                      np.asarray(greedy(tvars, dvars, tok)))

    @pytest.mark.parametrize("k,top_k", [(3, None), (2, 5)])
    def test_selfdraft_equals_plain_keyed_sampling(self, models, k, top_k):
        """draft == target: every acceptance test passes (p == q), so the
        emitted tokens ARE the draft's position-keyed samples — which by the
        shared key discipline are plain sampling's tokens, bit-for-bit."""
        from jaxlsq.serve.decode import make_speculative_generate

        target, tvars, _, _, tok = models
        n_new, temp = 12, 0.8
        spec = make_speculative_generate(target, target, 4, n_new, k=k,
                                         temperature=temp, top_k=top_k,
                                         return_stats=True)
        for seed in (0, 1, 2):
            key = jax.random.key(100 + seed)
            got, stats = spec(tvars, tvars, tok, key)
            want = self._plain_keyed_sampling(target, tvars, tok, n_new, key,
                                              temp, top_k)
            np.testing.assert_array_equal(np.asarray(got)[0], want)
            # self-draft: every round accepts all k and emits the bonus too
            assert float(stats["accepted_per_round"]) == pytest.approx(k + 1)

    def test_weak_draft_distribution_matches_plain(self, models):
        """Accept/reject must preserve the target distribution regardless of
        the draft: empirical per-position token histograms over many keys
        match plain sampling's (total-variation bound; a draft-shaped bias
        would far exceed it)."""
        from jaxlsq.serve.decode import make_speculative_generate

        target, tvars, draft, dvars, tok = models
        n_new, temp, n_keys = 4, 1.0, 512
        spec = make_speculative_generate(target, draft, 4, n_new, k=3,
                                         temperature=temp, jit=False)
        keys = jax.random.split(jax.random.key(7), n_keys)
        got = np.asarray(jax.jit(jax.vmap(
            lambda kk: spec(tvars, dvars, tok, kk)[0]))(keys))  # (N, n_new)

        plain = np.asarray(jax.jit(jax.vmap(
            lambda kk: self._plain_vectorized(target, tvars, tok, n_new, kk,
                                              temp)))(keys))

        V = 16
        for pos in range(n_new):
            ha = np.bincount(got[:, pos], minlength=V) / n_keys
            hb = np.bincount(plain[:, pos], minlength=V) / n_keys
            tvd = 0.5 * np.abs(ha - hb).sum()
            # E[TVD] between two N=512 empirical draws of the same V=16
            # distribution is ~0.07; a draft-vs-target distribution mismatch
            # in this fixture measures >0.5
            assert tvd < 0.2, (pos, tvd)

    @staticmethod
    def _plain_vectorized(model, variables, prompt, n_new, key, temperature):
        """Scan-fused plain keyed sampling (same per-position fold as the
        speculative sampler) — jit/vmap-friendly reference."""
        from jaxlsq.serve.decode import _filter_logits, prefill

        ks = jax.random.fold_in(key, 1)
        last, cache, idx = prefill(model, variables, prompt)
        first = jax.random.categorical(
            jax.random.fold_in(ks, 0),
            _filter_logits(last[0], temperature, None)).astype(jnp.int32)

        def step(carry, j):
            tok, cache, idx = carry
            logits, cache = model.apply(variables, tok[None, None],
                                        cache=cache, cache_index=idx)
            nxt = jax.random.categorical(
                jax.random.fold_in(ks, j),
                _filter_logits(logits[0, -1], temperature,
                               None)).astype(jnp.int32)
            return (nxt, cache, idx + 1), nxt

        (_, _, _), rest = jax.lax.scan(step, (first, cache, idx),
                                       jnp.arange(1, n_new))
        return jnp.concatenate([first[None], rest])

    def test_sampled_engine_completes(self, models):
        """SpeculativeDecodeEngine with temperature > 0: requests complete
        with the right lengths and in-range tokens; stats advance."""
        from jaxlsq.serve.decode import SpeculativeDecodeEngine

        target, tvars, draft, dvars, tok = models
        r = np.random.RandomState(60)
        with SpeculativeDecodeEngine(target, draft, tvars, dvars,
                                     max_batch=2, prompt_buckets=(4, 8),
                                     k=3, temperature=0.9, top_k=8,
                                     rng=jax.random.key(21)) as eng:
            futs = [eng.submit(r.randint(0, 16, size=r.randint(2, 7)),
                               int(r.randint(2, 7))) for _ in range(5)]
            outs = [f.result(timeout=600) for f in futs]
        for f, out in zip(futs, outs):
            assert out.dtype == np.int32 and out.ndim == 1
            assert np.all((out >= 0) & (out < 16))
        assert eng.stats["requests"] == 5

    def test_sampled_engine_requires_rng(self, models):
        from jaxlsq.serve.decode import SpeculativeDecodeEngine

        target, tvars, draft, dvars, tok = models
        with pytest.raises(ValueError, match="rng"):
            SpeculativeDecodeEngine(target, draft, tvars, dvars,
                                    temperature=0.5)


class TestInt8KVCache:
    """INT8 KV cache (VERDICT r2 next-#3): per-row symmetric quantization on
    write, scales folded into the attention dots.  Logits must track the
    f32-cache logits closely, and every decode path must accept the
    quantized layout."""

    def test_cache_layout(self, qat_setup):
        model, variables, tokens, qc = qat_setup
        cache = init_kv_cache(model, 2, dtype=jnp.int8)
        assert len(cache) == model.depth
        (kd, ks), (vd, vs) = cache[0]
        hd = model.dim // model.num_heads
        assert kd.shape == (2, model.num_heads, model.max_len, hd)
        assert kd.dtype == jnp.int8 and vd.dtype == jnp.int8
        assert ks.shape == (2, model.num_heads, model.max_len)
        assert ks.dtype == jnp.float32

    def test_prefill_and_decode_logits_close(self, qat_setup):
        """Prefill + several decode steps: int8-cache logits within int8
        quantization tolerance of the f32-cache logits at every step."""
        model, variables, tokens, qc = qat_setup
        t0 = 6
        want, _ = _decode_logits(model, variables, tokens, t0)

        last, cache, idx = prefill(model, variables, tokens[:, :t0],
                                   cache_dtype=jnp.int8)
        step = jax.jit(lambda v, tok, cache, idx: model.apply(
            v, tok, cache=cache, cache_index=idx))
        for t in range(t0, tokens.shape[1]):
            logits, cache = step(variables, tokens[:, t:t + 1], cache, idx)
            w = np.asarray(want[:, t - t0])
            g = np.asarray(logits[:, 0])
            # per-row int8 rel err ~ 2^-8 on k/v; through two attention dots
            # and the MLP the logit error stays a few % of logit magnitude
            # (measured ~3.4% worst-case on this random-init fixture)
            scale = max(1.0, float(np.abs(w).max()))
            assert np.abs(g - w).max() < 0.05 * scale, t
            idx = idx + 1

    def test_generate_runs_and_tracks_f32(self, qat_setup):
        model, variables, tokens, qc = qat_setup
        gen8 = make_generate(model, 6, 8, cache_dtype=jnp.int8)
        out8 = np.asarray(gen8(variables, tokens[:, :6]))
        assert out8.shape == (2, 8)
        assert ((out8 >= 0) & (out8 < VOCAB)).all()

    def test_engine_int8_cache_exact_vs_lockstep(self, qat_setup):
        """DecodeEngine with an int8 cache: staggered continuous batching
        must equal a lockstep int8-cache decode (quantize-on-write is
        deterministic, so the engine's per-slot path and the scalar path see
        identical integer caches)."""
        from jaxlsq.serve.decode import DecodeEngine
        from jaxlsq.models.toggles import disable_observer

        model, variables, tokens, qc = qat_setup
        variables = disable_observer(variables)  # decode-parity discipline

        def lockstep(prompt, n_new):
            last, cache, idx = prefill(model, variables, prompt[None, :],
                                       cache_dtype=jnp.int8)
            tok = jnp.argmax(last, -1).astype(jnp.int32)
            toks = [int(tok[0])]
            step = jax.jit(lambda v, t, c, i: model.apply(
                v, t, cache=c, cache_index=i))
            for _ in range(n_new - 1):
                logits, cache = step(variables, tok[:, None], cache, idx)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                toks.append(int(tok[0]))
                idx = idx + 1
            return np.asarray(toks, np.int32)

        r = np.random.RandomState(70)
        reqs = [(r.randint(0, VOCAB, size=r.randint(2, 7)),
                 int(r.randint(2, 6))) for _ in range(5)]
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4, 8),
                          cache_dtype=jnp.int8) as eng:
            futs = [eng.submit(p, n) for p, n in reqs]
            outs = [f.result(timeout=600) for f in futs]
        for (p, n), got in zip(reqs, outs):
            np.testing.assert_array_equal(got, lockstep(jnp.asarray(p), n))

    def test_speculative_int8_cache(self, qat_setup):
        """Greedy speculative decode over int8 caches still reproduces the
        target's own greedy decode with the SAME cache dtype (exactness is
        vs the equally-quantized plain path — the speculative rollback
        discipline must not disturb the quantized rows)."""
        from jaxlsq.serve.decode import make_speculative_generate

        model, variables, tokens, qc = qat_setup  # max_len 16: 6+6+2 fits
        n_new = 6
        want = np.asarray(make_generate(model, 6, n_new,
                                        cache_dtype=jnp.int8)(
            variables, tokens[:1, :6]))
        got = np.asarray(make_speculative_generate(
            model, model, 6, n_new, k=2, cache_dtype=jnp.int8)(
            variables, variables, tokens[:1, :6]))
        np.testing.assert_array_equal(got, want)


class TestInt4KVCache:
    """INT4 KV cache: the int8 per-row scheme at 4 bits with two values
    nibble-packed per byte along head_dim, unpacked in registers inside the
    attention dots (models/zoo.py::unpack4)."""

    def test_cache_layout(self, qat_setup):
        model, variables, tokens, qc = qat_setup
        cache = init_kv_cache(model, 2, dtype=jnp.int4)
        (kd, ks), (vd, vs) = cache[0]
        hd = model.dim // model.num_heads
        assert kd.shape == (2, model.num_heads, model.max_len, hd // 2)
        assert kd.dtype == jnp.uint8 and vd.dtype == jnp.uint8
        assert ks.shape == (2, model.num_heads, model.max_len)
        assert ks.dtype == jnp.float32

    def test_pack_unpack_roundtrip_exact(self):
        """Nibble pack/unpack is exact for every value in [-7, 7]: quantize
        a row whose abs-max maps the grid onto integers and recover it."""
        vals = np.array([[-7, -3, -1, 0, 1, 2, 5, 7]], np.float32)  # hd=8
        x = jnp.asarray(vals)[None, None]                 # (1, 1, 1, 8)
        s = jnp.max(jnp.abs(x), -1) / 7.0
        data = jnp.clip(jnp.round(x / s[..., None]), -7, 7).astype(jnp.int32)
        n = data & 0xF
        packed = (n[..., 0::2] | (n[..., 1::2] << 4)).astype(jnp.uint8)
        b32 = packed.astype(jnp.int32)
        lo = ((b32 & 0xF) ^ 8) - 8
        hi = ((b32 >> 4) ^ 8) - 8
        full = jnp.stack([lo, hi], -1).reshape(x.shape)
        np.testing.assert_array_equal(
            np.asarray(full * s[..., None]).reshape(vals.shape), vals)

    def test_prefill_and_decode_logits_close(self, qat_setup):
        """int4-cache logits track the f32-cache logits within 4-bit
        tolerance (per-row rel err ~2^-4, a few steps of amplification
        through the two dots and the MLP)."""
        model, variables, tokens, qc = qat_setup
        t0 = 6
        want, _ = _decode_logits(model, variables, tokens, t0)
        last, cache, idx = prefill(model, variables, tokens[:, :t0],
                                   cache_dtype=jnp.int4)
        step = jax.jit(lambda v, tok, cache, idx: model.apply(
            v, tok, cache=cache, cache_index=idx))
        for t in range(t0, tokens.shape[1]):
            logits, cache = step(variables, tokens[:, t:t + 1], cache, idx)
            w = np.asarray(want[:, t - t0])
            g = np.asarray(logits[:, 0])
            scale = max(1.0, float(np.abs(w).max()))
            assert np.abs(g - w).max() < 0.35 * scale, t
            idx = idx + 1

    def test_engine_int4_cache_exact_vs_lockstep(self, qat_setup):
        """Staggered continuous batching over the int4 cache equals a
        lockstep int4-cache decode exactly (quantize-on-write and the
        register unpack are deterministic)."""
        from jaxlsq.serve.decode import DecodeEngine
        from jaxlsq.models.toggles import disable_observer

        model, variables, tokens, qc = qat_setup
        variables = disable_observer(variables)

        def lockstep(prompt, n_new):
            last, cache, idx = prefill(model, variables, prompt[None, :],
                                       cache_dtype=jnp.int4)
            tok = jnp.argmax(last, -1).astype(jnp.int32)
            toks = [int(tok[0])]
            step = jax.jit(lambda v, t, c, i: model.apply(
                v, t, cache=c, cache_index=i))
            for _ in range(n_new - 1):
                logits, cache = step(variables, tok[:, None], cache, idx)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                toks.append(int(tok[0]))
                idx = idx + 1
            return np.asarray(toks, np.int32)

        r = np.random.RandomState(75)
        reqs = [(r.randint(0, VOCAB, size=r.randint(2, 7)),
                 int(r.randint(2, 5))) for _ in range(4)]
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4, 8),
                          cache_dtype=jnp.int4) as eng:
            futs = [eng.submit(p, n) for p, n in reqs]
            outs = [f.result(timeout=600) for f in futs]
        for (p, n), got in zip(reqs, outs):
            np.testing.assert_array_equal(got, lockstep(jnp.asarray(p), n))

    def test_generate_runs_int4(self, qat_setup):
        model, variables, tokens, qc = qat_setup
        gen4 = make_generate(model, 6, 8, cache_dtype=jnp.int4)
        out4 = np.asarray(gen4(variables, tokens[:, :6]))
        assert out4.shape == (2, 8)
        assert ((out4 >= 0) & (out4 < VOCAB)).all()

    def test_odd_head_dim_rejected(self, qat_setup):
        model, variables, tokens, qc = qat_setup
        odd = QuantTransformerLM(vocab=VOCAB, dim=12, depth=1, num_heads=4,
                                 qconfig=qc, max_len=8)  # head_dim = 3
        with pytest.raises(ValueError, match="even head_dim"):
            init_kv_cache(odd, 1, dtype=jnp.int4)


class TestChunkedPrefill:
    """Non-blocking chunked admission (VERDICT r2 next-#4): prefill advances
    one chunk per dispatcher iteration, interleaved with decode steps, so a
    long admission cannot stall the running batch.

    Exactness runs with observers DISABLED (the decode-parity discipline of
    test_decode_matches_full_forward_qat): an ENABLED per-tensor activation
    observer derives qparams from each call's whole input batch, so a
    neighbor slot's activations would legitimately perturb this slot's
    fake-quant — nothing to do with chunking."""

    @pytest.fixture(scope="class")
    def frozen(self, qat_setup):
        from jaxlsq.models.toggles import disable_observer

        model, variables, tokens, qc = qat_setup
        return model, disable_observer(variables), tokens, qc

    def _lockstep(self, model, variables, prompt, n_new):
        last, cache, idx = prefill(model, variables, jnp.asarray(prompt)[None, :])
        tok = jnp.argmax(last, -1).astype(jnp.int32)
        toks = [int(tok[0])]
        step = jax.jit(lambda v, t, c, i: model.apply(
            v, t, cache=c, cache_index=i))
        for _ in range(n_new - 1):
            logits, cache = step(variables, tok[:, None], cache, idx)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            toks.append(int(tok[0]))
            idx = idx + 1
        return np.asarray(toks, np.int32)

    def test_multichunk_admission_exact(self, frozen):
        """Chunked prefill (chunk < prompt) is bit-exact vs one-shot prefill:
        every contraction has a fixed extent, the chunk length is purely
        parallel — staggered results must equal lockstep decode."""
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens, qc = frozen
        r = np.random.RandomState(81)
        reqs = [(r.randint(0, VOCAB, size=r.randint(2, 9)),
                 int(r.randint(2, 6))) for _ in range(6)]
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4, 8), prefill_chunk=3) as eng:
            futs = []
            for i, (p, n) in enumerate(reqs):
                futs.append(eng.submit(p, n))
                if i % 2 == 1:
                    time.sleep(0.03)
            outs = [f.result(timeout=600) for f in futs]
        assert eng.stats["admission_chunks"] > eng.stats["requests"]  # multi
        for (p, n), got in zip(reqs, outs):
            np.testing.assert_array_equal(got, self._lockstep(
                model, variables, p, n))

    def test_decode_steps_interleave_with_admission(self, frozen):
        """While a max-bucket prompt is admitted chunk by chunk, the active
        slot keeps stepping: the dispatcher runs one decode step per chunk
        iteration, so the recorded interleave count is >= n_chunks - 1."""
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens, qc = frozen
        r = np.random.RandomState(82)
        pa = r.randint(0, VOCAB, size=2)
        pb = r.randint(0, VOCAB, size=8)
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4, 8), prefill_chunk=2) as eng:
            eng.warmup()
            a = eng.submit(pa, 10)   # long decoder, stays active
            b = eng.submit(pb, 2)    # max-bucket prompt: 4-chunk admission
            ra, rb = a.result(timeout=600), b.result(timeout=600)
        assert len(ra) == 10 and len(rb) == 2
        # b's admission spans 4 chunk iterations; a stays active throughout,
        # so decode steps advanced during the admission window
        n_chunks_b = -(-8 // 2)
        assert eng.stats["admission_interleave"][-1] >= n_chunks_b - 1, \
            eng.stats["admission_interleave"]
        np.testing.assert_array_equal(ra, self._lockstep(model, variables,
                                                         pa, 10))
        np.testing.assert_array_equal(rb, self._lockstep(model, variables,
                                                         pb, 2))

    def test_speculative_engine_multichunk_exact(self, frozen):
        """SpeculativeDecodeEngine with multi-chunk admission: staggered
        results still EXACTLY equal the target's greedy decode."""
        from jaxlsq.serve.decode import SpeculativeDecodeEngine
        from jaxlsq.models.toggles import disable_observer

        model, variables, tokens, qc = frozen
        draft = QuantTransformerLM(vocab=VOCAB, dim=16, depth=1, num_heads=2,
                                   qconfig=qc, max_len=MAXLEN)
        dvars = disable_observer(draft.init(jax.random.key(31),
                                            tokens[:1, :4], training=False))
        r = np.random.RandomState(83)
        reqs = [(r.randint(0, VOCAB, size=r.randint(2, 9)),
                 int(r.randint(2, 5))) for _ in range(4)]
        with SpeculativeDecodeEngine(model, draft, variables, dvars,
                                     max_batch=2, prompt_buckets=(4, 8),
                                     k=2, prefill_chunk=3) as eng:
            futs = [eng.submit(p, n) for p, n in reqs]
            outs = [f.result(timeout=600) for f in futs]
        assert eng.stats["admission_chunks"] > eng.stats["requests"]
        for (p, n), got in zip(reqs, outs):
            np.testing.assert_array_equal(got, self._lockstep(
                model, variables, p, n))


class TestPrefixCache:
    """Prefix caching: a shared prompt prefix is prefilled ONCE
    (register_prefix) and each request's admission starts from a copy of
    that cache, prefilling only the suffix at offset positions.  Results
    must be bit-exact vs submitting the full concatenated prompt (same
    programs, same positions — the chunked-prefill exactness argument)."""

    @pytest.fixture(scope="class")
    def frozen(self, qat_setup):
        from jaxlsq.models.toggles import disable_observer

        model, variables, tokens, qc = qat_setup
        return model, disable_observer(variables), tokens, qc

    _lockstep = TestChunkedPrefill._lockstep

    def test_prefix_admission_exact_and_reusable(self, frozen):
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens, qc = frozen
        r = np.random.RandomState(91)
        pfx = r.randint(0, VOCAB, size=6)
        suffixes = [r.randint(0, VOCAB, size=int(r.randint(2, 4)))
                    for _ in range(4)]
        plain = r.randint(0, VOCAB, size=5)  # non-prefix request, mid-flight
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4, 8), prefill_chunk=3) as eng:
            h = eng.register_prefix(pfx)
            futs = [eng.submit(s, 4, prefix=h) for s in suffixes[:2]]
            fp = eng.submit(plain, 4)
            time.sleep(0.05)
            # the handle stays valid after earlier admissions consumed
            # (copied) it — donation must not eat the registered cache
            futs += [eng.submit(s, 4, prefix=h) for s in suffixes[2:]]
            outs = [f.result(timeout=600) for f in futs]
            out_p = fp.result(timeout=600)
            assert eng.stats["prefix_tokens_reused"] == 6 * len(suffixes)
        for s, got in zip(suffixes, outs):
            want = self._lockstep(model, variables,
                                  np.concatenate([pfx, s]), 4)
            np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(
            out_p, self._lockstep(model, variables, plain, 4))

    def test_prefix_longer_than_largest_bucket(self, frozen):
        """The prefix may exceed the admission buckets (system-prompt
        shape) — only prefix + suffix + n_new <= max_len binds."""
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens, qc = frozen
        r = np.random.RandomState(92)
        pfx = r.randint(0, VOCAB, size=8)      # > largest bucket (4)
        sfx = r.randint(0, VOCAB, size=3)
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4,), prefill_chunk=2) as eng:
            h = eng.register_prefix(pfx)
            got = eng.submit(sfx, 3, prefix=h).result(timeout=600)
        want = self._lockstep(model, variables, np.concatenate([pfx, sfx]), 3)
        np.testing.assert_array_equal(got, want)

    def test_speculative_engine_prefix_exact(self, frozen):
        from jaxlsq.serve.decode import SpeculativeDecodeEngine
        from jaxlsq.models.toggles import disable_observer

        model, variables, tokens, qc = frozen
        draft = QuantTransformerLM(vocab=VOCAB, dim=16, depth=1, num_heads=2,
                                   qconfig=qc, max_len=MAXLEN)
        dvars = disable_observer(draft.init(jax.random.key(41),
                                            tokens[:1, :4], training=False))
        r = np.random.RandomState(93)
        pfx = r.randint(0, VOCAB, size=5)
        suffixes = [r.randint(0, VOCAB, size=int(r.randint(2, 4)))
                    for _ in range(3)]
        with SpeculativeDecodeEngine(model, draft, variables, dvars,
                                     max_batch=2, prompt_buckets=(4, 8),
                                     k=2, prefill_chunk=3) as eng:
            h = eng.register_prefix(pfx)
            futs = [eng.submit(s, 3, prefix=h) for s in suffixes]
            outs = [f.result(timeout=600) for f in futs]
        for s, got in zip(suffixes, outs):
            want = self._lockstep(model, variables,
                                  np.concatenate([pfx, s]), 3)
            np.testing.assert_array_equal(got, want)

    def test_prefix_validation(self, frozen):
        from jaxlsq.serve.decode import DecodeEngine, SpeculativeDecodeEngine
        from jaxlsq.models.toggles import disable_observer

        model, variables, tokens, qc = frozen
        draft = QuantTransformerLM(vocab=VOCAB, dim=16, depth=1, num_heads=2,
                                   qconfig=qc, max_len=MAXLEN)
        dvars = disable_observer(draft.init(jax.random.key(42),
                                            tokens[:1, :4], training=False))
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4,)) as eng:
            with pytest.raises(ValueError, match="non-empty"):
                eng.register_prefix(np.zeros((0,), np.int32))
            with pytest.raises(ValueError, match="max_len"):
                eng.register_prefix(np.zeros(MAXLEN, np.int32))
            h = eng.register_prefix(np.zeros(10, np.int32))
            with pytest.raises(ValueError, match="max_len"):
                eng.submit(np.zeros(3, np.int32), 8, prefix=h)  # 10+3+8 > 16
            with pytest.raises(ValueError, match="register_prefix"):
                eng.submit(np.zeros(2, np.int32), 2, prefix="nope")
            with SpeculativeDecodeEngine(model, draft, variables, dvars,
                                         max_batch=2, prompt_buckets=(4,),
                                         k=2) as seng:
                # a single-model prefix is rejected by the two-model engine
                with pytest.raises(ValueError, match="register_prefix"):
                    seng.submit(np.zeros(2, np.int32), 2, prefix=h)

    def test_cross_engine_handle_rejected(self, frozen):
        """Identical cache layouts can hide different weights: a handle only
        works on the engine that registered it."""
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens, qc = frozen
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4,)) as a, \
                DecodeEngine(model, variables, max_batch=2,
                             prompt_buckets=(4,)) as b:
            h = a.register_prefix(np.zeros(4, np.int32))
            with pytest.raises(ValueError, match="different engine"):
                b.submit(np.zeros(2, np.int32), 2, prefix=h)

    def test_padded_admission_overflow_rejected(self, frozen):
        """A suffix whose chunk-PADDED admission would write past max_len is
        rejected up front: dynamic_update_slice clamps out-of-range starts,
        which would silently overwrite real prefix rows (reproduced before
        the fix: a 14-token prefix + 1-token suffix at prefill_chunk=3
        passed the size check but wrote rows [13, 16) instead of [14, 17))."""
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens, qc = frozen
        with DecodeEngine(model, variables, max_batch=2, prompt_buckets=(4,),
                          prefill_chunk=3) as eng:
            h = eng.register_prefix(np.zeros(14, np.int32))
            with pytest.raises(ValueError, match="padded"):
                eng.submit(np.zeros(1, np.int32), 1, prefix=h)  # 14+3 > 16

    def test_register_prefix_padding_stays_below_max_len(self, frozen):
        """register_prefix must not let ITS chunk padding write past
        max_len either (reproduced before the fix: buckets=(8,), chunk=6,
        13-token prefix padded to 18 > 16 clamped onto real rows).  The
        staging falls back to a one-shot chunk and stays exact."""
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens, qc = frozen
        r = np.random.RandomState(97)
        pfx = r.randint(0, VOCAB, size=13)  # staged at c=6 would pad to 18
        sfx = r.randint(0, VOCAB, size=2)   # admits via the 2-bucket (c=2)
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(2, 8), prefill_chunk=6) as eng:
            h = eng.register_prefix(pfx)
            got = eng.submit(sfx, 1, prefix=h).result(timeout=600)
        want = self._lockstep(model, variables, np.concatenate([pfx, sfx]), 1)
        np.testing.assert_array_equal(got, want)


class TestBeamSearch:
    """Beam-search decode: beams=1 degenerates to greedy; a wide-enough beam
    is exhaustively optimal on a tiny vocab; eos freezing pins finished
    beams."""

    @pytest.fixture(scope="class")
    def tiny(self):
        from jaxlsq.models.toggles import disable_observer

        qc = default_qconfig(8, 8, init_batches=1)
        model = QuantTransformerLM(vocab=4, dim=16, depth=1, num_heads=2,
                                   qconfig=qc, max_len=16)
        r = np.random.RandomState(90)
        prompt = jnp.asarray(r.randint(0, 4, (2, 5)))
        variables = disable_observer(model.init(jax.random.key(13), prompt,
                                                training=False))
        return model, variables, prompt

    def test_beam1_equals_greedy(self, qat_setup):
        from jaxlsq.models.toggles import disable_observer
        from jaxlsq.serve.decode import make_beam_search

        model, variables, tokens, qc = qat_setup
        variables = disable_observer(variables)
        prompt = tokens[:, :6]
        greedy = np.asarray(make_generate(model, 6, 8)(variables, prompt))
        toks, scores = make_beam_search(model, 6, 8, beams=1)(variables,
                                                              prompt)
        np.testing.assert_array_equal(np.asarray(toks), greedy)
        assert np.all(np.isfinite(np.asarray(scores)))

    @pytest.mark.parametrize("cdt", [jnp.int8, jnp.int4])
    def test_beam1_equals_greedy_quantized_cache(self, qat_setup, cdt):
        """Quantized-cache composition: the per-parent cache reindex
        (tree-mapped take) must carry the (data, scale) tuple layouts; at
        beams=1 it must reproduce the equally-quantized greedy decode
        exactly."""
        from jaxlsq.models.toggles import disable_observer
        from jaxlsq.serve.decode import make_beam_search

        model, variables, tokens, qc = qat_setup
        variables = disable_observer(variables)
        prompt = tokens[:, :6]
        greedy = np.asarray(make_generate(model, 6, 8, cache_dtype=cdt)(
            variables, prompt))
        toks, scores = make_beam_search(model, 6, 8, beams=1,
                                        cache_dtype=cdt)(variables, prompt)
        np.testing.assert_array_equal(np.asarray(toks), greedy)
        assert np.all(np.isfinite(np.asarray(scores)))

    def test_wide_beam_is_exhaustively_optimal(self, tiny):
        """vocab=4, n_new=3, beams=16: step 1 keeps all 4 prefixes, step 2
        all 16, step 3 ranks all 64 — the beam IS exhaustive search, so its
        best sequence must equal the brute-force max-joint-log-prob
        sequence (teacher-forced scoring of every candidate)."""
        from jaxlsq.serve.decode import make_beam_search

        model, variables, prompt, = tiny
        n_new, V = 3, 4
        toks, scores = make_beam_search(model, 5, n_new, beams=16)(
            variables, prompt)
        toks, scores = np.asarray(toks), np.asarray(scores)

        # brute force: all 64 continuations, scored by one full forward
        cands = np.stack(np.meshgrid(*[np.arange(V)] * n_new,
                                     indexing="ij"), -1).reshape(-1, n_new)
        for b in range(prompt.shape[0]):
            seqs = jnp.asarray(np.concatenate(
                [np.repeat(np.asarray(prompt[b])[None], len(cands), 0),
                 cands], axis=1))                        # (64, 5+3)
            logits = model.apply(variables, seqs, training=False)
            logp = jax.nn.log_softmax(logits, -1)
            # token at position t is predicted by logits at t-1
            tpos = np.arange(5, 5 + n_new)
            sc = sum(np.asarray(logp[:, t - 1])[np.arange(len(cands)),
                                                cands[:, t - 5]]
                     for t in tpos)
            best = int(np.argmax(sc))
            np.testing.assert_array_equal(toks[b], cands[best])
            assert abs(scores[b] - sc[best]) < 1e-4

    def test_eos_freezes_beam(self, tiny):
        """With eos_id set, a beam that emitted eos only ever repeats eos
        (score frozen): the winning sequence has nothing but eos after its
        first eos."""
        from jaxlsq.serve.decode import make_beam_search

        model, variables, prompt = tiny
        for eos in range(4):
            toks, _ = make_beam_search(model, 5, 6, beams=3, eos_id=eos)(
                variables, prompt)
            toks = np.asarray(toks)
            for row in toks:
                hits = np.nonzero(row == eos)[0]
                if hits.size:
                    assert np.all(row[hits[0]:] == eos), (eos, row)

    def test_beam_int8_cache(self, tiny):
        """Beam search over the quantized KV cache: the parent-beam cache
        reindex (tree-mapped take) must handle (data, scale) tuple leaves."""
        from jaxlsq.serve.decode import make_beam_search

        model, variables, prompt = tiny
        toks, scores = make_beam_search(model, 5, 4, beams=3,
                                        cache_dtype=jnp.int8)(variables,
                                                              prompt)
        toks = np.asarray(toks)
        assert toks.shape == (2, 4)
        assert np.all((toks >= 0) & (toks < 4))
        assert np.all(np.isfinite(np.asarray(scores)))


class TestGQA:
    """Grouped-query attention: k/v at num_kv_heads < num_heads shrink the
    KV cache (and its decode stream) by the head ratio; decode must equal
    the full forward, and every decode path must accept the smaller cache."""

    @pytest.fixture(scope="class")
    def gqa(self):
        from jaxlsq.models.toggles import disable_observer

        qc = default_qconfig(8, 8, init_batches=1)
        model = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=2,
                                   num_heads=4, num_kv_heads=2,
                                   qconfig=qc, max_len=MAXLEN)
        r = np.random.RandomState(95)
        tokens = jnp.asarray(r.randint(0, VOCAB, size=(2, 12)))
        variables = disable_observer(model.init(jax.random.key(21), tokens,
                                                training=False))
        return model, variables, tokens

    def test_cache_shape_shrinks(self, gqa):
        model, variables, tokens = gqa
        cache = init_kv_cache(model, 2)
        assert cache[0][0].shape == (2, 2, MAXLEN, DIM // 4)  # kvh=2 heads

    def test_decode_matches_full_forward(self, gqa):
        model, variables, tokens = gqa
        full = model.apply(variables, tokens, training=False)
        dec, _ = _decode_logits(model, variables, tokens, t0=4)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(full[:, 4:]),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("cdt,tol", [(jnp.int8, 0.05), (jnp.int4, 0.35)])
    def test_quantized_caches_track_f32_under_gqa(self, gqa, cdt, tol):
        """The grouped (5-D) attention dots with quantized caches: per-row
        scales (and the int4 register unpack) must compose with the
        kvh < heads layout."""
        model, variables, tokens = gqa
        t0 = 6
        want, _ = _decode_logits(model, variables, tokens, t0)
        last, cache, idx = prefill(model, variables, tokens[:, :t0],
                                   cache_dtype=cdt)
        step = jax.jit(lambda v, tok, c, i: model.apply(
            v, tok, cache=c, cache_index=i))
        for t in range(t0, tokens.shape[1]):
            logits, cache = step(variables, tokens[:, t:t + 1], cache, idx)
            w = np.asarray(want[:, t - t0])
            g = np.asarray(logits[:, 0])
            scale = max(1.0, float(np.abs(w).max()))
            assert np.abs(g - w).max() < tol * scale, (t, cdt)
            idx = idx + 1

    def test_generate_and_engine(self, gqa):
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens = gqa
        out = np.asarray(make_generate(model, 6, 6)(variables,
                                                    tokens[:, :6]))
        assert out.shape == (2, 6)
        # engine (vector cache_index on the kvh-head cache) vs lockstep
        p = np.asarray(tokens[0, :6])
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(8,), prefill_chunk=3) as eng:
            got = eng.submit(p, 6).result(timeout=600)
        last, cache, idx = prefill(model, variables, jnp.asarray(p)[None])
        tok = jnp.argmax(last, -1).astype(jnp.int32)
        want = [int(tok[0])]
        for _ in range(5):
            logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                        cache_index=idx)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            want.append(int(tok[0]))
            idx = idx + 1
        np.testing.assert_array_equal(got, np.asarray(want, np.int32))

    def test_int8_cache_gqa(self, gqa):
        """Quantized cache composes with GQA (per-row scales on the
        kvh-head arrays)."""
        model, variables, tokens = gqa
        full = model.apply(variables, tokens, training=False)
        last, cache, idx = prefill(model, variables, tokens[:, :4],
                                   cache_dtype=jnp.int8)
        assert cache[0][0][0].shape == (2, 2, MAXLEN, DIM // 4)
        step = jax.jit(lambda v, t, c, i: model.apply(
            v, t, cache=c, cache_index=i))
        for t in range(4, 8):
            logits, cache = step(variables, tokens[:, t:t + 1], cache, idx)
            w = np.asarray(full[:, t])
            gdiff = np.abs(np.asarray(logits[:, 0]) - w).max()
            # dim-32 toy model: int8 cache error measures ~4-6% of logit
            # magnitude (fewer kv heads ⇒ each head carries more signal)
            assert gdiff < 0.08 * max(1.0, float(np.abs(w).max())), t
            idx = idx + 1

    def test_mha_unchanged_param_layout(self, qat_setup):
        """num_kv_heads=None keeps the historical fused-qkv parameter shape
        (3d columns) — checkpoints stay loadable."""
        model, variables, tokens, qc = qat_setup
        kern = variables["params"]["block0"]["qkv"]["kernel"]
        assert kern.shape == (DIM, 3 * DIM)


class TestRoPE:
    """Rotary position embeddings: k is cached ROTATED (each key by its own
    absolute write position), so decode at any depth must reproduce the full
    forward; composes with GQA and per-slot engine positions."""

    @pytest.fixture(scope="class")
    def rope_lm(self):
        from jaxlsq.models.toggles import disable_observer

        qc = default_qconfig(8, 8, init_batches=1)
        model = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=2,
                                   num_heads=4, num_kv_heads=2,
                                   pos_embedding="rope",
                                   qconfig=qc, max_len=MAXLEN)
        r = np.random.RandomState(97)
        tokens = jnp.asarray(r.randint(0, VOCAB, size=(2, 12)))
        variables = disable_observer(model.init(jax.random.key(23), tokens,
                                                training=False))
        return model, variables, tokens

    def test_no_learned_pos_table(self, rope_lm):
        model, variables, tokens = rope_lm
        assert "pos_emb" not in variables["params"]

    def test_decode_matches_full_forward(self, rope_lm):
        model, variables, tokens = rope_lm
        full = model.apply(variables, tokens, training=False)
        dec, _ = _decode_logits(model, variables, tokens, t0=4)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(full[:, 4:]),
                                   rtol=1e-4, atol=1e-4)

    def test_position_sensitivity(self, rope_lm):
        """Same token at different positions must attend differently (the
        rotation actually does something): shifting the prompt changes the
        logits."""
        model, variables, tokens = rope_lm
        a = model.apply(variables, tokens[:, :6], training=False)
        shifted = jnp.concatenate([tokens[:, :1], tokens[:, :6]], axis=1)
        b = model.apply(variables, shifted, training=False)
        # the same 6-token suffix now sits one position later
        assert float(np.abs(np.asarray(a[:, -1]) -
                            np.asarray(b[:, -1])).max()) > 1e-4

    def test_engine_exact_vs_lockstep(self, rope_lm):
        """Per-slot engine positions feed the SAME rotary angles as the
        scalar path: staggered continuous batching == lockstep decode."""
        from jaxlsq.serve.decode import DecodeEngine

        model, variables, tokens = rope_lm
        r = np.random.RandomState(98)
        reqs = [(r.randint(0, VOCAB, size=r.randint(2, 7)),
                 int(r.randint(2, 6))) for _ in range(4)]
        with DecodeEngine(model, variables, max_batch=2,
                          prompt_buckets=(4, 8), prefill_chunk=3) as eng:
            futs = [eng.submit(p, n) for p, n in reqs]
            outs = [f.result(timeout=600) for f in futs]
        for (p, n), got in zip(reqs, outs):
            last, cache, idx = prefill(model, variables,
                                       jnp.asarray(p)[None])
            tok = jnp.argmax(last, -1).astype(jnp.int32)
            want = [int(tok[0])]
            for _ in range(n - 1):
                logits, cache = model.apply(variables, tok[:, None],
                                            cache=cache, cache_index=idx)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                want.append(int(tok[0]))
                idx = idx + 1
            np.testing.assert_array_equal(got, np.asarray(want, np.int32))

    def test_train_step_runs(self, rope_lm):
        import optax
        from jaxlsq.parallel import create_train_state, make_train_step

        model, _, tokens = rope_lm
        tx = optax.sgd(1e-2)
        state = create_train_state(model, tx, tokens[:, :8])

        def loss_fn(logits, batch):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], batch["label"][:, 1:]).mean()

        step = make_train_step(model, tx, loss_fn=loss_fn)
        state, metrics = step(state, {"input": tokens[:, :8],
                                      "label": tokens[:, :8]})
        assert np.isfinite(float(metrics["loss"]))


class TestEngineShutdown:
    """Closing an engine whose dispatcher thread is STUCK (e.g. blocked in a
    first remote compile) must cancel pending futures rather than hang or
    set_exception (which would make the stuck dispatcher's later set_result
    raise InvalidStateError and die holding the state lock).  Regression
    cover for the close paths that SpeculativeDecodeEngine delegates to
    DecodeEngine explicitly."""

    class _StuckThread:
        """Stands in for a dispatcher thread that never exits."""

        def join(self, timeout=None):
            pass

        def is_alive(self):
            return True

    def _freeze(self, eng):
        """Stop the real dispatcher cleanly, then swap in an always-alive
        dummy so close() takes the stuck branch deterministically."""
        with eng._lifecycle_lock:
            eng._stop = True
        eng._thread.join(timeout=60)
        assert not eng._thread.is_alive()
        eng._stop = False  # close() will re-set it
        eng._thread = self._StuckThread()

    def test_close_stuck_decode_engine_cancels_pending(self, qat_setup):
        from concurrent.futures import CancelledError

        from jaxlsq.serve.decode import DecodeEngine, _GenRequest

        model, variables, _, _ = qat_setup
        eng = DecodeEngine(model, variables, max_batch=2, prompt_buckets=(4,))
        self._freeze(eng)
        queued = _GenRequest(np.arange(3, dtype=np.int32), 2)
        eng._queue.put(queued)                       # unserved queue entry
        slotted = _GenRequest(np.arange(3, dtype=np.int32), 2)
        eng._slots[0] = slotted                      # mid-flight slot entry
        eng.close()
        for req in (queued, slotted):
            with pytest.raises(CancelledError):
                req.future.result(timeout=0)
        # the dispatcher's set_result on a cancelled future must be a no-op
        assert slotted.future.done()

    def test_close_stuck_speculative_engine_cancels_pending(self, qat_setup):
        from concurrent.futures import CancelledError

        from jaxlsq.serve.decode import SpeculativeDecodeEngine, _GenRequest

        model, variables, _, _ = qat_setup
        eng = SpeculativeDecodeEngine(model, model, variables, variables,
                                      max_batch=2, prompt_buckets=(4,), k=2)
        self._freeze(eng)
        queued = _GenRequest(np.arange(3, dtype=np.int32), 2)
        eng._queue.put(queued)
        eng.close()
        with pytest.raises(CancelledError):
            queued.future.result(timeout=0)

    def test_clean_close_fails_pending_with_runtime_error(self, qat_setup):
        """The non-stuck branch: anything enqueued after the dispatcher's
        last check gets a RuntimeError, not a cancel."""
        from jaxlsq.serve.decode import DecodeEngine, _GenRequest

        model, variables, _, _ = qat_setup
        eng = DecodeEngine(model, variables, max_batch=2, prompt_buckets=(4,))
        with eng._lifecycle_lock:
            eng._stop = True
        eng._thread.join(timeout=60)
        assert not eng._thread.is_alive()
        late = _GenRequest(np.arange(3, dtype=np.int32), 2)
        eng._queue.put(late)
        eng.close()
        with pytest.raises(RuntimeError, match="closed"):
            late.future.result(timeout=0)

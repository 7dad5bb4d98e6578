"""Rejection-sampling speculative decoding (runtime/speculative.py).

The invariant is DISTRIBUTION-exact sampling: with a deterministic
prompt-lookup draft, accepting draft token d with probability p(d) and
resampling rejections from p with d zeroed must emit tokens distributed
exactly as plain sampling from p (Leviathan et al. 2023 specialized to a
point-mass proposal).  Verified here by χ² against the analytic
distribution on a tiny vocab — the reference has no speculative path at
all (one token per forward, src/transformer.rs:316-384) and its sampler
is src/sampler.rs:43-106.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io import write_lmrs, random_weights
from lmrs_tpu.io.synthetic import tiny_config
from lmrs_tpu.ops.sampling import processed_probs
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.speculative import rejection_accept

# χ² critical values at α=0.001 (hard bound: a correct implementation
# fails one in a thousand runs; seeds are fixed so the suite is stable)
CHI2_001 = {3: 16.27, 5: 20.52, 7: 24.32}


def _chi2(counts: np.ndarray, probs: np.ndarray) -> float:
    n = counts.sum()
    exp = probs * n
    keep = exp > 1e-9
    return float(((counts[keep] - exp[keep]) ** 2 / exp[keep]).sum())


def _run_many(probs, draft, n_trials, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_trials)
    ok, emitted = jax.vmap(lambda kk: rejection_accept(probs, draft, kk))(
        keys)
    return np.asarray(ok), np.asarray(emitted)


def test_first_emitted_token_matches_target():
    """Marginal of emitted[0] must be exactly p_0, acceptance included:
    P(emit d_0) = p_0(d_0); P(emit x≠d_0) = (1-p_0(d_0))·p_0(x)/(1-p_0(d_0))."""
    V, k = 8, 3
    rng = np.random.default_rng(1)
    p = rng.dirichlet(np.ones(V) * 0.7, size=k + 1).astype(np.float32)
    probs = jnp.asarray(p)
    draft = jnp.asarray([2, 5, 1], jnp.int32)
    N = 40000
    ok, emitted = _run_many(probs, draft, N)
    counts = np.bincount(emitted[:, 0][~ok[:, 0]], minlength=V)
    # rejected-at-0 trials: emitted[0] ~ p_0 with draft[0] zeroed
    resid = p[0].copy()
    resid[2] = 0.0
    resid /= resid.sum()
    assert _chi2(counts, resid) < CHI2_001[7], "residual draw off target"
    # acceptance rate of draft[0] itself
    acc_rate = ok[:, 0].mean()
    assert abs(acc_rate - p[0][2]) < 4 * np.sqrt(p[0][2] / N) + 0.01
    # combined marginal = p_0 exactly
    first = np.where(ok[:, 0], 2, emitted[:, 0][:])
    # (emitted[0] IS draft[0]=2 when accepted — cross-check)
    np.testing.assert_array_equal(emitted[ok[:, 0], 0],
                                  np.full(ok[:, 0].sum(), 2))
    counts_all = np.bincount(first, minlength=V)
    assert _chi2(counts_all, p[0]) < CHI2_001[7]


def test_bonus_token_matches_row_k():
    """Full acceptance draws the bonus from row k WITHOUT zeroing."""
    V, k = 8, 2
    rng = np.random.default_rng(2)
    # high-probability drafts so full acceptance is common
    p = np.full((k + 1, V), 0.02, np.float32)
    p[0, 3] = 1 - 0.02 * (V - 1)
    p[1, 6] = 1 - 0.02 * (V - 1)
    p[2] = rng.dirichlet(np.ones(V)).astype(np.float32)
    probs = jnp.asarray(p)
    draft = jnp.asarray([3, 6], jnp.int32)
    ok, emitted = _run_many(probs, draft, 40000, seed=3)
    full = ok.all(1)
    assert full.mean() > 0.5
    counts = np.bincount(emitted[full, k], minlength=V)
    assert _chi2(counts, p[2]) < CHI2_001[7]


def test_sequential_acceptance_semantics():
    """Tokens after the first rejection are the padded draft (ignored by
    the caller); emitted[n_acc] is never the rejected draft token unless
    it's the bonus row."""
    V, k = 6, 3
    rng = np.random.default_rng(4)
    p = rng.dirichlet(np.ones(V), size=k + 1).astype(np.float32)
    probs = jnp.asarray(p)
    draft = jnp.asarray([1, 4, 2], jnp.int32)
    ok, emitted = _run_many(probs, draft, 4000, seed=5)
    n_acc = np.argmin(np.concatenate(
        [ok, np.zeros((ok.shape[0], 1), bool)], 1), axis=1)
    d = np.asarray(draft)
    for i in range(ok.shape[0]):
        # accepted prefix is the draft verbatim
        np.testing.assert_array_equal(emitted[i, :n_acc[i]], d[:n_acc[i]])
        if n_acc[i] < k:
            assert emitted[i, n_acc[i]] != d[n_acc[i]], \
                "resample returned the zeroed draft token"


def test_processed_probs_matches_numpy_oracle():
    """processed_probs == an independent numpy nucleus oracle (sorted-
    prefix truncation, renormalized), for scalar and per-slot params."""
    rng = np.random.default_rng(6)
    logits = rng.normal(0, 2.0, (5, 16)).astype(np.float32)

    def oracle(row, t, tp):
        z = row / max(t, 1e-6)
        e = np.exp(z - z.max())
        pr = e / e.sum()
        if not (0.0 < tp < 1.0):
            return pr
        order = np.argsort(-pr, kind="stable")
        cs = np.cumsum(pr[order])
        m = int(np.searchsorted(cs, tp) + 1)  # first prefix with mass > tp
        keep = order[:m]
        out = np.zeros_like(pr)
        out[keep] = pr[keep]
        return out / out.sum()

    for t, tp in [(0.7, 0.9), (1.0, 0.3), (0.5, 1.0), (2.0, 0.0)]:
        got = np.asarray(processed_probs(jnp.asarray(logits), t, tp))
        want = np.stack([oracle(r, t, tp) for r in logits])
        np.testing.assert_allclose(got, want, atol=2e-6)
    # per-slot traced params
    temps = jnp.asarray([0.7, 1.0, 0.5, 2.0, 0.9])
    tps = jnp.asarray([0.9, 0.3, 1.0, 0.0, 0.5])
    got = np.asarray(processed_probs(jnp.asarray(logits), temps, tps))
    want = np.stack([oracle(r, float(t), float(tp))
                     for r, t, tp in zip(logits, temps, tps)])
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.fixture(scope="module")
def tiny_engine(tmp_path_factory):
    from lmrs_tpu.io import read_lmrs
    from lmrs_tpu.io.params import params_from_lmrs
    from lmrs_tpu.runtime import Engine

    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0)
    path = str(tmp_path_factory.mktemp("spec") / "t.lmrs")
    write_lmrs(path, cfg, random_weights(cfg, 11))
    f = read_lmrs(path)
    return Engine(f.cfg, params_from_lmrs(f), min_attn_bucket=64,
                  prefill_chunk=8, decode_chunk=4)


def test_spec_sampled_end_to_end_deterministic(tiny_engine):
    """Sampled speculative generate: runs, reproducible per seed, uses
    the speculative path, and differs across seeds (actually sampling)."""
    from lmrs_tpu.runtime import GenerationConfig

    eng = tiny_engine
    outs = []
    for seed in (7, 7, 8):
        eng.reset()
        gen = GenerationConfig(temperature=0.9, top_p=0.9, seed=seed,
                               max_new_tokens=24, speculative_k=3)
        outs.append(eng.generate([1, 5, 9, 2, 5, 9], gen))
        assert len(outs[-1]) == 24
    assert outs[0] == outs[1], "same seed must reproduce"
    assert eng.metrics.spec_proposed > 0, "speculative path unused"


def test_spec_sampled_mesh_engine():
    """Sampled speculation on a tp mesh: the PRNG key rides replicated and
    the logits are all_gathered, so every shard draws identical
    accept/resample decisions — reproducible per seed, and the degenerate
    nucleus (top_p=1e-6) equals greedy exactly like the single-device
    path."""
    import jax

    from lmrs_tpu.parallel.sharding import make_mesh
    from lmrs_tpu.parallel.tp import build_tp_params_stacked
    from lmrs_tpu.runtime import Engine, GenerationConfig
    from test_tp import _quantized_tensors

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=64,
                      hidden_dim=128, n_layers=2, n_heads=8, head_dim=16,
                      n_kv_heads=4, vocab_size=512, seq_len=128,
                      group_size=16, matmul_impl="fast")
    weights = random_weights(cfg, seed=7)
    mesh = make_mesh(tp=4, dp=1, devices=jax.devices()[:4])
    tp_params, spec = build_tp_params_stacked(
        cfg, _quantized_tensors(cfg, weights), mesh)
    eng = Engine(cfg, tp_params, cache_dtype=jnp.float32,
                 min_attn_bucket=32, prefill_chunk=8, decode_chunk=4,
                 mesh=mesh, param_spec=spec)
    prompt = [5, 9, 11, 5, 9, 11, 5, 9]
    outs = []
    for seed in (3, 3):
        eng.reset()
        outs.append(eng.generate(prompt, GenerationConfig(
            temperature=0.8, top_p=0.9, seed=seed, max_new_tokens=16,
            speculative_k=3)))
    assert outs[0] == outs[1], "mesh sampled spec not reproducible"
    assert eng.metrics.spec_proposed > 0
    eng.reset()
    want = eng.generate(prompt, GenerationConfig(temperature=0.0,
                                                 max_new_tokens=16))
    eng.reset()
    got = eng.generate(prompt, GenerationConfig(
        temperature=1.5, top_p=1e-6, seed=5, max_new_tokens=16,
        speculative_k=3))
    assert got == want


def test_spec_sampled_degenerate_nucleus_equals_greedy(tiny_engine):
    """top_p=1e-6 truncates the nucleus to exactly the argmax token, so
    the SAMPLED speculative stream must equal the greedy stream token for
    token — a sharp end-to-end check that temperature/top_p actually
    reach the rejection-sampling path (and that its resampling draws from
    the processed, not raw, distribution)."""
    from lmrs_tpu.runtime import GenerationConfig

    eng = tiny_engine
    eng.reset()
    out_spec = eng.generate([1, 5, 9], GenerationConfig(
        temperature=1.5, top_p=1e-6, seed=3, max_new_tokens=16,
        speculative_k=3))
    assert eng.metrics.spec_proposed > 0
    eng.reset()
    out_greedy = eng.generate([1, 5, 9], GenerationConfig(
        temperature=0.0, max_new_tokens=16))
    assert out_spec == out_greedy

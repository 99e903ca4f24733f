"""Sampler/logprob differential vs a reference-faithful torch pipeline.

The accuracy-parity last mile (VERDICT r2 #3): the engine's claim "any
pass@1 gap vs the reference is attributable to weights, not the engine"
needs the PROCESSED-LOGITS pipeline to match what vLLM's sampler would do
under the reference's forwarded params (trainer/vllm_client.py:498-520
forwards n, repetition_penalty, temperature, top_p, top_k, min_p).

`torch_vllm_pipeline` below is a line-faithful torch re-implementation of
vLLM 0.11's sampler order and masking semantics:
  penalties -> temperature -> top-k/top-p (one ascending sort; top-k mask,
  softmax, cumsum <= 1-p mask with last-kept guarantee) -> min-p
(vllm/model_executor/layers/sampler.py: _apply_penalties, _apply_top_k_top_p,
_apply_min_p). The tests assert, on shared random logits:

- identical surviving-token (truncation) sets, and
- identical log-softmax values on survivors (the logprobs the MCTS priors
  and eval JSONL consume),

for our full-vocab-sort path AND the static_top_k fast path with
``approx_top_k=False`` (the approx path deliberately trades exactness —
documented in sampling.process_logits — and is excluded here), at the
canonical eval params (README.md:148-157: temp 0.3 / top_p 0.8 / top_k 20 /
rep_pen 1.05) among others.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lapha_tpu.engine import sampling

NEG = -float("inf")


def torch_vllm_pipeline(logits, presence=None, repetition_penalty=None,
                        temperature=None, top_k=None, top_p=None, min_p=None):
    """vLLM-order processed logits. All params scalar floats (or None);
    logits (B, V) f32 torch; presence (B, V) bool."""
    x = logits.clone().float()
    B, V = x.shape

    if repetition_penalty is not None and presence is not None:
        # vllm _apply_penalties: rep-pen over prompt+output token presence;
        # positive logits divided, negative multiplied
        p = torch.tensor(float(repetition_penalty))
        penalized = torch.where(x > 0, x / p, x * p)
        x = torch.where(presence, penalized, x)

    if temperature is not None and temperature > 0:
        x = x / max(float(temperature), 1e-6)

    do_k = top_k is not None and 0 < int(top_k) < V
    do_p = top_p is not None and float(top_p) < 1.0
    if do_k or do_p:
        # _apply_top_k_top_p: ONE ascending sort
        logits_sort, logits_idx = x.sort(dim=-1, descending=False)
        if do_k:
            n_removed = V - int(top_k)
            mask = torch.arange(V)[None, :].expand(B, V) < n_removed
            logits_sort = logits_sort.masked_fill(mask, NEG)
        if do_p:
            probs_sort = logits_sort.softmax(dim=-1)
            probs_sum = probs_sort.cumsum(dim=-1)
            mask = probs_sum <= 1 - float(top_p)
            mask[:, -1] = False  # at least one token survives
            logits_sort = logits_sort.masked_fill(mask, NEG)
        x = torch.empty_like(x).scatter_(-1, logits_idx, logits_sort)

    if min_p is not None and float(min_p) > 0:
        probs = x.softmax(dim=-1)
        keep = probs >= float(min_p) * probs.max(dim=-1, keepdim=True).values
        x = torch.where(keep, x, torch.full_like(x, NEG))

    return x


CANONICAL = dict(temperature=0.3, top_p=0.8, top_k=20,
                 repetition_penalty=1.05, min_p=None)
PARAM_SETS = [
    CANONICAL,
    dict(temperature=0.8, top_p=0.95, top_k=20, repetition_penalty=1.0, min_p=None),
    dict(temperature=1.0, top_p=1.0, top_k=50, repetition_penalty=1.1, min_p=None),
    dict(temperature=0.7, top_p=0.9, top_k=-1, repetition_penalty=1.05, min_p=0.05),
    dict(temperature=1.3, top_p=0.6, top_k=5, repetition_penalty=1.2, min_p=0.1),
]


def _ours(logits_np, presence_np, ps, static_top_k=0):
    B = logits_np.shape[0]

    def vec(v, off):
        return None if v is None else jnp.full((B,), float(v) if v is not None else off, jnp.float32)

    tk = ps["top_k"]
    out = sampling.process_logits(
        jnp.asarray(logits_np),
        presence=jnp.asarray(presence_np.astype(np.int8)),
        repetition_penalty=vec(ps["repetition_penalty"], 1.0),
        temperature=vec(ps["temperature"], 1.0),
        top_k=None if tk is None else jnp.full((B,), int(tk), jnp.int32),
        top_p=vec(ps["top_p"], 1.0),
        min_p=vec(ps["min_p"], 0.0) if ps["min_p"] is not None else None,
        static_top_k=static_top_k,
        approx_top_k=False,
    )
    return np.asarray(out)


@pytest.mark.parametrize("ps", PARAM_SETS,
                         ids=[f"t{p['temperature']}_p{p['top_p']}_k{p['top_k']}"
                              for p in PARAM_SETS])
def test_processed_logits_match_vllm_pipeline(ps):
    rng = np.random.default_rng(17)
    B, V = 8, 503  # odd vocab: no tiling accidents
    logits = (rng.normal(size=(B, V)) * 3).astype(np.float32)
    presence = rng.uniform(size=(B, V)) < 0.05

    ref = torch_vllm_pipeline(
        torch.tensor(logits), presence=torch.tensor(presence),
        repetition_penalty=ps["repetition_penalty"], temperature=ps["temperature"],
        top_k=ps["top_k"], top_p=ps["top_p"], min_p=ps["min_p"]).numpy()
    ours = _ours(logits, presence, ps)

    ref_keep = np.isfinite(ref)
    our_keep = ours > sampling.NEG_INF / 2
    np.testing.assert_array_equal(our_keep, ref_keep,
                                  err_msg="truncation sets diverge")

    # logprobs over survivors — what MCTS priors / eval JSONL consume
    ref_lp = torch.tensor(ref).log_softmax(-1).numpy()
    our_lp = np.asarray(jnp.asarray(
        np.where(our_keep, ours, -1e30))).astype(np.float32)
    our_lp = our_lp - np.log(np.exp(
        np.where(our_keep, ours - ours.max(-1, keepdims=True), -np.inf)).sum(-1, keepdims=True)) - ours.max(-1, keepdims=True)
    np.testing.assert_allclose(our_lp[our_keep], ref_lp[ref_keep],
                               rtol=1e-4, atol=1e-5)


def test_static_top_k_fast_path_is_exact():
    """The lax.top_k candidate-set fast path (the engine's decode hot path,
    approx OFF) must equal the full-vocab-sort path bit-for-bit in keep-set
    and match torch on logprobs at the canonical eval params."""
    rng = np.random.default_rng(29)
    B, V = 16, 1111
    logits = (rng.normal(size=(B, V)) * 2.5).astype(np.float32)
    presence = rng.uniform(size=(B, V)) < 0.03
    ps = CANONICAL

    full = _ours(logits, presence, ps, static_top_k=0)
    fast = _ours(logits, presence, ps, static_top_k=64)
    np.testing.assert_array_equal(full > sampling.NEG_INF / 2,
                                  fast > sampling.NEG_INF / 2)
    keep = full > sampling.NEG_INF / 2
    np.testing.assert_allclose(full[keep], fast[keep], rtol=1e-6, atol=1e-6)

    ref = torch_vllm_pipeline(
        torch.tensor(logits), presence=torch.tensor(presence),
        repetition_penalty=ps["repetition_penalty"], temperature=ps["temperature"],
        top_k=ps["top_k"], top_p=ps["top_p"]).numpy()
    np.testing.assert_array_equal(keep, np.isfinite(ref))


def test_greedy_matches_vllm_argmax():
    """temperature=0 rows: vLLM takes argmax of the PENALIZED logits
    (penalties apply, truncation does not). sample() must agree."""
    import jax

    rng = np.random.default_rng(3)
    B, V = 6, 257
    logits = (rng.normal(size=(B, V)) * 3).astype(np.float32)
    presence = rng.uniform(size=(B, V)) < 0.1

    tok, lp = sampling.sample(
        jnp.asarray(logits), jax.random.key(0),
        presence=jnp.asarray(presence.astype(np.int8)),
        repetition_penalty=jnp.full((B,), 1.3, jnp.float32),
        temperature=jnp.zeros((B,), jnp.float32),
        top_k=jnp.full((B,), 20, jnp.int32),
        top_p=jnp.full((B,), 0.8, jnp.float32))

    pen = torch_vllm_pipeline(torch.tensor(logits),
                              presence=torch.tensor(presence),
                              repetition_penalty=1.3)
    np.testing.assert_array_equal(np.asarray(tok), pen.argmax(-1).numpy())
    assert np.all(np.asarray(lp) <= 0.0)


def test_sampled_tokens_always_inside_vllm_keep_set():
    """10k samples at the canonical params: every sampled token lies inside
    the torch-reference truncation set, and empirical frequencies match the
    processed softmax (chi-square-ish sanity, loose bound)."""
    import jax

    rng = np.random.default_rng(41)
    B, V = 4, 331
    logits = (rng.normal(size=(B, V)) * 2).astype(np.float32)
    presence = np.zeros((B, V), bool)
    ps = CANONICAL

    ref = torch_vllm_pipeline(
        torch.tensor(logits), repetition_penalty=None, presence=None,
        temperature=ps["temperature"], top_k=ps["top_k"], top_p=ps["top_p"]).numpy()
    keep = np.isfinite(ref)
    probs = torch.tensor(ref).softmax(-1).numpy()

    counts = np.zeros((B, V))
    N = 10000
    keys = jax.random.split(jax.random.key(7), N)
    B_ = B

    def draw(key):
        tok, _ = sampling.sample(
            jnp.asarray(logits), key,
            temperature=jnp.full((B_,), ps["temperature"], jnp.float32),
            top_k=jnp.full((B_,), ps["top_k"], jnp.int32),
            top_p=jnp.full((B_,), ps["top_p"], jnp.float32))
        return tok

    toks = np.asarray(jax.vmap(draw)(keys))  # (N, B)
    for b in range(B):
        assert keep[b, toks[:, b]].all(), "sampled token outside vLLM keep set"
        binc = np.bincount(toks[:, b], minlength=V)
        counts[b] = binc
    emp = counts / N
    np.testing.assert_allclose(emp[keep], probs[keep], atol=0.02)

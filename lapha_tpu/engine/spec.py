"""Prompt-lookup speculative decoding (engine ``spec_decode="pld"``).

Beyond-parity serving capability (ROADMAP/VERDICT r2 #5): the reference's
vLLM 0.11 deployment (vllm_start.sh) runs no speculative decoding. MCTS
rollouts are unusually PLD-friendly — child completions heavily overlap
their parent context (quoted math expressions, repeated tool outputs,
degenerate reasoning loops) — so n-gram lookup over the row's OWN token
history proposes drafts for free (no draft model).

TPU-first shape of the scheme:
- drafting is pure device arithmetic over a (B, H) token-history array
  (shifted equality + argmax — no host round-trip, stays inside the
  single-dispatch ``lax.while_loop``);
- verification is ONE ``qwen2.decode_step_multi`` forward of K+1 tokens:
  decode is weight-bandwidth-bound, so the weight/cache reads for K+1
  tokens cost what 1 does — accepted drafts are nearly free tokens;
- acceptance runs the SAME processed-logits pipeline as the normal loop
  (sampling.process_logits, presence evolving inside the window): sampled
  streams are distribution-exact via delta-proposal rejection sampling
  (accept draft d with prob p(d); on rejection sample from p with d masked
  — the marginal at every position is exactly p), and greedy streams are
  bit-identical to non-speculative greedy on deterministic backends
  (asserted on CPU in tests/test_spec.py). On TPU the K+1-token verify
  einsum's logits differ from the 1-token einsum at float-ulp level
  (different MXU tiling — the same class of difference as any batch-shape
  change), so greedy argmax near-ties can occasionally flip;
  scripts/bench_spec.py reports the measured prefix agreement.

Cache discipline: every iteration writes K+1 columns but only 1+accepted
stay valid — rejected columns leave permanent holes, so validity is a
per-row (B, S) bitmap (see decode_step_multi) and the engine sizes the
decode region at (K+1)x the token budget for the zero-acceptance worst
case. That memory trade (documented in Engine.__init__) is the price of
keeping the slot-uniform contiguous write.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ngram_propose(seq: jax.Array, cur: jax.Array, K: int, M: int = 2):
    """Draft K tokens per row by prompt lookup.

    seq: (B, H) token history (prompt + emitted so far), valid in [0, cur).
    cur: (B,) current lengths. Finds the LATEST position j < cur-1 whose
    M-gram seq[j-M+1 .. j] equals the current suffix seq[cur-M .. cur-1]
    and proposes the continuation seq[j+1 .. j+K]. Returns
    (draft (B, K) int32, draft_len (B,) int32 in [0, K]).
    """
    B, H = seq.shape
    ar = jnp.arange(H)[None, :]
    match = jnp.ones((B, H), bool)
    for m in range(M):
        # suffix token at offset m from the end: seq[cur - M + m]
        suf = jnp.take_along_axis(
            seq, jnp.maximum(cur[:, None] - M + m, 0), axis=1)  # (B, 1)
        # candidate j matches at offset m via seq[j - (M-1) + m]
        shifted = jnp.roll(seq, (M - 1) - m, axis=1)
        match &= shifted == suf
    # j must have a full M-gram before it and not be the suffix itself
    match &= (ar >= M - 1) & (ar < cur[:, None] - 1) & (cur[:, None] >= M + 1)
    j = jnp.argmax(jnp.where(match, ar, -1), axis=1)  # latest match
    has = jnp.any(match, axis=1)
    idx = j[:, None] + 1 + jnp.arange(K)[None, :]          # (B, K)
    draft = jnp.take_along_axis(seq, jnp.minimum(idx, H - 1), axis=1)
    # continuation tokens must already exist: idx < cur
    avail = jnp.sum((idx < cur[:, None]).astype(jnp.int32), axis=1)
    draft_len = jnp.where(has, avail, 0).astype(jnp.int32)
    return draft.astype(jnp.int32), draft_len


def scatter_emit(buf: jax.Array, em: jax.Array, toks: jax.Array,
                 emit_mask: jax.Array):
    """Write a variable-length window of tokens per row into the emit buffer.

    buf (B, T), em (B,) current counts, toks (B, W) window values,
    emit_mask (B, W) which window positions were emitted. Position w of row
    b lands at column em[b] + (number of emitted positions before w)."""
    offs = jnp.cumsum(emit_mask.astype(jnp.int32), axis=1) - 1  # (B, W)
    cols = em[:, None] + offs
    T = buf.shape[1]
    onehot = (jnp.arange(T)[None, None, :] == cols[:, :, None])  # (B, W, T)
    onehot &= emit_mask[:, :, None]
    upd = jnp.einsum("bwt,bw->bt", onehot.astype(buf.dtype), toks.astype(buf.dtype))
    keep = ~jnp.any(onehot, axis=1)
    return jnp.where(keep, buf, upd.astype(buf.dtype))


def pick_with_draft(logits, key, draft, has_draft, *, presence,
                    repetition_penalty, temperature, top_k, top_p, min_p,
                    static_top_k, approx_top_k):
    """One position of the acceptance chain: (token (B,), logprob (B,)).

    Runs the exact engine sampling pipeline (sampling.process_logits) on
    this position's logits, then:
    - sampled rows: delta-proposal rejection — accept the draft with
      probability p(draft); on rejection sample from p with the draft
      masked out (renormalized), so the marginal is exactly p;
    - greedy rows (temperature <= 0): penalized argmax, identical to
      sampling.sample — the draft is "accepted" iff it equals the argmax,
      which the caller detects by comparing the returned token.
    Rows with has_draft=False sample from the full processed distribution
    (this is then a plain, non-speculative pick)."""
    from . import sampling

    processed = sampling.process_logits(
        logits, presence=presence, repetition_penalty=repetition_penalty,
        temperature=temperature, top_k=top_k, top_p=top_p, min_p=min_p,
        static_top_k=static_top_k, approx_top_k=approx_top_k)
    logp = jax.nn.log_softmax(processed, axis=-1)
    B, V = logits.shape
    k1, k2 = jax.random.split(key)

    p_d = jnp.exp(jnp.take_along_axis(logp, draft[:, None], 1)[:, 0])
    accept = has_draft & (jax.random.uniform(k1, (B,)) < p_d)
    is_d = jnp.arange(V)[None, :] == draft[:, None]
    resample_src = jnp.where(is_d & (has_draft & ~accept)[:, None],
                             sampling.NEG_INF, processed)
    tok_s = jnp.where(accept, draft,
                      jax.random.categorical(k2, resample_src, axis=-1))

    greedy_src = logits.astype(jnp.float32)
    if repetition_penalty is not None and presence is not None:
        greedy_src = sampling.apply_repetition_penalty(
            greedy_src, presence, repetition_penalty)
    greedy = jnp.argmax(greedy_src, axis=-1)
    tok = jnp.where(temperature <= 0.0, greedy, tok_s).astype(jnp.int32)
    lp = jnp.take_along_axis(logp, tok[:, None], 1)[:, 0]
    return tok, lp

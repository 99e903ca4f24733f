"""TPU-native block-diffusion generation (SDAR/JetEngine semantics).

The reference's ``ENGINE=jet`` eval path adapts an external JetEngine
runtime for SDAR diffusion LMs (reference eval/adapters.py:159-379): the
model is autoregressive ACROSS fixed-length blocks and a masked-denoising
diffusion WITHIN each block — per block it starts from all-[MASK] tokens
and iteratively reveals positions by sampling confidence, so several
tokens commit per forward pass. This module is a native implementation of
that decoding loop on top of the Engine's prefill/KV machinery instead of
an adapter over a CUDA runtime.

TPU-first design: the whole generation — every denoising forward, the
per-block commit, and the block advance — runs inside ONE
``lax.while_loop`` device dispatch (like Engine._decode_impl), so there
are zero host round-trips mid-generation. Each iteration forwards the
current T_blk-token block through the cached model forward with a
block-CAUSAL mask (bidirectional inside the block, causal over the
committed past — ``qwen2.forward(block_bidir=True)``); block shapes are
static, so XLA compiles a single program whose MXU work per step is a
T_blk-row matmul stack.

Loop invariant: an iteration whose block is fully revealed at ENTRY is a
*commit* step — the forward it just ran recomputed the block's K/V from
the clean tokens (the revealed tokens' K/V from earlier denoise steps
were produced with [MASK] embeddings still in place), the tokens land in
the output buffer, and the loop advances to the next all-[MASK] block.
Otherwise it is a *denoise* step: sample every still-masked position from
the block logits, reveal per the remasking strategy, and loop. A block
therefore costs (#denoise steps until clean) + 1 forwards; with
``low_confidence_dynamic`` that is frequently 2 forwards for a whole
block — the tokens/forward > 1 regime that makes diffusion LMs fast.

Remasking strategies (reference eval/adapters.py:237-246 env defaults):
  low_confidence_dynamic  reveal everything with confidence >= threshold,
                          always at least the top-1 (default, SDAR's)
  low_confidence_static   reveal the ceil(T_blk/steps) most confident
  sequential              reveal the ceil(T_blk/steps) leftmost masked
All strategies force a full reveal on the ``denoising_steps``-th pass.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from . import sampling
from .adapter import CompletionOutput, RequestOutput
from .engine import Engine, _round_up


_SHARED_DIFF_JITS: dict = {}


def _shared_diffusion_jits(es) -> dict:
    """Per-statics diffusion jit wrappers (see engine._shared_engine_jits).

    No donate_argnums on "diff": the sync loop does not RETURN the cache,
    so there is no output buffer to alias (donation would only warn); the
    while_loop carries the cache in place on-device regardless. "chunk"
    (the continuous-batching variant — one committed block over the
    scheduler's persistent prefill-layout cache per dispatch) returns
    ck/cv, so donation aliases the persistent cache instead of
    double-buffering it every chunk."""
    import functools

    jits = _SHARED_DIFF_JITS.get(es)
    if jits is None:
        p = functools.partial
        jits = _SHARED_DIFF_JITS[es] = {
            "diff": jax.jit(
                p(DiffusionEngine._diffusion_impl, es),
                static_argnames=("Lp", "Tb", "nblocks", "steps", "strategy",
                                 "static_top_k")),
            "chunk": jax.jit(
                p(DiffusionEngine._diff_chunk_impl, es),
                donate_argnums=(1, 2),
                static_argnames=("Tb", "steps", "strategy",
                                 "static_top_k")),
        }
    return jits

NEG_INF = -1e30
STRATEGIES = ("low_confidence_dynamic", "low_confidence_static", "sequential")


class DiffusionEngine(Engine):
    """Engine whose generate() runs block-diffusion instead of AR decode.

    Reuses the base Engine's tokenizer handling, batched/prefix-reuse
    prefill (_prefill_rows) and wave batching; only the token-production
    loop differs. Serves SDAR-class checkpoints: Qwen2-family bodies with
    a reserved [MASK] token id (JetEngine's ``mask_token_id``).

    Composes with continuous batching (``auto_continuous=True`` or an
    explicit :class:`~.scheduler.ContinuousEngine`): the scheduler's
    persistent batch then advances one committed BLOCK per chunk via
    :meth:`_diff_chunk_impl` — block-quantized column growth is
    compatible with slot admission/compaction because every chunk
    boundary is a commit boundary (no half-denoised block ever persists
    between dispatches).
    """

    decode_kind = "diffusion"

    def __init__(self, params, cfg, tokenizer, *,
                 mask_token_id: int,
                 block_length: int = 4,
                 denoising_steps: int = 4,
                 remasking_strategy: str = "low_confidence_dynamic",
                 dynamic_threshold: float = 0.9,
                 **kw):
        if kw.get("spec_decode") or kw.get("seq_mesh") is not None:
            raise ValueError("diffusion generation does not compose with "
                             "spec_decode/seq_mesh")
        if kw.pop("collect_h0", False):
            raise ValueError("diffusion generation does not collect h0 "
                             "(value-mode MCTS drives the AR Engine)")
        if kw.get("kv_quant"):
            raise ValueError("diffusion does not support kv_quant yet "
                             "(denoise steps REWRITE block K/V in place; "
                             "the quantized decode layout is append-only)")
        super().__init__(params, cfg, tokenizer, **kw)
        if self._mod is not qwen2:
            raise ValueError("diffusion generation is qwen2-family only "
                             "(SDAR checkpoints are Qwen-based)")
        if int(cfg.sliding_window or 0) or cfg.layer_windows or \
                getattr(cfg, "attn_sinks", False):
            raise ValueError("diffusion does not support windowed/sink "
                             "attention stacks")
        if not 0 <= int(mask_token_id) < cfg.vocab_size:
            raise ValueError(f"mask_token_id {mask_token_id} outside vocab")
        if remasking_strategy not in STRATEGIES:
            raise ValueError(f"unknown remasking_strategy "
                             f"{remasking_strategy!r}; one of {STRATEGIES}")
        if int(block_length) < 1 or int(denoising_steps) < 1:
            raise ValueError("block_length and denoising_steps must be >= 1")
        self.mask_token_id = int(mask_token_id)
        self.block_length = int(block_length)
        self.denoising_steps = int(denoising_steps)
        self.remasking_strategy = str(remasking_strategy)
        self.dynamic_threshold = float(dynamic_threshold)
        # per-generate stats (forwards vs tokens — the diffusion speedup)
        self.last_diffusion_stats: dict | None = None
        # shared wrappers, keyed by the base-engine statics + mask id (the
        # only extra static the diffusion programs read) — same
        # cross-instance compile sharing as Engine's programs
        es = self._es._replace(mask_token_id=self.mask_token_id)
        jits = _shared_diffusion_jits(es)
        self._diff_jit = jits["diff"]
        self._diff_chunk_jit = jits["chunk"]

    # ------------------------------------------------------------- reveal
    @staticmethod
    def _reveal_step(es, logits, blk_tok, blk_masked, blk_lp, d, key, *,
                     temperature, top_k, top_p, min_p, threshold,
                     Tb: int, steps: int, strategy: str, static_top_k: int):
        """One denoise step: sample every position, reveal per strategy.

        Shared by the sync loop (:meth:`_diffusion_impl`) and the
        continuous-batching chunk (:meth:`_diff_chunk_impl`). Returns the
        updated (blk_tok, blk_masked, blk_lp, key)."""
        B = blk_tok.shape[0]
        k_reveal = max(1, math.ceil(Tb / steps))
        key, sub = jax.random.split(key)
        flat = logits.reshape(B * Tb, -1).astype(jnp.float32)
        # the model must not reveal [MASK] itself
        flat = flat.at[:, es.mask_token_id].set(NEG_INF)
        rep = lambda v: (None if v is None else jnp.repeat(v, Tb, axis=0))
        cand_f, lp_f = sampling.sample(
            flat, sub, temperature=rep(temperature),
            top_k=rep(top_k), top_p=rep(top_p), min_p=rep(min_p),
            static_top_k=static_top_k, approx_top_k=es.approx_top_k)
        cand = cand_f.reshape(B, Tb)
        cand_lp = lp_f.reshape(B, Tb)
        conf = jnp.exp(cand_lp)
        conf_m = jnp.where(blk_masked, conf, -jnp.inf)
        if strategy == "low_confidence_dynamic":
            top1 = jax.nn.one_hot(jnp.argmax(conf_m, axis=1), Tb,
                                  dtype=jnp.bool_)
            reveal = blk_masked & ((conf >= threshold[:, None]) | top1)
        elif strategy == "low_confidence_static":
            # rank by confidence among masked (exact count via
            # double-argsort rank; Tb is tiny so the sort is free)
            rank = jnp.argsort(jnp.argsort(-conf_m, axis=1), axis=1)
            reveal = blk_masked & (rank < k_reveal)
        else:  # sequential: leftmost masked positions
            midx = jnp.where(blk_masked, jnp.arange(Tb)[None, :], Tb)
            rank = jnp.argsort(jnp.argsort(midx, axis=1), axis=1)
            reveal = blk_masked & (rank < k_reveal)
        last = (d + 1) >= steps
        reveal = jnp.where(last, blk_masked, reveal)
        return (jnp.where(reveal, cand, blk_tok),
                blk_masked & ~reveal,
                jnp.where(reveal, cand_lp, blk_lp), key)

    # ---------------------------------------------------------------- loop
    @staticmethod
    def _diffusion_impl(es, params, ck, cv, lens, fin0, key, temperature,
                        top_k, top_p, min_p, threshold, *,
                        Lp: int, Tb: int, nblocks: int, steps: int,
                        strategy: str, static_top_k: int):
        """One device dispatch for the whole generation.

        ck/cv: prefill-layout cache (L, B, S, nkv, dh) with prompts at
        slots [0, lens[b]). Block b occupies slots
        [Lp + b*Tb, Lp + (b+1)*Tb) — uniform across rows, like the AR
        decode loop's slot-uniform layout. Returns (out (B, nblocks*Tb),
        out_lp, finished, n_forwards).
        """
        cfg = es.cfg
        B = ck.shape[1]
        S = ck.shape[2]
        eos_ids = jnp.asarray(es.eos_token_ids or [-1], jnp.int32)
        mask_id = es.mask_token_id
        j = jnp.arange(S)[None, :]  # (1, S) slot index

        def body(st):
            (ck, cv, b, d, blk_tok, blk_masked, blk_lp, out, out_lp,
             finished, key, nfwd) = st
            cp = Lp + b * Tb
            pos = lens[:, None] + b * Tb + jnp.arange(Tb)[None, :]
            kvv = (j < lens[:, None]) | ((j >= Lp) & (j < cp + Tb))
            logits, _, (ck2, cv2) = qwen2.forward(
                params, cfg, blk_tok, positions=pos, kv_cache=(ck, cv),
                cache_pos=cp, kv_valid=kvv, block_bidir=True)
            entry_clean = ~jnp.any(blk_masked)

            def commit(op):
                out, out_lp, key = op
                out2 = jax.lax.dynamic_update_slice(out, blk_tok, (0, b * Tb))
                lp2 = jax.lax.dynamic_update_slice(out_lp, blk_lp, (0, b * Tb))
                fin2 = finished | jnp.any(
                    blk_tok[:, :, None] == eos_ids[None, None, :], axis=(1, 2))
                return (b + 1, jnp.zeros((), jnp.int32),
                        jnp.full((B, Tb), mask_id, jnp.int32),
                        jnp.ones((B, Tb), jnp.bool_),
                        jnp.zeros((B, Tb), jnp.float32),
                        out2, lp2, fin2, key)

            def denoise(op):
                out, out_lp, key = op
                tok2, msk2, lp2, key2 = DiffusionEngine._reveal_step(es, 
                    logits, blk_tok, blk_masked, blk_lp, d, key,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    min_p=min_p, threshold=threshold, Tb=Tb, steps=steps,
                    strategy=strategy, static_top_k=static_top_k)
                return (b, d + 1, tok2, msk2, lp2,
                        out, out_lp, finished, key2)

            (b2, d2, tok2, msk2, lp2, out2, olp2, fin2, key2) = jax.lax.cond(
                entry_clean, commit, denoise, (out, out_lp, key))
            return (ck2, cv2, b2, d2, tok2, msk2, lp2, out2, olp2, fin2,
                    key2, nfwd + 1)

        def cond(st):
            b, finished = st[2], st[9]
            return (b < nblocks) & ~jnp.all(finished)

        init = (ck, cv, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                jnp.full((B, Tb), es.mask_token_id, jnp.int32),
                jnp.ones((B, Tb), jnp.bool_),
                jnp.zeros((B, Tb), jnp.float32),
                jnp.zeros((B, nblocks * Tb), jnp.int32),
                jnp.zeros((B, nblocks * Tb), jnp.float32),
                fin0, key, jnp.zeros((), jnp.int32))
        st = jax.lax.while_loop(cond, body, init)
        return st[7], st[8], st[9], st[11]

    # ----------------------------------------------------- continuous chunk
    @staticmethod
    def _diff_chunk_impl(es, params, ck, cv, lens, dstart, fin, emitted,
                         budget, col, key, temperature, top_k, top_p,
                         min_p, threshold, *, Tb: int, steps: int,
                         strategy: str, static_top_k: int):
        """One COMMITTED block over the scheduler's persistent batch.

        ck/cv: prefill-layout persistent cache (L, B, S, nkv, dh); row r's
        prompt lives at slots [0, lens[r]) and its committed decode tokens
        at [dstart[r], col). This dispatch denoises the block at columns
        [col, col + Tb) to fully revealed and commits it (the entry-clean
        forward recomputes the block's K/V from clean tokens, same
        invariant as :meth:`_diffusion_impl`). Chunk boundaries are
        therefore commit boundaries: the scheduler may admit rows or
        compact columns between dispatches without ever observing a
        half-denoised block. All sampling knobs are per-row (B,) vectors —
        the persistent batch mixes requests.

        Returns (ck, cv, blk_tok (B,Tb), blk_lp, fin, emitted, n_forwards).
        """
        cfg = es.cfg
        B = ck.shape[1]
        S = ck.shape[2]
        eos_ids = jnp.asarray(es.eos_token_ids or [-1], jnp.int32)
        j = jnp.arange(S)[None, :]
        # row r's absolute position of the block start = prompt len +
        # tokens decoded so far (col - dstart[r] columns, all committed)
        pos = (lens + (col - dstart))[:, None] + jnp.arange(Tb)[None, :]
        kvv = (j < lens[:, None]) | ((j >= dstart[:, None]) & (j < col + Tb))

        def body(st):
            (ck, cv, d, blk_tok, blk_masked, blk_lp, fin2, em2, done,
             key, nfwd) = st
            logits, _, (ck2, cv2) = qwen2.forward(
                params, cfg, blk_tok, positions=pos, kv_cache=(ck, cv),
                cache_pos=col, kv_valid=kvv, block_bidir=True)
            entry_clean = ~jnp.any(blk_masked)

            def commit(op):
                fin2, em2, key = op
                has_eos = jnp.any(
                    blk_tok[:, :, None] == eos_ids[None, None, :],
                    axis=(1, 2))
                em3 = jnp.where(fin, em2, em2 + Tb)  # fin rows don't emit
                fin3 = fin2 | has_eos | (em3 >= budget)
                return (blk_tok, blk_masked, blk_lp, fin3, em3,
                        jnp.ones((), jnp.bool_), key)

            def denoise(op):
                fin2, em2, key = op
                tok2, msk2, lp2, key2 = DiffusionEngine._reveal_step(es, 
                    logits, blk_tok, blk_masked, blk_lp, d, key,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    min_p=min_p, threshold=threshold, Tb=Tb, steps=steps,
                    strategy=strategy, static_top_k=static_top_k)
                return (tok2, msk2, lp2, fin2, em2,
                        jnp.zeros((), jnp.bool_), key2)

            tok2, msk2, lp2, fin3, em3, done2, key2 = jax.lax.cond(
                entry_clean, commit, denoise, (fin2, em2, key))
            return (ck2, cv2, d + 1, tok2, msk2, lp2, fin3, em3, done2,
                    key2, nfwd + 1)

        init = (ck, cv, jnp.zeros((), jnp.int32),
                jnp.full((B, Tb), es.mask_token_id, jnp.int32),
                jnp.ones((B, Tb), jnp.bool_),
                jnp.zeros((B, Tb), jnp.float32),
                fin, emitted, jnp.zeros((), jnp.bool_), key,
                jnp.zeros((), jnp.int32))
        st = jax.lax.while_loop(lambda s: ~s[8], body, init)
        return st[0], st[1], st[3], st[5], st[6], st[7], st[10]

    # ------------------------------------------------------------ generate
    def _generate_chunk(self, prompts: list[str], sp, n: int,
                        encs: list[list[int]] | None = None):
        tok = self.tokenizer
        enc = (encs if encs is not None else
               [tok(p, add_special_tokens=True)["input_ids"] for p in prompts])
        max_prompt = self.max_model_len - 1
        enc = [list(ids)[-max_prompt:] for ids in enc]
        P = len(enc)
        max_len = max(len(e) for e in enc)
        max_new = int(getattr(sp, "max_tokens", 256) or 256)
        Tb = self.block_length
        nblocks = max(1, math.ceil(max_new / Tb))
        Lp = _round_up(min(self.max_model_len, max_len), self.pad_multiple)
        S = _round_up(Lp + nblocks * Tb, self.pad_multiple)

        _, (ck, cv), _h = self._prefill_rows(enc, S)

        # fan out to B = P*n rows sharing each prompt's prefill KV
        Bb = _round_up(P * n, self.batch_bucket)
        row_of = np.concatenate([np.repeat(np.arange(P), n),
                                 np.zeros(Bb - P * n, np.int64)])
        row_of_j = jnp.asarray(row_of)
        ck = ck[:, row_of_j]
        cv = cv[:, row_of_j]
        B = Bb
        lens = jnp.asarray([len(enc[r]) for r in row_of], jnp.int32)
        # bucket-padding rows are born finished so they never hold the
        # loop's all-finished early exit hostage (AR _generate_chunk does
        # the same)
        fin0 = jnp.zeros((B,), jnp.bool_).at[P * n:].set(True)

        def vec(x, default):
            v = getattr(sp, x, None)
            return jnp.full((B,), float(default if v is None else v),
                            jnp.float32)

        temperature = vec("temperature", 1.0)
        tp_val = float(getattr(sp, "top_p", 1.0) or 1.0)
        top_p = None if tp_val >= 1.0 else vec("top_p", 1.0)
        mp_val = float(getattr(sp, "min_p", 0.0) or 0.0)
        min_p = None if mp_val <= 0.0 else vec("min_p", 0.0)
        tk = getattr(sp, "top_k", -1)
        tk = int(-1 if tk is None else tk)
        top_k = None if tk <= 0 else jnp.full((B,), tk, jnp.int32)
        static_top_k = 0 if tk <= 0 else min(self.cfg.vocab_size, max(64, tk))
        # per-request SDAR knobs override the engine defaults (GenParams
        # carries them — reference eval/adapters.py:237-246)
        thr_sp = getattr(sp, "dynamic_threshold", None)
        thr = float(self.dynamic_threshold if thr_sp is None else thr_sp)
        threshold = jnp.full((B,), thr, jnp.float32)

        self._call_counter += 1
        seed = (sp.seed if getattr(sp, "seed", None) is not None
                else self._call_counter)
        key = jax.random.key(np.uint32(seed))

        out, out_lp, _fin, nfwd = self._diff_jit(
            self.params, ck, cv, lens, fin0, key, temperature, top_k, top_p,
            min_p, threshold, Lp=Lp, Tb=Tb, nblocks=nblocks,
            steps=self.denoising_steps, strategy=self.remasking_strategy,
            static_top_k=static_top_k)
        toks = np.asarray(out)[:, :max_new]
        lps = np.asarray(out_lp)[:, :max_new]

        eos_set = set(self.eos_token_ids)
        results = []
        emitted = 0
        for p in range(P):
            outs = []
            for jj in range(n):
                r = p * n + jj
                ids_out: list[int] = []
                lps_out: list[float] = []
                for t in range(toks.shape[1]):
                    ids_out.append(int(toks[r, t]))
                    lps_out.append(float(lps[r, t]))
                    if ids_out[-1] in eos_set:
                        break
                emitted += len(ids_out)
                finish = ("stop" if (ids_out and ids_out[-1] in eos_set)
                          else "length")
                text = (tok.decode(ids_out, skip_special_tokens=True)
                        if hasattr(tok, "decode") else None)
                outs.append(CompletionOutput(
                    token_ids=ids_out,
                    cumulative_logprob=float(np.sum(lps_out)),
                    token_logprobs=lps_out, text=text,
                    finish_reason=finish))
            results.append(RequestOutput(outputs=outs, prompt=prompts[p],
                                         prompt_token_ids=list(enc[p])))
        self.last_diffusion_stats = {
            "forwards": int(nfwd), "tokens": emitted,
            "tokens_per_forward": round(emitted / max(1, int(nfwd)), 3)}
        return results

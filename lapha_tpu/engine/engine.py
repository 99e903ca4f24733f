"""TPU-native batched generation engine (the vLLM replacement).

Replaces the reference's external vLLM server + HTTP client + NCCL weight
plane (/root/reference/trainer/vllm_client.py, vllm_start.sh) with an
in-process JAX engine:

- left-padded length-bucketed prefill: one jitted forward fills the KV cache
  for all unique prompts at once (positions derived from the pad mask, so
  every row's cache is aligned at a common decode offset);
- n-sample fan-out without recompute: the KV cache of each unique prompt is
  broadcast to its n sample rows with a device gather — MCTS's breadth-n
  expansion prefills each parent prompt exactly once;
- chunked device decode: `lax.scan` generates ``decode_chunk`` tokens per
  dispatch (sampling + cache update fused in one compiled step), the host
  only checks stop flags between chunks;
- per-token logprobs from the processed logits (priors for MCTS,
  vllm_client.py:870-881 semantics);
- weight sync is assignment: ``engine.update_params(new_params)`` shares the
  trainer's arrays — the reference's per-parameter gather+broadcast plane
  (mtpo_trainer.py:880-953) does not exist here.

Compiled shapes are bucketed: prompt length rounds up to ``pad_multiple``
and batch to ``batch_bucket`` so repeated MCTS calls hit the jit cache.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from . import sampling
from .adapter import CompletionOutput, RequestOutput, SamplingParams


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Engine:
    def __init__(
        self,
        params: Any,
        cfg: qwen2.Qwen2Config,
        tokenizer,
        *,
        max_model_len: int = 4096,
        max_batch: int = 16,
        decode_chunk: int = 16,
        pad_multiple: int = 128,
        batch_bucket: int = 4,
        eos_token_ids: Sequence[int] | None = None,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_model_len = int(max_model_len)
        self.max_batch = int(max_batch)
        self.decode_chunk = int(decode_chunk)
        self.pad_multiple = int(pad_multiple)
        self.batch_bucket = int(batch_bucket)
        self._call_counter = 0

        if eos_token_ids is None:
            eos = getattr(tokenizer, "eos_token_id", None)
            eos_token_ids = [eos] if eos is not None else []
        self.eos_token_ids = [int(e) for e in eos_token_ids if e is not None]

        self._prefill_jit = jax.jit(
            self._prefill_impl, static_argnames=("S",), donate_argnums=()
        )
        self._decode_jit = jax.jit(
            self._decode_impl,
            static_argnames=("T",),
            donate_argnums=(1, 2),  # donate kv cache
        )

    # ------------------------------------------------------------------ jit bodies

    def _prefill_impl(self, params, ids, mask, S: int):
        """ids/mask (P, Lp) left-padded. Returns (last_logits (P,V), kv (L,P,S,...))."""
        P, Lp = ids.shape
        cache = qwen2.init_kv_cache(self.cfg, P, S)
        kv_valid = jnp.zeros((P, S), jnp.bool_).at[:, :Lp].set(mask > 0)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, _, cache = qwen2.forward(
            params, self.cfg, ids,
            attention_mask=mask,
            positions=positions,
            kv_cache=cache,
            cache_pos=0,
            kv_valid=kv_valid,
        )
        return logits[:, -1, :], cache

    def _decode_impl(
        self, params, cache_k, cache_v, presence, last_logits,
        kv_valid, positions_next, finished, key,
        temperature, top_k, top_p, min_p, rep_pen,
        start_pos, T: int,
    ):
        """Generate T tokens for all B rows on device.

        Returns (tokens (B,T), logprobs (B,T), finished, cache, presence,
        kv_valid, positions, last_logits). Finished rows emit pad(0) tokens
        with logprob 0 and stop updating presence.
        """
        eos_arr = jnp.asarray(self.eos_token_ids or [-1], jnp.int32)

        def step(carry, t):
            ck, cv, pres, logits, kvv, pos, fin, k = carry
            k, sub = jax.random.split(k)
            tok, lp = sampling.sample(
                logits, sub,
                presence=pres,
                repetition_penalty=rep_pen,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                min_p=min_p,
            )
            is_eos = jnp.any(tok[:, None] == eos_arr[None, :], axis=1)
            emit = jnp.where(fin, 0, tok)
            emit_lp = jnp.where(fin, 0.0, lp)
            new_fin = fin | is_eos

            write_pos = start_pos + t
            B = tok.shape[0]
            pres = pres.at[jnp.arange(B), tok].max((~fin).astype(jnp.int8))
            # forward one token (finished rows still run; outputs ignored)
            new_logits, _, (ck, cv) = qwen2.forward(
                params, self.cfg, tok[:, None],
                positions=pos[:, None],
                kv_cache=(ck, cv),
                cache_pos=write_pos,
                kv_valid=kvv.at[:, write_pos].set(True),
            )
            kvv = kvv.at[:, write_pos].set(True)
            return (ck, cv, pres, new_logits[:, 0, :], kvv, pos + 1, new_fin, k), (emit, emit_lp)

        carry0 = (cache_k, cache_v, presence, last_logits, kv_valid, positions_next, finished, key)
        carry, (toks, lps) = jax.lax.scan(step, carry0, jnp.arange(T))
        ck, cv, pres, logits, kvv, pos, fin, _ = carry
        return toks.T, lps.T, fin, (ck, cv), pres, kvv, pos, logits

    # ------------------------------------------------------------------ public API

    def update_params(self, params) -> None:
        """Weight sync from the trainer: shared arrays, zero copies."""
        self.params = params

    def generate(self, prompts, sampling_params: SamplingParams, use_tqdm: bool = False):
        """vLLM-like entry: list[str] -> list[RequestOutput] with n samples each."""
        sp = sampling_params
        n = max(1, int(getattr(sp, "n", 1)))
        prompts = list(prompts)
        results: list[RequestOutput | None] = [None] * len(prompts)

        # chunk prompt groups so B = P*n <= max_batch
        group = max(1, self.max_batch // n)
        for lo in range(0, len(prompts), group):
            outs = self._generate_chunk(prompts[lo : lo + group], sp, n)
            for i, ro in enumerate(outs):
                results[lo + i] = ro
        return results

    def _generate_chunk(self, prompts: list[str], sp: SamplingParams, n: int):
        tok = self.tokenizer
        enc = [tok(p, add_special_tokens=True)["input_ids"] for p in prompts]
        # truncate from the left to leave room for generation
        max_prompt = self.max_model_len - 1
        enc = [ids[-max_prompt:] for ids in enc]
        P = len(enc)
        Lp = _round_up(max(len(e) for e in enc), self.pad_multiple)
        Lp = min(Lp, self.max_model_len)
        Pb = _round_up(P, self.batch_bucket)

        ids = np.zeros((Pb, Lp), np.int32)
        mask = np.zeros((Pb, Lp), np.int32)
        for i, e in enumerate(enc):
            ids[i, Lp - len(e) :] = e
            mask[i, Lp - len(e) :] = 1

        max_new = int(getattr(sp, "max_tokens", 256) or 256)
        S = min(self.max_model_len + max_new, Lp + max_new)
        S = _round_up(S, self.pad_multiple)

        last_logits, (ck, cv) = self._prefill_jit(self.params, jnp.asarray(ids), jnp.asarray(mask), S=S)

        # fan out to B = Pb*n rows (gather shares each prompt's KV across samples)
        B = Pb * n
        row_of = jnp.repeat(jnp.arange(Pb), n)
        ck = ck[:, row_of]
        cv = cv[:, row_of]
        last_logits = jnp.asarray(last_logits)[row_of]
        mask_rows = jnp.asarray(mask)[row_of]

        kv_valid = jnp.zeros((B, S), jnp.bool_).at[:, :Lp].set(mask_rows > 0)
        positions_next = jnp.sum(mask_rows, axis=1)  # next position index per row
        finished = jnp.zeros((B,), jnp.bool_)
        # repetition-penalty presence over prompt tokens
        ids_rows = jnp.asarray(ids)[row_of]
        presence = jnp.zeros((B, self.cfg.vocab_size), jnp.int8)
        presence = presence.at[
            jnp.repeat(jnp.arange(B), Lp), ids_rows.reshape(-1)
        ].max(mask_rows.reshape(-1).astype(jnp.int8))

        def vec(x, default):
            v = getattr(sp, x, None)
            return jnp.full((B,), float(default if v is None else v), jnp.float32)

        temperature = vec("temperature", 1.0)
        top_p = vec("top_p", 1.0)
        min_p = vec("min_p", 0.0)
        rep_pen = vec("repetition_penalty", 1.0)
        tk = getattr(sp, "top_k", -1)
        top_k = jnp.full((B,), int(-1 if tk is None else tk), jnp.int32)

        self._call_counter += 1
        seed = sp.seed if getattr(sp, "seed", None) is not None else self._call_counter
        key = jax.random.key(np.uint32(seed))

        all_toks: list[np.ndarray] = []
        all_lps: list[np.ndarray] = []
        steps_done = 0
        while steps_done < max_new:
            T = min(self.decode_chunk, max_new - steps_done)
            start = int(Lp + steps_done)
            key, sub = jax.random.split(key)
            toks, lps, finished, (ck, cv), presence, kv_valid, positions_next, last_logits = self._decode_jit(
                self.params, ck, cv, presence, last_logits,
                kv_valid, positions_next, finished, sub,
                temperature, top_k, top_p, min_p, rep_pen,
                start, T=T,
            )
            all_toks.append(np.asarray(toks))
            all_lps.append(np.asarray(lps))
            steps_done += T
            if bool(np.all(np.asarray(finished))):
                break

        toks = np.concatenate(all_toks, axis=1) if all_toks else np.zeros((B, 0), np.int32)
        lps = np.concatenate(all_lps, axis=1) if all_lps else np.zeros((B, 0), np.float32)
        fin = np.asarray(finished)

        eos_set = set(self.eos_token_ids)
        results = []
        for p in range(P):
            outs = []
            for j in range(n):
                r = p * n + j
                row = toks[r]
                row_lp = lps[r]
                # cut at first eos (inclusive); finished rows emit pad-0
                # after their eos, which the break never reaches
                ids_out: list[int] = []
                lps_out: list[float] = []
                for t in range(row.shape[0]):
                    tok_id = int(row[t])
                    ids_out.append(tok_id)
                    lps_out.append(float(row_lp[t]))
                    if tok_id in eos_set:
                        break
                finish = "stop" if (ids_out and ids_out[-1] in eos_set) else "length"
                text = tok.decode(ids_out, skip_special_tokens=True) if hasattr(tok, "decode") else None
                outs.append(CompletionOutput(
                    token_ids=ids_out,
                    cumulative_logprob=float(np.sum(lps_out)),
                    token_logprobs=lps_out,
                    text=text,
                    finish_reason=finish,
                ))
            results.append(RequestOutput(outputs=outs, prompt=prompts[p], prompt_token_ids=list(enc[p])))
        return results

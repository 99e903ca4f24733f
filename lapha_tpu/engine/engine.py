"""TPU-native batched generation engine (the vLLM replacement).

Replaces the reference's external vLLM server + HTTP client + NCCL weight
plane (/root/reference/trainer/vllm_client.py, vllm_start.sh) with an
in-process JAX engine:

- right-aligned KV layout: every row's tokens live at cache slots
  [0, len) == their real positions, decode writes per-row offsets
  (scatter), so ragged batches need no re-alignment;
- token-prefix KV reuse across calls (prefix_cache.py): an MCTS child
  prompt re-uses its parent's cached prefix and only the suffix is
  prefilled — the dominant cost saver for deep trees;
- n-sample fan-out without recompute: each unique prompt's KV is broadcast
  to its n sample rows with a device gather (breadth-n expansion prefills
  each parent once);
- chunked device decode: `lax.scan` generates ``decode_chunk`` tokens per
  dispatch (sampling + cache update fused), the host only checks stop flags
  between chunks; sampling uses a lax.top_k candidate path instead of
  full-vocab sorts when top-k is active;
- per-token logprobs from the processed logits (MCTS priors,
  vllm_client.py:870-881 semantics);
- weight sync is assignment: ``engine.update_params(new_params)`` shares
  the trainer's arrays — the reference's per-parameter gather+broadcast
  plane (mtpo_trainer.py:880-953) does not exist here.

Compiled shapes are bucketed (lengths to ``pad_multiple``, batch to
``batch_bucket``) so repeated MCTS calls hit the jit cache.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from . import sampling
from .adapter import CompletionOutput, RequestOutput, SamplingParams
from .prefix_cache import PrefixCacheStore


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
        prefix_cache_bytes: int = 1_500_000_000,
        prefix_cache_min_reuse: int = 64,
        collect_h0: bool = False,
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
        # collect_h0: accumulate the final-hidden mean over (prompt +
        # generated-up-to-EOS) tokens during generation, so the value head's
        # pooled h0 is a BYPRODUCT of decoding — MCTS value scoring then
        # needs no separate LM forward ("value guidance at near-zero
        # overhead"). Pool rule matches the reference head: all real tokens,
        # completion capped at first EOS (mtpo_trainer.py:212-229).
        self.collect_h0 = bool(collect_h0)
        self.prefix_cache = (
            PrefixCacheStore(prefix_cache_bytes, prefix_cache_min_reuse)
            if prefix_cache_bytes > 0 else None
        )

        if eos_token_ids is None:
            eos = getattr(tokenizer, "eos_token_id", None)
            eos_token_ids = [eos] if eos is not None else []
        self.eos_token_ids = [int(e) for e in eos_token_ids if e is not None]

        self._prefill_jit = jax.jit(self._prefill_impl, static_argnames=("S",))
        self._suffix_prefill_jit = jax.jit(
            self._suffix_prefill_impl, donate_argnums=(1, 2))
        self._decode_jit = jax.jit(
            self._decode_impl,
            static_argnames=("T", "static_top_k"),
            donate_argnums=(1, 2),  # donate kv cache
        )

    # ------------------------------------------------------------------ jit bodies

    def _prefill_impl(self, params, ids, mask, plen, S: int):
        """ids/mask (P, Lp) RIGHT-padded; plen (P,) real lengths.

        Returns (last_logits (P, V) at each row's final real token,
        kv (L, P, S, nkv, dh))."""
        P, Lp = ids.shape
        cache = qwen2.init_kv_cache(self.cfg, P, S)
        kv_valid = jnp.zeros((P, S), jnp.bool_).at[:, :Lp].set(mask > 0)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, hidden, cache = qwen2.forward(
            params, self.cfg, ids,
            positions=positions,
            kv_cache=cache,
            cache_pos=0,
            kv_valid=kv_valid,
            return_hidden=self.collect_h0,
        )
        last = jnp.take_along_axis(
            logits, jnp.maximum(plen - 1, 0)[:, None, None], axis=1)[:, 0, :]
        if self.collect_h0:
            h_sum = jnp.einsum("plh,pl->ph", hidden.astype(jnp.float32),
                               mask.astype(jnp.float32))
        else:
            h_sum = jnp.zeros((P, self.cfg.hidden_size), jnp.float32)
        return last, cache, h_sum

    def _suffix_prefill_impl(self, params, cache_k, cache_v, ids, mask, start, real_len):
        """One row with a reused prefix: prefix KV already sits at [0, start).

        ids/mask (1, Ls) right-padded suffix; start scalar (prefix length);
        real_len scalar (suffix real length). Returns (last_logits (1, V),
        (cache_k, cache_v))."""
        S = cache_k.shape[2]
        kv_valid = (jnp.arange(S)[None, :] < (start + jnp.sum(mask)))
        positions = start + jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, hidden, (ck, cv) = qwen2.forward(
            params, self.cfg, ids,
            positions=positions,
            kv_cache=(cache_k, cache_v),
            cache_pos=start,
            kv_valid=kv_valid,
            return_hidden=self.collect_h0,
        )
        last = jax.lax.dynamic_slice_in_dim(
            logits[0], jnp.maximum(real_len - 1, 0), 1, axis=0)
        if self.collect_h0:
            h_sum = jnp.einsum("plh,pl->ph", hidden.astype(jnp.float32),
                               mask.astype(jnp.float32))
        else:
            h_sum = jnp.zeros((1, self.cfg.hidden_size), jnp.float32)
        return last, (ck, cv), h_sum

    def _decode_impl(
        self, params, cache_k, cache_v, presence, last_logits,
        kv_valid, positions_next, finished, key,
        temperature, top_k, top_p, min_p, rep_pen,
        T: int, static_top_k: int = 0,
    ):
        """Generate T tokens for all B rows; per-row write offsets.

        Returns (tokens (B,T), logprobs (B,T), finished, cache, presence,
        kv_valid, positions, last_logits). Finished rows emit pad(0) tokens
        with logprob 0 and stop updating presence."""
        eos_arr = jnp.asarray(self.eos_token_ids or [-1], jnp.int32)

        def step(carry, _):
            ck, cv, pres, logits, kvv, pos, fin, k, hs = carry
            k, sub = jax.random.split(k)
            tok, lp = sampling.sample(
                logits, sub,
                presence=pres,
                repetition_penalty=rep_pen,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                min_p=min_p,
                static_top_k=static_top_k,
            )
            is_eos = jnp.any(tok[:, None] == eos_arr[None, :], axis=1)
            emit = jnp.where(fin, 0, tok)
            emit_lp = jnp.where(fin, 0.0, lp)
            new_fin = fin | is_eos

            B = tok.shape[0]
            pres = pres.at[jnp.arange(B), tok].max((~fin).astype(jnp.int8))
            kvv = kvv.at[jnp.arange(B), pos].set(True)
            new_logits, hidden, (ck, cv) = qwen2.forward(
                params, self.cfg, tok[:, None],
                positions=pos[:, None],
                kv_cache=(ck, cv),
                cache_pos=pos,
                kv_valid=kvv,
                return_hidden=self.collect_h0,
            )
            if self.collect_h0:
                # the token sampled this step is forwarded this step; pool it
                # iff it was emitted (fin False on entry — includes the EOS)
                hs = hs + hidden[:, 0, :].astype(jnp.float32) * (~fin)[:, None]
            return (ck, cv, pres, new_logits[:, 0, :], kvv, pos + 1, new_fin, k, hs), (emit, emit_lp)

        B0 = last_logits.shape[0]
        h0 = jnp.zeros((B0, self.cfg.hidden_size), jnp.float32)
        carry0 = (cache_k, cache_v, presence, last_logits, kv_valid, positions_next, finished, key, h0)
        carry, (toks, lps) = jax.lax.scan(step, carry0, None, length=T)
        ck, cv, pres, logits, kvv, pos, fin, _, hs = carry
        return toks.T, lps.T, fin, (ck, cv), pres, kvv, pos, logits, hs

    # ------------------------------------------------------------------ public API

    def update_params(self, params) -> None:
        """Weight sync from the trainer: shared arrays, zero copies.

        The prefix cache is invalidated — cached KV was computed under the
        old weights."""
        self.params = params
        if self.prefix_cache is not None:
            self.prefix_cache.clear()

    def generate(self, prompts, sampling_params: SamplingParams, use_tqdm: bool = False):
        """vLLM-like entry: list[str] -> list[RequestOutput] with n samples each."""
        sp = sampling_params
        n = max(1, int(getattr(sp, "n", 1)))
        prompts = list(prompts)
        results: list[RequestOutput | None] = [None] * len(prompts)
        group = max(1, self.max_batch // n)
        for lo in range(0, len(prompts), group):
            outs = self._generate_chunk(prompts[lo : lo + group], sp, n)
            for i, ro in enumerate(outs):
                results[lo + i] = ro
        return results

    # ------------------------------------------------------------------ internals

    def _prefill_rows(self, enc: list[list[int]], S: int):
        """Prefill all unique prompts; returns (last_logits (P,V) np,
        cache (L,P,S,..) device). Uses the prefix store when beneficial."""
        P = len(enc)
        store = self.prefix_cache
        hits = [None] * P
        if store is not None and P <= 8:
            for i, toks in enumerate(enc):
                hits[i] = store.longest_prefix(
                    toks, max_use=len(toks) - 1,
                    allow_partial=not self.collect_h0)

        if all(h is None for h in hits):
            Lp = min(_round_up(max(len(e) for e in enc), self.pad_multiple),
                     self.max_model_len)
            Pb = _round_up(P, self.batch_bucket)
            ids = np.zeros((Pb, Lp), np.int32)
            mask = np.zeros((Pb, Lp), np.int32)
            plen = np.zeros((Pb,), np.int32)
            for i, e in enumerate(enc):
                ids[i, : len(e)] = e
                mask[i, : len(e)] = 1
                plen[i] = len(e)
            last, cache, h_sum = self._prefill_jit(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(plen), S=S)
            last = last[:P]
            h_sum = h_sum[:P]
            cache = (cache[0][:, :P], cache[1][:, :P])
        else:
            # per-row path mixing full and suffix prefills
            lasts, cks, cvs, hsums = [], [], [], []
            for i, toks in enumerate(enc):
                if hits[i] is None:
                    Lp = min(_round_up(len(toks), self.pad_multiple), self.max_model_len)
                    ids = np.zeros((1, Lp), np.int32)
                    mask = np.zeros((1, Lp), np.int32)
                    ids[0, : len(toks)] = toks
                    mask[0, : len(toks)] = 1
                    last, (ck, cv), h_row = self._prefill_jit(
                        self.params, jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray([len(toks)], np.int32), S=S)
                else:
                    k_pref, v_pref, plen_hit, h_pref = hits[i]
                    ck = jnp.zeros(
                        (self.cfg.num_hidden_layers, 1, S,
                         self.cfg.num_key_value_heads, self.cfg.head_dim_),
                        self.cfg.dtype)
                    cv = jnp.zeros_like(ck)
                    ck = ck.at[:, 0, :plen_hit].set(k_pref)
                    cv = cv.at[:, 0, :plen_hit].set(v_pref)
                    suffix = toks[plen_hit:]
                    # the padded suffix block is written at offset plen_hit:
                    # it MUST fit inside S or dynamic_update_slice clamps the
                    # start back and overwrites the reused prefix KV
                    # (silently wrong generations — found by review repro)
                    Ls = _round_up(len(suffix), min(self.pad_multiple, 128))
                    if plen_hit + Ls > S:
                        Ls = _round_up(len(suffix), 16)
                    if plen_hit + Ls > S:
                        Ls = len(suffix)
                    assert plen_hit + Ls <= S, (plen_hit, Ls, S)
                    ids = np.zeros((1, Ls), np.int32)
                    mask = np.zeros((1, Ls), np.int32)
                    ids[0, : len(suffix)] = suffix
                    mask[0, : len(suffix)] = 1
                    last, (ck, cv), h_suf = self._suffix_prefill_jit(
                        self.params, ck, cv, jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(plen_hit, jnp.int32),
                        jnp.asarray(len(suffix), jnp.int32))
                    h_row = h_suf + (h_pref[None, :] if h_pref is not None
                                     else jnp.zeros((1, self.cfg.hidden_size), jnp.float32))
                lasts.append(last)
                cks.append(ck)
                cvs.append(cv)
                hsums.append(h_row)
            last = jnp.concatenate(lasts, axis=0)
            h_sum = jnp.concatenate(hsums, axis=0)
            cache = (jnp.concatenate(cks, axis=1), jnp.concatenate(cvs, axis=1))

        if store is not None:
            for i, toks in enumerate(enc):
                if len(toks) >= store.min_reuse:
                    store.put(toks, (cache[0][:, i, : len(toks)],
                                     cache[1][:, i, : len(toks)]),
                              h_sum=(h_sum[i] if self.collect_h0 else None))
        return last, cache, h_sum

    def _generate_chunk(self, prompts: list[str], sp: SamplingParams, n: int):
        tok = self.tokenizer
        enc = [tok(p, add_special_tokens=True)["input_ids"] for p in prompts]
        max_prompt = self.max_model_len - 1
        enc = [list(ids)[-max_prompt:] for ids in enc]
        P = len(enc)
        max_len = max(len(e) for e in enc)
        max_new = int(getattr(sp, "max_tokens", 256) or 256)
        S = _round_up(min(self.max_model_len, max_len) + max_new, self.pad_multiple)

        last_logits, (ck, cv), h_prompt = self._prefill_rows(enc, S)

        # fan out to B = P*n rows (gather shares each prompt's KV)
        Bb = _round_up(P * n, self.batch_bucket)
        row_of = np.repeat(np.arange(P), n)
        row_of = np.concatenate([row_of, np.zeros(Bb - P * n, np.int64)])
        row_of_j = jnp.asarray(row_of)
        ck = ck[:, row_of_j]
        cv = cv[:, row_of_j]
        last_logits = jnp.asarray(last_logits)[row_of_j]
        h_prompt_rows = np.asarray(h_prompt)[np.asarray(row_of)] if self.collect_h0 else None
        B = Bb

        lens = np.asarray([len(enc[r]) for r in row_of], np.int32)
        kv_valid = jnp.asarray(
            np.arange(S)[None, :] < lens[:, None])
        positions_next = jnp.asarray(lens)
        finished = jnp.zeros((B,), jnp.bool_)
        finished = finished.at[P * n :].set(True)  # bucket-padding rows

        # repetition-penalty presence over prompt tokens
        presence = np.zeros((B, self.cfg.vocab_size), np.int8)
        for r in range(P * n):
            presence[r, np.asarray(enc[row_of[r]], np.int64)] = 1
        presence = jnp.asarray(presence)

        def vec(x, default):
            v = getattr(sp, x, None)
            return jnp.full((B,), float(default if v is None else v), jnp.float32)

        temperature = vec("temperature", 1.0)
        top_p = vec("top_p", 1.0)
        min_p = vec("min_p", 0.0)
        rep_pen = vec("repetition_penalty", 1.0)
        tk = getattr(sp, "top_k", -1)
        tk = int(-1 if tk is None else tk)
        top_k = jnp.full((B,), tk, jnp.int32)
        # static candidate bound for the fast top_k sampler path; headroom so
        # nearby top_k values share one compilation
        static_top_k = 0 if tk <= 0 else min(self.cfg.vocab_size, max(64, tk))

        self._call_counter += 1
        seed = sp.seed if getattr(sp, "seed", None) is not None else self._call_counter
        key = jax.random.key(np.uint32(seed))

        all_toks: list[np.ndarray] = []
        all_lps: list[np.ndarray] = []
        h_gen = np.zeros((B, self.cfg.hidden_size), np.float32) if self.collect_h0 else None
        steps_done = 0
        budget = min(max_new, S - int(lens.max()))
        while steps_done < budget:
            T = min(self.decode_chunk, budget - steps_done)
            key, sub = jax.random.split(key)
            toks, lps, finished, (ck, cv), presence, kv_valid, positions_next, last_logits, hs = self._decode_jit(
                self.params, ck, cv, presence, last_logits,
                kv_valid, positions_next, finished, sub,
                temperature, top_k, top_p, min_p, rep_pen,
                T=T, static_top_k=static_top_k,
            )
            all_toks.append(np.asarray(toks))
            all_lps.append(np.asarray(lps))
            if self.collect_h0:
                h_gen += np.asarray(hs)
            steps_done += T
            if bool(np.all(np.asarray(finished))):
                break

        toks = np.concatenate(all_toks, axis=1) if all_toks else np.zeros((B, 0), np.int32)
        lps = np.concatenate(all_lps, axis=1) if all_lps else np.zeros((B, 0), np.float32)

        eos_set = set(self.eos_token_ids)
        results = []
        for p in range(P):
            outs = []
            for j in range(n):
                r = p * n + j
                row = toks[r]
                row_lp = lps[r]
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
                co = CompletionOutput(
                    token_ids=ids_out,
                    cumulative_logprob=float(np.sum(lps_out)),
                    token_logprobs=lps_out,
                    text=text,
                    finish_reason=finish,
                )
                if self.collect_h0:
                    # pooled final-hidden mean over prompt + emitted tokens
                    # (the value head's h0_raw, free of any extra forward)
                    n_tok = len(enc[p]) + len(ids_out)
                    co.pooled_hidden = (h_prompt_rows[r] + h_gen[r]) / max(1, n_tok)
                outs.append(co)
            results.append(RequestOutput(outputs=outs, prompt=prompts[p],
                                         prompt_token_ids=list(enc[p])))
        return results

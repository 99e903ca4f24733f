"""TPU-native batched generation engine (the vLLM replacement).

Replaces the reference's external vLLM server + HTTP client + NCCL weight
plane (/root/reference/trainer/vllm_client.py, vllm_start.sh) with an
in-process JAX engine:

- slot-uniform KV layout: each row's ragged prompt lives at slots
  [0, len) inside a shared [0, Lp) slab; decode step t writes slot Lp+t
  for ALL rows (one scalar dynamic_update_slice per layer — no per-row
  scatter). Positions stay ragged for RoPE; attention only needs slot
  validity, which (lens, slot) encode;
- token-prefix KV reuse across calls (prefix_cache.py): an MCTS child
  prompt re-uses its parent's cached prefix and only the suffix is
  prefilled — the dominant cost saver for deep trees;
- n-sample fan-out without recompute: each unique prompt's KV is broadcast
  to its n sample rows with a device gather (breadth-n expansion prefills
  each parent once);
- single-dispatch decode: one ``lax.while_loop`` generates the whole token
  budget and exits on-device when every row is finished — zero host
  round-trips during generation (each sync through the remote-TPU tunnel
  costs 10s of ms); sampling runs on a lax.approx_max_k candidate set
  instead of full-vocab sorts when top-k is active;
- per-token logprobs from the processed logits (MCTS priors,
  vllm_client.py:870-881 semantics);
- weight sync is assignment: ``engine.update_params(new_params)`` shares
  the trainer's arrays — the reference's per-parameter gather+broadcast
  plane (mtpo_trainer.py:880-953) does not exist here.

Compiled shapes are bucketed (lengths to ``pad_multiple``, batch to
``batch_bucket``) so repeated MCTS calls hit the jit cache.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from . import sampling
from .adapter import CompletionOutput, RequestOutput, SamplingParams
from .prefix_cache import PrefixCacheStore


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _EngineStatics(NamedTuple):
    """Everything the jitted engine programs read besides their array
    arguments. Hashable → engines with EQUAL statics share one set of jit
    wrappers (and therefore compiled programs): the trainer's engine and
    a separate eval engine, or a test file's many tiny engines, compile
    each program shape once per process instead of once per instance.
    Shape-knobs (max_batch, max_model_len, pad_multiple…) are deliberately
    absent — shapes are traced per call, so engines differing only in
    them share wrappers too."""

    mod: Any                 # model family module (models.qwen2/deepseek)
    cfg: Any                 # model config (frozen dataclass, hashable)
    collect_h0: bool
    eos_token_ids: tuple
    seq_mesh: Any            # jax.sharding.Mesh or None
    approx_top_k: bool
    win_split: Any           # (full_layers, win_layers, max_window) or None
    mask_token_id: int | None = None  # DiffusionEngine reveal programs


_SHARED_JITS: dict[_EngineStatics, dict] = {}


def _shared_engine_jits(es: _EngineStatics) -> dict:
    """The per-statics jit-wrapper set (built once, then shared)."""
    jits = _SHARED_JITS.get(es)
    if jits is None:
        p = functools.partial
        jits = _SHARED_JITS[es] = {
            "prefill": jax.jit(p(Engine._prefill_impl, es),
                               static_argnames=("S",)),
            "prefill_seq": jax.jit(p(Engine._prefill_seq_impl, es),
                                   static_argnames=("S",)),
            "suffix": jax.jit(p(Engine._suffix_batch_impl, es),
                              donate_argnums=(1, 2)),
            "install_win": jax.jit(p(Engine._install_win_impl, es),
                                   static_argnames=("Sw", "Wpad")),
            "decode": jax.jit(
                p(Engine._decode_impl, es),
                static_argnames=("T", "static_top_k", "ragged",
                                 "use_presence", "win_pad"),
                donate_argnums=(1, 2),  # donate kv cache
                donate_argnames=("cache_scale", "win_cache"),
            ),
            "decode_spec": jax.jit(
                p(Engine._decode_spec_impl, es),
                static_argnames=("T", "K", "M", "static_top_k"),
                donate_argnums=(1, 2),
                donate_argnames=("cache_scale",),
            ),
        }
    return jits


class Engine:
    # how the ContinuousEngine advances this engine's persistent batch:
    # "ar" = one token per row per step (engine._decode_jit);
    # "diffusion" = one committed block per chunk (DiffusionEngine)
    decode_kind = "ar"

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
        approx_top_k: bool = True,
        kv_quant: str | None = None,
        seq_mesh=None,
        spec_decode: str | None = None,
        spec_k: int = 3,
        spec_ngram: int = 2,
        auto_continuous: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        # model-module dispatch: DeepSeek (MLA) configs route forward/
        # decode_step/init_kv_cache to models.deepseek — the Engine's
        # cache plumbing (slot-uniform install, prefix reuse, fan-out
        # gather, compaction) is layout-level and the latent cache rides
        # it MQA-shaped (nkv=1, dh=cache_width; see deepseek.init_kv_cache)
        from ..models import model_module

        _mod = model_module(cfg)
        if _mod is not qwen2:
            # spec_decode COMPOSES with deepseek (round 5):
            # deepseek.decode_step_multi — the weight-absorbed T-token
            # verify; the single latent stream makes the verify read the
            # same S*cache_width bytes as one token
            if seq_mesh is not None:
                raise ValueError(
                    "seq_mesh does not support deepseek (the ring/"
                    "distributed-softmax paths are qwen2-family). "
                    "Deliberate: MLA's latent decode cache is 10-50x "
                    "smaller than per-head KV (models/deepseek.py "
                    "init_kv_cache — 69 KB/token at V3 scale), so the "
                    "KV-residency problem seq sharding solves barely "
                    "exists for this family; long DeepSeek prompts ride "
                    "the flash MLA prefill instead")
        self._mod = _mod
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
        # approx_top_k: lax.approx_max_k candidates for the top-k sampler
        # (recall 0.99/candidate; ~10x faster than exact lax.top_k at
        # V~152k). Set False for exact vLLM-identical truncation.
        self.approx_top_k = bool(approx_top_k)
        # kv_quant="int8": decode-time KV cache in int8 with per-vector
        # scales (qwen2.decode_step cache_scale) — halves the KV read
        # stream, which rivals the weight stream at large B (the other half
        # of decode's HBM bound). Prefill stays bf16; quantization happens
        # once at the decode-layout install. Opt-in: tokens can differ
        # from the bf16 cache at ~0.5% logit perturbation.
        if kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant={kv_quant!r}")
        self.kv_quant = kv_quant
        # spec_decode="pld": prompt-lookup speculative decoding (spec.py).
        # Each decode iteration verifies K n-gram drafts in one K+1-token
        # forward — nearly free on a weight-bandwidth-bound decode — so
        # accepted drafts multiply tok/s. Greedy streams are bit-identical
        # to non-speculative greedy on deterministic backends (float-ulp
        # tiling differences can flip argmax near-ties on TPU — see
        # spec.py); sampled streams are distribution-exact (delta
        # rejection) but consume PRNG keys differently, so spec is
        # OFF by default. Memory trade: rejected draft columns leave holes,
        # so the decode cache region is sized (K+1)x the token budget.
        if spec_decode not in (None, "pld"):
            raise ValueError(f"unsupported spec_decode={spec_decode!r}")
        # spec_decode composes with seq_mesh: the verify forward runs
        # qwen2_seq.decode_step_multi_seq (T-token distributed softmax,
        # owner-shard writes) and the validity bitmap / position map
        # shard over the slot axis inside its shard_map.
        # spec verify (decode_step_multi) supports windows (per-column
        # position map — bitmap holes break the affine column->position
        # map, so the spec loop threads stored-KV positions alongside
        # validity), attention sinks (_sink_softmax fold), and gemma
        # stacks (sandwich norms, attn_softcap, dual-theta rope — all
        # static per-layer choices in the unrolled verify loop).
        # seq_mesh composes with every qwen2-family layer structure:
        # sinks fold into the ring/distributed softmax, heterogeneous
        # layer_windows thread per-layer (scanned through the ring,
        # static in the unrolled decode/suffix loops), and the
        # olmo2/starcoder2/smollm3/gemma bodies ride the shared
        # _norm/_mlp dispatch (models/qwen2_seq.py). Windowed layers
        # keep full-S panels under seq (position-windowed validity);
        # the short win_cache is a single-chip residency optimization.
        self.spec_decode = spec_decode
        self.spec_k = int(spec_k)
        self.spec_ngram = int(spec_ngram)
        self.last_spec_stats: dict | None = None
        # auto_continuous: route generate() calls LARGER than one device
        # wave (P*n > max_batch) through an internal ContinuousEngine so
        # waves overlap — rows that finish early are replaced mid-stream
        # instead of idling until the wave's slowest row (the reference's
        # vLLM batches a whole eval set continuously; the sync path
        # serializes max_batch//n groups). Opt-in: the scheduler assigns
        # per-request seeds, so sampled token streams differ from the
        # sync path's (greedy streams agree).
        self.auto_continuous = bool(auto_continuous)
        self._auto_sched = None
        # seq_mesh: a Mesh with a "sequence" axis — engine-side sequence
        # parallelism. The decode KV cache is sharded over its slot axis and
        # each step runs qwen2_seq.decode_step_seq (flash-style distributed
        # softmax, O(B·nh·dh) per-step comms). For serving contexts whose
        # KV exceeds one chip's HBM. Composes with kv_quant="int8" (the
        # per-vector scale planes shard with the slots).
        self.seq_mesh = seq_mesh
        # token-prefix KV reuse composes with seq_mesh: stored slices come
        # off the slot-sharded prefill cache (XLA reshards the per-row
        # slice), hit batches write them back into a sharded batch cache,
        # and the suffix forward runs qwen2_seq.suffix_seq — the T-token
        # distributed-softmax generalization of decode_step_seq — so the
        # reused prefix attention stays O(B·T·S/n) per device.
        self.prefix_cache = (
            PrefixCacheStore(prefix_cache_bytes, prefix_cache_min_reuse,
                             pad_to=min(self.pad_multiple, 128))
            if prefix_cache_bytes > 0 else None
        )

        if eos_token_ids is None:
            eos = getattr(tokenizer, "eos_token_id", None)
            eos_token_ids = [eos] if eos is not None else []
        self.eos_token_ids = [int(e) for e in eos_token_ids if e is not None]

        # windowed-short decode caches (sync path): static layer split for
        # sliding-window stacks — full-attention layers keep full-S panels,
        # windowed layers get a short (Wpad + decode-budget)-column stack
        # (qwen2.decode_step win_cache). Cuts decode-resident KV memory
        # (the n-fan-out-multiplied cost) AND windowed layers' per-step
        # reads at long prompts. vLLM role: per-layer window-sized caches.
        lw = [cfg.window_for_layer(l) for l in range(cfg.num_hidden_layers)]
        self._win_split = None
        if any(lw):
            self._win_split = (
                tuple(l for l, w in enumerate(lw) if not w),   # full layers
                tuple(l for l, w in enumerate(lw) if w),       # windowed
                max(lw))
        # jit wrappers are SHARED across engines with equal statics
        # (_EngineStatics): a second engine over the same model config —
        # the trainer's vs a dedicated eval engine, or a test file's many
        # tiny engines — reuses the first's compiled programs instead of
        # re-tracing and re-compiling every program shape.
        self._es = _EngineStatics(
            mod=_mod, cfg=cfg, collect_h0=self.collect_h0,
            eos_token_ids=tuple(self.eos_token_ids), seq_mesh=seq_mesh,
            approx_top_k=self.approx_top_k, win_split=self._win_split)
        jits = _shared_engine_jits(self._es)
        self._prefill_jit = jits["prefill"]
        self._prefill_seq_jit = jits["prefill_seq"]
        self._suffix_batch_jit = jits["suffix"]
        self._decode_jit = jits["decode"]
        # no donation on install_win: every output is transposed/gathered,
        # so the inputs can never alias (donating just warns)
        self._install_win_jit = jits["install_win"]
        self._decode_spec_jit = jits["decode_spec"]
        self._write_prefix_jit = _WRITE_PREFIX_JIT
        self._quantize_cache_jit = _QUANT_CACHE_JIT

    @staticmethod
    def _install_win_impl(es, ck, cv, lens, slab, *, Sw: int, Wpad: int):
        """Prefill-layout caches (L, B, S, nkv, dh) -> the windowed-short
        decode install: full-attention layers transpose to the decode
        layout as usual; windowed layers keep only each row's prompt TAIL
        ([lens-Wpad, lens), gathered per row with clipped indices — cols
        before slot 0 are masked invalid by decode_step) plus Sw - Wpad
        empty decode columns. Returns (full_k, full_v, win_cache dict)."""
        full_idx, win_idx, _ = es.win_split
        S = ck.shape[2]
        woff = lens - Wpad
        idx = jnp.clip(woff[:, None] + jnp.arange(Wpad)[None, :], 0, S - 1)

        def grab_win(c):
            cw = jnp.take(c, jnp.asarray(win_idx, jnp.int32), axis=0)
            tail = jnp.take_along_axis(
                cw, idx[None, :, :, None, None], axis=2)    # (Lw,B,Wpad,..)
            tail = jnp.pad(
                tail, ((0, 0), (0, 0), (0, Sw - Wpad), (0, 0), (0, 0)))
            return jnp.transpose(tail, (0, 1, 3, 2, 4))     # decode layout

        def grab_full(c):
            # full_idx may be empty (uniform-window stacks): a (0, ...)
            # stack threads through decode_step untouched
            return jnp.transpose(
                jnp.take(c, jnp.asarray(full_idx, jnp.int32), axis=0),
                (0, 1, 3, 2, 4))

        wc = {"k": grab_win(ck), "v": grab_win(cv),
              "woff": woff, "slab": slab}
        return grab_full(ck), grab_full(cv), wc

    @staticmethod
    def _quantize_cache_impl(ck, cv):
        """bf16 decode-layout caches (L,B,nkv,S,dh) -> int8 + per-vector
        scales (L,B,nkv,S). Empty slots quantize to 0 with a floor scale."""
        def q(c):
            cf = c.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(cf), axis=-1) / 127.0, 1e-12)
            return (jnp.clip(jnp.round(cf / s[..., None]), -127, 127)
                    .astype(jnp.int8), s)

        kq, ks = q(ck)
        vq, vs = q(cv)
        return kq, vq, (ks, vs)

    # ------------------------------------------------------------------ jit bodies

    @staticmethod
    def _prefill_impl(es, params, ids, mask, plen, S: int):
        """ids/mask (P, Lp) RIGHT-padded; plen (P,) real lengths.

        Returns (last_logits (P, V) at each row's final real token,
        kv (L, P, S, nkv, dh))."""
        P, Lp = ids.shape
        cache = es.mod.init_kv_cache(es.cfg, P, S)
        kv_valid = jnp.zeros((P, S), jnp.bool_).at[:, :Lp].set(mask > 0)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, hidden, cache = es.mod.forward(
            params, es.cfg, ids,
            positions=positions,
            kv_cache=cache,
            cache_pos=0,
            kv_valid=kv_valid,
            return_hidden=es.collect_h0,
        )
        last = jnp.take_along_axis(
            logits, jnp.maximum(plen - 1, 0)[:, None, None], axis=1)[:, 0, :]
        if es.collect_h0:
            h_sum = jnp.einsum("plh,pl->ph", hidden.astype(jnp.float32),
                               mask.astype(jnp.float32))
        else:
            h_sum = jnp.zeros((P, es.cfg.hidden_size), jnp.float32)
        return last, cache, h_sum

    @staticmethod
    def _prefill_seq_impl(es, params, ids, mask, plen, S: int):
        """Sequence-SHARDED prefill (engine-side SP): the whole prompt
        forward runs ring-sharded over the seq_mesh (qwen2_seq.forward_seq)
        and the per-layer post-RoPE K/V seed a prefill-layout cache whose
        slot axis is sharded — so neither prompt activations nor the KV
        cache ever materialize on one chip. Same returns as _prefill_impl."""
        from jax.sharding import NamedSharding, PartitionSpec as PSpec

        from ..models import qwen2_seq

        P_, Lp = ids.shape
        logits, hidden, (ks, vs) = qwen2_seq.forward_seq(
            params, es.cfg, ids, attention_mask=mask, mesh=es.seq_mesh,
            return_hidden=es.collect_h0, return_kv=True)
        last = jnp.take_along_axis(
            logits, jnp.maximum(plen - 1, 0)[:, None, None], axis=1)[:, 0, :]
        # (L, P, Lp, nkv, dh) -> slot-padded prefill layout (L, P, S, nkv, dh)
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, S - Lp), (0, 0), (0, 0)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, S - Lp), (0, 0), (0, 0)))
        spec = NamedSharding(es.seq_mesh, PSpec(None, None, "sequence", None, None))
        ks = jax.lax.with_sharding_constraint(ks, spec)
        vs = jax.lax.with_sharding_constraint(vs, spec)
        if es.collect_h0:
            h_sum = jnp.einsum("plh,pl->ph", hidden.astype(jnp.float32),
                               mask.astype(jnp.float32))
        else:
            h_sum = jnp.zeros((P_, es.cfg.hidden_size), jnp.float32)
        return last, (ks, vs), h_sum

    @staticmethod
    def _write_prefix_impl(cache_k, cache_v, pk, pv, row):
        """Copy one row's reused prefix KV (bucket-padded (L, Pb, nkv, dh))
        into the batch cache at row ``row`` (traced scalar — one compile per
        padded-prefix bucket, not per exact length)."""
        cache_k = jax.lax.dynamic_update_slice(cache_k, pk[:, None], (0, row, 0, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, pv[:, None], (0, row, 0, 0, 0))
        return cache_k, cache_v

    @staticmethod
    def _suffix_batch_impl(es, params, cache_k, cache_v, ids, mask, starts, real_lens):
        """Batched prefix-hit prefill: row i's reused prefix KV already sits
        at [0, starts[i]); the right-padded suffixes (Hn, Ls) forward in ONE
        pass with per-row offsets (replaces the one-row-at-a-time host loop
        that serialized device calls exactly in the deep-tree MCTS case).

        Returns (last_logits (Hn, V), (cache_k, cache_v), h_sum (Hn, H))."""
        if es.seq_mesh is not None:
            from ..models import qwen2_seq

            logits, hidden, (ck, cv) = qwen2_seq.suffix_seq(
                params, es.cfg, ids, mask, starts, cache_k, cache_v,
                mesh=es.seq_mesh, return_hidden=es.collect_h0)
            last = jnp.take_along_axis(
                logits, jnp.maximum(real_lens - 1, 0)[:, None, None],
                axis=1)[:, 0, :]
            if es.collect_h0:
                h_sum = jnp.einsum("plh,pl->ph", hidden.astype(jnp.float32),
                                   mask.astype(jnp.float32))
            else:
                h_sum = jnp.zeros((ids.shape[0], es.cfg.hidden_size),
                                  jnp.float32)
            return last, (ck, cv), h_sum
        S = cache_k.shape[2]
        ar = jnp.arange(S)[None, :]
        kv_valid = ar < (starts + real_lens)[:, None]
        positions = starts[:, None] + jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, hidden, (ck, cv) = es.mod.forward(
            params, es.cfg, ids,
            positions=positions,
            kv_cache=(cache_k, cache_v),
            cache_pos=starts,
            kv_valid=kv_valid,
            return_hidden=es.collect_h0,
        )
        last = jnp.take_along_axis(
            logits, jnp.maximum(real_lens - 1, 0)[:, None, None], axis=1)[:, 0, :]
        if es.collect_h0:
            h_sum = jnp.einsum("plh,pl->ph", hidden.astype(jnp.float32),
                               mask.astype(jnp.float32))
        else:
            h_sum = jnp.zeros((ids.shape[0], es.cfg.hidden_size), jnp.float32)
        return last, (ck, cv), h_sum

    @staticmethod
    def _decode_impl(
        es, params, cache_k, cache_v, presence, last_logits,
        lens, dstart, positions_next, slot_next, finished,
        row_budget, emitted, key,
        temperature, top_k, top_p, min_p, rep_pen,
        T: int, static_top_k: int = 0, ragged: bool = False,
        cache_scale=None, use_presence: bool = True,
        win_cache=None, win_pad: int = 0,
    ):
        """Generate up to T tokens for all B rows (slot-uniform cache).

        ``use_presence=False`` (static): every row's repetition_penalty is
        1.0, so the (B, V) penalty pass, the per-step presence scatter and
        the 7 MB host-built presence matrix are all skipped — measurable
        per-step savings on the decode hot loop (callers pass a (B, 1)
        dummy presence).

        The loop is a ``lax.while_loop`` so the DEVICE exits as soon as all
        rows are finished — chunks can be long without paying for dead steps,
        and the host never has to sync mid-chunk. Cache writes/reads go
        through qwen2.decode_step (unrolled layers, static cache views — see
        its docstring for the profiling story).

        Per-row ``row_budget`` / ``emitted`` carry total-token budgets across
        calls (continuous batching: rows admitted mid-stream resume with
        their own counters); a row finishes on EOS or when emitted hits its
        budget. ``dstart`` (B,) is each row's first valid decode column.

        Returns (tokens (B,T), logprobs (B,T), finished, cache, presence,
        positions, slot, emitted, last_logits, h_sum, cache_scale). Finished
        rows emit pad(0) tokens with logprob 0 and stop updating presence.
        ``cache_scale`` echoes the updated int8-KV scales (() when the cache
        is bf16) so persistent-batch callers can carry them across chunks."""
        eos_arr = jnp.asarray(es.eos_token_ids or [-1], jnp.int32)
        B = last_logits.shape[0]
        toks0 = jnp.zeros((B, T), jnp.int32)
        lps0 = jnp.zeros((B, T), jnp.float32)
        h0 = jnp.zeros((B, es.cfg.hidden_size), jnp.float32)

        def cond(st):
            i = st[0]
            fin = st[10]
            return (i < T) & ~jnp.all(fin)

        def body(st):
            (i, ck, cv, scl, wc, pres, logits, pos, slot, k, fin, em, hs,
             toks, lps) = st
            k, sub = jax.random.split(k)
            tok, lp = sampling.sample(
                logits, sub,
                presence=pres if use_presence else None,
                repetition_penalty=rep_pen if use_presence else None,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                min_p=min_p,
                static_top_k=static_top_k,
                approx_top_k=es.approx_top_k,
            )
            is_eos = jnp.any(tok[:, None] == eos_arr[None, :], axis=1)
            emit = jnp.where(fin, 0, tok)
            emit_lp = jnp.where(fin, 0.0, lp)
            em = em + (~fin).astype(jnp.int32)
            new_fin = fin | is_eos | (em >= row_budget)

            if use_presence:
                pres = pres.at[jnp.arange(B), tok].max((~fin).astype(jnp.int8))
            if es.seq_mesh is not None:
                from ..models import qwen2_seq

                if cache_scale is not None:
                    new_logits, hidden, ck, cv, scl = qwen2_seq.decode_step_seq(
                        params, es.cfg, tok, pos, ck, cv, slot, lens, dstart,
                        mesh=es.seq_mesh, return_hidden=es.collect_h0,
                        cache_scale=scl,
                    )
                else:
                    new_logits, hidden, ck, cv = qwen2_seq.decode_step_seq(
                        params, es.cfg, tok, pos, ck, cv, slot, lens, dstart,
                        mesh=es.seq_mesh, return_hidden=es.collect_h0,
                    )
            elif win_cache is not None:
                out = es.mod.decode_step(
                    params, es.cfg, tok, pos, ck, cv, slot, lens, dstart,
                    return_hidden=es.collect_h0, ragged=ragged,
                    cache_scale=(scl if cache_scale is not None else None),
                    win_cache=wc, win_pad=win_pad,
                )
                if cache_scale is not None:
                    new_logits, hidden, ck, cv, scl, wc = out
                else:
                    new_logits, hidden, ck, cv, wc = out
            elif cache_scale is not None:
                new_logits, hidden, ck, cv, scl = es.mod.decode_step(
                    params, es.cfg, tok, pos, ck, cv, slot, lens, dstart,
                    return_hidden=es.collect_h0, ragged=ragged,
                    cache_scale=scl,
                )
            else:
                new_logits, hidden, ck, cv = es.mod.decode_step(
                    params, es.cfg, tok, pos, ck, cv, slot, lens, dstart,
                    return_hidden=es.collect_h0, ragged=ragged,
                )
            if es.collect_h0:
                # the token sampled this step is forwarded this step; pool it
                # iff it was emitted (fin False on entry — includes the EOS)
                hs = hs + hidden.astype(jnp.float32) * (~fin)[:, None]
            toks = jax.lax.dynamic_update_slice(toks, emit[:, None], (0, i))
            lps = jax.lax.dynamic_update_slice(lps, emit_lp[:, None], (0, i))
            return (i + 1, ck, cv, scl, wc, pres, new_logits, pos + 1,
                    slot + 1, k, new_fin, em, hs, toks, lps)

        st0 = (jnp.asarray(0, jnp.int32), cache_k, cache_v,
               cache_scale if cache_scale is not None else (),
               win_cache if win_cache is not None else (),
               presence, last_logits, positions_next, slot_next, key,
               finished, emitted, h0, toks0, lps0)
        st = jax.lax.while_loop(cond, body, st0)
        (_, ck, cv, scl, wc, pres, logits, pos, slot, _, fin, em, hs,
         toks, lps) = st
        # wc is returned (then dropped) so the donated windowed-cache
        # buffers alias outputs instead of doubling residency
        return (toks, lps, fin, (ck, cv), pres, pos, slot, em, logits, hs,
                scl, wc)

    @staticmethod
    def _decode_spec_impl(
        es, params, cache_k, cache_v, presence, last_logits,
        lens, seq0, positions_next, slot_next, finished,
        row_budget, emitted, key,
        temperature, top_k, top_p, min_p, rep_pen,
        T: int, K: int, M: int, static_top_k: int = 0,
        cache_scale=None,
    ):
        """Speculative variant of :meth:`_decode_impl` (spec_decode="pld").

        One ``lax.while_loop`` iteration = one K+1-token verify forward
        (qwen2.decode_step_multi) over [last_emitted, draft_1..draft_K],
        drafts proposed on-device by n-gram lookup over the row's token
        history (spec.ngram_propose). The acceptance chain runs the SAME
        processed-logits pipeline as the normal loop with presence evolving
        inside the window, so greedy output streams are bit-identical to
        non-speculative greedy and sampled streams are distribution-exact
        (spec.pick_with_draft). Each iteration emits 1..K+1 tokens per row
        and advances the shared slot by K+1; per-row validity is the
        (B, S) bitmap ``valid_map`` (rejected columns are permanent holes).

        Returns (toks (B,T), lps (B,T), finished, cache, presence, pos,
        slot, emitted, h_sum, iterations, active_row_iterations,
        cache_scale) — cache_scale echoes the int8-KV scales (() when the
        cache is bf16)."""
        from . import spec

        if es.seq_mesh is not None:
            # seq-sharded verify: the same spec loop drives
            # qwen2_seq.decode_step_multi_seq (identical signature) — the
            # (B, S) validity bitmap and position map shard over the slot
            # axis inside its shard_map; deepseek is already rejected
            # under seq_mesh, so the family here is always qwen2-shaped
            from functools import partial

            from ..models import qwen2_seq

            _dsm = partial(qwen2_seq.decode_step_multi_seq, mesh=es.seq_mesh)
        else:
            _dsm = es.mod.decode_step_multi  # qwen2 or deepseek

        eos_arr = jnp.asarray(es.eos_token_ids or [-1], jnp.int32)
        B = last_logits.shape[0]
        S = cache_k.shape[3]
        W = K + 1
        toks0 = jnp.zeros((B, T), jnp.int32)
        lps0 = jnp.zeros((B, T), jnp.float32)
        h00 = jnp.zeros((B, es.cfg.hidden_size), jnp.float32)
        arB = jnp.arange(B)

        def is_eos(t):
            return jnp.any(t[:, None] == eos_arr[None, :], axis=1)

        pick_kw = dict(repetition_penalty=rep_pen, temperature=temperature,
                       top_k=top_k, top_p=top_p, min_p=min_p,
                       static_top_k=static_top_k,
                       approx_top_k=es.approx_top_k)

        # pre-step: emit token0 from the prefill logits (the normal loop's
        # first sample); it is forwarded as iteration 1's t0
        key, k0 = jax.random.split(key)
        tok0, lp0 = spec.pick_with_draft(
            last_logits, k0, jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), bool), presence=presence, **pick_kw)
        emit0 = ~finished & (row_budget > 0)
        toks = toks0.at[:, 0].set(jnp.where(emit0, tok0, 0))
        lps = lps0.at[:, 0].set(jnp.where(emit0, lp0, 0.0))
        em = emitted + emit0.astype(jnp.int32)
        presence = presence.at[arB, tok0].max(emit0.astype(jnp.int8))
        fin = finished | (is_eos(tok0) & emit0) | (em >= row_budget)
        seq = spec.scatter_emit(seq0, lens, tok0[:, None], emit0[:, None])
        cur = lens + emit0.astype(jnp.int32)
        valid0 = jnp.arange(S)[None, :] < lens[:, None]
        # stored-KV positions per column (windowed masking in
        # decode_step_multi): prompt columns hold position == column;
        # invalid columns' values are never read (masked by valid)
        posm = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
        # unp: lt was emitted but its hidden is not pooled yet
        unp = emit0

        # the pre-step counts as one active iteration per emitting row:
        # both loops sample token0 from the prefill logits for free, so
        # including it in numerator AND denominator keeps the documented
        # "1.0 = no draft ever accepted" floor exact on short generations
        st0 = (jnp.asarray(0, jnp.int32), cache_k, cache_v,
               cache_scale if cache_scale is not None else (),
               presence, positions_next, slot_next, key, fin, em, valid0,
               posm, seq, cur, tok0, unp, h00, toks, lps,
               jnp.sum(emit0.astype(jnp.int32)))

        def cond(st):
            it, slot, fin_ = st[0], st[6], st[8]
            # reserve one column for the post-loop h0 fixup forward
            return (it < T) & ~jnp.all(fin_) & (slot + W < S)

        def body(st):
            (it, ck0, cv0, scl0, pres0, pos0_, slot0, k0_, fin0, em0,
             valid0_, posm0_, seq0_, cur0, lt0, unp0, hs0, toks0_, lps0_,
             act0) = st
            draft, dl = spec.ngram_propose(seq0_, cur0, K, M)
            k_next, *subs = jax.random.split(k0_, W + 1)
            active = ~fin0

            def window_post(tok_w, lp_w, emit_w, pool_w, pres_i, em_run,
                            hidden, ck, cv, scl, Wb):
                """Shared bookkeeping for a Wb-column window (Wb static)."""
                e = jnp.sum(emit_w.astype(jnp.int32), 1)
                eos_w = emit_w & jnp.any(
                    tok_w[..., None] == eos_arr[None, None, :], axis=-1)
                new_fin = fin0 | jnp.any(eos_w, 1) | (em_run >= row_budget)
                toks_n = spec.scatter_emit(toks0_, em0, tok_w, emit_w)
                lps_n = spec.scatter_emit(lps0_, em0, lp_w, emit_w)
                seq_n = spec.scatter_emit(seq0_, cur0, tok_w, emit_w)
                # column validity: slot+0 holds t0's KV (valid iff the row
                # decoded this iteration); slot+1+i holds draft i's KV
                # (valid iff that draft token was emitted)
                col_new = jnp.concatenate(
                    [active[:, None], pool_w[:, : Wb - 1]], 1)
                arS = jnp.arange(S)[None, :]
                rel = jnp.clip(arS - slot0, 0, Wb - 1)
                gathered = jnp.take_along_axis(
                    col_new, jnp.broadcast_to(rel, (B, S)), axis=1)
                in_w = (arS >= slot0) & (arS < slot0 + Wb)
                valid_n = jnp.where(in_w, gathered, valid0_)
                # column slot0+j held a token forwarded at position
                # pos0_+j this iteration (valid or hole alike)
                posm_n = jnp.where(in_w, pos0_[:, None] + (arS - slot0),
                                   posm0_)

                lt_new, last_pooled = lt0, ~unp0
                for i in range(Wb):
                    lt_new = jnp.where(emit_w[:, i], tok_w[:, i], lt_new)
                    last_pooled = jnp.where(emit_w[:, i], pool_w[:, i],
                                            last_pooled)
                # active rows always emit >= 1; their old t0 got pooled,
                # the new lt's pooled-ness is that of the last emitted
                unp_new = jnp.where(e > 0, ~last_pooled, unp0)

                hs_n = hs0
                if es.collect_h0:
                    hs_n = hs_n + (hidden[:, 0].astype(jnp.float32)
                                   * active[:, None])
                    for i in range(Wb - 1):
                        hs_n = hs_n + (hidden[:, 1 + i].astype(jnp.float32)
                                       * pool_w[:, i][:, None])
                # act counts per-ROW active iterations so the acceptance
                # stat is immune to finish-time skew across rows
                return (it + 1, ck, cv, scl, pres_i, pos0_ + e, slot0 + Wb,
                        k_next, new_fin, em_run, valid_n, posm_n, seq_n,
                        cur0 + e, lt_new, unp_new, hs_n, toks_n, lps_n,
                        act0 + jnp.sum(active.astype(jnp.int32)))

            def verify_iter(_):
                """K drafts verified in one W-token forward."""
                toks_in = jnp.concatenate([lt0[:, None], draft], axis=1)
                positions = pos0_[:, None] + jnp.arange(W)[None, :]
                if cache_scale is not None:
                    logits_w, hidden, ck, cv, scl = _dsm(
                        params, es.cfg, toks_in, positions, ck0, cv0,
                        slot0, valid0_, return_hidden=es.collect_h0,
                        cache_scale=scl0, pos_map=posm0_)
                else:
                    logits_w, hidden, ck, cv = _dsm(
                        params, es.cfg, toks_in, positions, ck0, cv0,
                        slot0, valid0_, return_hidden=es.collect_h0,
                        pos_map=posm0_)
                    scl = ()
                pres_i, em_run, active_i = pres0, em0, active
                tok_l, lp_l, emit_l, pool_l = [], [], [], []
                for i in range(W):
                    if i < K:
                        d_i = draft[:, i]
                        has_d = active_i & (i < dl)
                    else:
                        d_i = jnp.zeros((B,), jnp.int32)
                        has_d = jnp.zeros((B,), bool)
                    t_i, l_i = spec.pick_with_draft(
                        logits_w[:, i], subs[i], d_i, has_d,
                        presence=pres_i, **pick_kw)
                    emit_i = active_i & (em_run < row_budget)
                    eos_i = is_eos(t_i) & emit_i
                    # pooled: this draft token was emitted, so its hidden
                    # (from THIS forward) joins the h0 sum; the chain
                    # additionally stops on EOS
                    pool_i = (emit_i & (t_i == d_i) & (i < dl)
                              if i < K else jnp.zeros((B,), bool))
                    pres_i = pres_i.at[arB, t_i].max(emit_i.astype(jnp.int8))
                    em_run = em_run + emit_i.astype(jnp.int32)
                    tok_l.append(t_i)
                    lp_l.append(l_i)
                    emit_l.append(emit_i)
                    pool_l.append(pool_i)
                    active_i = pool_i & ~eos_i
                return window_post(
                    jnp.stack(tok_l, 1), jnp.stack(lp_l, 1),
                    jnp.stack(emit_l, 1), jnp.stack(pool_l, 1),
                    pres_i, em_run, hidden, ck, cv, scl, W)

            def single_iter(_):
                """No row has a draft: plain 1-token step (adaptive
                speculation — the verify forward's ~2x per-iteration cost
                is paid ONLY when drafts exist; measured on v5e the W-token
                sampler chain + (B, W, V) logits are far from free)."""
                if cache_scale is not None:
                    logits_1, hidden, ck, cv, scl = _dsm(
                        params, es.cfg, lt0[:, None], pos0_[:, None], ck0,
                        cv0, slot0, valid0_, return_hidden=es.collect_h0,
                        cache_scale=scl0, pos_map=posm0_)
                else:
                    logits_1, hidden, ck, cv = _dsm(
                        params, es.cfg, lt0[:, None], pos0_[:, None], ck0,
                        cv0, slot0, valid0_, return_hidden=es.collect_h0,
                        pos_map=posm0_)
                    scl = ()
                t0_, l0_ = spec.pick_with_draft(
                    logits_1[:, 0], subs[0], jnp.zeros((B,), jnp.int32),
                    jnp.zeros((B,), bool), presence=pres0, **pick_kw)
                emit_0 = active & (em0 < row_budget)
                pres_i = pres0.at[arB, t0_].max(emit_0.astype(jnp.int8))
                em_run = em0 + emit_0.astype(jnp.int32)
                return window_post(
                    t0_[:, None], l0_[:, None], emit_0[:, None],
                    jnp.zeros((B, 1), bool), pres_i, em_run, hidden,
                    ck, cv, scl, 1)

            has_drafts = jnp.any((dl > 0) & active)
            return jax.lax.cond(has_drafts, verify_iter, single_iter,
                                operand=None)

        st = jax.lax.while_loop(cond, body, st0)
        (it, ck, cv, scl, pres, pos, slot, _k, fin, em, valid, posm, _seq,
         _cur, lt, unp, hs, toks, lps, act) = st

        if es.collect_h0:
            # rows whose LAST emitted token was a bonus (never forwarded):
            # one extra 1-token forward collects its hidden. Its KV lands
            # at the reserved column `slot` (never marked valid, never read
            # again — the sync engine discards the cache after decode).
            if cache_scale is not None:
                _lg, hid1, ck, cv, scl = _dsm(
                    params, es.cfg, lt[:, None], pos[:, None], ck, cv,
                    jnp.minimum(slot, S - 1), valid, return_hidden=True,
                    cache_scale=scl, pos_map=posm)
            else:
                _lg, hid1, ck, cv = _dsm(
                    params, es.cfg, lt[:, None], pos[:, None], ck, cv,
                    jnp.minimum(slot, S - 1), valid, return_hidden=True,
                    pos_map=posm)
            hs = hs + hid1[:, 0].astype(jnp.float32) * unp[:, None]

        # scl is returned (then dropped by the caller) so the donated int8
        # scale planes alias an output instead of warning every dispatch
        return toks, lps, fin, (ck, cv), pres, pos, slot, em, hs, it, act, scl

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
        group = max(1, self.max_batch // n)
        if self.spec_decode is not None:
            self.last_spec_stats = None  # accumulated across this call's waves
        if self.auto_continuous and len(prompts) > group:
            sched = self._continuous()
            # routing must be semantics-preserving, so fall back to waves
            # whenever the scheduler would CHANGE the request: n beyond its
            # row count (submit raises where the sync path builds an
            # oversized wave), a token budget beyond its decode region
            # (admission clamps budget -> silent truncation), or prompts
            # beyond its slab (submit left-truncates them). Encodings are
            # passed through to submit so prompts tokenize once.
            if sched is not None and n <= sched.B:
                max_new = int(getattr(sp, "max_tokens", 256) or 256)
                if max_new <= sched.S - sched.slab:
                    encs = [list(self.tokenizer(p, add_special_tokens=True)
                                 ["input_ids"]) for p in prompts]
                    if all(len(e) <= sched.slab for e in encs):
                        futs = [sched.submit(p, sp, enc=e)
                                for p, e in zip(prompts, encs)]
                        return [f.result() for f in futs]
                    # an overlong prompt forces the wave path: hand the
                    # encodings over so the batch is not tokenized twice
                    return self._generate_waves(prompts, sp, n, group,
                                                encs=encs)
        return self._generate_waves(prompts, sp, n, group)

    def _generate_waves(self, prompts, sp, n, group, encs=None):
        results: list[RequestOutput | None] = [None] * len(prompts)
        for lo in range(0, len(prompts), group):
            outs = self._generate_chunk(
                prompts[lo : lo + group], sp, n,
                encs=None if encs is None else encs[lo : lo + group])
            for i, ro in enumerate(outs):
                results[lo + i] = ro
        return results

    def _continuous(self):
        """Lazily build/start the internal ContinuousEngine for
        auto-routed oversized batches. None when the configuration cannot
        compose (spec_decode: the scheduler's chunked loop does not
        speculate; seq_mesh engines DO compose) — callers fall back to
        waves."""
        if self.spec_decode is not None:
            return None
        if self._auto_sched is None:
            from .scheduler import ContinuousEngine

            self._auto_sched = ContinuousEngine(self)
            self._auto_sched.start()
        return self._auto_sched

    # ------------------------------------------------------------------ internals

    def _prefill_full_batch(self, enc_rows: list[list[int]], S: int):
        """Batched full prefill of the given prompts (no prefix reuse)."""
        P = len(enc_rows)
        Lp = min(_round_up(max(len(e) for e in enc_rows), self.pad_multiple),
                 self.max_model_len)
        if self.seq_mesh is not None:  # ring prefill shards tokens n_seq ways
            Lp = _round_up(Lp, self.seq_mesh.shape["sequence"])
        Pb = _round_up(P, self.batch_bucket)
        ids = np.zeros((Pb, Lp), np.int32)
        mask = np.zeros((Pb, Lp), np.int32)
        plen = np.zeros((Pb,), np.int32)
        for i, e in enumerate(enc_rows):
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
            plen[i] = len(e)
        prefill = (self._prefill_seq_jit if self.seq_mesh is not None
                   else self._prefill_jit)
        last, cache, h_sum = prefill(
            self.params, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(plen), S=S)
        return last[:P], (cache[0][:, :P], cache[1][:, :P]), h_sum[:P]

    def _prefill_hit_batch(self, enc_rows: list[list[int]], hit_rows: list, S: int):
        """Batched prefix-hit prefill: copy each reused prefix into a fresh
        batch cache (one bucketed-shape dus per row), then ONE batched
        suffix forward with per-row start offsets."""
        Hn = len(enc_rows)
        sufs = [toks[h[2]:] for toks, h in zip(enc_rows, hit_rows)]
        starts = np.asarray([h[2] for h in hit_rows], np.int32)
        max_suf = max(len(s) for s in sufs)
        # the padded suffix block is written at offset start_i: it MUST fit
        # inside S for EVERY row, or dynamic_update_slice clamps the start
        # back and overwrites the reused prefix KV (silently wrong
        # generations — found by review repro in round 1)
        Ls = _round_up(max_suf, min(self.pad_multiple, 128))
        if int(starts.max()) + Ls > S:
            Ls = _round_up(max_suf, 16)
        if int(starts.max()) + Ls > S:
            Ls = max_suf
        assert int(starts.max()) + Ls <= S, (starts.max(), Ls, S)

        ck = jnp.zeros((self.cfg.num_hidden_layers, Hn, S,
                        self.cfg.num_key_value_heads, self.cfg.head_dim_),
                       self.cfg.dtype)
        cv = jnp.zeros_like(ck)
        if self.seq_mesh is not None:
            # slot-sharded residency from the start: prefix writes land on
            # the owning shards instead of materializing (L, Hn, S) whole
            from jax.sharding import NamedSharding, PartitionSpec as PSpec

            spec = NamedSharding(self.seq_mesh,
                                 PSpec(None, None, "sequence", None, None))
            ck = jax.device_put(ck, spec)
            cv = jax.device_put(cv, spec)
        for i, (k_pref, v_pref, _plen, _h) in enumerate(hit_rows):
            ck, cv = self._write_prefix_jit(ck, cv, k_pref, v_pref,
                                            jnp.asarray(i, jnp.int32))

        ids = np.zeros((Hn, Ls), np.int32)
        mask = np.zeros((Hn, Ls), np.int32)
        for i, s in enumerate(sufs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        real = np.asarray([len(s) for s in sufs], np.int32)
        last, (ck, cv), h_suf = self._suffix_batch_jit(
            self.params, ck, cv, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(starts), jnp.asarray(real))
        h_pref = jnp.stack([
            (h[3] if h[3] is not None
             else jnp.zeros((self.cfg.hidden_size,), jnp.float32))
            for h in hit_rows])
        return last, (ck, cv), h_suf + h_pref

    def _prefill_rows(self, enc: list[list[int]], S: int):
        """Prefill all unique prompts; returns (last_logits (P,V),
        cache (L,P,S,..) device, h_sum (P,H)). Prefix-hit rows and miss rows
        each prefill as ONE batched device call; results are re-assembled
        into prompt order with a single gather."""
        P = len(enc)
        store = self.prefix_cache
        hits = [None] * P
        if store is not None:
            for i, toks in enumerate(enc):
                hits[i] = store.longest_prefix(
                    toks, max_use=len(toks) - 1,
                    allow_partial=not self.collect_h0)
        miss_idx = [i for i in range(P) if hits[i] is None]
        hit_idx = [i for i in range(P) if hits[i] is not None]

        parts = []  # (row indices, last, (ck, cv), h_sum)
        if miss_idx:
            parts.append((miss_idx,) + tuple(
                self._prefill_full_batch([enc[i] for i in miss_idx], S)))
        if hit_idx:
            parts.append((hit_idx,) + tuple(
                self._prefill_hit_batch([enc[i] for i in hit_idx],
                                        [hits[i] for i in hit_idx], S)))

        if len(parts) == 1 and parts[0][0] == list(range(P)):
            _, last, cache, h_sum = parts[0]
        else:
            order = [i for part in parts for i in part[0]]
            inv = jnp.asarray(np.argsort(np.asarray(order)))
            last = jnp.concatenate([p[1] for p in parts], axis=0)[inv]
            ck = jnp.concatenate([p[2][0] for p in parts], axis=1)[:, inv]
            cv = jnp.concatenate([p[2][1] for p in parts], axis=1)[:, inv]
            h_sum = jnp.concatenate([p[3] for p in parts], axis=0)[inv]
            cache = (ck, cv)

        if store is not None:
            for i, toks in enumerate(enc):
                if len(toks) >= store.min_reuse:
                    pad_len = min(_round_up(len(toks), store.pad_to), S)
                    store.put(toks, (cache[0][:, i, :pad_len],
                                     cache[1][:, i, :pad_len]),
                              h_sum=(h_sum[i] if self.collect_h0 else None))
        return last, cache, h_sum

    def _generate_chunk(self, prompts: list[str], sp: SamplingParams, n: int,
                        encs: list[list[int]] | None = None):
        tok = self.tokenizer
        enc = (encs if encs is not None else
               [tok(p, add_special_tokens=True)["input_ids"] for p in prompts])
        max_prompt = self.max_model_len - 1
        enc = [list(ids)[-max_prompt:] for ids in enc]
        P = len(enc)
        max_len = max(len(e) for e in enc)
        max_new = int(getattr(sp, "max_tokens", 256) or 256)
        # slot-uniform layout: ragged prompts live at [0, len_b) inside the
        # [0, Lp) slab; decode step t writes slot Lp+t for ALL rows
        Lp = _round_up(min(self.max_model_len, max_len), self.pad_multiple)
        S = _round_up(Lp + max_new, self.pad_multiple)
        if self.spec_decode is not None:
            # every spec iteration writes K+1 columns but worst-case emits
            # only 1 (zero acceptance): size the decode region for the
            # budget at (K+1)x, +1 reserved column for the h0 fixup
            W = self.spec_k + 1
            budget0 = min(max_new, S - Lp)
            S = _round_up(Lp + budget0 * W + 1, self.pad_multiple)
        if self.seq_mesh is not None:  # sharded slot axis: S % n_seq == 0
            S = _round_up(S, self.seq_mesh.shape["sequence"])

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
        lens_j = jnp.asarray(lens)
        positions_next = jnp.asarray(lens)
        slot_next = jnp.asarray(Lp, jnp.int32)
        finished = jnp.zeros((B,), jnp.bool_)
        finished = finished.at[P * n :].set(True)  # bucket-padding rows

        # repetition-penalty presence over prompt tokens. When every row's
        # penalty is 1.0 (and the spec loop, which threads presence through
        # its acceptance chain, is off) the whole presence machinery is
        # statically skipped: no 7 MB host build/transfer, no (B, V)
        # penalty pass, no per-step scatter.
        rp_val = float(getattr(sp, "repetition_penalty", 1.0) or 1.0)
        use_presence = (rp_val != 1.0) or (self.spec_decode is not None)
        if use_presence:
            presence = np.zeros((B, self.cfg.vocab_size), np.int8)
            for r in range(P * n):
                presence[r, np.asarray(enc[row_of[r]], np.int64)] = 1
            presence = jnp.asarray(presence)
        else:
            presence = jnp.zeros((B, 1), jnp.int8)

        def vec(x, default):
            v = getattr(sp, x, None)
            return jnp.full((B,), float(default if v is None else v), jnp.float32)

        temperature = vec("temperature", 1.0)
        # disabled sampler stages are passed as None so process_logits
        # compiles them OUT (sp values are host-known per call): top_k<=0 /
        # top_p>=1 otherwise cost a full (B, V~152k) vocab SORT per decode
        # step — pure waste for greedy or untruncated sampling
        tp_val = float(getattr(sp, "top_p", 1.0) or 1.0)
        top_p = None if tp_val >= 1.0 else vec("top_p", 1.0)
        mp_val = float(getattr(sp, "min_p", 0.0) or 0.0)
        min_p = None if mp_val <= 0.0 else vec("min_p", 0.0)
        rep_pen = vec("repetition_penalty", 1.0)
        tk = getattr(sp, "top_k", -1)
        tk = int(-1 if tk is None else tk)
        top_k = None if tk <= 0 else jnp.full((B,), tk, jnp.int32)
        # static candidate bound for the fast top_k sampler path; headroom so
        # nearby top_k values share one compilation
        static_top_k = 0 if tk <= 0 else min(self.cfg.vocab_size, max(64, tk))

        self._call_counter += 1
        seed = sp.seed if getattr(sp, "seed", None) is not None else self._call_counter
        key = jax.random.key(np.uint32(seed))

        # one device dispatch covers the whole budget: the while_loop inside
        # _decode_impl exits as soon as every row is finished, so there is
        # NO host round-trip per chunk (the remote-TPU tunnel makes each
        # sync ~10s of ms). decode_chunk survives as the compile-bucket
        # quantum for the emit-buffer width.
        if self.spec_decode is not None:
            budget = min(max_new, (S - Lp - 1) // (self.spec_k + 1))
        else:
            budget = min(max_new, S - Lp)
        T = _round_up(max(budget, 1), self.decode_chunk)  # emit-buffer bucket
        h_gen = np.zeros((B, self.cfg.hidden_size), np.float32) if self.collect_h0 else None
        win_cache = None
        win_pad = 0
        if budget > 0:
            # windowed-short install (sliding-window stacks, sync path):
            # windowed layers keep only Wpad prompt-tail + decode columns
            # instead of full-S panels — engages when that actually saves
            # (long prompts). seq/spec already reject windowed models.
            if (self._win_split is not None and self.seq_mesh is None
                    and self.spec_decode is None):
                Wpad = _round_up(self._win_split[2],
                                 min(self.pad_multiple, 128))
                if Wpad + (S - Lp) + min(self.pad_multiple, 128) <= S:
                    win_pad = Wpad
            if win_pad:
                Sw = win_pad + (S - Lp)
                ck, cv, win_cache = self._install_win_jit(
                    ck, cv, lens_j, jnp.asarray(Lp, jnp.int32),
                    Sw=Sw, Wpad=win_pad)
            else:
                # decode cache layout: (L, B, nkv, S, dh) — see decode_step
                ck = jnp.transpose(ck, (0, 1, 3, 2, 4))
                cv = jnp.transpose(cv, (0, 1, 3, 2, 4))
            cache_scale = None
            if self.kv_quant == "int8":
                ck, cv, cache_scale = self._quantize_cache_jit(ck, cv)
                if win_cache is not None:
                    wk, wv, wscl = self._quantize_cache_jit(
                        win_cache["k"], win_cache["v"])
                    win_cache = dict(win_cache, k=wk, v=wv,
                                     ks=wscl[0], vs=wscl[1])
            if self.seq_mesh is not None:
                # split slot residency across the sequence shards up front —
                # inside the decode loop shard_map keeps it resident there
                from jax.sharding import NamedSharding, PartitionSpec as PSpec

                spec = NamedSharding(self.seq_mesh,
                                     PSpec(None, None, None, "sequence", None))
                ck = jax.device_put(ck, spec)
                cv = jax.device_put(cv, spec)
                if cache_scale is not None:
                    sspec = NamedSharding(self.seq_mesh,
                                          PSpec(None, None, None, "sequence"))
                    cache_scale = (jax.device_put(cache_scale[0], sspec),
                                   jax.device_put(cache_scale[1], sspec))
            key, sub = jax.random.split(key)
            if self.spec_decode is not None:
                # token history for n-gram drafting: prompt tokens + (on
                # device) every emitted token
                Hs = Lp + T
                seq_np = np.zeros((B, Hs), np.int32)
                for r in range(P * n):
                    seq_np[r, : lens[r]] = enc[row_of[r]]
                toks_d, lps_d, finished, (ck, cv), presence, positions_next, \
                    slot_next, em_d, hs, iters, act_d, _scl = self._decode_spec_jit(
                        self.params, ck, cv, presence, last_logits,
                        lens_j, jnp.asarray(seq_np),
                        positions_next, slot_next, finished,
                        jnp.full((B,), budget, jnp.int32),
                        jnp.zeros((B,), jnp.int32), sub,
                        temperature, top_k, top_p, min_p, rep_pen,
                        T=T, K=self.spec_k, M=self.spec_ngram,
                        static_top_k=static_top_k, cache_scale=cache_scale,
                    )
                n_tok = int(np.sum(np.asarray(em_d)[: P * n]))
                n_it = int(iters)
                n_act = int(act_d)
                # accumulate across the waves of ONE generate() call; the
                # denominator is per-ROW ACTIVE iterations, so a slow last
                # row does not dilute the acceptance of finished rows
                prev = self.last_spec_stats or {"iterations": 0, "tokens": 0,
                                                "active_row_iterations": 0}
                tot_tok = prev["tokens"] + n_tok
                tot_act = prev["active_row_iterations"] + n_act
                self.last_spec_stats = {
                    "iterations": prev["iterations"] + n_it,
                    "tokens": tot_tok,
                    "active_row_iterations": tot_act,
                    # mean emitted per iteration per ACTIVE row: 1.0 = no
                    # draft ever accepted, K+1 = every draft accepted
                    "tokens_per_iteration": round(
                        tot_tok / max(1, tot_act), 3),
                }
            else:
                toks_d, lps_d, finished, (ck, cv), presence, positions_next, slot_next, _em, last_logits, hs, _scl, _wc = \
                    self._decode_jit(
                        self.params, ck, cv, presence, last_logits,
                        lens_j, jnp.full((B,), Lp, jnp.int32),
                        positions_next, slot_next, finished,
                        jnp.full((B,), budget, jnp.int32),
                        jnp.zeros((B,), jnp.int32), sub,
                        temperature, top_k, top_p, min_p, rep_pen,
                        T=T, static_top_k=static_top_k,
                        cache_scale=cache_scale, use_presence=use_presence,
                        win_cache=win_cache, win_pad=win_pad,
                    )
            toks = np.asarray(toks_d)[:, :budget]
            lps = np.asarray(lps_d)[:, :budget]
            if self.collect_h0:
                h_gen = np.asarray(hs)
        else:
            toks = np.zeros((B, 0), np.int32)
            lps = np.zeros((B, 0), np.float32)

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


# statics-free programs: one module-level wrapper each, shared by every
# engine instance (same sharing rationale as _shared_engine_jits)
_WRITE_PREFIX_JIT = jax.jit(Engine._write_prefix_impl, donate_argnums=(0, 1))
_QUANT_CACHE_JIT = jax.jit(Engine._quantize_cache_impl, donate_argnums=(0, 1))

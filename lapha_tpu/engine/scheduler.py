"""Continuous-batching scheduler over the TPU engine (the vLLM capability).

The reference delegates cross-request continuous batching to vLLM (SURVEY
§2.2 row 8, §7.3 hard part #1 — /root/reference/vllm_start.sh runs the
server; trainer/vllm_client.py talks to it). Here a scheduler thread owns a
persistent decode batch over the engine's slot-uniform KV cache:

- requests enter a queue (``submit`` returns a Future); between decode
  chunks the scheduler admits queued requests into FREE ROWS of the running
  batch. A request submitted mid-decode of another starts decoding at the
  next chunk boundary and completes on its own schedule — no waiting for
  the other's token budget;
- row occupancy is tracked by the C++ ``SlotAllocator``
  (native/lapha_native.cpp; python fallback when the extension isn't
  built);
- column space: all active rows share the global decode column cursor
  (that is what makes the KV write a single scalar-indexed
  dynamic_update_slice per layer). A request is admitted when (a) a row is
  free and (b) its token budget fits the remaining columns; when the batch
  fully drains the cursor resets to the prompt-slab boundary. When column
  space (not rows) blocks an admission, the scheduler COMPACTS: each active
  row's decode tokens fold into its contiguous prefix with one gather over
  the cache (K/V vectors carry their RoPE; only set-validity matters), the
  cursor drops to max(slab, max row occupancy), and admission retries;
- sampling is per-row vectorized (temperature/top_p/min_p/rep_pen);
  admission batches sharing the engine instance also share its prefix-KV
  store, so MCTS-style prefix reuse composes with continuous batching.

Prefills of concurrently-admitted requests are batched through
``Engine._prefill_rows`` (hit/miss grouped). The decode chunk is the same
jitted while_loop as the sync path, with per-row budgets/emitted counters.
"""

from __future__ import annotations

import functools
import threading
from concurrent.futures import Future
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..native import make_slot_allocator
from .adapter import CompletionOutput, RequestOutput, SamplingParams
from .engine import Engine, _round_up


class _Request:
    __slots__ = ("prompt", "enc", "sp", "n", "future", "rows", "outputs",
                 "stream")

    def __init__(self, prompt, enc, sp, n, future, stream=None):
        self.prompt = prompt
        self.enc = enc
        self.sp = sp
        self.n = n
        self.future = future
        self.rows: list[int] = []
        self.outputs: dict[int, CompletionOutput] = {}
        # (queue.Queue, tag) — incremental token events (see submit)
        self.stream = stream


class _Row:
    __slots__ = ("req", "sample_idx", "toks", "lps", "h_gen", "em", "sent",
                 "eos_done")

    def __init__(self, req, sample_idx):
        self.req = req
        self.sample_idx = sample_idx
        self.toks: list[int] = []
        self.lps: list[float] = []
        self.h_gen = None
        self.em = 0
        self.sent = 0          # tokens already pushed to the stream queue
        self.eos_done = False  # stream hit EOS; suppress later deltas


class ContinuousEngine:
    """Cross-request continuous batching on top of an :class:`Engine`.

    ``prompt_slab`` bounds admitted prompt lengths; decode columns live in
    [prompt_slab, engine.max_model_len). Budgets are capped to the decode
    region (same rule as the sync path's ``budget = min(max_new, S - Lp)``).
    """

    def __init__(self, engine: Engine, *, prompt_slab: int | None = None,
                 chunk: int | None = None):
        self.engine = engine
        self.B = engine.max_batch
        self.S = _round_up(engine.max_model_len, engine.pad_multiple)
        # seq_mesh engines compose (long-context serving keeps continuous
        # batching, VERDICT r2 weak #3): the persistent cache is sharded
        # over the slot axis and decode runs qwen2_seq.decode_step_seq via
        # the engine's decode branch. ONE capability stays off: mid-wave KV
        # compaction (its per-row column gather would shuffle data across
        # sequence shards every trigger) — when column space blocks an
        # admission the scheduler waits for the wave to drain instead.
        self.seq = getattr(engine, "seq_mesh", None) is not None
        if self.seq:
            self.S = _round_up(self.S, engine.seq_mesh.shape["sequence"])
        self.slab = int(prompt_slab or (self.S // 2))
        assert 0 < self.slab < self.S
        self.chunk = int(chunk or engine.decode_chunk)
        # DiffusionEngine composes: the persistent batch advances one
        # committed BLOCK per chunk (engine._diff_chunk_impl) instead of
        # `chunk` AR tokens. Chunk boundaries are commit boundaries, so
        # admission and compaction slot in unchanged; the cache lives in
        # PREFILL layout (L,B,S,nkv,dh) because the denoise forward is
        # qwen2.forward(block_bidir=True), not decode_step.
        self.diffusion = getattr(engine, "decode_kind", "ar") == "diffusion"
        if self.diffusion:
            self.chunk = int(engine.block_length)
        self.slots = make_slot_allocator(self.B)
        # Persistent-cache attention strategy, A/B-measured on v5e at the
        # S=4096/B=48/lens~500 shape, full 1.5B decode step
        # (scripts/bench_attention_ab.py, BASELINE.md round-3 session-7,
        # kernel v2 + block_k=1024): dense bf16 13.65, **ragged bf16
        # 9.91-9.96 — the best overall config, with an EXACT bf16
        # cache**, dense int8 10.17, ragged int8 23.5 ms/step. So: ragged
        # for bf16 caches, DENSE for int8 caches. The ragged-int8 loss is
        # NOT the kernel (kernel-alone: int8 225 us/layer ≈ bf16 249) but
        # the scale-plane re-view (..,S)->(..,S/bk,1,bk) the wrapper
        # needs, which re-materializes (1-sublane dim pads 8x) every step
        # because each layer-step updates the plane; fixing it would land
        # ~11 ms — still behind both winners, so not pursued.
        # Sliding-window layers (mistral/gemma3 stacks) ride the ragged
        # path with window-clipped ranges (decode_step win_ranges): their
        # per-row traffic is O(W), not O(S). MEASURED (AB_WINDOW=256,
        # gemma3-style 5-local:1-global stack, same S=4096/B=48 shape):
        # ragged bf16 8.87 BEATS dense int8 10.12 (dense still reads all
        # S and only masks); ragged int8 20.13 (same scale-DMA stall).
        # With W=1024 > the occupied spans (~500-600 cols) the band never
        # binds and all numbers match full attention — the crossover is
        # W vs occupancy, not W vs S. (Windowed ragged bf16 at
        # block_k=1024: 8.1-8.2 ms/step.) So for windowed models at
        # S >> W the recommended serving config is kv_quant=None (bf16
        # cache + banded ragged); this per-config choice below already
        # picks ragged for bf16, so no policy change is needed.
        # ATTENTION SINKS (gpt-oss class; round-4 AB_SINKS=1 AB_WINDOW=128
        # AB_PATTERN=alt, same shape): the sink fold costs nothing and the
        # same ordering holds — dense bf16 13.0, dense int8 9.51, ragged
        # bf16 8.9-10.07 (block_rows 16/4/8), ragged int8 ~19.9. Policy
        # unchanged; sinks ride whichever path the cache dtype picks.
        cfg = engine.cfg
        self.kv_quant = engine.kv_quant
        self.ragged = (jax.default_backend() == "tpu"
                       and cfg.head_dim_ % 128 == 0 and self.S % 256 == 0
                       and self.S >= 2048 and not self.kv_quant
                       and not self.seq and not self.diffusion)

        self._queue: list[_Request] = []
        self._cv = threading.Condition()
        self._running = False
        self._thread: threading.Thread | None = None
        self._rows: dict[int, _Row] = {}  # row index -> bookkeeping
        self._seed_counter = 0
        self._state = None  # device state, created lazily
        self.steps_executed = 0
        self.waves = 0

    # ------------------------------------------------------------- lifecycle

    def start(self):
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        with self._cv:
            self._running = False
            self._cv.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=60)
            self._thread = None

    # ------------------------------------------------------------- public API

    def submit(self, prompt: str, sampling_params: SamplingParams,
               stream=None, enc=None) -> Future:
        """Queue one prompt; the Future resolves to a RequestOutput with n
        samples. Raises immediately if the prompt cannot ever fit.

        ``enc``: optional pre-tokenized ids (callers that already encoded
        the prompt — e.g. Engine's auto_continuous routing — skip the
        second tokenization).

        ``stream``: optional (queue.Queue, tag) pair. Token events are
        pushed as they decode (chunk granularity), each carrying the tag:
          {"type": "delta",  "tag", "sample", "token_ids", "logprobs"}
          {"type": "finish", "tag", "sample", token_ids/logprobs/text/
                             finish_reason}  — authoritative per sample
          {"type": "request_done", "tag"}    — all n samples finished
          {"type": "error",  "tag", "error"} — scheduler failure
        Deltas are EOS-trimmed; the finish event repeats the full sample.
        """
        eng = self.engine
        if enc is None:
            enc = list(eng.tokenizer(prompt, add_special_tokens=True)["input_ids"])
        enc = list(enc)[-(self.slab):]
        n = max(1, int(getattr(sampling_params, "n", 1)))
        if n > self.B:
            raise ValueError(f"n={n} exceeds max_batch={self.B}")
        fut: Future = Future()
        req = _Request(prompt, enc, sampling_params, n, fut, stream=stream)
        with self._cv:
            if not self._running:
                raise RuntimeError("ContinuousEngine not started")
            self._queue.append(req)
            self._cv.notify_all()
        return fut

    def generate(self, prompts: Sequence[str], sampling_params: SamplingParams,
                 use_tqdm: bool = False) -> list[RequestOutput]:
        """Drop-in synchronous API: submit all, wait for all."""
        futs = [self.submit(p, sampling_params) for p in prompts]
        return [f.result() for f in futs]

    # ------------------------------------------------------------- internals

    def _init_state(self):
        eng = self.engine
        cfg = eng.cfg
        B, S = self.B, self.S
        kv_dtype = jnp.int8 if self.kv_quant == "int8" else cfg.dtype
        # decode cache layout (L, B, nkv, S, dh) — qwen2.decode_step;
        # diffusion keeps PREFILL layout (L, B, S, nkv, dh) for
        # qwen2.forward(block_bidir=True)
        kshape = ((cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
                   cfg.head_dim_) if self.diffusion else
                  (cfg.num_hidden_layers, B, cfg.num_key_value_heads,
                   S, cfg.head_dim_))
        self._state = dict(
            ck=jnp.zeros(kshape, kv_dtype),
            cv=jnp.zeros(kshape, kv_dtype),
            scale=(tuple(jnp.full((cfg.num_hidden_layers, B,
                                   cfg.num_key_value_heads, S), 1e-12,
                                  jnp.float32) for _ in range(2))
                   if self.kv_quant == "int8" else None),
            presence=jnp.zeros((B, cfg.vocab_size), jnp.int8),
            last_logits=jnp.zeros((B, cfg.vocab_size), jnp.float32),
            lens=np.zeros((B,), np.int32),
            dstart=np.full((B,), self.slab, np.int32),
            pos=np.zeros((B,), np.int32),
            fin=np.ones((B,), bool),
            budget=np.zeros((B,), np.int32),
            emitted=np.zeros((B,), np.int32),
            temp=np.full((B,), 1.0, np.float32),
            top_p=np.full((B,), 1.0, np.float32),
            min_p=np.zeros((B,), np.float32),
            rep_pen=np.full((B,), 1.0, np.float32),
            top_k=np.full((B,), -1, np.int32),
            thr=np.full((B,), getattr(eng, "dynamic_threshold", 0.9),
                        np.float32),
            col=self.slab,
        )
        if self.diffusion:
            # presence/last_logits are AR-decode state (repetition
            # penalty, first-step logits); the diffusion chunk samples
            # from the block forward directly
            self._state["presence"] = None
            self._state["last_logits"] = None
        if self.seq:
            # persistent residency on the sequence shards: decode_step_seq's
            # shard_map then never reshards the cache between chunks
            from jax.sharding import NamedSharding, PartitionSpec as PSpec

            mesh = eng.seq_mesh
            spec = NamedSharding(mesh, PSpec(None, None, None, "sequence", None))
            self._state["ck"] = jax.device_put(self._state["ck"], spec)
            self._state["cv"] = jax.device_put(self._state["cv"], spec)
            if self._state["scale"] is not None:
                sspec = NamedSharding(mesh, PSpec(None, None, None, "sequence"))
                self._state["scale"] = tuple(
                    jax.device_put(s, sspec) for s in self._state["scale"])

    def _budget_cols(self, sp) -> int:
        """Decode columns a request may consume. Diffusion rounds up to
        whole blocks: column growth is block-quantized, so a request's
        reservation must be too."""
        b = min(int(getattr(sp, "max_tokens", 256) or 256),
                self.S - self.slab)
        if self.diffusion:
            Tb = int(self.engine.block_length)
            b = -(-b // Tb) * Tb
        return b

    def _admissible(self, req: _Request) -> bool:
        st = self._state
        free = self.slots.available()
        if free < req.n:
            return False
        return st["col"] + self._budget_cols(req.sp) <= self.S

    def _admit(self, reqs: list[_Request]):
        """Prefill the new requests (one batched call, prefix-store aware)
        and install their rows into the persistent batch state."""
        eng = self.engine
        st = self._state
        enc_rows = [r.enc for r in reqs]
        last, (ck_g, cv_g), h_sum = eng._prefill_rows(enc_rows, self.S)
        h_np = np.asarray(h_sum) if eng.collect_h0 else None
        last_np = np.asarray(last)

        rows_all, group_of = [], []
        for gi, req in enumerate(reqs):
            rows = self.slots.acquire(req.n)
            assert rows is not None, "admission checked availability"
            req.rows = [int(r) for r in rows]
            for r in req.rows:
                self._rows[r] = _Row(req, len(group_of))
                rows_all.append(r)
                group_of.append(gi)

        # device-side row installs: KV copy + last logits + presence
        rows_j = jnp.asarray(np.asarray(rows_all, np.int32))
        group_j = jnp.asarray(np.asarray(group_of, np.int32))
        if self.diffusion:
            # same layout both sides — one scatter, no transpose
            st["ck"], st["cv"] = _install_rows_pf(st["ck"], st["cv"],
                                                  ck_g, cv_g, group_j, rows_j)
        elif self.kv_quant == "int8":
            st["ck"], st["cv"], st["scale"] = _install_rows_q(
                st["ck"], st["cv"], st["scale"], ck_g, cv_g, group_j, rows_j)
        else:
            st["ck"], st["cv"] = _install_rows(st["ck"], st["cv"], ck_g, cv_g,
                                               group_j, rows_j)
        if not self.diffusion:
            st["last_logits"] = st["last_logits"].at[rows_j].set(
                jnp.asarray(last_np)[group_j])
            pres_rows = np.zeros((len(rows_all), eng.cfg.vocab_size), np.int8)
            for i, gi in enumerate(group_of):
                pres_rows[i, np.asarray(reqs[gi].enc, np.int64)] = 1
            st["presence"] = st["presence"].at[rows_j].set(
                jnp.asarray(pres_rows))

        for i, (r, gi) in enumerate(zip(rows_all, group_of)):
            req = reqs[gi]
            sp = req.sp
            L = len(req.enc)
            st["lens"][r] = L
            st["dstart"][r] = st["col"]
            st["pos"][r] = L
            st["fin"][r] = False
            st["budget"][r] = min(int(getattr(sp, "max_tokens", 256) or 256),
                                  self.S - self.slab)
            st["emitted"][r] = 0
            st["temp"][r] = float(getattr(sp, "temperature", 1.0) or 0.0)
            st["top_p"][r] = float(getattr(sp, "top_p", 1.0) or 1.0)
            st["min_p"][r] = float(getattr(sp, "min_p", 0.0) or 0.0)
            st["rep_pen"][r] = float(getattr(sp, "repetition_penalty", 1.0) or 1.0)
            tk = getattr(sp, "top_k", -1)
            st["top_k"][r] = int(-1 if tk is None else tk)
            thr = getattr(sp, "dynamic_threshold", None)
            st["thr"][r] = float(getattr(eng, "dynamic_threshold", 0.9)
                                 if thr is None else thr)
            row = self._rows[r]
            if eng.collect_h0:
                row.h_gen = h_np[gi].astype(np.float32).copy()

    def _diffusion_chunk(self):
        """Advance the persistent batch by ONE committed diffusion block
        (engine._diff_chunk_impl). Active rows gain exactly Tb tokens;
        host-side EOS trimming and budget fin mirror the AR path."""
        eng = self.engine
        st = self._state
        if not self._rows:
            return
        self._seed_counter += 1
        key = jax.random.key(np.uint32(self._seed_counter * 2654435761 % (2**32)))
        tks = st["top_k"][~st["fin"]] if (~st["fin"]).any() else st["top_k"]
        static_top_k = 0 if (tks <= 0).any() else min(
            eng.cfg.vocab_size, max(64, int(tks.max())))
        em_before = st["emitted"].copy()
        Tb = int(eng.block_length)

        out = eng._diff_chunk_jit(
            eng.params, st["ck"], st["cv"], jnp.asarray(st["lens"]),
            jnp.asarray(st["dstart"]), jnp.asarray(st["fin"]),
            jnp.asarray(st["emitted"]), jnp.asarray(st["budget"]),
            jnp.asarray(st["col"], jnp.int32), key,
            jnp.asarray(st["temp"]), jnp.asarray(st["top_k"]),
            jnp.asarray(st["top_p"]), jnp.asarray(st["min_p"]),
            jnp.asarray(st["thr"]),
            Tb=Tb, steps=eng.denoising_steps,
            strategy=eng.remasking_strategy, static_top_k=static_top_k)
        st["ck"], st["cv"], toks_d, lps_d, fin_d, em_d, nfwd = out

        toks = np.asarray(toks_d)
        lps = np.asarray(lps_d)
        st["fin"] = np.array(fin_d)
        st["emitted"] = np.array(em_d)
        st["col"] = int(st["col"]) + Tb
        self.steps_executed += int(nfwd)

        eos_set = set(eng.eos_token_ids)
        done_rows = []
        for r, row in self._rows.items():
            d = int(st["emitted"][r] - em_before[r])
            if d > 0:
                # the whole block belongs to this row; budget may trim it
                take = min(d, Tb, int(st["budget"][r]) - len(row.toks))
                row.toks.extend(int(t) for t in toks[r, :take])
                row.lps.extend(float(x) for x in lps[r, :take])
                row.em = len(row.toks)
                self._push_delta(row, eos_set)
            if st["fin"][r]:
                done_rows.append(r)
        for r in done_rows:
            self._finish_row(r)

        if not self._rows:
            st["col"] = self.slab
            st["fin"][:] = True
            self.waves += 1

    def _decode_chunk(self):
        eng = self.engine
        st = self._state
        if not self._rows:
            return
        if self.diffusion:
            return self._diffusion_chunk()
        self._seed_counter += 1
        key = jax.random.key(np.uint32(self._seed_counter * 2654435761 % (2**32)))
        tks = st["top_k"][~st["fin"]] if (~st["fin"]).any() else st["top_k"]
        # static candidate bound only if every ACTIVE row uses finite top-k
        static_top_k = 0 if (tks <= 0).any() else min(
            eng.cfg.vocab_size, max(64, int(tks.max())))
        em_before = st["emitted"].copy()

        out = eng._decode_jit(
            eng.params, st["ck"], st["cv"], st["presence"], st["last_logits"],
            jnp.asarray(st["lens"]), jnp.asarray(st["dstart"]),
            jnp.asarray(st["pos"]), jnp.asarray(st["col"], jnp.int32),
            jnp.asarray(st["fin"]),
            jnp.asarray(st["budget"]), jnp.asarray(st["emitted"]), key,
            jnp.asarray(st["temp"]), jnp.asarray(st["top_k"]),
            jnp.asarray(st["top_p"]), jnp.asarray(st["min_p"]),
            jnp.asarray(st["rep_pen"]),
            T=self.chunk, static_top_k=static_top_k, ragged=self.ragged,
            cache_scale=st["scale"],
        )
        toks_d, lps_d, fin_d, (st["ck"], st["cv"]), st["presence"], pos_d, \
            slot_d, em_d, st["last_logits"], hs_d, scl_d, _wc = out
        if st["scale"] is not None:
            st["scale"] = scl_d

        toks = np.asarray(toks_d)
        lps = np.asarray(lps_d)
        # np.asarray views of jax arrays are read-only; the host state is
        # mutated at admission, so take owned copies
        st["fin"] = np.array(fin_d)
        st["pos"] = np.array(pos_d)
        st["emitted"] = np.array(em_d)
        new_col = int(np.asarray(slot_d))
        steps = new_col - st["col"]
        st["col"] = new_col
        self.steps_executed += steps
        hs = np.asarray(hs_d) if eng.collect_h0 else None

        eos_set = set(eng.eos_token_ids)
        done_rows = []
        for r, row in self._rows.items():
            d = int(st["emitted"][r] - em_before[r])
            if d > 0:
                row.toks.extend(int(t) for t in toks[r, :d])
                row.lps.extend(float(x) for x in lps[r, :d])
                row.em = int(st["emitted"][r])
                if hs is not None:
                    row.h_gen = row.h_gen + hs[r]
                self._push_delta(row, eos_set)
            if st["fin"][r]:
                done_rows.append(r)
        for r in done_rows:
            self._finish_row(r)

        if not self._rows:
            # wave drained: reset the column cursor
            st["col"] = self.slab
            st["fin"][:] = True
            self.waves += 1

    def _push_delta(self, row: _Row, eos_set: set):
        """EOS-trimmed incremental token event for a streaming request."""
        req = row.req
        seg = list(zip(row.toks[row.sent:], row.lps[row.sent:]))
        row.sent = len(row.toks)
        if req.stream is None or row.eos_done or not seg:
            return
        out_t, out_l = [], []
        for t, lp in seg:
            out_t.append(t)
            out_l.append(lp)
            if t in eos_set:
                row.eos_done = True
                break
        q, tag = req.stream
        q.put({"type": "delta", "tag": tag, "sample": row.sample_idx,
               "token_ids": out_t, "logprobs": out_l})

    def _finish_row(self, r: int):
        eng = self.engine
        row = self._rows.pop(r)
        req = row.req
        eos_set = set(eng.eos_token_ids)
        ids_out, lps_out = [], []
        for t, lp in zip(row.toks, row.lps):
            ids_out.append(t)
            lps_out.append(lp)
            if t in eos_set:
                break
        finish = "stop" if (ids_out and ids_out[-1] in eos_set) else "length"
        text = (eng.tokenizer.decode(ids_out, skip_special_tokens=True)
                if hasattr(eng.tokenizer, "decode") else None)
        co = CompletionOutput(token_ids=ids_out,
                              cumulative_logprob=float(np.sum(lps_out) if lps_out else 0.0),
                              token_logprobs=lps_out, text=text,
                              finish_reason=finish)
        if eng.collect_h0 and row.h_gen is not None:
            n_tok = len(req.enc) + len(ids_out)
            co.pooled_hidden = row.h_gen / max(1, n_tok)
        req.outputs[row.sample_idx] = co
        self.slots.release([r])
        if req.stream is not None:
            q, tag = req.stream
            q.put({"type": "finish", "tag": tag, "sample": row.sample_idx,
                   "token_ids": ids_out, "logprobs": lps_out, "text": text,
                   "finish_reason": finish})
        if len(req.outputs) == req.n:
            outs = [req.outputs[i] for i in sorted(req.outputs)]
            if req.stream is not None:
                q, tag = req.stream
                q.put({"type": "request_done", "tag": tag})
            req.future.set_result(RequestOutput(
                outputs=outs, prompt=req.prompt, prompt_token_ids=list(req.enc)))

    def _compact(self) -> bool:
        """Reclaim decode columns: fold each active row's decode tokens
        [dstart_r, col) into its contiguous prefix ([0, len_r + n_r)) with
        one per-row gather over the cache, then reset the column cursor to
        max(slab, max(len_r + n_r)). Attention only needs the K/V vectors
        (RoPE is baked in at write time) plus set-validity, so slots can be
        relocated freely. Returns True if columns were actually freed."""
        st = self._state
        if not self._rows or self.seq:
            return False
        col = st["col"]
        new_lens = {}
        hi = self.slab
        for r in self._rows:
            n_r = col - int(st["dstart"][r])
            new_lens[r] = int(st["lens"][r]) + n_r
            hi = max(hi, new_lens[r])
        if hi >= col:
            return False  # nothing to gain
        idx = np.tile(np.arange(self.S, dtype=np.int32), (self.B, 1))
        for r in self._rows:
            L0 = int(st["lens"][r])
            d0 = int(st["dstart"][r])
            n_r = col - d0
            if n_r > 0:
                idx[r, L0:L0 + n_r] = np.arange(d0, col, dtype=np.int32)
        gather = _gather_columns_pf if self.diffusion else _gather_columns
        st["ck"], st["cv"] = gather(st["ck"], st["cv"], jnp.asarray(idx))
        if st["scale"] is not None:
            st["scale"] = _gather_scale_columns(st["scale"], jnp.asarray(idx))
        for r in self._rows:
            st["lens"][r] = new_lens[r]
            st["dstart"][r] = hi
        st["col"] = hi
        self.compactions = getattr(self, "compactions", 0) + 1
        return True

    def _loop(self):
        while True:
            with self._cv:
                while self._running and not self._queue and not self._rows:
                    self._cv.wait(timeout=0.5)
                if not self._running:
                    err = RuntimeError("engine stopped")
                    for req in self._queue:
                        _fail_request(req, err)
                    self._queue.clear()
                    for row in self._rows.values():
                        _fail_request(row.req, err)
                    self._rows.clear()
                    return
                if self._state is None:
                    self._init_state()

                def pick_admissible():
                    admit, rest = [], []
                    for req in self._queue:
                        if self._admissible(req) and not admit:
                            # one admission group per boundary keeps prefill
                            # shapes bucketed; grab every admissible request
                            admit.append(req)
                        elif admit and self._admissible_with(req, admit):
                            admit.append(req)
                        else:
                            rest.append(req)
                    return admit, rest

                admit, rest = pick_admissible()
                if (not admit and self._queue and self._rows
                        and self.slots.available() > 0 and not self.seq):
                    # column space (not rows) is the blocker: compact and
                    # retry (seq engines skip this — the per-row column
                    # gather would shuffle across sequence shards — and
                    # wait for the wave to drain instead)
                    if self._compact():
                        admit, rest = pick_admissible()
                self._queue = rest
            try:
                if admit:
                    self._admit(admit)
                self._decode_chunk()
            except Exception as e:  # resolve futures instead of dying silently
                for row in list(self._rows.values()):
                    _fail_request(row.req, e)
                self._rows.clear()
                self._state = None
                self.slots = make_slot_allocator(self.B)

    def _admissible_with(self, req: _Request, pending: list[_Request]) -> bool:
        taken = sum(p.n for p in pending)
        if self.slots.available() - taken < req.n:
            return False
        return self._state["col"] + self._budget_cols(req.sp) <= self.S


def _fail_request(req: _Request, err: Exception):
    """Resolve a request's future AND its stream (if any) with an error.
    Idempotent per request (a request may own several rows)."""
    if req.future.done():
        return
    req.future.set_exception(err)
    if req.stream is not None:
        q, tag = req.stream
        q.put({"type": "error", "tag": tag,
               "error": f"{type(err).__name__}: {err}"})


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _gather_columns(ck, cv, idx):
    """Per-row column relocation for compaction: idx (B, S) maps new slot j
    of row b to old slot idx[b, j]; applied to both stacked caches."""
    ix = idx[None, :, None, :, None]
    ck = jnp.take_along_axis(ck, jnp.broadcast_to(ix, ck.shape), axis=3)
    cv = jnp.take_along_axis(cv, jnp.broadcast_to(ix, cv.shape), axis=3)
    return ck, cv


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _install_rows_pf(ck_big, cv_big, ck_g, cv_g, group_of, rows):
    """Prefill-layout install (diffusion scheduler): both the group cache
    and the persistent cache are (L, ·, S, nkv, dh) — one row scatter."""
    ck_big = ck_big.at[:, rows].set(ck_g[:, group_of])
    cv_big = cv_big.at[:, rows].set(cv_g[:, group_of])
    return ck_big, cv_big


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _gather_columns_pf(ck, cv, idx):
    """Compaction column relocation for the PREFILL-layout cache
    (L, B, S, nkv, dh): columns live on axis 2."""
    ix = idx[None, :, :, None, None]
    ck = jnp.take_along_axis(ck, jnp.broadcast_to(ix, ck.shape), axis=2)
    cv = jnp.take_along_axis(cv, jnp.broadcast_to(ix, cv.shape), axis=2)
    return ck, cv


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _install_rows(ck_big, cv_big, ck_g, cv_g, group_of, rows):
    """Copy admitted rows' prefilled KV (group cache, prefill layout
    (L,P,S,nkv,dh)) into the persistent batch cache (decode layout
    (L,B,nkv,S,dh)) at their allocated row indices (one scatter)."""
    ck_big = ck_big.at[:, rows].set(jnp.transpose(ck_g, (0, 1, 3, 2, 4))[:, group_of])
    cv_big = cv_big.at[:, rows].set(jnp.transpose(cv_g, (0, 1, 3, 2, 4))[:, group_of])
    return ck_big, cv_big


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _install_rows_q(ck_big, cv_big, scale_big, ck_g, cv_g, group_of, rows):
    """int8-KV variant of :func:`_install_rows`: the bf16 prefill KV is
    quantized per vector (amax/127) on the way into the persistent int8
    cache, and the scale planes (L,B,nkv,S) are scattered alongside."""
    def q(c):
        cf = c.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(cf), axis=-1) / 127.0, 1e-12)
        return (jnp.clip(jnp.round(cf / s[..., None]), -127, 127)
                .astype(jnp.int8), s)

    kq, ks = q(jnp.transpose(ck_g, (0, 1, 3, 2, 4))[:, group_of])
    vq, vs = q(jnp.transpose(cv_g, (0, 1, 3, 2, 4))[:, group_of])
    ck_big = ck_big.at[:, rows].set(kq)
    cv_big = cv_big.at[:, rows].set(vq)
    ks_big, vs_big = scale_big
    ks_big = ks_big.at[:, rows].set(ks)
    vs_big = vs_big.at[:, rows].set(vs)
    return ck_big, cv_big, (ks_big, vs_big)


@functools.partial(jax.jit, donate_argnums=(0,))
def _gather_scale_columns(scale, idx):
    """Compaction column relocation for the int8-KV scale planes
    (L,B,nkv,S): same per-row idx map as :func:`_gather_columns`."""
    ix = jnp.broadcast_to(idx[None, :, None, :], scale[0].shape)
    return tuple(jnp.take_along_axis(s, ix, axis=3) for s in scale)

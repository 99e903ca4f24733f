"""Generation HTTP server: remote-serving mode for the native engine.

Covers the reference's external server plane
(/root/reference/trainer/vllm_client.py:47-369 client surface: /health,
/generate with sampling params + logprobs, /reset_prefix_cache,
/update_named_param weight push; vllm_start.sh launcher):

  GET  /health                 -> {"status": "ok"}
  GET  /get_world_size         -> {"world_size": N}   (mesh device count)
  POST /generate               -> {"completion_ids": [[...]xN per prompt],
                                   "logprobs": [[...]], "texts": [[...]]}
       with {"stream": true}   -> chunked NDJSON token events (delta/
                                   finish/request_done/done; see
                                   handle_generate_stream)
  POST /reset_prefix_cache     -> {"ok": true}
  POST /reload_weights {path}  -> {"ok": true}        (weight plane: the
        trainer exports safetensors to shared storage and the server swaps
        them in — the TPU replacement for the NCCL broadcast plane; in
        colocated mode there is no server at all, arrays are shared)

stdlib ThreadingHTTPServer. With ``continuous=True`` (the default from
the CLI) concurrent /generate requests feed one ContinuousEngine scheduler
and batch TOGETHER on device (cross-request continuous batching); without
it, device work falls back to a serializing lock.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .adapter import SamplingParams


class EngineServer:
    def __init__(self, engine, model_dir: str | None = None,
                 continuous: bool = False, prompt_slab: int | None = None,
                 profile_dir: str | None = None):
        self.engine = engine
        self.model_dir = model_dir
        self.lock = threading.Lock()
        self.scheduler = None
        # serving-side profiling (vLLM's /start_profile + /stop_profile
        # surface): a POST pair brackets a jax.profiler device trace of
        # whatever the server executes in between — view with tensorboard
        # or xprof. profile_dir is the default log dir (--profile-dir).
        self.profile_dir = profile_dir
        self._profiling = False
        if continuous:
            from .scheduler import ContinuousEngine

            self.scheduler = ContinuousEngine(engine, prompt_slab=prompt_slab)
            self.scheduler.start()

    def handle_start_profile(self, payload: dict) -> dict:
        import jax

        log_dir = payload.get("log_dir") or self.profile_dir
        if not log_dir:
            raise ValueError("no log_dir: pass {'log_dir': ...} or start "
                             "the server with --profile-dir")
        with self.lock:
            if self._profiling:
                raise ValueError("a profile trace is already running")
            jax.profiler.start_trace(log_dir)
            self._profiling = True
        return {"ok": True, "log_dir": log_dir}

    def handle_stop_profile(self, payload: dict) -> dict:
        import jax

        with self.lock:
            if not self._profiling:
                raise ValueError("no profile trace is running")
            jax.profiler.stop_trace()
            self._profiling = False
        return {"ok": True}

    def handle_generate(self, payload: dict) -> dict:
        prompts = payload.get("prompts") or []
        if isinstance(prompts, str):
            prompts = [prompts]
        sp = self._payload_sp(payload)
        if self.scheduler is not None:
            # concurrent requests join the running device batch
            outs = self.scheduler.generate(prompts, sp)
        else:
            with self.lock:
                outs = self.engine.generate(prompts, sp)
        return {
            "completion_ids": [[o.token_ids for o in r.outputs] for r in outs],
            "logprobs": [[o.token_logprobs for o in r.outputs] for r in outs],
            "texts": [[o.text for o in r.outputs] for r in outs],
            "finish_reasons": [[o.finish_reason for o in r.outputs] for r in outs],
        }

    @staticmethod
    def _payload_sp(payload: dict) -> SamplingParams:
        return SamplingParams(
            n=int(payload.get("n", 1)),
            temperature=float(payload.get("temperature", 1.0)),
            top_p=float(payload.get("top_p", 1.0)),
            top_k=int(payload.get("top_k", -1) if payload.get("top_k") is not None else -1),
            min_p=float(payload.get("min_p", 0.0) or 0.0),
            repetition_penalty=float(payload.get("repetition_penalty", 1.0)),
            max_tokens=int(payload.get("max_tokens", 256)),
            logprobs=int(payload.get("logprobs") or 0),
            seed=payload.get("seed"),
        )

    def handle_generate_stream(self, payload: dict):
        """Iterator of NDJSON events for ``{"stream": true}`` requests.

        Continuous mode streams token deltas at decode-chunk granularity
        (scheduler.submit stream protocol, "tag" = prompt index); the
        serializing fallback cannot observe mid-generation tokens (decode is
        ONE device dispatch), so it emits the finish events only. Either
        way the stream ends with {"type": "done"}.

        All failure paths stay INSIDE the event stream: anything that can
        raise (submit validation, the sync engine.generate) runs EAGERLY in
        this call — before the caller has sent the 200 chunked headers — and
        failures become {"type": "error"} events followed by the terminal
        {"type": "done"}. A mid-stream exception from a generator would
        otherwise escape into do_POST's handler, which writes a second HTTP
        response into the open chunked body (malformed wire bytes, no
        "done"), while already-submitted prompts keep decoding into an
        orphaned queue — so on partial submit failure the submitted
        prompts' events are still drained before the error is reported.
        """
        prompts = payload.get("prompts") or []
        if isinstance(prompts, str):
            prompts = [prompts]
        sp = self._payload_sp(payload)
        if self.scheduler is None:
            try:
                with self.lock:
                    outs = self.engine.generate(prompts, sp)
            except Exception as e:  # eager: headers not sent yet
                return iter([{"type": "error", "tag": -1,
                              "error": f"{type(e).__name__}: {e}"},
                             {"type": "done"}])

            def sync_events():
                for i, r in enumerate(outs):
                    for k, o in enumerate(r.outputs):
                        yield {"type": "finish", "tag": i, "sample": k,
                               "token_ids": o.token_ids,
                               "logprobs": o.token_logprobs, "text": o.text,
                               "finish_reason": o.finish_reason}
                    yield {"type": "request_done", "tag": i}
                yield {"type": "done"}

            return sync_events()

        import queue

        q: queue.Queue = queue.Queue()
        submitted = 0
        submit_err = None
        try:
            # cheap whole-request validation first so the common failure
            # (n > max_batch) submits NOTHING
            n = max(1, int(getattr(sp, "n", 1)))
            if n > self.scheduler.B:
                raise ValueError(
                    f"n={n} exceeds max_batch={self.scheduler.B}")
            for i, p in enumerate(prompts):
                self.scheduler.submit(p, sp, stream=(q, i))
                submitted += 1
        except Exception as e:
            submit_err = f"{type(e).__name__}: {e}"

        def events():
            pending = submitted
            while pending > 0:
                ev = q.get()
                yield ev
                if ev.get("type") in ("request_done", "error"):
                    pending -= 1
            if submit_err is not None:
                yield {"type": "error", "tag": submitted,
                       "error": submit_err}
            yield {"type": "done"}

        return events()

    def handle_reload_weights(self, payload: dict) -> dict:
        from ..models import loader

        path = payload.get("path") or self.model_dir
        if not path:
            raise ValueError("reload_weights requires a path")
        params, _cfg = loader.load_params(path, dtype=self.engine.cfg.dtype)
        with self.lock:
            # swap under the running scheduler: in-flight rows keep decoding
            # against the old arrays until their next chunk picks up params
            # from engine.params (same semantics as vLLM weight reload:
            # subsequent steps use the new weights)
            self.engine.update_params(params)
        return {"ok": True, "path": path}


def make_handler(server: EngineServer):
    class Handler(BaseHTTPRequestHandler):
        server_version = "LaPhaEngineServer/0.1"

        def log_message(self, fmt, *args):
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_stream(self, events):
            """Chunked transfer encoding, one NDJSON event per chunk."""
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for ev in events:
                data = (json.dumps(ev) + "\n").encode()
                self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")
                self.wfile.flush()
            self.wfile.write(b"0\r\n\r\n")

        def do_GET(self):
            if self.path in ("/health", "/health/"):
                self._reply(200, {"status": "ok"})
            elif self.path == "/get_world_size":
                import jax

                self._reply(200, {"world_size": len(jax.devices())})
            elif self.path == "/prefix_cache_stats":
                pc = server.engine.prefix_cache
                self._reply(200, pc.stats() if pc else {})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/generate":
                    if payload.get("stream"):
                        # handle_generate_stream validates/submits eagerly;
                        # it only raises BEFORE any event exists -> the
                        # except below still sends a clean 500. Once the
                        # chunked 200 is on the wire, a transport error
                        # (client gone) must NOT fall through to _reply —
                        # that would write a second response into the open
                        # chunked body.
                        events = server.handle_generate_stream(payload)
                        try:
                            self._reply_stream(events)
                        except (BrokenPipeError, ConnectionError):
                            self.close_connection = True
                    else:
                        self._reply(200, server.handle_generate(payload))
                elif self.path == "/reset_prefix_cache":
                    if server.engine.prefix_cache is not None:
                        server.engine.prefix_cache.clear()
                    self._reply(200, {"ok": True})
                elif self.path in ("/reload_weights", "/update_named_param"):
                    self._reply(200, server.handle_reload_weights(payload))
                elif self.path == "/start_profile":
                    self._reply(200, server.handle_start_profile(payload))
                elif self.path == "/stop_profile":
                    self._reply(200, server.handle_stop_profile(payload))
                else:
                    self._reply(404, {"error": "not found"})
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 8000,
          model_dir: str | None = None, background: bool = False,
          continuous: bool = False, prompt_slab: int | None = None,
          profile_dir: str | None = None):
    srv = EngineServer(engine, model_dir, continuous=continuous,
                       prompt_slab=prompt_slab, profile_dir=profile_dir)
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    if background:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd
    httpd.serve_forever()
    return httpd


def main(argv=None):
    from .. import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description="LaPha TPU generation server")
    ap.add_argument("--model", required=True, help="HF model dir")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-model-len", type=int, default=4096)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--quantize", choices=["int8", "int4"], default=None,
                    help="weight-only int8 (halves HBM; fits 7B on one v5e) "
                         "or group-128 int4 projections via the Pallas "
                         "dequant-matmul kernel (fits 14B)")
    ap.add_argument("--no-continuous-batching", action="store_true",
                    help="serialize requests instead of cross-request batching")
    ap.add_argument("--prompt-slab", type=int, default=None,
                    help="continuous mode: max prompt length (default len/2)")
    ap.add_argument("--kv-quant", choices=["int8"], default=None,
                    help="int8 KV cache with per-vector scales (halves the "
                         "decode KV read stream; the A/B-measured best "
                         "persistent-cache config — BASELINE.md)")
    ap.add_argument("--spec-decode", choices=["pld"], default=None,
                    help="prompt-lookup speculative decoding (adaptive; "
                         "sync engine path only)")
    ap.add_argument("--sequence-parallel", type=int, default=0,
                    help="shard prefill + the decode KV cache over this many "
                         "devices (engine-side SP for contexts beyond one "
                         "chip's HBM; forces the sync engine path)")
    ap.add_argument("--profile-dir", default=None,
                    help="default log dir for the /start_profile + "
                         "/stop_profile jax.profiler trace endpoints")
    args = ap.parse_args(argv)

    from transformers import AutoTokenizer

    from ..models import loader
    from .engine import Engine

    tokenizer = AutoTokenizer.from_pretrained(args.model, trust_remote_code=True)
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.eos_token
    params, cfg = loader.load_params(args.model, quantize=args.quantize)
    seq_mesh = None
    if args.sequence_parallel > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        seq_mesh = Mesh(np.array(jax.devices()[: args.sequence_parallel]),
                        ("sequence",))
    if args.spec_decode:
        # the scheduler's chunked loop does not speculate; spec serving
        # uses the sync engine path
        args.no_continuous_batching = True
    engine = Engine(params, cfg, tokenizer, max_model_len=args.max_model_len,
                    max_batch=args.max_batch, seq_mesh=seq_mesh,
                    kv_quant=args.kv_quant, spec_decode=args.spec_decode)
    print(f"engine server on {args.host}:{args.port} (model {args.model})")
    serve(engine, args.host, args.port, model_dir=args.model,
          continuous=not args.no_continuous_batching,
          prompt_slab=args.prompt_slab, profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()

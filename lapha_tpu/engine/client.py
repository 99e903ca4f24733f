"""HTTP client + adapter for a remote engine server.

Surface parity with /root/reference/trainer/vllm_client.py: `EngineClient`
mirrors VLLMClient (health poll loop 133-167, /generate 169-264, weight push
266-333 — here a /reload_weights POST, no NCCL —, reset_prefix_cache
347-354) and `RemoteEngineAdapter` mirrors _VLLMServerAdapter (373-574):
`generate(prompts, sampling_params, use_tqdm) -> [RequestOutput]` with
cumulative logprobs summed from per-token logprobs.
"""

from __future__ import annotations

import time
from typing import Any

from .adapter import CompletionOutput, RequestOutput


class EngineClient:
    def __init__(self, base_url: str = "http://localhost:8000",
                 connection_timeout: float = 240.0):
        self.base_url = base_url.rstrip("/")
        self.connection_timeout = connection_timeout
        self._session = None

    @property
    def session(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def check_server(self, total_timeout: float | None = None, retry_interval: float = 2.0):
        """Poll /health until the server responds (VLLMClient:133-167)."""
        deadline = time.time() + (total_timeout or self.connection_timeout)
        last_err = None
        while time.time() < deadline:
            try:
                r = self.session.get(self.base_url + "/health", timeout=5)
                if r.ok:
                    return True
            except Exception as e:
                last_err = e
            time.sleep(retry_interval)
        raise ConnectionError(f"engine server at {self.base_url} not healthy: {last_err}")

    def get_world_size(self) -> int:
        r = self.session.get(self.base_url + "/get_world_size", timeout=10)
        r.raise_for_status()
        return int(r.json()["world_size"])

    def generate(self, prompts, n=1, repetition_penalty=1.0, temperature=1.0,
                 top_p=1.0, top_k=-1, min_p=0.0, max_tokens=16,
                 guided_decoding_regex=None, generation_kwargs=None,
                 logprobs=None, images=None, timeout: float = 600.0) -> dict:
        payload = dict(prompts=list(prompts), n=n,
                       repetition_penalty=repetition_penalty,
                       temperature=temperature, top_p=top_p, top_k=top_k,
                       min_p=min_p, max_tokens=max_tokens, logprobs=logprobs)
        r = self.session.post(self.base_url + "/generate", json=payload, timeout=timeout)
        r.raise_for_status()
        return r.json()

    def generate_stream(self, prompts, n=1, repetition_penalty=1.0,
                        temperature=1.0, top_p=1.0, top_k=-1, min_p=0.0,
                        max_tokens=16, logprobs=None, timeout: float = 600.0):
        """Streaming /generate: yields NDJSON event dicts as they arrive.

        Event protocol (engine/server.handle_generate_stream): "delta"
        events carry incremental token_ids/logprobs per (tag=prompt index,
        sample); "finish" is authoritative per sample; "request_done" per
        prompt; a final {"type": "done"} closes the stream. "error" reports
        a scheduler failure for that prompt."""
        payload = dict(prompts=list(prompts), n=n, stream=True,
                       repetition_penalty=repetition_penalty,
                       temperature=temperature, top_p=top_p, top_k=top_k,
                       min_p=min_p, max_tokens=max_tokens, logprobs=logprobs)
        import json as _json

        r = self.session.post(self.base_url + "/generate", json=payload,
                              timeout=timeout, stream=True)
        r.raise_for_status()
        for line in r.iter_lines():
            if not line:
                continue
            ev = _json.loads(line)
            yield ev
            if ev.get("type") == "done":
                break

    def update_named_param(self, name: str = "", weights: Any = None,
                           path: str | None = None) -> dict:
        """Weight push: tell the server to reload exported weights from
        shared storage (the TPU replacement for the per-tensor NCCL
        broadcast, vllm_client.py:315-333)."""
        r = self.session.post(self.base_url + "/reload_weights",
                              json={"path": path}, timeout=600)
        r.raise_for_status()
        return r.json()

    reload_weights = update_named_param

    def reset_prefix_cache(self) -> bool:
        r = self.session.post(self.base_url + "/reset_prefix_cache", json={}, timeout=30)
        return r.ok

    def close_communicator(self):
        if self._session is not None:
            self._session.close()
            self._session = None


class RemoteEngineAdapter:
    """vLLM-like adapter over EngineClient (reference _VLLMServerAdapter)."""

    def __init__(self, client: EngineClient, defaults: dict | None = None):
        self.client = client
        self.defaults = defaults or {}

    def _get(self, sp, name, default):
        val = getattr(sp, name, None)
        return default if val is None else val

    def generate(self, prompts, sampling_params, use_tqdm: bool = False):
        prompts = list(prompts)
        n = int(getattr(sampling_params, "n", 1) or 1)
        d = self.defaults
        resp = self.client.generate(
            prompts=prompts,
            n=n,
            repetition_penalty=float(self._get(sampling_params, "repetition_penalty", d.get("repetition_penalty", 1.0))),
            temperature=float(self._get(sampling_params, "temperature", d.get("temperature", 1.0))),
            top_p=float(self._get(sampling_params, "top_p", d.get("top_p", 1.0))),
            top_k=int(self._get(sampling_params, "top_k", d.get("top_k", -1)) or -1),
            min_p=float(self._get(sampling_params, "min_p", d.get("min_p", 0.0)) or 0.0),
            max_tokens=int(self._get(sampling_params, "max_tokens", d.get("max_tokens", 16))),
            logprobs=int(getattr(sampling_params, "logprobs", 0) or 0) or None,
        )
        comp = resp.get("completion_ids") or []
        lps = resp.get("logprobs") or [[None] * n for _ in comp]
        texts = resp.get("texts") or [[None] * n for _ in comp]
        outs = []
        for p in range(len(comp)):
            row = []
            for j, ids in enumerate(comp[p]):
                tok_lps = lps[p][j] if p < len(lps) and j < len(lps[p]) else None
                cum = float(sum(tok_lps)) if tok_lps else 0.0
                row.append(CompletionOutput(
                    token_ids=list(ids), cumulative_logprob=cum,
                    token_logprobs=tok_lps,
                    text=texts[p][j] if p < len(texts) and j < len(texts[p]) else None))
            outs.append(RequestOutput(outputs=row, prompt=prompts[p] if p < len(prompts) else None))
        return outs

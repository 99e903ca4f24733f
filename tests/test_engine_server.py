"""Engine HTTP server + client + remote adapter round trip."""

import jax
import numpy as np
import pytest

from lapha_tpu.engine import Engine, EngineClient, RemoteEngineAdapter, SamplingParams
from lapha_tpu.engine import server as engine_server
from lapha_tpu.models import Qwen2Config, qwen2


class ByteTok:
    eos_token_id = 0
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [min(b, 255) + 1 for b in text.encode()]}

    def decode(self, ids, **kw):
        return bytes((i - 1) % 256 for i in ids if i > 0).decode(errors="replace")


@pytest.fixture(scope="module")
def served_engine():
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(3))
    eng = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=8,
                 decode_chunk=8, pad_multiple=16, batch_bucket=1, eos_token_ids=[0])
    httpd = engine_server.serve(eng, port=0, background=True)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield eng, url
    httpd.shutdown()


def test_health_and_world_size(served_engine):
    _, url = served_engine
    client = EngineClient(url)
    assert client.check_server(total_timeout=10)
    assert client.get_world_size() >= 1


def test_remote_generate_matches_local(served_engine):
    eng, url = served_engine
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=6)
    local = eng.generate(["hello remote"], sp)[0]
    adapter = RemoteEngineAdapter(EngineClient(url))
    remote = adapter.generate(["hello remote"], sp)[0]
    assert [o.token_ids for o in remote.outputs] == [o.token_ids for o in local.outputs]
    for lo, ro in zip(local.outputs, remote.outputs):
        assert ro.cumulative_logprob == pytest.approx(lo.cumulative_logprob, abs=1e-4)


def test_reset_prefix_cache_endpoint(served_engine):
    eng, url = served_engine
    client = EngineClient(url)
    eng.generate(["a prompt long enough to be cached by the prefix store ok"],
                 SamplingParams(n=1, temperature=0.0, max_tokens=2))
    assert client.reset_prefix_cache()
    assert len(eng.prefix_cache) == 0


def test_unknown_route_404(served_engine):
    _, url = served_engine
    import requests

    assert requests.get(url + "/nope").status_code == 404
    assert requests.post(url + "/nope", json={}).status_code == 404


def test_continuous_server_concurrent_requests():
    """continuous=True: concurrent /generate requests batch on one device
    scheduler and both complete (no serializing lock on the device)."""
    import threading

    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(4))
    eng = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=8,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    httpd = engine_server.serve(eng, port=0, background=True,
                                continuous=True, prompt_slab=64)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        client = EngineClient(url)
        assert client.check_server(total_timeout=10)
        results = {}

        def call(name, max_tokens):
            out = client.generate([f"request {name}"], n=1, temperature=0.5,
                                  max_tokens=max_tokens)
            results[name] = out

        ta = threading.Thread(target=call, args=("A", 24))
        tb = threading.Thread(target=call, args=("B", 5))
        ta.start(); tb.start(); ta.join(60); tb.join(60)
        assert len(results["A"]["completion_ids"][0][0]) == 24
        assert len(results["B"]["completion_ids"][0][0]) == 5
    finally:
        httpd.shutdown()

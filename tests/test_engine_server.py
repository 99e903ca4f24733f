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


def test_streaming_generate_continuous():
    """stream=true over the continuous scheduler: delta events arrive at
    chunk granularity, concatenated deltas == the finish event's ids, and
    the stream terminates with done."""
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(5))
    eng = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=8,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    httpd = engine_server.serve(eng, port=0, background=True,
                                continuous=True, prompt_slab=64)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        client = EngineClient(url)
        assert client.check_server(total_timeout=10)
        events = list(client.generate_stream(
            ["stream me", "and me too"], n=1, temperature=0.0, max_tokens=12))
        assert events[-1]["type"] == "done"
        for tag in (0, 1):
            deltas = [e for e in events
                      if e["type"] == "delta" and e["tag"] == tag]
            finish = [e for e in events
                      if e["type"] == "finish" and e["tag"] == tag]
            assert len(finish) == 1
            assert len(deltas) >= 2  # 12 tokens / chunk 4 => >= 3 chunks
            cat = [t for e in deltas for t in e["token_ids"]]
            assert cat == finish[0]["token_ids"]
            cat_lp = [x for e in deltas for x in e["logprobs"]]
            assert cat_lp == pytest.approx(finish[0]["logprobs"], abs=1e-6)
        assert sum(e["type"] == "request_done" for e in events) == 2
    finally:
        httpd.shutdown()


def test_streaming_generate_sync_fallback(served_engine):
    """Without the scheduler the decode is one dispatch: the stream degrades
    to finish events only, still NDJSON-framed and done-terminated."""
    eng, url = served_engine
    client = EngineClient(url)
    events = list(client.generate_stream(["fallback"], n=2, temperature=0.0,
                                         max_tokens=5))
    assert events[-1]["type"] == "done"
    finishes = [e for e in events if e["type"] == "finish"]
    assert len(finishes) == 2
    local = eng.generate(["fallback"], SamplingParams(n=2, temperature=0.0,
                                                      max_tokens=5))[0]
    assert finishes[0]["token_ids"] == local.outputs[0].token_ids


def test_streaming_submit_failure_yields_error_event():
    """n > max_batch on a streaming request must produce a VALID NDJSON
    stream ending in {type: error} + {type: done} — not a second HTTP
    response spliced into the open chunked body (round-2 advisor finding).
    Nothing may be left decoding into an orphaned queue afterwards."""
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(6))
    eng = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=4,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    httpd = engine_server.serve(eng, port=0, background=True,
                                continuous=True, prompt_slab=64)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        client = EngineClient(url)
        assert client.check_server(total_timeout=10)
        events = list(client.generate_stream(
            ["too wide"], n=99, temperature=0.0, max_tokens=4))
        assert events[-1]["type"] == "done"
        errs = [e for e in events if e["type"] == "error"]
        assert len(errs) == 1 and "max_batch" in errs[0]["error"]
        assert not any(e["type"] in ("delta", "finish") for e in events)
        # the scheduler must be idle (nothing orphaned): a follow-up valid
        # request streams normally on the same server
        ok = list(client.generate_stream(["fine"], n=2, temperature=0.0,
                                         max_tokens=4))
        assert ok[-1]["type"] == "done"
        assert sum(e["type"] == "finish" for e in ok) == 2
    finally:
        httpd.shutdown()


def test_streaming_sync_fallback_failure_is_clean(served_engine):
    """Same contract on the serializing fallback: an engine.generate
    failure becomes error + done events (generate runs EAGERLY, before the
    chunked headers), and the server survives. n > max_batch is NOT an
    error here — the sync path chunks groups — so force a real failure."""
    eng, url = served_engine
    client = EngineClient(url)
    orig = eng.generate

    def boom(*a, **k):
        raise RuntimeError("injected-engine-failure")

    eng.generate = boom
    try:
        events = list(client.generate_stream(["x"], n=1, temperature=0.0,
                                             max_tokens=4))
    finally:
        eng.generate = orig
    assert [e["type"] for e in events] == ["error", "done"]
    assert "injected-engine-failure" in events[0]["error"]
    ok = list(client.generate_stream(["y"], n=1, temperature=0.0, max_tokens=4))
    assert ok[-1]["type"] == "done"


def test_profile_endpoints(tmp_path):
    """/start_profile + /stop_profile bracket a jax.profiler trace of the
    requests in between (vLLM's profiling surface); errors are clean JSON:
    no log dir configured, double-start, stop-without-start."""
    import requests

    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(3))
    eng = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=8,
                 decode_chunk=8, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[0])
    httpd = engine_server.serve(eng, port=0, background=True,
                                profile_dir=str(tmp_path / "trace"))
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        r = requests.post(url + "/stop_profile", json={}, timeout=10)
        assert r.status_code == 500 and "no profile" in r.json()["error"]
        r = requests.post(url + "/start_profile", json={}, timeout=10)
        assert r.status_code == 200 and r.json()["ok"]
        r = requests.post(url + "/start_profile", json={}, timeout=10)
        assert r.status_code == 500 and "already" in r.json()["error"]
        requests.post(url + "/generate",
                      json={"prompts": ["ab"], "max_tokens": 4,
                            "temperature": 0.0}, timeout=60).raise_for_status()
        r = requests.post(url + "/stop_profile", json={}, timeout=30)
        assert r.status_code == 200 and r.json()["ok"]
        # the trace landed on disk
        import glob
        assert glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
    finally:
        httpd.shutdown()

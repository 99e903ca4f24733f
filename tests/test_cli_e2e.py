"""Subprocess-level CLI end-to-end: the MATH-500 single-mode smoke slice.

Mirrors the first BASELINE config (single-mode rollout + rule grading) on a
tiny offline model: `python -m lapha_tpu.evalsuite.rollout_jsonl` with the
native engine, then `eval_math.py`, checking the full file contracts.
"""

import json
import os
import subprocess
import sys

import pytest

from model_fixtures import build_tiny_model_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    return build_tiny_model_dir(str(tmp_path_factory.mktemp("tinymodel")))


@pytest.fixture(scope="module")
def env():
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = "cpu"
    e["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    e["PYTHONPATH"] = REPO
    return e


def test_tokenizer_fixture_works(tiny_model_dir):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tiny_model_dir)
    msgs = [{"role": "user", "content": "What is 2+2?"}]
    prompt = tok.apply_chat_template(conversation=msgs, tokenize=False, add_generation_prompt=True)
    assert "<|im_start|>assistant" in prompt
    ids = tok("hello world 42")["input_ids"]
    assert tok.decode(ids) == "hello world 42"


def test_single_mode_cli_then_score(tiny_model_dir, env, tmp_path):
    data = tmp_path / "math-500.jsonl"
    with open(data, "w") as f:
        for q, a in [("What is 2+2?", "4"), ("What is 1+1?", "2")]:
            f.write(json.dumps({"question": q, "answer": a}) + "\n")

    out = tmp_path / "math.pred.jsonl"
    cmd = [
        sys.executable, "-m", "lapha_tpu.evalsuite.rollout_jsonl",
        "--data", str(data), "--out", str(out), "--dataset-name", "math",
        "--mode", "single", "--tokenizer-path", tiny_model_dir,
        "--engine", "tpu", "--max-new-tokens", "16", "--temperature", "0.7",
        "--max-model-len", "512", "--max-batch", "4",
    ]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 2
    for row in rows:
        assert isinstance(row["completion"], str)
        assert row["dataset"] == "math"
        assert row["k"] == 1

    # score with the root wrapper CLI
    eval_dir = tmp_path / "eval"
    (eval_dir / "rollouts").mkdir(parents=True)
    os.rename(out, eval_dir / "rollouts" / "math.pred.jsonl")
    env2 = dict(env)
    env2["LAPHA_EVAL_DIR"] = str(eval_dir)
    env2["DATA_DIR_MATH"] = str(data)
    r2 = subprocess.run([sys.executable, "eval_math.py", "--dataset", "math"],
                        env=env2, capture_output=True, text=True, cwd=REPO, timeout=120)
    assert r2.returncode == 0, r2.stderr[-3000:]
    summary = json.load(open(eval_dir / "results" / "math.summary.json"))
    assert summary["num"] == 2
    assert (eval_dir / "results" / "summary.csv").exists()


def test_value_mode_cli_with_value_head(tiny_model_dir, env, tmp_path):
    """Value-guided MCTS through the real CLI: tiny model + head artifact."""
    import numpy as np

    data = tmp_path / "data.jsonl"
    with open(data, "w") as f:
        f.write(json.dumps({"question": "What is 2+2?", "answer": "4"}) + "\n")

    head_path = tmp_path / "value_head.npz"
    np.savez(head_path, weight=np.random.default_rng(0).normal(size=(1, 64)).astype(np.float32),
             bias=np.zeros(1, np.float32))

    out = tmp_path / "math.pred.jsonl"
    cmd = [
        sys.executable, "-m", "lapha_tpu.evalsuite.rollout_jsonl",
        "--data", str(data), "--out", str(out), "--dataset-name", "math",
        "--mode", "value", "--tokenizer-path", tiny_model_dir,
        "--engine", "tpu", "--max-new-tokens", "12", "--temperature", "0.8",
        "--max-model-len", "384", "--max-batch", "4",
        "--depth", "2", "--breadth", "2", "--mcts-num-sim", "2",
        "--mcts-num-pos-sim", "99", "--k", "4",
        "--value-base", tiny_model_dir, "--value-head", str(head_path),
    ]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1
    row = rows[0]
    assert isinstance(row["completion"], str)
    # pass@k: up to 4 ranked leaves, first one IS the pass@1 completion
    assert 1 <= row["k"] <= 4 and len(row["completions"]) == row["k"]
    assert row["completions"][0] == row["completion"]
    assert row["final_answers"][0] == row["final_answer"]


def test_vendored_eval_data_present_and_valid():
    """data/*.jsonl vendored from the public benchmark rows (reference data/
    dir); eval.sh default DATA_DIR_* paths must resolve."""
    expected = {"aime-24.jsonl": 30, "aime-25.jsonl": 30, "math-500.jsonl": 500,
                "gaokao-23.jsonl": 385, "olympiad.jsonl": 150}
    for name, n in expected.items():
        path = os.path.join(REPO, "data", name)
        assert os.path.exists(path), f"missing vendored eval data: {name}"
        rows = [json.loads(l) for l in open(path, encoding="utf-8") if l.strip()]
        assert len(rows) == n, (name, len(rows))
        assert all("question" in r and "answer" in r for r in rows)


def test_value_mode_golden_run(tiny_model_dir, env, tmp_path):
    """Recorded end-to-end value-mode run (accuracy-parity proxy, VERDICT
    r2 #3): the full pipeline — engine prefill/decode, processed-logits
    sampling at the canonical eval params (temp 0.3 / top_p 0.8 / top_k 20 /
    rep_pen 1.05, README.md:148-157), value head, MCTS, pick_top_leaves,
    JSONL contract — must reproduce tests/golden/value_mode_tiny.golden.json
    bit-for-bit on the seeded tiny fixture. Any silent behavior drift in
    any of those layers moves the sampled token stream and trips this."""
    import numpy as np

    data = tmp_path / "data.jsonl"
    with open(data, "w") as f:
        f.write(json.dumps({"question": "What is 2+2?", "answer": "4"}) + "\n")
    head_path = tmp_path / "value_head.npz"
    np.savez(head_path,
             weight=np.random.default_rng(0).normal(size=(1, 64)).astype(np.float32),
             bias=np.zeros(1, np.float32))

    out = tmp_path / "math.pred.jsonl"
    cmd = [
        sys.executable, "-m", "lapha_tpu.evalsuite.rollout_jsonl",
        "--data", str(data), "--out", str(out), "--dataset-name", "math",
        "--mode", "value", "--tokenizer-path", tiny_model_dir,
        "--engine", "tpu", "--max-new-tokens", "24", "--temperature", "0.3",
        "--top-p", "0.8", "--top-k", "20", "--repetition-penalty", "1.05",
        "--max-model-len", "384", "--max-batch", "4",
        "--depth", "2", "--breadth", "2", "--mcts-num-sim", "2",
        "--mcts-num-pos-sim", "99", "--k", "4", "--seed", "1234",
        "--value-base", tiny_model_dir, "--value-head", str(head_path),
    ]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    row = json.loads(open(out).read().strip())
    golden = json.load(open(os.path.join(REPO, "tests", "golden",
                                         "value_mode_tiny.golden.json")))
    assert row == golden


def test_single_mode_cli_deepseek_model(env, tmp_path):
    """The rollout CLI serves a DeepSeek (MLA) checkpoint end-to-end:
    loader dispatch -> latent-cache engine -> JSONL contract (the
    model-family surface is CLI-reachable, not just library-level)."""
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    from model_fixtures import _build_tokenizer

    mdir = tmp_path / "tiny_ds"
    mdir.mkdir()
    _build_tokenizer(str(mdir), 512)
    torch.manual_seed(5)
    DeepseekV2ForCausalLM(DeepseekV2Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=24, first_k_dense_replace=1,
        max_position_embeddings=512, tie_word_embeddings=False,
        torch_dtype="float32")).eval().save_pretrained(
        str(mdir), safe_serialization=True)

    data = tmp_path / "m.jsonl"
    with open(data, "w") as f:
        f.write(json.dumps({"question": "What is 2+2?", "answer": "4"}) + "\n")
    out = tmp_path / "m.pred.jsonl"
    cmd = [
        sys.executable, "-m", "lapha_tpu.evalsuite.rollout_jsonl",
        "--data", str(data), "--out", str(out), "--dataset-name", "math",
        "--mode", "single", "--tokenizer-path", str(mdir),
        "--engine", "tpu", "--max-new-tokens", "8", "--temperature", "0.7",
        "--max-model-len", "256", "--max-batch", "2",
    ]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1 and isinstance(rows[0]["completion"], str)


def test_single_mode_cli_jet_diffusion(tiny_model_dir, env, tmp_path):
    """ENGINE=jet drives the native block-diffusion engine through the
    same rollout CLI + JSONL contract (reference eval.sh ENGINE surface;
    SDAR knobs via the reference's env names, eval/adapters.py:237-246)."""
    data = tmp_path / "math-500.jsonl"
    with open(data, "w") as f:
        f.write(json.dumps({"question": "What is 2+2?", "answer": "4"}) + "\n")

    out = tmp_path / "math.pred.jsonl"
    cmd = [
        sys.executable, "-m", "lapha_tpu.evalsuite.rollout_jsonl",
        "--data", str(data), "--out", str(out), "--dataset-name", "math",
        "--mode", "single", "--tokenizer-path", tiny_model_dir,
        "--engine", "jet", "--max-new-tokens", "16", "--temperature", "0.7",
        "--max-model-len", "512", "--max-batch", "4",
    ]
    env2 = dict(env)
    env2["SDAR_MASK_TOKEN_ID"] = "3"  # the fixture tokenizer's <pad>
    env2["SDAR_BLOCK_LENGTH"] = "4"
    env2["SDAR_DENOISING_STEPS"] = "2"
    r = subprocess.run(cmd, env=env2, capture_output=True, text=True,
                       cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1 and isinstance(rows[0]["completion"], str)

#!/usr/bin/env python
"""Training entry (reference run_dapo.py parity: --config lapha.yaml entry,
Poor/Coder agent prompt classes run_dapo.py:20-56, dataset+reward wiring
89-174, checkpoint resume 82-86)."""

from __future__ import annotations

import argparse
import logging
import os
from datetime import datetime

import lapha_tpu

lapha_tpu.apply_platform_env()

from lapha_tpu.search import MCTSAgent
from lapha_tpu.tools import description, execute_python_code
from lapha_tpu.train import MTPOConfig, MTPOTrainer, dataloader, math_reward

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


class PoorAgent(MCTSAgent):
    TOOLS = {}
    TOOLS_DESCRIPTION = ""
    SYSTEM_TEMPLATE = """\
SOLVE THE PROBLEM STEP-BY-STEP. PRESENT THE ANSWER TO EXIT THE LOOP.


# Guidelines
→ Each assistant response must contain exactly one "<think>...</think>" block.
  · If the final answer is ready, use "<answer>...</answer>" block to terminate the loop.
  · No content other than whitespace may appear outside these tags.
→ Begin every response with "STEP-(\\d+):\\n<think>...", 1 step per response."""

    USER_TEMPLATE = """
{support_material_str}
# Please answer:
{question}
"""


class CoderAgent(MCTSAgent):
    TOOLS = {"execute_python_code": execute_python_code}
    TOOLS_DESCRIPTION = description
    SYSTEM_TEMPLATE = PoorAgent.SYSTEM_TEMPLATE
    USER_TEMPLATE = PoorAgent.USER_TEMPLATE


def get_checkpoint(training_args: MTPOConfig):
    latest = os.path.join(training_args.output_dir, "checkpoints", "latest")
    return True if os.path.exists(latest) else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="yaml config (lapha.yaml keys)")
    ap.add_argument("--dataset", default=None, help="DAPO-math parquet path")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--tokenizer-path", default=None)
    args, extra = ap.parse_known_args()

    overrides = {}
    it = iter(extra)
    for tok in it:
        if tok.startswith("--"):
            key = tok[2:].replace("-", "_")
            overrides[key] = next(it, None)
    training_args = MTPOConfig.from_yaml(args.config, **overrides)
    if args.max_steps is not None:
        training_args.max_steps = args.max_steps
    if getattr(training_args, "_ignored_yaml_keys", None):
        logger.info("ignored yaml keys: %s", training_args._ignored_yaml_keys)

    logger.info("Training parameters %s", training_args)

    dataset_path = args.dataset or os.getenv(
        "DAPO_PARQUET", "../dapo-math-17k_unique/data/train-00000-of-00001.parquet")
    train_dataset = dataloader(dataset_path).shuffle(seed=training_args.seed)

    tokenizer = None
    if args.tokenizer_path:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_path, trust_remote_code=True)
        if tokenizer.pad_token is None:
            tokenizer.pad_token = tokenizer.eos_token

    trainer = MTPOTrainer(
        model=training_args.model_name_or_path,
        agent_cls_list=[CoderAgent],
        args=training_args,
        reward_fns=[math_reward],
        train_dataset=train_dataset,
        tokenizer=tokenizer,
    )

    last_ckpt = get_checkpoint(training_args)
    if last_ckpt is not None and training_args.resume_from_checkpoint is None:
        logger.info("Checkpoint detected, resuming training.")

    logger.info("* Starting training %s *", datetime.now().strftime("%Y-%m-%d %H:%M:%S"))
    trainer.train(resume_from_checkpoint=last_ckpt)

    logger.info("* Save model *")
    trainer.save_model(training_args.output_dir,
                       src_config_dir=training_args.model_name_or_path)
    logger.info("Model saved to %s", training_args.output_dir)
    logger.info("* Training complete! *")


if __name__ == "__main__":
    main()

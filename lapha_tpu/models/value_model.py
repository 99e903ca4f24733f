"""Value model = base LM forward + latent projection + linear value head.

TPU-native equivalent of the reference's `LinearValueHead` wrapper
(/root/reference/trainer/mtpo_trainer.py:82-285): one jitted function
returns (y_state, v_pred, h0_raw) for a padded batch. Replaces the whole
rank0-driven scatter/mirror protocol (mtpo_trainer.py:955-1294) — under
pjit over the ``data`` axis every chip scores its shard and XLA handles the
collectives.

Only the ``linear`` head type is implemented; the reference's config default
``qwen2`` names a class that does not exist there (SURVEY.md §7.4) and is
rejected with a clear error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.latent import latent_project, masked_mean, pool_mask, value_head_apply
from . import qwen2


def init_value_head(hidden_size: int, key: jax.Array) -> dict:
    w = jax.random.normal(key, (hidden_size,), jnp.float32) * (1.0 / jnp.sqrt(hidden_size))
    return {"w": w, "b": jnp.zeros((), jnp.float32)}


def make_value_head(head_type: str, hidden_size: int, key: jax.Array) -> dict:
    if head_type != "linear":
        raise ValueError(
            f"value_head_type={head_type!r} is not supported: the reference's "
            "'qwen2' head is referenced but never defined (mtpo_trainer.py:654); "
            "only 'linear' runs there and here."
        )
    return init_value_head(hidden_size, key)


def value_forward(
    params: dict,
    head: dict,
    cfg: qwen2.Qwen2Config,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    response_mask: jax.Array | None = None,
    prompt_mask: jax.Array | None = None,
    root_h0: jax.Array | None = None,
    *,
    no_head_scale: float = 0.0,
    curvature: float = 1.0,
    value_activation: str = "sigmoid",
):
    """Returns (y_state (B,H) f32 ball points, v_pred (B,) f32, h0_raw (B,H) f32).

    Pipeline (reference forward, mtpo_trainer.py:187-285):
      last_hidden = base_lm(input_ids)          # bf16 trunk
      h0_raw  = masked_mean(last_hidden, pool)  # f32
      y_state = exp0((h0_raw - root_h0)/√H)     # f32, ball
      v_pred  = sigmoid(W·h0_raw + b)           # on UNcentered h0
    """
    from . import model_module

    _, hidden, _ = model_module(cfg).forward(
        params, cfg, input_ids, attention_mask=attention_mask, return_hidden=True
    )
    pm = pool_mask(attention_mask, response_mask, prompt_mask)
    h0_raw = masked_mean(hidden, pm)
    y_state = latent_project(h0_raw, root_h0, scale=no_head_scale, c=curvature)
    v_pred = value_head_apply(h0_raw, head["w"], head["b"], activation=value_activation)
    return y_state, v_pred, h0_raw

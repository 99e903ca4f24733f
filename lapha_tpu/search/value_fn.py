"""Batched, bucketed value function: the search loop's scoring seam.

Replaces the reference's rank0-scatter `value_fn` + `_value_forward_server`
mirror protocol (/root/reference/trainer/mtpo_trainer.py:955-1294): here it
is one jitted pjit-able function; under a mesh the batch dimension is
sharded over ``data`` and XLA gathers results — no header protocol, no
collective-order mirroring, no rank-divergent control flow.

Shapes are bucketed (batch rounded to a multiple, length to ``pad_multiple``)
so MCTS's ragged child batches hit the jit cache.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2, value_model


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ValueFunction:
    """Callable with the reference value_fn signature.

    __call__(input_ids, attention_mask, response_mask=None, prompt_mask=None,
             root_h0=None, return_h0=False)
      -> (y_state (B,H) np.float32, v_pred (B,) np.float32[, h0_raw])
    """

    def __init__(
        self,
        params: Any,
        head: dict,
        cfg: qwen2.Qwen2Config,
        *,
        max_model_len: int = 4096,
        pad_multiple: int = 128,
        batch_bucket: int = 8,
        no_head_scale: float = 0.0,
        curvature: float = 1.0,
        value_activation: str = "sigmoid",
        mesh=None,
    ):
        self.params = params
        self.head = head
        self.cfg = cfg
        self.max_model_len = int(max_model_len)
        self.pad_multiple = int(pad_multiple)
        self.batch_bucket = int(batch_bucket)
        self.kw = dict(
            no_head_scale=no_head_scale, curvature=curvature, value_activation=value_activation
        )
        self.mesh = mesh
        self._jit = jax.jit(self._impl, static_argnames=("has_root",))
        self.calls = 0

    def _impl(self, params, head, ids, attn, resp, pmask, root_h0, has_root: bool):
        return value_model.value_forward(
            params, head, self.cfg, ids, attn,
            response_mask=resp, prompt_mask=pmask,
            root_h0=root_h0 if has_root else None,
            **self.kw,
        )

    def from_pooled(self, h0_raw, root_h0=None):
        """(y_state, v_pred) from an engine-pooled h0 — no LM forward.

        The fused-value path: engines built with ``collect_h0`` return each
        sample's pooled final hidden (mean over prompt + emitted tokens,
        exactly the reference pool rule), so value scoring costs one tiny
        matvec instead of a full sequence forward.
        """
        import jax.numpy as jnp

        from ..ops.latent import latent_project, value_head_apply

        h0 = jnp.asarray(np.asarray(h0_raw, np.float32))
        if h0.ndim == 1:
            h0 = h0[None, :]
        rh = None if root_h0 is None else jnp.asarray(
            np.asarray(root_h0, np.float32).reshape(-1))
        y = latent_project(h0, rh, scale=self.kw["no_head_scale"],
                           c=self.kw["curvature"])
        v = value_head_apply(h0, self.head["w"], self.head["b"],
                             activation=self.kw["value_activation"])
        return np.asarray(y, np.float32), np.asarray(v, np.float32)

    def update_params(self, params=None, head=None):
        if params is not None:
            self.params = params
        if head is not None:
            self.head = head

    def __call__(self, input_ids, attention_mask, response_mask=None, prompt_mask=None,
                 root_h0=None, return_h0: bool = False):
        ids = np.asarray(input_ids)
        if ids.ndim == 1:
            ids = ids[None, :]
        B, L = ids.shape
        attn = np.asarray(attention_mask).reshape(B, L)
        resp = np.asarray(response_mask).reshape(B, L) if response_mask is not None else attn
        pmask = np.asarray(prompt_mask).reshape(B, L) if prompt_mask is not None else np.zeros_like(attn)

        # left-truncate together (reference agent.py:1095-1099 semantics)
        if L > self.max_model_len:
            ids, attn, resp, pmask = (a[:, -self.max_model_len:] for a in (ids, attn, resp, pmask))
            L = self.max_model_len

        Lb = min(_round_up(L, self.pad_multiple), self.max_model_len)
        Bb = _round_up(B, self.batch_bucket)
        idsb = np.zeros((Bb, Lb), np.int32)
        attnb = np.zeros((Bb, Lb), np.int32)
        respb = np.zeros((Bb, Lb), np.int32)
        pmb = np.zeros((Bb, Lb), np.int32)
        idsb[:B, :L], attnb[:B, :L], respb[:B, :L], pmb[:B, :L] = ids, attn, resp, pmask
        # padded rows get a 1-token attn so pooling denominators stay sane
        attnb[B:, 0] = 1
        respb[B:, 0] = 1

        has_root = root_h0 is not None
        rh = jnp.asarray(np.asarray(root_h0, np.float32).reshape(-1)) if has_root \
            else jnp.zeros((self.cfg.hidden_size,), jnp.float32)

        args = (self.params, self.head, jnp.asarray(idsb), jnp.asarray(attnb),
                jnp.asarray(respb), jnp.asarray(pmb), rh)
        if self.mesh is not None:
            with self.mesh:
                y, v, h0 = self._jit(*args, has_root=has_root)
        else:
            y, v, h0 = self._jit(*args, has_root=has_root)
        self.calls += 1

        y = np.asarray(y[:B], np.float32)
        v = np.asarray(v[:B], np.float32)
        if return_h0:
            return y, v, np.asarray(h0[:B], np.float32)
        return y, v


def make_fake_value_fn(hidden_size: int = 8, seed: int = 0) -> Callable:
    """Deterministic hash-based value fn for hermetic search tests."""
    rng = np.random.default_rng(seed)
    proj = rng.normal(size=(64, hidden_size)).astype(np.float32) * 0.1

    def fn(input_ids, attention_mask, response_mask=None, prompt_mask=None,
           root_h0=None, return_h0: bool = False):
        ids = np.asarray(input_ids)
        if ids.ndim == 1:
            ids = ids[None, :]
        B = ids.shape[0]
        h0 = np.zeros((B, hidden_size), np.float32)
        for i in range(B):
            row = ids[i][np.asarray(attention_mask).reshape(B, -1)[i] > 0]
            feat = np.bincount(row % 64, minlength=64).astype(np.float32)
            h0[i] = feat @ proj
        centered = h0 - (np.asarray(root_h0, np.float32).reshape(1, -1) if root_h0 is not None else 0.0)
        nrm = np.linalg.norm(centered / np.sqrt(hidden_size), axis=-1, keepdims=True)
        y = np.tanh(nrm) / np.maximum(nrm, 1e-6) * centered / np.sqrt(hidden_size)
        v = 1.0 / (1.0 + np.exp(-h0.sum(axis=-1)))
        if return_h0:
            return y, v, h0
        return y, v

    return fn

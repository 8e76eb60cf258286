"""Shared flax building blocks with PyTorch-parity defaults."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from difformer_tpu.nn.init import make_torch_bias_init, torch_linear_kernel_init


class TorchLinear(nn.Module):
    """``nn.Linear`` equivalent: U(±1/√fan_in) init on weight and bias."""

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features),
            self.param_dtype,
        )
        y = jnp.dot(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", make_torch_bias_init(fan_in), (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(y.dtype)
        return y


class TorchLayerNorm(nn.Module):
    """``nn.LayerNorm`` parity: eps=1e-5, affine. (The reference's ``use_bn``
    flag actually instantiates LayerNorm — ``node classification/
    difformer.py:162`` — the flag name is kept for config parity.)"""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # stats in f32 even for bf16 activations; output in input dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon, use_bias=True, use_scale=True,
            dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """``nn.BatchNorm1d`` parity (eps=1e-5, momentum 0.1) for the baseline
    zoo (MLP/GCN/... use real BatchNorm, ``node classification/gnns.py``)."""

    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura, momentum=0.9, epsilon=1e-5
        )(x)


class Dropout(nn.Dropout):
    """Alias with the torch calling convention (rate at construction)."""


class FeatEncoder(nn.Module):
    """Mixed categorical/scalar feature encoder (reference ``FeatEncoder``,
    ``physical particle/utils/model_utils.py``): per-column embeddings for
    categorical features (e.g. SynMol atom types) + a linear layer for the
    scalar block, concatenated and projected to ``hidden``."""

    hidden: int
    categorical_cardinalities: tuple = ()   # one entry per leading int column

    @nn.compact
    def __call__(self, x):
        n_cat = len(self.categorical_cardinalities)
        parts = []
        for i, card in enumerate(self.categorical_cardinalities):
            emb = nn.Embed(card, self.hidden, name=f"embed_{i}")
            parts.append(emb(x[..., i].astype(jnp.int32)))
        if x.shape[-1] > n_cat:
            parts.append(
                TorchLinear(self.hidden, name="scalar")(x[..., n_cat:])
            )
        h = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        return TorchLinear(self.hidden, name="proj")(h)

"""Convolutional denoising autoencoder family (Flax linen).

Rebuilds the reference's Keras models as one parameterised module:

* depth-2, filters (32, 32): VAE/hyperparam_scan.py:152-165 and
  VAE/graphs.ipynb cell 5;
* depth-2, filters (conv1, conv2), kernels (ker1, ker2, ker3):
  VAE/manual_scan.py:189-202;
* depth-3, filters (conv1, conv2, conv3), single kernel:
  VAE/manual_scan_3layers.py:185-201.

Architecture (NHWC, input (B, 256, 128, 1)):
encoder: [Conv(f_i, k_i, same) + relu -> MaxPool 2x2 same] for each level;
decoder: [ConvTranspose(f_i, k_i, stride 2, same) + relu] mirrored;
head:    Conv(1, out_kernel, same) + sigmoid.

Matches Keras semantics: glorot-uniform kernel init, zero bias init
(Keras Conv2D defaults), 'same' padding throughout; pooling halves exactly
because the tile shape (256, 128) is a multiple of 2^depth.

``apply`` returns probabilities by default (like Keras ``predict``); pass
``logits=True`` during training to feed a numerically-stable sigmoid-BCE —
mathematically the same loss as Keras's ``binary_crossentropy`` on sigmoid
outputs, without the clip-at-1e-7 hack.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from specenh.config import ModelConfig

__all__ = ["ConvAutoencoder", "make_model", "param_count"]


class ConvAutoencoder(nn.Module):
    cfg: ModelConfig = ModelConfig()
    # computation dtype: params stay float32; bfloat16 here roughly doubles
    # MXU throughput for inference at negligible quality cost (the sigmoid
    # output is compared at ~1e-2 feature scales)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array, logits: bool = False) -> jax.Array:
        cfg = self.cfg
        init = nn.initializers.glorot_uniform()
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, (f, k) in enumerate(zip(cfg.filters, cfg.kernels)):
            x = nn.Conv(
                f, k, padding="SAME", kernel_init=init, dtype=self.dtype,
                name=f"enc_conv{i}",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        for i in reversed(range(len(cfg.filters))):
            f, k = cfg.filters[i], cfg.kernels[i]
            x = nn.ConvTranspose(
                f, k, strides=(2, 2), padding="SAME", kernel_init=init,
                dtype=self.dtype, name=f"dec_deconv{i}",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            1, cfg.out_kernel, padding="SAME", kernel_init=init, dtype=self.dtype,
            name="out_conv",
        )(x)
        x = x.astype(jnp.float32)
        return x if logits else nn.sigmoid(x)


def make_model(cfg: ModelConfig = ModelConfig(), dtype=None) -> ConvAutoencoder:
    return ConvAutoencoder(cfg, dtype=dtype)


def init_params(model: ConvAutoencoder, rng: jax.Array, input_shape: Tuple[int, ...] | None = None):
    shape = input_shape or (1, *model.cfg.input_shape)
    return model.init(rng, jnp.zeros(shape, jnp.float32))


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))

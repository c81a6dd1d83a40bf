"""Import reference Keras autoencoder weights into specenh Flax params.

The reference persists trained models as Keras SavedModels
(``autoencoder.save(path + 'keras_model')``, VAE/hyperparam_scan.py:191;
the missing ``VAE/best_model`` artifact is one of these).  This module lets
a user of the reference carry those weights over.

Layout conversions (verified numerically against TF):
* Conv2D: Keras kernel is HWIO — identical to Flax ``nn.Conv``; copy as-is.
* Conv2DTranspose: Keras kernel is (kh, kw, OUT, IN) and the op is the
  gradient-of-conv; Flax ``nn.ConvTranspose`` (transpose_kernel=False) is a
  fractionally-strided correlation, so the kernel must be flipped along both
  spatial axes and have its channel axes swapped:
  ``flax = keras[::-1, ::-1].transpose(0, 1, 3, 2)``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from specenh.config import ModelConfig

__all__ = ["params_from_keras_weights", "model_config_from_keras_weights"]


def _split_layers(weights: Sequence[np.ndarray]) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Group a flat [kernel, bias, kernel, bias, ...] weight list."""
    if len(weights) % 2 != 0:
        raise ValueError("expected alternating kernel/bias weights")
    return [(np.asarray(weights[i]), np.asarray(weights[i + 1])) for i in range(0, len(weights), 2)]


def model_config_from_keras_weights(
    weights: Sequence[np.ndarray], input_shape=(256, 128, 1)
) -> ModelConfig:
    """Infer the ModelConfig of a reference autoencoder from its weight list
    (2*depth+1 conv layers: depth Conv2D + depth Conv2DTranspose + head)."""
    layers = _split_layers(weights)
    n = len(layers)
    if n % 2 != 1:
        raise ValueError(f"expected odd number of conv layers, got {n}")
    depth = (n - 1) // 2
    filters = tuple(int(k.shape[-1]) for k, _ in layers[:depth])
    kernels = tuple((int(k.shape[0]), int(k.shape[1])) for k, _ in layers[:depth])
    out_kernel = (int(layers[-1][0].shape[0]), int(layers[-1][0].shape[1]))
    return ModelConfig(
        filters=filters, kernels=kernels, out_kernel=out_kernel, input_shape=input_shape
    )


def params_from_keras_weights(weights: Sequence[np.ndarray], cfg: ModelConfig):
    """Convert ``keras_model.get_weights()`` into Flax params for
    ``ConvAutoencoder(cfg)``.  Keras layer order == module order: encoder
    convs, decoder transposes, output conv."""
    import jax.numpy as jnp

    layers = _split_layers(weights)
    depth = cfg.depth
    out = {}
    for i in range(depth):
        k, b = layers[i]
        out[f"enc_conv{i}"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    for j, i in enumerate(reversed(range(depth))):
        k, b = layers[depth + j]
        k = np.flip(np.flip(k, 0), 1).transpose(0, 1, 3, 2)
        out[f"dec_deconv{i}"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    k, b = layers[-1]
    out["out_conv"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    return {"params": out}

"""Training parity vs the reference's actual Keras recipe.

Strongest faithfulness check available: starting from IDENTICAL weights on
IDENTICAL data with the reference's exact recipe (Adam defaults, bs, no
shuffle), the specenh training loop must track Keras's loss trajectory and
parameters.  Differences are limited to float accumulation order and
Keras's probability clipping (1e-7) vs our logits-based BCE.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from specenh.config import ModelConfig, TrainConfig
from specenh.models.autoencoder import make_model
from specenh.models.keras_import import params_from_keras_weights
from specenh.train import create_state, fit

SHAPE = (64, 32, 1)


def _keras_model():
    from tensorflow.keras import layers
    from tensorflow.keras.models import Model

    inp = layers.Input(shape=SHAPE)
    z = layers.Conv2D(8, (3, 3), activation="relu", padding="same")(inp)
    z = layers.MaxPooling2D((2, 2), padding="same")(z)
    z = layers.Conv2D(8, (3, 3), activation="relu", padding="same")(z)
    z = layers.MaxPooling2D((2, 2), padding="same")(z)
    z = layers.Conv2DTranspose(8, (3, 3), strides=2, activation="relu", padding="same")(z)
    z = layers.Conv2DTranspose(8, (3, 3), strides=2, activation="relu", padding="same")(z)
    z = layers.Conv2D(1, (3, 3), activation="sigmoid", padding="same")(z)
    m = Model(inp, z)
    m.compile(optimizer="adam", loss="binary_crossentropy")
    return m


def test_training_trajectory_matches_keras():
    rng = np.random.default_rng(0)
    x = rng.random((64, *SHAPE)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)

    km = _keras_model()
    cfg = ModelConfig(filters=(8, 8), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SHAPE)
    params = params_from_keras_weights(km.get_weights(), cfg)

    # identical starting loss
    keras_loss0 = float(km.evaluate(x, y, verbose=0))
    model = make_model(cfg)
    from specenh.train import bce_from_logits

    ours_loss0 = float(bce_from_logits(model.apply(params, jnp.asarray(x), logits=True), jnp.asarray(y)))
    np.testing.assert_allclose(ours_loss0, keras_loss0, rtol=1e-4)

    # 3 epochs, reference recipe, no shuffle, same batch order
    hist = km.fit(x, y, epochs=3, batch_size=16, shuffle=False, verbose=0)
    keras_losses = hist.history["loss"]

    tc = TrainConfig(batch_size=16, shuffle=False, seed=0)
    state = create_state(cfg, tc).replace(params=params)
    state, ours = fit(state, x, y, cfg=tc, epochs=3)

    # per-epoch training losses track Keras within float/impl tolerance
    np.testing.assert_allclose(ours["loss"], keras_losses, rtol=5e-3)

    # final predictions agree closely
    kp = km.predict(x[:8], verbose=0)
    op = np.asarray(model.apply(state.params, jnp.asarray(x[:8])))
    assert np.abs(op - kp).max() < 5e-3

"""Model family: conv autoencoders + Keras weight import."""

from specenh.models.autoencoder import ConvAutoencoder, make_model, param_count  # noqa: F401
from specenh.models.keras_import import (  # noqa: F401
    model_config_from_keras_weights,
    params_from_keras_weights,
)

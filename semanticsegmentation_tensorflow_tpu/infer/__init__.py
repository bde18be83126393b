"""Inference: single-image / batch prediction + overlay output."""

from semanticsegmentation_tensorflow_tpu.infer.predict import (  # noqa: F401
    Predictor,
    save_inference_samples,
)

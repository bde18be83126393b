"""Inference: single-image / batch prediction + overlay output."""

from semanticsegmentation_tensorflow_tpu.infer.predict import (  # noqa: F401
    Predictor,
    save_inference_samples,
)
from semanticsegmentation_tensorflow_tpu.infer.export import (  # noqa: F401
    ExportedPredictor,
    export_model,
)
from semanticsegmentation_tensorflow_tpu.infer import quant  # noqa: F401
from semanticsegmentation_tensorflow_tpu.infer.window import (  # noqa: F401
    TiledPredictor,
)

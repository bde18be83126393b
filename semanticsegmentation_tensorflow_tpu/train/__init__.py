"""Training stack: loss, metrics, train state, jitted/sharded step, loop."""

from semanticsegmentation_tensorflow_tpu.train.loss import (  # noqa: F401
    softmax_cross_entropy_loss,
)
from semanticsegmentation_tensorflow_tpu.train.metrics import (  # noqa: F401
    confusion_matrix,
    iou_from_confusion,
    SegMetrics,
)
from semanticsegmentation_tensorflow_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
)
from semanticsegmentation_tensorflow_tpu.train.step import (  # noqa: F401
    make_train_step,
    make_eval_step,
)

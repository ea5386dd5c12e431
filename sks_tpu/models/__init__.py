"""Model layer: deep homography estimation with the TensorACA head.

The reference's PyTorch stack exists to serve deep homography pipelines
(4-point-offset parameterization solved by TensorDLT/TensorGE/TensorACA,
``PyTorch Codes/Modules_Runtime_Test.py``).  Here that pipeline is a real
trainable model: a flax CNN regressing corner offsets, converted to a
homography differentiably by the 47-flop ACA-rect head — the cheapest possible
solver layer in the network's backward pass as well (division-free up to
scale).
"""

from sks_tpu.models.deep_homography import (  # noqa: F401
    HomographyNet,
    corner_loss,
    create_train_state,
    train_step,
)
from sks_tpu.models.heads import HEAD_METHODS, offsets_to_h  # noqa: F401
from sks_tpu.models.iterative import (  # noqa: F401
    IterativeHomographyNet,
    create_ihn_state,
    ihn_train_step,
    sequence_loss,
    warp_by_homography,
)

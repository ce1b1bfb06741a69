"""Datasets & input pipeline.

The reference uses torchvision MNIST/CIFAR downloads (SURVEY.md §2-L2); this
environment has no network, so loaders read raw files from
``$QTPU_DATA_DIR`` when present and otherwise fall back to deterministic
*synthetic* classification tasks with the same shapes — learnable (fixed
class templates + noise) so end-to-end accuracy tests remain meaningful.
"""

from pytorch_quantize_impls_tpu.data.datasets import (  # noqa: F401
    cifar10,
    digits,
    iterate_batches,
    mnist,
    synthetic_image_classification,
)

"""roadvision_tpu — a TPU-native road video-analytics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference system
``YJxyzxyz/road-vision-system`` (see SURVEY.md): timestamped video capture, a
pluggable preprocessing chain (CLAHE dehaze, median derain) as batched TPU
kernels, a native JAX YOLOv8 detector with fixed-shape class-aware NMS, SORT
multi-object tracking as a vectorized scan over fixed-capacity track slots,
homography ground projection with windowed distance/speed estimation,
overlay/compare visualization with recording, and an offline fog synthesizer.

Public surface preserved from the reference:
  - ``Detection`` dataclass (reference: src/detect/types.py:4-15)
  - YAML config schema + deep-merge semantics (reference: src/config.py:5-108)
  - plugin registries per layer (preprocess/detect/track/geometry)

Design stance (TPU-first, not a translation): the device path operates on
HBM-resident frame *batches* and struct-of-arrays detection sets with static
shapes; the host does only decode/encode/display, one transfer per batch.
"""

__version__ = "0.1.0"

from .config import load_config, DEFAULTS  # noqa: F401
from .detect.types import Detection  # noqa: F401


def __getattr__(name):
    # Pipeline pulls in the full engine stack (jax compile machinery);
    # lazy so `import roadvision_tpu` stays light for config-only users.
    if name == "Pipeline":
        from .api import Pipeline
        return Pipeline
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

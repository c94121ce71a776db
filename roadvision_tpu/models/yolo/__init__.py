from . import weights, yolov8
from .yolov8 import (REG_MAX, STRIDES, arch_spec, count_params, decode,
                     forward, forward_features, forward_head, init_params)

__all__ = ["yolov8", "weights", "arch_spec", "init_params", "forward",
           "forward_features", "forward_head", "decode", "count_params",
           "STRIDES", "REG_MAX"]

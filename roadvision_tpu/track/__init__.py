from .base import Tracker
from .botsort import BotSortTracker, make_botsort_step
from .bytetrack import ByteTracker, make_byte_step
from .registry import build_device_step, build_tracker
from .sort_tracker import SortTracker
from .sort_tpu import (SortOutput, SortState, bbox_to_z, greedy_associate,
                       init_state, iou_matrix, make_sort_scan, make_sort_step,
                       x_to_bbox)

__all__ = ["Tracker", "build_tracker", "build_device_step", "SortTracker",
           "ByteTracker", "BotSortTracker", "SortState", "SortOutput",
           "init_state",
           "make_sort_step", "make_sort_scan", "make_byte_step",
           "make_botsort_step",
           "iou_matrix", "greedy_associate", "bbox_to_z", "x_to_bbox"]

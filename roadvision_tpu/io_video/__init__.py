from .capture import Frame, ImageDirSource, NpyVideoSource, \
    SyntheticRoadSource, VideoSource
from .fps_meter import FPSMeter
from .writer import MJPEGAVIWriter, NpyWriter, make_writer

__all__ = ["Frame", "VideoSource", "SyntheticRoadSource", "NpyVideoSource",
           "ImageDirSource", "FPSMeter", "MJPEGAVIWriter", "NpyWriter",
           "make_writer"]

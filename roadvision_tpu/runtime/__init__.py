from .engine import FrameResult, PipelineEngine
from .multi_engine import MultiStreamEngine, build_sources

__all__ = ["PipelineEngine", "FrameResult", "MultiStreamEngine",
           "build_sources"]

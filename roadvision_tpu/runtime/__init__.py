from .engine import FrameResult, PipelineEngine

__all__ = ["PipelineEngine", "FrameResult"]

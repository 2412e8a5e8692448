"""plans — compile a PipelineSpec into executable DataFrame chains."""

from .compiler import CompiledPipeline, compile_pipeline

__all__ = ["compile_pipeline", "CompiledPipeline"]

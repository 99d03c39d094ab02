from one2345_tpu.core.config import (
    DiffusionConfig,
    ElevationConfig,
    PipelineConfig,
    ReconConfig,
    SamConfig,
    UNetConfig,
    VAEConfig,
)
from one2345_tpu.core.meshes import create_mesh, shard_batch, replicate
from one2345_tpu.core.profiling import Timer, trace_annotation

__all__ = [
    "DiffusionConfig",
    "ElevationConfig",
    "PipelineConfig",
    "ReconConfig",
    "SamConfig",
    "UNetConfig",
    "VAEConfig",
    "create_mesh",
    "shard_batch",
    "replicate",
    "Timer",
    "trace_annotation",
]

from retargetvid_tpu.pipeline.geometry import (
    GeometryConfig,
    geometry_pipeline,
    run_geometry,
)

__all__ = ["GeometryConfig", "geometry_pipeline", "run_geometry"]

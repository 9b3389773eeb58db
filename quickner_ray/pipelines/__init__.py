from .kg import KGPipelineConfig, annotate_dataset, run_kg

__all__ = ["KGPipelineConfig", "annotate_dataset", "run_kg"]

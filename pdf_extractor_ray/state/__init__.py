from pdf_extractor_ray.state.manifest import Manifest, run_partitioned_extraction

__all__ = ["Manifest", "run_partitioned_extraction"]

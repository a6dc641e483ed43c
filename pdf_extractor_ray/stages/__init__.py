from pdf_extractor_ray.stages.extract import ExtractPages, sniff_batch
from pdf_extractor_ray.stages.schema import EXTRACTION_SCHEMA, records_to_arrow

__all__ = ["ExtractPages", "sniff_batch", "EXTRACTION_SCHEMA", "records_to_arrow"]

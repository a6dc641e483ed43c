from pdf_extractor_ray.functions.exact import cents_np, CENTS_SQL

__all__ = ["cents_np", "CENTS_SQL"]

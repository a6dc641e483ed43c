from pdf_extractor_ray.sources.pages import (
    generate_pages_table,
    write_pages_corpus,
    make_html_page,
    make_pdf,
)

__all__ = ["generate_pages_table", "write_pages_corpus", "make_html_page", "make_pdf"]

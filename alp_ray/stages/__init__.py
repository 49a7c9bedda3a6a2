from .extract import Sha256Stage, ImportExtractor, add_vertex_ids  # noqa: F401

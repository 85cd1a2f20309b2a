from .kernels import distance_column, similarity_column  # noqa: F401

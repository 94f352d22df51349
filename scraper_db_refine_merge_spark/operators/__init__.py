from .pagination import paginate

__all__ = ["paginate"]

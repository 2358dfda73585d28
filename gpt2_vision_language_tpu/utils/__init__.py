from .trees import tree_size, tree_bytes, fmt_count

__all__ = ["tree_size", "tree_bytes", "fmt_count"]

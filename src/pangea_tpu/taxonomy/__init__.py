from .taxonomy import Taxonomy, RANK_CODES, RANK_NAMES

__all__ = ["Taxonomy", "RANK_CODES", "RANK_NAMES"]

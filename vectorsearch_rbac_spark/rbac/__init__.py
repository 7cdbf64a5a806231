from .derive import (
    NUM_ROLES,
    USER_MOD,
    derive_rbac,
    derive_queries,
    accessible_documents,
    block_selectivity,
)
from . import generators  # noqa: F401

__all__ = [
    "NUM_ROLES",
    "USER_MOD",
    "derive_rbac",
    "derive_queries",
    "accessible_documents",
    "block_selectivity",
]

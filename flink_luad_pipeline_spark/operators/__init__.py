from .relational import (  # noqa: F401
    anti_join,
    cross_missing_cells,
    dict_decode,
    dict_encode,
    grouped_concat,
    grouped_moments,
    semi_join,
    split_by_predicate,
    symmetrize_edges,
    union_all,
)

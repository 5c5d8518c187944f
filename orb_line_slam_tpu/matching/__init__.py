from .point_matcher import (
    Matches,
    match_descriptors,
    resolve_duplicates,
    rotation_consistency,
    search_by_projection,
)

from .compact_geojson import (
    convert_to_feature,
    feature_collection_string,
    write_compact_geojson,
)

__all__ = [
    "convert_to_feature",
    "feature_collection_string",
    "write_compact_geojson",
]

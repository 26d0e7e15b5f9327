from geotables_jl_spark.sources.webpages import (
    extract_geotags,
    geotagged_webpages,
    webpages_from_df,
    webpages_from_documents,
)

__all__ = [
    "webpages_from_documents",
    "webpages_from_df",
    "extract_geotags",
    "geotagged_webpages",
]

from bigdata_retailrocket_recsys_spark.plans.catalog import QUERIES, CatalogQuery, query

# importing registers the extension queries
from bigdata_retailrocket_recsys_spark.plans import catalog_ext  # noqa: F401

__all__ = ["QUERIES", "CatalogQuery", "query"]

from distributed_web_scrapper_and_crawler_spark.analytics.queries import (  # noqa: F401
    QUERY_REGISTRY,
    QuerySpec,
)

# importing these modules populates QUERY_REGISTRY
from distributed_web_scrapper_and_crawler_spark.analytics import training  # noqa: E402,F401
from distributed_web_scrapper_and_crawler_spark.analytics import crawl_queries  # noqa: E402,F401
from distributed_web_scrapper_and_crawler_spark.analytics import extra  # noqa: E402,F401
